"""Dynamics module tests: element round-trips, energy conservation,
STM consistency, station geometry (the smd-equivalent tier,
SURVEY.md §2.16)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu.dynamics import constants as c
from gokalman_tpu.dynamics import elements, gravity, integrators, propagate, stations


def _leo_state():
    """LEO orbit like the OD test scenario (hybrid_test.go:74)."""
    r, v = elements.oe_to_rv(
        a=7000.0, e=0.001, i=jnp.deg2rad(45.0), raan=jnp.deg2rad(30.0),
        argp=jnp.deg2rad(10.0), nu=0.0,
    )
    return jnp.concatenate([r, v])


def test_oe_rv_roundtrip():
    a0, e0, i0 = 7000.0, 0.01, jnp.deg2rad(51.6)
    raan0, argp0, nu0 = jnp.deg2rad(247.0), jnp.deg2rad(130.0), jnp.deg2rad(25.0)
    r, v = elements.oe_to_rv(a0, e0, i0, raan0, argp0, nu0)
    a, e, i, raan, argp, nu = elements.rv_to_oe(r, v)
    np.testing.assert_allclose(float(a), a0, rtol=1e-10)
    np.testing.assert_allclose(float(e), e0, rtol=1e-8)
    for got, want in [(i, i0), (raan, raan0), (argp, argp0), (nu, nu0)]:
        np.testing.assert_allclose(float(got), float(want), rtol=1e-8)
    # Vis-viva: |v| matches sqrt(mu(2/r - 1/a)).
    vv = np.sqrt(c.GM_EARTH * (2.0 / np.linalg.norm(np.asarray(r)) - 1.0 / a0))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v)), vv, rtol=1e-12)


def test_two_body_energy_conservation():
    """One full orbit of two-body RK4 must conserve energy and return
    near the start."""
    x0 = _leo_state()
    period = float(elements.period(7000.0))
    steps = 600
    dt = period / steps
    traj = propagate.propagate(x0, dt, steps, degree=0, with_stm=False)
    e0 = float(elements.specific_energy(x0[:3], x0[3:]))
    efin = float(elements.specific_energy(traj.states[-1, :3], traj.states[-1, 3:]))
    np.testing.assert_allclose(efin, e0, rtol=1e-9)
    # Back to the start after one period (RK4 truncation ~ dt^4).
    assert float(jnp.linalg.norm(traj.states[-1, :3] - x0[:3])) < 1.0  # km


def test_j2_raan_drift():
    """J2 must regress the node at the textbook secular rate."""
    a0, e0, i0 = 7000.0, 0.001, jnp.deg2rad(51.6)
    r, v = elements.oe_to_rv(a0, e0, i0, jnp.deg2rad(40.0), 0.0, 0.0)
    x0 = jnp.concatenate([r, v])
    period = float(elements.period(a0))
    steps = 400
    traj = propagate.propagate(x0, period / steps, steps, degree=2, with_stm=False)
    _, _, _, raan_f, _, _ = elements.rv_to_oe(traj.states[-1, :3], traj.states[-1, 3:])
    p = a0 * (1 - e0**2)
    n = 2 * np.pi / period
    raan_dot = -1.5 * n * c.J2 * (c.R_EARTH / p) ** 2 * np.cos(float(i0))
    expected = float(jnp.deg2rad(40.0)) + raan_dot * period
    np.testing.assert_allclose(float(raan_f), expected, atol=2e-5)


def test_gravity_matches_potential_gradient():
    """Every zonal term must equal -grad of the zonal potential
    U = -(mu/r)[1 - sum J_n (R/r)^n P_n(sin phi)] — ground truth by
    autodiff (this caught a wrong hand-coded J3 term)."""
    import jax

    def potential(r, degree):
        rn = jnp.linalg.norm(r)
        s = r[2] / rn
        u = -c.GM_EARTH / rn
        if degree >= 2:
            u = u + c.GM_EARTH / rn * c.J2 * (c.R_EARTH / rn) ** 2 * 0.5 * (
                3 * s**2 - 1
            )
        if degree >= 3:
            u = u + c.GM_EARTH / rn * c.J3 * (c.R_EARTH / rn) ** 3 * 0.5 * (
                5 * s**3 - 3 * s
            )
        return u

    rng = np.random.default_rng(3)
    for _ in range(4):
        r = jnp.asarray(rng.standard_normal(3) * 2000 + np.array([6000.0, 800.0, 1500.0]))
        for d in (0, 2, 3):
            mine = gravity.acceleration(r, degree=d)
            ref = -jax.grad(lambda x: potential(x, d))(r)
            np.testing.assert_allclose(
                np.asarray(mine), np.asarray(ref), rtol=1e-13, atol=1e-20
            )


def test_stm_matches_finite_differences():
    x0 = _leo_state()
    dt = 10.0
    eom = functools.partial(gravity.eom, degree=2)
    phi_flow = integrators.flow(eom, dt)
    _, stm = integrators.x_and_jac(phi_flow, x0)
    eps = 1e-4
    fd = np.zeros((6, 6))
    for j in range(6):
        dx = jnp.zeros(6).at[j].set(eps)
        fd[:, j] = np.asarray((phi_flow(x0 + dx) - phi_flow(x0 - dx)) / (2 * eps))
    np.testing.assert_allclose(np.asarray(stm), fd, rtol=1e-5, atol=1e-7)
    # STM of a Hamiltonian flow is symplectic: det = 1.
    np.testing.assert_allclose(float(jnp.linalg.det(stm)), 1.0, rtol=1e-9)


def test_dopri5_more_accurate_than_rk4():
    x0 = _leo_state()
    period = float(elements.period(7000.0))
    dt = period / 200
    eom = functools.partial(gravity.eom, degree=0)
    fine = integrators.flow(eom, dt, "rk4", substeps=64)(x0)  # reference
    rk4 = integrators.flow(eom, dt, "rk4")(x0)
    dp5 = integrators.flow(eom, dt, "dopri5")(x0)
    err_rk4 = float(jnp.linalg.norm(rk4 - fine))
    err_dp5 = float(jnp.linalg.norm(dp5 - fine))
    assert err_dp5 < err_rk4 / 10


def test_station_geometry():
    s = stations.new_station(0.0, 0.0, 0.0, elevation_mask_deg=10.0)
    # Spacecraft directly overhead the equatorial station at theta=0.
    state = jnp.array([c.R_EARTH + 500.0, 0.0, 0.0, 0.0, 7.6, 0.0])
    assert float(stations.elevation(s, state, 0.0)) > jnp.deg2rad(89.0)
    assert bool(stations.visible(s, state, 0.0))
    obs = stations.range_range_rate(s, state, 0.0)
    np.testing.assert_allclose(float(obs[0]), 500.0, rtol=1e-12)
    # Range rate: station moves east with Earth; overhead pass range-rate
    # is the radial closing speed (zero radial velocity here -> small).
    assert abs(float(obs[1])) < 0.1
    # Opposite side of the Earth: invisible.
    state2 = jnp.array([-(c.R_EARTH + 500.0), 0.0, 0.0, 0.0, -7.6, 0.0])
    assert not bool(stations.visible(s, state2, 0.0))
    # After half an Earth rotation the far-side spacecraft becomes visible.
    assert bool(stations.visible(s, state2, jnp.pi))


def test_station_jacobian_matches_fd():
    s = stations.new_station(35.0, -120.0, 0.5)
    state = _leo_state()
    theta = 0.3
    ht = stations.measurement_jacobian(s, state, theta)
    assert ht.shape == (2, 6)
    eps = 1e-5
    fd = np.zeros((2, 6))
    for j in range(6):
        dx = jnp.zeros(6).at[j].set(eps)
        fd[:, j] = np.asarray(
            (stations.range_range_rate(s, state + dx, theta)
             - stations.range_range_rate(s, state - dx, theta)) / (2 * eps)
        )
    np.testing.assert_allclose(np.asarray(ht), fd, rtol=1e-4, atol=1e-8)


def test_measurement_generation_masks():
    x0 = _leo_state()
    sts = [
        stations.new_station(-35.398333, 148.981944, 0.691750),
        stations.new_station(40.427222, 355.749444 - 360.0, 0.834539),
        stations.new_station(35.247164, 243.205 - 360.0, 1.07114904),
    ]
    steps = 2160  # 6 h at 10 s — several station passes (hybrid_test.go arc)
    traj = propagate.propagate(x0, 10.0, steps, degree=2)
    ms = propagate.generate_measurements(sts, traj)
    assert ms.obs.shape == (steps, 2)
    has = np.asarray(ms.has_meas)
    assert 0 < has.sum() < steps  # some passes, some gaps
    # Where no station sees the craft, obs is zeroed and idx == -1.
    idx = np.asarray(ms.station_idx)
    assert np.all(idx[~has] == -1)
    assert np.all(np.asarray(ms.obs)[~has] == 0.0)
    # Ranges during passes are physically plausible (above horizon).
    rng = np.asarray(ms.obs)[has][:, 0]
    assert rng.min() > 300.0 and rng.max() < 4000.0
