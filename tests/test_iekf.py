"""Invariant-EKF navigation tier (filters/iekf.py, dynamics/liegroup.py).

The decisive pins, in order of sharpness:
- SE_2(3) group algebra: exp/log roundtrip, closed-form inverse, the
  exact adjoint identity X exp(xi^) X^-1 == exp((Ad_X xi)^).
- The DISCRETE log-linear error property (Barrau-Bonnabel theorem in
  the form this implementation actually uses): for noise-free,
  bias-free IMU propagation the right-invariant error twist satisfies
  xi_{k+1} = Phi xi_k DIGIT-LEVEL for a LARGE initial error (0.9 rad /
  2 m/s / 5 m) — no linearization residual at all.  A standard EKF
  parameterization cannot pass this test; it is what "invariant"
  buys.
- Exact reduction to a linear KF when the attitude is certain (the
  gain/Joseph/noise-mapping plumbing pinned against filters/vanilla).
- Statistical NEES consistency over Monte-Carlo noise draws, and
  convergence from a 120-degree attitude error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gokalman_tpu import noise as gnoise
from gokalman_tpu import vanilla
from gokalman_tpu.dynamics import liegroup as lg
from gokalman_tpu.filters import iekf

G = jnp.asarray([0.0, 0.0, -9.81])


def _rand_rot(rng, scale=1.0):
    return lg.so3_exp(jnp.asarray(rng.standard_normal(3)) * scale)


def _propagate_truth(r, v, p, omega, a_body, dt):
    """The discrete strapdown map (same model the filter uses)."""
    a_w = r @ a_body + G
    r_n = r @ lg.so3_exp(omega * dt)
    v_n = v + a_w * dt
    p_n = p + v * dt + 0.5 * a_w * dt**2
    return r_n, v_n, p_n


def _truth_arc(rng, t_steps, dt, seed_state=None):
    """A maneuvering arc: sinusoid body rates + specific force."""
    if seed_state is None:
        r = jnp.eye(3)
        v = jnp.asarray([1.0, 0.0, 0.0])
        p = jnp.zeros(3)
    else:
        r, v, p = seed_state
    ks = np.arange(t_steps)
    omegas = jnp.asarray(np.stack([
        0.3 * np.sin(0.05 * ks), 0.2 * np.cos(0.03 * ks),
        0.1 * np.sin(0.02 * ks + 1.0)], axis=1))
    a_bodies = jnp.asarray(np.stack([
        0.5 * np.cos(0.04 * ks), 0.3 * np.sin(0.06 * ks),
        9.81 + 0.2 * np.sin(0.05 * ks)], axis=1))
    rs, vs, ps = [], [], []
    for k in range(t_steps):
        r, v, p = _propagate_truth(r, v, p, omegas[k], a_bodies[k], dt)
        rs.append(r)
        vs.append(v)
        ps.append(p)
    return (omegas, a_bodies, jnp.stack(rs), jnp.stack(vs),
            jnp.stack(ps))


LANDMARKS = jnp.asarray([[10.0, 0.0, 0.0], [0.0, 12.0, 0.0],
                         [-8.0, -8.0, 5.0], [3.0, -10.0, -4.0]])


def _landmark_obs(rng, rs, ps, sigma):
    y = jnp.einsum("tji,lj->tli", rs, LANDMARKS) - jnp.einsum(
        "tji,tj->ti", rs, ps)[:, None, :]
    return y + sigma * jnp.asarray(
        rng.standard_normal((rs.shape[0], LANDMARKS.shape[0], 3)))


# ---------------------------------------------------------------------------
# group algebra
# ---------------------------------------------------------------------------


def test_se23_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    for scale in (1e-9, 1e-3, 0.5, 2.0):
        xi = jnp.asarray(rng.standard_normal(9)) * scale
        x = lg.se23_exp(xi)
        np.testing.assert_allclose(lg.se23_log(x), xi, atol=1e-11)
        # closed-form inverse
        np.testing.assert_allclose(x @ lg.se23_inv(x), np.eye(5),
                                   atol=1e-12)


def test_se23_adjoint_identity():
    """X exp(xi^) X^-1 == exp((Ad_X xi)^) — exact, not first-order."""
    rng = np.random.default_rng(1)
    x = lg.se23_exp(jnp.asarray(rng.standard_normal(9)))
    for _ in range(3):
        xi = jnp.asarray(rng.standard_normal(9)) * 0.7
        lhs = x @ lg.se23_exp(xi) @ lg.se23_inv(x)
        rhs = lg.se23_exp(lg.se23_adjoint(x) @ xi)
        np.testing.assert_allclose(lhs, rhs, atol=1e-10)


def test_so3_jacobian_identities():
    rng = np.random.default_rng(2)
    for scale in (1e-8, 0.1, 1.5, 3.0):
        phi = jnp.asarray(rng.standard_normal(3))
        phi = phi / jnp.linalg.norm(phi) * scale
        jl = lg.so3_left_jacobian(phi)
        np.testing.assert_allclose(jl @ lg.so3_left_jacobian_inv(phi),
                                   np.eye(3), atol=1e-10)
        # exp(phi^) = I + [phi x] J_l(phi)
        from gokalman_tpu.dynamics.attitude import cross_matrix
        np.testing.assert_allclose(
            lg.so3_exp(phi),
            np.eye(3) + np.asarray(cross_matrix(phi) @ jl), atol=1e-12)


# ---------------------------------------------------------------------------
# the invariance pin
# ---------------------------------------------------------------------------


def test_discrete_log_linear_error_propagation():
    """Noise-free dead reckoning from a LARGE initial error: the
    right-invariant error twist must follow xi_{k+1} = Phi xi_k
    digit-level — zero linearization residual at 0.9 rad attitude /
    2 m/s velocity / 5 m position error.  This is the group-affine
    property that defines the IEKF; a standard EKF error model has
    O(|xi|^2) residual here."""
    rng = np.random.default_rng(3)
    dt = 0.05
    t_steps = 120
    omegas, a_bodies, rs, vs, ps = _truth_arc(rng, t_steps, dt)

    xi0 = jnp.asarray([0.5, -0.5, 0.45, 1.2, -0.8, 1.0,
                       3.0, -2.0, 3.0])  # |phi| ~ 0.84 rad
    x_true0 = lg.se23_from_rvp(jnp.eye(3), jnp.asarray([1.0, 0.0, 0.0]),
                               jnp.zeros(3))
    x_hat0 = lg.se23_exp(xi0) @ x_true0
    r0, v0, p0 = lg.se23_rvp(x_hat0)

    model, state = iekf.new(r0, v0, p0, jnp.eye(9), LANDMARKS,
                            sigma_g=0.0, sigma_a=0.0, sigma_meas=1.0,
                            dt=dt, g=G)
    _, est = iekf.run(model, state, omegas, a_bodies)

    # closed-form exact Phi (state-independent)
    gx = np.zeros((3, 3))
    gx[:3, :3] = np.asarray(
        [[0, 9.81, 0], [-9.81, 0, 0], [0, 0, 0]])  # [g x], g=-9.81 e3
    phi = np.eye(9)
    phi[3:6, 0:3] = gx * dt
    phi[6:9, 0:3] = gx * 0.5 * dt**2
    phi[6:9, 3:6] = np.eye(3) * dt

    xi = np.asarray(xi0)
    for k in range(t_steps):
        xi = phi @ xi
        x_hat_k = lg.se23_from_rvp(est.rot[k], est.vel[k], est.pos[k])
        x_true_k = lg.se23_from_rvp(rs[k], vs[k], ps[k])
        xi_meas = lg.se23_log(x_hat_k @ lg.se23_inv(x_true_k))
        np.testing.assert_allclose(np.asarray(xi_meas), xi, atol=1e-9,
                                   err_msg=f"step {k}")


def test_covariance_dead_reckoning_matches_phi():
    """With no measurements, P_k == Phi^k P0 (Phi^k)^T + noise terms;
    check the noise-free covariance transport exactly."""
    dt = 0.1
    model, state = iekf.new(jnp.eye(3), jnp.zeros(3), jnp.zeros(3),
                            jnp.eye(9) * 0.1, LANDMARKS, sigma_g=0.0,
                            sigma_a=0.0, sigma_meas=1.0, dt=dt, g=G)
    t_steps = 20
    omegas = jnp.tile(jnp.asarray([0.1, -0.2, 0.3]), (t_steps, 1))
    accels = jnp.tile(jnp.asarray([0.0, 0.0, 9.81]), (t_steps, 1))
    _, est = iekf.run(model, state, omegas, accels)
    phi, _ = iekf._phi_q(model, state)
    p_expect = np.asarray(jnp.eye(9) * 0.1)
    phi = np.asarray(phi)
    for k in range(t_steps):
        p_expect = phi @ p_expect @ phi.T
        np.testing.assert_allclose(np.asarray(est.covariance[k]),
                                   p_expect, atol=1e-12)


# ---------------------------------------------------------------------------
# reduction to the linear KF
# ---------------------------------------------------------------------------


def test_known_attitude_reduces_to_linear_kf():
    """Zero attitude uncertainty + noiseless gyro: the IEKF on (v, p)
    must equal a vanilla KF on x = [v; p] digit-level — pins the gain,
    Joseph update, noise mapping, and correction signs."""
    rng = np.random.default_rng(4)
    dt = 0.1
    t_steps = 60
    sigma_a, sigma_m = 0.05, 0.3
    omegas, a_bodies, rs, vs, ps = _truth_arc(rng, t_steps, dt)

    # accel noise on the measured specific force
    a_noise = jnp.asarray(rng.standard_normal((t_steps, 3))) * (
        sigma_a / np.sqrt(dt))
    obs = _landmark_obs(rng, rs, ps, sigma_m)

    p0_vp = jnp.eye(6) * 2.0
    cov0 = jnp.zeros((9, 9)).at[3:, 3:].set(p0_vp)
    model, state = iekf.new(jnp.eye(3), jnp.asarray([1.0, 0.0, 0.0]),
                            jnp.zeros(3), cov0, LANDMARKS, sigma_g=0.0,
                            sigma_a=sigma_a, sigma_meas=sigma_m, dt=dt,
                            g=G)
    _, est = iekf.run(model, state, omegas, a_bodies + a_noise, obs)
    np.testing.assert_allclose(np.asarray(est.rot[-1]),
                               np.asarray(rs[-1]), atol=1e-12)

    # the equivalent linear KF on [v; p]
    eye3 = np.eye(3)
    f = np.block([[eye3, np.zeros((3, 3))], [eye3 * dt, eye3]])
    q = sigma_a**2 * dt * np.block([[eye3, eye3 * dt],
                                    [eye3 * dt, eye3 * dt**2]])
    nl = LANDMARKS.shape[0]
    h = np.zeros((3 * nl, 6))
    h[:, 3:] = np.tile(eye3, (nl, 1))
    r_kf = sigma_m**2 * np.eye(3 * nl)
    km, ks = vanilla.new(jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
                         jnp.asarray(np.kron(np.eye(2), np.eye(3))
                                     * 2.0),
                         jnp.asarray(f), jnp.eye(6), jnp.asarray(h),
                         gnoise.noiseless(jnp.asarray(q),
                                          jnp.asarray(r_kf)))
    # controls: [a_w dt; 0.5 a_w dt^2] with the *measured* accel;
    # measurement: per-landmark l - Rhat y_obs stacked (world frame)
    r_hat = jnp.eye(3)
    x_kf = ks
    for k in range(t_steps):
        a_w = r_hat @ (a_bodies[k] + a_noise[k]) + G
        u = jnp.concatenate([a_w * dt, 0.5 * a_w * dt**2])
        r_hat_next = r_hat @ lg.so3_exp(omegas[k] * dt)
        y_kf = (LANDMARKS - obs[k] @ r_hat_next.T).reshape(3 * nl)
        x_kf, e_kf = vanilla.step(km, x_kf, y_kf, control=u)
        r_hat = r_hat_next
        np.testing.assert_allclose(np.asarray(est.vel[k]),
                                   np.asarray(e_kf.state[:3]),
                                   atol=1e-9, err_msg=f"vel step {k}")
        np.testing.assert_allclose(np.asarray(est.pos[k]),
                                   np.asarray(e_kf.state[3:]),
                                   atol=1e-9, err_msg=f"pos step {k}")
        np.testing.assert_allclose(np.asarray(est.covariance[k][3:, 3:]),
                                   np.asarray(e_kf.covariance),
                                   atol=1e-9)


# ---------------------------------------------------------------------------
# statistical consistency + convergence
# ---------------------------------------------------------------------------


def test_nees_consistency():
    """Mean NEES of the 9-dim right-invariant error over MC noise
    draws stays in the chi-square band."""
    rng = np.random.default_rng(5)
    dt = 0.02
    t_steps = 250
    n_mc = 48
    sigma_g, sigma_a, sigma_m = 0.003, 0.03, 0.1
    omegas, a_bodies, rs, vs, ps = _truth_arc(rng, t_steps, dt)

    cov0 = jnp.diag(jnp.asarray([1e-4] * 3 + [1e-2] * 3 + [1e-2] * 3))
    l0 = jnp.linalg.cholesky(cov0)

    def one_run(key):
        kg, ka, km, k0 = jax.random.split(key, 4)
        gn = sigma_g / np.sqrt(dt) * jax.random.normal(
            kg, (t_steps, 3))
        an = sigma_a / np.sqrt(dt) * jax.random.normal(
            ka, (t_steps, 3))
        mn = sigma_m * jax.random.normal(
            km, (t_steps, LANDMARKS.shape[0], 3))
        obs = (jnp.einsum("tji,lj->tli", rs, LANDMARKS)
               - jnp.einsum("tji,tj->ti", rs, ps)[:, None, :] + mn)
        # initial error drawn from cov0 (right-invariant injection)
        xi0 = l0 @ jax.random.normal(k0, (9,))
        x0 = lg.se23_exp(xi0) @ lg.se23_from_rvp(
            jnp.eye(3), jnp.asarray([1.0, 0.0, 0.0]), jnp.zeros(3))
        r0, v0, p0 = lg.se23_rvp(x0)
        model, state = iekf.new(r0, v0, p0, cov0, LANDMARKS,
                                sigma_g=sigma_g, sigma_a=sigma_a,
                                sigma_meas=sigma_m, dt=dt, g=G)
        _, est = iekf.run(model, state, omegas + gn, a_bodies + an, obs)

        def nees_k(rot, vel, pos, cov, rt, vt, pt):
            xi = iekf.error_twist(
                lg.se23_from_rvp(rot, vel, pos), rt, vt, pt)
            from gokalman_tpu import linalg
            return xi @ linalg.solve_psd(cov, xi)

        return jax.vmap(nees_k)(est.rot, est.vel, est.pos,
                                est.covariance, rs, vs, ps)

    keys = jax.random.split(jax.random.PRNGKey(42), n_mc)
    nees = jax.jit(jax.vmap(one_run))(keys)  # [n_mc, T]
    # skip the first 30 transient steps; average over runs and time
    tail = jnp.mean(nees[:, 30:])
    assert 8.0 < float(tail) < 10.0, float(tail)


def test_large_error_convergence():
    """120-degree attitude error + 5 m position error: the IEKF must
    converge (the log-linear error model holds globally)."""
    rng = np.random.default_rng(6)
    dt = 0.05
    t_steps = 200
    sigma_g, sigma_a, sigma_m = 0.002, 0.02, 0.05
    omegas, a_bodies, rs, vs, ps = _truth_arc(rng, t_steps, dt)
    obs = _landmark_obs(rng, rs, ps, sigma_m)

    axis = np.asarray([0.6, -0.64, 0.48])
    axis = axis / np.linalg.norm(axis)
    phi0 = jnp.asarray(axis * np.deg2rad(120.0))
    r0 = lg.so3_exp(phi0)  # truth starts at identity
    model, state = iekf.new(
        r0, jnp.asarray([1.0, 0.0, 0.0]) + 1.0,
        jnp.asarray([5.0, -5.0, 3.0]),
        jnp.diag(jnp.asarray([5.0] * 3 + [4.0] * 3 + [50.0] * 3)),
        LANDMARKS, sigma_g=sigma_g, sigma_a=sigma_a, sigma_meas=sigma_m,
        dt=dt, g=G)
    _, est = iekf.run(model, state, omegas, a_bodies, obs)

    ang_err = lg.so3_log(est.rot[-1] @ rs[-1].T)
    pos_err = est.pos[-1] - ps[-1]
    assert float(jnp.linalg.norm(ang_err)) < np.deg2rad(1.0)
    assert float(jnp.linalg.norm(pos_err)) < 0.2


def test_bias_estimation():
    """with_bias=True: constant true IMU biases are recovered."""
    rng = np.random.default_rng(7)
    dt = 0.02
    t_steps = 800
    sigma_g, sigma_a, sigma_m = 0.002, 0.02, 0.05
    omegas, a_bodies, rs, vs, ps = _truth_arc(rng, t_steps, dt)
    obs = _landmark_obs(rng, rs, ps, sigma_m)
    bg_true = jnp.asarray([0.01, -0.02, 0.015])
    ba_true = jnp.asarray([0.05, 0.03, -0.04])

    cov0 = jnp.diag(jnp.asarray(
        [0.01] * 3 + [0.1] * 3 + [0.1] * 3 + [1e-3] * 3 + [1e-2] * 3))
    model, state = iekf.new(
        jnp.eye(3), jnp.asarray([1.0, 0.0, 0.0]), jnp.zeros(3), cov0,
        LANDMARKS, sigma_g=sigma_g, sigma_a=sigma_a, sigma_meas=sigma_m,
        dt=dt, g=G, with_bias=True, sigma_bg=1e-5, sigma_ba=1e-4)
    gn = sigma_g / np.sqrt(dt) * jnp.asarray(
        rng.standard_normal((t_steps, 3)))
    an = sigma_a / np.sqrt(dt) * jnp.asarray(
        rng.standard_normal((t_steps, 3)))
    _, est = iekf.run(model, state, omegas + bg_true + gn,
                      a_bodies + ba_true + an, obs)
    np.testing.assert_allclose(np.asarray(est.bias[-1][:3]),
                               np.asarray(bg_true), atol=3e-3)
    np.testing.assert_allclose(np.asarray(est.bias[-1][3:]),
                               np.asarray(ba_true), atol=2e-2)
    # attitude still tracked through the biased IMU
    ang = lg.so3_log(est.rot[-1] @ rs[-1].T)
    assert float(jnp.linalg.norm(ang)) < np.deg2rad(1.0)


def test_gps_update_and_mask():
    """GPS position rows: the update shrinks position error; a masked
    GPS step is bit-identical to the pure landmark step."""
    rng = np.random.default_rng(8)
    dt = 0.05
    t_steps = 100
    omegas, a_bodies, rs, vs, ps = _truth_arc(rng, t_steps, dt)
    gps = ps + 0.5 * jnp.asarray(rng.standard_normal((t_steps, 3)))

    model, state = iekf.new(
        jnp.eye(3), jnp.asarray([1.0, 0.0, 0.0]), jnp.zeros(3) + 2.0,
        jnp.diag(jnp.asarray([1e-4] * 3 + [1.0] * 3 + [25.0] * 3)),
        LANDMARKS, sigma_g=1e-3, sigma_a=1e-2, sigma_meas=0.1, dt=dt,
        g=G, sigma_gps=0.5)
    # GPS only (no landmarks): dead reckoning would drift; GPS pins p
    _, est = iekf.run(model, state, omegas, a_bodies,
                      gps_obs=gps, gps_masks=jnp.ones(t_steps, bool))
    pos_rms = float(jnp.sqrt(jnp.mean(
        jnp.sum((est.pos[-30:] - ps[-30:]) ** 2, axis=1))))
    assert pos_rms < 0.5, pos_rms

    # all-masked GPS == pure prediction, even with NaN observations
    gps_nan = jnp.full_like(gps, jnp.nan)
    _, e_masked = iekf.run(model, state, omegas, a_bodies,
                           gps_obs=gps_nan,
                           gps_masks=jnp.zeros(t_steps, bool))
    _, e_pred = iekf.run(model, state, omegas, a_bodies)
    np.testing.assert_array_equal(np.asarray(e_masked.pos),
                                  np.asarray(e_pred.pos))
    # the masked gain is solve(I, 0) — zero to solver round-off
    # (~1e-20), so the covariance matches to that level, not bitwise
    np.testing.assert_allclose(np.asarray(e_masked.covariance),
                               np.asarray(e_pred.covariance),
                               atol=1e-17)


def test_masked_landmark_poison():
    """NaN/inf poison in masked landmark slots must be bit-identical
    to zero padding (the repo-wide padded-slot contract)."""
    rng = np.random.default_rng(9)
    dt = 0.05
    t_steps = 40
    omegas, a_bodies, rs, vs, ps = _truth_arc(rng, t_steps, dt)
    obs = _landmark_obs(rng, rs, ps, 0.1)
    masks = jnp.asarray(rng.random((t_steps, LANDMARKS.shape[0])) < 0.6)

    model, state = iekf.new(
        jnp.eye(3), jnp.asarray([1.0, 0.0, 0.0]), jnp.zeros(3),
        jnp.eye(9) * 0.1, LANDMARKS, sigma_g=1e-3, sigma_a=1e-2,
        sigma_meas=0.1, dt=dt, g=G)

    obs_zero = jnp.where(masks[:, :, None], obs, 0.0)
    obs_poison = jnp.where(masks[:, :, None], obs, jnp.nan)
    _, e_zero = iekf.run(model, state, omegas, a_bodies, obs_zero,
                         obs_masks=masks)
    _, e_poison = iekf.run(model, state, omegas, a_bodies, obs_poison,
                           obs_masks=masks)
    np.testing.assert_array_equal(np.asarray(e_zero.pos),
                                  np.asarray(e_poison.pos))
    np.testing.assert_array_equal(np.asarray(e_zero.covariance),
                                  np.asarray(e_poison.covariance))
    assert bool(jnp.all(jnp.isfinite(e_poison.covariance)))


def test_zupt_velocity_observation():
    """Body-velocity rows (odometry / ZUPT): a stationary vehicle with
    a noisy IMU — dead reckoning drifts quadratically; ZUPT
    (vel_obs = 0) pins velocity and bounds the drift.  Also pins the
    exact-form reduction: with certain attitude and a noiseless gyro
    the velocity update equals the hand-computed scalar KF."""
    rng = np.random.default_rng(10)
    dt = 0.02
    t_steps = 500
    sigma_a = 0.05
    # stationary truth: R = I, v = 0, p = 0; accelerometer measures
    # the specific force -R^T g plus noise
    gyros = jnp.zeros((t_steps, 3))
    accels = (-np.asarray(G) + sigma_a / np.sqrt(dt)
              * rng.standard_normal((t_steps, 3)))
    accels = jnp.asarray(accels)

    cov0 = jnp.diag(jnp.asarray([1e-6] * 3 + [1e-2] * 3 + [1e-2] * 3))
    model, state = iekf.new(jnp.eye(3), jnp.zeros(3), jnp.zeros(3),
                            cov0, LANDMARKS, sigma_g=1e-4,
                            sigma_a=sigma_a, sigma_meas=0.1, dt=dt,
                            g=G, sigma_vel=0.01)
    # dead reckoning
    _, e_dr = iekf.run(model, state, gyros, accels)
    # ZUPT at every step
    _, e_z = iekf.run(model, state, gyros, accels,
                      vel_obs=jnp.zeros((t_steps, 3)),
                      vel_masks=jnp.ones(t_steps, bool))
    vel_dr = float(jnp.linalg.norm(e_dr.vel[-1]))
    vel_z = float(jnp.linalg.norm(e_z.vel[-1]))
    pos_z = float(jnp.linalg.norm(e_z.pos[-1]))
    assert vel_z < 0.05 * vel_dr + 1e-3, (vel_z, vel_dr)
    assert pos_z < 0.1 * float(jnp.linalg.norm(e_dr.pos[-1]))

    # masked vel rows with NaN poison == pure prediction (states)
    _, e_masked = iekf.run(model, state, gyros, accels,
                           vel_obs=jnp.full((t_steps, 3), jnp.nan),
                           vel_masks=jnp.zeros(t_steps, bool))
    np.testing.assert_array_equal(np.asarray(e_masked.pos),
                                  np.asarray(e_dr.pos))
    assert bool(jnp.all(jnp.isfinite(e_masked.covariance)))

    # exact-form reduction: sigma_g = 0, attitude certain, one step —
    # v-update is the standard KF with H = I on v (hand-computed)
    m1, s1 = iekf.new(jnp.eye(3), jnp.asarray([0.5, 0.0, 0.0]),
                      jnp.zeros(3),
                      jnp.diag(jnp.asarray([0.0] * 3 + [1.0] * 3
                                           + [0.0] * 3)),
                      LANDMARKS, sigma_g=0.0, sigma_a=0.1,
                      sigma_meas=0.1, dt=dt, g=G, sigma_vel=0.2)
    y_vel = jnp.asarray([0.1, -0.2, 0.3])
    _, e1 = iekf.step(m1, s1, jnp.zeros(3), -jnp.asarray(G),
                      vel_obs=y_vel)
    # predicted v = 0.5 e1 (accel cancels gravity exactly); P_vv after
    # predict = 1 + sigma_a^2 dt; K = P/(P + R); v+ = v - K (v - y)
    p_pred = 1.0 + 0.1**2 * dt
    k_gain = p_pred / (p_pred + 0.2**2)
    v_pred = np.array([0.5, 0.0, 0.0])
    v_expect = v_pred - k_gain * (v_pred - np.asarray(y_vel))
    np.testing.assert_allclose(np.asarray(e1.vel), v_expect, atol=1e-9)


def test_invariant_rts_reduces_to_linear_rts():
    """Certain attitude + noiseless gyro: the invariant RTS must equal
    the textbook linear RTS on [v; p] digit-level (same reduction
    scenario as the filter pin)."""
    rng = np.random.default_rng(12)
    dt = 0.1
    t_steps = 40
    sigma_a, sigma_m = 0.05, 0.3
    omegas, a_bodies, rs, vs, ps = _truth_arc(rng, t_steps, dt)
    a_noise = jnp.asarray(rng.standard_normal((t_steps, 3))) * (
        sigma_a / np.sqrt(dt))
    obs = _landmark_obs(rng, rs, ps, sigma_m)

    # phi-block 1e-12, not 0: the RTS inverts the full 9x9 predicted
    # covariance, and an exactly singular P_pred (certain attitude)
    # NaNs the solve; epsilon variance leaves the [v,p] answer
    # unchanged at the 1e-8 pin level
    cov0 = (jnp.zeros((9, 9)).at[3:, 3:].set(jnp.eye(6) * 2.0)
            .at[:3, :3].set(jnp.eye(3) * 1e-12))
    model, state = iekf.new(jnp.eye(3), jnp.asarray([1.0, 0.0, 0.0]),
                            jnp.zeros(3), cov0, LANDMARKS, sigma_g=0.0,
                            sigma_a=sigma_a, sigma_meas=sigma_m, dt=dt,
                            g=G)
    _, est = iekf.run(model, state, omegas, a_bodies + a_noise, obs)
    r_s, v_s, p_s, _, cov_s = iekf.rts_smoother(model, est, omegas,
                                                a_bodies + a_noise)

    # textbook RTS on the recorded [v; p] filter trace
    eye3 = np.eye(3)
    f = np.block([[eye3, np.zeros((3, 3))], [eye3 * dt, eye3]])
    xf = np.concatenate([np.asarray(est.vel), np.asarray(est.pos)], 1)
    pf = np.asarray(est.covariance)[:, 3:, 3:]
    pp = np.asarray(est.pred_covariance)[:, 3:, 3:]
    xs = xf.copy()
    psm = pf.copy()
    for k in range(t_steps - 2, -1, -1):
        # predicted mean from posterior k (known control input)
        a_w = np.asarray(est.rot[k]) @ np.asarray(
            a_bodies[k + 1] + a_noise[k + 1]) + np.asarray(G)
        u = np.concatenate([a_w * dt, 0.5 * a_w * dt**2])
        x_pred = f @ xf[k] + u
        g_k = pf[k] @ f.T @ np.linalg.inv(pp[k + 1])
        xs[k] = xf[k] + g_k @ (xs[k + 1] - x_pred)
        psm[k] = pf[k] + g_k @ (psm[k + 1] - pp[k + 1]) @ g_k.T
    np.testing.assert_allclose(np.asarray(v_s), xs[:, :3], atol=1e-8)
    np.testing.assert_allclose(np.asarray(p_s), xs[:, 3:], atol=1e-8)
    np.testing.assert_allclose(np.asarray(cov_s)[:, 3:, 3:], psm,
                               atol=1e-8)
    # attitude untouched (certain up to the epsilon prior)
    np.testing.assert_allclose(np.asarray(r_s), np.asarray(est.rot),
                               atol=1e-8)


def test_invariant_rts_improves_track():
    """Sparse fixes: smoothing beats filtering on position RMS,
    matches the filter at the final step, and bridges a measurement
    outage (the filter drifts through it; the smoother interpolates)."""
    rng = np.random.default_rng(13)
    dt = 0.02
    t_steps = 600
    sigma_g, sigma_a, sigma_m = 0.002, 0.02, 0.05
    omegas, a_bodies, rs, vs, ps = _truth_arc(rng, t_steps, dt)
    obs = _landmark_obs(rng, rs, ps, sigma_m)
    gn = sigma_g / np.sqrt(dt) * jnp.asarray(
        rng.standard_normal((t_steps, 3)))
    an = sigma_a / np.sqrt(dt) * jnp.asarray(
        rng.standard_normal((t_steps, 3)))
    masks = np.zeros((t_steps, LANDMARKS.shape[0]), bool)
    masks[::25, :] = True
    masks[200:400, :] = False  # 4 s outage

    cov0 = jnp.diag(jnp.asarray([1e-4] * 3 + [1e-2] * 3 + [1e-2] * 3))
    model, state = iekf.new(jnp.eye(3), jnp.asarray([1.0, 0.0, 0.0]),
                            jnp.zeros(3), cov0, LANDMARKS,
                            sigma_g=sigma_g, sigma_a=sigma_a,
                            sigma_meas=sigma_m, dt=dt, g=G)
    _, est = iekf.run(model, state, omegas + gn, a_bodies + an, obs,
                      obs_masks=jnp.asarray(masks))
    r_s, v_s, p_s, _, cov_s = iekf.rts_smoother(model, est,
                                                omegas + gn,
                                                a_bodies + an)

    err_f = np.linalg.norm(np.asarray(est.pos) - np.asarray(ps), axis=1)
    err_s = np.linalg.norm(np.asarray(p_s) - np.asarray(ps), axis=1)
    assert err_s.mean() < 0.7 * err_f.mean(), (err_s.mean(),
                                               err_f.mean())
    # outage bridged: smoother error inside the gap well below filter
    assert err_s[200:400].mean() < 0.5 * err_f[200:400].mean()
    # endpoint identity
    np.testing.assert_array_equal(np.asarray(p_s[-1]),
                                  np.asarray(est.pos[-1]))
    assert bool(jnp.all(jnp.isfinite(cov_s)))
