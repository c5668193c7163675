"""Dynamic model compensation (DMC): a Gauss-Markov unmodeled-
acceleration state absorbs dynamics the filter doesn't model (truth
includes J3, the filter only J2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gokalman_tpu import noise as gn
from gokalman_tpu import od
from gokalman_tpu.dynamics import elements, propagate, stations
from gokalman_tpu.dynamics.propagate import MeasurementSet


def _scenario(steps=8640):
    r, v = elements.oe_to_rv(
        7000.0, 0.001, jnp.deg2rad(30.0), jnp.deg2rad(80.0),
        jnp.deg2rad(40.0), 0.0
    )
    x0_truth = jnp.concatenate([r, v])
    sts = (
        stations.new_station(-35.398333, 148.981944, 0.0, 10.0),
        stations.new_station(40.427222, -4.250556, 0.0, 10.0),
        stations.new_station(35.247164, -116.795, 0.0, 10.0),
    )
    dt = 10.0
    # TRUTH includes J3; the filters below model J2 only.
    traj = propagate.propagate(x0_truth, dt, steps, degree=3, with_stm=False)
    ms = propagate.generate_measurements(sts, traj)
    return x0_truth, sts, dt, traj, ms


def test_dmc_absorbs_unmodeled_j3():
    x0_truth, sts, dt, traj, ms = _scenario()
    has = np.asarray(ms.has_meas)
    first = int(np.argmax(has))
    sl = slice(first, len(has))
    ms2 = MeasurementSet(ms.obs[sl], ms.htildes[sl], ms.has_meas[sl],
                         ms.station_idx[sl])
    truth = traj.states[sl]
    x0_ref = traj.states[first - 1]
    t0 = float(traj.times[first - 1])
    p0 = jnp.diag(jnp.array([1.0, 1.0, 1.0, 1e-2, 1e-2, 1e-2]))
    r = jnp.diag(jnp.array([1e-6, 1e-10]))
    noise = gn.noiseless(jnp.zeros((3, 3)), r)
    steps = ms2.obs.shape[0]
    ekf = jnp.arange(steps) >= 100

    res_plain = od.run_hybrid_od(
        x0_ref, p0, noise, ms2, dt, stations_list=sts, degree=2, t0=t0,
        ekf_mask=ekf,
    )
    res_dmc = od.run_hybrid_od(
        x0_ref, p0, noise, ms2, dt, stations_list=sts, degree=2, t0=t0,
        ekf_mask=ekf, dmc_tau=3000.0, dmc_sigma=1e-9, dmc_w_p0=1e-13,
    )

    pos_p, vel_p = od.rms_errors(res_plain, truth)
    pos_d, vel_d = od.rms_errors(res_dmc, truth)
    # DMC estimates the missing J3 acceleration instead of eating it as
    # estimation error.
    # Measured: 0.47 km -> 0.044 km position RMS (10x), 4.2e-4 ->
    # 4.2e-5 km/s velocity RMS; generous margins for platform noise.
    assert float(pos_d) < 0.25 * float(pos_p), (float(pos_d), float(pos_p))
    assert float(vel_d) < 0.3 * float(vel_p), (float(vel_d), float(vel_p))

    # The estimated w is a real signal: its RMS during the measured
    # tail matches the J3 acceleration scale (~1e-7..1e-8 km/s^2) and
    # is far from zero.
    w = np.asarray(res_dmc.est_states[:, 6:9])
    tail = w[w.shape[0] // 2:]
    w_rms = float(np.sqrt(np.mean(np.sum(tail**2, axis=1))))
    assert 1e-10 < w_rms < 1e-6, w_rms

    # 9-dim covariance stays finite and PD on the diagonal.
    cov = np.asarray(res_dmc.covariances[-1])
    assert cov.shape == (9, 9)
    assert np.all(np.diag(cov) > 0)


def test_dmc_rejects_conflicting_options():
    x0_truth, sts, dt, traj, ms = _scenario(steps=50)
    noise = gn.noiseless(jnp.zeros((3, 3)), jnp.eye(2))
    with pytest.raises(ValueError):
        od.run_hybrid_od(
            traj.states[0], jnp.eye(6), noise, ms, dt, stations_list=sts,
            dmc_tau=100.0, dmc_sigma=1e-9,
            snc_mask=jnp.ones(ms.obs.shape[0], bool),
        )
    with pytest.raises(ValueError):
        od.run_hybrid_od(
            traj.states[0], jnp.eye(6), noise, ms, dt, stations_list=sts,
            dmc_tau=100.0,
        )


def test_dmc_composes_with_nis_gating():
    """Option cross-product: DMC + chi-square innovation gating run
    together (gate evaluated in the 9-state space) without shape
    errors, and clean measurements are accepted."""
    import jax.numpy as jnp

    x0_truth, sts, dt, traj, ms = _scenario()
    import numpy as np
    has = np.asarray(ms.has_meas)
    assert has.any()
    first = max(int(np.argmax(has)), 1)
    sl = slice(first, min(first + 600, len(has)))
    ms2 = MeasurementSet(ms.obs[sl], ms.htildes[sl], ms.has_meas[sl],
                         ms.station_idx[sl])
    noise = gn.noiseless(jnp.zeros((3, 3)), jnp.diag(jnp.array([1e-6, 1e-10])))
    res = od.run_hybrid_od(
        traj.states[first - 1], jnp.eye(6), noise, ms2, dt,
        stations_list=sts, degree=2, t0=float(traj.times[first - 1]),
        dmc_tau=3000.0, dmc_sigma=1e-9, nis_gate=50.0,
    )
    assert res.est_states.shape[1] == 9
    acc = np.asarray(res.accepted)
    m = np.asarray(ms2.has_meas)
    assert acc[m].mean() > 0.9  # clean data mostly accepted
