"""Batch orbit determination + RIC SNC tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu import od
from gokalman_tpu.dynamics import elements, propagate, stations
from gokalman_tpu.dynamics.propagate import MeasurementSet


def _scenario(steps=8640):  # 24 h: the i=30 deg orbit's first pass is ~10 h in
    r, v = elements.oe_to_rv(
        7000.0, 0.001, jnp.deg2rad(30.0), jnp.deg2rad(80.0), jnp.deg2rad(40.0), 0.0
    )
    x0_truth = jnp.concatenate([r, v])
    sts = (
        stations.new_station(-35.398333, 148.981944, 0.0, 10.0),
        stations.new_station(40.427222, -4.250556, 0.0, 10.0),
        stations.new_station(35.247164, -116.795, 0.0, 10.0),
    )
    dt = 10.0
    traj = propagate.propagate(x0_truth, dt, steps, degree=2, with_stm=False)
    ms = propagate.generate_measurements(sts, traj)
    return x0_truth, sts, dt, traj, ms


def test_batch_od_recovers_epoch_state():
    """Perturbed epoch state recovered by iterated batch least squares
    (noiseless measurements -> converges to the truth epoch state)."""
    x0_truth, sts, dt, traj, ms = _scenario()
    has = np.asarray(ms.has_meas)
    first = int(np.argmax(has))
    sl = slice(first, len(has))
    ms2 = MeasurementSet(ms.obs[sl], ms.htildes[sl], ms.has_meas[sl], ms.station_idx[sl])
    x0_epoch = traj.states[first - 1]
    pert = jnp.array([0.2, -0.1, 0.15, 1e-5, -2e-5, 1e-5])
    r = jnp.diag(jnp.array([1e-6, 1e-10]))
    noise = gn.noiseless(jnp.zeros((3, 3)), r)

    x0_est, p0, rms = od.run_batch_od(
        x0_epoch + pert, noise, ms2, dt,
        stations_list=sts, degree=2, t0=float(traj.times[first - 1]),
        iterations=3,
    )
    err = np.asarray(x0_est - x0_epoch)
    assert np.linalg.norm(err[:3]) < 1e-5, err  # km
    assert np.linalg.norm(err[3:]) < 1e-8, err  # km/s
    # Residual RMS must shrink monotonically across iterations.
    rms = np.asarray(rms)
    assert rms[1] < rms[0] and rms[2] <= rms[1], rms
    # P0 is a valid covariance (PD, symmetric).
    p0 = np.asarray(p0)
    assert np.all(np.linalg.eigvalsh(0.5 * (p0 + p0.T)) > 0)


def test_snc_ric_runs_and_bounds_covariance():
    """RIC-rotated SNC (hybrid_test.go:295-327): with SNC armed the
    deviation covariance stays bounded through measurement gaps."""
    x0_truth, sts, dt, traj, ms = _scenario()
    has = np.asarray(ms.has_meas)
    first = int(np.argmax(has))
    sl = slice(first, len(has))
    ms2 = MeasurementSet(ms.obs[sl], ms.htildes[sl], ms.has_meas[sl], ms.station_idx[sl])
    x0_ref = traj.states[first - 1]
    t0 = float(traj.times[first - 1])
    p0 = jnp.diag(jnp.array([50.0, 50.0, 50.0, 1.0, 1.0, 1.0]))
    r = jnp.diag(jnp.array([1e-6, 1e-6]))
    q_ric = jnp.diag(jnp.array([1e-12, 1e-12, 1e-12]))
    noise = gn.noiseless(q_ric, r)
    steps = ms2.obs.shape[0]

    res_off = od.run_hybrid_od(
        x0_ref, p0, gn.noiseless(jnp.zeros((3, 3)), r), ms2, dt,
        stations_list=sts, degree=2, t0=t0,
    )
    res_on = od.run_hybrid_od(
        x0_ref, p0, noise, ms2, dt, stations_list=sts, degree=2, t0=t0,
        snc_mask=jnp.ones(steps, bool), snc_ric=True,
    )
    tr_off = np.trace(np.asarray(res_off.covariances), axis1=1, axis2=2)
    tr_on = np.trace(np.asarray(res_on.covariances), axis1=1, axis2=2)
    # SNC inflates covariance (process noise added every step).
    assert tr_on[-1] > tr_off[-1]
    assert np.all(np.isfinite(np.asarray(res_on.est_states)))
    # Errors remain at gate level (noiseless measurements).
    err = np.asarray(res_on.est_states) - np.asarray(traj.states[sl])
    m = np.asarray(ms2.has_meas)
    pos = np.sqrt((np.where(m[:, None], err, 0.0)[:, :3] ** 2).sum(1).mean())
    assert pos < 1e-3, pos
