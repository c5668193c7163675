"""Iterated-EKF orbit determination tests."""

import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu import od
from gokalman_tpu.dynamics import elements, propagate, stations
from gokalman_tpu.dynamics.propagate import MeasurementSet


def _scenario():
    r, v = elements.oe_to_rv(
        7000.0, 0.001, jnp.deg2rad(45.0), jnp.deg2rad(30.0), jnp.deg2rad(10.0), 0.0
    )
    x0_truth = jnp.concatenate([r, v])
    sts = (
        stations.new_station(-35.398333, 148.981944, 0.0, 10.0),
        stations.new_station(40.427222, -4.250556, 0.0, 10.0),
        stations.new_station(35.247164, -116.795, 0.0, 10.0),
    )
    dt, steps = 10.0, 2160
    traj = propagate.propagate(x0_truth, dt, steps, degree=2, with_stm=False)
    ms = propagate.generate_measurements(sts, traj)
    has = np.asarray(ms.has_meas)
    first = max(int(np.argmax(has)), 1)
    sl = slice(first, steps)
    ms2 = MeasurementSet(ms.obs[sl], ms.htildes[sl], ms.has_meas[sl], ms.station_idx[sl])
    return sts, dt, traj, ms2, first, sl


def test_iekf_beats_ckf_at_large_deviation():
    sts, dt, traj, ms, first, sl = _scenario()
    pert = jnp.array([0.7, -0.5, 0.5, 5e-4, -5e-4, 5e-4])  # ~1 km, 1 m/s
    x0_ref = traj.states[first - 1] + pert
    p0 = jnp.diag(jnp.array([1.0, 1.0, 1.0, 1e-5, 1e-5, 1e-5]))
    noise = gn.noiseless(jnp.zeros((3, 3)), jnp.diag(jnp.array([1e-6, 1e-6])))
    t0 = float(traj.times[first - 1])

    ckf = od.run_hybrid_od(
        x0_ref, p0, noise, ms, dt, stations_list=sts, degree=2, t0=t0
    )
    iekf = od.run_hybrid_od(
        x0_ref, p0, noise, ms, dt, stations_list=sts, degree=2, t0=t0,
        iekf_iters=3,
    )
    m = np.asarray(ms.has_meas)
    idx = np.nonzero(m)[0]
    late = idx[len(idx) // 2 :]

    def pos_rms(res):
        err = np.asarray(res.est_states) - np.asarray(traj.states[sl])
        return np.sqrt((err[late, :3] ** 2).sum(1)).mean()

    p_ckf, p_iekf = pos_rms(ckf), pos_rms(iekf)
    assert p_iekf < p_ckf, (p_iekf, p_ckf)
    assert np.all(np.isfinite(np.asarray(iekf.est_states)))


def test_iekf_one_iter_matches_relinearized_ekf_small_dev():
    """With a tiny deviation the IEKF must agree with the plain CKF to
    linearization accuracy (sanity: the GN update reduces to EKF)."""
    sts, dt, traj, ms, first, sl = _scenario()
    pert = jnp.array([1e-4, -1e-4, 1e-4, 1e-8, -1e-8, 1e-8])
    x0_ref = traj.states[first - 1] + pert
    p0 = jnp.diag(jnp.array([1e-2, 1e-2, 1e-2, 1e-8, 1e-8, 1e-8]))
    noise = gn.noiseless(jnp.zeros((3, 3)), jnp.diag(jnp.array([1e-6, 1e-6])))
    t0 = float(traj.times[first - 1])
    ckf = od.run_hybrid_od(x0_ref, p0, noise, ms, dt, stations_list=sts, degree=2, t0=t0)
    iekf = od.run_hybrid_od(
        x0_ref, p0, noise, ms, dt, stations_list=sts, degree=2, t0=t0, iekf_iters=1
    )
    d = np.abs(np.asarray(ckf.est_states) - np.asarray(iekf.est_states)).max()
    assert d < 1e-6, d
