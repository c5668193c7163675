"""Full-state unscented orbit determination tests."""

import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu import od
from gokalman_tpu.dynamics import elements, propagate, stations
from gokalman_tpu.dynamics.propagate import MeasurementSet


def test_ukf_od_converges_from_perturbed_state():
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

    # 1 km / 1 m/s initial error — beyond comfortable CKF linearization.
    pert = jnp.array([0.7, -0.5, 0.5, 5e-4, -5e-4, 5e-4])
    x0_ref = traj.states[first - 1] + pert
    p0 = jnp.diag(jnp.array([1.0, 1.0, 1.0, 1e-5, 1e-5, 1e-5]))
    r_cov = jnp.diag(jnp.array([1e-6, 1e-6]))
    noise = gn.noiseless(jnp.zeros((6, 6)), r_cov)

    res = od.run_ukf_od(
        x0_ref, p0, noise, ms2, dt, stations_list=sts, degree=2,
        t0=float(traj.times[first - 1]),
    )
    err = np.asarray(res.est_states) - np.asarray(traj.states[sl])
    m = np.asarray(ms2.has_meas)
    idx = np.nonzero(m)[0]
    late = idx[len(idx) // 2 :]
    pos0 = float(np.linalg.norm(np.asarray(pert[:3])))
    pos = np.sqrt((err[late, :3] ** 2).sum(1)).mean()
    vel = np.sqrt((err[late, 3:] ** 2).sum(1)).mean()
    assert pos < pos0 / 20, pos  # converged far below the initial 1 km error
    assert vel < 1e-4, vel
    assert bool(np.all(np.isfinite(err)))

    # The UKF's sigma-point linearization should beat the CKF's fixed
    # reference-trajectory linearization at this perturbation size.
    ckf = od.run_hybrid_od(
        x0_ref, p0, gn.noiseless(jnp.zeros((3, 3)), r_cov), ms2, dt,
        stations_list=sts, degree=2, t0=float(traj.times[first - 1]),
    )
    err_ckf = np.asarray(ckf.est_states) - np.asarray(traj.states[sl])
    pos_ckf = np.sqrt((err_ckf[late, :3] ** 2).sum(1)).mean()
    assert pos < pos_ckf, (pos, pos_ckf)
