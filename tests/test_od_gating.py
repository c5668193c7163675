"""Measurement gating on the OD harness: a corrupted observation
mid-arc must be rejected and not yank the orbit estimate."""

import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu import od
from gokalman_tpu.dynamics import elements, propagate, stations
from gokalman_tpu.dynamics.propagate import MeasurementSet


def test_gate_rejects_corrupted_measurement():
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

    # Corrupt one measurement well after convergence: +10 km range.
    idx = np.nonzero(np.asarray(ms2.has_meas))[0]
    bad = int(idx[3 * len(idx) // 4])
    obs = ms2.obs.at[bad, 0].add(10.0)
    ms_bad = ms2._replace(obs=obs)

    x0_ref = traj.states[first - 1]
    p0 = jnp.diag(jnp.array([50.0, 50.0, 50.0, 1.0, 1.0, 1.0]))
    noise = gn.noiseless(jnp.zeros((3, 3)), jnp.diag(jnp.array([1e-6, 1e-6])))
    t0 = float(traj.times[first - 1])

    plain = od.run_hybrid_od(
        x0_ref, p0, noise, ms_bad, dt, stations_list=sts, degree=2, t0=t0
    )
    gated = od.run_hybrid_od(
        x0_ref, p0, noise, ms_bad, dt, stations_list=sts, degree=2, t0=t0,
        nis_gate=25.0,
    )
    assert gated.accepted is not None
    acc = np.asarray(gated.accepted)
    assert not acc[bad]  # the corrupted measurement is rejected
    # Clean measurements around it pass.
    near = [k for k in idx if k != bad and abs(k - bad) < 200]
    assert np.asarray([acc[k] for k in near]).mean() > 0.9

    err_plain = np.linalg.norm(
        np.asarray(plain.est_states[bad, :3] - traj.states[sl][bad, :3])
    )
    err_gated = np.linalg.norm(
        np.asarray(gated.est_states[bad, :3] - traj.states[sl][bad, :3])
    )
    assert err_gated < err_plain / 10, (err_gated, err_plain)
    # Ungated result exists but is visibly yanked at the bad step.
    assert err_plain > 0.01
