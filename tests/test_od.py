"""End-to-end orbit-determination integration tests.

Mirrors the reference's OD suites (TestSRIFFullODExample
srif_test.go:60-341, TestCKFFull/TestEKFFull hybrid_test.go:56-66):
a LEO spacecraft tracked by three ground stations over a long arc,
filtered by SRIF / hybrid CKF / EKF against RMS gates.  The truth comes
from this framework's own propagator (the reference used the external
smd library the same way — a deterministic physics sim as fixture).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gokalman_tpu import noise as gn
from gokalman_tpu import od
from gokalman_tpu.dynamics import elements, propagate, stations
from gokalman_tpu.dynamics.propagate import MeasurementSet
from gokalman_tpu.filters import srif


@functools.lru_cache(maxsize=1)
def _scenario():
    """24h LEO arc, 10s steps, 3 DSN-like stations (srif_test.go:70-80)."""
    r, v = elements.oe_to_rv(
        7000.0, 0.001, jnp.deg2rad(30.0), jnp.deg2rad(80.0), jnp.deg2rad(40.0), 0.0
    )
    x0_truth = jnp.concatenate([r, v])
    sts = (
        stations.new_station(-35.398333, 148.981944, 0.0, 10.0),
        stations.new_station(40.427222, -4.250556, 0.0, 10.0),
        stations.new_station(35.247164, -116.795, 0.0, 10.0),
    )
    dt, steps = 10.0, 8640
    traj = propagate.propagate(x0_truth, dt, steps, degree=2, with_stm=False)
    ms = propagate.generate_measurements(sts, traj)  # noiseless (smd-style)
    has = np.asarray(ms.has_meas)
    first = int(np.argmax(has))
    sl = slice(first, steps)
    ms2 = MeasurementSet(ms.obs[sl], ms.htildes[sl], ms.has_meas[sl], ms.station_idx[sl])
    x0_ref = traj.states[first - 1]
    t0_od = float(traj.times[first - 1])
    return dict(
        sts=sts, dt=dt, ms=ms2, x0_ref=x0_ref, t0=t0_od,
        truth=traj.states[sl], p0=jnp.diag(jnp.array([50.0, 50.0, 50.0, 1.0, 1.0, 1.0])),
        r=jnp.diag(jnp.array([1e-6, 1e-6])),
    )


def _gate_rms(res, truth, has):
    """The processEst RMS: error rows at measurement updates, zero rows
    at prediction gaps (srif_test.go:310-341 streaming convention)."""
    err = np.asarray(res.est_states) - np.asarray(truth)
    errz = np.where(np.asarray(has)[:, None], err, 0.0)
    pos = float(np.sqrt((errz[:, :3] ** 2).sum(1).mean()))
    vel = float(np.sqrt((errz[:, 3:] ** 2).sum(1).mean()))
    return pos, vel


@pytest.mark.parametrize("non_tri_r", [False, True])
def test_srif_full_od(non_tri_r):
    """SRIF OD under the reference gates: pos RMS < 1e-3 km, vel RMS
    < 1e-6 km/s (srif_test.go:169)."""
    s = _scenario()
    noise = gn.noiseless(jnp.zeros((3, 3)), s["r"])
    res = od.run_srif_od(
        s["x0_ref"], s["p0"], noise, s["ms"], s["dt"],
        stations_list=s["sts"], degree=2, t0=s["t0"], non_tri_r=non_tri_r,
    )
    pos, vel = _gate_rms(res, s["truth"], s["ms"].has_meas)
    assert pos < 1e-3, pos
    assert vel < 1e-6, vel
    # 2-sigma containment at measurement steps (srif_test.go:245-247).
    has = np.asarray(s["ms"].has_meas)
    dev = np.asarray(res.deviations)[has]
    sig = np.sqrt(np.diagonal(np.asarray(res.covariances)[has], axis1=1, axis2=2))
    frac = np.mean(np.all(np.abs(dev) <= 2 * sig, axis=1))
    assert frac > 0.95, frac


def test_ckf_full_od():
    """Hybrid CKF OD under the gates (hybrid_test.go:56-58, 172)."""
    s = _scenario()
    noise = gn.noiseless(jnp.zeros((3, 3)), s["r"])
    res = od.run_hybrid_od(
        s["x0_ref"], s["p0"], noise, s["ms"], s["dt"],
        stations_list=s["sts"], degree=2, t0=s["t0"],
    )
    pos, vel = _gate_rms(res, s["truth"], s["ms"].has_meas)
    assert pos < 1e-3, pos
    assert vel < 1e-6, vel


def test_ekf_full_od():
    """EKF mode (trigger after 30 measurements, hybrid_test.go:270-279)
    under the same gates, including the reference-trajectory reset."""
    s = _scenario()
    noise = gn.noiseless(jnp.zeros((3, 3)), s["r"])
    ekf_mask = jnp.cumsum(s["ms"].has_meas) > 30
    res = od.run_hybrid_od(
        s["x0_ref"], s["p0"], noise, s["ms"], s["dt"],
        stations_list=s["sts"], degree=2, t0=s["t0"], ekf_mask=ekf_mask,
    )
    pos, vel = _gate_rms(res, s["truth"], s["ms"].has_meas)
    assert pos < 1e-3, pos
    assert vel < 1e-6, vel
    # After EKF engages, deviations are folded into the reference: the
    # post-update deviation state must be ~0 at EKF measurement steps.
    has = np.asarray(s["ms"].has_meas & ekf_mask)
    assert float(np.abs(np.asarray(res.deviations)[has]).max()) < 1e-12


def test_ekf_beats_ckf_with_large_initial_error():
    """With a 0.5 km initial error the EKF's trajectory rectification
    must beat the CKF's fixed linearization by an order of magnitude."""
    s = _scenario()
    key = jax.random.PRNGKey(11)
    pert = jnp.array([0.5, -0.3, 0.2, 1e-4, -5e-5, 1e-4])
    x0_bad = s["x0_ref"] + pert
    noise = gn.noiseless(jnp.zeros((3, 3)), s["r"])
    # Noisy measurements this time (1 m, 1 mm/s).
    sqrt_r = jnp.diag(jnp.array([1e-3, 1e-6]))
    obs_noise = jax.vmap(
        lambda k: sqrt_r @ jax.random.normal(k, (2,), jnp.float64)
    )(jax.random.split(key, s["ms"].obs.shape[0]))
    ms = s["ms"]._replace(
        obs=s["ms"].obs + jnp.where(s["ms"].has_meas[:, None], obs_noise, 0.0)
    )
    noise2 = gn.noiseless(jnp.zeros((3, 3)), sqrt_r @ sqrt_r)
    ckf = od.run_hybrid_od(
        x0_bad, s["p0"], noise2, ms, s["dt"],
        stations_list=s["sts"], degree=2, t0=s["t0"],
    )
    ekf = od.run_hybrid_od(
        x0_bad, s["p0"], noise2, ms, s["dt"],
        stations_list=s["sts"], degree=2, t0=s["t0"],
        ekf_mask=jnp.cumsum(ms.has_meas) > 30,
    )
    pos_ckf, _ = od.rms_errors(ckf, s["truth"])
    pos_ekf, _ = od.rms_errors(ekf, s["truth"])
    assert float(pos_ekf) * 5 < float(pos_ckf), (float(pos_ekf), float(pos_ckf))
    # EKF converges to measurement-noise-level accuracy.
    assert float(pos_ekf) < 5e-3, float(pos_ekf)


def test_srif_od_smoothing():
    """Smoothing variant (srif_test.go:61-64, 271-282): smoothed
    estimates must satisfy the backward map and stay under the gates."""
    s = _scenario()
    noise = gn.noiseless(jnp.zeros((3, 3)), s["r"])
    res = od.run_srif_od(
        s["x0_ref"], s["p0"], noise, s["ms"], s["dt"],
        stations_list=s["sts"], degree=2, t0=s["t0"],
    )
    smoothed = srif.smooth_all(res.estimates)
    # Smoothed deviations remain tiny (noiseless measurements).
    dev = np.asarray(smoothed.state)
    full = np.asarray(res.ref_states) + dev
    err = full - np.asarray(s["truth"])
    has = np.asarray(s["ms"].has_meas)
    pos = float(np.sqrt((np.where(has[:, None], err, 0.0)[:, :3] ** 2).sum(1).mean()))
    assert pos < 1e-3, pos
