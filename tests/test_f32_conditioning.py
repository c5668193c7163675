"""float32 conditioning: square-root forms survive where the plain
covariance filter collapses (SURVEY §7 'hard parts'; squareroot.go:21-50
rationale).

The OD workload is f32-extreme by construction: R = 1e-6 km² range
variance against predicted covariances of ~1e2 km² means the Joseph
update must cancel ~29 bits — more than an f32 mantissa — so the plain
CKF covariance goes indefinite/NaN within a few updates, while the SRIF
carries sqrt-information factors (half the dynamic range) and stays
both finite and accurate to f32 propagation roundoff (~10 m).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu import od
from gokalman_tpu.dynamics import elements, propagate, stations
from gokalman_tpu.dynamics.propagate import MeasurementSet


@functools.lru_cache(maxsize=1)
def _f32_scenario():
    r, v = elements.oe_to_rv(
        7000.0, 0.001, jnp.deg2rad(30.0), jnp.deg2rad(80.0),
        jnp.deg2rad(40.0), 0.0,
    )
    x0_truth = jnp.concatenate([r, v])
    sts = (
        stations.new_station(-35.398333, 148.981944, 0.0, 10.0),
        stations.new_station(40.427222, -4.250556, 0.0, 10.0),
        stations.new_station(35.247164, -116.795, 0.0, 10.0),
    )
    dt, total = 10.0, 4400
    traj = propagate.propagate(x0_truth, dt, total, degree=2, with_stm=False)
    ms = propagate.generate_measurements(sts, traj)
    has = np.asarray(ms.has_meas)
    first = int(np.argmax(has))
    sl = slice(first, min(first + 600, total))
    to32 = lambda x: jnp.asarray(x, jnp.float32)
    ms32 = MeasurementSet(
        to32(ms.obs[sl]), to32(ms.htildes[sl]), ms.has_meas[sl],
        ms.station_idx[sl],
    )
    return dict(
        sts=jax.tree.map(to32, sts), dt=dt, ms=ms32,
        x0=to32(traj.states[first - 1]), t0=float(traj.times[first - 1]),
        truth=np.asarray(traj.states[sl]),
        p0=to32(jnp.diag(jnp.array([50.0, 50.0, 50.0, 1.0, 1.0, 1.0]))),
        r=to32(jnp.diag(jnp.array([1e-6, 1e-6]))),
    )


def test_f32_joseph_ckf_collapses():
    """The plain-covariance hybrid CKF must exhibit the f32 failure this
    workload is designed to provoke (indefinite/NaN covariance)."""
    s = _f32_scenario()
    noise = gn.noiseless(jnp.zeros((3, 3), jnp.float32), s["r"])
    res = od.run_hybrid_od(
        s["x0"], s["p0"], noise, s["ms"], s["dt"],
        stations_list=s["sts"], degree=2, t0=s["t0"],
    )
    cov = np.asarray(res.covariances)
    diag = np.diagonal(cov, axis1=1, axis2=2)
    assert (~np.isfinite(cov).all()) or (diag.min() < 0), (
        "expected f32 covariance collapse; if this 'fails', the plain "
        "CKF has become f32-safe and the bench gates should be revisited"
    )


def test_f32_srif_survives_and_tracks():
    """Same workload, SRIF: finite everywhere, truth-start tail RMS at
    the f32 propagation-roundoff scale."""
    s = _f32_scenario()
    noise = gn.noiseless(jnp.zeros((3, 3), jnp.float32), s["r"])
    res = od.run_srif_od(
        s["x0"], s["p0"], noise, s["ms"], s["dt"],
        stations_list=s["sts"], degree=2, t0=s["t0"],
    )
    est = np.asarray(res.est_states)
    assert np.isfinite(est).all()
    has = np.asarray(s["ms"].has_meas)
    err = est - s["truth"]
    sel = has.copy()
    sel[: err.shape[0] // 2] = False
    pos = float(np.sqrt((err[sel, :3] ** 2).sum(1).mean()))
    vel = float(np.sqrt((err[sel, 3:] ** 2).sum(1).mean()))
    assert pos < 5e-2, pos  # ~10 m-class; gate leaves 5x headroom
    assert vel < 1e-4, vel


def test_fused_pipeline_f32_stays_calibrated_when_ill_conditioned():
    """VERDICT r1 #3: the fused ensemble pipeline at float32 with
    ill-conditioned P0/Q (cond up to 1e8, R down to 1e-7) must stay
    NEES/NIS-calibrated.  Measured conclusion: Joseph-form updates +
    linalg.highp + the shared inv_psd covariance path suffice — no
    square-root covariance tier is required for the fused pipeline at
    these conditionings (the OD-style collapse needs the combination of
    huge predicted variance against tiny R *and* long pure-prediction
    growth, covered by the SRIF tests above)."""
    from gokalman_tpu.filters import vanilla
    from gokalman_tpu.ops.ensemble import mc_chi_square

    rng = np.random.default_rng(0)
    n, p = 6, 3

    def spd_cond(c):
        u, _ = np.linalg.qr(rng.standard_normal((n, n)))
        eig = np.logspace(0, -np.log10(c), n)
        return (u * eig) @ u.T

    for cond_c, rscale in ((1e6, 1e-6), (1e8, 1e-6)):
        p0 = jnp.asarray(spd_cond(cond_c), jnp.float32)
        q = jnp.asarray(1e-6 * spd_cond(cond_c), jnp.float32)
        f = jnp.asarray(np.eye(n) + 0.05 * rng.standard_normal((n, n)),
                        jnp.float32)
        h = jnp.asarray(rng.standard_normal((p, n)), jnp.float32)
        r = jnp.asarray(rscale * np.eye(p), jnp.float32)
        model, st = vanilla.new(jnp.zeros(n, jnp.float32), p0, f, None,
                                h, gn.awgn(q, r))
        res = jax.jit(lambda k, m=model, s=st: mc_chi_square(
            m, s, 16384, 60, k, init_spread=True,
            lagged_measurements=False))(jax.random.PRNGKey(1))
        nees = np.asarray(res.nees_means)
        nis = np.asarray(res.nis_means)
        assert np.isfinite(nees).all() and np.isfinite(nis).all()
        assert abs(nees[20:].mean() - n) < 0.2 * n, (cond_c, nees[20:].mean())
        assert abs(nis[20:].mean() - p) < 0.2 * p, (cond_c, nis[20:].mean())
