"""Consider covariance analysis on an OD arc (od.consider_bias_analysis).

Pins, strongest first:
1. The analysis's formal covariance reproduces the hybrid filter's own
   covariance trace to roundoff — including SNC-armed arcs, via the
   exact per-step Q recovery Q_k = P̄_k − Φ P Φᵀ.
2. EXACT rank-1 pin: bias only station 0's range by +σ and rerun the
   (linear-in-measurements) CKF — the estimate shift d_k satisfies
   d_k d_kᵀ == true_cov_k − formal_cov_k digit-for-digit, because with
   one considered bias the consider inflation IS the outer product of
   the bias response.
3. Zero bias sigmas ⇒ no inflation; 10 m sigmas ⇒ material position
   variance inflation at the tail.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu import od
from gokalman_tpu.dynamics import elements, propagate, stations
from gokalman_tpu.dynamics.propagate import MeasurementSet

jax.config.update("jax_enable_x64", True)


@functools.lru_cache(maxsize=1)
def _scenario():
    r, v = elements.oe_to_rv(7000.0, 0.001, jnp.deg2rad(30.0),
                             jnp.deg2rad(80.0), jnp.deg2rad(40.0), 0.0)
    x0_truth = jnp.concatenate([r, v])
    sts = (
        stations.new_station(-35.398333, 148.981944, 0.0, 10.0),
        stations.new_station(40.427222, -4.250556, 0.0, 10.0),
        stations.new_station(35.247164, -116.795, 0.0, 10.0),
    )
    # The first station pass on this arc is at step ~3520; propagate the
    # full 24h arc and keep a 3000-step window from the first pass (388
    # measurements across all 3 stations) so the test stays fast.
    dt, total, window = 10.0, 8640, 3000
    traj = propagate.propagate(x0_truth, dt, total, degree=2, with_stm=False)
    ms = propagate.generate_measurements(sts, traj)
    has = np.asarray(ms.has_meas)
    first = int(np.argmax(has))
    sl = slice(first, first + window)
    ms2 = MeasurementSet(ms.obs[sl], ms.htildes[sl], ms.has_meas[sl],
                         ms.station_idx[sl])
    return dict(
        sts=sts, dt=dt, ms=ms2, x0_ref=traj.states[first - 1],
        t0=float(traj.times[first - 1]),
        p0=jnp.diag(jnp.array([50.0, 50.0, 50.0, 1.0, 1.0, 1.0])),
        r=jnp.diag(jnp.array([1e-6, 1e-6])),
    )


def _run(ms=None, snc=False):
    s = _scenario()
    ms = s["ms"] if ms is None else ms
    if snc:
        nz = gn.noiseless(jnp.eye(3) * 1e-12, s["r"])
        snc_mask = jnp.asarray(ms.has_meas)
        return od.run_hybrid_od(s["x0_ref"], s["p0"], nz, ms, s["dt"],
                                stations_list=s["sts"], degree=2,
                                t0=s["t0"], snc_mask=snc_mask)
    nz = gn.noiseless(jnp.zeros((3, 3)), s["r"])
    return od.run_hybrid_od(s["x0_ref"], s["p0"], nz, ms, s["dt"],
                            stations_list=s["sts"], degree=2, t0=s["t0"])


def test_formal_reproduces_filter_covariance_including_snc():
    s = _scenario()
    for snc in (False, True):
        res = _run(snc=snc)
        ana = od.consider_bias_analysis(
            res, s["ms"], s["p0"], s["r"], bias_sigmas=jnp.array([1e-2, 1e-2, 1e-2]))
        formal = np.asarray(ana.formal_covariance)
        filt = np.asarray(res.covariances)
        scale = np.abs(filt).max()
        assert np.abs(formal - filt).max() < 1e-9 * scale, snc


def test_rank_one_bias_response_pin():
    """One considered bias (station 0 range, sigma): the inflation is
    exactly the outer product of the measured estimate shift."""
    s = _scenario()
    sigma = 1e-2  # 10 m
    res0 = _run()
    # bias station 0's range measurements by +sigma and rerun
    ms = s["ms"]
    biased = np.asarray(ms.obs).copy()
    mask = np.asarray(ms.has_meas) & (np.asarray(ms.station_idx) == 0)
    biased[mask, 0] += sigma
    ms_b = MeasurementSet(jnp.asarray(biased), ms.htildes, ms.has_meas,
                          ms.station_idx)
    res1 = _run(ms=ms_b)
    d = np.asarray(res1.est_states) - np.asarray(res0.est_states)

    ana = od.consider_bias_analysis(
        res0, ms, s["p0"], s["r"], bias_sigmas=jnp.array([sigma, 0.0, 0.0]))
    infl = np.asarray(ana.covariance) - np.asarray(ana.formal_covariance)
    outer = np.einsum("ti,tj->tij", d, d)
    # compare where the response is nonzero (after the first stn-0 pass)
    k0 = int(np.argmax(mask)) + 1
    scale = np.abs(infl[k0:]).max()
    assert scale > 0
    assert np.abs(infl[k0:] - outer[k0:]).max() < 1e-6 * scale
    # cross-covariance points at station 0 only
    cross = np.asarray(ana.cross_covariance)
    assert np.abs(cross[:, :, 1]).max() == 0.0
    assert np.abs(cross[:, :, 2]).max() == 0.0
    assert np.abs(cross[-1, :, 0]).max() > 0.0


def test_zero_sigmas_no_inflation_material_sigmas_inflate():
    s = _scenario()
    res = _run()
    ana0 = od.consider_bias_analysis(
        res, s["ms"], s["p0"], s["r"], bias_sigmas=jnp.zeros(3))
    assert np.abs(np.asarray(ana0.covariance)
                  - np.asarray(ana0.formal_covariance)).max() == 0.0
    ana = od.consider_bias_analysis(
        res, s["ms"], s["p0"], s["r"], bias_sigmas=jnp.array([1e-2] * 3))
    pos_true = float(jnp.trace(ana.covariance[-1][:3, :3]))
    pos_formal = float(jnp.trace(ana.formal_covariance[-1][:3, :3]))
    # 10 m unestimated range biases must matter on a km-grade solution
    assert pos_true > 1.2 * pos_formal, (pos_true, pos_formal)


def test_consider_od_zero_sigmas_equals_hybrid():
    """bias_sigmas = 0 collapses run_consider_od to run_hybrid_od
    (augmented blocks carry exact zeros)."""
    s = _scenario()
    res_h = _run()
    res_c = od.run_consider_od(
        s["x0_ref"], s["p0"], gn.noiseless(jnp.zeros((3, 3)), s["r"]),
        s["ms"], s["dt"], bias_sigmas=jnp.zeros(3),
        stations_list=s["sts"], degree=2, t0=s["t0"])
    a, b = np.asarray(res_c.est_states), np.asarray(res_h.est_states)
    assert np.abs(a - b).max() < 1e-9 * np.abs(b).max()
    # Covariances: the extra zero blocks are exact, but the 9-dim
    # program reassociates the same 6-dim sums differently; over a
    # 3000-step recursion with R=1e-6 against P~1e2 that reassociation
    # noise reaches ~5e-5 relative (measured 4.5e-5) — the same
    # program-structure sensitivity documented for the emulated-x64
    # chip path in CLAUDE.md.
    a, b = np.asarray(res_c.covariances), np.asarray(res_h.covariances)
    assert np.abs(a - b).max() < 1e-3 * np.abs(b).max()


def test_consider_od_reproduced_by_analysis_recursion():
    """EXACTNESS: schmidt.consider_analysis fed the consider run's own
    x-block gain/STM/Jacobian trace reproduces the consider filter's
    Pxx AND Pxc to roundoff — the online filter and the post-design
    recursion are the same mathematics."""
    from gokalman_tpu.filters import schmidt

    s = _scenario()
    sig = jnp.array([1e-2, 2e-2, 5e-3])
    res = od.run_consider_od(
        s["x0_ref"], s["p0"], gn.noiseless(jnp.zeros((3, 3)), s["r"]),
        s["ms"], s["dt"], bias_sigmas=sig,
        stations_list=s["sts"], degree=2, t0=s["t0"])
    ests = res.estimates
    phis = np.asarray(ests.phi)[:, :6, :6]
    hs = np.asarray(ests.htilde)[:, :, :6]
    hc = np.asarray(ests.htilde)[:, :, 6:]
    gains = np.asarray(ests.gain)[:, :6, :]
    full_cov = np.asarray(ests.covariance)  # [T, 9, 9]
    pxx = full_cov[:, :6, :6]
    pxc = full_cov[:, :6, 6:]
    p0 = np.asarray(s["p0"])
    prev = np.concatenate([p0[None], pxx[:-1]], axis=0)
    pred_xx = np.asarray(ests.pred_covariance)[:, :6, :6]
    q_eff = pred_xx - np.einsum("tij,tjk,tlk->til", phis, prev, phis)
    ana = schmidt.consider_analysis(
        phis, hs, gains, jnp.asarray(q_eff), s["r"],
        consider_cov=jnp.diag(sig**2), hc=jnp.asarray(hc), p0=s["p0"])
    # Pxx: exact up to q_eff-recovery cancellation noise (P̄ − ΦPΦᵀ
    # cancels ~16 digits of an 850-scale matrix per step; measured
    # 1.1e-5 relative over the 3000-step arc).
    scale = np.abs(pxx).max()
    assert np.abs(np.asarray(ana.covariance) - pxx).max() < 2e-4 * scale
    # Pxc: EXACT with the sign convention made explicit — the filter
    # carries Cov(x̂−x, ĉ−c) = −Cov(e, c) (ĉ is pinned, so e_c = −c);
    # measured agreement 1.7e-18 relative.
    cscale = np.abs(pxc).max()
    assert cscale > 0  # the coupling is real on this arc
    assert np.abs(np.asarray(ana.cross_covariance) + pxc).max() < 1e-12 * cscale


def test_consider_od_calibrated_where_naive_overconfident():
    """Monte Carlo over station-bias draws (self-consistent arcs with
    true_biases injected): the naive filter (sigmas=0 through the same
    code path) reports wildly overconfident position NEES; the consider
    filter stays chi-square-calibrated."""
    s = _scenario()
    sigma_b = 2e-2  # 20 m range biases
    draws = 12
    bs = sigma_b * jax.random.normal(jax.random.PRNGKey(9), (draws, 3))
    nz = gn.noiseless(jnp.zeros((3, 3)), s["r"])
    truth0 = s["x0_ref"]  # truth-start: errors come from biases only

    def final_nees(bias_true, sigmas):
        res = od.run_consider_od(
            s["x0_ref"], s["p0"], nz, s["ms"], s["dt"], bias_sigmas=sigmas,
            stations_list=s["sts"], degree=2, t0=s["t0"],
            truth0=truth0, true_biases=bias_true)
        err = res.est_states[-1] - res.truth[-1]
        from gokalman_tpu import linalg as gl
        return err @ gl.solve_psd(res.covariances[-1], err)

    nees_naive = jax.vmap(lambda b: final_nees(b, jnp.zeros(3)))(bs)
    nees_cons = jax.vmap(
        lambda b: final_nees(b, jnp.full(3, sigma_b)))(bs)
    m_naive = float(jnp.mean(nees_naive))
    m_cons = float(jnp.mean(nees_cons))
    # n = 6; mean over 12 draws of chi2_6-ish -> gate generously
    assert m_naive > 5 * m_cons, (m_naive, m_cons)
    assert m_cons < 15.0, m_cons
