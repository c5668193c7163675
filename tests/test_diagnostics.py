"""Filter-health diagnostics: a consistent filter passes every test, a
mis-tuned one is caught by the matching named statistic."""

import jax
import jax.numpy as jnp
import numpy as np

import gokalman_tpu as gk
from gokalman_tpu import diagnostics
from gokalman_tpu.filters import vanilla


def _run(q_scale=1.0, r_scale=1.0, seed=0, t=400):
    """Truth simulated with the TRUE (Q, R); the filter runs with
    scaled versions — scale 1 = consistent."""
    f = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    q = jnp.diag(jnp.array([1e-4, 1e-3]))
    r = jnp.array([[0.04]])
    rng = np.random.default_rng(seed)
    x = np.array([0.0, 0.3])
    ys = []
    for _ in range(t):
        w = rng.multivariate_normal(np.zeros(2), np.asarray(q))
        x = np.asarray(f) @ x + w
        ys.append(x[0] + rng.standard_normal() * np.sqrt(r[0, 0]))
    ys = jnp.asarray(np.asarray(ys).reshape(-1, 1))
    model, st = vanilla.new(jnp.array([0.0, 0.3]), jnp.eye(2), f, None, h,
                            gk.noise.noiseless(q_scale * q, r_scale * r))
    _, ests = vanilla.run(model, st, measurements=ys)
    return ests


def test_consistent_filter_passes_whiteness():
    ests = _run()
    res = diagnostics.innovation_whiteness(ests.innovation[50:])
    assert bool(res.passed), (float(res.statistic), res.threshold)
    assert float(jnp.max(jnp.abs(res.autocorr))) < 0.15


def test_mistuned_q_fails_whiteness():
    """Q 100x too small makes the filter sluggish -> serially
    correlated innovations -> whiteness rejection."""
    ests = _run(q_scale=0.01)
    res = diagnostics.innovation_whiteness(ests.innovation[50:])
    assert not bool(res.passed), float(res.statistic)


def test_chi2_interval_and_nees_gate():
    lo, hi = diagnostics.chi2_interval(2.0, 400)
    assert lo < 2.0 < hi
    assert hi - lo < 0.6  # tight at N=400
    rng = np.random.default_rng(1)
    good = jnp.asarray(rng.chisquare(2, 400))
    mean, lo, hi, ok = diagnostics.nees_test(good, 2)
    assert bool(ok), (float(mean), lo, hi)
    bad = 3.0 * good
    _, _, _, ok2 = diagnostics.nees_test(bad, 2)
    assert not bool(ok2)


def test_covariance_health_flags_breakage():
    ests = _run()
    healthy = diagnostics.covariance_health(ests.covariance)
    assert bool(jnp.all(healthy))
    broken = ests.covariance.at[7, 0, 0].set(jnp.nan)
    mask = diagnostics.covariance_health(broken)
    assert not bool(mask[7]) and bool(mask[6])


def test_divergence_onset_detects_r_blowup():
    """NIS sequence that drifts out of its chi-square band mid-arc is
    localized to within a window of the onset."""
    rng = np.random.default_rng(3)
    nis = rng.chisquare(1, 300)
    nis[180:] *= 8.0  # innovation covariance suddenly understated
    k = int(diagnostics.divergence_onset(jnp.asarray(nis), 1, window=20))
    assert 180 <= k <= 220, k
    ok = diagnostics.divergence_onset(
        jnp.asarray(rng.chisquare(1, 300)), 1, window=20
    )
    assert int(ok) == -1


def test_innovation_bias_flags_biased_model():
    """Unbiased filter -> normalized bias components within ~3; a
    constant measurement offset drives the statistic far out."""
    ests = _run()
    f = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    t = ests.innovation.shape[0]
    hs = jnp.broadcast_to(h, (t, 1, 2))
    rs = jnp.broadcast_to(jnp.array([[0.04]]), (t, 1, 1))
    b = diagnostics.innovation_bias(ests.innovation[50:],
                                    ests.pred_covariance[50:],
                                    hs[50:], rs[50:])
    assert float(jnp.max(jnp.abs(b))) < 4.0, b
    biased = ests.innovation[50:] + 0.2  # constant offset ~ sigma
    b2 = diagnostics.innovation_bias(biased, ests.pred_covariance[50:],
                                     hs[50:], rs[50:])
    assert float(jnp.max(jnp.abs(b2))) > 6.0, b2


def test_whiteness_guard_and_correlated_components():
    import pytest

    with pytest.raises(ValueError):
        diagnostics.innovation_whiteness(jnp.ones((8, 1)), lags=10)
    # Strongly correlated (but white-in-time) 2-component innovations
    # must still pass at the nominal rate: the whitening decorrelates.
    rng = np.random.default_rng(7)
    z = rng.standard_normal((500, 1))
    y = np.concatenate([z, 0.95 * z + 0.05 * rng.standard_normal((500, 1))],
                       axis=1)
    res = diagnostics.innovation_whiteness(jnp.asarray(y))
    assert bool(res.passed), float(res.statistic)


def test_whiteness_on_consistent_ukf_innovations():
    """Cross-module: a well-tuned UKF's innovations on a nonlinear
    system pass the whiteness test (the toolkit is filter-agnostic)."""
    from gokalman_tpu.filters import ukf

    dt = 0.1

    def fx(x):
        return jnp.array([x[0] + dt * x[1], 0.995 * x[1]])

    def hx(x):
        return jnp.array([jnp.sqrt(1.0 + x[0] ** 2)])

    q = jnp.diag(jnp.array([1e-5, 1e-4]))
    r = jnp.array([[1e-3]])
    rng = np.random.default_rng(12)
    x = np.array([0.5, 0.3])
    ys = []
    for _ in range(400):
        w = rng.multivariate_normal(np.zeros(2), np.asarray(q))
        x = np.array([x[0] + dt * x[1], 0.995 * x[1]]) + w
        ys.append(np.sqrt(1.0 + x[0] ** 2) + rng.standard_normal()
                  * np.sqrt(r[0, 0]))
    ys = jnp.asarray(np.asarray(ys).reshape(-1, 1))
    model, st = ukf.new(jnp.array([0.5, 0.3]), 0.1 * jnp.eye(2),
                        gk.noise.noiseless(q, r))
    _, ests = ukf.run(model, st, ys, fx, hx)
    res = diagnostics.innovation_whiteness(ests.innovation[50:])
    assert bool(res.passed), (float(res.statistic), res.threshold)


def test_divergence_onset_on_filter_run():
    """End-to-end: corrupt R mid-arc in the data stream; the online
    detector localizes the onset from the filter's own NIS trace."""
    ests = _run(t=600)
    f = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    # NIS = innov^2 / S with S from the filter's predicted covariance.
    s = (jnp.einsum("tij,tjk,lk->til",
                    jnp.broadcast_to(h, (600, 1, 2)),
                    ests.pred_covariance,
                    h) + 0.04)[:, 0, 0]
    nis = ests.innovation[:, 0] ** 2 / s
    # Corrupt the second half: measurement noise suddenly 5x sigma.
    nis_bad = nis.at[300:].mul(25.0)
    k = int(diagnostics.divergence_onset(nis_bad, 1, window=25))
    assert 300 <= k <= 360, k
    assert int(diagnostics.divergence_onset(nis, 1, window=25)) == -1


def test_ospa_hand_values_and_metric_properties():
    from gokalman_tpu.diagnostics import ospa

    e1 = jnp.asarray([[0.0, 0.0]])
    t2 = jnp.asarray([[0.0, 0.0], [10.0, 0.0]])
    m1 = jnp.asarray([True])
    m2 = jnp.asarray([True, True])
    # one matched at 0, one unmatched at cutoff 5: sqrt((0+25)/2)
    v = float(ospa(e1, m1, t2, m2, cutoff=5.0))
    np.testing.assert_allclose(v, np.sqrt(25.0 / 2.0), rtol=1e-6)
    # identical sets -> 0; both empty -> 0
    np.testing.assert_allclose(float(ospa(t2, m2, t2, m2, 5.0)), 0.0,
                               atol=1e-9)
    np.testing.assert_allclose(
        float(ospa(e1, jnp.asarray([False]), t2,
                   jnp.asarray([False, False]), 5.0)), 0.0, atol=1e-9)
    # cardinality-only: empty est vs one truth == cutoff
    np.testing.assert_allclose(
        float(ospa(e1, jnp.asarray([False]), t2,
                   jnp.asarray([True, False]), 5.0)), 5.0, rtol=1e-6)
    # pure localization: |1.0| within cutoff
    np.testing.assert_allclose(
        float(ospa(jnp.asarray([[1.0, 0.0]]), m1,
                   jnp.asarray([[0.0, 0.0]]), m1, 5.0)), 1.0, rtol=1e-6)
    # symmetry + permutation invariance on a padded 3x3 scene
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((3, 2)))
    b = jnp.asarray(rng.standard_normal((3, 2)))
    ma = jnp.asarray([True, True, False])
    mb = jnp.asarray([True, True, True])
    v1 = float(ospa(a, ma, b, mb, 2.0))
    v2 = float(ospa(b, mb, a, ma, 2.0))
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    perm = jnp.asarray([2, 0, 1])
    v3 = float(ospa(a, ma, b[perm], mb[perm], 2.0))
    np.testing.assert_allclose(v1, v3, rtol=1e-6)


def test_ospa_matches_bruteforce_scipy_style():
    """Exact assignment on random scenes vs a numpy brute force over
    valid-only permutations (the textbook OSPA definition)."""
    import itertools

    from gokalman_tpu.diagnostics import ospa

    rng = np.random.default_rng(3)
    for trial in range(8):
        m_valid = rng.integers(0, 4)
        n_valid = rng.integers(0, 4)
        c, p = 2.5, 2.0
        e = rng.standard_normal((4, 2)) * 2
        t = rng.standard_normal((4, 2)) * 2
        em = np.arange(4) < m_valid
        tm = np.arange(4) < n_valid
        got = float(ospa(jnp.asarray(e), jnp.asarray(em), jnp.asarray(t),
                         jnp.asarray(tm), c, order=p))
        # textbook: m <= n by symmetry
        ev, tv = e[em], t[tm]
        if len(ev) > len(tv):
            ev, tv = tv, ev
        mm, nn = len(ev), len(tv)
        if nn == 0:
            want = 0.0
        else:
            best = np.inf
            for pi in itertools.permutations(range(nn), mm):
                s = sum(min(np.linalg.norm(ev[i] - tv[pi[i]]), c) ** p
                        for i in range(mm))
                best = min(best, s)
            want = ((best + c**p * (nn - mm)) / nn) ** (1 / p)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9,
                                   err_msg=f"trial {trial}")


def test_ospa_traces_tracking_quality():
    """vmap over frames: a tracker that locks two targets must show a
    lower mean OSPA than one reporting only one of them."""
    from gokalman_tpu.diagnostics import ospa

    rng = np.random.default_rng(5)
    T = 20
    truth = np.stack([rng.uniform(-5, 5, (T, 2)),
                      rng.uniform(-5, 5, (T, 2))], axis=1)  # [T, 2, 2]
    good = truth + 0.1 * rng.standard_normal(truth.shape)
    tmask = jnp.ones((T, 2), bool)
    o_good = jax.vmap(lambda e, t: ospa(e, tmask[0], t, tmask[0], 3.0))(
        jnp.asarray(good), jnp.asarray(truth))
    half_mask = jnp.asarray(np.tile([True, False], (T, 1)))
    o_half = jax.vmap(lambda e, em, t: ospa(e, em, t, tmask[0], 3.0))(
        jnp.asarray(good), half_mask, jnp.asarray(truth))
    assert float(o_good.mean()) < 0.3
    assert float(o_half.mean()) > 1.5  # missing target costs ~c/sqrt(2)


def test_glr_signature_recursion_is_exact():
    """Brute-force pin of E[nu_k] = H Phi_k(theta) E d: run the filter
    on a NOISELESS with-jump vs without-jump pair; the innovation
    difference must equal the GLR signature to roundoff."""
    import jax
    from gokalman_tpu import noise as gn
    from gokalman_tpu.filters import vanilla
    from gokalman_tpu.diagnostics import glr_detect

    f = np.array([[1.0, 1.0], [0.0, 1.0]])
    q = 1e-4 * np.eye(2)
    h = np.array([[1.0, 0.0]])
    r = np.array([[0.1]])
    e = np.array([[0.0], [1.0]])
    theta, d_true, T = 10, 0.7, 30
    x = np.array([0.3, 0.05])
    ys0, ys1 = [], []
    x0_, x1_ = x.copy(), x.copy()
    for k in range(T):
        x0_ = f @ x0_
        x1_ = f @ x1_
        if k == theta:
            x1_ = x1_ + e[:, 0] * d_true
        ys0.append(h @ x0_)
        ys1.append(h @ x1_)
    m, s = vanilla.new(jnp.asarray(x), 0.5 * jnp.eye(2), jnp.asarray(f),
                       None, jnp.asarray(h),
                       gn.noiseless(jnp.asarray(q), jnp.asarray(r)))
    _, e0 = vanilla.run(m, s, jnp.asarray(np.stack(ys0)))
    _, e1 = vanilla.run(m, s, jnp.asarray(np.stack(ys1)))
    diff = np.asarray(e1.innovation) - np.asarray(e0.innovation)
    # reconstruct the signature with the module's own recursion
    phi = np.eye(2)
    gains = np.asarray(e0.gain)
    for k in range(theta, T):
        sig = (h @ phi @ e)[:, 0] * d_true
        np.testing.assert_allclose(diff[k], sig, atol=1e-10)
        phi = f @ (np.eye(2) - gains[k] @ h) @ phi
    # and the detector nails onset + magnitude on the noiseless trace
    res = glr_detect(f, h, e, e1, threshold=18.5, window=10)
    # H E = 0 for a velocity jump: the onset-step innovation carries no
    # signature, so theta and theta+1 are near-indistinguishable (and
    # window truncation favors the later) — onset identifiable to 1
    assert int(res.onset) in (theta, theta + 1), int(res.onset)
    assert bool(res.detected)
    np.testing.assert_allclose(float(res.jump_mle[theta, 0]), d_true,
                               rtol=1e-6)


def test_glr_calibration_and_detection_under_noise():
    """H0: GLR ~ chi2(1) (mean within MC slack, false-alarm rate at the
    1e-5 gate is zero across the batch); H1: a 6-sigma-class jump is
    detected with onset within 2 steps and magnitude within 20%."""
    import jax
    from gokalman_tpu import noise as gn
    from gokalman_tpu.filters import vanilla
    from gokalman_tpu.diagnostics import glr_detect

    rng = np.random.default_rng(0)
    f = np.array([[1.0, 1.0], [0.0, 1.0]])
    q = 5e-4 * np.array([[1 / 3, 1 / 2], [1 / 2, 1.0]])
    h = np.array([[1.0, 0.0]])
    r = np.array([[0.25]])
    e = np.array([[0.0], [1.0]])
    lq = np.linalg.cholesky(q)
    T, runs, theta, d_true = 60, 24, 30, 0.6
    m, s = vanilla.new(jnp.zeros(2), jnp.eye(2), jnp.asarray(f), None,
                       jnp.asarray(h),
                       gn.noiseless(jnp.asarray(q), jnp.asarray(r)))
    ys0 = np.zeros((runs, T, 1))
    ys1 = np.zeros((runs, T, 1))
    for i in range(runs):
        x0_, x1_ = np.zeros(2), np.zeros(2)
        for k in range(T):
            w = lq @ rng.standard_normal(2)
            x0_ = f @ x0_ + w
            x1_ = f @ x1_ + w
            if k == theta:
                x1_ = x1_ + e[:, 0] * d_true
            v = np.sqrt(r[0, 0]) * rng.standard_normal(1)
            ys0[i, k] = h @ x0_ + v
            ys1[i, k] = h @ x1_ + v
    est0 = jax.vmap(lambda y: vanilla.run(m, s, y)[1])(jnp.asarray(ys0))
    est1 = jax.vmap(lambda y: vanilla.run(m, s, y)[1])(jnp.asarray(ys1))
    det0 = jax.vmap(lambda es: glr_detect(f, h, e, es, 25.0, window=10))(
        est0)
    det1 = jax.vmap(lambda es: glr_detect(f, h, e, es, 25.0, window=10))(
        est1)
    # H0 calibration: per-onset GLR is chi2(1)-ish; drop the last
    # window (truncated sums) and the warmup
    g0 = np.asarray(det0.glr)[:, 5:-12]
    assert 0.7 < g0.mean() < 1.5, g0.mean()
    assert not np.asarray(det0.detected).any()
    # H1: detection rate (one realization can fall under the strict
    # 1e-5-class gate), onset tight, magnitude right
    assert np.asarray(det1.detected).mean() >= 0.9
    onsets = np.asarray(det1.onset)
    assert (np.abs(onsets - theta) <= 4).mean() == 1.0, onsets  # all runs localize the jump (late-biased by H E = 0 at onset)
    d_at = np.asarray(det1.jump_mle)[np.arange(runs), onsets, 0]
    assert abs(np.median(d_at) - d_true) < 0.12, np.median(d_at)


def test_glr_survives_masked_measurement_steps():
    """Regression (review find, measured): a meas_mask-ed component's
    exactly-zero gain column made K'K singular and NaN-poisoned every
    onset whose window covered that step — the jump was silently
    missed.  Masked components are now excised per step; the detector
    stays finite and still finds the jump."""
    import jax
    from gokalman_tpu import noise as gn
    from gokalman_tpu.filters import vanilla
    from gokalman_tpu.diagnostics import glr_detect

    rng = np.random.default_rng(3)
    f = np.array([[1.0, 1.0], [0.0, 1.0]])
    q = 5e-4 * np.array([[1 / 3, 1 / 2], [1 / 2, 1.0]])
    h = np.eye(2)
    r = np.diag([0.25, 0.04])
    e = np.array([[0.0], [1.0]])
    lq = np.linalg.cholesky(q)
    T, theta, d_true = 50, 25, 0.8
    m, s = vanilla.new(jnp.zeros(2), jnp.eye(2), jnp.asarray(f), None,
                       jnp.asarray(h),
                       gn.noiseless(jnp.asarray(q), jnp.asarray(r)))
    x = np.zeros(2)
    ests = []
    st = s
    for k in range(T):
        x = f @ x + lq @ rng.standard_normal(2)
        if k == theta:
            x = x + e[:, 0] * d_true
        y = x + np.sqrt(np.diag(r)) * rng.standard_normal(2)
        mask = np.array([True, k not in (22, 28)])  # drop v-comp twice
        st, est = vanilla.step(m, st, jnp.asarray(y),
                               meas_mask=jnp.asarray(mask))
        ests.append(est)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *ests)
    res = glr_detect(f, h, e, stacked, threshold=25.0, window=8)
    assert np.isfinite(np.asarray(res.glr)).all()
    assert bool(res.detected)
    assert abs(int(res.onset) - theta) <= 3, int(res.onset)
    # and the r= direct-S path agrees on detection
    res2 = glr_detect(f, h, e, stacked, threshold=25.0, window=8, r=r)
    assert np.isfinite(np.asarray(res2.glr)).all()
    assert bool(res2.detected)


def test_gospa_hand_cases_and_brute_force():
    from gokalman_tpu.diagnostics import gospa
    import itertools

    c, p = 5.0, 2.0
    # one matched pair at distance 1, one missed truth
    est = np.array([[0.0, 0.0]])
    tru = np.array([[1.0, 0.0], [100.0, 0.0]])
    r = gospa(est, np.ones(1, bool), tru, np.ones(2, bool), c, p)
    np.testing.assert_allclose(float(r.localization), 1.0)
    np.testing.assert_allclose(float(r.missed), c**2 / 2)
    np.testing.assert_allclose(float(r.false), 0.0)
    np.testing.assert_allclose(float(r.gospa),
                               np.sqrt(1.0 + c**2 / 2))
    # false track only
    r2 = gospa(est, np.ones(1, bool), tru, np.zeros(2, bool), c, p)
    np.testing.assert_allclose(float(r2.gospa), np.sqrt(c**2 / 2))
    np.testing.assert_allclose(float(r2.false), c**2 / 2)
    # beyond-cutoff pair: better to declare one missed + one false
    r3 = gospa(np.array([[0.0, 0.0]]), np.ones(1, bool),
               np.array([[10.0, 0.0]]), np.ones(1, bool), c, p)
    np.testing.assert_allclose(float(r3.gospa), np.sqrt(c**2))
    # brute-force oracle on random masked scenes
    rng = np.random.default_rng(0)
    for _ in range(15):
        m_, n_ = rng.integers(1, 4), rng.integers(1, 4)
        est = rng.uniform(-4, 4, (int(m_), 2))
        tru = rng.uniform(-4, 4, (int(n_), 2))
        em = rng.random(int(m_)) < 0.8
        tm = rng.random(int(n_)) < 0.8

        def brute():
            ei = [i for i in range(int(m_)) if em[i]]
            ti = [j for j in range(int(n_)) if tm[j]]
            best = np.inf
            for k in range(min(len(ei), len(ti)) + 1):
                for rows in itertools.combinations(ei, k):
                    for cols in itertools.permutations(ti, k):
                        ds = [np.linalg.norm(est[i] - tru[j])
                              for i, j in zip(rows, cols)]
                        if any(d >= c for d in ds):
                            continue
                        tot = sum(d**p for d in ds) \
                            + c**p / 2 * (len(ti) - k) \
                            + c**p / 2 * (len(ei) - k)
                        best = min(best, tot)
            return best ** (1 / p)

        r = gospa(est, em, tru, tm, c, p)
        np.testing.assert_allclose(float(r.gospa), brute(), rtol=1e-9)
        # decomposition identity
        np.testing.assert_allclose(
            float(r.gospa),
            (float(r.localization) + float(r.missed)
             + float(r.false)) ** (1 / p), rtol=1e-12)


def test_gospa_separates_missed_from_false_where_ospa_cannot():
    """The reason GOSPA exists: same OSPA for a missed target and a
    false track; GOSPA's decomposition names the failure."""
    from gokalman_tpu.diagnostics import gospa

    tru = np.array([[0.0, 0.0], [10.0, 0.0]])
    est_missing = np.array([[0.1, 0.0], [0.0, 0.0]])
    m_missing = np.array([True, False])  # misses truth #2
    est_extra = np.array([[0.1, 0.0], [10.1, 0.0], [50.0, 0.0]])
    r_miss = gospa(est_missing, m_missing, tru, np.ones(2, bool), 5.0)
    r_false = gospa(est_extra, np.ones(3, bool), tru,
                    np.ones(2, bool), 5.0)
    assert float(r_miss.missed) > 0 and float(r_miss.false) == 0
    assert float(r_false.false) > 0 and float(r_false.missed) == 0
