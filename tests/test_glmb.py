"""delta-GLMB pins: multi-frame digit-level parity against a
first-principles labeled-history enumeration (the hypothesis-carrying
property LMB cannot have), frame-1 marginal == exact LMB, exact
cardinality pmf identities, single-target KF parity, labels through a
crossing, padded-slot poison."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import glmb, lmb, vanilla


def _cv1d():
    """2-state [x, v] CV system (small, keeps enumeration tractable)."""
    dt = 1.0
    f = jnp.asarray([[1.0, dt], [0.0, 1.0]])
    q = jnp.asarray([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]]) * 1e-3
    h = jnp.asarray([[1.0, 0.0]])
    r = 0.04 * jnp.eye(1)
    return f, q, h, r


def _bruteforce_glmb_histories(frames, br, bm, bp, f, q, h, r_cov,
                               ps, pd, kappa):
    """First-principles multi-frame labeled multi-target Bayes:
    enumerate EVERY history (per frame: each slot dead / missed /
    detected-by-z_j, detections one-to-one), carrying per-label
    Gaussians exactly.  Returns the normalized list of
    (weight, {label: (mean, cov)}) hypotheses after the last frame."""
    f = np.asarray(f); q = np.asarray(q)
    h = np.asarray(h); r_cov = np.asarray(r_cov)
    br = np.asarray(br); bm = np.asarray(bm); bp = np.asarray(bp)

    def gauss(z, mp, Pp):
        s = h @ Pp @ h.T + r_cov
        d = z - h @ mp
        return (np.exp(-0.5 * d @ np.linalg.solve(s, d))
                / np.sqrt((2 * np.pi) ** len(z) * np.linalg.det(s)))

    def kf_update(mp, Pp, z):
        s = h @ Pp @ h.T + r_cov
        k = Pp @ h.T @ np.linalg.inv(s)
        mu = mp + k @ (z - h @ mp)
        ikh = np.eye(len(mp)) - k @ h
        return mu, ikh @ Pp @ ikh.T + k @ r_cov @ k.T

    hyps = [(1.0, {})]
    for k_fr, zs in enumerate(frames):
        zs = [np.asarray(z) for z in zs]
        new_hyps = []
        for w, tracks in hyps:
            slots = []
            for lab, (mm, pp) in sorted(tracks.items()):
                slots.append((lab, f @ mm, f @ pp @ f.T + q, ps))
            for b in range(len(br)):
                slots.append(((k_fr, b), bm[b], bp[b], br[b]))

            def rec(i, used, cur_w, cur_tracks):
                if i == len(slots):
                    new_hyps.append((w * cur_w, dict(cur_tracks)))
                    return
                lab, mp, Pp, pex = slots[i]
                rec(i + 1, used, cur_w * (1.0 - pex), cur_tracks)
                rec(i + 1, used, cur_w * pex * (1.0 - pd),
                    {**cur_tracks, lab: (mp, Pp)})
                for j, z in enumerate(zs):
                    if j in used:
                        continue
                    mu, pu = kf_update(mp, Pp, z)
                    rec(i + 1, used | {j},
                        cur_w * pex * pd * gauss(z, mp, Pp) / kappa,
                        {**cur_tracks, lab: (mu, pu)})

            rec(0, frozenset(), 1.0, {})
        tot = sum(w for w, _ in new_hyps)
        hyps = [(w / tot, t) for w, t in new_hyps if w > 0.0]
    return hyps


def _marginals(hyps):
    """(pmf dict, {label: (r, mean)}) from brute-force hypotheses."""
    pmf = {}
    r = {}
    mean = {}
    for w, tracks in hyps:
        pmf[len(tracks)] = pmf.get(len(tracks), 0.0) + w
        for lab, (mm, _) in tracks.items():
            r[lab] = r.get(lab, 0.0) + w
            mean[lab] = mean.get(lab, 0.0) + w * mm
    for lab in mean:
        mean[lab] = mean[lab] / r[lab]
    return pmf, r, mean


PS, PD, KAPPA = 0.95, 0.85, 1e-2


def _glmb_model(t_max=4, h_max=4096, jb=1):
    f, q, h, r = _cv1d()
    bm = jnp.asarray([[0.0, 0.0], [6.0, 0.0]][:jb])
    bp = jnp.broadcast_to(jnp.diag(jnp.asarray([4.0, 0.25])), (jb, 2, 2))
    br = jnp.asarray([0.3, 0.3][:jb])
    model, state = glmb.new(f, None, h, gn.noiseless(q, r), br, bm, bp,
                            m_max=2, p_survival=PS, p_detect=PD,
                            clutter=KAPPA, gate=1e12, t_max=t_max,
                            h_max=h_max)
    return model, state, (f, q, h, r, br, bm, bp)


def test_multiframe_matches_bruteforce_history_enumeration():
    """Three frames, one birth slot, two measurements per frame:
    delta-GLMB with h_max >= the number of feasible histories equals
    the exact labeled Bayes posterior digit-level — cardinality pmf,
    per-label existence and means.  (LMB provably cannot: it
    moment-matches the joint away every frame.)"""
    model, state, (f, q, h, r, br, bm, bp) = _glmb_model()
    frames = [
        [np.array([0.4]), np.array([5.0])],
        [np.array([0.7]), np.array([-3.0])],
        [np.array([1.1]), np.array([0.2])],
    ]
    cands = jnp.asarray(np.stack([np.stack(fr) for fr in frames]))
    masks = jnp.ones((3, 2), bool)
    _, ests = glmb.run(model, state, cands, masks)

    hyps = _bruteforce_glmb_histories(frames, br, bm, bp, f, q, h, r,
                                      PS, PD, KAPPA)
    pmf_bf, r_bf, mean_bf = _marginals(hyps)

    pmf = np.asarray(ests.cardinality_pmf[-1])
    for c in range(len(pmf)):
        np.testing.assert_allclose(pmf[c], pmf_bf.get(c, 0.0),
                                   rtol=1e-9, atol=1e-12)
    # per-label marginals, matched via the label table
    labs = np.asarray(ests.labels[-1])
    r_marg = np.asarray(ests.existence[-1])
    means = np.asarray(ests.states[-1])
    seen = 0
    for i in range(labs.shape[0]):
        lab = tuple(labs[i])
        if lab == (-1, -1):
            assert r_marg[i] < 1e-12
            continue
        assert lab in r_bf, lab
        np.testing.assert_allclose(r_marg[i], r_bf[lab],
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(means[i], mean_bf[lab],
                                   rtol=1e-8, atol=1e-9)
        seen += 1
    assert seen == len([l for l, rr in r_bf.items() if rr > 1e-12])
    # the pmf is a distribution and mass == mean
    np.testing.assert_allclose(pmf.sum(), 1.0, rtol=1e-12)
    np.testing.assert_allclose(
        float(ests.n_targets[-1]),
        sum(c * w for c, w in pmf_bf.items()), rtol=1e-9)


def test_truncation_below_history_count_still_normalized():
    """With h_max far below the history count the filter is the usual
    truncated delta-GLMB: weights stay a normalized distribution and
    the marginals stay within the truncated mass of exact."""
    model, state, sysm = _glmb_model(h_max=64)
    frames = jnp.asarray([[[0.4], [5.0]], [[0.7], [-3.0]],
                          [[1.1], [0.2]]])
    masks = jnp.ones((3, 2), bool)
    _, ests = glmb.run(model, state, frames, masks)
    w = np.exp(np.asarray(ests.hyp_log_w[-1]))
    w = w[np.isfinite(np.asarray(ests.hyp_log_w[-1]))]
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-9)
    assert np.all(np.asarray(ests.cardinality_pmf[-1]) >= 0)


def test_frame1_marginals_match_exact_lmb():
    """Frame 1 from an empty prior: the LMB update (exact association
    backend) IS the delta-GLMB marginalization, so per-label existence,
    means AND moment-matched covariances agree digit-level."""
    f, q, h, r = _cv1d()
    jb = 2
    bm = jnp.asarray([[0.0, 0.0], [6.0, 0.0]])
    bp = jnp.broadcast_to(jnp.diag(jnp.asarray([4.0, 0.25])), (jb, 2, 2))
    br = jnp.asarray([0.4, 0.25])
    g_model, g_state = glmb.new(f, None, h, gn.noiseless(q, r), br, bm,
                                bp, m_max=2, p_survival=PS, p_detect=PD,
                                clutter=KAPPA, gate=1e12, t_max=4,
                                h_max=512)
    l_model, l_state = lmb.new(f, None, h, gn.noiseless(q, r), br, bm,
                               bp, m_max=2, p_survival=PS, p_detect=PD,
                               clutter=KAPPA, gate=1e12, t_max=4,
                               r_prune=0.0, assoc="exact")
    cands = jnp.asarray([[0.3], [6.5]])
    mask = jnp.ones(2, bool)
    _, g_est = glmb.step(g_model, g_state, cands, mask)
    _, l_est = lmb.step(l_model, l_state, cands, mask)

    def by_label(labels, *arrays):
        out = {}
        for i in range(labels.shape[0]):
            lab = tuple(np.asarray(labels[i]))
            if lab != (-1, -1):
                out[lab] = tuple(np.asarray(a[i]) for a in arrays)
        return out

    g = by_label(g_est.labels, g_est.existence, g_est.states,
                 g_est.covariances)
    l = by_label(l_est.labels, l_est.existence, l_est.states,
                 l_est.covariances)
    assert set(g) == set(l) and len(g) == 2
    for lab in g:
        np.testing.assert_allclose(g[lab][0], l[lab][0], rtol=1e-9)
        np.testing.assert_allclose(g[lab][1], l[lab][1],
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(g[lab][2], l[lab][2],
                                   rtol=1e-7, atol=1e-9)


def test_single_target_kf_parity():
    """PD=1, no clutter candidates beyond the target's: every
    surviving hypothesis that carries the label has the same KF-updated
    Gaussian, so the marginal mean equals a hand-seeded vanilla KF
    digit-level (frame-0 birth enters the update UNPREDICTED — the
    lmb/pmb convention)."""
    f, q, h, r = _cv1d()
    bm = jnp.asarray([[0.0, 0.5]])
    bp = jnp.asarray([np.diag([1.0, 0.25])])
    br = jnp.asarray([0.9])
    model, state = glmb.new(f, None, h, gn.noiseless(q, r), br, bm, bp,
                            m_max=1, p_survival=1.0, p_detect=1.0,
                            clutter=1e-4, gate=1e12, t_max=2, h_max=32)
    rng = np.random.default_rng(5)
    T = 12
    x = np.array([0.0, 0.5])
    fs, qs, hs, rs = (np.asarray(a) for a in (f, q, h, r))
    zs = []
    for _ in range(T):
        zs.append(hs @ x + rng.normal(0, 0.2, 1))
        x = fs @ x
    cands = jnp.asarray(np.stack(zs))[:, None, :]
    masks = jnp.ones((T, 1), bool)
    _, ests = glmb.run(model, state, cands, masks)

    # frame 0: birth updated unpredicted == plain KF measurement update
    ref = []
    xk, pk = np.asarray(bm[0]), np.asarray(bp[0])
    for t in range(T):
        if t > 0:
            xk = fs @ xk
            pk = fs @ pk @ fs.T + qs
        s = hs @ pk @ hs.T + rs
        kg = pk @ hs.T @ np.linalg.inv(s)
        xk = xk + kg @ (np.asarray(zs[t]) - hs @ xk)
        ikh = np.eye(2) - kg @ hs
        pk = ikh @ pk @ ikh.T + kg @ rs @ kg.T
        ref.append(xk.copy())
    # the target's slot is the one with existence ~1
    idx = int(np.argmax(np.asarray(ests.existence[-1])))
    np.testing.assert_allclose(np.asarray(ests.states[-1, idx]),
                               ref[-1], rtol=1e-8, atol=1e-9)
    assert float(ests.existence[-1, idx]) > 0.999
    assert int(ests.map_cardinality[-1]) == 1


def test_cardinality_pmf_mass_equals_mean():
    model, state, _ = _glmb_model(h_max=256)
    frames = jnp.asarray([[[0.4], [5.0]], [[0.7], [-3.0]]])
    masks = jnp.ones((2, 2), bool)
    _, ests = glmb.run(model, state, frames, masks)
    pmf = np.asarray(ests.cardinality_pmf[-1])
    mean_from_pmf = np.sum(np.arange(len(pmf)) * pmf)
    np.testing.assert_allclose(mean_from_pmf,
                               float(ests.n_targets[-1]), rtol=1e-9)


def test_padded_slot_poison():
    """NaN/inf in masked candidate slots must be bit-identical vs zero
    padding (the tracking-tier fuzz rule)."""
    model, state, _ = _glmb_model(h_max=128)
    good = jnp.asarray([[[0.4], [0.0]], [[0.7], [0.0]]])
    bad = jnp.asarray([[[0.4], [jnp.nan]], [[0.7], [jnp.inf]]])
    masks = jnp.asarray([[True, False], [True, False]])
    _, e1 = glmb.run(model, state, good, masks)
    _, e2 = glmb.run(model, state, bad, masks)
    for a, b in zip(jax.tree.leaves(e1), jax.tree.leaves(e2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_labels_through_crossing_and_beats_lmb_pmf():
    """Two targets crossing mid-arc: the MAP-hypothesis track set keeps
    both labels alive through the crossing, and the delta-GLMB
    cardinality pmf stays sharper (higher P(n=2)) than the LMB's
    Poisson-binomial approximation on the same frames."""
    f, q, h, r = _cv1d()
    jb = 2
    bm = jnp.asarray([[-6.0, 0.6], [6.0, -0.6]])
    bp = jnp.broadcast_to(jnp.diag(jnp.asarray([1.0, 0.04])), (jb, 2, 2))
    # recurring birth rate low (the standard setting), clutter density
    # set to the true 1 point / 20 units
    br = jnp.asarray([0.08, 0.08])
    kw = dict(m_max=3, p_survival=0.99, p_detect=0.95, clutter=0.05,
              gate=1e12)
    g_model, g_state = glmb.new(f, None, h, gn.noiseless(q, r), br, bm,
                                bp, t_max=4, h_max=256, **kw)
    l_model, l_state = lmb.new(f, None, h, gn.noiseless(q, r), br, bm,
                               bp, t_max=4, assoc="exact", **kw)
    rng = np.random.default_rng(11)
    T = 20
    xa = np.array([-6.0, 0.6])
    xb = np.array([6.0, -0.6])
    fs, hs = np.asarray(f), np.asarray(h)
    cands, masks = [], []
    for _ in range(T):
        za = hs @ xa + rng.normal(0, 0.2, 1)
        zb = hs @ xb + rng.normal(0, 0.2, 1)
        zc = rng.uniform(-10, 10, 1)
        cands.append(np.stack([za, zb, zc]))
        masks.append([True, True, True])
        xa = fs @ xa
        xb = fs @ xb
    cands = jnp.asarray(np.stack(cands))
    masks = jnp.asarray(masks)
    _, g_ests = glmb.run(g_model, g_state, cands, masks)
    _, l_ests = lmb.run(l_model, l_state, cands, masks)

    # both birth labels alive in the MAP hypothesis at the end
    labs = np.asarray(g_ests.labels[-1])
    alive = np.asarray(g_ests.map_alive[-1])
    alive_labs = {tuple(labs[i]) for i in range(4) if alive[i]}
    assert (0, 0) in alive_labs and (0, 1) in alive_labs
    assert int(g_ests.map_cardinality[-1]) == 2

    g_p2 = float(g_ests.cardinality_pmf[-1, 2])
    l_pmf = lmb.cardinality_pmf(l_ests.existence[-1])
    assert g_p2 >= float(l_pmf[2]) - 1e-6
    # n=2 is the clear mode (recurring tentative births keep some mass
    # at n=3, clutter-missed frames at n=1 — a sharp peak, not 1.0)
    assert g_p2 > 0.5


def test_gibbs_mode_approximates_exact():
    """assoc='gibbs' with a healthy sample budget lands near the exact
    posterior on the small scene: cardinality pmf within 0.05, marginal
    existence within 0.05, means within 0.1 of exact — and its weights
    are a normalized distribution (each child scored exactly)."""
    f, q, h, r = _cv1d()
    bm = jnp.asarray([[0.0, 0.0]])
    bp = jnp.broadcast_to(jnp.diag(jnp.asarray([4.0, 0.25])), (1, 2, 2))
    br = jnp.asarray([0.3])
    kw = dict(m_max=2, p_survival=PS, p_detect=PD, clutter=KAPPA,
              gate=1e12, t_max=4)
    e_model, e_state = glmb.new(f, None, h, gn.noiseless(q, r), br, bm,
                                bp, h_max=4096, assoc="exact", **kw)
    g_model, g_state = glmb.new(f, None, h, gn.noiseless(q, r), br, bm,
                                bp, h_max=512, assoc="gibbs",
                                n_samples=64, gibbs_sweeps=8, **kw)
    frames = jnp.asarray([[[0.4], [5.0]], [[0.7], [-3.0]],
                          [[1.1], [0.2]]])
    masks = jnp.ones((3, 2), bool)
    _, e_ests = glmb.run(e_model, e_state, frames, masks)
    _, g_ests = glmb.run(g_model, g_state, frames, masks,
                         key=jax.random.PRNGKey(0))

    w = np.asarray(g_ests.hyp_log_w[-1])
    np.testing.assert_allclose(np.exp(w[np.isfinite(w)]).sum(), 1.0,
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_ests.cardinality_pmf[-1]),
                               np.asarray(e_ests.cardinality_pmf[-1]),
                               atol=0.05)

    def by_label(est):
        labs = np.asarray(est.labels[-1])
        out = {}
        for i in range(labs.shape[0]):
            lab = tuple(labs[i])
            if lab != (-1, -1):
                out[lab] = (float(est.existence[-1, i]),
                            np.asarray(est.states[-1, i]))
        return out

    e_m, g_m = by_label(e_ests), by_label(g_ests)
    for lab, (re_, me) in e_m.items():
        if re_ < 0.01:
            continue
        assert lab in g_m, (lab, g_m.keys())
        rg, mg = g_m[lab]
        assert abs(rg - re_) < 0.05, (lab, rg, re_)
        if re_ > 0.5:
            # tentative labels' marginal means are multi-modal
            # mixtures over association modes — exactly the part a
            # sampled hypothesis set resolves last; only solidly
            # detected labels pin tightly
            np.testing.assert_allclose(mg, me, atol=0.1)


def test_gibbs_children_respect_one_to_one():
    """No sampled child may assign two labels to one measurement: feed
    two targets sitting ON the same single measurement — the exact and
    gibbs modes must both give it to only one label per hypothesis, so
    P(both labels alive AND both detected) contributes no weight with
    m=1... observable as the gibbs cardinality pmf matching exact."""
    f, q, h, r = _cv1d()
    bm = jnp.asarray([[0.0, 0.0], [0.0, 0.0]])
    bp = jnp.broadcast_to(jnp.diag(jnp.asarray([1.0, 0.25])), (2, 2, 2))
    br = jnp.asarray([0.6, 0.6])
    kw = dict(m_max=1, p_survival=PS, p_detect=0.99, clutter=1e-3,
              gate=1e12, t_max=3)
    e_model, e_state = glmb.new(f, None, h, gn.noiseless(q, r), br, bm,
                                bp, h_max=1024, assoc="exact", **kw)
    g_model, g_state = glmb.new(f, None, h, gn.noiseless(q, r), br, bm,
                                bp, h_max=256, assoc="gibbs",
                                n_samples=64, gibbs_sweeps=10, **kw)
    frames = jnp.asarray([[[0.1]], [[0.2]]])
    masks = jnp.ones((2, 1), bool)
    _, e_ests = glmb.run(e_model, e_state, frames, masks)
    _, g_ests = glmb.run(g_model, g_state, frames, masks,
                         key=jax.random.PRNGKey(3))
    g_pmf = np.asarray(g_ests.cardinality_pmf[-1])
    e_pmf = np.asarray(e_ests.cardinality_pmf[-1])
    # the discriminating check: a double assignment would put both
    # labels alive+detected on the single measurement, whose weight
    # (PD N/kappa ~ 1e3 each) would dominate — pmf[2] would jump to
    # O(1) instead of the exact ~0.02 (both alive needs one MISSED)
    assert g_pmf[2] < 0.1, g_pmf
    assert abs(g_pmf[1] - e_pmf[1]) < 0.06, (g_pmf, e_pmf)
    assert int(g_ests.map_cardinality[-1]) == 1


def test_gibbs_requires_key():
    f, q, h, r = _cv1d()
    bm = jnp.asarray([[0.0, 0.0]])
    bp = jnp.broadcast_to(jnp.eye(2), (1, 2, 2))
    br = jnp.asarray([0.3])
    model, state = glmb.new(f, None, h, gn.noiseless(q, r), br, bm, bp,
                            m_max=1, assoc="gibbs")
    with pytest.raises(ValueError):
        glmb.step(model, state, jnp.zeros((1, 1)), jnp.ones(1, bool))
