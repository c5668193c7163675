"""GM-CPHD pins: steadier cardinality than the PHD (the filter's whole
reason to exist), MAP-count correctness through birth/death,
intensity/cardinality internal consistency, pure-clutter rejection."""

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import cphd, phd

from test_phd import _birth, _cv_system, _scenario


def _models(j_max=24):
    f, q, h, r, frames, masks, ta, tb = _scenario()
    bw, bm, bp = _birth()
    cm, cs = cphd.new(f, None, h, gn.noiseless(q, r), bw, bm, bp,
                      p_survival=0.99, p_detect=0.95,
                      clutter_rate=5.0, volume=10000.0,
                      n_max=12, j_max=j_max)
    pm, ps = phd.new(f, None, h, gn.noiseless(q, r), bw, bm, bp,
                     p_survival=0.99, p_detect=0.95,
                     clutter=5 / 10000.0, j_max=j_max)
    return cm, cs, pm, ps, frames, masks, ta, tb


def test_cphd_cardinality_is_steadier_than_phd():
    """The CPHD's selling point: the PHD's single-missed-detection
    weight collapse (x(1-PD) for a frame) becomes a small wobble.
    Measured: 2-target-window std 0.061 vs PHD 0.372 (6x), and at the
    PHD's worst dip (0.06 expected targets) the CPHD holds >=0.7."""
    cm, cs, pm, ps, frames, masks, ta, tb = _models()
    _, ec = cphd.run(cm, cs, frames, masks)
    _, ep = phd.run(pm, ps, frames, masks)
    c_mean = np.asarray(ec.cardinality_mean)
    p_card = np.asarray(ep.cardinality)
    assert c_mean[30:44].std() < 0.4 * p_card[30:44].std(), (
        c_mean[30:44].std(), p_card[30:44].std())
    worst_phd = p_card[46:55].min()
    worst_cphd = c_mean[46:55].min()
    assert worst_phd < 0.3  # the PHD dip is real
    assert worst_cphd > 0.5, worst_cphd  # the CPHD rides through it


def test_cphd_map_count_through_birth_and_death():
    cm, cs, pm, ps, frames, masks, ta, tb = _models()
    _, ec = cphd.run(cm, cs, frames, masks)
    cmap = np.asarray(ec.cardinality_map)
    assert (cmap[8:18] == 1).mean() > 0.9, cmap[8:18]
    assert (cmap[30:44] == 2).mean() > 0.9, cmap[30:44]
    assert (cmap[60:] == 1).mean() > 0.9, cmap[60:]
    # pmf normalized every step
    np.testing.assert_allclose(
        np.asarray(ec.cardinality_pmf).sum(axis=1), 1.0, atol=1e-9)


def test_cphd_intensity_integral_matches_cardinality_mean():
    """Internal consistency of the update constants: the posterior
    intensity must integrate to the posterior mean count (the Z=∅ limit
    of this identity fixes the <1,w> powers — derived analytically,
    pinned here over a whole cluttered run)."""
    cm, cs, pm, ps, frames, masks, ta, tb = _models()
    _, ec = cphd.run(cm, cs, frames, masks)
    sum_w = np.asarray(ec.weights).sum(axis=1)
    c_mean = np.asarray(ec.cardinality_mean)
    # truncation loses a little mass; agreement to a few percent
    np.testing.assert_allclose(sum_w[5:], c_mean[5:], rtol=0.08,
                               atol=0.05)


def test_cphd_localizes_like_phd():
    cm, cs, pm, ps, frames, masks, ta, tb = _models()
    _, ec = cphd.run(cm, cs, frames, masks)
    for k in (35, 40):
        tops = np.asarray(ec.states[k, :2, ::2])
        truths = np.stack([ta[k][::2], tb[k][::2]])
        d = np.linalg.norm(tops[None, :, :] - truths[:, None, :], axis=2)
        assert d.min(axis=1).max() < 0.6, d


def test_cphd_pure_clutter_stays_empty():
    f, q, h, r = _cv_system()
    bw, bm, bp = _birth()
    rng = np.random.default_rng(7)
    T = 50
    frames = jnp.asarray(rng.uniform(-50, 50, (T, 5, 2)))
    masks = jnp.ones((T, 5), bool)
    model, state = cphd.new(f, None, h, gn.noiseless(q, r), bw, bm, bp,
                            p_survival=0.99, p_detect=0.95,
                            clutter_rate=5.0, volume=10000.0,
                            n_max=12, j_max=16)
    _, est = cphd.run(model, state, frames, masks)
    assert np.asarray(est.cardinality_mean).mean() < 0.3
    assert (np.asarray(est.cardinality_map) == 0).mean() > 0.9


def test_cphd_ctor_validation():
    import pytest

    f, q, h, r = _cv_system()
    bw, bm, bp = _birth()
    with pytest.raises(ValueError):
        cphd.new(f, None, h, gn.noiseless(q, r), bw, bm, bp,
                 clutter_rate=0.0)
    with pytest.raises(ValueError):
        cphd.new(f, None, h, gn.noiseless(q, r), bw[:1], bm, bp)


def test_cphd_cardinality_is_exact_bayes_on_small_scenes():
    """The decisive constant pin: posterior cardinality pmf == EXACT
    brute-force multi-target Bayes for |Z| in {1, 2} (one-component
    intensity, ps=1, F=I, Q~0, negligible birth).  The mass==mean
    identity is provably BLIND to the clutter convention (a review
    pass showed the first version divided Ξ by λc·c instead of c and
    still satisfied it); this test is not."""
    import math

    n_dim = 1
    f = jnp.eye(n_dim)
    q = 1e-12 * jnp.eye(n_dim)
    h = jnp.eye(n_dim)
    r = jnp.asarray([[0.25]])
    pd, lam_c, vol = 0.7, 3.0, 10.0
    w0, m0, p0v = 1.3, 0.4, 0.5  # intensity: w0 N(m0, p0v)
    # Poisson(2) prior cardinality, truncated
    n_max = 10
    ns = np.arange(n_max + 1)
    rho0 = np.exp(-2.0) * 2.0**ns / np.array(
        [math.factorial(int(k)) for k in ns])
    rho0 = rho0 / rho0.sum()

    model, state = cphd.new(
        f, None, h, gn.noiseless(q, r),
        birth_w=jnp.asarray([1e-30]), birth_m=jnp.zeros((1, n_dim)),
        birth_p=jnp.eye(n_dim)[None], p_survival=1.0, p_detect=pd,
        clutter_rate=lam_c, volume=vol, n_max=n_max, j_max=8,
        trunc=1e-30)
    state = state._replace(
        w=state.w.at[0].set(w0),
        m=state.m.at[0].set(m0),
        p=state.p.at[0, 0, 0].set(p0v),
        rho=jnp.asarray(rho0))

    def gauss(z):
        s = p0v + float(r[0, 0]) + 1e-12
        return np.exp(-0.5 * (z - m0) ** 2 / s) / np.sqrt(2 * np.pi * s)

    c = 1.0 / vol
    sbar = lambda z: gauss(z)  # normalized spatial density (single comp)

    # |Z| = 1
    z1 = 0.5
    cands = jnp.full((3, 1), 1e6).at[0, 0].set(z1)
    masks = jnp.asarray([True, False, False])
    _, est = cphd.step(model, state, cands, masks)
    lik = (lam_c * c * (1 - pd) ** ns
           + ns * pd * sbar(z1) * (1 - pd) ** np.maximum(ns - 1, 0)
           * (ns >= 1))
    rho_exact = lik * rho0
    rho_exact = rho_exact / rho_exact.sum()
    np.testing.assert_allclose(np.asarray(est.cardinality_pmf),
                               rho_exact, atol=1e-9)
    # intensity mass == exact posterior mean count
    np.testing.assert_allclose(float(np.asarray(est.weights).sum()),
                               float((ns * rho_exact).sum()), rtol=1e-6)

    # |Z| = 2
    z2 = -0.3
    cands2 = jnp.full((3, 1), 1e6).at[0, 0].set(z1).at[1, 0].set(z2)
    masks2 = jnp.asarray([True, True, False])
    _, est2 = cphd.step(model, state, cands2, masks2)
    g1, g2 = sbar(z1), sbar(z2)
    lik2 = (lam_c**2 * c**2 * (1 - pd) ** ns
            + lam_c * (1 - pd) ** np.maximum(ns - 1, 0) * ns * pd
            * (c * g1 + c * g2) * (ns >= 1)
            + ns * np.maximum(ns - 1, 0) * pd**2 * g1 * g2
            * (1 - pd) ** np.maximum(ns - 2, 0) * (ns >= 2))
    rho_exact2 = lik2 * rho0
    rho_exact2 = rho_exact2 / rho_exact2.sum()
    np.testing.assert_allclose(np.asarray(est2.cardinality_pmf),
                               rho_exact2, atol=1e-9)
    np.testing.assert_allclose(float(np.asarray(est2.weights).sum()),
                               float((ns * rho_exact2).sum()), rtol=1e-6)


def test_cphd_adaptive_birth_acquires_and_stays_consistent():
    """Adaptive birth on the CPHD: acquires a target at an unknown
    location, AND the intensity-mass == mean-count identity still holds
    (the birth convolves the cardinality pmf by the matching Poisson)."""
    f, q, h, r = _cv_system()
    fn, hn = np.asarray(f), np.asarray(h)
    rng = np.random.default_rng(33)
    T = 40
    x = np.array([30.0, 0.05, -25.0, 0.05])
    frames = []
    for k in range(T):
        x = fn @ x
        dets = [hn @ x + 0.2 * rng.standard_normal(2)]
        while len(dets) < 4:
            dets.append(rng.uniform(-50, 50, 2))
        rng.shuffle(dets)
        frames.append(np.stack(dets))
    frames = jnp.asarray(np.stack(frames))
    masks = jnp.ones((T, 4), bool)
    bm = jnp.asarray([[0.0, 0.0, 0.0, 0.0]])
    bp = jnp.broadcast_to(jnp.diag(jnp.asarray([4.0, 0.25, 4.0, 0.25])),
                          (1, 4, 4))
    model, state = cphd.new(f, None, h, gn.noiseless(q, r),
                            jnp.asarray([0.02]), bm, bp, p_detect=0.95,
                            clutter_rate=4.0, volume=10000.0, n_max=12,
                            j_max=20, adaptive_birth_w=0.02)
    _, est = cphd.run(model, state, frames, masks)
    cm = np.asarray(est.cardinality_mean)
    assert 0.7 < cm[10:].mean() < 1.6, cm[10:].mean()
    assert (np.asarray(est.cardinality_map)[10:] == 1).mean() > 0.8
    d = np.linalg.norm(np.asarray(est.states)[-1, 0, ::2] - x[::2])
    assert d < 0.6, d
    # identity: intensity mass == mean count (truncation slack)
    sum_w = np.asarray(est.weights).sum(axis=1)
    np.testing.assert_allclose(sum_w[5:], cm[5:], rtol=0.08, atol=0.08)
