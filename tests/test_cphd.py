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
