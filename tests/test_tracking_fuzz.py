"""Padded-slot poison fuzz across the tracking tier: every filter that
consumes padded [m_max, p] candidate frames must be bit-identical when
the MASKED slots hold NaN/inf garbage instead of zeros.  This is the
bug class that has actually bitten (multiplicative masking turns
NaN*0 into NaN; jnp.where is the required idiom — see phd.py), so the
net covers pdaf, jpda, tracker, phd, cphd, and pmb in one sweep."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import cphd, jpda, pdaf, phd, pmb, tracker

from test_phd import _birth, _cv_system


def _scene(seed=0, T=25, m_max=5):
    """Frames with exactly 3 valid detections; slots 3.. are masked."""
    f, q, h, r = _cv_system()
    fn, hn = np.asarray(f), np.asarray(h)
    rng = np.random.default_rng(seed)
    x = np.array([-4.0, 0.1, -4.0, 0.1])
    frames = np.zeros((T, m_max, 2))
    for k in range(T):
        x = fn @ x
        frames[k, 0] = hn @ x + 0.2 * rng.standard_normal(2)
        frames[k, 1:3] = rng.uniform(-30, 30, (2, 2))
    masks = np.zeros((T, m_max), bool)
    masks[:, :3] = True
    return f, q, h, r, frames, masks


def _poison(frames, masks):
    bad = np.array(frames, copy=True)
    bad[~masks] = np.nan
    bad[:, -1, :] = np.inf  # the last padded slot gets inf instead
    return bad


def _run_both(run_fn, frames, masks):
    clean = run_fn(jnp.asarray(frames), jnp.asarray(masks))
    poisoned = run_fn(jnp.asarray(_poison(frames, masks)),
                      jnp.asarray(masks))
    return clean, poisoned


def _assert_tree_equal(a, b):
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_pdaf_ignores_poisoned_padding():
    f, q, h, r, frames, masks = _scene()
    m, s = pdaf.new(jnp.asarray([-4.0, 0.1, -4.0, 0.1]),
                    0.2 * jnp.eye(4), f, None, h, gn.noiseless(q, r),
                    pd=0.9, clutter_density=2 / 3600.0)
    clean, poisoned = _run_both(lambda fr, ma: pdaf.run(m, s, fr, ma),
                                frames, masks)
    _assert_tree_equal(clean, poisoned)
    assert np.isfinite(np.asarray(clean[1].state)).all()


def test_jpda_ignores_poisoned_padding():
    f, q, h, r, frames, masks = _scene()
    x0s = jnp.asarray([[-4.0, 0.1, -4.0, 0.1], [20.0, 0.0, 20.0, 0.0]])
    m, s = jpda.new(x0s, 0.2 * jnp.eye(4), f, None, h,
                    gn.noiseless(q, r), m_max=frames.shape[1])
    clean, poisoned = _run_both(lambda fr, ma: jpda.run(m, s, fr, ma),
                                frames, masks)
    _assert_tree_equal(clean, poisoned)


def test_tracker_ignores_poisoned_padding():
    f, q, h, r, frames, masks = _scene()
    m, s = tracker.new(f, None, h, gn.noiseless(q, r), n_slots=6,
                       p0_new=jnp.diag(jnp.asarray([0.2, 0.25, 0.2,
                                                    0.25])))
    clean, poisoned = _run_both(lambda fr, ma: tracker.run(m, s, fr, ma),
                                frames, masks)
    _assert_tree_equal(clean, poisoned)


@pytest.mark.parametrize("mod", ["phd", "cphd", "pmb"])
def test_rfs_filters_ignore_poisoned_padding(mod):
    f, q, h, r, frames, masks = _scene()
    bw, bm, bp = _birth()
    nz = gn.noiseless(q, r)
    if mod == "phd":
        m, s = phd.new(f, None, h, nz, bw, bm, bp, j_max=12)
        run = lambda fr, ma: phd.run(m, s, fr, ma)
    elif mod == "cphd":
        m, s = cphd.new(f, None, h, nz, bw, bm, bp, clutter_rate=2.0,
                        volume=3600.0, n_max=8, j_max=12)
        run = lambda fr, ma: cphd.run(m, s, fr, ma)
    else:
        m, s = pmb.new(f, None, h, nz, bw, bm, bp, j_max=12, t_max=6)
        run = lambda fr, ma: pmb.run(m, s, fr, ma)
    clean, poisoned = _run_both(run, frames, masks)
    _assert_tree_equal(clean, poisoned)
    for leaf in jax.tree_util.tree_leaves(clean[1]):
        assert np.isfinite(np.asarray(leaf, dtype=np.float64)).all()


def test_all_masked_frames_are_pure_prediction_everywhere():
    """A fully-masked frame must not corrupt anything even when the
    frame data is ALL poison."""
    f, q, h, r, frames, masks = _scene()
    masks = np.zeros_like(masks)
    bw, bm, bp = _birth()
    m, s = pmb.new(f, None, h, gn.noiseless(q, r), bw, bm, bp,
                   j_max=12, t_max=6)
    _, est = pmb.run(m, s, jnp.asarray(_poison(frames, masks)),
                     jnp.asarray(masks))
    for leaf in jax.tree_util.tree_leaves(est):
        assert np.isfinite(np.asarray(leaf, dtype=np.float64)).all()
