"""Huber robust measurement update: exact CKF equality on inliers,
graceful outlier suppression, weight semantics."""

import jax.numpy as jnp
import numpy as np

import gokalman_tpu as gk
from gokalman_tpu.filters import vanilla


def _system():
    f = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    q = jnp.diag(jnp.array([1e-4, 1e-3]))
    r = jnp.array([[0.04]])
    return vanilla.new(jnp.array([0.0, 0.5]), 0.1 * jnp.eye(2), f, None, h,
                       gk.noise.noiseless(q, r))


def test_robust_equals_ckf_on_inliers():
    model, st = _system()
    rng = np.random.default_rng(0)
    # Small residuals: |standardized| stays below k=1.345 throughout.
    ys = jnp.asarray((np.arange(20) * 0.05 + 0.02 * rng.standard_normal(20))
                     .reshape(-1, 1))
    _, ref = vanilla.run(model, st, measurements=ys)
    _, est, ws = vanilla.run_robust(model, st, ys)
    assert float(jnp.min(ws)) == 1.0  # every component an inlier
    np.testing.assert_allclose(est.state, ref.state, atol=1e-12)
    np.testing.assert_allclose(est.covariance, ref.covariance, atol=1e-12)


def test_robust_suppresses_outlier():
    model, st = _system()
    rng = np.random.default_rng(1)
    clean = np.arange(30) * 0.05 + 0.02 * rng.standard_normal(30)
    ys = clean.copy()
    ys[15] += 5.0  # massive spike
    ys = jnp.asarray(ys.reshape(-1, 1))

    _, plain = vanilla.run(model, st, measurements=ys)
    _, rob, ws = vanilla.run_robust(model, st, ys)

    truth15 = clean[15]
    err_plain = abs(float(plain.state[15, 0]) - truth15)
    err_rob = abs(float(rob.state[15, 0]) - truth15)
    assert err_rob < 0.35 * err_plain, (err_rob, err_plain)
    assert float(ws[15, 0]) < 0.1  # outlier strongly down-weighted
    assert float(ws[14, 0]) == 1.0
    # The robust track stays near the truth through the tail, while the
    # plain filter is still dragging the outlier's bias.
    tail_rob = np.abs(np.asarray(rob.state[25:, 0]) - clean[25:])
    tail_plain = np.abs(np.asarray(plain.state[25:, 0]) - clean[25:])
    assert tail_rob.max() < 0.1, tail_rob.max()
    assert tail_rob.mean() < tail_plain.mean()


def test_robust_covariance_inflated_on_outlier_step():
    """Down-weighting raises R', so the posterior keeps more of the
    prior variance than the naive update (no false confidence)."""
    model, st = _system()
    ys = jnp.asarray([[0.0], [0.0], [8.0]])
    _, plain = vanilla.run(model, st, measurements=ys)
    _, rob, _ = vanilla.run_robust(model, st, ys)
    assert float(rob.covariance[2, 0, 0]) > float(plain.covariance[2, 0, 0])


def test_robust_bank_vmaps():
    """Serving posture: a robust-tracker bank is one vmap over streams."""
    import jax

    model, st = _system()
    rng = np.random.default_rng(4)
    ys = jnp.asarray(rng.standard_normal((8, 25, 1)) * 0.1)
    ys = ys.at[:, 12, 0].add(5.0)  # spike in every stream
    _, ests, ws = jax.vmap(lambda y: vanilla.run_robust(model, st, y))(ys)
    assert ests.state.shape == (8, 25, 2)
    assert float(jnp.max(ws[:, 12, 0])) < 0.1  # every spike down-weighted
    _, solo, _ = vanilla.run_robust(model, st, ys[2])
    np.testing.assert_allclose(ests.state[2], solo.state, atol=1e-12)
