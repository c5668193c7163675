"""Set-membership filter pins: the 100% containment GUARANTEE over MC
with bounded noise (vs the KF 1-sigma ellipsoid which cannot give it),
the Minkowski support-function bound, exact intersection containment
by sampling, informativeness (the set shrinks), and the
empty-intersection fault flag."""

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import setmembership as sm


def _sys():
    f = np.array([[1.0, 0.5], [0.0, 1.0]])
    q = np.diag([0.02, 0.08])   # bound shapes (w' Q^-1 w <= 1)
    h = np.array([[1.0, 0.0]])
    r = np.array([[0.09]])      # |v| <= 0.3
    return f, q, h, r


def _draw_in_ellipsoid(rng, shape):
    """Uniform-ish draw STRICTLY inside E(0, shape) incl. boundary-
    hugging draws (the adversarial part of the guarantee)."""
    n = shape.shape[0]
    u = rng.standard_normal(n)
    u = u / np.linalg.norm(u)
    rad = rng.uniform(0, 1) ** (1.0 / n)
    if rng.random() < 0.3:
        rad = 1.0  # worst case: ON the bound
    l_ = np.linalg.cholesky(shape)
    return rad * (l_ @ u)


def test_containment_guarantee_100_percent():
    rng = np.random.default_rng(0)
    f, q, h, r = _sys()
    T, runs = 40, 25
    model, state0 = sm.new(jnp.zeros(2), 0.5 * jnp.eye(2), f, None, h,
                           gn.noiseless(jnp.asarray(q), jnp.asarray(r)))
    worst = 0.0
    for _ in range(runs):
        x = _draw_in_ellipsoid(rng, 0.5 * np.eye(2))
        xs, ys = [], []
        for _k in range(T):
            x = f @ x + _draw_in_ellipsoid(rng, q)
            xs.append(x.copy())
            ys.append(h @ x + _draw_in_ellipsoid(rng, r))
        _, est = sm.run(model, state0, jnp.asarray(np.stack(ys)))
        cs = np.asarray(est.center)
        shp = np.asarray(est.shape)
        for k in range(T):
            d = xs[k] - cs[k]
            m = d @ np.linalg.solve(shp[k], d)
            worst = max(worst, float(m))
    assert worst <= 1.0 + 1e-9, worst  # THE guarantee, not 95%


def test_prediction_is_a_minkowski_outer_bound():
    """Support-function check: h_E+(u) >= h_{F E}(u) + h_Q(u) for all
    u (the Minkowski sum's support is the sum of supports)."""
    rng = np.random.default_rng(1)
    f, q, h, r = _sys()
    x_shape = np.array([[0.3, 0.1], [0.1, 0.2]])
    model, state = sm.new(jnp.zeros(2), jnp.asarray(x_shape), f, None,
                          h, gn.noiseless(jnp.asarray(q), jnp.asarray(r)))
    # predict with an impossible-to-satisfy far measurement rejected:
    # extract the prediction by running one step with lam forced to 0
    # via a WILDLY inconsistent measurement (fallback keeps lam=0)
    _, est = sm.step(model, state, jnp.asarray([1e6]))
    assert not bool(est.consistent)
    shp = np.asarray(est.shape)
    a = f @ x_shape @ f.T
    for _ in range(100):
        u = rng.standard_normal(2)
        u /= np.linalg.norm(u)
        lhs = np.sqrt(u @ shp @ u)
        rhs = np.sqrt(u @ a @ u) + np.sqrt(u @ q @ u)
        assert lhs >= rhs - 1e-9, (lhs, rhs)


def test_update_contains_the_exact_intersection():
    """Sample points in E_pred ∩ {measurement set}; every one must lie
    in the fused ellipsoid (the completing-the-square bound is exact,
    not approximate)."""
    rng = np.random.default_rng(2)
    f, q, h, r = _sys()
    model, state = sm.new(jnp.asarray([0.2, -0.1]), 0.4 * jnp.eye(2),
                          f, None, h,
                          gn.noiseless(jnp.asarray(q), jnp.asarray(r)))
    y = np.array([0.45])
    st, est = sm.step(model, state, jnp.asarray(y))
    assert bool(est.consistent)
    c_pred = f @ np.asarray([0.2, -0.1])
    a = f @ (0.4 * np.eye(2)) @ f.T
    p_opt = np.sqrt(np.trace(a) / np.trace(q))
    x_pred = (1 + 1 / p_opt) * a + (1 + p_opt) * q
    c_new, shp = np.asarray(est.center), np.asarray(est.shape)
    n_in = 0
    for _ in range(3000):
        xcand = c_pred + _draw_in_ellipsoid(rng, x_pred)
        if (y - h @ xcand) @ np.linalg.solve(r, y - h @ xcand) <= 1.0:
            n_in += 1
            d = xcand - c_new
            assert d @ np.linalg.solve(shp, d) <= 1.0 + 1e-9
    assert n_in > 50  # the sampler actually exercised the intersection
    # informative: the measured direction shrank vs the prediction
    assert shp[0, 0] < x_pred[0, 0]


def test_inconsistent_measurement_flags_and_keeps_the_set():
    f, q, h, r = _sys()
    model, state = sm.new(jnp.zeros(2), 0.1 * jnp.eye(2), f, None, h,
                          gn.noiseless(jnp.asarray(q), jnp.asarray(r)))
    st, est = sm.step(model, state, jnp.asarray([50.0]))
    assert not bool(est.consistent)
    assert np.isfinite(np.asarray(est.shape)).all()
    # fallback = pure prediction (alpha = 1 at lam = 0)
    a = np.asarray(model.f) @ (0.1 * np.eye(2)) @ np.asarray(model.f).T
    p_opt = np.sqrt(np.trace(a) / np.trace(q))
    np.testing.assert_allclose(np.asarray(est.shape),
                               (1 + 1 / p_opt) * a + (1 + p_opt) * q,
                               rtol=1e-9)


def test_ctor_validation():
    import pytest

    f, q, h, r = _sys()
    with pytest.raises(ValueError, match="dimensions"):
        sm.new(jnp.zeros(3), jnp.eye(2), f, None, h,
               gn.noiseless(jnp.asarray(q), jnp.asarray(r)))
