"""SRIF tests: golden measurement update, P0 round-trip, KF equivalence,
smoother (mirrors reference srif_test.go:15-56 + behavior)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import srif, vanilla


def test_p0_roundtrip():
    """srif_test.go:15-29: est0 covariance reproduces P0 to 1e-12."""
    x0 = jnp.array([0.0, 0.35, 0.0])
    p0 = 10.0 * jnp.eye(3)
    r = jnp.diag(jnp.array([(5e-3) ** 2, (5e-6) ** 2]))
    nz = gn.noiseless(jnp.zeros((6, 6)), r)
    model, state, est0 = srif.new(x0, p0, 3, True, nz)
    np.testing.assert_allclose(np.asarray(est0.covariance), np.asarray(p0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(est0.state), np.asarray(x0), atol=1e-12)


def test_measurement_update_golden():
    """Golden values from srif_test.go:31-56 (1e-4)."""
    r = jnp.array([[0.1, 0.0], [0.0, 0.1]])
    h = jnp.array([[1.0, -2.0], [2.0, -1.0], [1.0, 1.0]])
    b = jnp.array([0.2, 0.2])
    y = jnp.array([-1.1, 1.2, 1.8])
    rk, bk, ek = srif.measurement_update(r, h, b, y)
    np.testing.assert_allclose(
        np.asarray(ek), np.array([-0.1319, 0.0871, -0.2810]), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(bk), np.array([-1.2727, -2.0607]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(rk),
        np.array([[-2.4515, 1.2237], [0.0, -2.1243]]),
        atol=1e-4,
    )


def _linear_system(rng, n=3, p=2):
    f = np.eye(n) + 0.05 * rng.standard_normal((n, n))
    h = rng.standard_normal((p, n))
    r = np.diag(rng.uniform(0.1, 0.5, p))
    x0 = rng.standard_normal(n)
    p0 = np.diag(rng.uniform(1.0, 5.0, n))
    return map(jnp.asarray, (f, h, r, x0, p0))


@pytest.mark.parametrize("non_tri_r", [False, True])
def test_matches_kf_with_zero_q(non_tri_r):
    """On a linear system with Q=0, the SRIF posterior equals the
    covariance-form KF posterior to 1e-8 (same Bayes update in
    square-root information coordinates)."""
    rng = np.random.default_rng(21)
    f, h, r, x0, p0 = _linear_system(rng)
    q = jnp.zeros((3, 3))
    nz = gn.noiseless(q, r)
    smodel, sstate, _ = srif.new(x0, p0, 2, non_tri_r, nz)
    vmodel, vstate = vanilla.new(x0, p0, f, None, h, nz)

    for k in range(20):
        y = jnp.asarray(rng.standard_normal(2))
        vstate, vest = vanilla.step(vmodel, vstate, y)
        # SRIF consumes (realObs, computedObs); deviation = y.
        sstate, sest = srif.update(smodel, sstate, f, h, y, jnp.zeros(2))
        np.testing.assert_allclose(
            np.asarray(sest.state), np.asarray(vest.state), rtol=1e-7, atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(sest.covariance),
            np.asarray(vest.covariance),
            rtol=1e-6,
            atol=1e-9,
        )


def test_predict_propagates_state():
    """Pure time update: x -> Φ x, P -> Φ P Φ^T (no process noise,
    srif.go:111-141)."""
    rng = np.random.default_rng(22)
    f, h, r, x0, p0 = _linear_system(rng)
    nz = gn.noiseless(jnp.zeros((3, 3)), r)
    model, state, est0 = srif.new(x0, p0, 2, False, nz)
    state, est = srif.predict(model, state, f)
    np.testing.assert_allclose(
        np.asarray(est.state), np.asarray(f @ x0), rtol=1e-9, atol=1e-12
    )
    p_exp = np.asarray(f) @ np.asarray(p0) @ np.asarray(f).T
    np.testing.assert_allclose(np.asarray(est.covariance), p_exp, rtol=1e-8, atol=1e-10)


def test_masked_run_and_smoother():
    rng = np.random.default_rng(23)
    f, h, r, x0, p0 = _linear_system(rng)
    nz = gn.noiseless(jnp.zeros((3, 3)), r)
    model, state, _ = srif.new(x0, p0, 2, False, nz)
    t = 12
    phis = jnp.broadcast_to(f, (t, 3, 3))
    hts = jnp.broadcast_to(h, (t, 2, 3))
    real = jnp.asarray(rng.standard_normal((t, 2)))
    comp = jnp.zeros((t, 2))
    has = jnp.asarray(rng.uniform(size=t) > 0.4)
    final, ests = srif.run(model, state, phis, hts, real, comp, has)
    assert int(final.k) == t
    assert ests.r.shape == (t, 3, 3)

    smoothed = srif.smooth_all(ests)
    xs = np.asarray(smoothed.state)
    ps = np.asarray(smoothed.covariance)
    finv = np.linalg.inv(np.asarray(f))
    for k in range(t - 1):
        np.testing.assert_allclose(xs[k], finv @ xs[k + 1], rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(
            ps[k], finv @ ps[k + 1] @ finv.T, rtol=1e-6, atol=1e-9
        )
    # Last estimate untouched.
    np.testing.assert_allclose(xs[-1], np.asarray(ests.state[-1]), rtol=1e-9)
