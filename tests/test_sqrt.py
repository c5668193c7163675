"""Square-root filter tests: factor-form equivalence with vanilla CKF."""

import jax.numpy as jnp
import numpy as np
import pytest

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import sqrt as sr
from gokalman_tpu.filters import vanilla

from fixtures import midterm2_system, random_spd


def test_constructor_errors():
    """squareroot_test.go:9-27 analogue."""
    nz = gn.noiseless(jnp.eye(2), jnp.eye(2))
    with pytest.raises(ValueError):
        sr.new(jnp.zeros(2), jnp.zeros((3, 3)), jnp.eye(2), None, jnp.eye(2), nz)


def test_matches_vanilla_midterm():
    """Square-root CKF equals the covariance-form CKF to 1e-9 on the
    reference's Midterm2 fixture (scalar measurement path)."""
    f, g, h, q, r, x0, p0 = midterm2_system()
    # sqrt filter needs PD Q and R for its Cholesky factors.
    nz = gn.awgn(q + 1e-18 * jnp.eye(3), r)
    nz = gn.Noise(q, r, nz.sqrt_q, nz.sqrt_r)
    vmodel, vstate = vanilla.new(x0, p0, f, g, h, gn.noiseless(q, r))
    smodel, sstate = sr.new(x0, p0, f, g, h, nz)

    rng = np.random.default_rng(5)
    for k in range(40):
        y = jnp.asarray(rng.standard_normal(1))
        u = jnp.asarray(rng.standard_normal(1))
        vstate, vest = vanilla.step(vmodel, vstate, y, u)
        sstate, sest = sr.step(smodel, sstate, y, u)
        np.testing.assert_allclose(
            np.asarray(sest.state), np.asarray(vest.state), rtol=1e-8, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(sest.covariance),
            np.asarray(vest.covariance),
            rtol=1e-7,
            atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(sest.pred_covariance),
            np.asarray(vest.pred_covariance),
            rtol=1e-7,
            atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(sest.gain), np.asarray(vest.gain), rtol=1e-7, atol=1e-10
        )


def test_matches_vanilla_multimeasurement():
    """p=2 measurement path (the MultiD variants, squareroot_test.go:93-121)."""
    rng = np.random.default_rng(6)
    n, p = 4, 2
    f = jnp.asarray(np.eye(n) + 0.05 * rng.standard_normal((n, n)))
    h = jnp.asarray(rng.standard_normal((p, n)))
    q = jnp.asarray(random_spd(rng, n, 0.01))
    r = jnp.asarray(random_spd(rng, p, 0.1))
    x0 = jnp.asarray(rng.standard_normal(n))
    p0 = jnp.asarray(random_spd(rng, n, 1.0))
    nz = gn.awgn(q, r)
    vmodel, vstate = vanilla.new(x0, p0, f, None, h, gn.noiseless(q, r))
    smodel, sstate = sr.new(x0, p0, f, None, h, nz)
    for k in range(30):
        y = jnp.asarray(rng.standard_normal(p))
        vstate, vest = vanilla.step(vmodel, vstate, y)
        sstate, sest = sr.step(smodel, sstate, y)
        np.testing.assert_allclose(
            np.asarray(sest.state), np.asarray(vest.state), rtol=1e-8, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(sest.covariance),
            np.asarray(vest.covariance),
            rtol=1e-7,
            atol=1e-10,
        )

    # Covariance factors stay lower-triangular (numerical stability story).
    s = np.asarray(sstate.s)
    np.testing.assert_allclose(s, np.tril(s), atol=1e-12)


def test_run_driver():
    f, g, h, q, r, x0, p0 = midterm2_system()
    nzq = gn.awgn(q + 1e-18 * jnp.eye(3), r)
    nz = gn.Noise(q, r, nzq.sqrt_q, nzq.sqrt_r)
    smodel, sstate = sr.new(x0, p0, f, g, h, nz)
    ys = jnp.zeros((12, 1))
    final, ests = sr.run(smodel, sstate, ys)
    assert ests.state.shape == (12, 3)
    assert ests.covariance.shape == (12, 3, 3)
    assert int(final.k) == 12
