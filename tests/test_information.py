"""Information filter tests: constructor checks and equivalence with the
vanilla CKF (the information form is algebraically the same filter)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import information, vanilla

from fixtures import random_spd


def _system(rng, n=3, p=2, m=1):
    f = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    g = rng.standard_normal((n, m))
    h = rng.standard_normal((p, n))
    q = random_spd(rng, n, 0.1)
    r = random_spd(rng, p, 0.5)
    x0 = rng.standard_normal(n)
    p0 = random_spd(rng, n, 2.0)
    return map(jnp.asarray, (f, g, h, q, r, x0, p0))


def test_constructor_errors():
    """information_test.go:17-43 analogue."""
    nz = gn.noiseless(jnp.zeros((2, 2)), jnp.zeros((2, 2)))
    with pytest.raises(ValueError):
        information.new(jnp.zeros(2), jnp.zeros((3, 3)), jnp.eye(2), None, jnp.eye(2), nz)
    with pytest.raises(ValueError):
        information.new(jnp.zeros(3), jnp.zeros((3, 3)), jnp.eye(2), None, jnp.eye(2), nz)


def test_singular_p0_gives_zero_info():
    """information.go:69-75: non-invertible P0 -> zero information."""
    nz = gn.noiseless(jnp.eye(2), jnp.eye(2))
    model, state = information.new_from_state(
        jnp.ones(2), jnp.zeros((2, 2)), jnp.eye(2), None, jnp.eye(2), nz
    )
    np.testing.assert_array_equal(np.asarray(state.info), 0.0)
    np.testing.assert_array_equal(np.asarray(state.i), 0.0)


def test_matches_vanilla():
    """On an invertible system, information == vanilla state/covariance
    to 1e-9 after every step (both implement the same Bayes update)."""
    rng = np.random.default_rng(11)
    f, g, h, q, r, x0, p0 = _system(rng)
    nz = gn.noiseless(q, r)
    vmodel, vstate = vanilla.new(x0, p0, f, g, h, nz)
    imodel, istate = information.new_from_state(x0, p0, f, g, h, nz)

    for k in range(25):
        y = jnp.asarray(rng.standard_normal(2))
        u = jnp.asarray(rng.standard_normal(1))
        vstate, vest = vanilla.step(vmodel, vstate, y, u)
        istate, iest = information.step(imodel, istate, y, u)
        np.testing.assert_allclose(
            np.asarray(iest.state), np.asarray(vest.state), rtol=1e-8, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(iest.covariance),
            np.asarray(vest.covariance),
            rtol=1e-8,
            atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(iest.pred_covariance),
            np.asarray(vest.pred_covariance),
            rtol=1e-8,
            atol=1e-10,
        )


def test_run_driver():
    rng = np.random.default_rng(12)
    f, g, h, q, r, x0, p0 = _system(rng)
    nz = gn.noiseless(q, r)
    imodel, istate = information.new_from_state(x0, p0, f, g, h, nz)
    ys = jnp.asarray(rng.standard_normal((10, 2)))
    final, ests = information.run(imodel, istate, ys)
    assert ests.info_state.shape == (10, 3)
    assert int(final.k) == 10
    # Batched covariance property works on stacked estimates.
    assert ests.covariance.shape == (10, 3, 3)
    assert ests.state.shape == (10, 3)
