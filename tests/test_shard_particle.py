"""Device-sharded particle filter: bit-equality with the unsharded
filter on the 8-device CPU mesh (per-global-index keyed noise,
collective normalization, all-gather resampling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gokalman_tpu as gk
from gokalman_tpu.filters import particle
from gokalman_tpu.parallel import mesh as pmesh


def _setup():
    f = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    noise = gk.noise.awgn(jnp.diag(jnp.array([1e-3, 2e-3])),
                          jnp.array([[0.05]]))
    prop = particle.additive_dynamics(lambda x: f @ x, noise)
    loglik = particle.gaussian_log_likelihood(lambda x: h @ x, noise)
    rng = np.random.default_rng(2)
    ys = jnp.asarray(0.4 + 0.2 * rng.standard_normal((15, 1)))
    return prop, loglik, ys, jnp.array([0.3, -0.2]), 0.4 * jnp.eye(2)


def test_sharded_particle_equals_unsharded():
    prop, loglik, ys, x0, p0 = _setup()
    key = jax.random.PRNGKey(11)
    k_init, k_run = jax.random.split(key)
    s0 = particle.new(x0, p0, 128, k_init)
    _, ref = particle.run(s0, ys, prop, loglik, k_run)

    mesh = pmesh.ensemble_mesh(jax.devices()[:8])
    pts, est = pmesh.sharded_particle_run(x0, p0, 128, ys, prop, loglik,
                                          key, mesh)
    np.testing.assert_allclose(est.state, ref.state, atol=1e-12)
    np.testing.assert_allclose(est.covariance, ref.covariance, atol=1e-12)
    np.testing.assert_allclose(est.log_likelihood, ref.log_likelihood,
                               atol=1e-12)
    np.testing.assert_allclose(est.ess, ref.ess, rtol=1e-12)
    np.testing.assert_array_equal(est.resampled, ref.resampled)
    assert bool(np.any(np.asarray(ref.resampled)))  # resampling exercised
    # The gathered final cloud is the same population post-resampling.
    st_final, _ = particle.run(s0, ys, prop, loglik, k_run)
    np.testing.assert_allclose(
        np.sort(np.asarray(pts), axis=0),
        np.sort(np.asarray(st_final.particles), axis=0), atol=1e-12,
    )


def test_sharded_particle_masked_steps():
    prop, loglik, ys, x0, p0 = _setup()
    masks = jnp.array([True, False, True] * 5)
    key = jax.random.PRNGKey(3)
    k_init, k_run = jax.random.split(key)
    s0 = particle.new(x0, p0, 64, k_init)
    _, ref = particle.run(s0, ys, prop, loglik, k_run, meas_masks=masks)
    mesh = pmesh.ensemble_mesh(jax.devices()[:8])
    _, est = pmesh.sharded_particle_run(x0, p0, 64, ys, prop, loglik, key,
                                        mesh, meas_masks=masks)
    np.testing.assert_allclose(est.state, ref.state, atol=1e-12)
    np.testing.assert_allclose(float(est.log_likelihood[1]), 0.0, atol=0)


def test_sharded_particle_rejects_bad_split():
    prop, loglik, ys, x0, p0 = _setup()
    mesh = pmesh.ensemble_mesh(jax.devices()[:8])
    with pytest.raises(ValueError):
        pmesh.sharded_particle_run(x0, p0, 30, ys, prop, loglik,
                                   jax.random.PRNGKey(0), mesh)
