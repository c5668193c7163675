"""Device-sharded EnKF: the member axis distributed over the 8-device
CPU mesh must reproduce the unsharded filter bit-for-bit (per-member
keyed noise + psum'd moments)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gokalman_tpu as gk
from gokalman_tpu.filters import enkf
from gokalman_tpu.parallel import mesh as pmesh


def _setup():
    f = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    q = jnp.diag(jnp.array([1e-4, 1e-3]))
    r = jnp.array([[0.05]])
    noise = gk.noise.awgn(q, r)
    fx, hx = enkf.linear_fns(f, h)
    ys = jnp.asarray(np.random.default_rng(2).standard_normal((12, 1)) * 0.3)
    return noise, fx, hx, ys, jnp.array([0.2, -0.1]), jnp.eye(2)


def test_sharded_enkf_equals_unsharded_exactly():
    noise, fx, hx, ys, x0, p0 = _setup()
    key = jax.random.PRNGKey(9)
    k_init, k_run = jax.random.split(key)
    s0 = enkf.new(x0, p0, 64, key=k_init)
    _, ref = enkf.run(noise, s0, ys, fx, hx, key=k_run)

    mesh = pmesh.ensemble_mesh(jax.devices()[:8])
    ens, est = pmesh.sharded_enkf_run(noise, x0, p0, 64, ys, fx, hx, key,
                                      mesh)
    np.testing.assert_allclose(est.state, ref.state, atol=1e-12)
    np.testing.assert_allclose(est.covariance, ref.covariance, atol=1e-12)
    np.testing.assert_allclose(est.gain, ref.gain, atol=1e-12)
    assert ens.shape == (64, 2)
    # The returned (gathered) ensemble is the same population.
    st_final, _ = enkf.run(noise, s0, ys, fx, hx, key=k_run)
    np.testing.assert_allclose(
        np.sort(np.asarray(ens), axis=0),
        np.sort(np.asarray(st_final.ensemble), axis=0), atol=1e-12,
    )


def test_sharded_enkf_masked_and_inflated():
    noise, fx, hx, ys, x0, p0 = _setup()
    key = jax.random.PRNGKey(3)
    masks = jnp.array([True, False] * 6)
    k_init, k_run = jax.random.split(key)
    s0 = enkf.new(x0, p0, 32, key=k_init)
    _, ref = enkf.run(noise, s0, ys, fx, hx, key=k_run, inflation=1.1,
                      meas_masks=masks)
    mesh = pmesh.ensemble_mesh(jax.devices()[:8])
    _, est = pmesh.sharded_enkf_run(noise, x0, p0, 32, ys, fx, hx, key, mesh,
                                    inflation=1.1, meas_masks=masks)
    np.testing.assert_allclose(est.state, ref.state, atol=1e-12)
    np.testing.assert_allclose(est.innovation[1], 0.0, atol=0)


def test_sharded_enkf_rejects_bad_split():
    noise, fx, hx, ys, x0, p0 = _setup()
    mesh = pmesh.ensemble_mesh(jax.devices()[:8])
    with pytest.raises(ValueError):
        pmesh.sharded_enkf_run(noise, x0, p0, 30, ys, fx, hx,
                               jax.random.PRNGKey(0), mesh)


def test_sharded_enkf_localization_passthrough():
    """Gaspari-Cohn tapers shard transparently (applied to the psum'd
    covariance blocks): sharded == unsharded with localization on."""
    noise, fx, hx, ys, x0, p0 = _setup()
    dist = jnp.array([0.0, 1.0])
    loc_xy = enkf.gaspari_cohn(dist, 0.4)[:, None]  # 2c=0.8: row 1 -> 0
    key = jax.random.PRNGKey(21)
    k_init, k_run = jax.random.split(key)
    s0 = enkf.new(x0, p0, 32, key=k_init)
    _, ref = enkf.run(noise, s0, ys, fx, hx, key=k_run, loc_xy=loc_xy)
    mesh = pmesh.ensemble_mesh(jax.devices()[:8])
    _, est = pmesh.sharded_enkf_run(noise, x0, p0, 32, ys, fx, hx, key, mesh,
                                    loc_xy=loc_xy)
    np.testing.assert_allclose(est.state, ref.state, atol=1e-12)
    np.testing.assert_allclose(est.gain[:, 1], 0.0, atol=0)  # tapered out
