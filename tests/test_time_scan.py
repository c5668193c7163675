"""Time-sharded distributed associative scan: the TIME axis block-
decomposed over the 8-device CPU mesh must reproduce the single-device
parallel-in-time filter/smoother (ops/assoc_scan) — and hence the
sequential vanilla scan — to 1e-9."""

import jax
import jax.numpy as jnp
import numpy as np

import gokalman_tpu as gk
from gokalman_tpu.ops import assoc_scan
from gokalman_tpu.parallel import time_scan


def _system(n=4, p=2, seed=0):
    rng = np.random.default_rng(seed)
    f = jnp.asarray(np.eye(n) + 0.08 * rng.standard_normal((n, n)))
    h = jnp.asarray(rng.standard_normal((p, n)))
    q = jnp.asarray(np.diag(rng.uniform(1e-4, 1e-2, n)))
    r = jnp.asarray(np.diag(rng.uniform(0.01, 0.1, p)))
    x0 = jnp.asarray(rng.standard_normal(n))
    p0 = jnp.eye(n)
    g = jnp.asarray(rng.standard_normal((n, 1)))
    return f, g, h, q, r, x0, p0


def _data(t, p=2, seed=1):
    rng = np.random.default_rng(seed)
    ys = jnp.asarray(rng.standard_normal((t, p)))
    us = jnp.asarray(0.3 * rng.standard_normal((t, 1)))
    return ys, us


def test_time_sharded_equals_single_device():
    f, g, h, q, r, x0, p0 = _system()
    model, state0 = gk.vanilla.new(x0, p0, f, None, h,
                                   gk.noise.noiseless(q, r))
    t = 128  # 16 steps per device on the 8-device mesh
    ys, _ = _data(t)
    mesh = time_scan.time_mesh(jax.devices()[:8])

    m_ref, c_ref = assoc_scan.filter_parallel(model, state0, ys)
    sm_ref, sc_ref = assoc_scan.smooth_parallel(model, m_ref, c_ref)
    m, c, sm, sc = time_scan.sharded_filter_smoother(
        model, state0, ys, mesh)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(sm), np.asarray(sm_ref),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(sc_ref),
                               atol=1e-9)


def test_time_sharded_with_controls_matches_sequential_filter():
    """End-to-end against the sequential vanilla scan (not just the
    single-device assoc scan), with a control input exercising the
    G u path of the element construction."""
    f, g, h, q, r, x0, p0 = _system(seed=3)
    model, state0 = gk.vanilla.new(x0, p0, f, g, h,
                                   gk.noise.noiseless(q, r))
    t = 64
    ys, us = _data(t, seed=4)
    mesh = time_scan.time_mesh(jax.devices()[:8])

    _, ests = gk.vanilla.run(model, state0, ys, us)
    m, c, sm, sc = time_scan.sharded_filter_smoother(
        model, state0, ys, mesh, controls=us)
    np.testing.assert_allclose(np.asarray(m), np.asarray(ests.state),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(c),
                               np.asarray(ests.covariance), atol=1e-9)
    # Smoother sanity: last smoothed == last filtered; smoothed RMS vs
    # the filtered posterior mean must not be wild (structure check).
    np.testing.assert_allclose(np.asarray(sm[-1]), np.asarray(m[-1]),
                               atol=1e-9)


def test_time_sharded_filter_only_and_divisibility():
    f, g, h, q, r, x0, p0 = _system(seed=5)
    model, state0 = gk.vanilla.new(x0, p0, f, None, h,
                                   gk.noise.noiseless(q, r))
    ys, _ = _data(40, seed=6)
    mesh = time_scan.time_mesh(jax.devices()[:8])
    m, c, sm, sc = time_scan.sharded_filter_smoother(
        model, state0, ys, mesh, smooth=False)
    assert sm is None and sc is None
    m_ref, _ = assoc_scan.filter_parallel(model, state0, ys)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                               atol=1e-9)
    try:
        time_scan.sharded_filter_smoother(model, state0, ys[:39], mesh)
        raise AssertionError("expected divisibility error")
    except ValueError:
        pass
