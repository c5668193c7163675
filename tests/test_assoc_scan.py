"""Parallel-in-time Kalman filter/smoother tests: the associative-scan
formulation must reproduce the sequential scan's posteriors exactly."""

import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import vanilla
from gokalman_tpu.ops import assoc_scan

from fixtures import midterm2_system, random_spd


def _system(rng, n=4, p=2, m=1):
    f = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    g = rng.standard_normal((n, m))
    h = rng.standard_normal((p, n))
    q = random_spd(rng, n, 0.05)
    r = random_spd(rng, p, 0.3)
    x0 = rng.standard_normal(n)
    p0 = random_spd(rng, n, 1.0)
    return map(jnp.asarray, (f, g, h, q, r, x0, p0))


def test_parallel_filter_matches_sequential():
    rng = np.random.default_rng(71)
    f, g, h, q, r, x0, p0 = _system(rng)
    nz = gn.noiseless(q, r)
    model, state0 = vanilla.new(x0, p0, f, None, h, nz)
    t = 64
    ys = jnp.asarray(rng.standard_normal((t, 2)))

    _, seq = vanilla.run(model, state0, measurements=ys)
    means, covs = assoc_scan.filter_parallel(model, state0, ys)

    np.testing.assert_allclose(
        np.asarray(means), np.asarray(seq.state), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(covs), np.asarray(seq.covariance), rtol=1e-7, atol=1e-10
    )


def test_parallel_filter_with_controls():
    rng = np.random.default_rng(72)
    f, g, h, q, r, x0, p0 = _system(rng)
    nz = gn.noiseless(q, r)
    model, state0 = vanilla.new(x0, p0, f, g, h, nz)
    t = 50
    ys = jnp.asarray(rng.standard_normal((t, 2)))
    us = jnp.asarray(rng.standard_normal((t, 1)))

    _, seq = vanilla.run(model, state0, measurements=ys, controls=us)
    means, covs = assoc_scan.filter_parallel(model, state0, ys, controls=us)
    np.testing.assert_allclose(
        np.asarray(means), np.asarray(seq.state), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(covs), np.asarray(seq.covariance), rtol=1e-7, atol=1e-10
    )


def test_parallel_smoother_matches_sequential_rts():
    rng = np.random.default_rng(73)
    f, g, h, q, r, x0, p0 = _system(rng)
    nz = gn.noiseless(q, r)
    model, state0 = vanilla.new(x0, p0, f, None, h, nz)
    t = 40
    ys = jnp.asarray(rng.standard_normal((t, 2)))
    means, covs = assoc_scan.filter_parallel(model, state0, ys)
    sm, sc = assoc_scan.smooth_parallel(model, means, covs)

    # Sequential RTS reference in numpy.
    fm = np.asarray(means)
    fc = np.asarray(covs)
    fnp = np.asarray(f)
    qnp = np.asarray(q)
    xs = fm.copy()
    ps = fc.copy()
    for k in range(t - 2, -1, -1):
        p_pred = fnp @ fc[k] @ fnp.T + qnp
        ck = fc[k] @ fnp.T @ np.linalg.inv(p_pred)
        xs[k] = fm[k] + ck @ (xs[k + 1] - fnp @ fm[k])
        ps[k] = fc[k] + ck @ (ps[k + 1] - p_pred) @ ck.T

    np.testing.assert_allclose(np.asarray(sm), xs, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sc), ps, rtol=1e-6, atol=1e-9)
    # Last smoothed state == last filtered state.
    np.testing.assert_allclose(np.asarray(sm[-1]), fm[-1], rtol=1e-12)
