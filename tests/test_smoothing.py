"""RTS smoother tests: numpy parity, LTI agreement with the parallel
smoother, and improvement over the filtered estimates on the OD arc."""

import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import smoothing, vanilla
from gokalman_tpu.ops import assoc_scan

from fixtures import random_spd


def test_rts_matches_numpy_time_varying():
    rng = np.random.default_rng(91)
    n, p, t = 3, 2, 25
    phis = np.stack([np.eye(n) + 0.1 * rng.standard_normal((n, n)) for _ in range(t)])
    q = random_spd(rng, n, 0.05)
    means = rng.standard_normal((t, n))
    covs = np.stack([random_spd(rng, n, 0.5) for _ in range(t)])

    sm, sc = smoothing.rts_smoother(
        jnp.asarray(phis), jnp.asarray(q), jnp.asarray(means), jnp.asarray(covs)
    )
    xs = means.copy()
    ps = covs.copy()
    for k in range(t - 2, -1, -1):
        f = phis[k + 1]
        p_pred = f @ covs[k] @ f.T + q
        c = covs[k] @ f.T @ np.linalg.inv(p_pred)
        xs[k] = means[k] + c @ (xs[k + 1] - f @ means[k])
        ps[k] = covs[k] + c @ (ps[k + 1] - p_pred) @ c.T
    np.testing.assert_allclose(np.asarray(sm), xs, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sc), 0.5 * (ps + ps.transpose(0, 2, 1)),
                               rtol=1e-7, atol=1e-10)


def test_rts_matches_parallel_smoother_lti():
    rng = np.random.default_rng(92)
    n, p, t = 4, 2, 40
    f = jnp.asarray(np.eye(n) + 0.05 * rng.standard_normal((n, n)))
    h = jnp.asarray(rng.standard_normal((p, n)))
    q = jnp.asarray(random_spd(rng, n, 0.05))
    r = jnp.asarray(random_spd(rng, p, 0.3))
    x0 = jnp.asarray(rng.standard_normal(n))
    p0 = jnp.asarray(random_spd(rng, n, 1.0))
    model, state0 = vanilla.new(x0, p0, f, None, h, gn.noiseless(q, r))
    ys = jnp.asarray(rng.standard_normal((t, p)))
    means, covs = assoc_scan.filter_parallel(model, state0, ys)
    sm_p, sc_p = assoc_scan.smooth_parallel(model, means, covs)
    phis = jnp.broadcast_to(f, (t, n, n))
    sm_s, sc_s = smoothing.rts_smoother(phis, q, means, covs)
    np.testing.assert_allclose(np.asarray(sm_s), np.asarray(sm_p), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sc_s), np.asarray(sc_p), rtol=1e-6, atol=1e-9)


def test_rts_improves_over_filter():
    """Smoothed state errors must beat filtered errors on average."""
    rng = np.random.default_rng(93)
    n, p, t = 2, 1, 300
    dt = 0.1
    f = jnp.array([[1.0, dt], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    q = jnp.array([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]]) * 0.1
    r = jnp.array([[0.5]])
    lq = np.linalg.cholesky(np.asarray(q))
    x = np.zeros(n)
    truth, ys = [], []
    for _ in range(t):
        x = np.asarray(f) @ x + lq @ rng.standard_normal(n)
        truth.append(x.copy())
        ys.append(np.asarray(h) @ x + np.sqrt(0.5) * rng.standard_normal(1))
    truth = np.stack(truth)

    model, state0 = vanilla.new(jnp.zeros(n), jnp.eye(n), f, None, h, gn.noiseless(q, r))
    _, ests = vanilla.run(model, state0, measurements=jnp.asarray(np.stack(ys)))
    phis = jnp.broadcast_to(f, (t, n, n))
    sm, sc = smoothing.rts_smoother(phis, q, ests.state, ests.covariance)

    err_f = np.sqrt(((np.asarray(ests.state) - truth) ** 2).sum(1)).mean()
    err_s = np.sqrt(((np.asarray(sm) - truth) ** 2).sum(1)).mean()
    assert err_s < 0.85 * err_f, (err_s, err_f)
