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


def test_hybrid_rts_equals_plain_rts_without_snc():
    """hybrid.smooth_all_rts (driven by the recorded P-bar) must equal
    the explicit-Q RTS smoother when no SNC was armed."""
    from gokalman_tpu.filters import hybrid

    rng = np.random.default_rng(17)
    n, p, t = 4, 2, 40
    f = jnp.asarray(np.eye(n) + 0.05 * rng.standard_normal((n, n)))
    h = jnp.asarray(rng.standard_normal((p, n)))
    q = jnp.asarray(random_spd(rng, n, 0.01))
    r = jnp.asarray(random_spd(rng, p, 0.2))
    p0 = jnp.eye(n)

    # Hybrid-CKF arc: deviation measurements around a zero reference.
    model, st = hybrid.new(jnp.zeros(n), p0, gn.noiseless(q, r), p)
    phis = jnp.broadcast_to(f, (t, n, n))
    hts = jnp.broadcast_to(h, (t, p, n))
    obs = jnp.asarray(rng.standard_normal((t, p)))
    comp = jnp.zeros((t, p))
    has = jnp.ones(t, bool)
    # SNC armed on every step so P-bar records Gamma Q Gamma^T too —
    # use Gamma = I so the plain-RTS oracle with constant q matches.
    gammas = jnp.broadcast_to(jnp.eye(n), (t, n, n))
    snc = jnp.ones(t, bool)
    _, ests = hybrid.run(model, st, phis, hts, obs, comp, has,
                         gammas=gammas, snc_mask=snc)

    sm = hybrid.smooth_all_rts(ests)
    xs_or, ps_or = smoothing.rts_smoother(
        phis, q, ests.state, ests.covariance)
    np.testing.assert_allclose(np.asarray(sm.state), np.asarray(xs_or),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sm.covariance), np.asarray(ps_or),
                               rtol=1e-8, atol=1e-10)


def test_hybrid_rts_on_snc_arc_beats_filter():
    """The SNC-armed smoother the reference panics on: on a stochastic
    arc the smoothed state error must not exceed the filtered error."""
    from gokalman_tpu.filters import hybrid

    rng = np.random.default_rng(23)
    n, p, t = 4, 2, 120
    f = jnp.asarray(np.eye(n) + np.diag(0.1 * np.ones(n - 1), 1))
    h = jnp.asarray(np.eye(p, n))
    q = jnp.asarray(0.01 * np.eye(n))
    r = jnp.asarray(0.09 * np.eye(p))
    gamma = jnp.asarray(np.concatenate(
        [np.zeros((n // 2, n)), np.eye(n)[n // 2:]], axis=0))

    # Simulate truth with process noise entering through Gamma.
    lr = np.sqrt(0.09)
    x = np.zeros(n)
    truth, ys = [], []
    for k in range(t):
        w = np.zeros(n)
        w[n // 2:] = 0.1 * rng.standard_normal(n // 2)
        x = np.asarray(f) @ x + np.asarray(gamma) @ w
        truth.append(x.copy())
        ys.append(x[:p] + lr * rng.standard_normal(p))
    truth = np.stack(truth)
    ys = jnp.asarray(np.stack(ys))

    model, st = hybrid.new(jnp.zeros(n), jnp.eye(n),
                           gn.noiseless(0.01 * jnp.eye(n), r), p)
    phis = jnp.broadcast_to(f, (t, n, n))
    hts = jnp.broadcast_to(h, (t, p, n))
    gammas = jnp.broadcast_to(gamma, (t, n, n))
    # SNC armed on alternating steps (schedule the reference cannot smooth).
    snc = jnp.asarray(np.arange(t) % 2 == 0)
    _, ests = hybrid.run(model, st, phis, hts, ys, jnp.zeros((t, p)),
                         jnp.ones(t, bool), gammas=gammas, snc_mask=snc)
    sm = hybrid.smooth_all_rts(ests)

    err_f = np.sqrt(((np.asarray(ests.state) - truth) ** 2).sum(1)).mean()
    err_s = np.sqrt(((np.asarray(sm.state) - truth) ** 2).sum(1)).mean()
    assert err_s <= err_f * 1.02, (err_s, err_f)
    assert np.isfinite(np.asarray(sm.covariance)).all()


def test_fixed_lag_smoother_brackets_filter_and_rts():
    """lag=0 -> the filter; lag>=T -> the full RTS smoother; a finite
    lag equals the full RTS run on the correspondingly truncated data."""
    f = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    q = jnp.diag(jnp.array([1e-4, 1e-3]))
    r = jnp.array([[0.05]])
    rng = np.random.default_rng(0)
    ys = jnp.asarray(0.3 * rng.standard_normal((20, 1)))
    model, st = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h,
                            gn.noiseless(q, r))
    _, ests = vanilla.run(model, st, measurements=ys)
    t = 20
    phis = jnp.broadcast_to(f, (t, 2, 2))

    x0l, p0l = smoothing.fixed_lag_smoother(phis, q, ests.state,
                                            ests.covariance, 0)
    np.testing.assert_array_equal(x0l, ests.state)

    x_full, p_full = smoothing.rts_smoother(phis, q, ests.state,
                                            ests.covariance)
    x_inf, p_inf = smoothing.fixed_lag_smoother(phis, q, ests.state,
                                                ests.covariance, t)
    np.testing.assert_allclose(x_inf, x_full, atol=1e-10)
    np.testing.assert_allclose(p_inf, p_full, atol=1e-10)

    lag = 4
    xl, pl = smoothing.fixed_lag_smoother(phis, q, ests.state,
                                          ests.covariance, lag)
    for k in (0, 3, 9, 14):
        xr, pr = smoothing.rts_smoother(
            phis[: k + lag + 1], q,
            ests.state[: k + lag + 1], ests.covariance[: k + lag + 1],
        )
        np.testing.assert_allclose(xl[k], xr[k], atol=1e-10)
        np.testing.assert_allclose(pl[k], pr[k], atol=1e-10)
    # Monotone improvement: lag-4 covariance trace between filter & RTS.
    tr = lambda p: float(jnp.mean(jnp.trace(p, axis1=1, axis2=2)))
    assert tr(p_full) <= tr(pl) <= tr(ests.covariance) + 1e-12


def test_fixed_lag_smoother_time_varying_phis():
    """Fixed-lag on genuinely time-varying transitions equals the
    truncated-data time-varying RTS at every probe index."""
    rng = np.random.default_rng(4)
    t = 18
    phis = jnp.asarray(np.stack([
        np.eye(2) + 0.05 * rng.standard_normal((2, 2)) for _ in range(t)
    ]))
    q = jnp.diag(jnp.array([1e-4, 2e-3]))
    h = jnp.array([[1.0, 0.0]])
    r = jnp.array([[0.04]])
    x = jnp.array([0.2, -0.1])
    p = jnp.eye(2)
    means, covs = [], []
    st = None
    from gokalman_tpu.filters import vanilla as v
    for k in range(t):
        model, st0 = v.new(x, p, phis[k], None, h, gn.noiseless(q, r))
        st = st0 if st is None else st
        st, est = v.step(model, st, jnp.asarray([0.3 + 0.01 * k]))
        means.append(est.state); covs.append(est.covariance)
    means = jnp.stack(means); covs = jnp.stack(covs)

    lag = 5
    xl, pl = smoothing.fixed_lag_smoother(phis, q, means, covs, lag)
    for k in (0, 4, 9, 12):
        xr, pr = smoothing.rts_smoother(phis[: k + lag + 1], q,
                                        means[: k + lag + 1],
                                        covs[: k + lag + 1])
        np.testing.assert_allclose(xl[k], xr[k], atol=1e-10)
        np.testing.assert_allclose(pl[k], pr[k], atol=1e-10)


def test_rts_offsets_match_numpy_controlled():
    """RTS with deterministic prediction offsets (b_k = G u_k) against
    a control-aware numpy reference loop."""
    rng = np.random.default_rng(8)
    n, t = 3, 20
    phis = np.stack([np.eye(n) + 0.08 * rng.standard_normal((n, n))
                     for _ in range(t)])
    offsets = 0.3 * rng.standard_normal((t, n))
    q = random_spd(rng, n, 0.05)
    means = rng.standard_normal((t, n))
    covs = np.stack([random_spd(rng, n, 0.5) for _ in range(t)])

    sm, sc = smoothing.rts_smoother(
        jnp.asarray(phis), jnp.asarray(q), jnp.asarray(means),
        jnp.asarray(covs), offsets=jnp.asarray(offsets)
    )
    xs = means.copy()
    ps = covs.copy()
    for k in range(t - 2, -1, -1):
        f = phis[k + 1]
        p_pred = f @ covs[k] @ f.T + q
        c = covs[k] @ f.T @ np.linalg.inv(p_pred)
        xs[k] = means[k] + c @ (xs[k + 1] - f @ means[k] - offsets[k + 1])
        ps[k] = covs[k] + c @ (ps[k + 1] - p_pred) @ c.T
    np.testing.assert_allclose(np.asarray(sm), xs, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sc),
                               0.5 * (ps + ps.transpose(0, 2, 1)),
                               rtol=1e-7, atol=1e-10)
    # offsets=None keeps the historical behavior bit-for-bit.
    sm0, _ = smoothing.rts_smoother(jnp.asarray(phis), jnp.asarray(q),
                                    jnp.asarray(means), jnp.asarray(covs))
    sm0z, _ = smoothing.rts_smoother(jnp.asarray(phis), jnp.asarray(q),
                                     jnp.asarray(means), jnp.asarray(covs),
                                     offsets=jnp.zeros((t, n)))
    np.testing.assert_allclose(np.asarray(sm0), np.asarray(sm0z))


def test_fixed_point_smoother_converges_to_rts():
    """x_{k0|T} from the streaming fixed-point recursion equals the
    fixed-interval RTS smoother at k0; intermediate covariances shrink
    monotonically; entries before k0 pass the filter trace through."""
    from gokalman_tpu.filters import vanilla as v
    rng = np.random.default_rng(21)
    n, t, k0 = 2, 30, 10
    dt = 0.5
    f = jnp.array([[1.0, dt], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    q = jnp.asarray(0.05 * np.array([[dt**3 / 3, dt**2 / 2],
                                     [dt**2 / 2, dt]]))
    r = jnp.array([[0.3]])
    ys = jnp.asarray(rng.standard_normal((t, 1)))
    model, state = v.new(jnp.zeros(n), jnp.eye(n), f, None, h,
                         gn.noiseless(q, r))
    _, ests = v.run(model, state, ys)

    x_fp, p_fp = smoothing.fixed_point_smoother(
        f, h, r, ests.state, ests.covariance,
        ests.innovation, ests.pred_covariance, k0
    )
    phis = jnp.broadcast_to(f, (t, n, n))
    xr, pr = smoothing.rts_smoother(phis, q, ests.state, ests.covariance)
    np.testing.assert_allclose(np.asarray(x_fp[-1]), np.asarray(xr[k0]),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(p_fp[-1]), np.asarray(pr[k0]),
                               rtol=1e-8, atol=1e-12)
    # Seed: at k0 the fixed point IS the filtered estimate.
    np.testing.assert_allclose(np.asarray(x_fp[k0]),
                               np.asarray(ests.state[k0]))
    # Monotone information gain: trace never increases past k0.
    traces = np.trace(np.asarray(p_fp), axis1=1, axis2=2)
    assert np.all(np.diff(traces[k0:]) <= 1e-12)
    # Passthrough before the fixed point exists.
    np.testing.assert_allclose(np.asarray(x_fp[:k0]),
                               np.asarray(ests.state[:k0]))
    # Mid-stream consistency: x_{k0|k} equals RTS on the truncated arc.
    for k in (k0, k0 + 3, t - 2):
        xr_k, pr_k = smoothing.rts_smoother(
            phis[: k + 1], q, ests.state[: k + 1], ests.covariance[: k + 1]
        )
        np.testing.assert_allclose(np.asarray(x_fp[k]), np.asarray(xr_k[k0]),
                                   rtol=1e-8, atol=1e-11)
        np.testing.assert_allclose(np.asarray(p_fp[k]), np.asarray(pr_k[k0]),
                                   rtol=1e-7, atol=1e-11)


def test_two_filter_smoother_equals_rts():
    """Fraser-Potter two-filter smoother == RTS on a full run (LTI,
    every-step measurements), built from a real vanilla.run trace."""
    rng = np.random.default_rng(95)
    n, p, t = 3, 2, 60
    f = jnp.asarray(np.eye(n) + 0.05 * rng.standard_normal((n, n)))
    h = jnp.asarray(rng.standard_normal((p, n)))
    q = jnp.asarray(random_spd(rng, n, 0.05))
    r = jnp.asarray(random_spd(rng, p, 0.3))
    x0 = jnp.asarray(rng.standard_normal(n))
    p0 = jnp.asarray(random_spd(rng, n, 1.0))
    model, state0 = vanilla.new(x0, p0, f, None, h, gn.noiseless(q, r))
    ys = jnp.asarray(rng.standard_normal((t, p)))
    _, est = vanilla.run(model, state0, ys)
    phis = jnp.broadcast_to(f, (t, n, n))
    sm_r, sc_r = smoothing.rts_smoother(phis, q, est.state, est.covariance)
    sm_2, sc_2 = smoothing.two_filter_smoother(
        phis, q, h, r, ys, est.state, est.covariance)
    np.testing.assert_allclose(np.asarray(sm_2), np.asarray(sm_r),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sc_2), np.asarray(sc_r),
                               rtol=1e-6, atol=1e-9)


def test_two_filter_smoother_masks_offsets_time_varying():
    """Masked (missing) measurements + control offsets + a time-varying
    H schedule: still == RTS built from the same masked filter trace."""
    rng = np.random.default_rng(96)
    n, p, t = 2, 1, 50
    dt = 0.1
    f = jnp.array([[1.0, dt], [0.0, 1.0]])
    g = jnp.array([[0.5 * dt * dt], [dt]])
    q = jnp.array([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]]) * 0.05
    r = jnp.array([[0.4]])
    hs = jnp.asarray(np.where(
        (np.arange(t) % 2 == 0)[:, None, None],
        np.array([[1.0, 0.0]]), np.array([[0.5, 0.5]])))
    masks = jnp.asarray(np.arange(t) % 3 != 1)
    us = jnp.asarray(0.2 * rng.standard_normal((t, 1)))
    ys = jnp.asarray(rng.standard_normal((t, 1)))
    x0, p0 = jnp.zeros(n), jnp.eye(n)
    model, state0 = vanilla.new(x0, p0, f, g, jnp.array([[1.0, 0.0]]),
                                gn.noiseless(q, r))
    # forward filtered trace with per-step H and measurement masks
    st = state0
    xs_f, ps_f = [], []
    for k in range(t):
        st, e = vanilla.step(model, st, ys[k], us[k], h=hs[k],
                             meas_mask=jnp.asarray([bool(masks[k])]))
        xs_f.append(e.state)
        ps_f.append(e.covariance)
    means = jnp.stack(xs_f)
    covs = jnp.stack(ps_f)
    phis = jnp.broadcast_to(f, (t, n, n))
    offsets = (g @ us.T).T
    sm_r, sc_r = smoothing.rts_smoother(phis, q, means, covs,
                                        offsets=offsets)
    sm_2, sc_2 = smoothing.two_filter_smoother(
        phis, q, hs, r, ys, means, covs, meas_masks=masks,
        offsets=offsets)
    np.testing.assert_allclose(np.asarray(sm_2), np.asarray(sm_r),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sc_2), np.asarray(sc_r),
                               rtol=1e-6, atol=1e-9)


def test_two_filter_last_entry_is_filtered():
    """At k = T-1 there are no future measurements: smoothed == filtered."""
    rng = np.random.default_rng(97)
    n, p, t = 2, 1, 20
    f = jnp.asarray(np.eye(n) + 0.05 * rng.standard_normal((n, n)))
    h = jnp.asarray(rng.standard_normal((p, n)))
    q = jnp.asarray(random_spd(rng, n, 0.05))
    r = jnp.asarray(random_spd(rng, p, 0.3))
    model, state0 = vanilla.new(jnp.zeros(n), jnp.eye(n), f, None, h,
                                gn.noiseless(q, r))
    ys = jnp.asarray(rng.standard_normal((t, p)))
    _, est = vanilla.run(model, state0, ys)
    phis = jnp.broadcast_to(f, (t, n, n))
    sm, sc = smoothing.two_filter_smoother(phis, q, h, r, ys, est.state,
                                           est.covariance)
    np.testing.assert_allclose(np.asarray(sm[-1]),
                               np.asarray(est.state[-1]), atol=1e-10)
    np.testing.assert_allclose(np.asarray(sc[-1]),
                               np.asarray(est.covariance[-1]), atol=1e-10)
