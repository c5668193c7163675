"""EM system identification: exact-conditional oracle for the E-step
(joint-Gaussian brute force incl. the lag-one cross-covariances),
monotone likelihood, and Q/R/F/x0 recovery from simulated data."""

import jax.numpy as jnp
import numpy as np

from gokalman_tpu import sysid
from gokalman_tpu import noise as gn
from gokalman_tpu.filters import vanilla

from fixtures import random_spd


def _simulate(rng, f, h, q, r, x0, t, g=None, us=None):
    """x_{k+1} = F x_k + G u_k + w; measurements[k] = H x_{k+1} + v."""
    n = x0.shape[0]
    p = h.shape[0]
    lq = np.linalg.cholesky(q)
    lr = np.linalg.cholesky(r)
    x = np.asarray(x0, dtype=np.float64).copy()
    ys = np.zeros((t, p))
    for k in range(t):
        x = f @ x + lq @ rng.standard_normal(n)
        if g is not None:
            x = x + g @ us[k]
        ys[k] = h @ x + lr @ rng.standard_normal(p)
    return ys


def _exact_conditional(f, h, q, r, x0, p0, ys):
    """Exact joint-Gaussian conditioning oracle: stack z = (x_0..x_T),
    condition on y_{1..T} = H x_k + v.  Returns smoothed means
    [T+1, n], covariances [T+1, n, n] and lag-one cross-covariances
    [T, n, n] (Cov(x_{k+1}, x_k | Y))."""
    t = ys.shape[0]
    n = x0.shape[0]
    p = h.shape[0]
    nz = (t + 1) * n
    mu = np.zeros(nz)
    cov = np.zeros((nz, nz))
    mu[:n] = x0
    cov[:n, :n] = p0
    # Propagate the joint prior block-row by block-row.
    for k in range(t):
        sl_k = slice(k * n, (k + 1) * n)
        sl_n = slice((k + 1) * n, (k + 2) * n)
        mu[sl_n] = f @ mu[sl_k]
        # Cov(x_{k+1}, x_j) = F Cov(x_k, x_j) for j <= k.
        cov[sl_n, : (k + 1) * n] = f @ cov[sl_k, : (k + 1) * n]
        cov[: (k + 1) * n, sl_n] = cov[sl_n, : (k + 1) * n].T
        cov[sl_n, sl_n] = f @ cov[sl_k, sl_k] @ f.T + q
    # Measurement map: y_k observes block k+1.
    hbig = np.zeros((t * p, nz))
    for k in range(t):
        hbig[k * p : (k + 1) * p, (k + 1) * n : (k + 2) * n] = h
    rbig = np.kron(np.eye(t), r)
    s = hbig @ cov @ hbig.T + rbig
    gain = cov @ hbig.T @ np.linalg.inv(s)
    mu_post = mu + gain @ (ys.reshape(-1) - hbig @ mu)
    cov_post = cov - gain @ hbig @ cov
    means = mu_post.reshape(t + 1, n)
    covs = np.stack(
        [cov_post[k * n : (k + 1) * n, k * n : (k + 1) * n] for k in range(t + 1)]
    )
    cross = np.stack(
        [
            cov_post[(k + 1) * n : (k + 2) * n, k * n : (k + 1) * n]
            for k in range(t)
        ]
    )
    return means, covs, cross


def _cv_system(dt=0.5, qs=0.05, rv=0.4):
    f = np.array([[1.0, dt], [0.0, 1.0]])
    h = np.array([[1.0, 0.0]])
    q = qs * np.array(
        [[dt**3 / 3.0, dt**2 / 2.0], [dt**2 / 2.0, dt]]
    )
    r = np.array([[rv]])
    return f, h, q, r


def test_smoothed_moments_match_exact_conditional():
    rng = np.random.default_rng(7)
    f, h, q, r = _cv_system()
    x0 = np.array([0.3, -0.2])
    p0 = random_spd(rng, 2, 0.5)
    t = 6
    ys = _simulate(rng, f, h, q, r, x0, t)
    model, state = vanilla.new(x0, p0, f, None, h, gn.noiseless(q, r))
    ms, ps, cross, ll = sysid.smoothed_moments(model, state, jnp.asarray(ys))
    ms_o, ps_o, cross_o = _exact_conditional(f, h, q, r, x0, p0, ys)
    np.testing.assert_allclose(np.asarray(ms), ms_o, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ps), ps_o, rtol=1e-7, atol=1e-10)
    # The lag-one identity Cov(x_{k+1}, x_k | Y_T) = P_{k+1|T} C_k^T —
    # the M-step's load-bearing quantity — against brute force.
    np.testing.assert_allclose(np.asarray(cross), cross_o, rtol=1e-7, atol=1e-10)
    assert np.isfinite(float(ll))


def test_em_loglik_monotone_and_qr_recovery():
    rng = np.random.default_rng(11)
    f, h, q, r = _cv_system()
    x0 = np.zeros(2)
    p0 = np.eye(2)
    t = 800
    ys = _simulate(rng, f, h, q, r, x0, t)
    # Start 10x off in both noise covariances.
    model, state = vanilla.new(
        x0, p0, f, None, h, gn.noiseless(10.0 * q, 0.1 * r)
    )
    res = sysid.em_fit(model, state, jnp.asarray(ys), iters=40,
                       fit=("q", "r"), structure="scalar")
    lls = np.asarray(res.log_liks)
    assert np.all(np.diff(lls) >= -1e-6 * np.abs(lls[:-1])), lls
    # R is strongly identified from 800 scalar measurements.
    r_hat = float(res.model.noise.r[0, 0])
    assert abs(r_hat - r[0, 0]) / r[0, 0] < 0.35, r_hat
    # Scalar-projected Q: compare against the same projection of truth.
    q_hat = float(res.model.noise.q[0, 0])
    q_proj = np.trace(q) / 2.0
    assert q_hat < 5.0 * q_proj and q_hat > q_proj / 5.0, (q_hat, q_proj)
    # The fit must beat the mis-specified start by a wide margin and
    # land at least near the truth's likelihood.
    model_true, state_true = vanilla.new(x0, p0, f, None, h, gn.noiseless(q, r))
    _, ests = vanilla.run(model_true, state_true, jnp.asarray(ys))
    ll_true = float(vanilla.innovations_log_likelihood(model_true, ests))
    assert lls[-1] > lls[0] + 10.0
    assert lls[-1] > ll_true - 5.0


def test_em_structure_and_fit_subsets():
    rng = np.random.default_rng(13)
    f, h, q, r = _cv_system()
    x0 = np.zeros(2)
    p0 = np.eye(2)
    ys = _simulate(rng, f, h, q, r, x0, 300)
    model, state = vanilla.new(x0, p0, f, None, h, gn.noiseless(3.0 * q, 2.0 * r))
    res = sysid.em_fit(model, state, jnp.asarray(ys), iters=10,
                       fit=("r",), structure="diag")
    # Q untouched, R updated and diagonal.
    np.testing.assert_allclose(np.asarray(res.model.noise.q), 3.0 * q)
    assert float(res.model.noise.r[0, 0]) != 2.0 * r[0, 0]
    res_d = sysid.em_fit(model, state, jnp.asarray(ys), iters=5,
                         fit=("q", "r"), structure="diag")
    q_fit = np.asarray(res_d.model.noise.q)
    assert np.allclose(q_fit, np.diag(np.diag(q_fit)))
    lls = np.asarray(res_d.log_liks)
    assert np.all(np.diff(lls) >= -1e-6 * np.abs(lls[:-1]))


def test_em_fits_transition_and_initial_state():
    rng = np.random.default_rng(17)
    n = 2
    f = np.array([[0.9, 0.15], [-0.1, 0.8]])  # stable, identifiable
    h = np.eye(2)
    q = 0.05 * np.eye(2)
    r = 0.02 * np.eye(2)
    x0 = np.array([2.0, -1.0])
    p0 = 0.5 * np.eye(2)
    ys = _simulate(rng, f, h, q, r, x0, 600)
    f0 = np.eye(2)  # start from a wrong transition
    model, state = vanilla.new(np.zeros(n), 4.0 * np.eye(n), f0, None, h,
                               gn.noiseless(q, r))
    res = sysid.em_fit(model, state, jnp.asarray(ys), iters=50,
                       fit=("f", "q", "x0"))
    lls = np.asarray(res.log_liks)
    assert np.all(np.diff(lls) >= -1e-6 * np.abs(lls[:-1]))
    np.testing.assert_allclose(np.asarray(res.model.f), f, atol=0.08)
    # Fitted prior: mean pulled toward the true start, covariance PSD.
    assert np.linalg.norm(np.asarray(res.state.x) - x0) < np.linalg.norm(x0)
    w = np.linalg.eigvalsh(np.asarray(res.state.p))
    assert np.all(w > -1e-12)


def test_em_with_controls():
    rng = np.random.default_rng(19)
    f, h, q, r = _cv_system()
    g = np.array([[0.125], [0.5]])
    t = 400
    us = 0.8 * np.sin(0.07 * np.arange(t))[:, None]
    x0 = np.zeros(2)
    ys = _simulate(rng, f, h, q, r, x0, t, g=g, us=us)
    model, state = vanilla.new(x0, np.eye(2), f, g, h,
                               gn.noiseless(8.0 * q, 8.0 * r))
    res = sysid.em_fit(model, state, jnp.asarray(ys),
                       controls=jnp.asarray(us), iters=30,
                       fit=("q", "r"), structure="scalar")
    lls = np.asarray(res.log_liks)
    assert np.all(np.diff(lls) >= -1e-6 * np.abs(lls[:-1]))
    r_hat = float(res.model.noise.r[0, 0])
    assert abs(r_hat - r[0, 0]) / r[0, 0] < 0.5, r_hat
    assert lls[-1] > lls[0] + 10.0


def test_em_rejects_unknown_target():
    f, h, q, r = _cv_system()
    model, state = vanilla.new(np.zeros(2), np.eye(2), f, None, h,
                               gn.noiseless(q, r))
    try:
        sysid.em_fit(model, state, jnp.zeros((10, 1)), fit=("g",))
    except ValueError as e:
        assert "unknown fit target" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_n4sid_recovers_eigenvalues_and_order():
    """Stochastic-only N4SID on a damped oscillator: the projection SVs
    expose the true order (big gap after 2) and the identified A has
    the true eigenvalues (basis-invariant) to a few 1e-3."""
    rng = np.random.default_rng(0)
    th = 0.35
    a = 0.97 * np.array([[np.cos(th), np.sin(th)],
                         [-np.sin(th), np.cos(th)]])
    c = np.array([[1.0, 0.0]])
    x = np.zeros(2)
    ys = []
    for _ in range(3000):
        x = a @ x + 0.1 * rng.standard_normal(2)
        ys.append(c @ x + 0.2 * rng.standard_normal(1))
    res = sysid.n4sid_fit(jnp.asarray(np.stack(ys)), order=2, horizon=10)
    sv = np.asarray(res.singular_values)
    assert sv[1] / sv[2] > 10.0, sv[:4]
    ev_t = np.sort_complex(np.linalg.eigvals(a))
    ev_i = np.sort_complex(np.linalg.eigvals(np.asarray(res.f)))
    assert np.abs(ev_t - ev_i).max() < 0.02, (ev_t, ev_i)


def test_n4sid_markov_parameters_with_controls():
    """Combined deterministic-stochastic run: the Markov parameters
    D, CB, CAB, CA^2B ... are basis-invariant — pin them against the
    truth system despite the arbitrary identified state basis."""
    rng = np.random.default_rng(1)
    f = np.array([[0.9, 0.2], [0.0, 0.7]])
    g = np.array([[0.0], [1.0]])
    h = np.array([[1.0, 0.5]])
    us = rng.choice([-1.0, 1.0], size=(4000, 1))  # PRBS drive
    x = np.zeros(2)
    ys = []
    for k in range(4000):
        x = f @ x + g @ us[k] + 0.02 * rng.standard_normal(2)
        ys.append(h @ x + 0.05 * rng.standard_normal(1))
    res = sysid.n4sid_fit(jnp.asarray(np.stack(ys)),
                          controls=jnp.asarray(us), order=2, horizon=8)
    fi, gi, hi, di = (np.asarray(res.f), np.asarray(res.g),
                      np.asarray(res.h), np.asarray(res.d))
    # note the simulation convention y_k = H x_{k+1} = H(Fx_k + Gu_k):
    # the "feedthrough" the identifier sees is HG, and Markov_k = HF^kG
    mk_true = [h @ g]
    mk_id = [di]
    a_pow_t, a_pow_i = np.eye(2), np.eye(2)
    for _ in range(5):
        a_pow_t = a_pow_t @ f
        a_pow_i = a_pow_i @ fi
        mk_true.append(h @ a_pow_t @ g)
        mk_id.append(hi @ a_pow_i @ gi)
    # D_id should capture HG; later parameters HF^kG
    np.testing.assert_allclose(mk_id[0], h @ g, atol=0.05)
    for k in range(1, 6):
        np.testing.assert_allclose(mk_id[k], mk_true[k], atol=0.05)


def test_n4sid_model_filters_like_truth():
    """End-use check: a vanilla KF built from the identified (F, H, Q,
    R) predicts held-out data essentially as well as the truth-model
    KF (innovation RMS within 5%)."""
    rng = np.random.default_rng(2)
    f, h, q, r = _cv_system()
    x0 = np.zeros(2)
    ys = _simulate(rng, f, h, q, r, x0, 4000)
    fit, held = ys[:3000], ys[3000:]
    res = sysid.n4sid_fit(jnp.asarray(fit), order=2, horizon=10)
    mt, st = vanilla.new(jnp.zeros(2), 10 * jnp.eye(2), jnp.asarray(f),
                         None, jnp.asarray(h), gn.noiseless(
                             jnp.asarray(q), jnp.asarray(r)))
    mi, si = vanilla.new(jnp.zeros(2), 10 * jnp.eye(2), res.f, None,
                         res.h, gn.noiseless(res.q, res.r))
    _, et = vanilla.run(mt, st, jnp.asarray(held))
    _, ei = vanilla.run(mi, si, jnp.asarray(held))
    rms_t = float(np.sqrt(np.mean(np.asarray(et.innovation) ** 2)))
    rms_i = float(np.sqrt(np.mean(np.asarray(ei.innovation) ** 2)))
    assert rms_i < 1.05 * rms_t, (rms_i, rms_t)


def test_n4sid_validation():
    import pytest

    ys = jnp.zeros((100, 1))
    with pytest.raises(ValueError):
        sysid.n4sid_fit(ys, order=20, horizon=5)
    with pytest.raises(ValueError):
        sysid.n4sid_fit(jnp.zeros((30, 1)), order=2, horizon=10)
    with pytest.raises(ValueError):
        sysid.n4sid_fit(jnp.zeros((100,)), order=2)


def test_n4sid_f32_deterministic_data_stays_finite():
    """Regression (review find): the regression ridge must scale with
    the dtype's eps — a noise-free f32 system made the singular gram's
    rounding noise dwarf a fixed 1e-10 ridge and cholesky NaN'd."""
    f = np.array([[0.9, 0.2], [0.0, 0.7]])
    h = np.array([[1.0, 0.5]])
    x = np.array([1.0, -1.0])
    ys = []
    for _ in range(600):
        x = f @ x
        ys.append(h @ x)
        if np.abs(x).max() < 1e-6:
            x = np.array([1.0, -1.0])  # re-kick the decaying system
    res = sysid.n4sid_fit(jnp.asarray(np.stack(ys), jnp.float32),
                          order=2, horizon=6)
    assert np.isfinite(np.asarray(res.f)).all()
    assert np.isfinite(np.asarray(res.states)).all()


def test_n4sid_order_boundary_raises():
    """Regression (review find, measured): order == horizon*p used to
    pass validation but the shifted observability split only has
    (horizon-1)*p rows — eigenvalue error 0.94 with no diagnostic."""
    import pytest

    ys = jnp.asarray(np.random.default_rng(0).standard_normal((500, 1)))
    with pytest.raises(ValueError, match="horizon-1"):
        sysid.n4sid_fit(ys, order=4, horizon=4)
    # and the control dimension counts toward the data-length bound
    with pytest.raises(ValueError, match="too short"):
        sysid.n4sid_fit(jnp.zeros((65, 1)), controls=jnp.zeros((65, 5)),
                        order=2, horizon=10)
