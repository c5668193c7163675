"""Ensemble Kalman filter family: ETKF exactness on linear models,
stochastic-EnKF statistical agreement with the KF, localization taper,
inflation, masked steps, nonlinear tracking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gokalman_tpu as gk
from gokalman_tpu.filters import enkf


def _system():
    dt = 0.1
    f = jnp.array([[1.0, dt], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    q = jnp.array([[1e-4, 0.0], [0.0, 1e-3]])
    r = jnp.array([[0.05]])
    x0 = jnp.array([0.2, -0.1])
    p0 = jnp.array([[0.5, 0.1], [0.1, 0.3]])
    return f, h, q, r, x0, p0


def _measurements(t=25, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((t, 1)) * 0.3 + 0.5)


def test_deterministic_ensemble_exact_moments():
    _, _, _, _, x0, p0 = _system()
    ens = enkf.deterministic_ensemble(x0, p0, 8)
    np.testing.assert_allclose(np.mean(ens, axis=0), x0, atol=1e-12)
    dev = ens - np.mean(ens, axis=0)
    np.testing.assert_allclose(dev.T @ dev / 7.0, p0, atol=1e-12)
    with pytest.raises(ValueError):
        enkf.deterministic_ensemble(x0, p0, 3)


def test_etkf_equals_kf_noise_free_dynamics():
    """With Q=0, a full-rank deterministic initial ensemble, and linear
    f/h, the symmetric-square-root ETKF IS the Kalman filter: means and
    covariances match the vanilla CKF step-for-step."""
    f, h, q, r, x0, p0 = _system()
    ys = _measurements()
    noise0 = gk.noise.noiseless(jnp.zeros_like(q), r)

    model, st = gk.vanilla.new(x0, p0, f, None, h, noise0)
    _, kf_est = gk.vanilla.run(model, st, measurements=ys)

    fx, hx = enkf.linear_fns(f, h)
    state0 = enkf.new(x0, p0, 8)
    _, est = enkf.run(noise0, state0, ys, fx, hx, method="etkf")

    np.testing.assert_allclose(est.state, kf_est.state, atol=1e-8)
    np.testing.assert_allclose(est.covariance, kf_est.covariance, atol=1e-8)
    np.testing.assert_allclose(est.innovation, kf_est.innovation, atol=1e-8)
    np.testing.assert_allclose(est.gain, kf_est.gain, atol=1e-8)


def test_etkf_masked_step_is_pure_forecast():
    f, h, q, r, x0, p0 = _system()
    noise0 = gk.noise.noiseless(jnp.zeros_like(q), r)
    fx, hx = enkf.linear_fns(f, h)
    state0 = enkf.new(x0, p0, 8)
    st1, est = enkf.step_etkf(noise0, state0, jnp.array([0.7]), fx, hx,
                              has=jnp.array(False))
    # Forecast-only: mean = F x0, covariance = F P0 Fᵀ.
    np.testing.assert_allclose(est.state, f @ x0, atol=1e-12)
    np.testing.assert_allclose(est.covariance, f @ p0 @ f.T, atol=1e-10)
    np.testing.assert_allclose(est.innovation, 0.0, atol=0)


def test_stochastic_enkf_tracks_kf():
    """Large-N stochastic EnKF with process noise: ensemble mean stays
    close to the exact KF mean and the posterior sample covariance
    approaches the KF covariance (O(1/sqrt(N)) Monte-Carlo error)."""
    f, h, q, r, x0, p0 = _system()
    ys = _measurements(t=30, seed=4)
    noise = gk.noise.awgn(q, r)

    model, st = gk.vanilla.new(x0, p0, f, None, h, gk.noise.noiseless(q, r))
    _, kf_est = gk.vanilla.run(model, st, measurements=ys)

    fx, hx = enkf.linear_fns(f, h)
    state0 = enkf.new(x0, p0, 4096, key=jax.random.PRNGKey(1))
    _, est = enkf.run(noise, state0, ys, fx, hx, key=jax.random.PRNGKey(2))

    scale = jnp.sqrt(jnp.diagonal(kf_est.covariance, axis1=1, axis2=2))
    err = np.abs(np.asarray(est.state - kf_est.state)) / np.asarray(scale)
    assert err.max() < 0.2, err.max()  # mean within 0.2 sigma everywhere
    rel = np.linalg.norm(est.covariance[-1] - kf_est.covariance[-1]) / (
        np.linalg.norm(kf_est.covariance[-1])
    )
    assert rel < 0.1, rel


def test_stochastic_enkf_masked_and_reproducible():
    f, h, q, r, x0, p0 = _system()
    noise = gk.noise.awgn(q, r)
    fx, hx = enkf.linear_fns(f, h)
    ys = _measurements(t=10)
    masks = jnp.array([True, True, False, True, False] * 2)
    state0 = enkf.new(x0, p0, 64, key=jax.random.PRNGKey(0))
    _, a = enkf.run(noise, state0, ys, fx, hx, key=jax.random.PRNGKey(7),
                    meas_masks=masks)
    _, b = enkf.run(noise, state0, ys, fx, hx, key=jax.random.PRNGKey(7),
                    meas_masks=masks)
    np.testing.assert_array_equal(a.state, b.state)
    # Masked steps carry zero innovation and zero gain.
    np.testing.assert_allclose(a.innovation[2], 0.0, atol=0)
    np.testing.assert_allclose(a.gain[2], 0.0, atol=0)


def test_gaspari_cohn_taper():
    c = 2.0
    d = jnp.array([0.0, 1.0, 2.0, 3.9, 4.0, 4.1, 10.0])
    g = enkf.gaspari_cohn(d, c)
    assert g[0] == 1.0
    assert np.all(np.asarray(g[1:4]) > 0)
    assert np.all(np.diff(np.asarray(g)) <= 1e-12)  # monotone decreasing
    np.testing.assert_allclose(g[4:], 0.0, atol=1e-12)  # zero beyond 2c


def test_localization_suppresses_spurious_correlations():
    """40-state diagonal random walk observed at site 0 with a tiny
    ensemble: the raw EnKF update leaks sampling noise into distant
    states; Gaspari-Cohn localization pins distant increments to zero."""
    n = 40
    rng = np.random.default_rng(5)
    q = 0.01 * jnp.eye(n)
    r = jnp.array([[0.1]])
    noise = gk.noise.awgn(q, r)
    fx = lambda x: x
    hx = lambda x: x[:1]
    x0 = jnp.zeros(n)
    p0 = jnp.eye(n)
    state0 = enkf.new(x0, p0, 16, key=jax.random.PRNGKey(3))

    dist = jnp.abs(jnp.arange(n, dtype=jnp.float64))
    loc_xy = enkf.gaspari_cohn(dist, 3.0)[:, None]  # [n, 1]
    y = jnp.array([1.0])

    _, est_raw = enkf.step(noise, state0, y, fx, hx, jax.random.PRNGKey(8))
    _, est_loc = enkf.step(noise, state0, y, fx, hx, jax.random.PRNGKey(8),
                           loc_xy=loc_xy)
    # Distant states (beyond 2c = 6 sites) receive exactly zero gain.
    np.testing.assert_allclose(est_loc.gain[10:], 0.0, atol=1e-12)
    assert np.abs(np.asarray(est_raw.gain[10:])).max() > 1e-3  # leaks without


def test_inflation_scales_forecast_spread():
    f, h, q, r, x0, p0 = _system()
    noise0 = gk.noise.noiseless(jnp.zeros_like(q), r)
    fx, hx = enkf.linear_fns(f, h)
    state0 = enkf.new(x0, p0, 8)
    _, e1 = enkf.step_etkf(noise0, state0, jnp.array([0.3]), fx, hx)
    _, e2 = enkf.step_etkf(noise0, state0, jnp.array([0.3]), fx, hx,
                           inflation=1.5)
    np.testing.assert_allclose(
        e2.pred_covariance, 1.5**2 * e1.pred_covariance, rtol=1e-10
    )


def test_enkf_nonlinear_converges():
    """Nonlinear range-tracking problem: both EnKF schemes reduce the
    initial error by >5x over a short arc (sanity on the nonlinear
    path; the UKF suite covers the same system)."""
    dt = 0.1

    def fx(x):
        return jnp.array([x[0] + dt * x[1], x[1] - dt * 0.2 * x[1] ** 3])

    def hx(x):
        return jnp.array([jnp.sqrt(1.0 + x[0] ** 2)])

    q = 1e-5 * jnp.eye(2)
    r = jnp.array([[1e-4]])
    noise = gk.noise.awgn(q, r)

    true0 = jnp.array([1.0, 0.5])
    xs = [true0]
    for _ in range(40):
        xs.append(fx(xs[-1]))
    truth = jnp.stack(xs[1:])
    ys = jax.vmap(hx)(truth)

    x0 = jnp.array([1.8, 0.0])
    p0 = jnp.diag(jnp.array([1.0, 0.5]))
    err0 = float(jnp.linalg.norm(x0 - true0))
    for method, key in [("stochastic", jax.random.PRNGKey(11)),
                        ("etkf", None)]:
        state0 = enkf.new(x0, p0, 128, key=jax.random.PRNGKey(6))
        _, est = enkf.run(noise, state0, ys, fx, hx, key=key, method=method)
        err = float(jnp.linalg.norm(est.state[-1] - truth[-1]))
        assert err < err0 / 5, (method, err, err0)


def test_etkf_masked_step_does_not_inflate():
    """Inflation is per assimilation in BOTH analysis schemes: a masked
    (pure-forecast) ETKF step must not inflate the anomalies, or sparse
    measurement scans compound it catastrophically (1.02^2160)."""
    f, h, q, r, x0, p0 = _system()
    noise0 = gk.noise.noiseless(jnp.zeros_like(q), r)
    fx, hx = enkf.linear_fns(f, h)
    state0 = enkf.new(x0, p0, 8)
    _, est = enkf.step_etkf(noise0, state0, jnp.array([0.3]), fx, hx,
                            inflation=2.0, has=jnp.array(False))
    np.testing.assert_allclose(est.pred_covariance, f @ p0 @ f.T, atol=1e-10)
    # And the stochastic step, same contract.
    _, est_s = enkf.step(noise0, state0, jnp.array([0.3]), fx, hx,
                         jax.random.PRNGKey(0), inflation=2.0,
                         has=jnp.array(False))
    np.testing.assert_allclose(est_s.pred_covariance, f @ p0 @ f.T,
                               atol=1e-10)


def test_enks_lag0_is_filter():
    """lag=0 EnKS == the stochastic EnKF trace bit-for-bit (same keys)."""
    import numpy as _np

    f, h, q, r, x0, p0 = _system()
    fx, hx = enkf.linear_fns(f, h)
    nz = gk.noise.awgn(q, r)
    state = enkf.new(x0, p0, 64, key=jax.random.PRNGKey(1))
    ys = jnp.asarray(_np.random.default_rng(0).standard_normal((30, 1)))
    key = jax.random.PRNGKey(7)
    _, est = enkf.run(nz, state, ys, fx, hx, key=key)
    _, xs_s, ps_s = enkf.run_enks(nz, state, ys, fx, hx, lag=0, key=key)
    _np.testing.assert_allclose(_np.asarray(xs_s), _np.asarray(est.state),
                                atol=1e-12)
    _np.testing.assert_allclose(_np.asarray(ps_s),
                                _np.asarray(est.covariance), atol=1e-12)


def test_enks_matches_fixed_lag_kf_smoother():
    """Linear-Gaussian, N=8192 members: the lag-L EnKS moments must
    land on the exact fixed-lag KF smoother (O(1/sqrt N) away), and
    clearly beat the filter on mid-arc RMS-to-exact-smoother."""
    import numpy as _np

    from gokalman_tpu.filters import smoothing, vanilla

    f, h, q, r, x0, p0 = _system()
    fx, hx = enkf.linear_fns(f, h)
    nz = gk.noise.awgn(q, r)
    T, lag = 40, 5
    ys = jnp.asarray(_np.random.default_rng(3).standard_normal((T, 1)))

    vm, vs = vanilla.new(x0, p0, f, None, h, gk.noise.noiseless(q, r))
    _, kf_est = vanilla.run(vm, vs, ys)
    phis = jnp.broadcast_to(f, (T, 2, 2))
    x_fl, p_fl = smoothing.fixed_lag_smoother(phis, q, kf_est.state,
                                              kf_est.covariance, lag)

    state = enkf.new(x0, p0, 8192, key=jax.random.PRNGKey(2))
    _, xs_s, ps_s = enkf.run_enks(nz, state, ys, fx, hx, lag=lag,
                                  key=jax.random.PRNGKey(9))
    err_s = _np.abs(_np.asarray(xs_s) - _np.asarray(x_fl)).mean()
    err_f = _np.abs(_np.asarray(kf_est.state) - _np.asarray(x_fl)).mean()
    # ensemble smoother lands on the exact smoother, far inside the
    # filter-to-smoother gap
    assert err_s < 0.25 * err_f, (err_s, err_f)
    # covariances agree too
    perr = _np.abs(_np.asarray(ps_s) - _np.asarray(p_fl)).mean()
    assert perr < 0.05, perr


def test_enks_masked_steps_shift_only():
    """A masked frame must not touch any lagged ensemble (pure shift +
    forecast)."""
    import numpy as _np

    f, h, q, r, x0, p0 = _system()
    fx, hx = enkf.linear_fns(f, h)
    nz = gk.noise.awgn(q, r)
    T, lag = 12, 3
    ys = jnp.zeros((T, 1))
    masks = jnp.zeros((T,), bool)  # nothing ever assimilated
    state = enkf.new(x0, p0, 32, key=jax.random.PRNGKey(4))
    key = jax.random.PRNGKey(5)
    _, xs_s, _ = enkf.run_enks(nz, state, ys, fx, hx, lag=lag, key=key,
                               meas_masks=masks)
    # pure forecasts: smoothed mean at j == filter forecast mean at j
    _, est = enkf.run(nz, state, ys, fx, hx, key=key, meas_masks=masks)
    _np.testing.assert_allclose(_np.asarray(xs_s), _np.asarray(est.state),
                                atol=1e-10)


def test_enks_lag_validation():
    import pytest as _pytest

    f, h, q, r, x0, p0 = _system()
    fx, hx = enkf.linear_fns(f, h)
    nz = gk.noise.awgn(q, r)
    state = enkf.new(x0, p0, 16, key=jax.random.PRNGKey(0))
    with _pytest.raises(ValueError):
        enkf.run_enks(nz, state, jnp.zeros((5, 1)), fx, hx, lag=5,
                      key=jax.random.PRNGKey(1))
