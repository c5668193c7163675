"""Classical KF extensions: fading memory, correlated process/
measurement noise (pinned against brute-force joint-Gaussian
conditioning), augmented non-additive-noise UKF."""

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import ukf, vanilla

from fixtures import robot1d_matrices


def _system(q_scale=0.02, r_scale=0.5):
    f, g, dt = robot1d_matrices()
    h = jnp.array([[1.0, 0.0]])
    q = jnp.array([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]]) * q_scale
    r = jnp.array([[r_scale]])
    x0, p0 = jnp.zeros(2), jnp.diag(jnp.array([4.0, 1.0]))
    return f, h, q, r, x0, p0


# ----------------------------- fading memory -------------------------


def test_fading_alpha_one_is_vanilla():
    f, h, q, r, x0, p0 = _system()
    nz = gn.noiseless(q, r)
    vm, vs = vanilla.new(x0, p0, f, None, h, nz)
    T = 40
    ys = jax.random.normal(jax.random.PRNGKey(0), (T, 1))
    _, ev = vanilla.run(vm, vs, ys)
    _, ef = vanilla.run_fading(vm, vs, ys, alpha=1.0)
    np.testing.assert_allclose(np.asarray(ef.state), np.asarray(ev.state),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(ef.covariance),
                               np.asarray(ev.covariance), atol=1e-12)


def test_fading_tracks_unmodeled_drift():
    """Truth has a slow unmodeled acceleration; the converged vanilla
    gain is too small and lags persistently, the fading filter keeps
    the gain open and halves the RMS."""
    f, h, q, r, x0, p0 = _system(q_scale=1e-5, r_scale=0.1)
    nz = gn.noiseless(q, r)
    fn, hn = np.asarray(f), np.asarray(h)
    rng = np.random.default_rng(1)
    T = 400
    x = np.zeros(2)
    xs = []
    for k in range(T):
        x = fn @ x
        x[1] += 2e-3  # unmodeled constant acceleration
        xs.append(x.copy())
    xs = np.stack(xs)
    ys = jnp.asarray(xs[:, :1] + np.sqrt(0.1) * rng.standard_normal((T, 1)))
    vm, vs = vanilla.new(x0, p0, f, None, h, nz)
    _, ev = vanilla.run(vm, vs, ys)
    _, ef = vanilla.run_fading(vm, vs, ys, alpha=1.02)
    rms_v = float(np.sqrt(((np.asarray(ev.state)[:, 0] - xs[:, 0]) ** 2)
                          [100:].mean()))
    rms_f = float(np.sqrt(((np.asarray(ef.state)[:, 0] - xs[:, 0]) ** 2)
                          [100:].mean()))
    assert rms_f < 0.6 * rms_v, (rms_f, rms_v)


# ------------------------- correlated noise --------------------------


def test_correlated_zero_m_is_vanilla():
    f, h, q, r, x0, p0 = _system()
    nz = gn.noiseless(q, r)
    vm, vs = vanilla.new(x0, p0, f, None, h, nz)
    T = 30
    ys = jax.random.normal(jax.random.PRNGKey(1), (T, 1))
    _, ev = vanilla.run(vm, vs, ys)
    _, ec = vanilla.run_correlated(vm, vs, ys, jnp.zeros((2, 1)))
    np.testing.assert_allclose(np.asarray(ec.state), np.asarray(ev.state),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(ec.covariance),
                               np.asarray(ev.covariance), atol=1e-12)


def test_correlated_matches_joint_gaussian_conditioning():
    """4 steps, E[w_k v_{k+1}'] = M != 0: the filter posterior must
    equal EXACT joint-Gaussian conditioning of x_4 on (y_1..y_4),
    assembled by brute force in numpy."""
    f, h, q, r, x0, p0 = _system()
    # rho=0.5 correlation per channel: M_i = 0.5 sqrt(Q_ii R) keeps the
    # joint [[Q, M], [M', R]] PSD (correlated_step validates this —
    # the first version of this test used an impossible M and still
    # "passed" against conditioning formulas; the check now rejects it)
    m_cross = 0.5 * jnp.sqrt(jnp.diag(q)[:, None] * r[0, 0])
    fn, hn = np.asarray(f, np.float64), np.asarray(h, np.float64)
    qn, rn = np.asarray(q, np.float64), np.asarray(r, np.float64)
    mn = np.asarray(m_cross, np.float64)
    p0n = np.asarray(p0, np.float64)
    T, n, p = 4, 2, 1

    # joint latent z = [x0, w_0..w_3, v_1..v_4]
    nz_dim = n + T * n + T * p
    cov = np.zeros((nz_dim, nz_dim))
    cov[:n, :n] = p0n
    for k in range(T):
        iw = n + k * n
        cov[iw:iw + n, iw:iw + n] = qn
        iv = n + T * n + k * p
        cov[iv:iv + p, iv:iv + p] = rn
        cov[iw:iw + n, iv:iv + p] = mn  # w_k with v_{k+1}
        cov[iv:iv + p, iw:iw + n] = mn.T
    # linear maps: x_{k+1} = F x_k + w_k, y_{k+1} = H x_{k+1} + v_{k+1}
    a_x = np.zeros((n, nz_dim))
    a_x[:, :n] = np.eye(n)
    a_ys = []
    for k in range(T):
        a_x = fn @ a_x
        a_x[:, n + k * n:n + (k + 1) * n] += np.eye(n)
        a_y = hn @ a_x
        a_y[:, n + T * n + k * p:n + T * n + (k + 1) * p] += np.eye(p)
        a_ys.append(a_y)
    a_y_all = np.concatenate(a_ys, axis=0)  # [T*p, nz]
    # conditional of x_T on all ys (zero means everywhere)
    s_yy = a_y_all @ cov @ a_y_all.T
    s_xy = a_x @ cov @ a_y_all.T
    rng = np.random.default_rng(5)
    ys = rng.standard_normal((T, p))
    x_cond = s_xy @ np.linalg.solve(s_yy, ys.reshape(-1))
    p_cond = a_x @ cov @ a_x.T - s_xy @ np.linalg.solve(s_yy, s_xy.T)

    nz = gn.noiseless(q, r)
    vm, vs = vanilla.new(x0, p0, f, None, h, nz)
    _, ec = vanilla.run_correlated(vm, vs, jnp.asarray(ys), m_cross)
    np.testing.assert_allclose(np.asarray(ec.state[-1]), x_cond,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(ec.covariance[-1]), p_cond,
                               atol=1e-9)
    # and the naive filter (ignoring M) does NOT match
    _, ev = vanilla.run(vm, vs, jnp.asarray(ys))
    assert np.abs(np.asarray(ev.covariance[-1]) - p_cond).max() > 1e-3


# --------------------- augmented (non-additive) UKF -------------------


def test_augmented_ukf_linear_equals_kf():
    f, h, q, r, x0, p0 = _system()
    nz = gn.noiseless(q, r)
    vm, vs = vanilla.new(x0, p0, f, None, h, nz)
    um, us = ukf.new(x0, p0, nz)

    def fx(x, w):
        return f @ x + w

    def hx(x, v):
        return h @ x + v

    T = 40
    ys = jax.random.normal(jax.random.PRNGKey(2), (T, 1))
    _, ev = vanilla.run(vm, vs, ys)
    _, ea = ukf.run_augmented(um, us, ys, fx, hx)
    np.testing.assert_allclose(np.asarray(ea.state), np.asarray(ev.state),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(ea.covariance),
                               np.asarray(ev.covariance), atol=1e-8)


def test_augmented_ukf_multiplicative_noise_exact_moments():
    """fx(x, w) = a·x·(1+w) is bilinear — the UT is exact to degree 3,
    so the augmented prediction must hit the closed-form moments
    E = a·m, Var = a²(P + q(m² + P)) that NO additive-noise filter can
    even express (its Q enters additively, state-independently)."""
    a = 0.9
    m, p_var, q_var, r_var = 1.5, 0.3, 0.04, 0.1
    nz = gn.noiseless(jnp.array([[q_var]]), jnp.array([[r_var]]))
    um, us = ukf.new(jnp.array([m]), jnp.array([[p_var]]), nz)

    def fx(x, w):
        return a * x * (1.0 + w)

    def hx(x, v):
        return x + v

    _, est = ukf.step_augmented(um, us, jnp.array([0.0]), fx, hx,
                                has=jnp.bool_(False))
    exact_mean = a * m
    exact_var = a**2 * (p_var + q_var * (m**2 + p_var))
    # The UT's axis-aligned points capture the state-scaled q·m² term
    # exactly but miss the q·P cross-fourth moment (x²w² is zero on
    # every axis point) — the augmented prediction is a²(P + q m²),
    # pinned, vs the additive filter's state-INDEPENDENT a²P + q.
    ut_var = a**2 * (p_var + q_var * m**2)
    additive_var = a**2 * p_var + q_var
    np.testing.assert_allclose(float(est.state[0]), exact_mean, rtol=1e-9)
    np.testing.assert_allclose(float(est.pred_covariance[0, 0]), ut_var,
                               rtol=1e-9)
    # augmented lands 4x closer to the true variance than additive
    assert abs(ut_var - exact_var) < 0.3 * abs(additive_var - exact_var)


def test_augmented_ukf_masked_step_is_prediction():
    f, h, q, r, x0, p0 = _system()
    nz = gn.noiseless(q, r)
    um, us = ukf.new(x0, p0, nz)

    def fx(x, w):
        return f @ x + w * (1.0 + 0.1 * x)

    def hx(x, v):
        return h @ x + v

    st, est = ukf.step_augmented(um, us, jnp.array([9.9]), fx, hx,
                                 has=jnp.bool_(False))
    np.testing.assert_allclose(np.asarray(st.x), np.asarray(est.state),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(st.p),
                               np.asarray(est.pred_covariance), atol=1e-10)
    assert float(jnp.linalg.norm(est.gain)) == 0.0


def test_fading_alpha_one_preserves_measurement_convention():
    """est.measurement must be H @ previous state (vanilla.go:155-157)
    on the fading path too — the review pass caught a step() re-entry
    that emitted H @ x_pred instead (0.04 divergence)."""
    f, h, q, r, x0, p0 = _system()
    nz = gn.noiseless(q, r)
    vm, vs = vanilla.new(x0, p0, f, None, h, nz)
    ys = jax.random.normal(jax.random.PRNGKey(9), (15, 1))
    _, ev = vanilla.run(vm, vs, ys)
    _, ef = vanilla.run_fading(vm, vs, ys, alpha=1.0)
    np.testing.assert_allclose(np.asarray(ef.measurement),
                               np.asarray(ev.measurement), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ef.innovation),
                               np.asarray(ev.innovation), atol=1e-12)
