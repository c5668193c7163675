"""Schmidt-Kalman consider filter.

The load-bearing claims (Tapley/Schutz/Born §6.6):
1. decoupled considers ⇒ exactly vanilla;
2. with an unestimated measurement bias, the naive filter is
   OVERCONFIDENT (empirical NEES >> n) while the consider filter stays
   calibrated — its reported Pxx is the true error covariance of the
   constrained estimator;
3. estimating beats considering beats ignoring, in covariance order;
4. the consider mean never moves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gokalman_tpu import noise, schmidt, vanilla

jax.config.update("jax_enable_x64", True)


def _cv_model(dt=0.1, qpsd=0.05, rvar=0.04):
    f = jnp.array([[1.0, dt], [0.0, 1.0]])
    q = qpsd * jnp.array(
        [[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]]
    )
    h = jnp.array([[1.0, 0.0]])
    r = jnp.array([[rvar]])
    return f, q, h, r


def test_decoupled_considers_equal_vanilla():
    f, q, h, r = _cv_model()
    x0 = jnp.array([0.5, -0.2])
    p0 = jnp.eye(2) * 2.0
    vm, vs = vanilla.new(x0, p0, f, None, h, noise.noiseless(q, r))
    sm, ss = schmidt.new(x0, p0, f, h, noise.noiseless(q, r),
                         consider_cov=jnp.eye(1) * 9.0)
    key = jax.random.PRNGKey(0)
    ys = 0.7 * jax.random.normal(key, (40, 1))
    _, ve = vanilla.run(vm, vs, ys)
    _, se = schmidt.run(sm, ss, ys)
    np.testing.assert_allclose(se.state, ve.state, atol=1e-12)
    np.testing.assert_allclose(se.covariance, ve.covariance, atol=1e-12)
    # zero cross-covariance forever, zero inflation
    np.testing.assert_allclose(se.cross_covariance, 0.0, atol=1e-12)
    last = jax.tree.map(lambda a: a[-1], se)
    np.testing.assert_allclose(
        schmidt.consider_inflation(sm, last), 0.0, atol=1e-12)


def _bias_scenario(key, t=300, bias_sigma=0.6):
    """Truth with a constant measurement bias c ~ N(0, bias_sigma^2)."""
    f, q, h, r = _cv_model()
    kx, kb, kw, kv = jax.random.split(key, 4)
    x = jnp.array([0.0, 1.0]) + jax.random.normal(kx, (2,)) * jnp.array([1.0, 0.3])
    c = bias_sigma * jax.random.normal(kb, ())
    ws = jax.random.multivariate_normal(kw, jnp.zeros(2), q, (t,))
    vs = jnp.sqrt(r[0, 0]) * jax.random.normal(kv, (t,))

    def prop(xk, inp):
        w, v = inp
        xk = f @ xk + w
        y = h @ xk + v + c
        return xk, (xk, y)

    _, (truth, ys) = jax.lax.scan(prop, x, (ws, vs[:, None]))
    return truth, ys, c


def _nees(err, covs):
    return jax.vmap(lambda e, p: e @ jnp.linalg.solve(p, e))(err, covs)


def test_consider_calibrated_naive_overconfident():
    f, q, h, r = _cv_model()
    x0 = jnp.zeros(2)
    p0 = jnp.diag(jnp.array([1.0, 0.09]))
    bias_sigma = 0.6
    n_mc, t = 64, 300

    def one(key):
        truth, ys, _ = _bias_scenario(key, t=t, bias_sigma=bias_sigma)
        vm, vs = vanilla.new(x0, p0, f, None, h, noise.noiseless(q, r))
        _, ve = vanilla.run(vm, vs, ys)
        sm, ss = schmidt.new(x0, p0, f, h, noise.noiseless(q, r),
                             consider_cov=jnp.array([[bias_sigma**2]]),
                             hc=jnp.array([[1.0]]))
        _, se = schmidt.run(sm, ss, ys)
        nees_v = _nees(truth - ve.state, ve.covariance)
        nees_s = _nees(truth - se.state, se.covariance)
        return nees_v[t // 2:].mean(), nees_s[t // 2:].mean()

    keys = jax.random.split(jax.random.PRNGKey(7), n_mc)
    nv, ns = jax.vmap(one)(keys)
    naive, cons = float(nv.mean()), float(ns.mean())
    # Naive filter believes its shrunk covariance while carrying the
    # bias error: wildly overconfident.  The consider filter's NEES
    # averages n over the ensemble of bias draws.
    assert naive > 2.0 * 2.0, naive
    assert 1.6 < cons < 2.5, cons


def test_estimate_beats_consider_beats_ignore():
    """Covariance ordering at steady state: augmented-KF Pxx <=
    consider Pxx, and consider Pxx carries a PSD inflation over naive
    (what honesty about the bias costs)."""
    f, q, h, r = _cv_model()
    x0 = jnp.zeros(2)
    p0 = jnp.diag(jnp.array([1.0, 0.09]))
    pcc = jnp.array([[0.36]])
    hc = jnp.array([[1.0]])
    ys = jnp.zeros((400, 1))  # covariances are measurement-independent

    sm, ss = schmidt.new(x0, p0, f, h, noise.noiseless(q, r),
                         consider_cov=pcc, hc=hc)
    _, se = schmidt.run(sm, ss, ys)

    # augmented filter that ESTIMATES the bias
    dt = x0.dtype
    f_a = jnp.block([[f, jnp.zeros((2, 1), dt)], [jnp.zeros((1, 2), dt), jnp.eye(1, dtype=dt)]])
    h_a = jnp.concatenate([h, hc], axis=1)
    q_a = jax.scipy.linalg.block_diag(q, jnp.zeros((1, 1), dt))
    p0_a = jax.scipy.linalg.block_diag(p0, pcc)
    am, as_ = vanilla.new(jnp.zeros(3), p0_a, f_a, None, h_a,
                          noise.noiseless(q_a, r))
    _, ae = vanilla.run(am, as_, ys)

    # naive filter ignoring the bias entirely
    vm, vs = vanilla.new(x0, p0, f, None, h, noise.noiseless(q, r))
    _, ve = vanilla.run(vm, vs, ys)

    p_cons = np.asarray(se.covariance[-1])
    p_aug = np.asarray(ae.covariance[-1][:2, :2])
    p_naive = np.asarray(ve.covariance[-1])
    assert np.all(np.linalg.eigvalsh(p_cons - p_aug) > -1e-10)
    assert np.all(np.linalg.eigvalsh(p_cons - p_naive) > -1e-10)
    assert p_cons[0, 0] > p_naive[0, 0] * 1.5  # inflation is material
    infl = schmidt.consider_inflation(sm, jax.tree.map(lambda a: a[-1], se))
    assert np.all(np.linalg.eigvalsh(np.asarray(infl)) > -1e-12)


def test_consider_mean_never_moves_and_runs_under_jit():
    f, q, h, r = _cv_model()
    sm, ss = schmidt.new(jnp.zeros(2), jnp.eye(2), f, h,
                         noise.noiseless(q, r),
                         consider_cov=jnp.array([[0.25]]),
                         hc=jnp.array([[1.0]]),
                         consider_mean=jnp.array([0.7]))
    ys = jnp.ones((25, 1))
    run = jax.jit(lambda y: schmidt.run(sm, ss, y))
    fin, se = run(ys)
    np.testing.assert_allclose(se.consider, 0.7, atol=1e-14)
    np.testing.assert_allclose(fin.x[2:], 0.7, atol=1e-14)
    assert np.isfinite(np.asarray(se.covariance)).all()
    # gain rows for considers are structurally zero
    assert se.gain.shape == (25, 2, 1)


def test_dynamic_coupling_builds_cross_covariance():
    """B != 0 (consider parameter drives the dynamics, e.g. unmodeled
    constant acceleration): Pxc grows from zero and the estimated-state
    variance inflates over the naive filter even with Hc = 0."""
    f, q, h, r = _cv_model()
    dtm = 0.1
    b = jnp.array([[0.5 * dtm**2], [dtm]])  # accel bias coupling
    sm, ss = schmidt.new(jnp.zeros(2), jnp.eye(2), f, h,
                         noise.noiseless(q, r),
                         consider_cov=jnp.array([[1e-2]]), b=b)
    ys = jnp.zeros((200, 1))
    _, se = schmidt.run(sm, ss, ys)
    assert float(jnp.abs(se.cross_covariance[-1]).max()) > 1e-5
    vm, vs = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h,
                         noise.noiseless(q, r))
    _, ve = vanilla.run(vm, vs, ys)
    assert float(se.covariance[-1, 1, 1]) > float(ve.covariance[-1, 1, 1])


def test_gauss_markov_considers():
    """fc/qc give the considers ECRV dynamics; Pcc relaxes to the GM
    steady state sigma^2 instead of staying at Pcc(0)."""
    f, q, h, r = _cv_model()
    tau, sigma, dtm = 5.0, 0.3, 0.1
    fc = jnp.array([[np.exp(-dtm / tau)]])
    qc = jnp.array([[sigma**2 * (1 - np.exp(-2 * dtm / tau))]])
    sm, ss = schmidt.new(jnp.zeros(2), jnp.eye(2), f, h,
                         noise.noiseless(q, r),
                         consider_cov=jnp.array([[4.0]]),
                         hc=jnp.array([[1.0]]), fc=fc, qc=qc)
    ys = jnp.zeros((600, 1))
    _, se = schmidt.run(sm, ss, ys)
    # consider gain is zero, so Pcc follows its own Lyapunov recursion
    np.testing.assert_allclose(
        float(se.consider_covariance[-1, 0, 0]), sigma**2, rtol=1e-6)


def test_dim_checks():
    f, q, h, r = _cv_model()
    with pytest.raises(ValueError):
        schmidt.new(jnp.zeros(3), jnp.eye(3), f, h, noise.noiseless(q, r),
                    consider_cov=jnp.eye(1))


def test_consider_analysis_reduces_to_formal():
    f, q, h, r = _cv_model()
    x0, p0 = jnp.zeros(2), jnp.eye(2)
    vm, vs = vanilla.new(x0, p0, f, None, h, noise.noiseless(q, r))
    ys = jnp.zeros((60, 1))
    _, ve = vanilla.run(vm, vs, ys)
    t = 60
    res = schmidt.consider_analysis(
        jnp.broadcast_to(f, (t, 2, 2)), jnp.broadcast_to(h, (t, 1, 2)),
        ve.gain, q, r, consider_cov=jnp.eye(1) * 4.0, p0=p0)
    np.testing.assert_allclose(res.covariance, ve.covariance, atol=1e-12)
    np.testing.assert_allclose(res.formal_covariance, ve.covariance, atol=1e-12)
    np.testing.assert_allclose(res.cross_covariance, 0.0, atol=1e-12)


def test_consider_analysis_matches_schmidt_filter():
    """Fed the Schmidt filter's own gains, the analysis reproduces the
    Schmidt-carried Pxx/Pxc: the Schmidt covariance IS the true error
    covariance of the constrained estimator."""
    f, q, h, r = _cv_model()
    x0, p0 = jnp.zeros(2), jnp.diag(jnp.array([1.0, 0.09]))
    pcc = jnp.array([[0.36]])
    hc = jnp.array([[1.0]])
    sm, ss = schmidt.new(x0, p0, f, h, noise.noiseless(q, r),
                         consider_cov=pcc, hc=hc)
    t = 120
    _, se = schmidt.run(sm, ss, jnp.zeros((t, 1)))
    res = schmidt.consider_analysis(
        jnp.broadcast_to(f, (t, 2, 2)), jnp.broadcast_to(h, (t, 1, 2)),
        se.gain, q, r, consider_cov=pcc, hc=hc, p0=p0)
    np.testing.assert_allclose(res.covariance, se.covariance,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.abs(res.cross_covariance),
                               np.abs(se.cross_covariance),
                               rtol=1e-9, atol=1e-12)


def test_consider_analysis_monte_carlo_pin():
    """The analysis covariance equals the naive filter's EMPIRICAL
    error covariance over random bias draws."""
    f, q, h, r = _cv_model()
    x0, p0 = jnp.zeros(2), jnp.diag(jnp.array([1.0, 0.09]))
    bias_sigma = 0.6
    t, n_mc = 120, 4096
    vm, vs = vanilla.new(x0, p0, f, None, h, noise.noiseless(q, r))

    def one(key):
        truth, ys, _ = _bias_scenario(key, t=t, bias_sigma=bias_sigma)
        _, ve = vanilla.run(vm, vs, ys)
        return ve.state[-1] - truth[-1], ve.gain

    keys = jax.random.split(jax.random.PRNGKey(3), n_mc)
    errs, gains = jax.vmap(one)(keys)
    emp = jnp.einsum("si,sj->ij", errs, errs) / n_mc
    res = schmidt.consider_analysis(
        jnp.broadcast_to(f, (t, 2, 2)), jnp.broadcast_to(h, (t, 1, 2)),
        gains[0], q, r, consider_cov=jnp.array([[bias_sigma**2]]),
        hc=jnp.array([[1.0]]), p0=p0)
    pred = np.asarray(res.covariance[-1])
    emp = np.asarray(emp)
    # Each entry within MC error; Frobenius within ~7%.
    assert np.linalg.norm(emp - pred) < 0.07 * np.linalg.norm(pred), (emp, pred)
    # and the formal covariance UNDERSTATES the truth materially
    assert pred[0, 0] > 1.5 * float(res.formal_covariance[-1, 0, 0])
