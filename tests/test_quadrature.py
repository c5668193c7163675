"""Gauss-Hermite quadrature filter pins: rule exactness by degree,
cubature-rule identity, linear==KF, higher-order moment win."""

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import quadrature, ukf, vanilla

from fixtures import robot1d_matrices


def test_gh_rule_polynomial_exactness():
    """GH(order k) integrates monomials of degree <= 2k-1 exactly under
    N(0,1); order 3 must get E[x^4]=3 right where the UT/cubature
    3rd-degree rules cannot."""
    rule = quadrature.gauss_hermite_rule(1, order=3)
    pts, ws = np.asarray(rule.points)[:, 0], np.asarray(rule.weights)
    for deg, true in ((0, 1.0), (1, 0.0), (2, 1.0), (3, 0.0), (4, 3.0),
                      (5, 0.0)):
        np.testing.assert_allclose((ws * pts**deg).sum(), true, atol=1e-12,
                                   err_msg=f"degree {deg}")
    # degree 6 is beyond 2*3-1: must NOT be exact (E[x^6]=15)
    assert abs((ws * pts**6).sum() - 15.0) > 1.0
    # order 4 nails it
    rule4 = quadrature.gauss_hermite_rule(1, order=4)
    p4, w4 = np.asarray(rule4.points)[:, 0], np.asarray(rule4.weights)
    np.testing.assert_allclose((w4 * p4**6).sum(), 15.0, atol=1e-9)


def test_gh_rule_tensor_product_cross_moments():
    rule = quadrature.gauss_hermite_rule(2, order=3)
    pts, ws = np.asarray(rule.points), np.asarray(rule.weights)
    assert pts.shape == (9, 2)
    np.testing.assert_allclose(ws.sum(), 1.0, atol=1e-12)
    # E[x^2 y^2] = 1 for independent standard normals
    np.testing.assert_allclose((ws * pts[:, 0]**2 * pts[:, 1]**2).sum(),
                               1.0, atol=1e-12)
    # E[x^3 y] = 0
    np.testing.assert_allclose((ws * pts[:, 0]**3 * pts[:, 1]).sum(),
                               0.0, atol=1e-12)


def test_spherical_radial_rule_equals_cubature_ukf():
    """quadrature with the spherical-radial rule == the UKF configured
    as a CKF (ukf.cubature_params), step for step on a nonlinear
    problem."""
    q = jnp.eye(2) * 0.01
    r = jnp.array([[0.1]])
    nz = gn.noiseless(q, r)
    x0, p0 = jnp.array([1.0, 0.5]), jnp.eye(2) * 0.3

    def fx(x):
        return jnp.array([x[0] + 0.1 * jnp.sin(x[1]), 0.95 * x[1]])

    def hx(x):
        return jnp.array([x[0] ** 2])

    um, us = ukf.new(x0, p0, nz, **ukf.cubature_params()._asdict())
    qm, qs = quadrature.new(x0, p0, nz,
                            rule=quadrature.spherical_radial_rule(2))
    T = 25
    meas = 1.0 + 0.2 * jax.random.normal(jax.random.PRNGKey(0), (T, 1))
    _, eu = ukf.run(um, us, meas, fx, hx)
    _, eq = quadrature.run(qm, qs, meas, fx, hx)
    np.testing.assert_allclose(np.asarray(eq.state), np.asarray(eu.state),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(eq.covariance),
                               np.asarray(eu.covariance), atol=1e-9)


def test_ghkf_linear_equals_kf():
    """On a linear model every quadrature filter is the exact KF."""
    f, g, dt = robot1d_matrices()
    h = jnp.array([[1.0, 0.0]])
    q = jnp.array([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]]) * 0.02
    r = jnp.array([[0.5]])
    nz = gn.noiseless(q, r)
    x0, p0 = jnp.zeros(2), jnp.diag(jnp.array([4.0, 1.0]))
    vm, vs = vanilla.new(x0, p0, f, None, h, nz)
    qm, qs = quadrature.new(x0, p0, nz, order=3)

    def fx(x):
        return f @ x

    def hx(x):
        return h @ x

    T = 50
    meas = jax.random.normal(jax.random.PRNGKey(1), (T, 1))
    _, ev = vanilla.run(vm, vs, meas)
    _, eq = quadrature.run(qm, qs, meas, fx, hx)
    np.testing.assert_allclose(np.asarray(eq.state), np.asarray(ev.state),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(eq.covariance),
                               np.asarray(ev.covariance), atol=1e-8)


def test_gh_beats_ut_on_quartic_measurement_moments():
    """Predicted-measurement mean of hx(x)=x^4 for x~N(1, 0.5): exact
    E[y] = m^4+6m^2 P+3P^2 = 4.75.  The 3rd-degree UT is exact only to
    cubics and misses the 3P^2 term's cross products; GH order>=3
    (degree-5 exact) nails it.  This is the moment error that becomes
    gain/posterior error in a real filter step."""
    x0 = jnp.array([1.0])
    p0 = jnp.array([[0.5]])
    nz = gn.noiseless(jnp.zeros((1, 1)), jnp.array([[1e-6]]))

    def hx(x):
        return x**4

    qm, _ = quadrature.new(x0, p0, nz, order=5)
    pts = quadrature.transform_points(x0, p0, qm.rule)
    y_gh, _, _ = quadrature.expectation(jax.vmap(hx)(pts), qm.rule)

    um, _ = ukf.new(x0, p0, nz)
    upts = ukf.sigma_points(x0, p0, um.params)
    _, wm, wc = ukf._weights(1, um.params, x0.dtype)
    y_ut = wm @ jax.vmap(hx)(upts)

    exact = 1.0 + 6 * 0.5 + 3 * 0.5**2
    err_gh = abs(float(y_gh[0]) - exact)
    err_ut = abs(float(y_ut[0]) - exact)
    assert err_gh < 1e-9, err_gh
    assert err_ut > 0.05 * exact, err_ut  # UT visibly biased on quartics
    assert err_gh < err_ut / 100


def test_masked_step_is_time_update():
    x0, p0 = jnp.array([1.0, 0.0]), jnp.eye(2)
    nz = gn.noiseless(0.01 * jnp.eye(2), jnp.array([[0.1]]))
    qm, qs = quadrature.new(x0, p0, nz, order=3)

    def fx(x):
        return jnp.array([x[0] + 0.1 * x[1], x[1]])

    def hx(x):
        return x[:1]

    st, est = quadrature.step(qm, qs, jnp.array([5.0]), fx, hx,
                              has=jnp.bool_(False))
    x_pred, p_pred = quadrature.predict(qm, qs, fx)
    np.testing.assert_allclose(np.asarray(st.x), np.asarray(x_pred),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(st.p), np.asarray(p_pred),
                               atol=1e-10)


def test_rts_smoother_linear_equals_kf_rts():
    """Quadrature RTS == linear RTS exactly on affine dynamics."""
    from gokalman_tpu.filters import smoothing

    f, g, dt = robot1d_matrices()
    h = jnp.array([[1.0, 0.0]])
    q = jnp.array([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]]) * 0.02
    r = jnp.array([[0.5]])
    nz = gn.noiseless(q, r)
    x0, p0 = jnp.zeros(2), jnp.diag(jnp.array([4.0, 1.0]))
    qm, qs = quadrature.new(x0, p0, nz, order=3)

    def fx(x):
        return f @ x

    def hx(x):
        return h @ x

    T = 40
    meas = jax.random.normal(jax.random.PRNGKey(2), (T, 1))
    _, eq = quadrature.run(qm, qs, meas, fx, hx)
    xs_q, ps_q = quadrature.rts_smoother(qm, eq.state, eq.covariance, fx)
    phis = jnp.broadcast_to(f, (T, 2, 2))
    xs_l, ps_l = smoothing.rts_smoother(phis, q, eq.state, eq.covariance)
    np.testing.assert_allclose(np.asarray(xs_q), np.asarray(xs_l),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(ps_q), np.asarray(ps_l),
                               atol=1e-8)


def test_rts_smoother_beats_filter_nonlinear():
    """On a nonlinear arc the GH smoother's RMS beats the GH filter's."""
    rng = np.random.default_rng(11)
    T = 200
    q = jnp.array([[0.01]])
    r = jnp.array([[0.3]])
    nz = gn.noiseless(q, r)

    def fx(x):
        return 0.9 * x + 0.2 * jnp.sin(x)

    def hx(x):
        return x

    xs = np.zeros((T, 1))
    x = np.array([1.0])
    for k in range(T):
        x = 0.9 * x + 0.2 * np.sin(x) + 0.1 * rng.standard_normal(1)
        xs[k] = x
    ys = jnp.asarray(xs + np.sqrt(0.3) * rng.standard_normal((T, 1)))
    qm, qs_ = quadrature.new(jnp.array([1.0]), jnp.array([[1.0]]), nz,
                             order=5)
    _, est = quadrature.run(qm, qs_, ys, fx, hx)
    xs_sm, _ = quadrature.rts_smoother(qm, est.state, est.covariance, fx)
    rms_f = float(np.sqrt(((np.asarray(est.state) - xs) ** 2).mean()))
    rms_s = float(np.sqrt(((np.asarray(xs_sm) - xs) ** 2).mean()))
    assert rms_s < rms_f, (rms_s, rms_f)
