"""UKF tests: exactness on linear systems (the unscented transform is
exact for affine maps), nonlinear tracking sanity, scan driver."""

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import ukf, vanilla

from fixtures import midterm2_system, random_spd


def test_matches_ckf_on_linear_system():
    """On linear f/h the UKF must equal the CKF to near machine
    precision (UT is exact through affine functions)."""
    f, g, h, q, r, x0, p0 = midterm2_system()
    nz = gn.noiseless(q, r)
    vmodel, vstate = vanilla.new(x0, p0, f, None, h, nz)
    umodel, ustate = ukf.new(x0, p0, nz, alpha=1.0, beta=0.0, kappa=3.0 - 3.0)

    fx = lambda x: f @ x
    hx = lambda x: h @ x
    rng = np.random.default_rng(61)
    for k in range(25):
        y = jnp.asarray(rng.standard_normal(1))
        vstate, vest = vanilla.step(vmodel, vstate, y)
        ustate, uest = ukf.step(umodel, ustate, y, fx, hx)
        np.testing.assert_allclose(
            np.asarray(uest.state), np.asarray(vest.state), rtol=1e-7, atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(uest.covariance),
            np.asarray(vest.covariance),
            rtol=1e-6,
            atol=1e-9,
        )


def test_nonlinear_range_bearing_tracking():
    """2-D constant-velocity target tracked by range+bearing from the
    origin: the UKF must converge and stay chi-square consistent."""
    dt = 0.5
    f = jnp.array(
        [[1, 0, dt, 0], [0, 1, 0, dt], [0, 0, 1, 0], [0, 0, 0, 1.0]]
    )
    q = 1e-4 * jnp.eye(4)
    r = jnp.diag(jnp.array([0.01, 1e-4]))  # range^2, bearing^2

    def fx(x):
        return f @ x

    def hx(x):
        rng = jnp.sqrt(x[0] ** 2 + x[1] ** 2)
        return jnp.stack([rng, jnp.arctan2(x[1], x[0])])

    rng = np.random.default_rng(62)
    x_true = np.array([10.0, 5.0, -0.5, 0.3])
    truth, ys = [], []
    lq = np.linalg.cholesky(np.asarray(q))
    for k in range(80):
        x_true = np.asarray(f) @ x_true + lq @ rng.standard_normal(4)
        truth.append(x_true.copy())
        y = np.asarray(hx(jnp.asarray(x_true))) + np.sqrt(
            np.diag(np.asarray(r))
        ) * rng.standard_normal(2)
        ys.append(y)
    truth = np.stack(truth)
    ys = jnp.asarray(np.stack(ys))

    x0 = jnp.asarray(truth[0] + np.array([1.0, -1.0, 0.2, -0.2]))
    p0 = jnp.diag(jnp.array([4.0, 4.0, 0.25, 0.25]))
    model, state = ukf.new(x0, p0, gn.noiseless(q, r))
    _, ests = ukf.run(model, state, ys, fx, hx)

    err = np.asarray(ests.state) - truth
    # Converged position error well under the initial 1.4-unit offset.
    tail = np.sqrt((err[40:, :2] ** 2).sum(1)).mean()
    assert tail < 0.15, tail
    # Covariance stays consistent: NEES over the tail ~ n (loose gate).
    pinv = np.linalg.inv(np.asarray(ests.covariance[40:]))
    nees = np.einsum("ti,tij,tj->t", err[40:], pinv, err[40:])
    assert 1.0 < nees.mean() < 10.0, nees.mean()


def test_gradients_flow_through_ukf():
    """The UKF is differentiable end-to-end (sigma points, cholesky,
    gain): gradients of an innovation loss w.r.t. the noise scale are
    finite and nonzero — UKF-based ML fitting works like the linear
    case (test_differentiable.py)."""
    f, g, h, q, r, x0, p0 = midterm2_system()
    fx = lambda x: f @ x
    hx = lambda x: h @ x
    ys = jnp.asarray(np.random.default_rng(3).standard_normal((10, 1)))

    def loss(log_qs):
        nz = gn.noiseless(jnp.exp(log_qs) * (q + 1e-12 * jnp.eye(3)), r)
        model, state = ukf.new(x0, p0, nz)
        _, ests = ukf.run(model, state, ys, fx, hx)
        return jnp.sum(ests.innovation**2)

    gval = jax.grad(loss)(jnp.asarray(0.0))
    assert bool(jnp.isfinite(gval))
    assert abs(float(gval)) > 0


def test_vmap_over_ensemble():
    f, g, h, q, r, x0, p0 = midterm2_system()
    nz = gn.noiseless(q, r)
    model, state = ukf.new(x0, p0, nz)
    fx = lambda x: f @ x
    hx = lambda x: h @ x
    ys = jnp.zeros((6, 1))

    def one(x_init):
        _, ests = ukf.run(model, state._replace(x=x_init), ys, fx, hx)
        return ests.state

    out = jax.vmap(one)(jnp.stack([x0, x0 + 0.5]))
    assert out.shape == (2, 6, 3)


def _range_bearing_system():
    """Shared nonlinear fixture: 2-D CV target, range+bearing sensor."""
    dt = 0.5
    f = jnp.array(
        [[1, 0, dt, 0], [0, 1, 0, dt], [0, 0, 1, 0], [0, 0, 0, 1.0]]
    )
    q = 1e-4 * jnp.eye(4)
    r = jnp.diag(jnp.array([0.01, 1e-4]))

    def fx(x):
        return f @ x

    def hx(x):
        rng_ = jnp.sqrt(x[0] ** 2 + x[1] ** 2)
        return jnp.stack([rng_, jnp.arctan2(x[1], x[0])])

    x0 = jnp.array([10.0, 5.0, -0.5, 0.3])
    p0 = jnp.diag(jnp.array([4.0, 4.0, 0.25, 0.25]))
    return f, None, q, r, x0, p0, fx, hx


def test_masked_step_equals_pure_prediction():
    """ukf.step(has=False) must reduce exactly to the unscented time
    update — the masked-scan convention shared with srif/hybrid."""
    f, h, q, r, x0, p0, fx, hx = _range_bearing_system()
    model, state = ukf.new(x0, p0, gn.noiseless(q, r))
    meas = jnp.array([1.0, 0.5])
    st_masked, est_masked = ukf.step(model, state, meas, fx, hx,
                                     has=jnp.asarray(False))
    x_pred, p_pred, _, _ = ukf.predict(model, state, fx)
    np.testing.assert_allclose(np.asarray(st_masked.x), np.asarray(x_pred),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_masked.p), np.asarray(p_pred),
                               atol=1e-12)
    assert float(jnp.abs(est_masked.innovation).max()) == 0.0
    assert float(jnp.abs(est_masked.gain).max()) == 0.0
    # has=True must equal the unmasked step.
    st_open, est_open = ukf.step(model, state, meas, fx, hx,
                                 has=jnp.asarray(True))
    st_plain, est_plain = ukf.step(model, state, meas, fx, hx)
    np.testing.assert_allclose(np.asarray(st_open.x), np.asarray(st_plain.x),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_open.p), np.asarray(st_plain.p),
                               atol=1e-12)


def test_run_with_measurement_gaps():
    """ukf.run(meas_masks=...) over a gap-ridden stream: covariance
    grows through gaps and contracts on measurement steps."""
    f, h, q, r, x0, p0, fx, hx = _range_bearing_system()
    model, state = ukf.new(x0, p0, gn.noiseless(q, r))
    t = 12
    key = jax.random.PRNGKey(0)
    meas = 0.1 * jax.random.normal(key, (t, 2)) + jnp.array([1.0, 0.5])
    masks = jnp.asarray(np.arange(t) % 3 == 0)  # measurement every 3rd
    final, ests = ukf.run(model, state, meas, fx, hx, meas_masks=masks)
    assert bool(jnp.all(jnp.isfinite(ests.state)))
    tr = np.trace(np.asarray(ests.covariance), axis1=1, axis2=2)
    m = np.asarray(masks)
    # Gap steps only add Q; measurement steps subtract K S K^T.
    assert (np.diff(tr)[~m[1:]] > 0).all()
    assert float(np.abs(np.asarray(ests.innovation)[~m]).max()) == 0.0


def test_urts_equals_linear_rts_on_linear_model():
    """Unscented RTS == linear RTS when fx is linear (the unscented
    transform is exact for affine maps)."""
    import numpy as np

    from gokalman_tpu.filters import smoothing

    f = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    q = jnp.array([[1e-4, 0.0], [0.0, 1e-3]])
    r = jnp.array([[0.05]])
    noise = gn.awgn(q, r)
    rng = np.random.default_rng(3)
    ys = jnp.asarray(0.4 + 0.2 * rng.standard_normal((25, 1)))

    model, st = ukf.new(jnp.array([0.2, -0.1]), jnp.eye(2), noise)
    fx = lambda x: f @ x
    hx = lambda x: h @ x
    _, ests = ukf.run(model, st, ys, fx, hx)

    xs_u, ps_u = ukf.rts_smoother(model, ests.state, ests.covariance, fx)
    phis = jnp.broadcast_to(f, (25, 2, 2))
    xs_l, ps_l = smoothing.rts_smoother(phis, q, ests.state, ests.covariance)
    np.testing.assert_allclose(xs_u, xs_l, atol=1e-9)
    np.testing.assert_allclose(ps_u, ps_l, atol=1e-9)


def test_urts_beats_filter_on_nonlinear_track():
    """Smoothed RMS must beat filtered RMS over a nonlinear arc."""
    import numpy as np

    dt = 0.1

    def fx(x):
        return jnp.array([x[0] + dt * x[1], x[1] - dt * 0.3 * x[0] ** 3])

    def hx(x):
        return jnp.array([jnp.sqrt(1.0 + x[0] ** 2)])

    q = 1e-5 * jnp.eye(2)
    r = jnp.array([[1e-3]])
    noise = gn.awgn(q, r)

    rng = np.random.default_rng(5)
    xs = [jnp.array([1.2, -0.4])]
    for _ in range(60):
        xs.append(fx(xs[-1]))
    truth = jnp.stack(xs[1:])
    ys = jax.vmap(hx)(truth) + jnp.asarray(
        rng.standard_normal((60, 1))) * jnp.sqrt(r[0, 0])

    model, st = ukf.new(jnp.array([1.6, 0.0]),
                        jnp.diag(jnp.array([0.5, 0.25])), noise)
    _, ests = ukf.run(model, st, ys, fx, hx)
    xs_s, ps_s = ukf.rts_smoother(model, ests.state, ests.covariance, fx)

    rms_f = float(jnp.sqrt(jnp.mean((ests.state - truth) ** 2)))
    rms_s = float(jnp.sqrt(jnp.mean((xs_s - truth) ** 2)))
    assert rms_s < 0.9 * rms_f, (rms_s, rms_f)
    # Covariances stay PSD-ish and bounded by the filtered ones on
    # average (smoothing never increases uncertainty in trace).
    assert float(jnp.mean(jnp.trace(ps_s, axis1=1, axis2=2))) <= float(
        jnp.mean(jnp.trace(ests.covariance, axis1=1, axis2=2))) + 1e-12


def test_cubature_params_reproduce_spherical_radial_rule():
    """UKF with cubature_params == the third-degree spherical-radial
    rule: zero center weights, 2n points at sqrt(n)*columns, uniform
    1/(2n) weights; and the resulting filter propagates moments of a
    linear system exactly (same as any valid rule)."""
    import numpy as np

    from gokalman_tpu.filters.ukf import (
        Params, _weights, cubature_params, sigma_points,
    )

    n = 3
    prm = cubature_params()
    lam, wm, wc = _weights(n, prm, jnp.float64)
    assert lam == 0.0
    np.testing.assert_allclose(wm[0], 0.0, atol=1e-15)
    np.testing.assert_allclose(wc[0], 0.0, atol=1e-15)
    np.testing.assert_allclose(wm[1:], 1.0 / (2 * n), atol=1e-15)
    np.testing.assert_allclose(wc[1:], 1.0 / (2 * n), atol=1e-15)

    p = jnp.diag(jnp.array([4.0, 1.0, 0.25]))
    pts = sigma_points(jnp.zeros(n), p, prm)
    # Non-center points sit at +- sqrt(n) * chol(P) columns.
    np.testing.assert_allclose(
        pts[1:4], jnp.sqrt(float(n)) * jnp.linalg.cholesky(p).T, atol=1e-12
    )

    # The cubature-parameterized filter equals the exact KF on a linear
    # model (moment exactness of the rule).
    f = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    q = jnp.diag(jnp.array([1e-4, 1e-3]))
    r = jnp.array([[0.05]])
    noise = gn.noiseless(q, r)
    ys = jnp.asarray(np.random.default_rng(2).standard_normal((15, 1)))
    model, st = ukf.new(jnp.zeros(2), jnp.eye(2), noise,
                        **cubature_params()._asdict())
    _, u_est = ukf.run(model, st, ys, lambda x: f @ x, lambda x: h @ x)
    vm, vst = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h, noise)
    _, kf_est = vanilla.run(vm, vst, measurements=ys)
    np.testing.assert_allclose(u_est.state, kf_est.state, atol=1e-9)
    np.testing.assert_allclose(u_est.covariance, kf_est.covariance, atol=1e-9)


def test_urts_with_controls_matches_linear_rts():
    """The smoother's controls alignment (controls[k+1] drives k->k+1)
    against the linear RTS on a controlled affine system."""
    import numpy as np

    from gokalman_tpu.filters import smoothing

    f = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    g = jnp.array([[0.005], [0.1]])
    h = jnp.array([[1.0, 0.0]])
    q = jnp.diag(jnp.array([1e-4, 1e-3]))
    r = jnp.array([[0.05]])
    noise = gn.awgn(q, r)
    rng = np.random.default_rng(8)
    t = 20
    ys = jnp.asarray(0.3 * rng.standard_normal((t, 1)))
    us = jnp.asarray(rng.standard_normal((t, 1)))

    fx = lambda x, u: f @ x + g @ u
    hx = lambda x: h @ x
    model, st = ukf.new(jnp.zeros(2), jnp.eye(2), noise)
    _, ests = ukf.run(model, st, ys, fx, hx, controls=us)
    xs_u, ps_u = ukf.rts_smoother(model, ests.state, ests.covariance, fx,
                                  controls=us)
    # Linear RTS: the control enters the prediction mean; for affine
    # systems the RTS gain/covariance are control-independent, and the
    # mean recursion matches because x_next - x_pred subtracts it out.
    phis = jnp.broadcast_to(f, (t, 2, 2))
    xs_l, ps_l = smoothing.rts_smoother(phis, q, ests.state,
                                        ests.covariance)
    np.testing.assert_allclose(ps_u, ps_l, atol=1e-9)
    # Means: URTS subtracts x_pred = f x + g u; the linear RTS predicts
    # f x only, so they differ unless the control term cancels — the
    # correct smoother is the URTS one.  Verify it against an explicit
    # per-step backward recursion with controls.
    x_sm = [None] * t
    p_sm = [None] * t
    x_sm[-1], p_sm[-1] = ests.state[-1], ests.covariance[-1]
    for k in range(t - 2, -1, -1):
        x_k, p_k = ests.state[k], ests.covariance[k]
        x_pred = f @ x_k + g @ us[k + 1]
        p_pred = f @ p_k @ f.T + q
        c = jnp.linalg.solve(p_pred, (f @ p_k.T)).T
        x_sm[k] = x_k + c @ (x_sm[k + 1] - x_pred)
        p_sm[k] = p_k + c @ (p_sm[k + 1] - p_pred) @ c.T
    np.testing.assert_allclose(xs_u, jnp.stack(x_sm), atol=1e-8)


def test_iplf_one_iteration_is_ukf():
    """The first IPLF sweep linearizes at the prior — algebraically THE
    standard UKF update (gain, posterior, covariance identical)."""
    nz = gn.noiseless(0.01 * jnp.eye(2), jnp.array([[0.09]]))
    um, us = ukf.new(jnp.array([1.0, 0.5]), 0.4 * jnp.eye(2), nz)

    def fx(x):
        return jnp.array([x[0] + 0.1 * jnp.sin(x[1]), 0.95 * x[1]])

    def hx(x):
        return jnp.array([jnp.linalg.norm(x)])

    _, e1 = ukf.step(um, us, jnp.array([1.4]), fx, hx)
    _, e2 = ukf.step_iplf(um, us, jnp.array([1.4]), fx, hx, iters=1)
    np.testing.assert_allclose(np.asarray(e2.state), np.asarray(e1.state),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(e2.covariance),
                               np.asarray(e1.covariance), atol=1e-12)
    np.testing.assert_allclose(np.asarray(e2.gain), np.asarray(e1.gain),
                               atol=1e-12)


def test_iplf_beats_ukf_on_informative_nonlinear_measurement():
    """Cubic sensor y = 0.1x³, sharp R, wide prior: the posterior lands
    far from the prior, so the UKF's prior-point SLR uses the wrong
    slope; re-linearizing at the posterior (8 sweeps) cuts RMSE ~2x
    (measured 0.29 vs 0.55 over 150 draws)."""
    rng = np.random.default_rng(1)
    sig = 0.05
    idf = lambda x: x

    def hx(x):
        return 0.1 * x**3

    errs_u, errs_i = [], []
    for _ in range(150):
        xt = np.array([1.5 + rng.standard_normal()])
        y = 0.1 * xt**3 + sig * rng.standard_normal(1)
        nz1 = gn.noiseless(1e-12 * jnp.eye(1), jnp.array([[sig**2]]))
        um1, us1 = ukf.new(jnp.array([1.5]), jnp.eye(1), nz1)
        _, eu = ukf.step(um1, us1, jnp.asarray(y), idf, hx)
        _, ei = ukf.step_iplf(um1, us1, jnp.asarray(y), idf, hx, iters=8)
        errs_u.append(float(eu.state[0] - xt[0]) ** 2)
        errs_i.append(float(ei.state[0] - xt[0]) ** 2)
    rmse_u = np.sqrt(np.mean(errs_u))
    rmse_i = np.sqrt(np.mean(errs_i))
    assert rmse_i < 0.65 * rmse_u, (rmse_i, rmse_u)


def test_iplf_masked_step_is_prediction():
    nz = gn.noiseless(0.01 * jnp.eye(2), jnp.array([[0.09]]))
    um, us = ukf.new(jnp.array([1.0, 0.5]), 0.4 * jnp.eye(2), nz)

    def fx(x):
        return 0.98 * x

    def hx(x):
        return jnp.array([jnp.linalg.norm(x)])

    st, est = ukf.step_iplf(um, us, jnp.array([5.0]), fx, hx,
                            has=jnp.bool_(False), iters=4)
    x_pred, p_pred, _, _ = ukf.predict(um, us, fx)
    np.testing.assert_allclose(np.asarray(st.x), np.asarray(x_pred),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(st.p), np.asarray(p_pred),
                               atol=1e-12)


def test_iplf_run_equals_loop():
    nz = gn.noiseless(0.01 * jnp.eye(2), jnp.array([[0.09]]))
    um, us = ukf.new(jnp.array([1.0, 0.5]), 0.4 * jnp.eye(2), nz)

    def fx(x):
        return jnp.array([x[0] + 0.1 * jnp.sin(x[1]), 0.95 * x[1]])

    def hx(x):
        return jnp.array([jnp.linalg.norm(x)])

    T = 15
    ys = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(0), (T, 1))
    _, est = ukf.run_iplf(um, us, ys, fx, hx, iters=3)
    st = us
    for k in range(T):
        st, e = ukf.step_iplf(um, st, ys[k], fx, hx, iters=3)
        np.testing.assert_allclose(np.asarray(est.state[k]),
                                   np.asarray(e.state), atol=1e-10)


def test_iplf_masked_step_zeroes_measurement_field():
    """Masked-scan convention parity with ukf.step: est.measurement is
    zeroed when has=False (review-pass consistency finding)."""
    nz = gn.noiseless(0.01 * jnp.eye(2), jnp.array([[0.09]]))
    um, us = ukf.new(jnp.array([1.0, 0.5]), 0.4 * jnp.eye(2), nz)
    fx = lambda x: 0.98 * x
    hx = lambda x: jnp.array([jnp.linalg.norm(x)])
    _, e_iplf = ukf.step_iplf(um, us, jnp.array([5.0]), fx, hx,
                              has=jnp.bool_(False), iters=3)
    _, e_ukf = ukf.step(um, us, jnp.array([5.0]), fx, hx,
                        has=jnp.bool_(False))
    np.testing.assert_allclose(np.asarray(e_iplf.measurement), 0.0,
                               atol=1e-15)
    np.testing.assert_allclose(np.asarray(e_ukf.measurement), 0.0,
                               atol=1e-15)
