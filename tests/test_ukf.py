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
