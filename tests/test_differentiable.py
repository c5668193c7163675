"""Differentiable filtering: gradients flow through the whole scan, so
noise covariances can be *estimated* by maximizing the innovations
likelihood — a capability the mutable Go reference cannot express."""

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import vanilla

from fixtures import robot1d_matrices


def _setup(q_scale_true=1.0, r_scale_true=1.0, steps=400, seed=0):
    f, g, dt = robot1d_matrices()
    h = jnp.array([[1.0, 0.0]])
    q_base = jnp.array([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]]) * 0.05
    r_base = jnp.array([[0.25]])
    key = jax.random.PRNGKey(seed)
    kq, kr = jax.random.split(key)
    # Simulate truth + measurements with the true scales.
    lq = jnp.linalg.cholesky(q_scale_true * q_base)
    x = jnp.zeros(2)
    xs, ys = [], []
    wkeys = jax.random.split(kq, steps)
    vkeys = jax.random.split(kr, steps)
    for k in range(steps):
        x = f @ x + lq @ jax.random.normal(wkeys[k], (2,))
        y = h @ x + jnp.sqrt(r_scale_true * r_base[0, 0]) * jax.random.normal(
            vkeys[k], (1,)
        )
        xs.append(x)
        ys.append(y)
    return f, h, q_base, r_base, jnp.stack(ys)


def test_gradients_flow_through_run():
    f, h, q_base, r_base, ys = _setup()

    def nll(log_scales):
        qs, rs = jnp.exp(log_scales)
        nz = gn.noiseless(qs * q_base, rs * r_base)
        model, state0 = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h, nz)
        _, ests = vanilla.run(model, state0, measurements=ys)
        return -vanilla.innovations_log_likelihood(model, ests)

    g = jax.grad(nll)(jnp.zeros(2))
    assert g.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).min()) > 0  # both parameters influence the NLL


def test_noise_scales_recovered_by_gradient_descent():
    """Maximum-likelihood recovery of the process/measurement noise
    scales from data alone (true scales 2.0 / 0.5)."""
    f, h, q_base, r_base, ys = _setup(q_scale_true=2.0, r_scale_true=0.5, steps=800)

    @jax.jit
    def nll(log_scales):
        qs, rs = jnp.exp(log_scales)
        nz = gn.noiseless(qs * q_base, rs * r_base)
        model, state0 = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h, nz)
        _, ests = vanilla.run(model, state0, measurements=ys)
        return -vanilla.innovations_log_likelihood(model, ests)

    val_grad = jax.jit(jax.value_and_grad(nll))
    params = jnp.zeros(2)  # start at scales (1, 1)
    lr = 2e-3
    for _ in range(150):
        _, g = val_grad(params)
        params = params - lr * g
    scales = np.exp(np.asarray(params))
    assert 1.4 < scales[0] < 2.8, scales  # true 2.0
    assert 0.35 < scales[1] < 0.7, scales  # true 0.5
    # Fitted model beats the mis-specified start in likelihood.
    assert float(nll(params)) < float(nll(jnp.zeros(2)))
