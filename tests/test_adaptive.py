"""Adaptive (innovation covariance-matching) filter tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import adaptive, vanilla

from fixtures import robot1d_matrices


def _simulate(q_true_scale, r_true, steps, seed=0):
    f, g, dt = robot1d_matrices()
    h = jnp.array([[1.0, 0.0]])
    q_base = jnp.array([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]]) * 0.05
    key = jax.random.PRNGKey(seed)
    kq, kr = jax.random.split(key)
    lq = jnp.linalg.cholesky(q_true_scale * q_base)
    x = jnp.zeros(2)
    ys = []
    wk = jax.random.split(kq, steps)
    vk = jax.random.split(kr, steps)
    for k in range(steps):
        x = f @ x + lq @ jax.random.normal(wk[k], (2,))
        ys.append(h @ x + jnp.sqrt(r_true) * jax.random.normal(vk[k], (1,)))
    return f, h, q_base, jnp.stack(ys)


def test_r_adaptation_converges():
    """Filter starts with R 10x too small; the adapted R̂ must approach
    the true measurement variance."""
    r_true = 0.5
    f, h, q_base, ys = _simulate(1.0, r_true, steps=1500)
    nz = gn.noiseless(q_base, jnp.array([[r_true / 10.0]]))
    model, state, cfg = adaptive.new(jnp.zeros(2), jnp.eye(2), f, None, h, nz, window=60, mode="r")
    final, ests = adaptive.run(model, state, cfg, ys)
    r_hat_tail = float(jnp.mean(ests.r_hat[-300:, 0, 0]))
    assert 0.3 < r_hat_tail < 0.75, r_hat_tail  # true 0.5, started at 0.05


def test_adaptation_beats_misspecified_filter():
    """Against truth with 5x the modeled process noise, the adaptive
    filter's innovation consistency beats the mis-specified fixed one."""
    f, h, q_base, ys = _simulate(5.0, 0.25, steps=1200, seed=1)
    r0 = jnp.array([[0.25]])
    nz = gn.noiseless(q_base, r0)

    vmodel, vstate = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h, nz)
    _, ve = vanilla.run(vmodel, vstate, measurements=ys)

    amodel, astate, cfg = adaptive.new(jnp.zeros(2), jnp.eye(2), f, None, h, nz, window=60, mode="q")
    afinal, ae = adaptive.run(amodel, astate, cfg, ys)

    # q_scale should move toward the true x5.
    assert float(afinal.q_scale) > 1.8, float(afinal.q_scale)

    # Normalized innovation squared closer to p=1 for the adaptive run.
    def mean_nis(ests, model, r_traj=None):
        s = jnp.einsum("ij,tjk,lk->til", model.h, ests.pred_covariance, model.h)
        r = r_traj if r_traj is not None else model.noise.r
        s = s + r
        nis = jnp.einsum("ti,tij,tj->t", ests.innovation, jnp.linalg.inv(s), ests.innovation)
        return float(jnp.mean(nis[300:]))

    nis_fixed = mean_nis(ve, vmodel)
    nis_adapt = mean_nis(ae.base, amodel, ae.r_hat)
    assert abs(nis_adapt - 1.0) < abs(nis_fixed - 1.0), (nis_adapt, nis_fixed)
