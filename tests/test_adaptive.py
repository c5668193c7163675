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


# -------------------- VB adaptive R (Särkkä-Nummenmaa) --------------------


def test_vb_r_converges_from_wrong_prior():
    """Prior mean R is 10x too small with weak strength; the IG
    posterior mean must land near the true variance."""
    r_true = 0.5
    f, h, q_base, ys = _simulate(1.0, r_true, steps=1500)
    nz = gn.noiseless(q_base, jnp.array([[r_true / 10.0]]))
    model, state, cfg = adaptive.vb_new(
        jnp.zeros(2), jnp.eye(2), f, None, h, nz,
        rho=0.99, prior_strength=3.0)
    _, ests = adaptive.vb_run(model, state, cfg, ys)
    r_tail = float(jnp.mean(ests.r_hat[-300:, 0]))
    assert 0.35 < r_tail < 0.7, r_tail


def test_vb_tracks_r_jump():
    """Measurement variance jumps 9x mid-run; the forgetting factor
    lets the posterior re-converge to the new level."""
    r_lo, r_hi = 0.2, 1.8
    f, h, q_base, ys_lo = _simulate(1.0, r_lo, steps=700, seed=2)
    _, _, _, ys_hi = _simulate(1.0, r_hi, steps=700, seed=3)
    ys = jnp.concatenate([ys_lo, ys_hi])
    nz = gn.noiseless(q_base, jnp.array([[r_lo]]))
    model, state, cfg = adaptive.vb_new(
        jnp.zeros(2), jnp.eye(2), f, None, h, nz,
        rho=0.97, prior_strength=5.0)
    _, ests = adaptive.vb_run(model, state, cfg, ys)
    before = float(jnp.mean(ests.r_hat[500:700, 0]))
    after = float(jnp.mean(ests.r_hat[-200:, 0]))
    assert before < 2.0 * r_lo, before
    assert 0.5 * r_hi < after < 1.6 * r_hi, after


def test_vb_strong_prior_is_plain_kf():
    """An overwhelming prior pinned at the true R with rho=1 makes the
    VB filter numerically indistinguishable from the fixed-R CKF."""
    r_true = 0.4
    f, h, q_base, ys = _simulate(1.0, r_true, steps=120, seed=4)
    nz = gn.noiseless(q_base, jnp.array([[r_true]]))
    vm, vs = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h, nz)
    _, ev = vanilla.run(vm, vs, measurements=ys)
    model, state, cfg = adaptive.vb_new(
        jnp.zeros(2), jnp.eye(2), f, None, h, nz,
        rho=1.0, prior_strength=1e9)
    _, evb = adaptive.vb_run(model, state, cfg, ys)
    np.testing.assert_allclose(np.asarray(evb.base.state),
                               np.asarray(ev.state), atol=1e-5)
    np.testing.assert_allclose(np.asarray(evb.base.covariance),
                               np.asarray(ev.covariance), atol=1e-5)


def test_vb_masked_step_freezes_posterior():
    f, h, q_base, ys = _simulate(1.0, 0.5, steps=10, seed=5)
    nz = gn.noiseless(q_base, jnp.array([[0.5]]))
    model, state, cfg = adaptive.vb_new(
        jnp.zeros(2), jnp.eye(2), f, None, h, nz, rho=0.95)
    st, est = adaptive.vb_step(model, state, cfg, ys[0],
                               has=jnp.bool_(False))
    # IG decayed but not data-updated; state == pure prediction.
    np.testing.assert_allclose(np.asarray(st.ig_a),
                               0.95 * np.asarray(state.ig_a), atol=1e-12)
    np.testing.assert_allclose(np.asarray(st.ig_b),
                               0.95 * np.asarray(state.ig_b), atol=1e-12)
    x_pred, p_pred = vanilla.predict(model, state.kf)
    np.testing.assert_allclose(np.asarray(st.kf.x), np.asarray(x_pred),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(st.kf.p), np.asarray(p_pred),
                               atol=1e-12)
