"""PDAF: KF limit, no-candidate limit, and tracking-in-clutter wins."""

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import pdaf, vanilla


def _cv2d():
    dt = 0.5
    f = jnp.array([[1, 0, dt, 0], [0, 1, 0, dt],
                   [0, 0, 1, 0], [0, 0, 0, 1.0]])
    h = jnp.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0]])
    q = 1e-3 * jnp.eye(4)
    r = 0.25 * jnp.eye(2)
    x0 = jnp.zeros(4)
    p0 = jnp.diag(jnp.array([4.0, 4.0, 1.0, 1.0]))
    return f, h, q, r, x0, p0


def test_single_candidate_pd1_is_kalman():
    f, h, q, r, x0, p0 = _cv2d()
    nz = gn.noiseless(q, r)
    vm, vs = vanilla.new(x0, p0, f, None, h, nz)
    pm, ps = pdaf.new(x0, p0, f, None, h, nz, pd=1.0,
                      clutter_density=1e-6, gate=1e9)
    T = 60
    meas = jax.random.normal(jax.random.PRNGKey(0), (T, 2))
    _, ev = vanilla.run(vm, vs, meas)
    _, ep = pdaf.run(pm, ps, meas[:, None, :], jnp.ones((T, 1), bool))
    assert np.allclose(np.asarray(ep.state), np.asarray(ev.state), atol=1e-8)
    assert np.allclose(np.asarray(ep.covariance), np.asarray(ev.covariance),
                       atol=1e-8)
    assert float(jnp.min(ep.betas)) > 1.0 - 1e-9


def test_no_candidates_is_pure_prediction():
    f, h, q, r, x0, p0 = _cv2d()
    pm, ps = pdaf.new(x0, p0, f, None, h, gn.noiseless(q, r))
    st, est = pdaf.step(pm, ps, jnp.zeros((3, 2)), jnp.zeros(3, bool))
    assert np.allclose(np.asarray(est.state), 0.0)
    expect = np.asarray(f @ p0 @ f.T + q)
    assert np.allclose(np.asarray(est.covariance), expect, atol=1e-12)
    assert float(est.beta0) == 1.0 and int(est.n_gated) == 0
    # far-away candidate gated out == same pure prediction
    st2, est2 = pdaf.step(pm, ps, jnp.full((3, 2), 1e3), jnp.ones(3, bool))
    assert np.allclose(np.asarray(est2.covariance), expect, atol=1e-12)


def _clutter_scenario(key, T=150, m_max=8, pd=0.9, n_clutter=4,
                      region=12.0):
    """CV truth + detections: target measurement present w.p. pd,
    clutter uniform in a region box around the truth."""
    f, h, q, r, x0, p0 = _cv2d()
    kx, kw, kv, kd, kc = jax.random.split(key, 5)
    x = jnp.array([0.0, 0.0, 0.8, -0.5])
    lq = jnp.linalg.cholesky(q)
    ws = jax.random.normal(kw, (T, 4)) @ lq.T
    truth = [x]
    for t in range(T - 1):
        truth.append(f @ truth[-1] + ws[t])
    truth = jnp.stack(truth)
    z_true = truth[:, :2] + 0.5 * jax.random.normal(kv, (T, 2))
    detected = jax.random.uniform(kd, (T,)) < pd
    clutter = (truth[:, None, :2]
               + region * (jax.random.uniform(kc, (T, m_max, 2)) - 0.5))
    cands = clutter.at[:, 0, :].set(jnp.where(detected[:, None],
                                              z_true, clutter[:, 0, :]))
    masks = jnp.zeros((T, m_max), bool).at[:, :n_clutter + 1].set(True)
    # shuffle target slot among the first n_clutter+1 per step
    perm = jax.vmap(lambda k: jax.random.permutation(k, n_clutter + 1))(
        jax.random.split(kx, T))
    idx = jnp.arange(T)[:, None]
    cands = cands.at[idx, perm, :].set(cands[:, :n_clutter + 1, :])
    return f, h, q, r, x0, p0, truth, cands, masks


def test_pdaf_tracks_in_clutter_where_nn_kf_fails():
    """4 clutter points/frame in a 12x12 box, PD=0.9: the PDAF holds
    lock; a nearest-neighbor KF (greedy hard association) picks wrong
    returns and its RMS is measurably worse."""
    f, h, q, r, x0, p0, truth, cands, masks = _clutter_scenario(
        jax.random.PRNGKey(1))
    nz = gn.noiseless(q, r)
    pm, ps = pdaf.new(x0, p0, f, None, h, nz, pd=0.9,
                      clutter_density=5.0 / 144.0, gate=16.0)
    _, ep = pdaf.run(pm, ps, cands, masks)

    # greedy NN baseline through the same vanilla core
    vm, vs = vanilla.new(x0, p0, f, None, h, nz)

    def nn_body(carry, xs):
        c, mask = xs
        x_pred = vm.f @ carry.x
        d2 = jnp.sum((c - x_pred @ vm.h.T) ** 2, axis=1)
        d2 = jnp.where(mask, d2, jnp.inf)
        z = c[jnp.argmin(d2)]
        return vanilla.step(vm, carry, z)

    _, en = jax.lax.scan(nn_body, vs, (cands, masks))

    err_p = np.asarray(ep.state)[:, :2] - np.asarray(truth)[:, :2]
    err_n = np.asarray(en.state)[:, :2] - np.asarray(truth)[:, :2]
    rms_p = float(np.sqrt((err_p[30:] ** 2).mean()))
    rms_n = float(np.sqrt((err_n[30:] ** 2).mean()))
    assert rms_p < 1.0, rms_p  # lock held (clutter box is 12 wide)
    assert rms_p < 0.8 * rms_n, (rms_p, rms_n)
    # association probabilities are a distribution
    tot = np.asarray(ep.beta0) + np.asarray(ep.betas).sum(axis=1)
    assert np.allclose(tot, 1.0, atol=1e-9)


def test_pdaf_covariance_honest_in_clutter():
    """Average position NEES over clutter realizations stays
    chi-square-plausible (the spread-of-innovations term is what keeps
    it honest; without it the filter would be overconfident)."""
    draws = 8
    nees = []
    for i in range(draws):
        f, h, q, r, x0, p0, truth, cands, masks = _clutter_scenario(
            jax.random.PRNGKey(100 + i))
        pm, ps = pdaf.new(x0, p0, f, None, h, gn.noiseless(q, r), pd=0.9,
                          clutter_density=5.0 / 144.0, gate=16.0)
        _, ep = pdaf.run(pm, ps, cands, masks)
        err = np.asarray(ep.state) - np.asarray(truth)
        pinv = np.linalg.inv(np.asarray(ep.covariance))
        nees.append(np.einsum("ti,tij,tj->t", err, pinv, err)[30:].mean())
    m = float(np.mean(nees))
    assert 1.5 < m < 9.0, (m, nees)  # n = 4
