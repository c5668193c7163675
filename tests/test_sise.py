"""SISE (Gillijns-De Moor) pins: exact equivalence with the
infinite-variance augmented-state KF (the unknown-input identity),
unbiasedness + NEES under an ADVERSARIAL deterministic input where the
vanilla KF is biased by many sigma, input recovery with calibrated Pd,
and the one-step-observability rank guard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import sise, vanilla


def _cv():
    dt = 1.0
    f = np.array([[1.0, dt], [0.0, 1.0]])
    q = 0.02 * np.array([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]])
    h = np.eye(2)
    r = np.diag([0.25, 0.09])
    e = np.array([[0.5], [1.0]])  # disturbance enters like an accel
    return f, q, h, r, e


def _simulate(rng, f, q, h, r, e, d_seq, T):
    lq, lr = np.linalg.cholesky(q), np.linalg.cholesky(r)
    x = np.zeros(2)
    xs, ys = [], []
    for k in range(T):
        x = f @ x + e @ np.atleast_1d(d_seq[k]) + lq @ rng.standard_normal(2)
        xs.append(x.copy())
        ys.append(h @ x + lr @ rng.standard_normal(2))
    return np.stack(xs), np.stack(ys)


def test_sise_equals_infinite_variance_augmented_kf():
    """The identity that certifies every constant at once: modeling d
    as white noise with variance -> infinity in an augmented-state KF
    reproduces SISE's state AND input estimates.  Q_d = 1e8 matches
    to ~1e-4 relative in f64 (1e10 loses ~2 digits to cancellation in
    the [[Q + V E E', V E],[V E', V]] blocks)."""
    rng = np.random.default_rng(0)
    f, q, h, r, e = _cv()
    T = 40
    d_seq = 0.8 * np.sin(0.3 * np.arange(T))
    _, ys = _simulate(rng, f, q, h, r, e, d_seq, T)

    m, s = sise.new(jnp.zeros(2), jnp.eye(2), f, None, h, e,
                    gn.noiseless(jnp.asarray(q), jnp.asarray(r)))
    _, est = sise.run(m, s, jnp.asarray(ys))

    # augmented system z_k = [x_k; d_{k-1}] with d white, variance
    # V -> inf, entering as PROCESS NOISE with cross-covariance:
    # z_{k+1} = [[F, 0],[0, 0]] z_k + [E; I] d_k + [w; 0], so
    # Qz = [[Q + V E E', V E],[V E', V]].  This ordering puts d_{k-1}
    # in the slot y_k actually observes (the naive [[F, E],[0, 0]]
    # transition leaves the filtered d-slot permanently at 0: y_k
    # carries no information about d_k — measured, the d estimates
    # differ by O(|d|) there while states still agree).
    big = 1e8
    fz = np.block([[f, np.zeros((2, 1))], [np.zeros((1, 3))]])
    qz = np.block([[q + big * (e @ e.T), big * e],
                   [big * e.T, big * np.eye(1)]])
    hz = np.hstack([h, np.zeros((2, 1))])
    p0z = np.block([[np.eye(2), np.zeros((2, 1))],
                    [np.zeros((1, 2)), big * np.eye(1)]])
    ma, sa = vanilla.new(jnp.zeros(3), jnp.asarray(p0z), jnp.asarray(fz),
                         None, jnp.asarray(hz),
                         gn.noiseless(jnp.asarray(qz), jnp.asarray(r)))
    _, ea = vanilla.run(ma, sa, jnp.asarray(ys))
    np.testing.assert_allclose(np.asarray(est.state),
                               np.asarray(ea.state)[:, :2],
                               rtol=1e-4, atol=1e-4)
    # the augmented filter's d-slot after the update at k IS
    # E[d_{k-1} | Y_k] — exactly SISE's input estimate
    np.testing.assert_allclose(np.asarray(est.input)[:, 0],
                               np.asarray(ea.state)[:, 2],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(est.covariance),
                               np.asarray(ea.covariance)[:, :2, :2],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(est.input_covariance)[:, 0, 0],
                               np.asarray(ea.covariance)[:, 2, 2],
                               rtol=1e-3)


def test_sise_unbiased_under_adversarial_input_where_kf_is_biased():
    """A 1.5-unit step disturbance at k=20: the vanilla KF (d = 0
    assumption) develops a persistent multi-sigma velocity bias; SISE
    stays unbiased (|bias| < 3 MC-sigma) with NEES ~ n and recovers
    the step in d-hat."""
    f, q, h, r, e = _cv()
    T = 60
    d_seq = np.where(np.arange(T) >= 20, 1.5, 0.0)
    runs = 300
    m, s = sise.new(jnp.zeros(2), jnp.eye(2), f, None, h, e,
                    gn.noiseless(jnp.asarray(q), jnp.asarray(r)))
    mk, sk = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h,
                         gn.noiseless(jnp.asarray(q), jnp.asarray(r)))
    rng = np.random.default_rng(100)
    xs_all, ys_all = zip(*[_simulate(rng, f, q, h, r, e, d_seq, T)
                           for _ in range(runs)])
    xs_all, ys_all = np.stack(xs_all), np.stack(ys_all)
    es = jax.vmap(lambda ys: sise.run(m, s, ys)[1])(jnp.asarray(ys_all))
    ek = jax.vmap(lambda ys: vanilla.run(mk, sk, ys)[1])(
        jnp.asarray(ys_all))
    err_s = np.asarray(es.state) - xs_all
    err_k = np.asarray(ek.state) - xs_all
    pe = np.asarray(es.covariance)[:, 30:]
    ee = err_s[:, 30:]
    nees = np.einsum("rki,rkij,rkj->rk", ee,
                     np.linalg.inv(pe), ee)
    d20 = np.asarray(es.input)[:, 30:, 0]
    bias_s = err_s[:, 30:, :].mean(axis=0)
    bias_k = err_k[:, 30:, :].mean(axis=0)
    mc_sig = err_s[:, 30:, :].std(axis=0) / np.sqrt(runs)
    assert (np.abs(bias_s) < 4.0 * mc_sig).mean() > 0.9, (
        np.abs(bias_s / mc_sig).max())
    # the KF's velocity bias is real and large
    assert np.abs(bias_k[:, 1]).max() > 10 * np.abs(bias_s[:, 1]).max()
    nees_m = float(np.mean(nees))
    assert 1.7 < nees_m < 2.4, nees_m
    # d-hat recovers the step, Pd-calibrated
    d_mean = np.mean(d20)
    assert abs(d_mean - 1.5) < 0.05, d_mean


def test_sise_rank_guard():
    f, q, h, r, e = _cv()
    h1 = np.array([[1.0, 0.0]])  # position-only sensor
    # E enters velocity only: H E = 0 -> not one-step observable
    e_bad = np.array([[0.0], [1.0]])
    with pytest.raises(ValueError, match="one-step"):
        sise.new(jnp.zeros(2), jnp.eye(2), f, None, h1, e_bad,
                 gn.noiseless(jnp.asarray(q), jnp.asarray([[0.25]])))
    with pytest.raises(ValueError, match="e must be"):
        sise.new(jnp.zeros(2), jnp.eye(2), f, None, h, np.zeros((3, 1)),
                 gn.noiseless(jnp.asarray(q), jnp.asarray(r)))
