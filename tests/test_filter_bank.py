"""Fused time-varying tier: filter_bank and TV mc_chi_square.

The jerkcar-class workload (per-step padded H/R schedule,
examples/jerkcar/main.go:141-158) must run at ensemble speed with no
loss of exactness: filter_bank shares one covariance path across S
streams and must match vanilla.run stream-for-stream."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import vanilla
from gokalman_tpu.ops import ensemble as ens


def _tv_system(rng, t=60, n=4, p=2):
    f = jnp.asarray(np.eye(n) + 0.05 * rng.standard_normal((n, n)))
    g = jnp.asarray(rng.standard_normal((n, 1)) * 0.1)
    q = jnp.asarray(0.01 * np.eye(n))
    h_full = jnp.asarray(rng.standard_normal((p, n)))
    r_full = jnp.asarray(np.diag(rng.uniform(0.1, 0.5, p)))
    x0 = jnp.zeros(n)
    p0 = jnp.eye(n)
    # Every 5th step uses both rows; otherwise only row 0.
    two = (np.arange(t) + 1) % 5 == 0
    hs = jnp.asarray(np.where(two[:, None, None], h_full,
                              np.concatenate([h_full[:1], np.zeros((1, n))])))
    rs = jnp.broadcast_to(r_full, (t, p, p))
    masks = jnp.asarray(np.stack([np.ones(t, bool), two], axis=1))
    controls = jnp.asarray(np.sin(0.1 * np.arange(t)))[:, None]
    return f, g, q, h_full, r_full, x0, p0, hs, rs, masks, controls


def test_filter_bank_matches_scan_tier():
    rng = np.random.default_rng(11)
    f, g, q, h, r, x0, p0, hs, rs, masks, us = _tv_system(rng)
    t, p, n, s = hs.shape[0], h.shape[0], f.shape[0], 5
    model, state0 = vanilla.new(x0, p0, f, g, h, gn.noiseless(q, r))

    ys = jnp.asarray(rng.standard_normal((t, p, s)))  # [T, p, S]

    states, innovs, _ = jax.jit(lambda m, st: ens.filter_bank(
        m, st, ys, controls=us, hs=hs, rs=rs, meas_masks=masks))(model, state0)

    for si in range(s):
        _, ests = vanilla.run(model, state0, measurements=ys[:, :, si],
                              controls=us, hs=hs, rs=rs, meas_masks=masks)
        np.testing.assert_allclose(np.asarray(states[:, :, si]),
                                   np.asarray(ests.state),
                                   atol=1e-9, err_msg=f"stream {si}")
        np.testing.assert_allclose(np.asarray(innovs[:, :, si]),
                                   np.asarray(ests.innovation), atol=1e-9)


def test_covariance_path_tv_reduces_to_time_invariant():
    rng = np.random.default_rng(3)
    f, g, q, h, r, x0, p0, *_ = _tv_system(rng)
    t = 30
    model, state0 = vanilla.new(x0, p0, f, g, h, gn.noiseless(q, r))
    hs = jnp.broadcast_to(h, (t,) + h.shape)
    rs = jnp.broadcast_to(r, (t,) + r.shape)
    tv = ens._covariance_path_tv(model, state0.p, hs, rs)
    ti = ens._covariance_path_sequential(model, state0.p, t)
    for name, a, b in zip(("K", "Sinv", "Pinv"), tv, ti):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10,
                                   err_msg=name)


def test_mc_chi_square_tv_is_calibrated():
    """With the consistent-measurement mode, the TV fused pipeline's
    NEES must land on n and NIS on the per-step valid-row count."""
    rng = np.random.default_rng(7)
    f, g, q, h, r, x0, p0, hs, rs, masks, us = _tv_system(rng, t=50)
    n = f.shape[0]
    model, state0 = vanilla.new(x0, p0, f, g, h, gn.awgn(q, r))
    res = jax.jit(lambda m, st, k: ens.mc_chi_square(
        m, st, samples=4096, steps=50, key=k, controls=us,
        lagged_measurements=False, hs=hs, rs=rs, meas_masks=masks,
    ), static_argnames=())(model, state0, jax.random.PRNGKey(0))
    p_k = np.asarray(masks).sum(axis=1)  # valid rows per step
    nees = np.asarray(res.nees_means)
    nis = np.asarray(res.nis_means)
    assert abs(nees[10:].mean() - n) < 0.25 * n
    # NIS_k ~ chi2(p_k): compare in ratio to the per-step dof.
    assert abs((nis[10:] / p_k[10:]).mean() - 1.0) < 0.15
