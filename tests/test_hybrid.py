"""Hybrid CKF/EKF tests: KF equivalence, EKF mode, SNC, masked scan,
smoother (mirrors reference hybrid.go behavior)."""

import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import hybrid, vanilla

from fixtures import random_spd


def _system(rng, n=4, p=2):
    f = np.eye(n) + 0.05 * rng.standard_normal((n, n))
    h = rng.standard_normal((p, n))
    q = random_spd(rng, n, 0.01)
    r = random_spd(rng, p, 0.1)
    x0 = rng.standard_normal(n)
    p0 = random_spd(rng, n, 1.0)
    return map(jnp.asarray, (f, h, q, r, x0, p0))


def test_ckf_mode_matches_vanilla_zero_q():
    """Hybrid in CKF mode with Φ=F, H̃=H, no SNC equals the vanilla CKF
    with Q=0 (hybrid.go:104-204 vs vanilla.go:128-220)."""
    rng = np.random.default_rng(31)
    f, h, q, r, x0, p0 = _system(rng)
    nz0 = gn.noiseless(jnp.zeros_like(q), r)
    vmodel, vstate = vanilla.new(x0, p0, f, None, h, nz0)
    hmodel, hstate = hybrid.new(x0, p0, nz0, 2)

    for k in range(20):
        y = jnp.asarray(rng.standard_normal(2))
        vstate, vest = vanilla.step(vmodel, vstate, y)
        hstate, hest = hybrid.update(hmodel, hstate, f, h, y, jnp.zeros(2), ekf=False)
        np.testing.assert_allclose(
            np.asarray(hest.state), np.asarray(vest.state), rtol=1e-9, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(hest.covariance),
            np.asarray(vest.covariance),
            rtol=1e-9,
            atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(hest.innovation), np.asarray(vest.innovation), rtol=1e-9,
            atol=1e-12,
        )


def test_ekf_mode_state_is_k_times_dev():
    """EKF branch: x̂ = K y, zero innovation (hybrid.go:160-162)."""
    rng = np.random.default_rng(32)
    f, h, q, r, x0, p0 = _system(rng)
    nz = gn.noiseless(q, r)
    model, state = hybrid.new(x0, p0, nz, 2)
    y = jnp.asarray(rng.standard_normal(2))
    st, est = hybrid.update(model, state, f, h, y, jnp.zeros(2), ekf=True)
    np.testing.assert_allclose(
        np.asarray(est.state), np.asarray(est.gain) @ np.asarray(y), rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(est.innovation), 0.0)
    # EKF prediction predicts zero deviation (hybrid.go:127-129).
    st2, est2 = hybrid.predict(model, st, f, ekf=True)
    np.testing.assert_allclose(np.asarray(est2.state), 0.0)


def test_snc_adds_gamma_q_gamma():
    """PreparePNT arms ΓQΓ^T for one step (hybrid.go:86-89, 117-123)."""
    rng = np.random.default_rng(33)
    f, h, q, r, x0, p0 = _system(rng)
    nz = gn.noiseless(q, r)
    model, state = hybrid.new(x0, p0, nz, 2)
    gamma = jnp.asarray(rng.standard_normal((4, 4)))
    _, est_off = hybrid.predict(model, state, f)
    _, est_on = hybrid.predict(model, state, f, gamma=gamma)
    delta = np.asarray(est_on.covariance) - np.asarray(est_off.covariance)
    expected = np.asarray(gamma) @ np.asarray(q) @ np.asarray(gamma).T
    np.testing.assert_allclose(delta, 0.5 * (expected + expected.T), rtol=1e-9)
    # snc mask disarms: step with snc=False must match est_off.
    st, est_masked = hybrid.step(
        model, state, f, h, jnp.zeros(2), jnp.zeros(2),
        has_meas=jnp.asarray(False), gamma=gamma, snc=jnp.asarray(False),
    )
    np.testing.assert_allclose(
        np.asarray(est_masked.covariance), np.asarray(est_off.covariance), rtol=1e-9
    )


def test_masked_run_with_ekf_switch():
    """Scan with per-step measurement availability and a mid-run EKF
    trigger (the hybrid_test.go:270-279 protocol, purely functional)."""
    rng = np.random.default_rng(34)
    f, h, q, r, x0, p0 = _system(rng)
    nz = gn.noiseless(jnp.zeros_like(q), r)
    model, state = hybrid.new(x0, p0, nz, 2)
    t = 16
    phis = jnp.broadcast_to(f, (t, 4, 4))
    hts = jnp.broadcast_to(h, (t, 2, 4))
    real = jnp.asarray(rng.standard_normal((t, 2)))
    comp = jnp.zeros((t, 2))
    has = jnp.asarray([True] * t)
    ekf_mask = jnp.asarray([k >= 8 for k in range(t)])
    final, ests = hybrid.run(
        model, state, phis, hts, real, comp, has, ekf_mask=ekf_mask
    )
    assert int(final.k) == t
    # After the switch, state = K y exactly.
    k8 = np.asarray(ests.gain[8])
    np.testing.assert_allclose(
        np.asarray(ests.state[8]), k8 @ np.asarray(real[8]), rtol=1e-9, atol=1e-12
    )
    # Before the switch, innovation is the CKF innovation (nonzero).
    assert np.linalg.norm(np.asarray(ests.innovation[3])) > 0


def test_smoother_backward_map():
    rng = np.random.default_rng(35)
    f, h, q, r, x0, p0 = _system(rng)
    nz = gn.noiseless(jnp.zeros_like(q), r)
    model, state = hybrid.new(x0, p0, nz, 2)
    t = 10
    phis = jnp.broadcast_to(f, (t, 4, 4))
    hts = jnp.broadcast_to(h, (t, 2, 4))
    real = jnp.asarray(rng.standard_normal((t, 2)))
    comp = jnp.zeros((t, 2))
    has = jnp.ones(t, dtype=bool)
    _, ests = hybrid.run(model, state, phis, hts, real, comp, has)
    sm = hybrid.smooth_all(ests)
    finv = np.linalg.inv(np.asarray(f))
    xs = np.asarray(sm.state)
    for k in range(t - 1):
        np.testing.assert_allclose(xs[k], finv @ xs[k + 1], rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(xs[-1], np.asarray(ests.state[-1]), rtol=1e-12)
