"""Square-root UKF: equivalence with the plain UKF in f64, and the f32
robustness that is its reason to exist (subtractive P⁺ = P⁻ − K S Kᵀ
goes indefinite on tight-R workloads; the factored form cannot)."""

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu import linalg
from gokalman_tpu import noise as gn
from gokalman_tpu.filters import srukf, ukf

from fixtures import random_spd


def test_chol_update_both_signs():
    rng = np.random.default_rng(5)
    for n in (3, 6):
        a = random_spd(rng, n, 1.0)
        l = np.linalg.cholesky(a)
        v = rng.standard_normal(n)
        for w in (0.7, 2.0):
            up = np.asarray(linalg.chol_update(jnp.asarray(l), jnp.asarray(v), w))
            np.testing.assert_allclose(up @ up.T, a + w * np.outer(v, v),
                                       rtol=1e-10, atol=1e-12)
            assert np.allclose(np.triu(up, 1), 0.0)
        # Downdate (keep the result PD).
        small = 0.1 * v / np.linalg.norm(v)
        dn = np.asarray(linalg.chol_update(jnp.asarray(l), jnp.asarray(small), -1.0))
        np.testing.assert_allclose(dn @ dn.T, a - np.outer(small, small),
                                   rtol=1e-9, atol=1e-11)


def _range_bearing():
    dt = 0.5
    f = jnp.array([[1, 0, dt, 0], [0, 1, 0, dt], [0, 0, 1, 0], [0, 0, 0, 1.0]])
    q = 1e-4 * jnp.eye(4)
    r = jnp.diag(jnp.array([0.01, 1e-4]))
    fx = lambda x: f @ x
    def hx(x):
        rng_ = jnp.sqrt(x[0] ** 2 + x[1] ** 2)
        return jnp.stack([rng_, jnp.arctan2(x[1], x[0])])
    x0 = jnp.array([10.0, 5.0, -0.5, 0.3])
    p0 = jnp.diag(jnp.array([4.0, 4.0, 0.25, 0.25]))
    return q, r, x0, p0, fx, hx


def test_matches_plain_ukf_nonlinear():
    q, r, x0, p0, fx, hx = _range_bearing()
    noise = gn.awgn(q, r)
    um, us = ukf.new(x0, p0, noise)
    sm, ss = srukf.new(x0, p0, noise)
    rng = np.random.default_rng(3)
    for k in range(30):
        y = jnp.asarray(np.array([10.0, 0.5]) + 0.1 * rng.standard_normal(2))
        us, ue = ukf.step(um, us, y, fx, hx)
        ss, se = srukf.step(sm, ss, y, fx, hx)
        np.testing.assert_allclose(np.asarray(se.state), np.asarray(ue.state),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(se.covariance),
                                   np.asarray(ue.covariance),
                                   rtol=1e-6, atol=1e-9)


def test_masked_step_is_pure_prediction():
    q, r, x0, p0, fx, hx = _range_bearing()
    sm, ss = srukf.new(x0, p0, gn.awgn(q, r))
    y = jnp.array([1.0, 0.5])
    st_m, est_m = srukf.step(sm, ss, y, fx, hx, has=jnp.asarray(False))
    x_pred, s_pred = srukf.predict(sm, ss, fx)
    np.testing.assert_allclose(np.asarray(st_m.x), np.asarray(x_pred), atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_m.s @ st_m.s.T),
                               np.asarray(s_pred @ s_pred.T), atol=1e-12)
    assert float(jnp.abs(est_m.gain).max()) == 0.0


def test_f32_tight_r_robustness():
    """Tight measurements against a wide prior: the plain f32 UKF's
    subtractive covariance update must break chi-square consistency or
    positive-definiteness within a few steps; the SR-UKF must stay PD
    and track."""
    n = 4
    f = jnp.eye(n, dtype=jnp.float32)
    q32 = (1e-10 * jnp.eye(n)).astype(jnp.float32)
    r32 = (1e-7 * jnp.eye(2)).astype(jnp.float32)
    fx = lambda x: f @ x
    hx = lambda x: x[:2]
    x0 = jnp.zeros(n, jnp.float32)
    p0 = (100.0 * jnp.eye(n)).astype(jnp.float32)
    noise = gn.awgn(q32, r32)

    um, us = ukf.new(x0, p0, noise)
    sm, ss = srukf.new(x0, p0, noise)
    rng = np.random.default_rng(0)
    truth = np.array([3.0, -2.0, 0.5, 1.0], np.float32)
    plain_bad = False
    for k in range(25):
        y = jnp.asarray(truth[:2] + 3e-4 * rng.standard_normal(2).astype(np.float32))
        us, ue = ukf.step(um, us, y, fx, hx)
        ss, se = srukf.step(sm, ss, y, fx, hx)
        cov_plain = np.asarray(ue.covariance, np.float64)
        if not np.isfinite(cov_plain).all():
            plain_bad = True
        elif np.linalg.eigvalsh(cov_plain).min() < 0:
            plain_bad = True
        # SR-UKF covariance is PD by construction and finite.
        s_np = np.asarray(se.sqrt_covariance)
        assert np.isfinite(s_np).all(), k
        assert (np.abs(np.diag(s_np)) > 0).all(), k
    assert plain_bad, "plain f32 UKF unexpectedly stayed PD; tighten R"
    # And the SR-UKF actually converged to the observed components.
    np.testing.assert_allclose(np.asarray(ss.x[:2]), truth[:2], atol=1e-2)
