"""Exact OOSM (out-of-sequence measurement) update pin: the in-place
correction at t_k must equal re-running the filter with the late
measurement inserted at its true time τ — digit-level, state AND
covariance."""

import jax.numpy as jnp
import numpy as np

import gokalman_tpu as gk
from gokalman_tpu import noise as gn
from gokalman_tpu.filters import vanilla


def _split_system(alpha=0.4, dt=1.0, w_psd=0.05):
    """CV system over dt, split at τ = t_{k-1} + alpha·dt.  Van Loan of
    an LTI system composes exactly: F2 F1 = F, F2 Q1 F2ᵀ + Q2 = Q."""
    a = jnp.array([[0.0, 1.0], [0.0, 0.0]])
    gam = jnp.array([[0.0], [1.0]])
    w = jnp.array([[w_psd]])
    f_full, q_full, _ = gk.c2d.van_loan(a, gam, w, dt)
    f1, q1, _ = gk.c2d.van_loan(a, gam, w, alpha * dt)
    f2, q2, _ = gk.c2d.van_loan(a, gam, w, (1 - alpha) * dt)
    # sanity: the split composes to the full step
    np.testing.assert_allclose(np.asarray(f2 @ f1), np.asarray(f_full),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(f2 @ q1 @ f2.T + q2),
                               np.asarray(q_full), atol=1e-12)
    return f_full, q_full, f1, q1, f2, q2


def test_oosm_equals_in_order_processing():
    f, q, f1, q1, f2, q2 = _split_system()
    h = jnp.array([[1.0, 0.0]])
    r = jnp.array([[0.3]])
    r_tau = jnp.array([[0.2]])
    x_prev = jnp.array([1.0, -0.5])
    p_prev = jnp.asarray([[0.8, 0.1], [0.1, 0.4]])
    y_k = jnp.array([1.7])
    y_tau = jnp.array([0.9])

    # ordered reference: predict(F1,Q1) -> update y_tau -> predict(F2,Q2)
    # -> update y_k
    m1, s1 = vanilla.new(x_prev, p_prev, f1, None, h,
                         gn.noiseless(q1, r_tau))
    s1_post, _ = vanilla.step(m1, s1, y_tau)
    m2, _ = vanilla.new(s1_post.x, s1_post.p, f2, None, h,
                        gn.noiseless(q2, r))
    s2 = vanilla.State(s1_post.x, s1_post.p, jnp.int32(0))
    s_ord, e_ord = vanilla.step(m2, s2, y_k)

    # OOSM path: full step with y_k, then the late y_tau folded in
    mf, sf = vanilla.new(x_prev, p_prev, f, None, h, gn.noiseless(q, r))
    sk, est_k = vanilla.step(mf, sf, y_k)
    s_oosm, e_oosm = vanilla.oosm_update(mf, sk, est_k, y_tau, f2, q2,
                                         r_tau=r_tau)

    np.testing.assert_allclose(np.asarray(s_oosm.x), np.asarray(s_ord.x),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(s_oosm.p), np.asarray(s_ord.p),
                               atol=1e-11)


def test_oosm_multiple_alphas_and_h_tau():
    """Exactness holds for any lag fraction and a DIFFERENT late-sensor
    measurement model (velocity sensor for the OOSM)."""
    for alpha in (0.1, 0.5, 0.9):
        f, q, f1, q1, f2, q2 = _split_system(alpha=alpha)
        h = jnp.array([[1.0, 0.0]])
        h_tau = jnp.array([[0.0, 1.0]])  # late velocity measurement
        r = jnp.array([[0.3]])
        r_tau = jnp.array([[0.05]])
        x_prev = jnp.array([0.2, 0.7])
        p_prev = jnp.asarray([[0.5, -0.05], [-0.05, 0.3]])
        y_k = jnp.array([0.8])
        y_tau = jnp.array([0.6])

        m1, s1 = vanilla.new(x_prev, p_prev, f1, None, h_tau,
                             gn.noiseless(q1, r_tau))
        s1_post, _ = vanilla.step(m1, s1, y_tau)
        m2, _ = vanilla.new(s1_post.x, s1_post.p, f2, None, h,
                            gn.noiseless(q2, r))
        s_ord, _ = vanilla.step(
            m2, vanilla.State(s1_post.x, s1_post.p, jnp.int32(0)), y_k)

        mf, sf = vanilla.new(x_prev, p_prev, f, None, h,
                             gn.noiseless(q, r))
        sk, est_k = vanilla.step(mf, sf, y_k)
        s_oosm, _ = vanilla.oosm_update(mf, sk, est_k, y_tau, f2, q2,
                                        h_tau=h_tau, r_tau=r_tau)
        np.testing.assert_allclose(np.asarray(s_oosm.x),
                                   np.asarray(s_ord.x), atol=1e-11,
                                   err_msg=f"alpha={alpha}")
        np.testing.assert_allclose(np.asarray(s_oosm.p),
                                   np.asarray(s_ord.p), atol=1e-11,
                                   err_msg=f"alpha={alpha}")


def test_oosm_always_tightens_covariance():
    """Any OOSM carries information: the corrected covariance is ⪯ the
    pre-correction posterior, strictly smaller in trace."""
    f, q, f1, q1, f2, q2 = _split_system()
    h = jnp.array([[1.0, 0.0]])
    r = jnp.array([[0.3]])
    mf, sf = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h,
                         gn.noiseless(q, r))
    sk, est_k = vanilla.step(mf, sf, jnp.array([0.5]))
    _, e = vanilla.oosm_update(mf, sk, est_k, jnp.array([0.1]), f2, q2)
    d = np.asarray(est_k.covariance) - np.asarray(e.covariance)
    assert np.linalg.eigvalsh(d).min() > -1e-12
    assert np.trace(d) > 1e-4


def test_oosm_controlled_system_with_offset():
    """CONTROLLED system: the deterministic input over [tau, t_k] must
    enter the retrodiction via `offset` — without it the state is
    biased by F2^-1 G u while the covariance stays exact (the failure
    mode the review pass measured at 0.8 state error)."""
    f, q, f1, q1, f2, q2 = _split_system(alpha=0.4)
    h = jnp.array([[1.0, 0.0]])
    r = jnp.array([[0.3]])
    g = jnp.array([[1.0], [0.3]])
    u = jnp.array([2.0])
    x_prev = jnp.array([1.0, -0.5])
    p_prev = jnp.asarray([[0.8, 0.1], [0.1, 0.4]])
    y_k = jnp.array([1.7])
    y_tau = jnp.array([0.9])

    # split the control effect: over [t_{k-1}, tau] the input
    # contributes g1 u, over [tau, t_k] g2 u, with g2 u + F2 g1 u = g u
    # for the zero-order-hold CV system discretized at each dt.
    a = jnp.array([[0.0, 1.0], [0.0, 0.0]])
    import gokalman_tpu as gk
    # ZOH B over dt for the double integrator with B_c = [0, 1]^T u
    def zoh_b(dt_):
        return jnp.array([[0.5 * dt_**2], [dt_]])
    g1, g2 = zoh_b(0.4), zoh_b(0.6)
    g_full = zoh_b(1.0)
    np.testing.assert_allclose(np.asarray(f2 @ g1 + g2),
                               np.asarray(g_full), atol=1e-12)

    m1, s1 = vanilla.new(x_prev, p_prev, f1, g1, h,
                         gn.noiseless(q1, jnp.array([[0.2]])))
    s1_post, _ = vanilla.step(m1, s1, y_tau, control=u)
    m2, _ = vanilla.new(s1_post.x, s1_post.p, f2, g2, h,
                        gn.noiseless(q2, r))
    s_ord, _ = vanilla.step(
        m2, vanilla.State(s1_post.x, s1_post.p, jnp.int32(0)), y_k,
        control=u)

    mf, sf = vanilla.new(x_prev, p_prev, jnp.asarray(f2 @ f1), g_full, h,
                         gn.noiseless(q, r))
    sk, est_k = vanilla.step(mf, sf, y_k, control=u)
    s_oosm, _ = vanilla.oosm_update(mf, sk, est_k, y_tau, f2, q2,
                                    r_tau=jnp.array([[0.2]]),
                                    offset=g2 @ u)
    np.testing.assert_allclose(np.asarray(s_oosm.x), np.asarray(s_ord.x),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(s_oosm.p), np.asarray(s_ord.p),
                               atol=1e-11)
    # and WITHOUT the offset the state is visibly biased
    s_bad, _ = vanilla.oosm_update(mf, sk, est_k, y_tau, f2, q2,
                                   r_tau=jnp.array([[0.2]]))
    assert np.abs(np.asarray(s_bad.x) - np.asarray(s_ord.x)).max() > 0.05
