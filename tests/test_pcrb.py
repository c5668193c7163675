"""Posterior Cramér-Rao bound: equals the Kalman covariance on
linear-Gaussian models (KF efficiency), lower-bounds any suboptimal
estimator, and averages sampled Jacobian stacks correctly."""

import jax.numpy as jnp
import numpy as np

from gokalman_tpu import diagnostics
from gokalman_tpu import noise as gn
from gokalman_tpu.filters import vanilla

from fixtures import midterm2_system


def test_pcrb_equals_kf_covariance_linear():
    f, g, h, q, r, x0, p0 = (np.asarray(a) for a in midterm2_system())
    t = 30
    phis = jnp.broadcast_to(jnp.asarray(f), (t, 3, 3))
    hs = jnp.broadcast_to(jnp.asarray(h), (t, 1, 3))
    j0 = jnp.asarray(np.linalg.inv(p0))
    _, bounds = diagnostics.pcrb(phis, hs, q, r, j0)

    model, state = vanilla.new(x0, p0, f, None, h, gn.noiseless(q, r))
    # Covariance path is measurement-independent: zeros suffice.
    _, ests = vanilla.run(model, state, jnp.zeros((t, 1)))
    np.testing.assert_allclose(
        np.asarray(bounds), np.asarray(ests.covariance), rtol=1e-7, atol=1e-12
    )


def test_pcrb_lower_bounds_suboptimal_filter():
    """A detuned constant-gain filter's exact error covariance (Joseph
    recursion) must dominate the bound at every step."""
    f, g, h, q, r, x0, p0 = (np.asarray(a) for a in midterm2_system())
    t = 60
    phis = jnp.broadcast_to(jnp.asarray(f), (t, 3, 3))
    hs = jnp.broadcast_to(jnp.asarray(h), (t, 1, 3))
    _, bounds = diagnostics.pcrb(phis, hs, q, r, jnp.asarray(np.linalg.inv(p0)))

    k_bad = np.array([[0.2], [0.1], [0.02]])  # not the Kalman gain
    p_err = p0.copy()
    ikh = np.eye(3) - k_bad @ h
    for k in range(t):
        p_pred = f @ p_err @ f.T + q
        p_err = ikh @ p_pred @ ikh.T + k_bad @ r @ k_bad.T
        diff = p_err - np.asarray(bounds[k])
        w = np.linalg.eigvalsh(0.5 * (diff + diff.T))
        assert w.min() > -1e-10, (k, w.min())


def test_pcrb_sampled_jacobians():
    f, g, h, q, r, x0, p0 = (np.asarray(a) for a in midterm2_system())
    t, s = 12, 4
    phis = jnp.broadcast_to(jnp.asarray(f), (t, 3, 3))
    hs = jnp.broadcast_to(jnp.asarray(h), (t, 1, 3))
    j0 = jnp.asarray(np.linalg.inv(p0))
    _, b3 = diagnostics.pcrb(phis, hs, q, r, j0)
    # S identical samples reduce exactly to the deterministic stack.
    _, b4 = diagnostics.pcrb(
        jnp.broadcast_to(phis, (s, t, 3, 3)),
        jnp.broadcast_to(hs, (s, t, 1, 3)),
        q, r, j0,
    )
    np.testing.assert_allclose(np.asarray(b4), np.asarray(b3), rtol=1e-9)

    # Genuinely varying samples: bounds stay finite, symmetric, PSD.
    rng = np.random.default_rng(3)
    phis_s = np.asarray(phis)[None] * (
        1.0 + 0.01 * rng.standard_normal((s, t, 1, 1))
    )
    _, bmc = diagnostics.pcrb(jnp.asarray(phis_s), hs, q, r, j0)
    bmc = np.asarray(bmc)
    assert np.all(np.isfinite(bmc))
    for k in range(t):
        w = np.linalg.eigvalsh(bmc[k])
        assert w.min() > 0
