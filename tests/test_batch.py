"""Batch least-squares tests (the reference has none — SURVEY §4 notes
batch.go is untested; behavior validated against the normal equations)."""

import jax.numpy as jnp
import numpy as np

from gokalman_tpu.filters import batch


def test_recovers_initial_state():
    rng = np.random.default_rng(41)
    n, p, t = 4, 2, 30
    x0 = rng.standard_normal(n)
    hs = rng.standard_normal((t, p, n))
    real = np.einsum("tpn,n->tp", hs, x0)
    comp = np.zeros((t, p))
    sol = batch.solve(jnp.asarray(hs), jnp.eye(p), jnp.asarray(real), jnp.asarray(comp))
    np.testing.assert_allclose(np.asarray(sol.x0), x0, rtol=1e-9, atol=1e-11)
    lam = np.einsum("tpi,tpj->ij", hs, hs)
    np.testing.assert_allclose(np.asarray(sol.p0), np.linalg.inv(lam), rtol=1e-8)


def test_weighting_matches_normal_equations():
    """The weight multiplies as H^T W H / H^T W y — the reference's
    documented contract (batch.go:50 uses the matrix as given)."""
    rng = np.random.default_rng(42)
    n, p, t = 3, 2, 20
    x0 = rng.standard_normal(n)
    hs = rng.standard_normal((t, p, n))
    w = np.diag([2.0, 0.5])
    noise = 0.01 * rng.standard_normal((t, p))
    real = np.einsum("tpn,n->tp", hs, x0) + noise
    comp = np.zeros((t, p))
    sol = batch.solve(jnp.asarray(hs), jnp.asarray(w), jnp.asarray(real), jnp.asarray(comp))
    lam = np.einsum("tpi,pq,tqj->ij", hs, w, hs)
    nvec = np.einsum("tpi,pq,tq->i", hs, w, real)
    np.testing.assert_allclose(np.asarray(sol.x0), np.linalg.solve(lam, nvec), rtol=1e-8)
