"""Van Loan discretization tests (mirrors reference c2d_test.go)."""

import jax.numpy as jnp
import numpy as np

from gokalman_tpu.c2d import nyquist_ok, van_loan


def test_van_loan_golden():
    """Golden values from c2d_test.go:9-27 (1e-3)."""
    a = jnp.array([[0.0, 1.0], [0.0, 0.0]])
    gamma = jnp.array([[0.0], [1.0]])
    w = jnp.array([[1.0]])
    f, q, ok = van_loan(a, gamma, w, 0.1)
    assert ok
    np.testing.assert_allclose(
        np.asarray(f), np.array([[1.0, 0.1], [0.0, 1.0]]), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(q), np.array([[0.0003, 0.005], [0.005, 0.1]]), atol=1e-3
    )


def test_van_loan_nyquist_flag():
    """c2d_test.go:29-32: aliasing system must be flagged."""
    a = jnp.array([[1.0, 1.0], [0.0, 1.0]])
    gamma = jnp.array([[0.0], [1.0]])
    w = jnp.array([[1.0]])
    _, _, ok = van_loan(a, gamma, w, 10.0)
    assert not ok
    assert not nyquist_ok(a, 10.0)


def test_van_loan_exactness():
    """F must equal expm(A dt) and Q the Van Loan integral for a
    double integrator (closed forms known)."""
    dt = 0.5
    a = jnp.array([[0.0, 1.0], [0.0, 0.0]])
    gamma = jnp.eye(2)
    w = jnp.diag(jnp.array([0.2, 0.3]))
    f, q, _ = van_loan(a, gamma, w, dt)
    f_exact = np.array([[1.0, dt], [0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(f), f_exact, atol=1e-12)
    # Q = int_0^dt expm(A s) G W G^T expm(A s)^T ds, computed numerically.
    ss = np.linspace(0, dt, 20001)
    acc = np.zeros((2, 2))
    wnp = np.asarray(w)
    for s in ss:
        es = np.array([[1.0, s], [0.0, 1.0]])
        acc += es @ wnp @ es.T
    acc *= dt / len(ss)
    np.testing.assert_allclose(np.asarray(q), acc, atol=1e-5)
