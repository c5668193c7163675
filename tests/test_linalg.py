"""Unit tests for the linalg tier (mirrors reference helper_test.go)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gokalman_tpu import linalg


def test_identity():
    i33 = linalg.identity(3)
    assert i33.shape == (3, 3)
    np.testing.assert_array_equal(np.asarray(i33), np.eye(3))
    s = linalg.scaled_identity(4, 2.5)
    np.testing.assert_array_equal(np.asarray(s), 2.5 * np.eye(4))


def test_is_nil():
    assert linalg.is_nil(None)
    assert linalg.is_nil(jnp.zeros((2, 2)))
    assert not linalg.is_nil(jnp.eye(2))


def test_sym_and_is_symmetric():
    a = jnp.array([[1.0, 0.1, 2.0], [0.1, 3.0, 5.0], [2.0, 5.0, 7.0]])
    assert linalg.is_symmetric(a)
    b = jnp.array([[1.0, 0.0, 3.0], [0.0, 1.0, 0.0], [1.0, 2.0, 1.0]])
    assert not linalg.is_symmetric(b)
    assert linalg.is_symmetric(linalg.sym(b))
    assert not linalg.is_symmetric(jnp.zeros((2, 3)))


def test_check_dims():
    # Mirrors helper_test.go:94-106: every agreement method passes for
    # equal shapes and fails for 2x2 vs 3x3.
    for meth in ("rows2cols", "cols2rows", "cols2cols", "rows2rows", "rowsAndcols"):
        linalg.check_dims((2, 2), (2, 2), "a", "b", meth)
        with pytest.raises(ValueError):
            linalg.check_dims((2, 2), (3, 3), "a", "b", meth)


def test_sign_deadband():
    assert float(linalg.sign_db(jnp.asarray(0.0))) == 1.0
    assert float(linalg.sign_db(jnp.asarray(1e-13))) == 1.0
    assert float(linalg.sign_db(jnp.asarray(-3.0))) == -1.0
    assert float(linalg.sign_db(jnp.asarray(2.0))) == 1.0


def test_householder_golden():
    """Golden values from reference helper_test.go:108-117 (1e-15)."""
    a = jnp.array([[1.0, -2.0, -1.0], [2.0, -1.0, 1.0], [1.0, 1.0, 2.0]])
    out = linalg.householder_triangularize(a, 2, 1)
    expected = np.array(
        [
            [-2.449489742783178, 1.224744871391589, -1.2247448713915892],
            [0.0, -2.121320343559643, -2.121320343559643],
            [0.0, 0.0, 0.0],
        ]
    )
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-15)


def test_householder_matches_qr():
    """R from the Householder kernel equals QR's R up to row signs."""
    rng = np.random.default_rng(0)
    for n, m in [(3, 2), (4, 0), (5, 3)]:
        a = rng.standard_normal((n + m, n + 1))
        out = np.asarray(linalg.householder_triangularize(jnp.asarray(a), n, m))
        r_np = np.linalg.qr(a, mode="r")
        # Compare the top-left n x (n+1) blocks up to per-row sign.
        for i in range(n):
            row_ours = out[i]
            row_ref = r_np[i]
            sign = np.sign(row_ours[i]) * np.sign(row_ref[i])
            np.testing.assert_allclose(row_ours, sign * row_ref, atol=1e-12)
        # Below-diagonal of the eliminated columns must be exactly zero.
        for j in range(n):
            np.testing.assert_allclose(out[j + 1 :, j], 0.0, atol=1e-12)


def test_householder_vmap():
    rng = np.random.default_rng(1)
    batch = jnp.asarray(rng.standard_normal((7, 5, 4)))
    out = jax.vmap(lambda a: linalg.householder_triangularize(a, 3, 2))(batch)
    single = linalg.householder_triangularize(batch[3], 3, 2)
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(single), atol=1e-12)


def test_solve_psd_and_inv():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((5, 5))
    spd = a @ a.T + 5 * np.eye(5)
    b = rng.standard_normal((5, 3))
    x = np.asarray(linalg.solve_psd(jnp.asarray(spd), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(spd, b), atol=1e-9)
    inv = np.asarray(linalg.inv_psd(jnp.asarray(spd)))
    np.testing.assert_allclose(inv, np.linalg.inv(spd), atol=1e-9)


def test_is_within_nsigma():
    p = jnp.diag(jnp.array([1.0, 4.0]))
    assert bool(linalg.is_within_nsigma(jnp.array([1.9, 3.9]), p, 2.0))
    assert not bool(linalg.is_within_nsigma(jnp.array([2.1, 0.0]), p, 2.0))
    # Batched
    states = jnp.array([[0.0, 0.0], [3.0, 0.0]])
    out = linalg.is_within_nsigma(states, p, 2.0)
    assert out.tolist() == [True, False]
