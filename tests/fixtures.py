"""Shared test fixtures mirroring the reference's (helper_test.go:10-22)."""

import jax.numpy as jnp
import numpy as np


def robot1d_matrices():
    """2-state constant-velocity robot (helper_test.go:10-15)."""
    dt = 0.1
    f = jnp.array([[1.0, dt], [0.0, 1.0]])
    g = jnp.array([[0.5 * dt * dt], [dt]])
    return f, g, dt


def midterm2_matrices():
    """3-state fixture (helper_test.go:17-22)."""
    dt = 0.01
    f = jnp.array([[1.0, 0.01, 5e-5], [0.0, 1.0, 0.01], [0.0, 0.0, 1.0]])
    g = jnp.array([[(5e-7) / 3], [5e-5], [0.01]])
    return f, g, dt


def midterm2_system():
    """Full system used by the behavioral filter tests
    (vanilla_test.go:30-40): F, G, H, Q, R, x0, P0."""
    f, g, dt = midterm2_matrices()
    q = jnp.array(
        [
            [2.5e-15, 6.25e-13, (25e-11) / 3],
            [6.25e-13, (5e-7) / 3, 2.5e-8],
            [(25e-11) / 3, 2.5e-8, 5e-6],
        ]
    )
    r = jnp.array([[0.005 / dt]])
    h = jnp.array([[1.0, 0.0, 0.0]])
    x0 = jnp.array([0.0, 0.35, 0.0])
    p0 = 10.0 * jnp.eye(3)
    return f, g, h, q, r, x0, p0


def random_spd(rng: np.random.Generator, n: int, scale: float = 1.0):
    a = rng.standard_normal((n, n))
    return scale * (a @ a.T + n * np.eye(n))


class NumpyCKF:
    """Straightforward float64 numpy port of the reference Vanilla.Update
    (vanilla.go:128-220), used as the 1e-9 parity oracle."""

    def __init__(self, x0, p0, f, g, h, q, r):
        self.x = np.asarray(x0, dtype=np.float64)
        self.p = np.asarray(p0, dtype=np.float64)
        self.f = np.asarray(f, dtype=np.float64)
        self.g = None if g is None else np.asarray(g, dtype=np.float64)
        self.h = np.asarray(h, dtype=np.float64)
        self.q = np.asarray(q, dtype=np.float64)
        self.r = np.asarray(r, dtype=np.float64)

    def update(self, y, u=None, w=None, w2=None, v=None):
        x_pred = self.f @ self.x
        if self.g is not None and u is not None:
            x_pred = x_pred + self.g @ u
        if w is not None:
            x_pred = x_pred + w
        p_pred = self.f @ self.p @ self.f.T + self.q
        y_hat = self.h @ self.x
        if v is not None:
            y_hat = y_hat + v
        s = self.h @ p_pred @ self.h.T + self.r
        k = p_pred @ self.h.T @ np.linalg.inv(s)
        innov = np.asarray(y) - self.h @ x_pred
        x = x_pred + k @ innov
        if w2 is not None:
            x = x + w2
        ikh = np.eye(self.p.shape[0]) - k @ self.h
        p = ikh @ p_pred @ ikh.T + k @ self.r @ k.T
        self.x, self.p = x, 0.5 * (p + p.T)
        return dict(
            x=x, p=self.p, p_pred=0.5 * (p_pred + p_pred.T), k=k,
            innov=innov, y_hat=y_hat,
        )
