"""Fixed-step Runge-Kutta integrators with STM via jacfwd.

Replaces smd's PreciseMission propagator + hand-propagated STM (the
`state.Φ` the OD tests feed to Prepare, hybrid_test.go:242, 294).
Fixed step size keeps the flow jittable; the state transition matrix
is the exact Jacobian of the *discrete* flow (jax.jacfwd), so the
filter's linearization is consistent with the propagation to machine
precision — tighter than integrating variational equations separately.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def rk4_step(f: Callable, x: jnp.ndarray, dt) -> jnp.ndarray:
    """Classic RK4 single step for autonomous dx/dt = f(x)."""
    k1 = f(x)
    k2 = f(x + 0.5 * dt * k1)
    k3 = f(x + 0.5 * dt * k2)
    k4 = f(x + dt * k3)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


# Dormand-Prince 5(4) coefficients (fixed-step, 5th-order solution).
_DP_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_DP_B5 = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0]


def dopri5_step(f: Callable, x: jnp.ndarray, dt) -> jnp.ndarray:
    """Dormand-Prince RK5(4) single fixed step (5th-order weights)."""
    ks = [f(x)]
    for row in _DP_A[1:]:
        xi = x + dt * sum(a * k for a, k in zip(row, ks))
        ks.append(f(xi))
    return x + dt * sum(b * k for b, k in zip(_DP_B5, ks) if b != 0.0)


def flow(f: Callable, dt, method: str = "rk4", substeps: int = 1) -> Callable:
    """One filter-step flow map x_k -> x_{k+1} (possibly sub-stepped)."""
    stepper = {"rk4": rk4_step, "dopri5": dopri5_step}[method]
    h = dt / substeps

    def phi(x):
        for _ in range(substeps):
            x = stepper(f, x, h)
        return x

    return phi


def flow_with_stm(f: Callable, dt, method: str = "rk4", substeps: int = 1) -> Callable:
    """Returns g(x) -> (x_next, Φ) where Φ = ∂x_next/∂x (the per-step STM)."""
    phi = flow(f, dt, method, substeps)

    def step(x):
        x_next, phi_mat = x_and_jac(phi, x)
        return x_next, phi_mat

    return step


def x_and_jac(phi: Callable, x: jnp.ndarray):
    """(phi(x), jacfwd(phi)(x)) sharing the forward pass."""
    basis = jnp.eye(x.shape[0], dtype=x.dtype)
    push = jax.vmap(lambda t: jax.jvp(phi, (x,), (t,)))
    x_rep, jac_rows = push(basis)
    return x_rep[0], jac_rows.T
