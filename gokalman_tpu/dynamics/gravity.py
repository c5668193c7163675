"""Gravitational acceleration: two-body + J2 + J3 zonal harmonics.

Replaces the smd propagator's force model used by the OD tests
(Perturbations{Jn: 2}, hybrid_test.go:125).  Pure function of the ECI
position — differentiable, so the STM comes from jax.jacfwd of the
integrator flow instead of hand-coded variational equations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import constants as c


def acceleration(r: jnp.ndarray, degree: int = 2) -> jnp.ndarray:
    """ECI acceleration [km/s^2] at position r [km].

    degree: 0 -> two-body only, 2 -> +J2, 3 -> +J2+J3 (static).
    """
    rnorm2 = jnp.sum(r * r)
    rnorm = jnp.sqrt(rnorm2)
    a = -c.GM_EARTH * r / (rnorm2 * rnorm)

    if degree >= 2:
        x, y, z = r[0], r[1], r[2]
        re_r = c.R_EARTH / rnorm
        z_r2 = (z / rnorm) ** 2
        k2 = -1.5 * c.J2 * c.GM_EARTH * re_r**2 / (rnorm2 * rnorm)
        a = a + k2 * jnp.stack(
            [
                x * (1.0 - 5.0 * z_r2),
                y * (1.0 - 5.0 * z_r2),
                z * (3.0 - 5.0 * z_r2),
            ]
        )
    if degree >= 3:
        # J3 contribution as the exact gradient of its zonal potential
        # term U3 = (mu/r) J3 (R/r)^3 P3(sin phi) — correct by
        # construction (tests pin it against the full potential).
        def u3(rv):
            rn = jnp.linalg.norm(rv)
            s = rv[2] / rn
            p3 = 0.5 * (5.0 * s**3 - 3.0 * s)
            return c.GM_EARTH / rn * c.J3 * (c.R_EARTH / rn) ** 3 * p3

        a = a - jax.grad(u3)(r)
    return a


def eom(state: jnp.ndarray, degree: int = 2) -> jnp.ndarray:
    """d/dt [r, v] = [v, a(r)] for the 6-state PV vector."""
    return jnp.concatenate([state[3:], acceleration(state[:3], degree)])
