"""Gravitational acceleration: two-body + J2 + J3 zonal harmonics.

Replaces the smd propagator's force model used by the OD tests
(Perturbations{Jn: 2}, hybrid_test.go:125).  Pure function of the ECI
position — differentiable, so the STM comes from jax.jacfwd of the
integrator flow instead of hand-coded variational equations.
"""

from __future__ import annotations

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
        x, y, z = r[0], r[1], r[2]
        re_r = c.R_EARTH / rnorm
        zr = z / rnorm
        k3 = -2.5 * c.J3 * c.GM_EARTH * re_r**3 / (rnorm2 * rnorm2)
        a = a + k3 * jnp.stack(
            [
                x * (3.0 * zr - 7.0 * zr**3),
                y * (3.0 * zr - 7.0 * zr**3),
                z * (6.0 * zr**2 - 7.0 * zr**4 - 3.0 / 5.0),
            ]
        )
    return a


def eom(state: jnp.ndarray, degree: int = 2) -> jnp.ndarray:
    """d/dt [r, v] = [v, a(r)] for the 6-state PV vector."""
    return jnp.concatenate([state[3:], acceleration(state[:3], degree)])
