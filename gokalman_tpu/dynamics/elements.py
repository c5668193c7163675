"""Classical orbital elements <-> Cartesian (RV) conversions.

Equivalent of the smd API surface the OD tests use
(NewOrbitFromOE / NewOrbitFromRV / Orbit.RV, hybrid_test.go:74,
299-301).  Angles in radians, distances in km.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import constants as c


def oe_to_rv(a, e, i, raan, argp, nu, mu: float = c.GM_EARTH):
    """Classical elements (a, e, i, Ω, ω, ν) -> ECI (r [3], v [3])."""
    a, e, i, raan, argp, nu = map(jnp.asarray, (a, e, i, raan, argp, nu))
    p = a * (1.0 - e * e)
    r_pqw = jnp.stack(
        [
            p * jnp.cos(nu) / (1.0 + e * jnp.cos(nu)),
            p * jnp.sin(nu) / (1.0 + e * jnp.cos(nu)),
            jnp.zeros_like(nu),
        ]
    )
    sqrt_mu_p = jnp.sqrt(mu / p)
    v_pqw = jnp.stack(
        [-sqrt_mu_p * jnp.sin(nu), sqrt_mu_p * (e + jnp.cos(nu)), jnp.zeros_like(nu)]
    )
    cO, sO = jnp.cos(raan), jnp.sin(raan)
    co, so = jnp.cos(argp), jnp.sin(argp)
    ci, si = jnp.cos(i), jnp.sin(i)
    rot = jnp.array(
        [
            [cO * co - sO * so * ci, -cO * so - sO * co * ci, sO * si],
            [sO * co + cO * so * ci, -sO * so + cO * co * ci, -cO * si],
            [so * si, co * si, ci],
        ]
    )
    return rot @ r_pqw, rot @ v_pqw


def rv_to_oe(r, v, mu: float = c.GM_EARTH):
    """ECI (r, v) -> classical elements (a, e, i, Ω, ω, ν)."""
    r = jnp.asarray(r)
    v = jnp.asarray(v)
    rnorm = jnp.linalg.norm(r)
    vnorm2 = jnp.sum(v * v)
    h = jnp.cross(r, v)
    hnorm = jnp.linalg.norm(h)
    n = jnp.cross(jnp.array([0.0, 0.0, 1.0]), h)
    nnorm = jnp.linalg.norm(n)
    e_vec = ((vnorm2 - mu / rnorm) * r - jnp.dot(r, v) * v) / mu
    e = jnp.linalg.norm(e_vec)
    energy = vnorm2 / 2.0 - mu / rnorm
    a = -mu / (2.0 * energy)
    i = jnp.arccos(h[2] / hnorm)
    raan = jnp.arccos(jnp.clip(n[0] / nnorm, -1.0, 1.0))
    raan = jnp.where(n[1] < 0, 2 * jnp.pi - raan, raan)
    argp = jnp.arccos(jnp.clip(jnp.dot(n, e_vec) / (nnorm * e), -1.0, 1.0))
    argp = jnp.where(e_vec[2] < 0, 2 * jnp.pi - argp, argp)
    nu = jnp.arccos(jnp.clip(jnp.dot(e_vec, r) / (e * rnorm), -1.0, 1.0))
    nu = jnp.where(jnp.dot(r, v) < 0, 2 * jnp.pi - nu, nu)
    return a, e, i, raan, argp, nu


def specific_energy(r, v, mu: float = c.GM_EARTH):
    """Keplerian specific energy v^2/2 - mu/r (conservation invariant)."""
    return 0.5 * jnp.sum(v * v) - mu / jnp.linalg.norm(r)


def period(a, mu: float = c.GM_EARTH):
    return 2.0 * jnp.pi * jnp.sqrt(a**3 / mu)
