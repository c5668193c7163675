"""Matrix Lie-group utilities: SO(3) and SE_2(3) — the substrate for
the invariant EKF tier (filters/iekf.py).

SE_2(3) ("double direct spatial isometries", Barrau & Bonnabel 2017)
is the group of (R, v, p) triples embedded as 5x5 matrices

    X = [ R  v  p ]
        [ 0  1  0 ]
        [ 0  0  1 ]

— the natural state space for inertial navigation (attitude, velocity,
position).  Its exponential map couples the rotation into the linear
parts through the SO(3) left Jacobian, which is exactly what makes the
IMU dynamics *group-affine* and the invariant-EKF error propagation
log-linear (see filters/iekf.py).

The reference framework has no Lie-group support (it is a linear-
algebraic library over gonum, SURVEY.md L0-L1); this module is part of
the beyond-reference navigation domain, sitting beside the quaternion
attitude substrate (dynamics/attitude.py) which covers SO(3) in
quaternion coordinates.

Everything is pure jnp, jittable, vmappable; series-safe at the
identity via jnp.sinc-style guarded coefficients (the same idiom as
attitude.quat_from_rotvec).  Tangent (twist) coordinates are ordered
xi = [phi; nu; rho] (rotation, velocity, position), matching the
filter's error-state ordering.
"""

from __future__ import annotations

import jax.numpy as jnp

from .attitude import cross_matrix


def _abc(phi):
    """Series-safe Rodrigues coefficients (a, b, c) with
    a = sin(t)/t, b = (1-cos t)/t^2, c = (t - sin t)/t^3 for t=|phi|.
    Exact limits at t=0: (1, 1/2, 1/6)."""
    t2 = phi @ phi
    t = jnp.sqrt(t2)
    a = jnp.sinc(t / jnp.pi)  # sin(t)/t, exact at 0
    half = 0.5 * t
    b = 0.5 * jnp.sinc(half / jnp.pi) ** 2  # (1-cos t)/t^2, exact at 0
    # c = (t - sin t)/t^3 = (1 - a)/t^2; guard the 0/0 with the limit.
    c = jnp.where(t2 > 1e-12, (1.0 - a) / jnp.maximum(t2, 1e-30),
                  1.0 / 6.0 + t2 / 120.0)
    return a, b, c


def so3_exp(phi):
    """Rodrigues: rotation vector [3] -> rotation matrix [3,3]."""
    a, b, _ = _abc(phi)
    px = cross_matrix(phi)
    return jnp.eye(3, dtype=phi.dtype) + a * px + b * (px @ px)


def so3_log(r):
    """Principal rotation vector of R in (-pi, pi).  Safe at the
    identity; like attitude.rotvec_from_quat, roundtrips are only
    tested below pi (the antipode is a measure-zero set no filter
    iterate lands on)."""
    cos_t = jnp.clip(0.5 * (jnp.trace(r) - 1.0), -1.0, 1.0)
    t = jnp.arccos(cos_t)
    w = jnp.stack([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0],
                   r[1, 0] - r[0, 1]])
    # w = 2 sin(t) * axis; scale = t / (2 sin t), limit 1/2 at t=0.
    sin_t = jnp.sin(t)
    scale = jnp.where(sin_t > 1e-8, t / jnp.maximum(2.0 * sin_t, 1e-30),
                      0.5 + t * t / 12.0)
    return scale * w


def so3_left_jacobian(phi):
    """J_l(phi) = I + b [phi x] + c [phi x]^2 with the _abc
    coefficients — d/dt exp((phi + t dphi)^) = (J_l dphi)^ exp(phi^).
    Satisfies exp(phi^) = I + [phi x] J_l(phi) (used by the iekf
    log-linearity proof)."""
    _, b, c = _abc(phi)
    px = cross_matrix(phi)
    return jnp.eye(3, dtype=phi.dtype) + b * px + c * (px @ px)


def so3_left_jacobian_inv(phi):
    """Closed-form inverse: I - 1/2 [phi x] + k [phi x]^2 with
    k = 1/t^2 - (1 + cos t)/(2 t sin t), limit 1/12 at t=0."""
    t2 = phi @ phi
    t = jnp.sqrt(t2)
    a, b, _ = _abc(phi)
    # k = (1/t^2)(1 - a/(2b)); series limit 1/12 + t^2/720.
    k = jnp.where(t2 > 1e-12,
                  (1.0 - a / (2.0 * jnp.maximum(b, 1e-30)))
                  / jnp.maximum(t2, 1e-30),
                  1.0 / 12.0 + t2 / 720.0)
    px = cross_matrix(phi)
    return jnp.eye(3, dtype=phi.dtype) - 0.5 * px + k * (px @ px)


# ---------------------------------------------------------------------------
# SE_2(3)
# ---------------------------------------------------------------------------


def se23_identity(dtype=None):
    return jnp.eye(5, dtype=dtype)


def se23_from_rvp(r, v, p):
    """Assemble the 5x5 embedding from rotation [3,3], velocity [3],
    position [3]."""
    x = jnp.eye(5, dtype=r.dtype)
    x = x.at[:3, :3].set(r)
    x = x.at[:3, 3].set(v)
    x = x.at[:3, 4].set(p)
    return x


def se23_rvp(x):
    """Split the embedding back into (R, v, p)."""
    return x[:3, :3], x[:3, 3], x[:3, 4]


def se23_inv(x):
    """Closed-form inverse (cheaper and exacter than a generic solve):
    X^-1 = (R^T, -R^T v, -R^T p)."""
    r, v, p = se23_rvp(x)
    rt = r.T
    return se23_from_rvp(rt, -rt @ v, -rt @ p)


def se23_exp(xi):
    """Exponential map: twist xi = [phi; nu; rho] (9) -> X [5,5].
    The linear columns go through the SO(3) left Jacobian:
    v = J_l(phi) nu, p = J_l(phi) rho."""
    phi, nu, rho = xi[:3], xi[3:6], xi[6:9]
    r = so3_exp(phi)
    jl = so3_left_jacobian(phi)
    return se23_from_rvp(r, jl @ nu, jl @ rho)


def se23_log(x):
    """Log map: X -> twist [9] (principal branch)."""
    r, v, p = se23_rvp(x)
    phi = so3_log(r)
    jli = so3_left_jacobian_inv(phi)
    return jnp.concatenate([phi, jli @ v, jli @ p])


def se23_adjoint(x):
    """Ad_X [9,9]: the map with X exp(xi^) X^-1 = exp((Ad_X xi)^)
    (pinned exactly in tests):

        Ad_X = [ R        0  0 ]
               [ [v x] R  R  0 ]
               [ [p x] R  0  R ]
    """
    r, v, p = se23_rvp(x)
    z = jnp.zeros((3, 3), x.dtype)
    return jnp.block([
        [r, z, z],
        [cross_matrix(v) @ r, r, z],
        [cross_matrix(p) @ r, z, r],
    ])


def se23_wedge(xi):
    """xi^ [5,5]: the Lie-algebra embedding of a twist."""
    phi, nu, rho = xi[:3], xi[3:6], xi[6:9]
    m = jnp.zeros((5, 5), xi.dtype)
    m = m.at[:3, :3].set(cross_matrix(phi))
    m = m.at[:3, 3].set(nu)
    m = m.at[:3, 4].set(rho)
    return m
