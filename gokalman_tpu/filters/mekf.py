"""Multiplicative extended Kalman filter (MEKF) for spacecraft
attitude estimation — gyro propagation + vector observations.

The aerospace-standard attitude filter (Lefferts, Markley & Shuster
1982; Markley & Crassidis ch. 6): the quaternion itself is NOT a filter
state (its unit constraint makes its 4x4 covariance singular); instead
a 6-dimensional ERROR state x = [δθ; δβ] (attitude error rotation
vector + gyro-bias error) is filtered around a reference quaternion
that is propagated with the bias-corrected gyro rates and reset
multiplicatively after every update.  This mirrors how the hybrid
CKF/EKF (filters/hybrid.py) filters deviations around a reference
trajectory (hybrid.go:104-204) — the MEKF is that same architecture on
the SO(3) manifold.

Measurements are body-frame observations of known inertial unit
vectors (star tracker, sun sensor, magnetometer), any subset per step
via the framework's padded-mask idiom.  Everything is a NamedTuple
pytree scanned with lax.scan, vmappable over ensembles/constellations.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import linalg
from ..dynamics import attitude as att
from . import vanilla


class Model(NamedTuple):
    ref_dirs: jax.Array  # [M, 3] known inertial unit vectors
    r: jax.Array  # [3M, 3M] measurement noise covariance (stacked)
    sigma_v: jax.Array  # [] gyro angle random walk (rad/sqrt(s))
    sigma_u: jax.Array  # [] gyro rate random walk (rad/s^1.5)
    dt: float  # static step (s)


class State(NamedTuple):
    q: jax.Array  # [4] reference quaternion (scalar-last, unit)
    beta: jax.Array  # [3] gyro bias estimate (rad/s)
    p: jax.Array  # [6, 6] error-state covariance [dtheta; dbeta]
    k: jax.Array  # [] int32


class Estimate(NamedTuple):
    q: jax.Array  # [4] posterior reference quaternion
    beta: jax.Array  # [3] posterior bias
    state: jax.Array  # [6] error-state correction applied this step
    measurement: jax.Array  # [3M] predicted stacked body vectors
    innovation: jax.Array  # [3M]
    covariance: jax.Array  # [6, 6]
    pred_covariance: jax.Array  # [6, 6]
    gain: jax.Array  # [6, 3M]

    def within_nsigma(self, n_sigma) -> jax.Array:
        return linalg.is_within_nsigma(self.state, self.covariance, n_sigma)


def new(q0, p0, ref_dirs, sigma_v, sigma_u, sigma_meas, dt,
        beta0=None):
    """Build (Model, State).

    `sigma_meas`: per-axis 1σ of each body-vector observation (scalar
    or [M]); `p0` is the 6x6 initial [δθ; δβ] covariance.  `ref_dirs`
    rows are normalized here.
    """
    q0 = att.quat_normalize(jnp.asarray(q0))
    p0 = jnp.asarray(p0)
    ref = jnp.asarray(ref_dirs)
    if ref.ndim != 2 or ref.shape[1] != 3:
        raise ValueError(f"ref_dirs must be [M, 3] (got {ref.shape})")
    if p0.shape != (6, 6):
        raise ValueError(f"P0 must be 6x6 [dtheta; dbeta] (got {p0.shape})")
    ref = ref / jnp.linalg.norm(ref, axis=1, keepdims=True)
    m = ref.shape[0]
    sig = jnp.broadcast_to(jnp.asarray(sigma_meas, p0.dtype), (m,))
    r = jnp.diag(jnp.repeat(sig**2, 3))
    beta0 = jnp.zeros(3, p0.dtype) if beta0 is None else jnp.asarray(beta0)
    model = Model(ref, r, jnp.asarray(sigma_v, p0.dtype),
                  jnp.asarray(sigma_u, p0.dtype), float(dt))
    return model, State(q0, beta0, p0, jnp.int32(0))


@linalg.highp
def predict(model: Model, state: State, omega_meas):
    """Gyro time update: reference quaternion through the exact
    rotation exponential at the bias-corrected rate; covariance through
    the Farrenkopf error-state (Φ, Q)."""
    omega = omega_meas - state.beta
    q_pred = att.propagate_quat(state.q, omega, model.dt)
    phi, qk = att.gyro_error_phi_q(omega, model.dt, model.sigma_v,
                                   model.sigma_u, state.p.dtype)
    p_pred = linalg.sym(phi @ state.p @ phi.T + qk)
    return q_pred, p_pred


@linalg.highp
def step(model: Model, state: State, omega_meas, body_obs,
         obs_mask=None):
    """One MEKF step: gyro propagation, stacked vector-observation
    update, multiplicative reset.

    body_obs: [M, 3] observed unit vectors in the body frame;
    obs_mask: [M] bool — which sensors delivered this step (masked rows
    zero out exactly, the all-masked step IS the pure propagation).
    """
    m = model.ref_dirs.shape[0]
    q_pred, p_pred = predict(model, state, omega_meas)

    b_hat = jax.vmap(lambda r_: att.vector_measurement(q_pred, r_))(
        model.ref_dirs)  # [M, 3]
    h = jax.vmap(lambda r_: att.vector_measurement_jacobian(q_pred, r_))(
        model.ref_dirs).reshape(3 * m, 6)
    y_hat = b_hat.reshape(3 * m)
    y = jnp.asarray(body_obs).reshape(3 * m)
    r_k = model.r
    if obs_mask is not None:
        row_mask = jnp.repeat(obs_mask, 3)
        h, r_k, y = vanilla.mask_measurement(h, r_k, y, row_mask)
        y_hat = y_hat * row_mask.astype(y_hat.dtype)

    innovation = y - y_hat
    if obs_mask is not None:
        innovation = innovation * jnp.repeat(obs_mask, 3).astype(y.dtype)
    pht = p_pred @ h.T
    s = h @ pht + r_k
    k_gain = linalg.solve_psd(s, pht.T).T
    dx = k_gain @ innovation
    p = vanilla.joseph_update(p_pred, k_gain, h, r_k)

    # Multiplicative reset: fold δθ into the quaternion, δβ into the
    # bias; the error state returns to zero (its covariance is P).
    q = att.apply_error(q_pred, dx[:3])
    beta = state.beta + dx[3:]

    est = Estimate(
        q=q,
        beta=beta,
        state=dx,
        measurement=y_hat,
        innovation=innovation,
        covariance=p,
        pred_covariance=p_pred,
        gain=k_gain,
    )
    return State(q, beta, p, state.k + 1), est


@linalg.highp
def run(model: Model, state: State, omegas, body_obs, obs_masks=None):
    """lax.scan driver: omegas [T, 3], body_obs [T, M, 3],
    obs_masks [T, M] bool."""

    def body(carry, xs):
        w, obs, mask = xs
        return step(model, carry, w, obs, mask)

    return jax.lax.scan(body, state, (omegas, body_obs, obs_masks))
