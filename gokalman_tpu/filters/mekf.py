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
         obs_mask=None, ref_dirs=None):
    """One MEKF step: gyro propagation, stacked vector-observation
    update, multiplicative reset.

    body_obs: [M, 3] observed unit vectors in the body frame;
    obs_mask: [M] bool — which sensors delivered this step (masked rows
    zero out exactly, the all-masked step IS the pure propagation);
    ref_dirs: [M, 3] per-step reference directions overriding the
    model's (time-varying references — a magnetometer's field direction
    along an orbit; what makes a single-sensor attitude problem
    observable at all).
    """
    refs = model.ref_dirs if ref_dirs is None else jnp.asarray(ref_dirs)
    m = refs.shape[0]
    q_pred, p_pred = predict(model, state, omega_meas)

    b_hat = jax.vmap(lambda r_: att.vector_measurement(q_pred, r_))(
        refs)  # [M, 3]
    h = jax.vmap(lambda r_: att.vector_measurement_jacobian(q_pred, r_))(
        refs).reshape(3 * m, 6)
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
def run(model: Model, state: State, omegas, body_obs, obs_masks=None,
        ref_dirs=None):
    """lax.scan driver: omegas [T, 3], body_obs [T, M, 3],
    obs_masks [T, M] bool, ref_dirs [T, M, 3] (time-varying
    references) or None."""

    def body(carry, xs):
        w, obs, mask, refs = xs
        return step(model, carry, w, obs, mask, refs)

    return jax.lax.scan(body, state,
                        (omegas, body_obs, obs_masks, ref_dirs))


# ---------------------------------------------------------------------------
# USQUE — UnScented QUaternion Estimator (Crassidis & Markley 2003)
# ---------------------------------------------------------------------------


def _grp_from_quat(dq, a: float, f: float):
    """Generalized Rodrigues parameters of an error quaternion:
    δp = f·δq_v / (a + δq_4) (Crassidis-Markley eq. 18)."""
    dq = jnp.where(dq[3] < 0, -dq, dq)  # shortest arc
    return f * dq[:3] / (a + dq[3])


def _quat_from_grp(dp, a: float, f: float):
    """Inverse map (Crassidis-Markley eq. 17a-b)."""
    n2 = dp @ dp
    dq4 = (-a * n2 + f * jnp.sqrt(f**2 + (1.0 - a**2) * n2)) / (f**2 + n2)
    dqv = dp * (a + dq4) / f
    return jnp.concatenate([dqv, dq4[None]])


@linalg.highp
def usque_step(model: Model, state: State, omega_meas, body_obs,
               obs_mask=None, ref_dirs=None, a: float = 1.0,
               lam: float = 1.0):
    """One USQUE step: the unscented counterpart of `step` — sigma
    points live in the 6-dim [δp (generalized Rodrigues); δβ] error
    space, each is converted to a full quaternion, propagated through
    the EXACT nonlinear kinematics at its OWN bias-corrected rate, and
    re-expressed as a GRP error about the propagated center; the
    measurement update is a standard unscented update on the propagated
    points.  No Jacobians anywhere — where the MEKF linearizes both the
    ω-coupling in Φ and the vector-observation geometry, USQUE carries
    them to sigma-point accuracy, which is what matters at LARGE
    attitude uncertainty (pinned in tests: 120° initial error on a
    single-vector sensor where the MEKF's linearized update saturates).

    `a`/`lam`: GRP parameter (f = 2(a+1)) and UT scaling λ (Crassidis'
    recommended a=1, λ=1).  The gyro noise Q enters split half before
    propagation (into the sigma spread) and half after (additive), the
    standard USQUE treatment of process noise through a nonlinear map.
    """
    f_grp = 2.0 * (a + 1.0)
    nmax = 6
    dt_ = state.p.dtype
    refs = model.ref_dirs if ref_dirs is None else jnp.asarray(ref_dirs)
    m = refs.shape[0]

    omega_c = omega_meas - state.beta
    _, qk = att.gyro_error_phi_q(omega_c, model.dt, model.sigma_v,
                                 model.sigma_u, dt_)
    p_sig = state.p + 0.5 * qk
    s = linalg.chol_or_eigh_sqrt((nmax + lam) * p_sig)  # lower
    cols = jnp.concatenate([s.T, -s.T], axis=0)  # [12, 6]
    chis = jnp.concatenate([jnp.zeros((1, nmax), dt_), cols], axis=0)

    def propagate_point(chi):
        dq = _quat_from_grp(chi[:3], a, f_grp)
        q_i = att.quat_normalize(att.quat_compose(dq, state.q))
        beta_i = state.beta + chi[3:]
        q_prop = att.propagate_quat(q_i, omega_meas - beta_i, model.dt)
        return q_prop, beta_i

    q_props, betas = jax.vmap(propagate_point)(chis)
    q_center = q_props[0]

    def to_error(q_prop, beta_i):
        dq = att.quat_compose(q_prop, att.quat_conj(q_center))
        return jnp.concatenate([_grp_from_quat(dq, a, f_grp),
                                beta_i - state.beta])

    chis_prop = jax.vmap(to_error)(q_props, betas)  # [13, 6]

    w0 = lam / (nmax + lam)
    wi = 1.0 / (2.0 * (nmax + lam))
    wm = jnp.concatenate([jnp.asarray([w0], dt_),
                          jnp.full((2 * nmax,), wi, dt_)])
    x_pred = wm @ chis_prop
    dev = chis_prop - x_pred[None, :]
    p_pred = linalg.sym(jnp.einsum("i,ij,ik->jk", wm, dev, dev)
                        + 0.5 * qk)

    # measurement sigma points: body-frame vectors from each propagated
    # quaternion (exact geometry, no [b x] linearization)
    def obs_point(q_prop):
        return jax.vmap(lambda r_: att.vector_measurement(q_prop, r_))(
            refs).reshape(3 * m)

    zpts = jax.vmap(obs_point)(q_props)  # [13, 3m]
    y_hat = wm @ zpts
    zdev = zpts - y_hat[None, :]
    r_k = model.r
    y = jnp.asarray(body_obs).reshape(3 * m)
    if obs_mask is not None:
        row = jnp.repeat(jnp.asarray(obs_mask, bool), 3)
        rowf = row.astype(dt_)
        zdev = zdev * rowf[None, :]
        y = y * rowf
        y_hat = y_hat * rowf
        r_k = r_k * (rowf[:, None] * rowf[None, :]) + jnp.diag(1.0 - rowf)
    s_cov = linalg.sym(jnp.einsum("i,ij,ik->jk", wm, zdev, zdev) + r_k)
    cross = jnp.einsum("i,ij,ik->jk", wm, dev, zdev)  # [6, 3m]
    k_gain = linalg.solve_psd(s_cov, cross.T).T
    innovation = y - y_hat
    dx = x_pred + k_gain @ innovation
    p = linalg.sym(p_pred - k_gain @ s_cov @ k_gain.T)

    q_new = att.quat_normalize(att.quat_compose(
        _quat_from_grp(dx[:3], a, f_grp), q_center))
    beta = state.beta + dx[3:]

    est = Estimate(
        q=q_new,
        beta=beta,
        state=dx,
        measurement=y_hat,
        innovation=innovation,
        covariance=p,
        pred_covariance=p_pred,
        gain=k_gain,
    )
    return State(q_new, beta, p, state.k + 1), est


@linalg.highp
def usque_run(model: Model, state: State, omegas, body_obs,
              obs_masks=None, ref_dirs=None, a: float = 1.0,
              lam: float = 1.0):
    """lax.scan driver for USQUE."""

    def body(carry, xs):
        w, obs, mask, refs = xs
        return usque_step(model, carry, w, obs, mask, refs, a=a, lam=lam)

    return jax.lax.scan(body, state,
                        (omegas, body_obs, obs_masks, ref_dirs))
