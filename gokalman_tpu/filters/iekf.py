"""Right-invariant extended Kalman filter (IEKF) on SE_2(3) for
inertial navigation — IMU strapdown propagation + landmark / position
updates (Barrau & Bonnabel 2017; Hartley, Ghaffari, Eustice & Grizzle
2020 for the imperfect-IEKF bias treatment).

Why this exists beside the MEKF (filters/mekf.py): the MEKF linearizes
the attitude error about the current estimate, so its error dynamics
depend on the estimated trajectory and a badly-initialized filter
linearizes in the wrong place.  The IMU dynamics on SE_2(3),

    R' = R [omega x],   v' = R a + g,   p' = v,

are *group-affine*, so the right-invariant error eta = Xhat X^-1
evolves AUTONOMOUSLY — independent of the trajectory — and its log is
EXACTLY linear, for arbitrarily large errors, not just to first order.
In discrete form (pinned digit-level in tests/test_iekf.py):

    xi_{k+1} = Phi xi_k,   Phi = I + A dt + A^2 dt^2/2 (exact: A^3 = 0)
    A = [ 0      0  0 ]
        [ [g x]  0  0 ]      xi = [phi; nu; rho]  (rotation, velocity,
        [ 0      I  0 ]                            position twist)

Consequences: the covariance propagation is exact whatever the state
estimate, landmark measurements have a state-INDEPENDENT Jacobian, and
the filter converges from initialization errors that saturate a
linearized filter.

Measurement forms:
- Body-frame landmark observations y = R^T (l - p) + w (vision /
  lidar / radar fixes of known map points) — the left-invariant
  observation type Y = X^-1 b, the natural match for the
  right-invariant error: innovation z = Rhat y + phat - l with
  H = [-[l x], 0, I] independent of the state.
- Body-frame velocity observations y = R^T v + w (wheel odometry,
  Doppler radar/DVL; y = 0 with a small R is the classic ZUPT
  zero-velocity update) — also an exact invariant form, via
  b = e4: innovation z = vhat - Rhat y with H = [0, I, 0], again
  state-independent.
- World-frame position observations y = p + w (GPS): supported via the
  standard linearization H = [[phat x], 0, -I] (state-dependent — this
  observation type does not fit the right-invariant form; documented
  trade-off, Hartley sec. 6).

IMU biases (with_bias=True) follow the "imperfect IEKF": the bias
error zeta = bhat - b rides along as ordinary Euclidean state, the
A-matrix gains the (state-dependent) coupling columns through Ad_Xhat,
and Phi falls back to the truncated series I + A dt + A^2 dt^2/2.

The reference framework has no navigation domain at all; within this
repo the IEKF completes the attitude/navigation tier: MEKF (local
error, gyro + vector obs), USQUE (sigma-point), IEKF (global
group-affine error, full strapdown INS).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import linalg
from ..dynamics import liegroup as lg
from ..dynamics.attitude import cross_matrix
from . import vanilla


class Model(NamedTuple):
    g: jax.Array  # [3] gravity in the world frame (e.g. [0,0,-9.81])
    sigma_g: jax.Array  # [] gyro white noise (rad/s/sqrt(Hz))
    sigma_a: jax.Array  # [] accel white noise (m/s^2/sqrt(Hz))
    sigma_bg: jax.Array  # [] gyro-bias random walk (with_bias)
    sigma_ba: jax.Array  # [] accel-bias random walk (with_bias)
    landmarks: jax.Array  # [L, 3] default world landmark positions
    r_land: jax.Array  # [3L, 3L] stacked landmark measurement noise
    r_gps: jax.Array  # [3, 3] position-observation noise
    r_vel: jax.Array  # [3, 3] body-velocity-observation noise
    dt: float  # static IMU step (s)
    with_bias: bool  # static: estimate IMU biases (15-dim error state)


class State(NamedTuple):
    x: jax.Array  # [5, 5] SE_2(3) estimate (R, v, p)
    bias: jax.Array  # [6] IMU bias estimate [b_gyro; b_accel]
    p: jax.Array  # [d, d] error covariance, d = 9 (15 with biases)
    k: jax.Array  # [] int32


class Estimate(NamedTuple):
    rot: jax.Array  # [3, 3] posterior attitude (world -> body is R^T)
    vel: jax.Array  # [3] world-frame velocity
    pos: jax.Array  # [3] world-frame position
    bias: jax.Array  # [6]
    state: jax.Array  # [d] error-twist correction applied this step
    innovation: jax.Array  # [3L (+3)] stacked innovation (world frame)
    covariance: jax.Array  # [d, d]
    pred_covariance: jax.Array  # [d, d]
    gain: jax.Array  # [d, 3L (+3)]

    def within_nsigma(self, n_sigma) -> jax.Array:
        return linalg.is_within_nsigma(self.state, self.covariance,
                                       n_sigma)


def _dim(with_bias: bool) -> int:
    return 15 if with_bias else 9


def new(r0, v0, p0, cov0, landmarks, sigma_g, sigma_a, sigma_meas, dt,
        g=None, bias0=None, sigma_bg=0.0, sigma_ba=0.0,
        with_bias: bool = False, sigma_gps=1.0, sigma_vel=0.1):
    """Build (Model, State).

    r0 [3,3] / v0 [3] / p0 [3]: initial attitude (body->world),
    velocity, position; cov0 [d,d] initial covariance of the
    right-invariant error twist (d = 9, or 15 with biases);
    landmarks [L,3] world positions of known map points (per-step
    override in `step`); sigma_meas: per-landmark 1-sigma (scalar or
    [L]); g: world gravity vector (default [0,0,-9.81]).
    """
    r0 = jnp.asarray(r0)
    dt_ = r0.dtype
    x0 = lg.se23_from_rvp(r0, jnp.asarray(v0, dt_), jnp.asarray(p0, dt_))
    cov0 = jnp.asarray(cov0)
    d = _dim(with_bias)
    if cov0.shape != (d, d):
        raise ValueError(
            f"cov0 must be {d}x{d} for with_bias={with_bias} "
            f"(got {cov0.shape})")
    lm = jnp.atleast_2d(jnp.asarray(landmarks, dt_))
    if lm.shape[1] != 3:
        raise ValueError(f"landmarks must be [L, 3] (got {lm.shape})")
    nl = lm.shape[0]
    sig = jnp.broadcast_to(jnp.asarray(sigma_meas, dt_), (nl,))
    r_land = jnp.diag(jnp.repeat(sig**2, 3))
    g = (jnp.asarray([0.0, 0.0, -9.81], dt_) if g is None
         else jnp.asarray(g, dt_))
    bias0 = (jnp.zeros(6, dt_) if bias0 is None
             else jnp.asarray(bias0, dt_))
    model = Model(g, jnp.asarray(sigma_g, dt_), jnp.asarray(sigma_a, dt_),
                  jnp.asarray(sigma_bg, dt_), jnp.asarray(sigma_ba, dt_),
                  lm, r_land,
                  jnp.asarray(sigma_gps, dt_) ** 2 * jnp.eye(3, dtype=dt_),
                  jnp.asarray(sigma_vel, dt_) ** 2 * jnp.eye(3, dtype=dt_),
                  float(dt), bool(with_bias))
    return model, State(x0, bias0, cov0, jnp.int32(0))


def _phi_q(model: Model, state: State):
    """Discrete error transition Phi and process noise Q for the
    right-invariant error.  Bias-free: Phi is EXACT (A nilpotent).
    With biases: A gains -Ad-weighted coupling columns (Hartley
    eq. 26-27, zeta = bhat - b) and Phi is the standard truncated
    series.  IMU noise maps into the world-frame error through
    Ad_Xhat (blockdiag with I on the bias rows)."""
    dt = model.dt
    dtype = state.p.dtype
    gx = cross_matrix(model.g)
    eye3 = jnp.eye(3, dtype=dtype)
    z3 = jnp.zeros((3, 3), dtype)
    r, v, p = lg.se23_rvp(state.x)
    if model.with_bias:
        a = jnp.block([
            [z3, z3, z3, -r, z3],
            [gx, z3, z3, -cross_matrix(v) @ r, -r],
            [z3, eye3, z3, -cross_matrix(p) @ r, z3],
            [z3, z3, z3, z3, z3],
            [z3, z3, z3, z3, z3],
        ])
        phi = (jnp.eye(15, dtype=dtype) + a * dt
               + (a @ a) * (0.5 * dt**2))
        ad = jax.scipy.linalg.block_diag(lg.se23_adjoint(state.x),
                                         jnp.eye(6, dtype=dtype))
        qc = jnp.diag(jnp.concatenate([
            jnp.full(3, model.sigma_g**2),
            jnp.full(3, model.sigma_a**2),
            jnp.zeros(3, dtype),
            jnp.full(3, model.sigma_bg**2),
            jnp.full(3, model.sigma_ba**2),
        ]))
    else:
        # Exact discrete transition of the log error (A^3 = 0):
        # phi-row [I, 0, 0]; nu-row [gx dt, I, 0];
        # rho-row [gx dt^2/2, I dt, I].
        phi = jnp.block([
            [eye3, z3, z3],
            [gx * dt, eye3, z3],
            [gx * (0.5 * dt**2), eye3 * dt, eye3],
        ])
        ad = lg.se23_adjoint(state.x)
        qc = jnp.diag(jnp.concatenate([
            jnp.full(3, model.sigma_g**2),
            jnp.full(3, model.sigma_a**2),
            jnp.zeros(3, dtype),
        ]))
    q = phi @ (ad @ qc @ ad.T) @ phi.T * dt
    return phi, linalg.sym(q)


@linalg.highp
def predict(model: Model, state: State, gyro, accel):
    """IMU strapdown time update: bias-corrected body rate/specific
    force, exact rotation increment, trapezoidal velocity/position."""
    w = jnp.asarray(gyro) - state.bias[:3]
    a_b = jnp.asarray(accel) - state.bias[3:]
    r, v, p = lg.se23_rvp(state.x)
    a_w = r @ a_b + model.g
    dt = model.dt
    r_new = r @ lg.so3_exp(w * dt)
    v_new = v + a_w * dt
    p_new = p + v * dt + 0.5 * a_w * dt**2
    phi, q = _phi_q(model, state)
    p_cov = linalg.sym(phi @ state.p @ phi.T + q)
    return lg.se23_from_rvp(r_new, v_new, p_new), p_cov


def _apply_correction(model: Model, x, bias, xi):
    """Right-invariant correction: Xhat <- exp(-xi_pose) Xhat,
    bhat <- bhat - xi_bias (the estimated error is REMOVED: with
    eta = Xhat X^-1 = exp(xi), exp(-xi) Xhat = X)."""
    x_new = lg.se23_exp(-xi[:9]) @ x
    if model.with_bias:
        bias = bias - xi[9:]
    return x_new, bias


@linalg.highp
def step(model: Model, state: State, gyro, accel, body_obs=None,
         obs_mask=None, landmarks=None, gps_obs=None, gps_mask=None,
         vel_obs=None, vel_mask=None):
    """One IEKF step: strapdown predict + stacked landmark update
    (+ optional GPS position and/or body-velocity row blocks).

    body_obs: [L, 3] body-frame observations of the landmarks
    (None = pure prediction); obs_mask: [L] bool validity (masked rows
    zero exactly — NaN poison in masked slots cannot leak, the
    repo-wide padded-mask contract); landmarks: [L, 3] per-step world
    positions overriding the model's; gps_obs: [3] world position
    observation; gps_mask: scalar bool; vel_obs: [3] body-frame
    velocity observation (odometer/Doppler; zeros = ZUPT) with
    vel_mask: scalar bool.
    """
    x_pred, p_pred = predict(model, state, gyro, accel)
    if body_obs is None and gps_obs is None and vel_obs is None:
        est = Estimate(
            rot=x_pred[:3, :3], vel=x_pred[:3, 3], pos=x_pred[:3, 4],
            bias=state.bias,
            state=jnp.zeros(state.p.shape[0], state.p.dtype),
            innovation=jnp.zeros(0, state.p.dtype),
            covariance=p_pred, pred_covariance=p_pred,
            gain=jnp.zeros((state.p.shape[0], 0), state.p.dtype),
        )
        return State(x_pred, state.bias, p_pred, state.k + 1), est

    d = state.p.shape[0]
    dtype = state.p.dtype
    r_hat, v_hat, p_hat = lg.se23_rvp(x_pred)
    z3 = jnp.zeros((3, 3), dtype)
    rows_h, rows_z, rows_r, rows_mask = [], [], [], []

    if body_obs is not None:
        lm = (model.landmarks if landmarks is None
              else jnp.asarray(landmarks))
        nl = lm.shape[0]
        y = jnp.asarray(body_obs)
        # z = Rhat y + phat - l = [xi_phi x] l + xi_rho + Rhat w
        z = (y @ r_hat.T + p_hat[None, :] - lm).reshape(3 * nl)

        def h_row(l_i):
            cols = [-cross_matrix(l_i), z3, jnp.eye(3, dtype=dtype)]
            if model.with_bias:
                cols += [z3, z3]
            return jnp.concatenate(cols, axis=1)

        h = jax.vmap(h_row)(lm).reshape(3 * nl, d)
        # noise mapped through the attitude: N = Rhat R_w Rhat^T
        rb = jax.scipy.linalg.block_diag(*[r_hat] * nl)
        n = rb @ model.r_land @ rb.T
        mask = (jnp.ones(nl, bool) if obs_mask is None
                else jnp.asarray(obs_mask, bool))
        rows_h.append(h)
        rows_z.append(z)
        rows_r.append(n)
        rows_mask.append(jnp.repeat(mask, 3))

    if vel_obs is not None:
        # exact right-invariant form via b = e4: z = vhat - Rhat y
        # ~= xi_nu - Rhat w, so H = [0, I, 0] (state-independent) and
        # the noise maps through the attitude like the landmark rows
        zv = v_hat - r_hat @ jnp.asarray(vel_obs)
        cols = [z3, jnp.eye(3, dtype=dtype), z3]
        if model.with_bias:
            cols += [z3, z3]
        hv = jnp.concatenate(cols, axis=1)
        mv = (jnp.ones((), bool) if vel_mask is None
              else jnp.asarray(vel_mask, bool))
        rows_h.append(hv)
        rows_z.append(zv)
        rows_r.append(r_hat @ model.r_vel @ r_hat.T)
        rows_mask.append(jnp.broadcast_to(mv, (3,)))

    if gps_obs is not None:
        # d_gps = y - phat = [phat x] xi_phi - xi_rho + w  (see module
        # docstring: the standard-linearization observation type)
        zg = jnp.asarray(gps_obs) - p_hat
        cols = [cross_matrix(p_hat), z3, -jnp.eye(3, dtype=dtype)]
        if model.with_bias:
            cols += [z3, z3]
        hg = jnp.concatenate(cols, axis=1)
        mg = (jnp.ones((), bool) if gps_mask is None
              else jnp.asarray(gps_mask, bool))
        rows_h.append(hg)
        rows_z.append(zg)
        rows_r.append(model.r_gps)
        rows_mask.append(jnp.broadcast_to(mg, (3,)))

    h = jnp.concatenate(rows_h, axis=0)
    z = jnp.concatenate(rows_z)
    r_k = jax.scipy.linalg.block_diag(*rows_r)
    row_mask = jnp.concatenate(rows_mask)
    # jnp.where (not multiply-by-mask): NaN/inf poison in masked
    # observation or landmark slots must not leak (0*NaN = NaN — the
    # padded-slot fuzz contract, tests/test_tracking_fuzz.py idiom).
    h = jnp.where(row_mask[:, None], h, 0.0)
    z = jnp.where(row_mask, z, 0.0)
    h, r_k, _ = vanilla.mask_measurement(h, r_k, None, row_mask)

    pht = p_pred @ h.T
    s = h @ pht + r_k
    k_gain = linalg.solve_psd(s, pht.T).T
    xi = k_gain @ z
    p = vanilla.joseph_update(p_pred, k_gain, h, r_k)
    x_new, bias = _apply_correction(model, x_pred, state.bias, xi)

    est = Estimate(
        rot=x_new[:3, :3], vel=x_new[:3, 3], pos=x_new[:3, 4],
        bias=bias, state=xi, innovation=z, covariance=p,
        pred_covariance=p_pred, gain=k_gain,
    )
    return State(x_new, bias, p, state.k + 1), est


@linalg.highp
def run(model: Model, state: State, gyros, accels, body_obs=None,
        obs_masks=None, landmarks=None, gps_obs=None, gps_masks=None,
        vel_obs=None, vel_masks=None):
    """lax.scan driver: gyros/accels [T, 3]; body_obs [T, L, 3] with
    obs_masks [T, L] bool (or None for dead reckoning); landmarks
    [T, L, 3] per-step world positions or None; gps_obs [T, 3] with
    gps_masks [T] bool or None; vel_obs [T, 3] with vel_masks [T]."""

    def body(carry, xs):
        w, a, obs, mask, lms, gobs, gmask, vobs, vmask = xs
        return step(model, carry, w, a, obs, mask, lms, gobs, gmask,
                    vobs, vmask)

    return jax.lax.scan(
        body, state,
        (gyros, accels, body_obs, obs_masks, landmarks, gps_obs,
         gps_masks, vel_obs, vel_masks))


@linalg.highp
def rts_smoother(model: Model, est: Estimate, gyros, accels):
    """Invariant RTS smoother over a recorded filter trace
    (Chauchat, Barrau & Bonnabel 2018 — the Lie-group RTS run in the
    right-invariant error coordinates, where the IMU error dynamics
    are exactly log-linear so the linear-RTS backward recursion needs
    no relinearization):

        d_{k+1} = log( X_{k+1|T} X_{k+1|k}^{-1} )   (+ bias rows)
        G_k     = P_{k|k} Phi_{k+1}^T P_{k+1|k}^{-1}
        X_{k|T} = exp( (G_k d_{k+1})_pose ) X_{k|k}
        P_{k|T} = P_{k|k} + G_k (P_{k+1|T} - P_{k+1|k}) G_k^T

    `est` is the stacked Estimate from `run` ([T] leading axis);
    `gyros`/`accels` the same IMU streams — the predicted means
    X_{k+1|k} are re-derived from the posterior at k (P_{k+1|k} is
    already recorded in est.pred_covariance).  Returns
    (rot, vel, pos, bias, covariance) arrays, [T] leading axis.
    """
    t_steps = est.covariance.shape[0]
    d = est.covariance.shape[-1]

    def strapdown(rot, vel, pos, bias, gyro, accel):
        w = gyro - bias[:3]
        a_w = rot @ (accel - bias[3:]) + model.g
        dt = model.dt
        return lg.se23_from_rvp(rot @ lg.so3_exp(w * dt),
                                vel + a_w * dt,
                                pos + vel * dt + 0.5 * a_w * dt**2)

    def backward(carry, xs):
        x_next_s, bias_next_s, p_next_s = carry
        rot_k, vel_k, pos_k, bias_k, p_k, p_pred_next, gyro_n, acc_n = xs
        x_pred_next = strapdown(rot_k, vel_k, pos_k, bias_k,
                                gyro_n, acc_n)
        state_k = State(lg.se23_from_rvp(rot_k, vel_k, pos_k), bias_k,
                        p_k, jnp.int32(0))
        phi, _ = _phi_q(model, state_k)
        # smoothed-minus-predicted in invariant coordinates
        d_pose = lg.se23_log(x_next_s @ lg.se23_inv(x_pred_next))
        if model.with_bias:
            d_vec = jnp.concatenate([d_pose, bias_next_s - bias_k])
        else:
            d_vec = d_pose
        gain = linalg.solve_psd(p_pred_next, phi @ p_k).T
        xi = gain @ d_vec
        x_s = lg.se23_exp(xi[:9]) @ lg.se23_from_rvp(rot_k, vel_k, pos_k)
        bias_s = bias_k + (xi[9:] if model.with_bias else 0.0)
        p_s = linalg.sym(p_k + gain @ (p_next_s - p_pred_next) @ gain.T)
        r_s, v_s, pp_s = lg.se23_rvp(x_s)
        return (x_s, bias_s, p_s), (r_s, v_s, pp_s, bias_s, p_s)

    x_last = lg.se23_from_rvp(est.rot[-1], est.vel[-1], est.pos[-1])
    init = (x_last, est.bias[-1], est.covariance[-1])
    xs = (est.rot[:-1], est.vel[:-1], est.pos[:-1], est.bias[:-1],
          est.covariance[:-1], est.pred_covariance[1:],
          jnp.asarray(gyros)[1:], jnp.asarray(accels)[1:])
    _, (r_s, v_s, p_s, b_s, cov_s) = jax.lax.scan(
        backward, init, xs, reverse=True)
    rot = jnp.concatenate([r_s, est.rot[-1:]], axis=0)
    vel = jnp.concatenate([v_s, est.vel[-1:]], axis=0)
    pos = jnp.concatenate([p_s, est.pos[-1:]], axis=0)
    bias = jnp.concatenate([b_s, est.bias[-1:]], axis=0)
    cov = jnp.concatenate([cov_s, est.covariance[-1:]], axis=0)
    return rot, vel, pos, bias, cov


def error_twist(state_or_x, r_true, v_true, p_true):
    """Right-invariant error twist xi = log(Xhat X_true^-1) — the
    coordinates the covariance lives in; NEES = xi^T P^-1 xi (pose
    block).  Accepts a State or a raw [5,5] group element."""
    x = state_or_x.x if isinstance(state_or_x, State) else state_or_x
    xt = lg.se23_from_rvp(jnp.asarray(r_true), jnp.asarray(v_true),
                          jnp.asarray(p_true))
    return lg.se23_log(x @ lg.se23_inv(xt))
