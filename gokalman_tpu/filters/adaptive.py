"""Adaptive noise estimation (innovation-based covariance matching).

Beyond the reference: gokalman has no way to estimate its noise
covariances — Q and R are constructor constants.  This module wraps the
vanilla CKF with the classic innovation covariance-matching adaptation
(Mehra 1970 / Mohamed & Schwarz 1999):

- R adaptation: with Ĉ_k the windowed innovation covariance estimate,
  R̂_k = Ĉ_k − H P⁻_k Hᵀ (projected to PSD via diagonal clipping);
- Q adaptation: scale q̂_k on a base Q from the same statistic,
  matching tr(Ĉ) against tr(H P⁻ Hᵀ + R).

The window is an exponential moving average so the whole adaptive
filter stays a single lax.scan with a fixed-size carry.  For offline
(batch) tuning prefer the exact maximum-likelihood route via
vanilla.innovations_log_likelihood + jax.grad; this module is the
online/recursive variant.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import linalg
from ..noise import Noise
from . import vanilla


class State(NamedTuple):
    kf: vanilla.State
    c_innov: jax.Array  # [p, p] EMA innovation outer-product estimate
    r_hat: jax.Array  # [p, p] current measurement-noise estimate
    q_scale: jax.Array  # [] current process-noise scale


class Estimate(NamedTuple):
    base: vanilla.Estimate
    r_hat: jax.Array
    q_scale: jax.Array


def new(x0, p0, f, g, h, noise: Noise, window: int = 30, mode: str = "r"):
    """Adaptive CKF: `window` sets the EMA length (alpha = 1/window).

    `mode` selects WHICH covariance adapts: "r" or "q".  Adapting both
    from the innovation covariance alone is unidentifiable (the R
    estimate absorbs any process-noise mismatch at lag zero), so one is
    held fixed — the standard covariance-matching practice.
    """
    if mode not in ("r", "q"):
        raise ValueError("mode must be 'r' or 'q'")
    model, kf_state = vanilla.new(x0, p0, f, g, h, noise)
    p = model.h.shape[0]
    state = State(
        kf=kf_state,
        c_innov=jnp.asarray(noise.r),
        r_hat=jnp.asarray(noise.r),
        q_scale=jnp.ones((), x0.dtype if hasattr(x0, "dtype") else jnp.float64),
    )
    return model, state, (1.0 / float(window), mode)


@linalg.highp
def step(model: vanilla.Model, state: State, cfg, measurement, control=None):
    """One adaptive update: filter with the current (Q̂, R̂), then
    covariance-match the innovation statistics."""
    alpha, mode = cfg
    q_eff = state.q_scale * model.noise.q
    r_eff = state.r_hat
    model_k = model._replace(noise=model.noise._replace(q=q_eff, r=r_eff))
    kf_state, est = vanilla.step(model_k, state.kf, measurement, control)

    # EMA innovation covariance (Mohamed & Schwarz eq. 18).
    outer = jnp.outer(est.innovation, est.innovation)
    c_innov = (1.0 - alpha) * state.c_innov + alpha * outer

    hph = model.h @ est.pred_covariance @ model.h.T
    if mode == "r":
        # R̂ = Ĉ - H P⁻ Hᵀ, floored to keep it PSD-ish and positive.
        r_new = linalg.sym(c_innov - hph)
        diag_floor = 1e-8 * jnp.trace(c_innov) / c_innov.shape[0]
        d = jnp.clip(jnp.diag(r_new), diag_floor, None)
        r_hat = jnp.diag(d) + (r_new - jnp.diag(jnp.diag(r_new))) * 0.5
        q_scale = state.q_scale
    else:
        # Q scale from innovation-energy mismatch (R held fixed).
        modeled = jnp.trace(hph + r_eff)
        observed = jnp.trace(c_innov)
        ratio = jnp.clip(observed / jnp.maximum(modeled, 1e-30), 0.2, 5.0)
        q_scale = jnp.clip(state.q_scale * ratio**alpha, 1e-3, 1e3)
        r_hat = state.r_hat

    new_state = State(kf_state, c_innov, r_hat, q_scale)
    return new_state, Estimate(est, r_hat, q_scale)


@linalg.highp
def run(model: vanilla.Model, state: State, cfg, measurements, controls=None):
    """lax.scan driver."""

    def body(carry, xs):
        meas, u = xs
        return step(model, carry, cfg, meas, u)

    return jax.lax.scan(body, state, (measurements, controls))


# ---------------------------------------------------------------------------
# Variational-Bayes adaptive R (Särkkä & Nummenmaa 2009)
# ---------------------------------------------------------------------------


class VBState(NamedTuple):
    kf: vanilla.State
    ig_a: jax.Array  # [p] inverse-gamma shape per measurement channel
    ig_b: jax.Array  # [p] inverse-gamma scale (mean variance = b/(a-1))


class VBEstimate(NamedTuple):
    base: vanilla.Estimate
    r_hat: jax.Array  # [p] posterior-mean measurement variances b/a


def vb_new(x0, p0, f, g, h, noise: Noise, rho: float = 0.98,
           prior_strength: float = 3.0, n_iter: int = 3):
    """Variational-Bayes adaptive-R CKF (Särkkä & Nummenmaa, IEEE TAC
    2009): measurement-noise variances are UNKNOWN states with
    inverse-gamma posteriors IG(a_i, b_i) per channel (diagonal R),
    updated jointly with the Gaussian state by fixed-point coordinate
    ascent each step.  Where `new(mode="r")` covariance-matches a
    windowed innovation average (a point estimate with ad-hoc PSD
    flooring), this carries a full conjugate posterior: uncertainty in
    R widens the effective innovation covariance early on and
    contracts as evidence accumulates.

    `noise.r`'s diagonal seeds the prior mean; `prior_strength` is the
    prior's pseudo-observation count (a_0); `rho` is the variance-
    dynamics forgetting factor (a,b decay each predict, so the filter
    can track drifting R — rho=1 freezes learning-only behavior);
    `n_iter` fixed VB sweeps keep the step jittable (3 suffices; the
    iteration is a contraction, Särkkä §IV).

    Returns (model, state, cfg); thread cfg into vb_step/vb_run.
    """
    model, kf_state = vanilla.new(x0, p0, f, g, h, noise)
    p = model.h.shape[0]
    a0 = jnp.full((p,), float(prior_strength), kf_state.x.dtype)
    b0 = a0 * jnp.diag(jnp.asarray(noise.r))
    if not 0.0 < rho <= 1.0:
        raise ValueError(f"rho must be in (0, 1] (got {rho})")
    return model, VBState(kf_state, a0, b0), (float(rho), int(n_iter))


@linalg.highp
def vb_step(model: vanilla.Model, state: VBState, cfg, measurement,
            control=None, has=None):
    """One VB-AKF step: predict, decay the IG posterior (variance
    dynamics), then alternate (state update given R̂) and (IG update
    given posterior residuals) for n_iter sweeps.

    `has` masks the step: when False both the KF update and the IG
    update are skipped (a missing measurement carries no information
    about R either) — the IG decay still applies.
    """
    rho, n_iter = cfg
    x_pred, p_pred = vanilla.predict(model, state.kf, control)
    h = model.h
    y_hat = h @ state.kf.x

    # Heuristic variance dynamics (Särkkä eq. 22): spread the IG
    # posterior, keeping its mean b/(a-1) unchanged-ish.
    a_pred = rho * state.ig_a
    b_pred = rho * state.ig_b

    a_post = a_pred + 0.5  # fixed across sweeps (one datum per channel)
    b_post = b_pred
    x, p = x_pred, p_pred
    k_gain = jnp.zeros((x_pred.shape[0], h.shape[0]), x_pred.dtype)
    innovation = measurement - h @ x_pred
    for _ in range(n_iter):
        r_hat = jnp.diag(b_post / a_post)
        pht = p_pred @ h.T
        s = h @ pht + r_hat
        k_gain = linalg.solve_psd(s, pht.T).T
        x = x_pred + k_gain @ innovation
        p = vanilla.joseph_update(p_pred, k_gain, h, r_hat)
        resid = measurement - h @ x
        b_post = b_pred + 0.5 * (resid**2 + jnp.diagonal(h @ p @ h.T))

    if has is not None:
        x = jnp.where(has, x, x_pred)
        p = jnp.where(has, p, p_pred)
        k_gain = jnp.where(has, k_gain, jnp.zeros_like(k_gain))
        innovation = jnp.where(has, innovation, jnp.zeros_like(innovation))
        a_post = jnp.where(has, a_post, a_pred)
        b_post = jnp.where(has, b_post, b_pred)

    est = vanilla.Estimate(
        state=x,
        measurement=y_hat,
        innovation=innovation,
        covariance=p,
        pred_covariance=p_pred,
        gain=k_gain,
    )
    new_state = VBState(vanilla.State(x, p, state.kf.k + 1), a_post, b_post)
    return new_state, VBEstimate(est, b_post / a_post)


@linalg.highp
def vb_run(model: vanilla.Model, state: VBState, cfg, measurements,
           controls=None, meas_masks=None):
    """lax.scan driver for the VB adaptive filter."""

    def body(carry, xs):
        meas, u, m = xs
        return vb_step(model, carry, cfg, meas, u, m)

    return jax.lax.scan(body, state, (measurements, controls, meas_masks))
