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
