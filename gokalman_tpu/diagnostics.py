"""Filter-health diagnostics: innovation whiteness, chi-square bounds,
covariance sanity.

The reference's only runtime health signal is the IsWithinNσ console
warning (vanilla.go:231-239) and the offline NEES/NIS means
(chisquare.go:85-92).  This module provides the standard quantitative
consistency toolkit (Bar-Shalom, Li & Kirubarajan ch. 5) as pure,
jittable reductions over a run's stacked estimates:

- a filter is CONSISTENT iff its innovations are zero-mean, white, and
  sized by the predicted covariance; each property gets its own test
  statistic with an acceptance region, so a broken Q/R shows up as a
  named failure instead of silent drift.

Everything operates on plain arrays ([T, p] innovations etc.), so it
applies to any filter family here — linear, hybrid, UKF, ensemble —
and to banks via vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class WhitenessResult(NamedTuple):
    statistic: jax.Array  # [] Ljung-Box style Q over the tested lags
    autocorr: jax.Array  # [lags] pooled innovation autocorrelation
    threshold: float  # chi-square 95% acceptance bound
    passed: jax.Array  # [] bool


def chi2_interval(dof: float, n_samples: int, alpha: float = 0.05):
    """Two-sided acceptance interval for the MEAN of `n_samples` iid
    chi-square(dof) variables (the NEES/NIS gate of Bar-Shalom §5.4):
    [chi2.ppf(a/2, N*dof), chi2.ppf(1-a/2, N*dof)] / N.  Host-side
    (scipy) — this is config-time code."""
    from scipy.stats import chi2

    lo = chi2.ppf(alpha / 2.0, n_samples * dof) / n_samples
    hi = chi2.ppf(1.0 - alpha / 2.0, n_samples * dof) / n_samples
    return float(lo), float(hi)


def nees_test(nees_sequence, dof: int, alpha: float = 0.05):
    """(mean, lo, hi, passed) for a [T] NEES sequence: the time-average
    test with the exact chi-square interval.  Use on
    chisquare/ops.ensemble outputs or a single run's
    (x_true - x̂)ᵀ P⁻¹ (x_true - x̂) trace."""
    seq = jnp.asarray(nees_sequence)
    lo, hi = chi2_interval(dof, int(seq.shape[0]), alpha)
    mean = jnp.mean(seq)
    return mean, lo, hi, (mean >= lo) & (mean <= hi)


def innovation_whiteness(innovations, lags: int = 10,
                         alpha: float = 0.05) -> WhitenessResult:
    """Ljung-Box style whiteness test on a [T, p] innovation sequence.

    The innovations are first whitened by their SAMPLE covariance (the
    component-wise statistic is only chi-square if the p components are
    independent — a correlated sensor pair would otherwise double the
    false-alarm rate), then the per-component Ljung-Box statistics
    Q = T (T+2) Σ_l r_l²/(T-l) are summed: approximately
    chi-square(lags * p) under the white-noise hypothesis.  A filter
    with mis-sized Q/R or a biased model produces serially correlated
    innovations long before the state error is visible.
    """
    from scipy.stats import chi2

    y = jnp.asarray(innovations)
    if y.ndim == 1:
        y = y[:, None]
    t, p = y.shape
    if t <= lags:
        raise ValueError(f"need more than lags={lags} samples, got {t}")
    yc = y - jnp.mean(y, axis=0, keepdims=True)
    # Decorrelate components: z = L^{-1} yc with L L^T the sample cov.
    # Scale-aware jitter keeps the Cholesky finite when a component is
    # (near-)constant — e.g. a fully-masked padded measurement row.
    cov = yc.T @ yc / (t - 1)
    jitter = 1e-9 * (jnp.trace(cov) / p) + 1e-30
    l = jnp.linalg.cholesky(cov + jitter * jnp.eye(p, dtype=y.dtype))
    yc = jax.scipy.linalg.solve_triangular(l, yc.T, lower=True).T
    denom = jnp.sum(yc * yc, axis=0)  # [p]

    def r_at(lag):
        num = jnp.sum(yc[lag:] * yc[:-lag], axis=0)
        return num / jnp.maximum(denom, 1e-300)

    rs = jnp.stack([r_at(l) for l in range(1, lags + 1)])  # [lags, p]
    weights = jnp.asarray(
        [t * (t + 2.0) / (t - l) for l in range(1, lags + 1)]
    )
    q = jnp.sum(weights[:, None] * rs**2)
    thr = float(chi2.ppf(1.0 - alpha, lags * p))
    return WhitenessResult(
        statistic=q,
        autocorr=jnp.mean(rs, axis=1),
        threshold=thr,
        passed=q <= thr,
    )


def innovation_bias(innovations, pred_covariances, hs, rs):
    """Normalized innovation mean: sqrt(T) * mean(innov) whitened by
    the average innovation covariance — approximately N(0, I) for an
    unbiased filter, so components beyond ~3 flag bias."""
    y = jnp.asarray(innovations)
    t = y.shape[0]
    s = jnp.mean(
        jnp.einsum("tij,tjk,tlk->til", hs, pred_covariances, hs) + rs, axis=0
    )
    l = jnp.linalg.cholesky(s)
    m = jnp.mean(y, axis=0) * jnp.sqrt(float(t))
    return jax.scipy.linalg.solve_triangular(l, m, lower=True)


def covariance_health(covariances, atol: float = 0.0):
    """Per-step covariance sanity over a [T, n, n] trace: finite,
    symmetric, positive diagonal.  Returns a [T] bool mask of healthy
    steps (all True for a working filter) — cheap enough to gate on in
    serving."""
    p = jnp.asarray(covariances)
    finite = jnp.all(jnp.isfinite(p), axis=(1, 2))
    sym = jnp.all(
        jnp.abs(p - jnp.swapaxes(p, 1, 2)) <= 1e-6 * (jnp.abs(p) + 1.0),
        axis=(1, 2),
    )
    pos = jnp.all(jnp.diagonal(p, axis1=1, axis2=2) > atol, axis=1)
    return finite & sym & pos


def divergence_onset(nis_sequence, dof: int, window: int = 20,
                     alpha: float = 0.001):
    """Index (window end) of the first NON-OVERLAPPING window whose
    NIS mean leaves its chi-square acceptance interval, or -1: the
    standard online divergence detector.

    Non-overlapping windows keep the tests independent — a single
    heavy-tailed chi-square sample would otherwise contaminate ~window
    overlapping means and false-alarm; with T/window independent tests
    at the default alpha=1e-3 the arc-level false-alarm rate stays at
    the ~1% level.  Detection resolution is one window."""
    seq = jnp.asarray(nis_sequence)
    t = seq.shape[0]
    if t < window:
        raise ValueError(f"need at least window={window} samples, got {t}")
    lo, hi = chi2_interval(dof, window, alpha)
    n_win = t // window
    means = jnp.mean(
        seq[: n_win * window].reshape(n_win, window), axis=1
    )
    bad = (means < lo) | (means > hi)
    idx = jnp.argmax(bad)
    found = jnp.any(bad)
    return jnp.where(found, (idx + 1) * window - 1, -1)
