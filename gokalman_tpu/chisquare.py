"""Chi-square filter-consistency tests (NEES / NIS).

TPU rebuild of the reference's replay loop (reference:
chisquare.go:16-95): instead of resetting one mutable filter per run
and accumulating Go maps, every Monte-Carlo run is replayed through a
fresh functional filter under `vmap`, and NEES/NIS are batched
quadratic forms reduced with a single mean over the run axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import linalg
from .filters import vanilla
from .montecarlo import MonteCarloRuns


def chi_square(
    model: vanilla.Model,
    state0: vanilla.State,
    runs: MonteCarloRuns,
    controls: Optional[jax.Array] = None,
    with_nees: bool = True,
    with_nis: bool = True,
):
    """Replay each MC run's measurements through the filter and compute
    per-step ensemble means of NEES and NIS.

    NEES_k = (x_true - x^+)^T (P^+)^{-1} (x_true - x^+)   (chisquare.go:46-59)
    NIS_k  = innov^T (H P^- H^T + R)^{-1} innov            (chisquare.go:61-77)

    Returns (nis_means [T], nees_means [T]) matching the reference's
    (NISmeans, NEESmeans) return order (chisquare.go:94).  Disabled
    outputs are None.
    """
    if not (with_nees or with_nis):
        raise ValueError("chi square requires either NEES or NIS or both")

    measurements = runs.estimates.measurement  # [S, T, p]
    truth_states = runs.estimates.state  # [S, T, n]

    def one_run(meas_seq, truth_seq):
        _, ests = vanilla.run(model, state0, measurements=meas_seq, controls=controls)
        out = {}
        if with_nees:
            err = truth_seq - ests.state  # [T, n]
            pinv = jax.vmap(linalg.inv_psd)(ests.covariance)  # [T, n, n]
            out["nees"] = jax.vmap(linalg.quadratic_form)(err, pinv)
        if with_nis:
            # Innovation covariance from the *predicted* covariance
            # (pure prediction: H P^- H^T + R, chisquare.go:66-71).
            h = model.h
            pyy = (
                jnp.einsum("ij,tjk,lk->til", h, ests.pred_covariance, h)
                + model.noise.r
            )
            pyy_inv = jax.vmap(linalg.inv_psd)(pyy)
            out["nis"] = jax.vmap(linalg.quadratic_form)(ests.innovation, pyy_inv)
        return out

    per_run = jax.vmap(one_run)(measurements, truth_states)  # each [S, T]
    nees_means = jnp.mean(per_run["nees"], axis=0) if with_nees else None
    nis_means = jnp.mean(per_run["nis"], axis=0) if with_nis else None
    return nis_means, nees_means
