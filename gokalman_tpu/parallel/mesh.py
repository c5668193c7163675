"""Ensemble sharding over a TPU device mesh.

The reference scales only by running more independent sequences in a
Go loop (montecarlo.go:108-117) with channel-based CSV streaming as its
sole concurrency (README.md:11).  The TPU-native equivalent is a 1-D
`ensemble` mesh axis: Monte-Carlo runs are sharded across chips with
`jax.sharding`, the per-step ensemble reductions (mean/stddev/NEES/NIS)
lower to XLA all-reduces over ICI, and the time axis stays a local
lax.scan on every chip (the recurrence is inherently serial —
SURVEY.md §5 'long-context' note).

No TP/PP/SP/EP axes exist because the model state is a 6-vector: there
is nothing to shard but the embarrassingly parallel run axis.  This is
the domain's entire communication layer (SURVEY.md §2.9/§5.8).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


ENSEMBLE_AXIS = "ensemble"


def ensemble_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (ENSEMBLE_AXIS,))


def ensemble_sharding(mesh: Mesh, batch_axis: int = -1, ndim: int = 2) -> NamedSharding:
    """NamedSharding placing the ensemble axis across the mesh.

    Default matches the ops.ensemble lanes-major [n, S] layout
    (S = last axis).
    """
    spec = [None] * ndim
    spec[batch_axis] = ENSEMBLE_AXIS
    return NamedSharding(mesh, P(*spec))


def pool_ensemble_stats(mean_local, std_local, shard_samples: int, axis_name: str):
    """Pool per-shard ensemble (mean, stddev[ddof=1]) into the global
    (mean, stddev[ddof=1]) over a named mesh axis.

    The pooled variance is recovered from each shard's second moment
    ((m-1)·s² + m·x̄²); taking pmean of per-shard stddevs instead would
    systematically under-estimate the ensemble spread (Jensen: sqrt is
    concave), so multi-chip results would not match a single-chip run
    on the same total ensemble.
    """
    ndev = jax.lax.psum(1, axis_name)
    m = shard_samples
    mean = jax.lax.pmean(mean_local, axis_name)
    ssq = jax.lax.psum((m - 1) * std_local**2 + m * mean_local**2, axis_name)
    total = m * ndev
    var = (ssq - total * mean**2) / (total - 1)
    return mean, jnp.sqrt(jnp.maximum(var, 0.0))


def sharded_mc_chi_square_pallas(
    model,
    state0,
    samples_per_device: int,
    steps: int,
    seed: int,
    mesh: Optional[Mesh] = None,
    init_spread: bool = True,
    tile: int = 8192,
):
    """Multi-chip fused-kernel pipeline: every device runs the Pallas
    kernel on its own ensemble shard (seeded by mesh position), and the
    per-step statistics are combined with `pmean` over ICI — the
    native-tier analogue of sharded_mc_chi_square.
    """
    from ..ops.ensemble import ChiSquareResult
    from ..ops.pallas_mc import mc_chi_square_pallas

    mesh = ensemble_mesh() if mesh is None else mesh
    ndev = mesh.devices.size

    def local(seed_arr):
        out = mc_chi_square_pallas(
            model, state0, samples_per_device, steps, seed_arr[0],
            init_spread=init_spread, tile=min(tile, samples_per_device),
        )
        # Per-run means pool as a plain pmean (equal shard sizes); the
        # ensemble stddev must be pooled through its second moments —
        # pmean of per-shard stddevs is biased low (sqrt is concave).
        mean, stddev = pool_ensemble_stats(
            out.mean, out.stddev, samples_per_device, ENSEMBLE_AXIS
        )
        return ChiSquareResult(
            nis_means=jax.lax.pmean(out.nis_means, ENSEMBLE_AXIS),
            nees_means=jax.lax.pmean(out.nees_means, ENSEMBLE_AXIS),
            mean=mean,
            stddev=stddev,
        )

    seeds = (seed + jnp.arange(ndev, dtype=jnp.int32)).reshape(ndev, 1)
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=P(ENSEMBLE_AXIS), out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)(seeds)


def sharded_mc_chi_square(
    model,
    state0,
    samples: int,
    steps: int,
    key,
    mesh: Optional[Mesh] = None,
    controls=None,
    init_spread: bool = False,
):
    """mc_chi_square with the run axis sharded across `mesh`.

    Each chip owns samples/n_devices runs; the per-step NEES/NIS/mean
    reductions become psum-style collectives inserted by XLA (GSPMD).
    Requires samples % n_devices == 0.
    """
    from ..ops.ensemble import mc_chi_square

    mesh = ensemble_mesh() if mesh is None else mesh
    ndev = mesh.devices.size
    if samples % ndev:
        raise ValueError(f"samples ({samples}) must divide the mesh size ({ndev})")
    sharding = ensemble_sharding(mesh)

    fn = jax.jit(
        lambda k, u: mc_chi_square(
            model,
            state0,
            samples,
            steps,
            k,
            controls=u,
            ensemble_sharding=sharding,
            init_spread=init_spread,
        )
    )
    return fn(key, controls)
