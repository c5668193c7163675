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
SLICE_AXIS = "slice"
CHIP_AXIS = "chip"


def ensemble_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (ENSEMBLE_AXIS,))


def multislice_mesh(n_slices: int, chips_per_slice: int, devices=None) -> Mesh:
    """2-D ('slice', 'chip') mesh for multi-slice pods.

    The ensemble axis is sharded over BOTH mesh axes; per-step stat
    reductions then decompose into an all-reduce over 'chip' (riding
    ICI within each slice) followed by one over 'slice' (riding DCN) —
    GSPMD/shard_map do this automatically for a tuple axis_name, and
    the DCN leg moves only the [T]-sized partial statistics, never the
    ensembles.  On single-slice hardware (or the CPU test mesh) the
    decomposition is exercised with virtual devices.
    """
    devices = jax.devices() if devices is None else devices
    if len(devices) < n_slices * chips_per_slice:
        raise ValueError(
            f"need {n_slices * chips_per_slice} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[: n_slices * chips_per_slice]).reshape(
        n_slices, chips_per_slice
    )
    return Mesh(grid, (SLICE_AXIS, CHIP_AXIS))


def ensemble_sharding(mesh: Mesh, batch_axis: int = -1, ndim: int = 2) -> NamedSharding:
    """NamedSharding placing the ensemble axis across the whole mesh.

    Default matches the ops.ensemble lanes-major [n, S] layout
    (S = last axis).  For a multi-slice mesh the single ensemble axis
    is sharded over every mesh axis (('slice', 'chip')).
    """
    spec = [None] * ndim
    names = mesh.axis_names
    spec[batch_axis] = names[0] if len(names) == 1 else names
    return NamedSharding(mesh, P(*spec))


def pool_ensemble_stats(mean_local, std_local, shard_samples: int, axis_name):
    """Pool per-shard ensemble (mean, stddev[ddof=1]) into the global
    (mean, stddev[ddof=1]) over a named mesh axis (or tuple of axes —
    for a multi-slice mesh the reduction rides ICI within the slice,
    then DCN across slices).

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
    names = mesh.axis_names  # 1-D ('ensemble',) or 2-D ('slice','chip')
    axes = names[0] if len(names) == 1 else names

    def local(seed_arr):
        out = mc_chi_square_pallas(
            model, state0, samples_per_device, steps,
            seed_arr.reshape(-1)[0],
            init_spread=init_spread, tile=min(tile, samples_per_device),
        )
        # Per-run means pool as a plain pmean (equal shard sizes); the
        # ensemble stddev must be pooled through its second moments —
        # pmean of per-shard stddevs is biased low (sqrt is concave).
        mean, stddev = pool_ensemble_stats(
            out.mean, out.stddev, samples_per_device, axes
        )
        return ChiSquareResult(
            nis_means=jax.lax.pmean(out.nis_means, axes),
            nees_means=jax.lax.pmean(out.nees_means, axes),
            mean=mean,
            stddev=stddev,
        )

    shape = mesh.devices.shape
    seeds = (seed + jnp.arange(mesh.devices.size, dtype=jnp.int32)).reshape(shape)
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=P(*names), out_specs=P(),
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
    lagged_measurements: bool = True,
    hs=None,
    rs=None,
    meas_masks=None,
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
            lagged_measurements=lagged_measurements,
            hs=hs,
            rs=rs,
            meas_masks=meas_masks,
        )
    )
    return fn(key, controls)
