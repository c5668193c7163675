"""Pallas TPU kernel: fully fused Monte-Carlo + chi-square pipeline.

This is the native tier (SURVEY.md §2 note: Pallas kernels replace the
reference's gonum/BLAS calls).  One kernel launch runs the complete
runs x steps workload of SURVEY.md §3.2:

- the ensemble state pair (truth, estimate) lives in VMEM scratch for
  the whole T-loop — zero HBM traffic for the carries (the XLA scan
  round-trips ~10 GB for the same workload);
- Gaussian noise is generated in-kernel from the per-core hardware PRNG
  (pltpu.prng_random_bits) via Box-Muller — no key bookkeeping, no
  HBM-resident noise tensors;
- the per-step gain/NEES/NIS weight matrices (run-independent, computed
  once by ops.ensemble._covariance_path) are prefetched to SMEM and
  read as scalars, so every vector op is a full-width [8, TILE] VPU
  broadcast-FMA;
- only the [T]-per-tile partial sums (NEES, NIS, Σx, Σx²) leave the
  kernel.

Layout: states are [8, TILE] blocks (state dim 6 padded to 8 sublanes,
TILE ensemble members on lanes); matvecs are unrolled as column
broadcasts.  The kernel is specialized to n=6, p=3 (the flagship
6-state tracker); ops.ensemble.mc_chi_square remains the general path.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import linalg
from ..filters import vanilla
from .ensemble import ChiSquareResult, _covariance_path

N = 6  # state dim (padded to 8 sublanes in-kernel)
P = 3  # measurement dim
NPAD = 8
TILE = 8192  # ensemble members per grid program

# SMEM packing layout per step: K [6,3], Pinv [6,6], Sinv [3,3] -> 63,
# padded to 64 for aligned indexing.
_K_OFF = 0
_PI_OFF = 18
_SI_OFF = 54
_ROW = 64


def _pack_path(k_path, p_inv_path, s_inv_path):
    t = k_path.shape[0]
    flat = jnp.concatenate(
        [
            k_path.reshape(t, N * P),
            p_inv_path.reshape(t, N * N),
            s_inv_path.reshape(t, P * P),
            jnp.zeros((t, _ROW - N * P - N * N - P * P), k_path.dtype),
        ],
        axis=1,
    )
    return flat.reshape(-1).astype(jnp.float32)


def _pack_fixed(f, lq, h, lr, x0, spread_l):
    """F[36] Lq[36] H[18] Lr[9] x0[6] L0[36] -> [144] padded scalars."""
    parts = [
        f.reshape(-1),
        lq.reshape(-1),
        h.reshape(-1),
        lr.reshape(-1),
        x0.reshape(-1),
        spread_l.reshape(-1),
    ]
    flat = jnp.concatenate(parts)
    return jnp.pad(flat, (0, 160 - flat.shape[0])).astype(jnp.float32)


_F_OFF = 0
_LQ_OFF = 36
_H_OFF = 72
_LR_OFF = 90
_X0_OFF = 99
_L0_OFF = 105


def _normal_pair(shape):
    """Two independent standard-normal arrays from one Box-Muller pair.

    Draws 2x uint32 bits, maps to (0,1] uniforms (low 24 bits —
    int32-safe since Mosaic has no uint32->f32 cast), and returns both
    the cos and sin branches so no entropy is wasted.
    """
    bits1 = pltpu.prng_random_bits(shape)
    bits2 = pltpu.prng_random_bits(shape)
    mask = jnp.int32(0x00FFFFFF)
    u1 = (bits1 & mask).astype(jnp.float32) * (2.0**-24) + (2.0**-25)
    u2 = (bits2 & mask).astype(jnp.float32) * (2.0**-24)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    ang = 2.0 * jnp.pi * u2
    return r * jnp.cos(ang), r * jnp.sin(ang)


def _normals(shape):
    """One standard-normal array (single Box-Muller branch)."""
    return _normal_pair(shape)[0]


def _normal_batch(shape, count: int):
    """`count` independent normal arrays using ceil(count/2) BM pairs."""
    out = []
    for _ in range((count + 1) // 2):
        a, b = _normal_pair(shape)
        out += [a, b]
    return out[:count]


def _kernel(path_ref, fixed_ref, seed_ref, steps_ref,
            stats_ref, xt_ref, xe_ref):
    """Each state component is an [8, TILE//8] block (full sublane
    utilization — a [1, TILE] row would drive the VPU at 1/8 width).
    Fixed scalars are loaded once before the T-loop (registers); only
    the 63 per-step path scalars are read from SMEM inside it."""
    tile_id = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + tile_id)
    steps = steps_ref[0]
    cshape = (8, TILE // 8)  # one state component across the tile

    # Hoist all fixed scalars out of the loop.
    fmat = [[fixed_ref[_F_OFF + i * N + j] for j in range(N)] for i in range(N)]
    lqmat = [[fixed_ref[_LQ_OFF + i * N + j] for j in range(N)] for i in range(N)]
    hmat = [[fixed_ref[_H_OFF + i * N + j] for j in range(N)] for i in range(P)]
    lrmat = [[fixed_ref[_LR_OFF + i * P + j] for j in range(P)] for i in range(P)]
    x0v = [fixed_ref[_X0_OFF + i] for i in range(N)]
    l0mat = [[fixed_ref[_L0_OFF + i * N + j] for j in range(N)] for i in range(N)]

    ones_mat = jnp.ones((TILE // 8, 128), jnp.float32)

    def fsum(arr):
        # Full reduction via one MXU pass (arr @ ones -> [8,128] partial,
        # each column the row sum): the VPU's cross-lane shifts made the
        # 14 per-step jnp.sum reductions cost a third of the kernel.
        partial = jax.lax.dot_general(
            arr, ones_mat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(partial) * (1.0 / 128.0)

    def comp(ref, i):
        return ref[i * 8 : (i + 1) * 8, :]

    # Initial ensembles: truth = x0 + L0 z (init spread), estimate = x0.
    z0 = _normal_batch(cshape, N)
    for i in range(N):
        base = jnp.full(cshape, x0v[i], jnp.float32)
        spread = jnp.zeros(cshape, jnp.float32)
        for j in range(N):
            spread += l0mat[i][j] * z0[j]
        xt_ref[i * 8 : (i + 1) * 8, :] = base + spread
        xe_ref[i * 8 : (i + 1) * 8, :] = base

    def body(t, _):
        row = t * _ROW
        wv = _normal_batch(cshape, N + P)
        w, v = wv[:N], wv[N:]

        xt = [comp(xt_ref, i) for i in range(N)]
        xe = [comp(xe_ref, i) for i in range(N)]

        # Truth propagate: x_t' = F x_t + Lq w (consistent-measurement
        # pipeline: y is generated from the post-predict truth).
        xt_new = [None] * N
        xp = [None] * N
        for i in range(N):
            acc = jnp.zeros(cshape, jnp.float32)
            accp = jnp.zeros(cshape, jnp.float32)
            for j in range(N):
                acc += fmat[i][j] * xt[j] + lqmat[i][j] * w[j]
                accp += fmat[i][j] * xe[j]  # replay predict x_e^- = F x_e
            xt_new[i] = acc
            xp[i] = accp

        # Innovation = H (x_t' - x_e^-) + Lr v.
        innov = [None] * P
        for i in range(P):
            acc = jnp.zeros(cshape, jnp.float32)
            for j in range(N):
                acc += hmat[i][j] * (xt_new[j] - xp[j])
            for j in range(P):
                acc += lrmat[i][j] * v[j]
            innov[i] = acc

        # Update: x_e' = x_e^- + K innov; err = x_t' - x_e'.
        err = [None] * N
        for i in range(N):
            upd = xp[i]
            for j in range(P):
                upd += path_ref[row + _K_OFF + i * P + j] * innov[j]
            xe_ref[i * 8 : (i + 1) * 8, :] = upd
            xt_ref[i * 8 : (i + 1) * 8, :] = xt_new[i]
            err[i] = xt_new[i] - upd

        # NEES = err^T Pinv err (symmetric: diagonal + 2x upper tri).
        nees = jnp.zeros(cshape, jnp.float32)
        for i in range(N):
            nees += path_ref[row + _PI_OFF + i * N + i] * err[i] * err[i]
            for j in range(i + 1, N):
                nees += (2.0 * path_ref[row + _PI_OFF + i * N + j]) * err[i] * err[j]
        nis = jnp.zeros(cshape, jnp.float32)
        for i in range(P):
            nis += path_ref[row + _SI_OFF + i * P + i] * innov[i] * innov[i]
            for j in range(i + 1, P):
                nis += (2.0 * path_ref[row + _SI_OFF + i * P + j]) * innov[i] * innov[j]

        # Stats rows: 0=NEES sum, 1=NIS sum, 2..7=Σx, 10..15=Σx².
        stats_ref[0, t] = fsum(nees)
        stats_ref[1, t] = fsum(nis)
        for i in range(N):
            stats_ref[2 + i, t] = fsum(xt_new[i])
            stats_ref[10 + i, t] = fsum(xt_new[i] * xt_new[i])
        return ()

    jax.lax.fori_loop(0, steps, body, ())


@functools.partial(jax.jit, static_argnames=("samples", "steps", "init_spread"))
def mc_chi_square_pallas(
    model: vanilla.Model,
    state0: vanilla.State,
    samples: int,
    steps: int,
    seed,
    init_spread: bool = True,
) -> ChiSquareResult:
    """Fused-kernel equivalent of ops.ensemble.mc_chi_square
    (lagged_measurements=False semantics) for 6-state / 3-measurement
    models.  `seed` is an int32 scalar; each ensemble tile derives its
    own hardware PRNG stream."""
    if model.f.shape != (N, N) or model.h.shape != (P, N):
        raise ValueError("pallas pipeline is specialized to n=6, p=3")
    if samples % TILE:
        raise ValueError(f"samples must be a multiple of {TILE}")
    grid = samples // TILE

    k_path, s_inv_path, p_inv_path = _covariance_path(model, state0.p, steps)
    path = _pack_path(k_path, p_inv_path, s_inv_path)
    spread_l = (
        jnp.linalg.cholesky(state0.p)
        if init_spread
        else jnp.zeros_like(state0.p)
    )
    fixed = _pack_fixed(
        model.f, model.noise.sqrt_q, model.h, model.noise.sqrt_r,
        state0.x, spread_l,
    )
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    steps_arr = jnp.asarray(steps, jnp.int32).reshape(1)
    # SMEM memrefs are (8,128)-tiled: keep the stats block exactly at
    # the padded tile shape so no misaligned slicing is generated.
    steps_pad = ((steps + 127) // 128) * 128

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # path, fixed, seed, steps -> SMEM
        grid=(grid,),
        in_specs=[],
        out_specs=pl.BlockSpec(
            # Per-step scalar statistics are stored element-wise, which
            # TPU only supports in SMEM; one [18, T] block per tile
            # (rows: NEES, NIS, 6x Σx, pad, 6x Σx², pad).
            (1, 24, steps_pad), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.SMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((N * 8, TILE // 8), jnp.float32),
            pltpu.VMEM((N * 8, TILE // 8), jnp.float32),
        ],
    )

    def kernel(path_ref, fixed_ref, seed_ref, steps_ref,
               stats_ref, xt_ref, xe_ref):
        _kernel(
            path_ref, fixed_ref, seed_ref, steps_ref,
            stats_ref.at[0], xt_ref, xe_ref,
        )

    stats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((grid, 24, steps_pad), jnp.float32),
    )(path, fixed, seed, steps_arr)

    total = jnp.sum(stats, axis=0)[:, :steps]  # [24, T]
    nees_means = total[0] / samples
    nis_means = total[1] / samples
    xsum = total[2 : 2 + N].T
    x2sum = total[10 : 10 + N].T
    mean = xsum / samples
    # Clamp: the sum-of-squares form can go epsilon-negative when the
    # ensemble is (near-)degenerate.
    var = jnp.maximum(x2sum - samples * mean**2, 0.0) / (samples - 1)
    return ChiSquareResult(nis_means, nees_means, mean, jnp.sqrt(var))
