"""Integrated multi-target tracker: GNN association + M/N track
management (initiation, confirmation, deletion) — the systems layer
that turns the association filters (pdaf/jpda) into a deployable
tracker when the TARGET COUNT IS UNKNOWN and time-varying.

Design (Blackman & Popoli ch. 6 practice):
- a FIXED bank of K track slots (static shapes), each carrying a KF
  state/covariance plus lifecycle fields: status (0 empty, 1 tentative,
  2 confirmed), consecutive-miss count, total hits, age;
- per frame: chi-square gating, GLOBAL nearest-neighbor assignment
  (greedy on the [K, m] Mahalanobis² grid — K fixed masked-argmin
  rounds, exclusivity exact), per-track KF update or coast;
- unassigned detections BIRTH tentative tracks in empty slots (state
  seeded through the measurement pseudo-inverse, prior covariance
  p0_new); `confirm_hits` total hits promote to confirmed;
  `delete_misses` consecutive misses free the slot.

Everything is one lax.scan over frames — status transitions are
jnp.where lattices, the greedy assignment is a lax.fori_loop with a
masked argmin (no data-dependent shapes anywhere), so the whole tracker
jits, vmaps (ensembles of scenarios), and shards like every filter in
the library.  For overlapping-gate association quality inside a frame,
hand confirmed tracks to `jpda` — this module's job is lifecycle.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import linalg
from ..noise import Noise
from . import vanilla

EMPTY, TENTATIVE, CONFIRMED = 0, 1, 2
_INF = 1e30


class Model(NamedTuple):
    kf: vanilla.Model
    gate: jax.Array  # [] chi-square association gate
    p0_new: jax.Array  # [n, n] birth covariance
    h_pinv: jax.Array  # [n, p] measurement pseudo-inverse (birth seed)
    confirm_hits: int  # static: hits to promote tentative -> confirmed
    delete_misses: int  # static: consecutive misses to drop a track
    confirm_window: int  # static: frames a tentative track gets to confirm


class State(NamedTuple):
    xs: jax.Array  # [K, n]
    ps: jax.Array  # [K, n, n]
    status: jax.Array  # [K] int32
    misses: jax.Array  # [K] int32 consecutive misses
    hits: jax.Array  # [K] int32 total hits
    age: jax.Array  # [K] int32 frames since birth
    k: jax.Array  # [] int32 frame counter


class Estimate(NamedTuple):
    states: jax.Array  # [K, n]
    covariances: jax.Array  # [K, n, n]
    status: jax.Array  # [K]
    assigned: jax.Array  # [K] int32 candidate index or -1
    n_confirmed: jax.Array  # []
    n_tentative: jax.Array  # []


def new(f, g, h, noise: Noise, n_slots: int, p0_new,
        gate: float = 16.0, confirm_hits: int = 3,
        delete_misses: int = 4, confirm_window: int = None):
    """Build an empty tracker with `n_slots` track slots.

    M/N initiation: a tentative track must collect `confirm_hits` hits
    within its first `confirm_window` frames (default 2·confirm_hits)
    or it is dropped — without the window, long-lived clutter tracks
    eventually accumulate enough lifetime hits to confirm (measured in
    tests: 5 uniform clutter points/frame produced phantom confirmed
    tracks within 60 frames under a hits-only rule)."""
    p0_new = jnp.asarray(p0_new)
    n = p0_new.shape[0]
    kf_model, _ = vanilla.new(jnp.zeros(n, p0_new.dtype), p0_new, f, g, h,
                              noise)
    h_pinv = jnp.linalg.pinv(kf_model.h)
    if confirm_window is None:
        confirm_window = 2 * int(confirm_hits)
    model = Model(kf_model, jnp.asarray(gate, p0_new.dtype), p0_new,
                  h_pinv, int(confirm_hits), int(delete_misses),
                  int(confirm_window))
    zi = jnp.zeros((n_slots,), jnp.int32)
    state = State(
        xs=jnp.zeros((n_slots, n), p0_new.dtype),
        ps=jnp.broadcast_to(p0_new, (n_slots, n, n)),
        status=zi, misses=zi, hits=zi, age=zi, k=jnp.int32(0),
    )
    return model, state


def _greedy_assign(cost, n_rounds: int):
    """Exclusive greedy assignment on a [K, m] cost grid (entries >=
    _INF are infeasible).  Returns ([K] candidate index or -1, [m]
    assigned-to-track bool)."""
    k_slots, m = cost.shape

    def body(_, carry):
        cost_c, assign, cand_taken = carry
        flat = jnp.argmin(cost_c).astype(jnp.int32)
        t, c = flat // m, flat % m
        ok = cost_c[t, c] < _INF
        assign = assign.at[t].set(jnp.where(ok, c, assign[t]))
        cand_taken = cand_taken.at[c].set(cand_taken[c] | ok)
        cost_c = jnp.where(ok, cost_c.at[t, :].set(_INF), cost_c)
        cost_c = jnp.where(ok, cost_c.at[:, c].set(_INF), cost_c)
        return cost_c, assign, cand_taken

    assign0 = jnp.full((k_slots,), -1, jnp.int32)
    taken0 = jnp.zeros((m,), bool)
    _, assign, taken = jax.lax.fori_loop(
        0, n_rounds, body, (cost, assign0, taken0))
    return assign, taken


@linalg.highp
def step(model: Model, state: State, candidates, cand_mask):
    """One tracker frame: `candidates` [m, p], `cand_mask` [m]."""
    kf = model.kf
    dt = state.ps.dtype
    k_slots = state.xs.shape[0]
    m = candidates.shape[0]
    active = state.status > EMPTY

    # --- predict every active slot (empty slots compute too, masked out)
    def tgt_predict(x, p):
        return vanilla.predict(kf, vanilla.State(x, p, state.k))

    x_preds, p_preds = jax.vmap(tgt_predict)(state.xs, state.ps)
    x_preds = jnp.where(active[:, None], x_preds, state.xs)
    p_preds = jnp.where(active[:, None, None], p_preds, state.ps)

    # --- gated Mahalanobis cost grid
    def tgt_cost(x_pred, p_pred):
        s = linalg.sym(kf.h @ p_pred @ kf.h.T + kf.noise.r)
        nus = jnp.asarray(candidates) - x_pred @ kf.h.T  # [m, p]
        d2 = jnp.sum(nus * linalg.solve_psd(s, nus.T).T, axis=1)
        return d2

    d2 = jax.vmap(tgt_cost)(x_preds, p_preds)  # [K, m]
    feasible = (active[:, None] & jnp.asarray(cand_mask, bool)[None, :]
                & (d2 <= model.gate))
    cost = jnp.where(feasible, d2, _INF)
    assign, cand_taken = _greedy_assign(cost, k_slots)
    got = assign >= 0

    # --- measurement update for assigned tracks, coast otherwise
    meas = jnp.asarray(candidates)[jnp.clip(assign, 0, m - 1)]  # [K, p]

    def tgt_update(x_pred, p_pred, y, has):
        pht = p_pred @ kf.h.T
        s = linalg.sym(kf.h @ pht + kf.noise.r)
        k_gain = linalg.solve_psd(s, pht.T).T
        x = x_pred + k_gain @ (y - kf.h @ x_pred)
        p = vanilla.joseph_update(p_pred, k_gain, kf.h, kf.noise.r)
        return (jnp.where(has, x, x_pred),
                jnp.where(has, p, p_pred))

    xs, ps = jax.vmap(tgt_update)(x_preds, p_preds, meas, got)

    # --- lifecycle bookkeeping
    misses = jnp.where(got, 0, state.misses + active.astype(jnp.int32))
    hits = state.hits + got.astype(jnp.int32)
    age = state.age + active.astype(jnp.int32)
    status = state.status
    status = jnp.where((status == TENTATIVE)
                       & (hits >= model.confirm_hits),
                       CONFIRMED, status)
    dead = active & (misses >= model.delete_misses)
    # M/N window: tentative tracks that failed to confirm in time.
    stale = (status == TENTATIVE) & (age >= model.confirm_window)
    status = jnp.where(dead | stale, EMPTY, status)

    # --- birth: unassigned valid candidates claim empty slots in order
    unassigned = jnp.asarray(cand_mask, bool) & ~cand_taken  # [m]
    empty = status == EMPTY
    rank_slot = jnp.cumsum(empty.astype(jnp.int32)) - 1  # [K]
    rank_cand = jnp.cumsum(unassigned.astype(jnp.int32)) - 1  # [m]
    match = (empty[:, None] & unassigned[None, :]
             & (rank_slot[:, None] == rank_cand[None, :]))  # [K, m]
    born = jnp.any(match, axis=1)
    birth_cand = jnp.argmax(match, axis=1)  # valid where born
    birth_y = jnp.asarray(candidates)[birth_cand]  # [K, p]
    birth_x = birth_y @ model.h_pinv.T

    xs = jnp.where(born[:, None], birth_x, xs)
    ps = jnp.where(born[:, None, None], model.p0_new[None], ps)
    status = jnp.where(born, TENTATIVE, status)
    misses = jnp.where(born, 0, misses)
    hits = jnp.where(born, 1, hits)
    age = jnp.where(born, 0, age)

    est = Estimate(
        states=xs,
        covariances=ps,
        status=status,
        assigned=jnp.where(got, assign, -1),
        n_confirmed=jnp.sum((status == CONFIRMED).astype(jnp.int32)),
        n_tentative=jnp.sum((status == TENTATIVE).astype(jnp.int32)),
    )
    return State(xs, ps, status, misses, hits, age, state.k + 1), est


@linalg.highp
def run(model: Model, state: State, candidates, cand_masks):
    """lax.scan over [T, m, p] frames."""

    def body(carry, xs):
        cands, mask = xs
        return step(model, carry, cands, mask)

    return jax.lax.scan(body, state,
                        (jnp.asarray(candidates), jnp.asarray(cand_masks)))
