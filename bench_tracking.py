"""Tracking/RFS/fusion-tier hardware benchmark (round-4 judge task #1).

Slope-timed throughput rows for the multi-target stack — PDAF, JPDA,
GNN tracker, GM-PHD, GM-CPHD, PMB, and track-to-track fusion — on
vmapped scene banks at serving scale.  Every row is gated on accuracy
bounds (maintained-scene set-RMS + track-loss rate for the bank
associators, tail OSPA for the intensity filters, cardinality bands)
so throughput cannot be bought with garbage estimates (the
consistency-gate idiom of the reference's chi-square harness,
chisquare.go:16-95, applied to the multi-target tier).

Timing methodology (identical to bench.py, see CLAUDE.md): on the
tunneled backend a single launch carries a ~26 ms fixed dispatch +
host-read floor, so each row jits the scene bank at R=1 and R=3
repeats (data rolled per repeat so XLA cannot CSE them), syncs with a
single scalar device read, and reports the slope (t3 - t1)/2 — the
marginal per-bank cost with the fixed overhead subtracted.

Prints one JSON line per row; the driver captures stdout into
BENCH_TRACKING_r{N}.json (JSONL, like bench_od.py).

Scenario (shared across rows): 2-D constant-velocity targets in a
100x100 surveillance box, PD = 0.95, sigma_r = 0.2, 6 uniform clutter
points per frame, padded to m_max = 8 candidate slots per frame.  The
two-target bank has the targets CROSSING mid-arc (the association
stress case); gates use the min-permutation set-RMS so an identity
swap at the crossing is not penalized (set metrics, not labels).
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu import diagnostics
from gokalman_tpu import noise as gn
from gokalman_tpu.filters import (cphd, fusion, glmb, jpda, lmb, pdaf,
                                  phd, pmb, tracker)
from gokalman_tpu.profiling import backend_watchdog

DTYPE = jnp.float32

B_SCENES = int(os.environ.get("BENCH_TRACKING_SCENES", 256))
T_FRAMES = int(os.environ.get("BENCH_TRACKING_FRAMES", 200))
M_MAX = 8
N_CLUTTER = 6
PD = 0.95
SIGMA_R = 0.2
BOX = 100.0  # clutter uniform over [-50, 50]^2
TAIL = T_FRAMES // 4  # frames scored: the last 3/4 (post-acquisition)


def _cv_system(dt=1.0, q_scale=1e-3, r_scale=0.04):
    """4-state [x, vx, y, vy] nearly-constant-velocity model (the
    tracking-literature standard; same system as tests/test_phd.py)."""
    f = jnp.asarray(np.kron(np.eye(2), np.array([[1.0, dt], [0.0, 1.0]])),
                    DTYPE)
    qb = np.array([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]]) * q_scale
    q = jnp.asarray(np.kron(np.eye(2), qb), DTYPE)
    h = jnp.asarray(np.kron(np.eye(2), np.array([[1.0, 0.0]])), DTYPE)
    r = jnp.asarray(r_scale * np.eye(2), DTYPE)
    return f, q, h, r


# Base initial states: A and B converge, cross near frame ~45, and
# separate — the standard association stress arc.
X0_A = np.array([-5.0, 0.12, -5.0, 0.10])
X0_B = np.array([5.0, -0.10, 5.0, -0.08])


def _gen_bank(key, n_targets):
    """Generate a scene bank on device: truths [B, T, n_targets, 4],
    candidate frames [B, T, M_MAX, 2], masks [B, T, M_MAX].

    Slot layout before the per-frame shuffle: slots 0..n_targets-1 are
    the target detections (valid w.p. PD), the next N_CLUTTER slots are
    always-valid uniform clutter, the rest stay invalid.  The shuffle
    permutes candidates and masks together so the filters cannot learn
    the layout.
    """
    f, q, h, r = _cv_system()
    lq = jnp.linalg.cholesky(q + 1e-12 * jnp.eye(4, dtype=DTYPE))
    x0s = jnp.asarray(np.stack([X0_A, X0_B])[:n_targets], DTYPE)

    def gen_scene(k):
        k0, kw, kv, kd, kc, kp = jax.random.split(k, 6)
        # per-scene jitter of the initial states (covered by p0 = 4 I)
        x0 = x0s + 0.5 * jax.random.normal(k0, (n_targets, 4), DTYPE) \
            * jnp.asarray([1.0, 0.05, 1.0, 0.05], DTYPE)
        ws = jax.random.normal(kw, (T_FRAMES, n_targets, 4), DTYPE) @ lq.T

        def body(x, w):
            xn = x @ f.T + w
            return xn, xn

        _, truth = jax.lax.scan(body, x0, ws)  # [T, n_targets, 4]
        z = truth[:, :, ::2] + SIGMA_R * jax.random.normal(
            kv, (T_FRAMES, n_targets, 2), DTYPE)
        detected = jax.random.uniform(kd, (T_FRAMES, n_targets)) < PD
        cands = (BOX * (jax.random.uniform(kc, (T_FRAMES, M_MAX, 2),
                                           dtype=DTYPE) - 0.5))
        cands = cands.at[:, :n_targets, :].set(z)
        mask = jnp.zeros((T_FRAMES, M_MAX), bool)
        mask = mask.at[:, :n_targets].set(detected)
        mask = mask.at[:, n_targets:n_targets + N_CLUTTER].set(True)
        perm = jax.vmap(lambda kk: jax.random.permutation(kk, M_MAX))(
            jax.random.split(kp, T_FRAMES))
        cands = jnp.take_along_axis(cands, perm[:, :, None], axis=1)
        mask = jnp.take_along_axis(mask, perm, axis=1)
        return truth, cands, mask

    keys = jax.random.split(key, B_SCENES)
    # Trace under f32 matmul precision: the truth propagation
    # (x @ f.T) otherwise runs at the TPU's default bf16 passes and
    # injects ~0.4%/step unmodeled quantization noise into the truths
    # — measured on chip as 3.5x tail-RMS degradation on every row
    # (0.14 -> 0.49 PDAF) and outright gate failures for jpda/tracker
    # (9.98): the filters track the measurements, which ride the
    # quantization random walk their tiny Q cannot follow.
    with jax.default_matmul_precision("float32"):
        truth, cands, masks = jax.jit(jax.vmap(gen_scene))(keys)
        jax.block_until_ready((truth, cands, masks))
    return truth, cands, masks


def _tail_ospa(pos, weights, truth_pos, thresh=0.5, cutoff=2.0):
    """Tail-mean OSPA of the thresholded GM extraction (the standard
    Vo-Ma w > 0.5 read-out) against the 2-target truth.  Intensity
    filters drop a missed target's weight by (1-PD) for that frame —
    fixed top-2 extraction grabs junk in ~5% of frames and a plain
    set-RMS explodes (measured 3.06 at PD=0.95 where OSPA reads 0.25);
    OSPA charges those frames the bounded cardinality cost instead,
    which is exactly the metric's job (Schuhmacher 2008)."""
    def one(e, w, t):
        return diagnostics.ospa(e, w > thresh, t,
                                jnp.ones(t.shape[0], bool), cutoff)

    o = jax.jit(jax.vmap(jax.vmap(one)))(pos, weights, truth_pos)
    per_scene = jnp.mean(o[:, -TAIL:], axis=1)
    return float(jnp.mean(per_scene)), float(jnp.max(per_scene))


def _set_rms(est_pos, truth_pos):
    """Per-frame min-permutation assignment of 2 estimated positions to
    2 truths (exact for n=2: identity vs swap), averaged over the tail.
    est_pos/truth_pos: [B, T, 2, 2]."""
    d_id = jnp.sum((est_pos - truth_pos) ** 2, axis=(-2, -1))
    d_sw = jnp.sum((est_pos - truth_pos[:, :, ::-1, :]) ** 2,
                   axis=(-2, -1))
    mse = jnp.minimum(d_id, d_sw) / 4.0  # 2 targets x 2 coords
    return float(jnp.sqrt(jnp.mean(mse[:, -TAIL:])))


def _maintained_rms(est_pos, truth_pos, loss_thresh=2.0):
    """(tail set-RMS over MAINTAINED scenes, track-loss rate): the
    tracking-literature read-out that separates the two failure axes.
    A scene counts as lost when its own tail set-RMS exceeds
    `loss_thresh`.  Why not one pooled RMS: a single irrecoverably
    lost track (measured: 1 scene in 256 — an early clutter hijack
    inside the wide initial gate coasts out of the region with nothing
    left to gate on, the textbook loss mode of any fixed-bank
    associator with no re-initiation) contributes ~160 units of error
    at every tail frame and drags the pooled RMS from 0.17 to 10.0,
    i.e. the pooled number measures ONLY the loss event, not tracking
    quality.  Both numbers are emitted and BOTH are gated."""
    d_id = jnp.sum((est_pos - truth_pos) ** 2, axis=(-2, -1))
    d_sw = jnp.sum((est_pos - truth_pos[:, :, ::-1, :]) ** 2,
                   axis=(-2, -1))
    mse = jnp.minimum(d_id, d_sw) / 4.0
    per_scene = jnp.sqrt(jnp.mean(mse[:, -TAIL:], axis=1))  # [B]
    lost = per_scene > loss_thresh
    rms_kept = jnp.sqrt(jnp.mean(jnp.where(
        lost, 0.0, jnp.mean(mse[:, -TAIL:], axis=1))) /
        jnp.maximum(jnp.mean(~lost), 1e-9))
    return float(rms_kept), float(jnp.mean(lost))


def _slope_time(make_fn, sync_leaf):
    """R=1 vs R=3 slope with a single scalar-read sync (bench.py
    idiom).  make_fn(repeats) -> jitted fn(shift) -> pytree; sync_leaf
    picks one scalar off the output for the device sync."""
    f1, f3 = make_fn(1), make_fn(3)
    out1 = f1(jnp.int32(0))
    jax.block_until_ready(out1)
    jax.block_until_ready(f3(jnp.int32(0)))

    def timed(fn, s):
        t0 = time.perf_counter()
        out = fn(jnp.int32(s))
        _ = float(sync_leaf(out))
        return time.perf_counter() - t0

    t1 = min(timed(f1, s) for s in (1, 2, 3))
    t3 = min(timed(f3, s) for s in (1, 2, 3))
    return max((t3 - t1) / 2.0, 1e-9), out1


def _bank_runner(run_one, cands, masks, reduce_out):
    """Build make_fn(repeats): vmap run_one over the scene bank, roll
    the bank per repeat so XLA cannot share the computations."""

    def make(repeats):
        @jax.jit
        def fn(shift):
            outs = []
            for i in range(repeats):
                c = jnp.roll(cands, shift + i, axis=0)
                m = jnp.roll(masks, shift + i, axis=0)
                outs.append(jax.vmap(run_one)(c, m))
            return jax.tree.map(lambda *xs: sum(xs), *outs)

        return fn

    marginal, out0 = _slope_time(make, reduce_out)
    return marginal, out0


def emit(row):
    print(json.dumps(row), flush=True)
    return row


def bench_pdaf(bank1):
    """Single-target PDAF in clutter (pdaf.py; Bar-Shalom PDAF)."""
    truth, cands, masks = bank1
    f, q, h, r = _cv_system()
    x0 = jnp.asarray(X0_A, DTYPE)
    p0 = jnp.diag(jnp.asarray([4.0, 0.25, 4.0, 0.25], DTYPE))
    model, state = pdaf.new(x0, p0, f, None, h, gn.noiseless(q, r),
                            pd=PD, clutter_density=N_CLUTTER / BOX**2,
                            gate=16.0)

    def run_one(c, m):
        _, est = pdaf.run(model, state, c, m)
        return est.state[:, ::2]  # [T, 2] position track

    marginal, pos = _bank_runner(run_one, cands, masks,
                                 lambda o: o[-1, -1, 0])
    err = pos - truth[:, :, 0, ::2]
    rms = float(jnp.sqrt(jnp.mean(err[:, -TAIL:] ** 2)))
    frames = B_SCENES * T_FRAMES
    return emit({
        "metric": "pdaf_frames_per_sec", "value": frames / marginal,
        "unit": "frames/s", "bank_ms": 1e3 * marginal,
        "scenes": B_SCENES, "frames": T_FRAMES, "m_max": M_MAX,
        "tail_pos_rms": rms, "gates_pass": bool(rms < 1.0),
    })


def bench_jpda(bank2):
    """Two crossing targets, joint association (jpda.py)."""
    truth, cands, masks = bank2
    f, q, h, r = _cv_system()
    x0s = jnp.asarray(np.stack([X0_A, X0_B]), DTYPE)
    p0 = jnp.diag(jnp.asarray([4.0, 0.25, 4.0, 0.25], DTYPE))
    model, state = jpda.new(x0s, p0, f, None, h, gn.noiseless(q, r),
                            m_max=M_MAX, pd=PD,
                            clutter_density=N_CLUTTER / BOX**2, gate=16.0)

    def run_one(c, m):
        _, est = jpda.run(model, state, c, m)
        return est.states[:, :, ::2]  # [T, 2, 2]

    marginal, pos = _bank_runner(run_one, cands, masks,
                                 lambda o: o[-1, -1, 0, 0])
    rms, loss = _maintained_rms(pos, truth[:, :, :, ::2])
    frames = B_SCENES * T_FRAMES
    return emit({
        "metric": "jpda_frames_per_sec", "value": frames / marginal,
        "unit": "frames/s", "bank_ms": 1e3 * marginal,
        "scenes": B_SCENES, "frames": T_FRAMES, "m_max": M_MAX,
        "n_targets": 2, "tail_set_rms": rms, "track_loss_rate": loss,
        "gates_pass": bool(rms < 1.0 and loss <= 0.02),
    })


def bench_tracker(bank2):
    """GNN tracker with M/N lifecycle (tracker.py): auto-initiation
    from clutter-contaminated frames, no prior target count."""
    truth, cands, masks = bank2
    f, q, h, r = _cv_system()
    p0_new = jnp.diag(jnp.asarray([1.0, 0.5, 1.0, 0.5], DTYPE))
    model, state = tracker.new(f, None, h, gn.noiseless(q, r),
                               n_slots=M_MAX, p0_new=p0_new, gate=16.0,
                               confirm_hits=3, delete_misses=4)

    def run_one(c, m):
        _, est = tracker.run(model, state, c, m)
        return est.states[:, :, ::2], est.status == 2, est.n_confirmed

    marginal, (pos, conf, ncf) = _bank_runner(
        run_one, cands, masks, lambda o: o[0][-1, -1, 0, 0])
    # Gate pair: (a) each truth is localized by its nearest CONFIRMED
    # track (slots carry no canonical order, and an occasional phantom
    # must not poison the localization read-out); (b) the confirmed
    # count stays in a band around 2 so phantoms can't hide.
    d = jnp.linalg.norm(
        pos[:, :, None, :, :] - truth[:, :, :, None, ::2], axis=-1)
    d = jnp.where(conf[:, :, None, :], d, jnp.inf)  # [B, T, 2, slots]
    nearest = jnp.min(d, axis=-1)  # [B, T, 2]
    tail = nearest[:, -TAIL:]
    rms = float(jnp.sqrt(jnp.mean(
        jnp.where(jnp.isfinite(tail), tail, 0.0) ** 2)))
    covered = float(jnp.mean(jnp.isfinite(tail)))
    ncf_tail = float(jnp.mean(ncf[:, -TAIL:]))
    frames = B_SCENES * T_FRAMES
    return emit({
        "metric": "gnn_tracker_frames_per_sec",
        "value": frames / marginal, "unit": "frames/s",
        "bank_ms": 1e3 * marginal, "scenes": B_SCENES,
        "frames": T_FRAMES, "m_max": M_MAX, "tail_loc_rms": rms,
        "tail_truth_coverage": covered, "tail_n_confirmed": ncf_tail,
        "gates_pass": bool(rms < 1.0 and covered > 0.95
                           and 1.8 < ncf_tail < 2.4),
    })


def _birth():
    bm = jnp.asarray([[-5.0, 0.1, -5.0, 0.1], [5.0, -0.1, 5.0, -0.1]],
                     DTYPE)
    bp = jnp.broadcast_to(
        jnp.diag(jnp.asarray([4.0, 0.25, 4.0, 0.25], DTYPE)), (2, 4, 4))
    bw = jnp.asarray([0.03, 0.03], DTYPE)
    return bw, bm, bp


def bench_phd(bank2):
    """GM-PHD (phd.py): intensity filter, no association at all."""
    truth, cands, masks = bank2
    f, q, h, r = _cv_system()
    bw, bm, bp = _birth()
    model, state = phd.new(f, None, h, gn.noiseless(q, r), bw, bm, bp,
                           p_survival=0.99, p_detect=PD,
                           clutter=N_CLUTTER / BOX**2, j_max=24)

    def run_one(c, m):
        _, est = phd.run(model, state, c, m)
        return est.states[:, :4, ::2], est.weights[:, :4], est.cardinality

    marginal, (pos, w, card) = _bank_runner(run_one, cands, masks,
                                            lambda o: o[0][-1, -1, 0, 0])
    ospa, worst = _tail_ospa(pos, w, truth[:, :, :, ::2])
    card_tail = float(jnp.mean(card[:, -TAIL:]))
    frames = B_SCENES * T_FRAMES
    return emit({
        "metric": "gm_phd_frames_per_sec", "value": frames / marginal,
        "unit": "frames/s", "bank_ms": 1e3 * marginal,
        "scenes": B_SCENES, "frames": T_FRAMES, "m_max": M_MAX,
        "j_max": 24, "tail_ospa": ospa, "worst_scene_ospa": worst,
        "tail_cardinality": card_tail,
        "gates_pass": bool(ospa < 0.5 and 1.6 < card_tail < 2.4),
    })


def bench_cphd(bank2):
    """GM-CPHD (cphd.py): PHD + full cardinality pmf propagation."""
    truth, cands, masks = bank2
    f, q, h, r = _cv_system()
    bw, bm, bp = _birth()
    model, state = cphd.new(f, None, h, gn.noiseless(q, r), bw, bm, bp,
                            p_survival=0.99, p_detect=PD,
                            clutter_rate=float(N_CLUTTER),
                            volume=BOX**2, n_max=12, j_max=24)

    def run_one(c, m):
        _, est = cphd.run(model, state, c, m)
        return (est.states[:, :4, ::2], est.cardinality_map,
                est.cardinality_mean)

    marginal, (pos, cmap, card) = _bank_runner(run_one, cands, masks,
                                               lambda o: o[0][-1, -1, 0, 0])
    # MAP-cardinality-driven extraction (Vo, Vo & Cantoni 2007): take
    # the top-N̂ components where N̂ = argmax ρ.  This is CPHD's selling
    # point — the pmf holds N̂ = 2 straight through missed detections,
    # where weight-thresholded extraction drops the missed target for a
    # frame (measured: OSPA 0.52 thresholded vs 0.30 MAP-driven on the
    # same run bank).
    top_k = jnp.arange(4)[None, None, :] < cmap[:, :, None]
    ospa, worst = _tail_ospa(pos, jnp.where(top_k, 1.0, 0.0),
                             truth[:, :, :, ::2])
    card_tail = float(jnp.mean(card[:, -TAIL:]))
    frames = B_SCENES * T_FRAMES
    return emit({
        "metric": "gm_cphd_frames_per_sec", "value": frames / marginal,
        "unit": "frames/s", "bank_ms": 1e3 * marginal,
        "scenes": B_SCENES, "frames": T_FRAMES, "m_max": M_MAX,
        "j_max": 24, "n_max": 12, "tail_ospa": ospa,
        "worst_scene_ospa": worst, "tail_cardinality": card_tail,
        "gates_pass": bool(ospa < 0.5 and 1.6 < card_tail < 2.4),
    })


def bench_pmb(bank2):
    """PMB/TOMB-P (pmb.py): Bernoulli tracks + BP association."""
    truth, cands, masks = bank2
    f, q, h, r = _cv_system()
    bw, bm, bp = _birth()
    model, state = pmb.new(f, None, h, gn.noiseless(q, r), bw, bm, bp,
                           p_survival=0.99, p_detect=PD,
                           clutter=N_CLUTTER / BOX**2, j_max=8,
                           t_max=8, bp_iters=10)

    def run_one(c, m):
        _, est = pmb.run(model, state, c, m)
        return est.states[:, :4, ::2], est.existence[:, :4], est.n_targets

    marginal, (pos, ex, nt) = _bank_runner(run_one, cands, masks,
                                           lambda o: o[0][-1, -1, 0, 0])
    # r > 0.5 extraction (the Bernoulli-track standard), OSPA-scored:
    # fixed top-2-by-existence reads DUPLICATE tracks of one target as
    # a "lost" other target (measured on chip: 2-10% phantom scene-loss
    # across pmb/lmb/glmb, while the per-truth nearest-track RMS in
    # those very scenes is 0.14-0.24 — every target is tracked; only
    # the read-out was wrong).
    ospa, worst = _tail_ospa(pos, ex, truth[:, :, :, ::2])
    nt_tail = float(jnp.mean(nt[:, -TAIL:]))
    frames = B_SCENES * T_FRAMES
    return emit({
        "metric": "pmb_frames_per_sec", "value": frames / marginal,
        "unit": "frames/s", "bank_ms": 1e3 * marginal,
        "scenes": B_SCENES, "frames": T_FRAMES, "m_max": M_MAX,
        "t_max": 8, "bp_iters": 10, "tail_ospa": ospa,
        "worst_scene_ospa": worst, "tail_n_targets": nt_tail,
        "gates_pass": bool(ospa < 0.5 and worst < 1.0
                           and 1.6 < nt_tail < 2.4),
    })


def bench_lmb(bank2):
    """Labeled multi-Bernoulli (lmb.py): labeled-RFS tracking with BP
    association at this scene scale."""
    truth, cands, masks = bank2
    f, q, h, r = _cv_system()
    bw, bm, bp = _birth()
    model, state = lmb.new(f, None, h, gn.noiseless(q, r), bw, bm, bp,
                           m_max=M_MAX, p_survival=0.99, p_detect=PD,
                           clutter=N_CLUTTER / BOX**2, t_max=8,
                           assoc="bp", bp_iters=10)

    def run_one(c, m):
        _, est = lmb.run(model, state, c, m)
        return est.states[:, :4, ::2], est.existence[:, :4], est.n_targets

    marginal, (pos, ex, nt) = _bank_runner(run_one, cands, masks,
                                           lambda o: o[0][-1, -1, 0, 0])
    ospa, worst = _tail_ospa(pos, ex, truth[:, :, :, ::2])  # r > 0.5
    nt_tail = float(jnp.mean(nt[:, -TAIL:]))
    frames = B_SCENES * T_FRAMES
    return emit({
        "metric": "lmb_frames_per_sec", "value": frames / marginal,
        "unit": "frames/s", "bank_ms": 1e3 * marginal,
        "scenes": B_SCENES, "frames": T_FRAMES, "m_max": M_MAX,
        "t_max": 8, "bp_iters": 10, "tail_ospa": ospa,
        "worst_scene_ospa": worst, "tail_n_targets": nt_tail,
        "gates_pass": bool(ospa < 0.5 and worst < 1.0
                           and 1.6 < nt_tail < 2.4),
    })


def bench_glmb(bank2):
    """delta-GLMB (glmb.py) with the Gibbs association backend at this
    scene scale: hypothesis-carrying labeled RFS — the most expensive
    tracker in the stack (per frame it samples and exactly scores
    h_max x n_samples global hypotheses)."""
    truth, cands, masks = bank2
    f, q, h, r = _cv_system()
    bw, bm, bp = _birth()
    br = jnp.asarray([0.1, 0.1], DTYPE)
    model, state = glmb.new(f, None, h, gn.noiseless(q, r), br, bm, bp,
                            m_max=M_MAX, p_survival=0.99, p_detect=PD,
                            clutter=N_CLUTTER / BOX**2, gate=16.0,
                            t_max=4, h_max=16, assoc="gibbs",
                            n_samples=16, gibbs_sweeps=4)
    key = jax.random.PRNGKey(21)

    def run_one(c, m):
        _, est = glmb.run(model, state, c, m, key=key)
        # the Vo & Vo delta-GLMB estimator: tracks of the best
        # hypothesis at the MAP cardinality (marginal-existence top-k
        # misreads duplicate labels of one target as a lost other)
        return est.map_states[:, :, ::2], est.map_alive, est.n_targets

    marginal, (pos, alive, nt) = _bank_runner(
        run_one, cands, masks, lambda o: o[0][-1, -1, 0, 0])
    ospa, worst = _tail_ospa(pos, jnp.where(alive, 1.0, 0.0),
                             truth[:, :, :, ::2])
    nt_tail = float(jnp.mean(nt[:, -TAIL:]))
    frames = B_SCENES * T_FRAMES
    return emit({
        "metric": "glmb_frames_per_sec", "value": frames / marginal,
        "unit": "frames/s", "bank_ms": 1e3 * marginal,
        "scenes": B_SCENES, "frames": T_FRAMES, "m_max": M_MAX,
        "t_max": 4, "h_max": 16, "n_samples": 16, "gibbs_sweeps": 4,
        "tail_ospa": ospa, "worst_scene_ospa": worst,
        "tail_n_targets": nt_tail,
        "gates_pass": bool(ospa < 0.5 and worst < 1.0
                           and 1.6 < nt_tail < 2.4),
    })


def bench_fusion(bank2, key):
    """Track-to-track association + covariance-intersection fusion
    (fusion.associate_and_fuse) over every (scene, frame) as an
    independent fusion problem: two sensors with COMPLEMENTARY-axis
    accuracy (a sharp in x / blurry in y, b the reverse — e.g. two
    crossed range-accurate radars), padded 4-slot track sets.  Gate:
    fused matched-track RMS beats BOTH single-sensor RMS.  The axes
    must be complementary for this gate to be achievable: with ALIGNED
    covariance shapes CI's optimum is ω = 1 (take the tighter track
    verbatim, fused == sensor a exactly — measured; same
    scalar-endpoint argument as the ICI tightness tests), because
    without cross-covariance knowledge CI cannot exploit
    independence."""
    truth, _, _ = bank2
    pos = truth[:, :, :, ::2].reshape(-1, 2, 2)  # [B*T, 2, 2]
    n_prob = pos.shape[0]
    ka, kb = jax.random.split(key)
    sig_a = jnp.asarray([0.2, 0.8], DTYPE)  # sharp x, blurry y
    sig_b = jnp.asarray([0.8, 0.2], DTYPE)  # blurry x, sharp y
    pa = jnp.diag(sig_a**2)
    pb = jnp.diag(sig_b**2)
    xa_v = pos + sig_a * jax.random.normal(ka, pos.shape, DTYPE)
    xb_v = pos + sig_b * jax.random.normal(kb, pos.shape, DTYPE)
    pad = jnp.zeros((n_prob, 2, 2), DTYPE)
    xa = jnp.concatenate([xa_v, pad], axis=1)  # [n_prob, 4, 2]
    xb = jnp.concatenate([xb_v, pad], axis=1)
    mask = jnp.zeros((n_prob, 4), bool).at[:, :2].set(True)
    pas = jnp.broadcast_to(pa, (n_prob, 4, 2, 2))
    pbs = jnp.broadcast_to(pb, (n_prob, 4, 2, 2))

    def fuse_one(x1, p1, m1, x2, p2, m2):
        xs, ps, mk = fusion.associate_and_fuse(x1, p1, m1, x2, p2, m2,
                                               gate=16.0)
        return xs[:2]  # a-side fused tracks

    def make(repeats):
        @jax.jit
        def fn(shift):
            outs = []
            for i in range(repeats):
                x1 = jnp.roll(xa, shift + i, axis=0)
                outs.append(jax.vmap(fuse_one)(x1, pas, mask,
                                               xb, pbs, mask))
            return sum(outs)

        return fn

    marginal, fused = _slope_time(make, lambda o: o[-1, 0, 0])
    rms_f = _set_rms(fused.reshape(B_SCENES, T_FRAMES, 2, 2),
                     truth[:, :, :, ::2])
    rms_a = _set_rms(xa_v.reshape(B_SCENES, T_FRAMES, 2, 2),
                     truth[:, :, :, ::2])
    rms_b = _set_rms(xb_v.reshape(B_SCENES, T_FRAMES, 2, 2),
                     truth[:, :, :, ::2])
    return emit({
        "metric": "t2t_fusion_problems_per_sec",
        "value": n_prob / marginal, "unit": "fusions/s",
        "bank_ms": 1e3 * marginal, "problems": n_prob,
        "fused_rms": rms_f, "sensor_a_rms": rms_a, "sensor_b_rms": rms_b,
        "gates_pass": bool(rms_f < 0.95 * min(rms_a, rms_b)),
    })


def main():
    backend_watchdog(float(os.environ.get("BENCH_BACKEND_TIMEOUT", 600)),
                     "bench_tracking")
    dev = jax.devices()[0].platform
    bank1 = _gen_bank(jax.random.PRNGKey(11), n_targets=1)
    bank2 = _gen_bank(jax.random.PRNGKey(12), n_targets=2)
    rows = [
        bench_pdaf(bank1),
        bench_jpda(bank2),
        bench_tracker(bank2),
        bench_phd(bank2),
        bench_cphd(bank2),
        bench_pmb(bank2),
        bench_lmb(bank2),
        bench_glmb(bank2),
        bench_fusion(bank2, jax.random.PRNGKey(13)),
    ]
    ok = all(r["gates_pass"] for r in rows)
    emit({"metric": "tracking_tier_summary", "rows": len(rows),
          "backend": dev, "gates_pass": ok})
    assert ok, "tracking-tier accuracy gates failed"


if __name__ == "__main__":
    main()
