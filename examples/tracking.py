"""Multi-target tracking: the full pipeline, one threat at a time.

The reference filters a known-origin measurement stream (vanilla.go:128
consumes THE measurement); real surveillance gets frames of anonymous
detections.  This example walks the tracking tier up the difficulty
ladder on one 2-D constant-velocity world — every printed claim is
asserted:

1. ONE target in clutter -> `pdaf`: soft association beats the
   greedy nearest-neighbor KF in RMS.
2. TWO CROSSING targets -> `jpda`: exclusivity beats two independent
   PDAFs, which double-count shared detections and coalesce.
3. UNKNOWN, CHANGING target count -> `tracker`: GNN + M/N lifecycle
   confirms each target shortly after appearance, reports the exact
   confirmed count through an appearance and a disappearance, and
   never confirms clutter.
4. Same scene, PRINCIPLED random-finite-set treatment -> `cphd`:
   the cardinality pmf's MAP count is exact in every settled window,
   its mean is 6x steadier than the PHD's, and the per-frame OSPA
   (`diagnostics.ospa`) against truth stays near the measurement
   noise floor.
5. IDENTITY, done properly -> `pmb`: one Bernoulli per track with a
   posterior existence probability and a lifetime label — each target
   keeps a single label from acquisition to death, existence snaps
   up on acquisition and decays cleanly after death, and track-based
   extraction drives OSPA well under the CPHD's (0.15 vs 0.63 here).
   (The tracker's M/N counters approximate this; the PHD/CPHD can't
   represent it at all.)
6. LABELED RFS -> `lmb`: the labeled multi-Bernoulli filter (no
   Poisson component — every hypothesis is a labeled track), GOSPA-
   scored against PMB and CPHD: matches the PMB and beats the CPHD's
   missed-target cost ~4x, with one label per target for life.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/tracking.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu.diagnostics import ospa
from gokalman_tpu.filters import (cphd, jpda, pdaf, phd, pmb, tracker,
                                  vanilla)

DT = 1.0


def cv_system(q_scale=2e-4, r_scale=0.02):
    f = jnp.asarray(np.kron(np.eye(2), np.array([[1.0, DT], [0.0, 1.0]])))
    qb = np.array([[DT**3 / 3, DT**2 / 2], [DT**2 / 2, DT]]) * q_scale
    q = jnp.asarray(np.kron(np.eye(2), qb))
    h = jnp.asarray(np.kron(np.eye(2), np.array([[1.0, 0.0]])))
    r = r_scale * jnp.eye(2)
    return f, q, h, r


def act_one_pdaf():
    """Single target, PD=0.9 (real sensors miss!), 4 local clutter
    points/frame: on miss frames greedy-NN confidently swallows clutter
    and gets dragged; the PDAF's β₀ keeps it honest."""
    rng = np.random.default_rng(1)
    f, q, h, r = cv_system()
    fn, hn = np.asarray(f), np.asarray(h)
    T = 150
    x = np.array([0.0, 0.1, 0.0, -0.08])
    frames, truth = [], []
    for k in range(T):
        x = fn @ x
        truth.append(x.copy())
        dets = []
        if rng.random() < 0.9:
            dets.append(hn @ x + 0.1414 * rng.standard_normal(2))
        while len(dets) < 5:
            dets.append(x[::2] + rng.uniform(-3, 3, 2))  # local clutter
        rng.shuffle(dets)
        frames.append(np.stack(dets))
    frames = jnp.asarray(np.stack(frames))
    masks = jnp.ones((T, 5), bool)
    truth = np.stack(truth)
    x0 = jnp.asarray(truth[0] + 0.05 * rng.standard_normal(4))
    p0 = jnp.eye(4) * 0.1
    nz = gn.noiseless(q, r)
    pm, ps = pdaf.new(x0, p0, f, None, h, nz, pd=0.9,
                      clutter_density=4 / 36.0, gate=16.0)
    _, ep = pdaf.run(pm, ps, frames, masks)
    rms_pdaf = float(np.sqrt(
        ((np.asarray(ep.state)[:, ::2] - truth[:, ::2]) ** 2).mean()))

    # greedy NN baseline: plain KF updated with the nearest detection
    vm, vs = vanilla.new(x0, p0, f, None, h, nz)
    st = vs
    errs = []
    for k in range(T):
        x_pred, p_pred = vanilla.predict(vm, st)
        d = np.linalg.norm(np.asarray(frames[k]) - np.asarray(
            x_pred[::2]), axis=1)
        st, e = vanilla.step(vm, st, frames[k][int(np.argmin(d))])
        errs.append(np.asarray(e.state)[::2] - truth[k][::2])
    rms_nn = float(np.sqrt((np.stack(errs) ** 2).mean()))
    print(f"act 1 (clutter):   PDAF RMS {rms_pdaf:.3f}  "
          f"vs greedy-NN KF {rms_nn:.3f}")
    assert rms_pdaf < 0.7 * rms_nn, (rms_pdaf, rms_nn)


def act_two_jpda():
    """Two crossing targets: JPDA vs independent PDAFs (6 clutter
    draws, mean RMS)."""
    f, q, h, r = cv_system()
    fn, hn = np.asarray(f), np.asarray(h)
    T = 40
    rms_j, rms_p = [], []
    for seed in range(6):
        rng = np.random.default_rng(10 + seed)
        t1 = np.array([-2.0, 0.1, 0.0, 0.0])
        t2 = np.array([2.0, -0.1, 0.4, 0.0])
        frames, xs1, xs2 = [], [], []
        for k in range(T):
            t1, t2 = fn @ t1, fn @ t2
            xs1.append(t1.copy())
            xs2.append(t2.copy())
            dets = []
            for tr in (t1, t2):
                if rng.random() < 0.95:
                    dets.append(hn @ tr + 0.1414 * rng.standard_normal(2))
            while len(dets) < 5:
                dets.append(rng.uniform(-4, 4, 2))
            frames.append(np.stack(dets[:5]))
        frames = jnp.asarray(np.stack(frames))
        masks = jnp.ones((T, 5), bool)
        truth = np.stack([np.stack(xs1), np.stack(xs2)], axis=1)
        nz = gn.noiseless(q, r)
        x0s = jnp.asarray(truth[0] + 0.05 * rng.standard_normal((2, 4)))
        p0 = jnp.eye(4) * 0.1
        jm, js = jpda.new(x0s, p0, f, None, h, nz, m_max=5, pd=0.95,
                          clutter_density=5 / 64.0)
        _, ej = jpda.run(jm, js, frames, masks)
        err_j = np.asarray(ej.states) - truth
        rms_j.append(np.sqrt((err_j[:, :, ::2] ** 2).mean()))
        est_p = np.zeros((T, 2, 4))
        for t in range(2):
            pm, ps = pdaf.new(x0s[t], p0, f, None, h, nz, pd=0.95,
                              clutter_density=5 / 64.0)
            _, ep = pdaf.run(pm, ps, frames, masks)
            est_p[:, t] = np.asarray(ep.state)
        rms_p.append(np.sqrt(((est_p - truth)[:, :, ::2] ** 2).mean()))
    rms_j, rms_p = float(np.mean(rms_j)), float(np.mean(rms_p))
    print(f"act 2 (crossing):  JPDA RMS {rms_j:.3f}  "
          f"vs independent PDAFs {rms_p:.3f}")
    assert rms_j < rms_p, (rms_j, rms_p)


def act_three_tracker():
    """Unknown target count: A lives frames 0..44, B appears at 20."""
    rng = np.random.default_rng(3)
    f, q, h, r = cv_system(q_scale=1e-3)
    fn, hn = np.asarray(f), np.asarray(h)
    T = 80
    a = np.array([-5.0, 0.12, -5.0, 0.10])
    b = np.array([5.0, -0.10, 5.0, -0.08])
    frames = []
    for k in range(T):
        a, b = fn @ a, fn @ b
        dets = []
        if k < 45:
            dets.append(hn @ a + 0.1414 * rng.standard_normal(2))
        if k >= 20:
            dets.append(hn @ b + 0.1414 * rng.standard_normal(2))
        while len(dets) < 5:
            dets.append(rng.uniform(-50, 50, 2))
        rng.shuffle(dets)
        frames.append(np.stack(dets))
    frames = jnp.asarray(np.stack(frames))
    masks = jnp.ones((T, 5), bool)
    model, state = tracker.new(
        f, None, h, gn.noiseless(q, r), n_slots=8,
        p0_new=jnp.diag(jnp.asarray([0.2, 0.25, 0.2, 0.25])),
        gate=16.0, confirm_hits=3, delete_misses=3, confirm_window=6)
    _, est = tracker.run(model, state, frames, masks)
    nc = np.asarray(est.n_confirmed)
    print(f"act 3 (lifecycle): confirmed-count trace "
          f"k=6:{nc[6]} k=28:{nc[28]} k=60+max:{nc[60:].max()}")
    assert nc[6] == 1, nc[:10]  # A confirmed alone
    assert nc[28] == 2, nc[20:30]  # B joined
    assert nc[60:].max() == 1, nc[55:]  # A deleted, no phantoms


def act_four_rfs():
    """The act-3 scene through the RFS filters, scored by OSPA."""
    rng = np.random.default_rng(3)
    f, q, h, r = cv_system(q_scale=1e-3)
    fn, hn = np.asarray(f), np.asarray(h)
    T = 80
    a = np.array([-5.0, 0.12, -5.0, 0.10])
    b = np.array([5.0, -0.10, 5.0, -0.08])
    frames, truth, tmask = [], np.zeros((T, 2, 2)), np.zeros((T, 2), bool)
    for k in range(T):
        a, b = fn @ a, fn @ b
        truth[k, 0], truth[k, 1] = a[::2], b[::2]
        dets = []
        if k < 45:
            tmask[k, 0] = True
            if rng.random() < 0.95:
                dets.append(hn @ a + 0.1414 * rng.standard_normal(2))
        if k >= 20:
            tmask[k, 1] = True
            if rng.random() < 0.95:
                dets.append(hn @ b + 0.1414 * rng.standard_normal(2))
        while len(dets) < 5:
            dets.append(rng.uniform(-50, 50, 2))
        rng.shuffle(dets)
        frames.append(np.stack(dets))
    frames = jnp.asarray(np.stack(frames))
    masks = jnp.ones((T, 5), bool)
    bm = jnp.asarray([[-5.0, 0.0, -5.0, 0.0], [5.0, 0.0, 5.0, 0.0]])
    bp = jnp.broadcast_to(
        jnp.diag(jnp.asarray([4.0, 0.25, 4.0, 0.25])), (2, 4, 4))
    bw = jnp.asarray([0.03, 0.03])
    nz = gn.noiseless(q, r)

    cm, cs = cphd.new(f, None, h, nz, bw, bm, bp, p_survival=0.99,
                      p_detect=0.95, clutter_rate=5.0, volume=10000.0,
                      n_max=12, j_max=24)
    _, ec = cphd.run(cm, cs, frames, masks)
    pm, ps = phd.new(f, None, h, nz, bw, bm, bp, p_survival=0.99,
                     p_detect=0.95, clutter=5 / 10000.0, j_max=24)
    _, ep = phd.run(pm, ps, frames, masks)

    cmap = np.asarray(ec.cardinality_map)
    c_mean = np.asarray(ec.cardinality_mean)
    p_card = np.asarray(ep.cardinality)
    acc = ((cmap[8:18] == 1).mean() + (cmap[30:44] == 2).mean()
           + (cmap[60:] == 1).mean()) / 3
    std_ratio = p_card[30:44].std() / max(c_mean[30:44].std(), 1e-9)
    o = jax.vmap(lambda e, em, t, tm: ospa(e, em, t, tm, 5.0))(
        ec.states[:, :4, ::2], ec.weights[:, :4] > 0.5,
        jnp.asarray(truth), jnp.asarray(tmask))
    o_mid = float(np.asarray(o)[30:44].mean())
    print(f"act 4 (RFS):       CPHD MAP-count accuracy {acc:.2f}, "
          f"count {std_ratio:.0f}x steadier than PHD, "
          f"mid-arc OSPA {o_mid:.2f} (cutoff 5)")
    assert acc > 0.9, acc
    assert std_ratio > 3.0, std_ratio
    assert o_mid < 1.0, o_mid
    print("all claims verified.")


def act_five_pmb():
    """Act-3 scene through the PMB: lifetime labels + existence."""
    rng = np.random.default_rng(3)
    f, q, h, r = cv_system(q_scale=1e-3)
    fn, hn = np.asarray(f), np.asarray(h)
    T = 80
    a = np.array([-5.0, 0.12, -5.0, 0.10])
    b = np.array([5.0, -0.10, 5.0, -0.08])
    frames, truth, tmask = [], np.zeros((T, 2, 2)), np.zeros((T, 2), bool)
    for k in range(T):
        a, b = fn @ a, fn @ b
        truth[k, 0], truth[k, 1] = a[::2], b[::2]
        dets = []
        if k < 45:
            tmask[k, 0] = True
            if rng.random() < 0.95:
                dets.append(hn @ a + 0.1414 * rng.standard_normal(2))
        if k >= 20:
            tmask[k, 1] = True
            if rng.random() < 0.95:
                dets.append(hn @ b + 0.1414 * rng.standard_normal(2))
        while len(dets) < 5:
            dets.append(rng.uniform(-50, 50, 2))
        rng.shuffle(dets)
        frames.append(np.stack(dets))
    frames = jnp.asarray(np.stack(frames))
    masks = jnp.ones((T, 5), bool)
    bm = jnp.asarray([[-5.0, 0.0, -5.0, 0.0], [5.0, 0.0, 5.0, 0.0]])
    bp = jnp.broadcast_to(
        jnp.diag(jnp.asarray([4.0, 0.25, 4.0, 0.25])), (2, 4, 4))
    model, state = pmb.new(f, None, h, gn.noiseless(q, r),
                           jnp.asarray([0.03, 0.03]), bm, bp,
                           p_survival=0.99, p_detect=0.95,
                           clutter=5 / 10000.0, j_max=16, t_max=8)
    _, est = pmb.run(model, state, frames, masks)
    exist = np.asarray(est.existence)
    states = np.asarray(est.states)
    labels = np.asarray(est.labels)
    nconf = np.asarray(est.n_confirmed)

    def label_near(k, t):
        d = np.linalg.norm(states[k, :, ::2] - truth[k, t][None], axis=1)
        d = np.where(exist[k] > 0.5, d, np.inf)
        return tuple(labels[k, int(np.argmin(d))])

    la = {label_near(k, 0) for k in range(6, 44)}
    lb = {label_near(k, 1) for k in range(26, 79)}
    o = jax.vmap(lambda e, em, t, tm: ospa(e, em, t, tm, 5.0))(
        est.states[:, :4, ::2], est.existence[:, :4] > 0.5,
        jnp.asarray(truth), jnp.asarray(tmask))
    o_mid = float(np.asarray(o)[30:44].mean())
    # existence of the A-track after A dies at k=45
    slot_a = [i for i in range(8)
              if tuple(labels[40, i]) in la and exist[40, i] > 0.5][0]
    r_after = exist[52, slot_a] if tuple(
        labels[52, slot_a]) in la else 0.0
    print(f"act 5 (identity):  A label {la}, B label {lb}; "
          f"counts k=6:{nconf[6]} k=28:{nconf[28]} k=60+max:"
          f"{nconf[60:].max()}; A existence k=52: {r_after:.3f}; "
          f"mid-arc OSPA {o_mid:.2f}")
    assert len(la) == 1 and len(lb) == 1 and la != lb, (la, lb)
    assert nconf[6] == 1 and nconf[28] == 2 and nconf[60:].max() == 1
    assert r_after < 0.5, r_after  # existence decayed post-death
    assert o_mid < 1.0, o_mid
    print("all claims verified.")


def act_six_lmb():
    """Labeled-RFS endpoint: the act-3 scene through the LMB filter,
    GOSPA-scored against PMB and CPHD.  GOSPA decomposes the error
    into localization + missed + false (diagnostics.gospa), so the
    comparison says WHERE each filter loses mass, not just how much."""
    from gokalman_tpu.diagnostics import gospa
    from gokalman_tpu.filters import lmb

    rng = np.random.default_rng(3)
    f, q, h, r = cv_system(q_scale=1e-3)
    fn, hn = np.asarray(f), np.asarray(h)
    T = 80
    a = np.array([-5.0, 0.12, -5.0, 0.10])
    b = np.array([5.0, -0.10, 5.0, -0.08])
    frames, truth, tmask = [], np.zeros((T, 2, 2)), np.zeros((T, 2), bool)
    for k in range(T):
        a, b = fn @ a, fn @ b
        truth[k, 0], truth[k, 1] = a[::2], b[::2]
        dets = []
        if k < 45:
            tmask[k, 0] = True
            if rng.random() < 0.95:
                dets.append(hn @ a + 0.1414 * rng.standard_normal(2))
        if k >= 20:
            tmask[k, 1] = True
            if rng.random() < 0.95:
                dets.append(hn @ b + 0.1414 * rng.standard_normal(2))
        while len(dets) < 5:
            dets.append(rng.uniform(-50, 50, 2))
        rng.shuffle(dets)
        frames.append(np.stack(dets))
    frames = jnp.asarray(np.stack(frames))
    masks = jnp.ones((T, 5), bool)
    bm = jnp.asarray([[-5.0, 0.0, -5.0, 0.0], [5.0, 0.0, 5.0, 0.0]])
    bp = jnp.broadcast_to(
        jnp.diag(jnp.asarray([4.0, 0.25, 4.0, 0.25])), (2, 4, 4))
    nz = gn.noiseless(q, r)

    lm, ls = lmb.new(f, None, h, nz, jnp.asarray([0.03, 0.03]), bm, bp,
                     m_max=5, p_survival=0.99, p_detect=0.95,
                     clutter=5 / 10000.0, t_max=6, assoc="bp")
    _, el = lmb.run(lm, ls, frames, masks)
    pm, ps = pmb.new(f, None, h, nz, jnp.asarray([0.03, 0.03]), bm, bp,
                     p_survival=0.99, p_detect=0.95, clutter=5 / 10000.0,
                     j_max=16, t_max=8)
    _, ep = pmb.run(pm, ps, frames, masks)
    cm, cs = cphd.new(f, None, h, nz, jnp.asarray([0.03, 0.03]), bm, bp,
                      p_survival=0.99, p_detect=0.95, clutter_rate=5.0,
                      volume=10000.0, n_max=12, j_max=24)
    _, ec = cphd.run(cm, cs, frames, masks)

    def score(states, mask4):
        g = jax.vmap(lambda e, em, t, tm: gospa(e, em, t, tm, 5.0))(
            states, mask4, jnp.asarray(truth), jnp.asarray(tmask))
        return np.asarray(g[0])[10:].mean(), np.asarray(g[2])[10:].mean()

    g_l, miss_l = score(el.states[:, :4, ::2], el.existence[:, :4] > 0.5)
    g_p, miss_p = score(ep.states[:, :4, ::2], ep.existence[:, :4] > 0.5)
    g_c, miss_c = score(ec.states[:, :4, ::2], ec.weights[:, :4] > 0.5)
    # label continuity through the whole life of each target
    labels = np.asarray(el.labels)
    exist = np.asarray(el.existence)
    states = np.asarray(el.states)

    def label_near(k, t):
        d = np.linalg.norm(states[k, :, ::2] - truth[k, t][None], axis=1)
        d = np.where(exist[k] > 0.5, d, np.inf)
        return tuple(labels[k, int(np.argmin(d))])

    la = {label_near(k, 0) for k in range(6, 44)}
    lb = {label_near(k, 1) for k in range(26, 79)}
    print(f"act 6 (labeled RFS): GOSPA LMB {g_l:.2f}  PMB {g_p:.2f}  "
          f"CPHD {g_c:.2f} (missed-cost {miss_l:.2f}/{miss_p:.2f}/"
          f"{miss_c:.2f}); LMB labels A {la} B {lb}")
    assert g_l < 1.2 * g_p, (g_l, g_p)  # track-based peers
    # matches the unlabeled intensity filter's GOSPA (within noise)
    # while ALSO carrying identity — the labels below are the point.
    # (Before the Vo-Ma cluster merge the CPHD read ~10% worse here
    # and this line asserted strict dominance; the merge improvement
    # brought the two to a statistical tie, 0.290 vs 0.288.)
    assert g_l < 1.05 * g_c, (g_l, g_c)
    assert miss_l <= miss_c, (miss_l, miss_c)  # fewer missed-target frames
    assert len(la) == 1 and len(lb) == 1 and la != lb, (la, lb)
    print("all claims verified.")


def act_seven_glmb():
    """Hypothesis-carrying endpoint: the act-6 scene through the
    delta-GLMB filter (Gibbs backend).  Unlike every filter before it,
    its cardinality pmf comes straight off the global-hypothesis
    weights (exact given the kept set), and the MAP-cardinality
    best-hypothesis extraction keeps labeled tracks without any
    marginalization step."""
    from gokalman_tpu.diagnostics import gospa
    from gokalman_tpu.filters import glmb, lmb

    rng = np.random.default_rng(3)
    f, q, h, r = cv_system(q_scale=1e-3)
    fn, hn = np.asarray(f), np.asarray(h)
    T = 80
    a = np.array([-5.0, 0.12, -5.0, 0.10])
    b = np.array([5.0, -0.10, 5.0, -0.08])
    frames, truth, tmask = [], np.zeros((T, 2, 2)), np.zeros((T, 2), bool)
    for k in range(T):
        a, b = fn @ a, fn @ b
        truth[k, 0], truth[k, 1] = a[::2], b[::2]
        dets = []
        if k < 45:
            tmask[k, 0] = True
            if rng.random() < 0.95:
                dets.append(hn @ a + 0.1414 * rng.standard_normal(2))
        if k >= 20:
            tmask[k, 1] = True
            if rng.random() < 0.95:
                dets.append(hn @ b + 0.1414 * rng.standard_normal(2))
        while len(dets) < 5:
            dets.append(rng.uniform(-50, 50, 2))
        rng.shuffle(dets)
        frames.append(np.stack(dets))
    frames = jnp.asarray(np.stack(frames))
    masks = jnp.ones((T, 5), bool)
    bm = jnp.asarray([[-5.0, 0.0, -5.0, 0.0], [5.0, 0.0, 5.0, 0.0]])
    bp = jnp.broadcast_to(
        jnp.diag(jnp.asarray([4.0, 0.25, 4.0, 0.25])), (2, 4, 4))
    nz = gn.noiseless(q, r)
    br = jnp.asarray([0.03, 0.03])

    gm, gs = glmb.new(f, None, h, nz, br, bm, bp, m_max=5,
                      p_survival=0.99, p_detect=0.95,
                      clutter=5 / 10000.0, t_max=5, h_max=24,
                      assoc="gibbs", n_samples=24, gibbs_sweeps=5)
    _, eg = glmb.run(gm, gs, frames, masks, key=jax.random.PRNGKey(7))
    lm, ls = lmb.new(f, None, h, nz, br, bm, bp, m_max=5,
                     p_survival=0.99, p_detect=0.95,
                     clutter=5 / 10000.0, t_max=6, assoc="bp")
    _, el = lmb.run(lm, ls, frames, masks)

    def score(states, mask4):
        g = jax.vmap(lambda e, em, t, tm: gospa(e, em, t, tm, 5.0))(
            states, mask4, jnp.asarray(truth), jnp.asarray(tmask))
        return np.asarray(g[0])[10:].mean()

    g_g = score(eg.map_states[:, :4, ::2], eg.map_alive[:, :4])
    g_l = score(el.states[:, :4, ::2], el.existence[:, :4] > 0.5)

    # MAP cardinality from the EXACT hypothesis pmf, scored per frame
    # in the settled windows (both targets' lifecycles stable)
    true_n = tmask.sum(axis=1)
    settled = ([k for k in range(8, 42)] + [k for k in range(50, 78)])
    map_n = np.asarray(eg.map_cardinality)
    acc = np.mean([map_n[k] == true_n[k] for k in settled])

    # label continuity of the MAP track set
    labels = np.asarray(eg.labels)
    alive = np.asarray(eg.map_alive)
    states = np.asarray(eg.map_states)

    def label_near(k, t):
        d = np.linalg.norm(states[k, :, ::2] - truth[k, t][None], axis=1)
        d = np.where(alive[k], d, np.inf)
        return tuple(labels[k, int(np.argmin(d))])

    la = {label_near(k, 0) for k in range(6, 44)}
    lb = {label_near(k, 1) for k in range(26, 79)}
    print(f"act 7 (delta-GLMB): GOSPA {g_g:.2f} vs LMB {g_l:.2f}; "
          f"MAP-count accuracy {acc:.2f}; labels A {la} B {lb}")
    assert g_g < 1.2 * g_l, (g_g, g_l)
    assert acc > 0.9, acc
    assert len(la) == 1 and len(lb) == 1 and la != lb, (la, lb)
    print("all claims verified.")


if __name__ == "__main__":
    act_one_pdaf()
    act_two_jpda()
    act_three_tracker()
    act_four_rfs()
    act_five_pmb()
    act_six_lmb()
    act_seven_glmb()
