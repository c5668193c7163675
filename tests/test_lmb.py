"""LMB filter pins: exact-association update digit-level against
brute-force labeled multi-target Bayes (enumerating existence x
detection x association from first principles), BP backend vs exact,
single-target KF parity, labels through crossings, cardinality pmf,
clutter rejection, adaptive birth, padded-slot poison."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import lmb, pmb, vanilla


def _cv_system(dt=1.0, q_scale=1e-3, r_scale=0.04):
    f = jnp.asarray(np.kron(np.eye(2), np.array([[1.0, dt], [0.0, 1.0]])))
    qb = np.array([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]]) * q_scale
    q = jnp.asarray(np.kron(np.eye(2), qb))
    h = jnp.asarray(np.kron(np.eye(2), np.array([[1.0, 0.0]])))
    r = r_scale * jnp.eye(2)
    return f, q, h, r


def _birth():
    bm = jnp.asarray([[-5.0, 0.1, -5.0, 0.1], [5.0, -0.1, 5.0, -0.1]])
    bp = jnp.broadcast_to(jnp.diag(jnp.asarray([4.0, 0.25, 4.0, 0.25])),
                          (2, 4, 4))
    br = jnp.asarray([0.03, 0.03])
    return br, bm, bp


def _bruteforce_labeled_bayes(rs, ms, ps, h, r_cov, zs, pd, kappa):
    """First-principles labeled multi-target Bayes for one frame:
    enumerate existence subsets E, detection subsets D of E, and
    one-to-one mappings of D onto measurements; remaining measurements
    are clutter with intensity kappa.  Returns per-label posterior
    (r', mean', cov') with the spatial density marginalized to its
    exact mixture moments."""
    nt = len(rs)
    m = len(zs)
    h = np.asarray(h)
    r_cov = np.asarray(r_cov)

    def gauss(z, mean, cov):
        s = h @ cov @ h.T + r_cov
        d = z - h @ mean
        return (np.exp(-0.5 * d @ np.linalg.solve(s, d))
                / np.sqrt((2 * np.pi) ** len(z) * np.linalg.det(s)))

    def kf_update(mean, cov, z):
        s = h @ cov @ h.T + r_cov
        k = cov @ h.T @ np.linalg.inv(s)
        mean_u = mean + k @ (z - h @ mean)
        ikh = np.eye(len(mean)) - k @ h
        cov_u = ikh @ cov @ ikh.T + k @ r_cov @ k.T
        return mean_u, cov_u

    total = 0.0
    # accumulators: per track, posterior existence mass and the
    # (weight, mean, cov) mixture of its conditional density
    r_mass = np.zeros(nt)
    mix = [[] for _ in range(nt)]
    for exist in itertools.product([0, 1], repeat=nt):
        e_idx = [i for i in range(nt) if exist[i]]
        w_e = np.prod([rs[i] if exist[i] else 1 - rs[i]
                       for i in range(nt)])
        for d_size in range(len(e_idx) + 1):
            for d_set in itertools.combinations(e_idx, d_size):
                if d_size > m:
                    continue
                w_d = w_e * np.prod(
                    [pd if i in d_set else 1 - pd for i in e_idx])
                for z_idx in itertools.permutations(range(m), d_size):
                    w = w_d * kappa ** (m - d_size)
                    for i, j in zip(d_set, z_idx):
                        w *= gauss(zs[j], ms[i], ps[i])
                    total += w
                    for i in range(nt):
                        if not exist[i]:
                            continue
                        r_mass[i] += w
                        if i in d_set:
                            j = z_idx[d_set.index(i)]
                            mu, cu = kf_update(ms[i], ps[i], zs[j])
                            mix[i].append((w, mu, cu))
                        else:
                            mix[i].append((w, ms[i], ps[i]))
    out = []
    for i in range(nt):
        ri = r_mass[i] / total
        ws = np.array([w for w, _, _ in mix[i]])
        ws = ws / ws.sum() if ws.sum() > 0 else ws
        mean = sum(w * mu for w, (_, mu, _) in zip(ws, mix[i]))
        cov = sum(w * (cu + np.outer(mu - mean, mu - mean))
                  for w, (_, mu, cu) in zip(ws, mix[i]))
        out.append((ri, mean, cov))
    return out


def _update_only_model(nt, m_max, pd, kappa, assoc="exact", gate=1e12):
    """Model whose predict is the identity (F=I, Q=0, ps=1, no birth)
    so step == pure update — for single-frame Bayes pins."""
    f = jnp.eye(4)
    q = jnp.zeros((4, 4))
    h = jnp.asarray(np.kron(np.eye(2), np.array([[1.0, 0.0]])))
    r = 0.04 * jnp.eye(2)
    br = jnp.zeros((1,))
    bm = jnp.zeros((1, 4))
    bp = jnp.eye(4)[None]
    model, state = lmb.new(f, None, h, gn.noiseless(q, r), br, bm, bp,
                           m_max=m_max, p_survival=1.0, p_detect=pd,
                           clutter=kappa, gate=gate, t_max=nt,
                           r_prune=0.0, assoc=assoc)
    return model, state, h, r


def test_exact_update_matches_bruteforce_bayes():
    rng = np.random.default_rng(0)
    rs = [0.7, 0.4, 0.9]
    ms = [np.array([0.0, 0.1, 0.0, -0.1]),
          np.array([3.0, -0.1, 2.0, 0.2]),
          np.array([-2.5, 0.0, 4.0, 0.0])]
    ps = [np.diag([0.5, 0.1, 0.5, 0.1]),
          np.diag([1.0, 0.2, 1.0, 0.2]),
          np.diag([0.3, 0.1, 0.3, 0.1])]
    zs = [np.array([0.1, -0.1]), np.array([2.8, 2.2]),
          np.array([10.0, -10.0])]  # last one is clutter-like
    pd, kappa = 0.85, 0.01
    model, state, h, r_cov = _update_only_model(3, 3, pd, kappa)
    state = state._replace(
        r=jnp.asarray(rs), m=jnp.asarray(np.stack(ms)),
        p=jnp.asarray(np.stack(ps)),
        labels=jnp.asarray([[0, 0], [0, 1], [0, 2]], jnp.int32))
    st, est = lmb.step(model, state, jnp.asarray(np.stack(zs)),
                       jnp.ones(3, bool))
    want = _bruteforce_labeled_bayes(rs, ms, ps, h, r_cov, zs, pd,
                                     kappa)
    # match outputs by label (est is sorted by existence)
    lab = np.asarray(est.labels)
    for i in range(3):
        row = int(np.where((lab == [0, i]).all(axis=1))[0][0])
        ri, mean, cov = want[i]
        np.testing.assert_allclose(float(est.existence[row]), ri,
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(est.states[row]), mean,
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(est.covariances[row]),
                                   cov, atol=1e-9)


def test_exact_update_with_empty_slot_and_padding():
    """An empty slot (r=0) and a masked measurement must not perturb
    the live tracks' posteriors."""
    rs = [0.6, 0.5]
    ms = [np.array([0.0, 0.0, 0.0, 0.0]), np.array([4.0, 0.0, 4.0, 0.0])]
    ps = [np.diag([0.5, 0.1, 0.5, 0.1])] * 2
    zs = [np.array([0.2, -0.1]), np.array([4.1, 3.9])]
    pd, kappa = 0.9, 0.02
    model, state, h, r_cov = _update_only_model(3, 3, pd, kappa)
    state = state._replace(
        r=jnp.asarray(rs + [0.0]),
        m=jnp.asarray(np.stack(ms + [np.zeros(4)])),
        p=jnp.asarray(np.stack(ps + [np.eye(4)])),
        labels=jnp.asarray([[0, 0], [0, 1], [-1, -1]], jnp.int32))
    cands = jnp.asarray(np.stack(zs + [np.full(2, 777.0)]))
    masks = jnp.asarray([True, True, False])
    _, est = lmb.step(model, state, cands, masks)
    want = _bruteforce_labeled_bayes(rs, ms, ps, h, r_cov, zs, pd,
                                     kappa)
    lab = np.asarray(est.labels)
    for i in range(2):
        row = int(np.where((lab == [0, i]).all(axis=1))[0][0])
        ri, mean, cov = want[i]
        np.testing.assert_allclose(float(est.existence[row]), ri,
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(est.states[row]), mean,
                                   atol=1e-9)


def test_bp_marginals_close_to_exact():
    """Loopy 3x3 scene: BP betas/existence within 0.05 of exact (the
    pmb-established BP quality bound)."""
    rs = [0.8, 0.7, 0.6]
    ms = [np.array([0.0, 0.0, 0.0, 0.0]),
          np.array([1.0, 0.0, 1.0, 0.0]),
          np.array([2.0, 0.0, 2.0, 0.0])]
    ps = [np.diag([1.0, 0.1, 1.0, 0.1])] * 3
    zs = [np.array([0.4, 0.5]), np.array([1.4, 1.5]),
          np.array([0.9, 0.8])]
    pd, kappa = 0.9, 0.05
    me, se, _, _ = _update_only_model(3, 3, pd, kappa, assoc="exact")
    mb, sb, _, _ = _update_only_model(3, 3, pd, kappa, assoc="bp")
    init = dict(r=jnp.asarray(rs), m=jnp.asarray(np.stack(ms)),
                p=jnp.asarray(np.stack(ps)),
                labels=jnp.asarray([[0, 0], [0, 1], [0, 2]], jnp.int32))
    cands = jnp.asarray(np.stack(zs))
    _, ee = lmb.step(me, se._replace(**init), cands, jnp.ones(3, bool))
    _, eb = lmb.step(mb, sb._replace(**init), cands, jnp.ones(3, bool))
    # align by labels
    le, lb = np.asarray(ee.labels), np.asarray(eb.labels)
    for i in range(3):
        re_ = int(np.where((le == [0, i]).all(axis=1))[0][0])
        rb_ = int(np.where((lb == [0, i]).all(axis=1))[0][0])
        assert abs(float(ee.existence[re_]) - float(eb.existence[rb_])) \
            < 0.05
        np.testing.assert_allclose(np.asarray(eb.assoc[rb_]),
                                   np.asarray(ee.assoc[re_]), atol=0.05)


def _single_target_frames(T=40, seed=3):
    f, q, h, r = _cv_system()
    fn, hn = np.asarray(f), np.asarray(h)
    rng = np.random.default_rng(seed)
    x = np.array([-5.0, 0.1, -5.0, 0.1])
    frames, meas, truth = [], [], []
    for _ in range(T):
        x = fn @ x + rng.multivariate_normal(np.zeros(4), np.asarray(q))
        truth.append(x.copy())
        z = hn @ x + 0.2 * rng.standard_normal(2)
        meas.append(z)
        pad = np.full((4, 2), 1e6)
        pad[0] = z
        frames.append(pad)
    masks = np.zeros((T, 4), bool)
    masks[:, 0] = True
    return (f, q, h, r, jnp.asarray(np.stack(frames)),
            jnp.asarray(masks), np.stack(meas), np.stack(truth))


def test_single_target_pd1_matches_kf():
    """PD=1, one candidate: the dominant track's mean/cov must equal a
    KF hand-seeded with the birth prior (births are NOT predicted in
    their birth frame), and existence must converge to 1."""
    f, q, h, r, frames, masks, meas, _ = _single_target_frames()
    br = jnp.asarray([0.05])
    bm = jnp.asarray([[-5.0, 0.1, -5.0, 0.1]])
    bp = jnp.broadcast_to(jnp.diag(jnp.asarray([4.0, 0.25, 4.0, 0.25])),
                          (1, 4, 4))
    model, state = lmb.new(f, None, h, gn.noiseless(q, r), br, bm, bp,
                           m_max=4, p_survival=1.0, p_detect=1.0,
                           clutter=1e-6, gate=1e12, t_max=3,
                           r_prune=1e-6)
    _, est = lmb.run(model, state, frames, masks)

    # comparison KF: prior = birth prior, update on frame 0 WITHOUT a
    # predict (lmb birth convention), then the normal cycle
    km, ks = vanilla.new(bm[0], bp[0], f, None, h,
                         gn.noiseless(q, r))
    xs, ps_ = [], []
    x_cur, p_cur = bm[0], bp[0]
    for t in range(frames.shape[0]):
        if t > 0:
            x_cur = km.f @ x_cur
            p_cur = km.f @ p_cur @ km.f.T + q
        s = h @ p_cur @ h.T + r
        k = p_cur @ h.T @ jnp.linalg.inv(s)
        x_cur = x_cur + k @ (jnp.asarray(meas[t]) - h @ x_cur)
        ikh = jnp.eye(4) - k @ h
        p_cur = ikh @ p_cur @ ikh.T + k @ r @ k.T
        xs.append(x_cur)
        ps_.append(p_cur)
    np.testing.assert_allclose(np.asarray(est.states[:, 0]),
                               np.asarray(jnp.stack(xs)), atol=1e-7)
    np.testing.assert_allclose(np.asarray(est.covariances[:, 0]),
                               np.asarray(jnp.stack(ps_)), atol=1e-7)
    assert float(est.existence[-1, 0]) > 0.999
    # label is (birth frame 0, slot 0) for life
    assert np.all(np.asarray(est.labels[5:, 0]) == [0, 0])


def _two_target_scenario(seed=0, T=70, n_clutter=3):
    f, q, h, r = _cv_system()
    fn, hn = np.asarray(f), np.asarray(h)
    rng = np.random.default_rng(seed)
    a = np.array([-5.0, 0.12, -5.0, 0.10])
    b = np.array([5.0, -0.10, 5.0, -0.08])
    frames, ta, tb = [], [], []
    m_max = n_clutter + 2
    for _ in range(T):
        a, b = fn @ a, fn @ b
        ta.append(a.copy())
        tb.append(b.copy())
        dets = [hn @ a + 0.2 * rng.standard_normal(2),
                hn @ b + 0.2 * rng.standard_normal(2)]
        while len(dets) < m_max:
            dets.append(rng.uniform(-50, 50, 2))
        rng.shuffle(dets)
        frames.append(np.stack(dets))
    return (f, q, h, r, jnp.asarray(np.stack(frames)),
            jnp.ones((T, m_max), bool), np.stack(ta), np.stack(tb))


def test_labels_survive_crossing():
    """Two targets converge, cross near mid-arc, separate: the two
    dominant tracks keep their birth labels for the whole run."""
    f, q, h, r, frames, masks, ta, tb = _two_target_scenario()
    br, bm, bp = _birth()
    model, state = lmb.new(f, None, h, gn.noiseless(q, r), br, bm, bp,
                           m_max=frames.shape[1], p_survival=0.99,
                           p_detect=0.95, clutter=3 / 10000.0,
                           t_max=6, assoc="bp")
    _, est = lmb.run(model, state, frames, masks)
    assert float(est.n_targets[-1]) == pytest.approx(2.0, abs=0.4)
    # after acquisition both labels are the frame-0 births, all frames
    labs = np.asarray(est.labels[10:, :2, :])
    assert set(map(tuple, labs.reshape(-1, 2))) == {(0, 0), (0, 1)}
    # tail: tracks localize the truths (set RMS, identity-free)
    est_pos = np.asarray(est.states[-1, :2, ::2])
    tru = np.stack([ta[-1][::2], tb[-1][::2]])
    d = np.linalg.norm(est_pos[None] - tru[:, None], axis=2)
    assert d.min(axis=1).max() < 0.6


def test_matches_pmb_on_separated_targets():
    """Well-separated targets, no clutter: LMB and PMB confirmed
    tracks agree (the Bernoulli update math is shared; birth models
    differ so the pin is on the converged tracks)."""
    f, q, h, r, frames, masks, ta, tb = _two_target_scenario(
        seed=5, n_clutter=0)
    br, bm, bp = _birth()
    ml, sl = lmb.new(f, None, h, gn.noiseless(q, r), br, bm, bp,
                     m_max=2, p_survival=0.99, p_detect=0.95,
                     clutter=1e-4, t_max=4, assoc="exact")
    _, el = lmb.run(ml, sl, frames, masks)
    mp, sp = pmb.new(f, None, h, gn.noiseless(q, r),
                     jnp.asarray([0.03, 0.03]), bm, bp,
                     p_survival=0.99, p_detect=0.95, clutter=1e-4,
                     j_max=4, t_max=4)
    _, ep = pmb.run(mp, sp, frames, masks)
    assert int(el.n_confirmed[-1]) == 2 == int(ep.n_confirmed[-1])
    # match track sets at the final frame (order-free)
    pl = np.sort(np.asarray(el.states[-1, :2, 0]))
    pp = np.sort(np.asarray(ep.states[-1, :2, 0]))
    np.testing.assert_allclose(pl, pp, atol=1e-2)


def test_pure_clutter_stays_empty():
    f, q, h, r = _cv_system()
    br, bm, bp = _birth()
    rng = np.random.default_rng(7)
    T = 60
    frames = jnp.asarray(rng.uniform(-50, 50, (T, 5, 2)))
    masks = jnp.ones((T, 5), bool)
    model, state = lmb.new(f, None, h, gn.noiseless(q, r), br, bm, bp,
                           m_max=5, p_survival=0.99, p_detect=0.95,
                           clutter=5 / 10000.0, t_max=6, assoc="bp")
    _, est = lmb.run(model, state, frames, masks)
    assert float(jnp.mean(est.n_targets)) < 0.3
    # a lucky clutter point in a birth gate can confirm for a frame
    # (the phd test's <= 1 allowance); it must not persist
    assert int(jnp.max(est.n_confirmed)) <= 1
    assert float(jnp.mean(est.n_confirmed)) < 0.1


def test_adaptive_birth_acquires_unknown_location():
    """A target far from every fixed birth site is acquired only with
    measurement-driven birth (the phd/cphd adaptive-birth pin)."""
    f, q, h, r = _cv_system()
    fn, hn = np.asarray(f), np.asarray(h)
    rng = np.random.default_rng(11)
    x = np.array([30.0, 0.05, -30.0, 0.05])  # nowhere near _birth()
    T = 40
    frames = []
    for _ in range(T):
        x = fn @ x
        pad = np.full((3, 2), 1e6)
        pad[0] = hn @ x + 0.2 * rng.standard_normal(2)
        frames.append(pad)
    frames = jnp.asarray(np.stack(frames))
    masks = jnp.zeros((T, 3), bool).at[:, 0].set(True)
    br, bm, bp = _birth()
    fixed, sf = lmb.new(f, None, h, gn.noiseless(q, r), br, bm, bp,
                        m_max=3, p_detect=0.95, clutter=1e-4, t_max=6,
                        assoc="bp")
    adapt, sa = lmb.new(f, None, h, gn.noiseless(q, r), br, bm, bp,
                        m_max=3, p_detect=0.95, clutter=1e-4, t_max=6,
                        assoc="bp", adaptive_birth_r=0.05)
    _, ef = lmb.run(fixed, sf, frames, masks)
    _, ea = lmb.run(adapt, sa, frames, masks)
    assert float(ef.n_targets[-1]) < 0.2  # fixed birth never acquires
    assert float(ea.n_targets[-1]) > 0.8
    # adaptive labels carry the birth measurement slot (>= Jb)
    assert int(ea.labels[-1, 0, 1]) >= 2


def test_cardinality_pmf_exact():
    r = jnp.asarray([0.9, 0.5, 0.2])
    pmf = np.asarray(lmb.cardinality_pmf(r))
    # brute force over the 8 outcomes
    want = np.zeros(4)
    for bits in itertools.product([0, 1], repeat=3):
        w = np.prod([r_ if b else 1 - r_
                     for r_, b in zip([0.9, 0.5, 0.2], bits)])
        want[sum(bits)] += w
    np.testing.assert_allclose(pmf, want, atol=1e-12)
    # mass == mean identity
    assert float(np.dot(np.arange(4), pmf)) == pytest.approx(1.6,
                                                             abs=1e-12)


def test_padded_slot_poison():
    """NaN/inf in masked candidate slots must be bit-identical to zero
    padding (the tracking-tier fuzz rule)."""
    f, q, h, r, frames, masks, *_ = _two_target_scenario(seed=9, T=20)
    masks = np.array(masks)  # np.asarray of a jax array is read-only
    masks[:, -1] = False
    masks = jnp.asarray(masks)
    poisoned = np.asarray(frames).copy()
    poisoned[:, -1, :] = np.nan
    poisoned[::2, -1, 0] = np.inf
    br, bm, bp = _birth()
    for mode in ("exact", "bp"):
        t_max = 4 if mode == "exact" else 6
        model, state = lmb.new(f, None, h, gn.noiseless(q, r), br, bm,
                               bp, m_max=frames.shape[1],
                               p_detect=0.95, clutter=3 / 10000.0,
                               t_max=t_max, assoc=mode)
        _, e0 = lmb.run(model, state, frames, masks)
        _, e1 = lmb.run(model, state, jnp.asarray(poisoned), masks)
        for a, b in zip(jax.tree.leaves(e0), jax.tree.leaves(e1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_constructor_validation():
    f, q, h, r = _cv_system()
    br, bm, bp = _birth()
    nz = gn.noiseless(q, r)
    with pytest.raises(ValueError):
        lmb.new(f, None, h, nz, br, bm[0], bp, m_max=4)
    with pytest.raises(ValueError):
        lmb.new(f, None, h, nz, br[:1], bm, bp, m_max=4)
    with pytest.raises(ValueError):
        lmb.new(f, None, h, nz, br, bm, bp, m_max=4, t_max=1)
    with pytest.raises(ValueError):
        lmb.new(f, None, h, nz, br, bm, bp, m_max=4, assoc="murty")
    with pytest.raises(ValueError):
        lmb.new(f, None, h, nz, br, bm, bp, m_max=12, t_max=12)
