"""JPDA pins: event-table combinatorics, hand-enumerated joint
posterior, PDAF reduction, factorization for disjoint gates, and the
coalescence win over independent PDAFs on crossing targets."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import jpda, pdaf, vanilla


def _cv_system(dt=1.0, q_scale=1e-3, r_scale=0.04):
    # 4-state constant velocity in 2D, position measurements
    f = jnp.asarray(np.kron(np.eye(2), np.array([[1.0, dt], [0.0, 1.0]])))
    qb = np.array([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]]) * q_scale
    q = jnp.asarray(np.kron(np.eye(2), qb))
    h = jnp.asarray(np.kron(np.eye(2), np.array([[1.0, 0.0]])))
    r = r_scale * jnp.eye(2)
    return f, q, h, r


def test_event_table_counts_and_exclusivity():
    for n_t, m in ((1, 3), (2, 4), (3, 6)):
        ev = jpda._enumerate_events(n_t, m)
        expected = sum(math.comb(n_t, k) * math.perm(m, k)
                       for k in range(min(n_t, m) + 1))
        assert ev.shape == (expected, n_t)
        for row in ev:
            nz = row[row > 0]
            assert len(set(nz.tolist())) == len(nz)  # distinct candidates


def test_single_target_equals_pdaf():
    f, q, h, r = _cv_system()
    nz = gn.noiseless(q, r)
    x0 = jnp.array([0.0, 0.1, 0.0, -0.05])
    p0 = jnp.eye(4) * 0.5
    jm, js = jpda.new(x0[None], p0[None], f, None, h, nz, m_max=4,
                      pd=0.85, clutter_density=0.1, gate=16.0)
    pm, ps = pdaf.new(x0, p0, f, None, h, nz, pd=0.85,
                      clutter_density=0.1, gate=16.0)
    rng = np.random.default_rng(0)
    T = 30
    cands = jnp.asarray(rng.uniform(-2, 2, size=(T, 4, 2)))
    masks = jnp.asarray(rng.random((T, 4)) < 0.8)
    _, ej = jpda.run(jm, js, cands, masks)
    _, ep = pdaf.run(pm, ps, cands, masks)
    np.testing.assert_allclose(np.asarray(ej.states[:, 0]),
                               np.asarray(ep.state), atol=1e-9)
    np.testing.assert_allclose(np.asarray(ej.covariances[:, 0]),
                               np.asarray(ep.covariance), atol=1e-9)
    np.testing.assert_allclose(np.asarray(ej.betas[:, 0, 0]),
                               np.asarray(ep.beta0), atol=1e-9)
    np.testing.assert_allclose(np.asarray(ej.betas[:, 0, 1:]),
                               np.asarray(ep.betas), atol=1e-9)


def test_disjoint_gates_factorize_to_independent_pdafs():
    """Targets 100 units apart with gate 16: no candidate falls in two
    gates, the joint posterior factorizes, JPDA == per-target PDAF."""
    f, q, h, r = _cv_system()
    nz = gn.noiseless(q, r)
    x0s = jnp.asarray([[0.0, 0.1, 0.0, -0.05], [100.0, -0.1, 100.0, 0.02]])
    p0 = jnp.eye(4) * 0.5
    jm, js = jpda.new(x0s, p0, f, None, h, nz, m_max=6,
                      pd=0.9, clutter_density=0.05)
    rng = np.random.default_rng(1)
    T = 25
    # 3 candidates near each target
    c1 = x0s[0, ::2][None, None, :] + rng.normal(0, 0.3, (T, 3, 2))
    c2 = x0s[1, ::2][None, None, :] + rng.normal(0, 0.3, (T, 3, 2))
    cands = jnp.asarray(np.concatenate([c1, c2], axis=1))
    masks = jnp.ones((T, 6), bool)
    _, ej = jpda.run(jm, js, cands, masks)
    for t in range(2):
        pm, ps = pdaf.new(x0s[t], p0, f, None, h, nz, pd=0.9,
                          clutter_density=0.05)
        _, ep = pdaf.run(pm, ps, cands, masks)
        np.testing.assert_allclose(np.asarray(ej.states[:, t]),
                                   np.asarray(ep.state), atol=1e-7)
        np.testing.assert_allclose(np.asarray(ej.covariances[:, t]),
                                   np.asarray(ep.covariance), atol=1e-7)


def test_joint_betas_match_hand_enumeration():
    """2 targets, 2 candidates: enumerate the 7 joint events in numpy
    from the same likelihood grid and compare marginals digit-level."""
    f, q, h, r = _cv_system()
    nz = gn.noiseless(q, r)
    x0s = jnp.asarray([[0.0, 0.0, 0.0, 0.0], [1.0, 0.0, 1.0, 0.0]])
    p0 = jnp.eye(4) * 0.3
    pd, lam = 0.8, 0.2
    jm, js = jpda.new(x0s, p0, f, None, h, nz, m_max=2, pd=pd,
                      clutter_density=lam, gate=1e9)
    cands = jnp.asarray([[0.2, 0.1], [0.9, 1.1]])
    mask = jnp.ones(2, bool)
    _, est = jpda.step(jm, js, cands, mask)

    # numpy replica
    fn, hn, qn, rn = (np.asarray(a, np.float64) for a in (f, h, q, r))
    li = np.zeros((2, 2))
    for t in range(2):
        xp = fn @ np.asarray(x0s[t], np.float64)
        pp = fn @ (0.3 * np.eye(4)) @ fn.T + qn
        s = hn @ pp @ hn.T + rn
        for i in range(2):
            nu = np.asarray(cands[i], np.float64) - hn @ xp
            d2 = nu @ np.linalg.solve(s, nu)
            norm = 1.0 / np.sqrt((2 * np.pi) ** 2 * np.linalg.det(s))
            li[t, i] = pd * norm * np.exp(-0.5 * d2) / lam
    events = [(0, 0), (1, 0), (2, 0), (0, 1), (0, 2), (1, 2), (2, 1)]
    w = {}
    for a in events:
        val = 1.0
        for t, i in enumerate(a):
            val *= (1 - pd) if i == 0 else li[t, i - 1]
        w[a] = val
    z = sum(w.values())
    betas = np.zeros((2, 3))
    for a, val in w.items():
        for t, i in enumerate(a):
            betas[t, i] += val / z
    np.testing.assert_allclose(np.asarray(est.betas), betas, atol=1e-9)


def test_crossing_targets_jpda_resists_coalescence():
    """Two targets cross; a shared detection in both gates drags
    independent PDAFs toward each other (double-counted evidence).
    JPDA's exclusivity keeps the tracks apart: lower total RMS and a
    larger final separation, averaged over clutter draws."""
    f, q, h, r = _cv_system(q_scale=2e-4, r_scale=0.02)
    nz = gn.noiseless(q, r)
    T = 40
    fn, hn = np.asarray(f, np.float64), np.asarray(h, np.float64)
    rms_j, rms_p, sep_j, sep_p = [], [], [], []
    for seed in range(6):
        rng = np.random.default_rng(10 + seed)
        # truths cross at t=20
        t1 = np.array([-2.0, 0.1, 0.0, 0.0])
        t2 = np.array([2.0, -0.1, 0.4, 0.0])
        xs1, xs2, frames, masks = [], [], [], []
        for k in range(T):
            t1 = fn @ t1
            t2 = fn @ t2
            xs1.append(t1.copy())
            xs2.append(t2.copy())
            dets = []
            for tr in (t1, t2):
                if rng.random() < 0.95:
                    dets.append(hn @ tr + 0.1414 * rng.standard_normal(2))
            while len(dets) < 5:
                dets.append(rng.uniform(-4, 4, 2))
            frames.append(np.stack(dets[:5]))
            masks.append([True] * 5)
        frames = jnp.asarray(np.stack(frames))
        masks = jnp.asarray(np.array(masks))
        xs1, xs2 = np.stack(xs1), np.stack(xs2)

        x0s = jnp.asarray(np.stack([xs1[0], xs2[0]])
                          + 0.05 * rng.standard_normal((2, 4)))
        p0 = jnp.eye(4) * 0.1
        jm, js = jpda.new(x0s, p0, f, None, h, nz, m_max=5, pd=0.95,
                          clutter_density=5 / 64.0, gate=16.0)
        _, ej = jpda.run(jm, js, frames, masks)
        est_j = np.asarray(ej.states)

        est_p = np.zeros((T, 2, 4))
        for t in range(2):
            pm, ps = pdaf.new(x0s[t], p0, f, None, h, nz, pd=0.95,
                              clutter_density=5 / 64.0, gate=16.0)
            _, ep = pdaf.run(pm, ps, frames, masks)
            est_p[:, t] = np.asarray(ep.state)

        truth = np.stack([xs1, xs2], axis=1)
        for est, rms_acc, sep_acc in ((est_j, rms_j, sep_j),
                                      (est_p, rms_p, sep_p)):
            err = est - truth
            rms_acc.append(np.sqrt((err[:, :, ::2] ** 2).mean()))
            sep_acc.append(np.linalg.norm(est[-1, 0, ::2] - est[-1, 1, ::2]))
    assert np.mean(rms_j) < np.mean(rms_p), (np.mean(rms_j), np.mean(rms_p))


def test_all_masked_frame_is_pure_prediction():
    f, q, h, r = _cv_system()
    nz = gn.noiseless(q, r)
    x0s = jnp.asarray([[0.0, 0.1, 0.0, -0.05], [3.0, -0.1, 3.0, 0.02]])
    p0 = jnp.eye(4) * 0.5
    jm, js = jpda.new(x0s, p0, f, None, h, nz, m_max=3)
    cands = jnp.zeros((3, 2))
    st, est = jpda.step(jm, js, cands, jnp.zeros(3, bool))
    for t in range(2):
        xp, pp = vanilla.predict(
            jm.kf, vanilla.State(x0s[t], p0, jnp.int32(0)))
        np.testing.assert_allclose(np.asarray(st.xs[t]), np.asarray(xp),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(st.ps[t]), np.asarray(pp),
                                   atol=1e-12)
    np.testing.assert_allclose(np.asarray(est.betas[:, 0]), 1.0, atol=1e-12)


def test_event_budget_guard():
    f, q, h, r = _cv_system()
    nz = gn.noiseless(q, r)
    x0s = jnp.zeros((8, 4))
    import pytest
    with pytest.raises(ValueError):
        jpda.new(x0s, jnp.eye(4), f, None, h, nz, m_max=12)
