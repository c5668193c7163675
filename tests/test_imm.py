"""IMM estimator: degenerate single-mode equivalence with the vanilla
CKF, mode identification on a maneuvering target, masked steps, and
probability bookkeeping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gokalman_tpu as gk
from gokalman_tpu.filters import imm, vanilla


def _cv_model(q_scale):
    """2-state constant-velocity tracker with tunable process noise."""
    dt = 0.5
    f = jnp.array([[1.0, dt], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    q = q_scale * jnp.array([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]])
    r = jnp.array([[0.09]])
    model, _ = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h,
                           gk.noise.noiseless(q, r))
    return model


def test_identical_modes_reduce_to_single_kf():
    """With M identical modes the IMM is exactly the single-model CKF:
    mixing is a no-op and the combination has zero mode spread."""
    model = _cv_model(0.01)
    x0 = jnp.array([0.1, -0.3])
    p0 = 2.0 * jnp.eye(2)
    rng = np.random.default_rng(0)
    ys = jnp.asarray(rng.standard_normal((20, 1)))

    _, st = vanilla.new(x0, p0, model.f, None, model.h, model.noise)
    _, kf_est = vanilla.run(model, st, measurements=ys)

    im, ist = imm.new(x0, p0, [model, model],
                      trans=jnp.array([[0.9, 0.1], [0.1, 0.9]]))
    _, est = imm.run(im, ist, ys)

    np.testing.assert_allclose(est.state, kf_est.state, atol=1e-9)
    np.testing.assert_allclose(est.covariance, kf_est.covariance, atol=1e-9)
    np.testing.assert_allclose(est.mode_probs, 0.5, atol=1e-9)
    np.testing.assert_allclose(
        jnp.sum(est.mode_probs, axis=1), 1.0, atol=1e-12
    )


def test_imm_identifies_maneuver():
    """CV(quiet) vs CV(agile) bank on a target that starts ballistic
    and then maneuvers: the agile mode's probability must take over
    after the maneuver onset, and the IMM must beat the quiet-only KF."""
    quiet = _cv_model(1e-4)
    agile = _cv_model(1.0)
    dt = 0.5
    rng = np.random.default_rng(3)

    # Truth: constant velocity for 30 steps, then a hard weave.
    xs = [np.array([0.0, 0.4])]
    for k in range(60):
        f = np.asarray(quiet.f)
        x = f @ xs[-1]
        if k >= 30:
            x[1] += 0.8 * np.sin(0.6 * k)  # velocity jinks
        xs.append(x)
    truth = np.stack(xs[1:])
    ys = jnp.asarray(truth[:, :1] + 0.3 * rng.standard_normal((60, 1)))

    trans = jnp.array([[0.97, 0.03], [0.03, 0.97]])
    im, ist = imm.new(jnp.array([0.0, 0.4]), jnp.eye(2), [quiet, agile], trans)
    _, est = imm.run(im, ist, ys)

    mu = np.asarray(est.mode_probs)
    assert mu[5:28, 0].mean() > 0.6, mu[5:28, 0].mean()  # quiet wins early
    assert mu[40:, 1].mean() > 0.8, mu[40:, 1].mean()  # agile wins late

    _, qst = vanilla.new(jnp.array([0.0, 0.4]), jnp.eye(2), quiet.f, None,
                         quiet.h, quiet.noise)
    _, kf_q = vanilla.run(quiet, qst, measurements=ys)
    imm_rms = float(np.sqrt(np.mean((np.asarray(est.state)[35:, 0]
                                     - truth[35:, 0]) ** 2)))
    kf_rms = float(np.sqrt(np.mean((np.asarray(kf_q.state)[35:, 0]
                                    - truth[35:, 0]) ** 2)))
    assert imm_rms < 0.7 * kf_rms, (imm_rms, kf_rms)


def test_masked_step_markov_mixes_only():
    quiet = _cv_model(1e-4)
    agile = _cv_model(1.0)
    trans = jnp.array([[0.8, 0.2], [0.4, 0.6]])
    im, ist = imm.new(jnp.zeros(2), jnp.eye(2), [quiet, agile], trans,
                      mu0=jnp.array([1.0, 0.0]))
    st, est = imm.step(im, ist, jnp.array([0.5]), has=jnp.array(False))
    # Mode probabilities evolved by the chain alone: mu' = mu @ trans.
    np.testing.assert_allclose(est.mode_probs, jnp.array([0.8, 0.2]),
                               atol=1e-12)
    np.testing.assert_allclose(est.innovation, 0.0, atol=0)
    np.testing.assert_allclose(float(est.log_likelihood), 0.0, atol=0)
    # Per-mode states are pure predictions from the mixed priors.
    np.testing.assert_allclose(st.xs[0], quiet.f @ jnp.zeros(2), atol=1e-12)


def test_imm_log_likelihood_sums_to_kf_for_single_mode():
    model = _cv_model(0.01)
    rng = np.random.default_rng(1)
    ys = jnp.asarray(rng.standard_normal((15, 1)))
    x0, p0 = jnp.zeros(2), jnp.eye(2)
    _, st = vanilla.new(x0, p0, model.f, None, model.h, model.noise)
    _, kf_est = vanilla.run(model, st, measurements=ys)
    kf_ll = float(vanilla.innovations_log_likelihood(model, kf_est))
    im, ist = imm.new(x0, p0, [model, model], jnp.eye(2))
    _, est = imm.run(im, ist, ys)
    np.testing.assert_allclose(float(jnp.sum(est.log_likelihood)), kf_ll,
                               rtol=1e-9)


def test_ctor_errors():
    model = _cv_model(0.01)
    with pytest.raises(ValueError):
        imm.new(jnp.zeros(2), jnp.eye(2), [model, model],
                trans=jnp.array([[0.9, 0.2], [0.1, 0.9]]))  # rows != 1
    with pytest.raises(ValueError):
        imm.new(jnp.zeros(2), jnp.eye(2), [model],
                trans=jnp.array([[0.9, 0.1], [0.1, 0.9]]))  # M mismatch


def test_imm_ukf_single_mode_equals_ukf():
    """UKF-mode IMM with identical modes == the single UKF exactly."""
    from gokalman_tpu.filters import ukf

    dt = 0.1

    def fx(x):
        return jnp.array([x[0] + dt * x[1], x[1] - dt * 0.2 * x[1] ** 3])

    def hx(x):
        return jnp.array([jnp.sqrt(1.0 + x[0] ** 2)])

    q = 1e-4 * jnp.eye(2)
    r = jnp.array([[1e-3]])
    noise = gk.noise.noiseless(q, r)
    rng = np.random.default_rng(0)
    ys = jnp.asarray(1.1 + 0.05 * rng.standard_normal((20, 1)))

    um, ust = ukf.new(jnp.array([0.8, 0.1]), jnp.eye(2), noise)
    _, uref = ukf.run(um, ust, ys, fx, hx)

    im, ist = imm.new_ukf(jnp.array([0.8, 0.1]), jnp.eye(2), [um, um],
                          jnp.array([[0.9, 0.1], [0.1, 0.9]]))
    _, est = imm.run_ukf(im, ist, ys, fx, hx)
    np.testing.assert_allclose(est.state, uref.state, atol=1e-9)
    np.testing.assert_allclose(est.covariance, uref.covariance, atol=1e-9)
    np.testing.assert_allclose(est.mode_probs, 0.5, atol=1e-9)


def test_imm_ukf_identifies_noise_regime_on_nonlinear_track():
    """Quiet/agile UKF bank on a nonlinear range-tracked target whose
    velocity starts jinking mid-arc: the agile mode takes over."""
    from gokalman_tpu.filters import ukf

    dt = 0.25

    def fx(x):
        return jnp.array([x[0] + dt * x[1], x[1]])

    def hx(x):
        return jnp.array([jnp.sqrt(1.0 + x[0] ** 2)])

    r = jnp.array([[1e-4]])
    quiet, _ = ukf.new(jnp.zeros(2), jnp.eye(2),
                       gk.noise.noiseless(jnp.diag(jnp.array([1e-6, 1e-6])), r))
    agile, _ = ukf.new(jnp.zeros(2), jnp.eye(2),
                       gk.noise.noiseless(jnp.diag(jnp.array([1e-6, 0.25])), r))

    rng = np.random.default_rng(5)
    x = np.array([0.5, 0.4])
    truth = []
    for k in range(60):
        x = np.array([x[0] + dt * x[1], x[1]])
        if k >= 30:
            x[1] += 0.8 * np.sin(0.7 * k)
        truth.append(x.copy())
    truth = np.asarray(truth)
    ys = jnp.asarray(np.sqrt(1.0 + truth[:, :1] ** 2)
                     + 0.01 * rng.standard_normal((60, 1)))

    im, ist = imm.new_ukf(jnp.array([0.5, 0.4]), 0.1 * jnp.eye(2),
                          [quiet, agile],
                          jnp.array([[0.97, 0.03], [0.03, 0.97]]))
    _, est = imm.run_ukf(im, ist, ys, fx, hx)
    mu = np.asarray(est.mode_probs)
    assert mu[10:28, 0].mean() > 0.6, mu[10:28, 0].mean()
    assert mu[42:, 1].mean() > 0.8, mu[42:, 1].mean()


def test_imm_bank_vmaps_over_targets():
    """Serving posture: a bank of independent IMM trackers is one vmap
    over the measurement streams (pure functions, no state sharing)."""
    quiet = _cv_model(1e-4)
    agile = _cv_model(1.0)
    trans = jnp.array([[0.95, 0.05], [0.05, 0.95]])
    im, ist = imm.new(jnp.zeros(2), jnp.eye(2), [quiet, agile], trans)
    rng = np.random.default_rng(9)
    ys = jnp.asarray(rng.standard_normal((16, 30, 1)))  # 16 targets

    _, bank = jax.vmap(lambda y: imm.run(im, ist, y))(ys)
    assert bank.state.shape == (16, 30, 2)
    assert bank.mode_probs.shape == (16, 30, 2)
    # Each bank entry equals the standalone run.
    _, solo = imm.run(im, ist, ys[3])
    np.testing.assert_allclose(bank.state[3], solo.state, atol=1e-12)


def test_imm_ukf_cubature_matches_linear_imm_on_linear_system():
    """Cross-tier equivalence: a UKF-mode IMM with cubature params on a
    LINEAR system equals the linear-mode IMM exactly (the rule is exact
    for affine maps, so the whole mixing/likelihood cycle matches)."""
    from gokalman_tpu.filters import ukf

    quiet = _cv_model(1e-4)
    agile = _cv_model(1.0)
    trans = jnp.array([[0.95, 0.05], [0.1, 0.9]])
    rng = np.random.default_rng(2)
    ys = jnp.asarray(rng.standard_normal((25, 1)))
    x0, p0 = jnp.array([0.1, 0.2]), jnp.eye(2)

    im_l, ist_l = imm.new(x0, p0, [quiet, agile], trans)
    _, el = imm.run(im_l, ist_l, ys)

    prm = ukf.cubature_params()._asdict()
    uq, _ = ukf.new(x0, p0, quiet.noise, **prm)
    ua, _ = ukf.new(x0, p0, agile.noise, **prm)
    im_u, ist_u = imm.new_ukf(x0, p0, [uq, ua], trans)
    fx = lambda x: quiet.f @ x
    hx = lambda x: quiet.h @ x
    _, eu = imm.run_ukf(im_u, ist_u, ys, fx, hx)

    np.testing.assert_allclose(eu.state, el.state, atol=1e-9)
    np.testing.assert_allclose(eu.covariance, el.covariance, atol=1e-9)
    np.testing.assert_allclose(eu.mode_probs, el.mode_probs, atol=1e-9)
    np.testing.assert_allclose(eu.log_likelihood, el.log_likelihood,
                               atol=1e-9)


def test_imm_smoother_identical_modes_equals_rts():
    """With identical modes the Kim smoother collapses exactly to the
    single-model RTS smoother."""
    from gokalman_tpu.filters import smoothing

    model = _cv_model(0.01)
    x0 = jnp.array([0.1, -0.3])
    p0 = 2.0 * jnp.eye(2)
    rng = np.random.default_rng(10)
    T = 40
    ys = jnp.asarray(rng.standard_normal((T, 1)))
    im, ist = imm.new(x0, p0, [model, model],
                      trans=jnp.array([[0.9, 0.1], [0.1, 0.9]]))
    _, est = imm.run(im, ist, ys)
    x_s, p_s, mu_s = imm.rts_smoother(im, est)

    _, st = vanilla.new(x0, p0, model.f, None, model.h, model.noise)
    _, kf_est = vanilla.run(model, st, measurements=ys)
    phis = jnp.broadcast_to(model.f, (T, 2, 2))
    x_r, p_r = smoothing.rts_smoother(phis, model.noise.q, kf_est.state,
                                      kf_est.covariance)
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_r), atol=1e-8)
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_r), atol=1e-8)
    np.testing.assert_allclose(np.asarray(mu_s), 0.5, atol=1e-8)


def test_imm_smoother_beats_filter_on_switching_truth():
    """Markov-switching truth (quiet Q for k<30 and k>=50, agile Q
    between): the Kim smoother must beat the IMM filter on BOTH state
    RMS and mode-classification accuracy, averaged over seeds.
    Measured: RMS 0.211 vs 0.226, accuracy 0.912 vs 0.817.

    NOTE (measured while building): a DETERMINISTIC maneuver (velocity
    sinusoid) is a hostile scenario for any smoother — the quiet mode's
    near-zero Q back-extrapolates the maneuver-fitted trajectory
    through the onset with full trust, poisoning the pre-onset segment.
    Smoothers amplify model error; the test truth must be
    model-consistent."""
    quiet = _cv_model(1e-3)
    agile = _cv_model(1.0)
    lq_q = np.linalg.cholesky(np.asarray(quiet.noise.q)
                              + 1e-15 * np.eye(2))
    lq_a = np.linalg.cholesky(np.asarray(agile.noise.q))
    fn = np.asarray(quiet.f)
    rms_f, rms_s, acc_f, acc_s = [], [], [], []
    for seed in range(6):
        rng = np.random.default_rng(seed)
        T = 80
        x = np.array([0.0, 0.4])
        xs, modes = [], []
        for k in range(T):
            agile_now = 30 <= k < 50
            L = lq_a if agile_now else lq_q
            x = fn @ x + L @ rng.standard_normal(2)
            xs.append(x.copy())
            modes.append(agile_now)
        truth = np.stack(xs)
        ys = jnp.asarray(truth[:, :1] + 0.3 * rng.standard_normal((T, 1)))
        trans = jnp.array([[0.97, 0.03], [0.03, 0.97]])
        im, ist = imm.new(jnp.array([0.0, 0.4]), jnp.eye(2),
                          [quiet, agile], trans)
        _, est = imm.run(im, ist, ys)
        x_s, p_s, mu_s = imm.rts_smoother(im, est)
        ef = np.asarray(est.state) - truth
        es = np.asarray(x_s) - truth
        rms_f.append(np.sqrt((ef[:, 0] ** 2).mean()))
        rms_s.append(np.sqrt((es[:, 0] ** 2).mean()))
        acc_f.append(((np.asarray(est.mode_probs)[:, 1] > 0.5)
                      == np.array(modes)).mean())
        acc_s.append(((np.asarray(mu_s)[:, 1] > 0.5)
                      == np.array(modes)).mean())
    assert np.mean(rms_s) < np.mean(rms_f), (np.mean(rms_s),
                                             np.mean(rms_f))
    assert np.mean(acc_s) > np.mean(acc_f) + 0.05, (np.mean(acc_s),
                                                    np.mean(acc_f))


def test_immpdaf_identical_modes_equals_pdaf():
    from gokalman_tpu.filters import pdaf

    model = _cv_model(0.01)
    x0 = jnp.array([0.1, -0.3])
    p0 = 2.0 * jnp.eye(2)
    rng = np.random.default_rng(0)
    T = 25
    cands = jnp.asarray(rng.uniform(-3, 3, (T, 4, 1)))
    masks = jnp.asarray(rng.random((T, 4)) < 0.8)
    im, ist = imm.new(x0, p0, [model, model],
                      trans=jnp.array([[0.9, 0.1], [0.1, 0.9]]))
    _, ei = imm.run_pdaf(im, ist, cands, masks, pd=0.85,
                         clutter_density=0.3, gate=16.0)
    pm, ps = pdaf.new(x0, p0, model.f, None, model.h, model.noise,
                      pd=0.85, clutter_density=0.3, gate=16.0)
    _, ep = pdaf.run(pm, ps, cands, masks)
    np.testing.assert_allclose(np.asarray(ei.state), np.asarray(ep.state),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(ei.covariance),
                               np.asarray(ep.covariance), atol=1e-9)
    np.testing.assert_allclose(np.asarray(ei.mode_probs), 0.5, atol=1e-9)


def test_immpdaf_single_candidate_high_pd_is_imm():
    """One always-valid candidate, PD ~ 1, tiny clutter, huge gate: the
    association is certain and the IMM-PDAF == the plain IMM run on the
    same measurements (up to the tiny beta_0 residual)."""
    quiet = _cv_model(1e-3)
    agile = _cv_model(1.0)
    x0, p0 = jnp.array([0.0, 0.4]), jnp.eye(2)
    rng = np.random.default_rng(2)
    T = 30
    ys = jnp.asarray(rng.standard_normal((T, 1)))
    trans = jnp.array([[0.95, 0.05], [0.05, 0.95]])
    im, ist = imm.new(x0, p0, [quiet, agile], trans)
    _, e_plain = imm.run(im, ist, ys)
    cands = ys[:, None, :]  # [T, 1, 1]
    masks = jnp.ones((T, 1), bool)
    _, e_pdaf = imm.run_pdaf(im, ist, cands, masks, pd=1.0 - 1e-9,
                             clutter_density=1e-12, gate=1e9)
    np.testing.assert_allclose(np.asarray(e_pdaf.state),
                               np.asarray(e_plain.state), atol=1e-5)
    np.testing.assert_allclose(np.asarray(e_pdaf.mode_probs),
                               np.asarray(e_plain.mode_probs), atol=1e-4)


def test_immpdaf_maneuver_in_clutter_beats_single_model_pdaf():
    """Quiet/agile bank on a maneuvering target with 4 clutter points
    per frame: the IMM-PDAF must identify the maneuver AND beat the
    quiet-only PDAF on RMS."""
    from gokalman_tpu.filters import pdaf

    quiet = _cv_model(1e-3)
    agile = _cv_model(1.0)
    fn = np.asarray(quiet.f)
    lq = np.linalg.cholesky(np.asarray(quiet.noise.q) + 1e-15 * np.eye(2))
    la = np.linalg.cholesky(np.asarray(agile.noise.q))
    rms_i, rms_p, acc = [], [], []
    for seed in range(4):
        rng = np.random.default_rng(30 + seed)
        T = 70
        x = np.array([0.0, 0.3])
        xs, frames, masks, modes = [], [], [], []
        for k in range(T):
            agile_now = 30 <= k < 50
            L = la if agile_now else lq
            x = fn @ x + L @ rng.standard_normal(2)
            xs.append(x.copy())
            modes.append(agile_now)
            dets = [x[0] + 0.3 * rng.standard_normal()]
            while len(dets) < 5:
                dets.append(x[0] + rng.uniform(-6, 6))
            rng.shuffle(dets)
            frames.append(np.array(dets)[:, None])
            masks.append([True] * 5)
        truth = np.stack(xs)
        frames = jnp.asarray(np.stack(frames))
        masks = jnp.asarray(np.array(masks))
        trans = jnp.array([[0.95, 0.05], [0.05, 0.95]])
        im, ist = imm.new(jnp.array([0.0, 0.3]), jnp.eye(2),
                          [quiet, agile], trans)
        _, ei = imm.run_pdaf(im, ist, frames, masks, pd=0.95,
                             clutter_density=4 / 12.0, gate=16.0)
        pm, ps = pdaf.new(jnp.array([0.0, 0.3]), jnp.eye(2), quiet.f,
                          None, quiet.h, quiet.noise, pd=0.95,
                          clutter_density=4 / 12.0, gate=16.0)
        _, ep = pdaf.run(pm, ps, frames, masks)
        rms_i.append(np.sqrt(((np.asarray(ei.state)[:, 0]
                               - truth[:, 0]) ** 2).mean()))
        rms_p.append(np.sqrt(((np.asarray(ep.state)[:, 0]
                               - truth[:, 0]) ** 2).mean()))
        acc.append(((np.asarray(ei.mode_probs)[:, 1] > 0.5)
                    == np.array(modes)).mean())
    assert np.mean(rms_i) < np.mean(rms_p), (np.mean(rms_i),
                                             np.mean(rms_p))
    assert np.mean(acc) > 0.7, np.mean(acc)
