"""Gaussian-sum filter: degenerate single-component equivalence with
the vanilla CKF, hypothesis resolution, masked steps, Runnalls mixture
reduction invariants, and the unscented flavor on a multimodal
(sign-ambiguous) measurement problem."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gokalman_tpu as gk
from gokalman_tpu.filters import gsf, ukf, vanilla


def _cv_model(q_scale=0.01, r=0.09):
    dt = 0.5
    f = jnp.array([[1.0, dt], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    q = q_scale * jnp.array([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]])
    model, _ = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h,
                           gk.noise.noiseless(q, jnp.array([[r]])))
    return model


def test_single_component_equals_ckf():
    """M=1 GSF is exactly the vanilla CKF, and its per-step mixture
    log-likelihood sums to the KF innovations log-likelihood."""
    model = _cv_model()
    rng = np.random.default_rng(0)
    ys = jnp.asarray(rng.standard_normal((25, 1)))
    x0, p0 = jnp.array([0.1, -0.3]), 2.0 * jnp.eye(2)

    _, st = vanilla.new(x0, p0, model.f, None, model.h, model.noise)
    _, kf_est = vanilla.run(model, st, measurements=ys)
    kf_ll = float(vanilla.innovations_log_likelihood(model, kf_est))

    gm, gst = gsf.new(x0[None, :], p0, model)
    _, est = gsf.run(gm, gst, ys)

    np.testing.assert_allclose(est.state, kf_est.state, atol=1e-9)
    np.testing.assert_allclose(est.covariance, kf_est.covariance, atol=1e-9)
    np.testing.assert_allclose(est.weights, 1.0, atol=1e-12)
    np.testing.assert_allclose(float(jnp.sum(est.log_likelihood)), kf_ll,
                               rtol=1e-9)


def test_identical_components_stay_uniform():
    """Identical components see identical likelihoods: weights stay
    uniform and the mixture equals the single CKF (zero mean spread)."""
    model = _cv_model()
    rng = np.random.default_rng(1)
    ys = jnp.asarray(rng.standard_normal((20, 1)))
    x0, p0 = jnp.zeros(2), jnp.eye(2)

    _, st = vanilla.new(x0, p0, model.f, None, model.h, model.noise)
    _, kf_est = vanilla.run(model, st, measurements=ys)

    gm, gst = gsf.new(jnp.broadcast_to(x0, (3, 2)), p0, model)
    _, est = gsf.run(gm, gst, ys)

    np.testing.assert_allclose(est.weights, 1.0 / 3.0, atol=1e-9)
    np.testing.assert_allclose(est.state, kf_est.state, atol=1e-9)
    np.testing.assert_allclose(est.covariance, kf_est.covariance, atol=1e-9)


def test_hypothesis_resolution():
    """Two initial hypotheses, one correct and one 50 units off: the
    correct one's weight -> 1 and the mixture converges to the KF that
    was started at the correct hypothesis."""
    model = _cv_model()
    rng = np.random.default_rng(2)
    truth = np.array([3.0, 0.4])
    f = np.asarray(model.f)
    ys, xs = [], truth.copy()
    for _ in range(30):
        xs = f @ xs
        ys.append(xs[0] + 0.3 * rng.standard_normal())
    ys = jnp.asarray(np.asarray(ys)[:, None])

    x0s = jnp.array([[3.0, 0.4], [53.0, 0.4]])
    gm, gst = gsf.new(x0s, jnp.eye(2), model)
    fst, est = gsf.run(gm, gst, ys)

    w = np.asarray(est.weights)
    assert w[-1, 0] > 1.0 - 1e-8, w[-1]

    _, st = vanilla.new(x0s[0], jnp.eye(2), model.f, None, model.h,
                        model.noise)
    _, kf_est = vanilla.run(model, st, measurements=ys)
    np.testing.assert_allclose(est.state[-1], kf_est.state[-1], atol=1e-6)
    np.testing.assert_allclose(est.covariance[-1], kf_est.covariance[-1],
                               atol=1e-6)


def test_masked_steps_freeze_weights():
    """Masked steps run per-component time updates only: weights stay
    put, the step's log-likelihood contribution is 0, and the mixture
    mean is the pure prediction of the previous mixture mean."""
    model = _cv_model()
    x0s = jnp.array([[0.0, 0.0], [4.0, -1.0]])
    gm, gst = gsf.new(x0s, jnp.eye(2), model, w0=jnp.array([0.7, 0.3]))
    st, est = gsf.step(gm, gst, jnp.array([jnp.nan]), has=jnp.array(False))

    np.testing.assert_allclose(est.weights, jnp.array([0.7, 0.3]),
                               atol=1e-12)
    np.testing.assert_allclose(float(est.log_likelihood), 0.0, atol=0)
    np.testing.assert_allclose(est.innovation, 0.0, atol=0)
    mix_mean0 = 0.7 * x0s[0] + 0.3 * x0s[1]
    np.testing.assert_allclose(est.state, model.f @ mix_mean0, atol=1e-12)
    assert np.all(np.isfinite(np.asarray(st.xs)))

    # Scan flavor: all-masked prefix leaves the weights at w0.
    ys = jnp.zeros((6, 1))
    masks = jnp.array([False] * 3 + [True] * 3)
    _, ests = gsf.run(gm, gst, ys, meas_masks=masks)
    np.testing.assert_allclose(ests.weights[2], jnp.array([0.7, 0.3]),
                               atol=1e-12)


def test_per_component_models_match_shared():
    """A list of identical per-component models (stacked leaves) runs
    the same program as the shared-model path."""
    model = _cv_model()
    rng = np.random.default_rng(3)
    ys = jnp.asarray(rng.standard_normal((15, 1)))
    x0s = jnp.array([[0.0, 0.1], [1.0, -0.2]])

    gm_s, gst_s = gsf.new(x0s, jnp.eye(2), model)
    _, est_s = gsf.run(gm_s, gst_s, ys)
    gm_l, gst_l = gsf.new(x0s, jnp.eye(2), [model, model])
    _, est_l = gsf.run(gm_l, gst_l, ys)

    np.testing.assert_allclose(est_l.state, est_s.state, atol=1e-12)
    np.testing.assert_allclose(est_l.weights, est_s.weights, atol=1e-12)


def test_mixture_measurement_noise_identifies_regime():
    """Mixture measurement noise (per-component R): under heavy-tailed
    measurements the wide-R component's weight dominates — the
    Sorenson-Alspach use the single-R CKF cannot express."""
    narrow = _cv_model(r=0.01)
    wide = _cv_model(r=4.0)
    rng = np.random.default_rng(4)
    # Truth is static zero; measurements drawn from the WIDE noise.
    ys = jnp.asarray(2.0 * rng.standard_normal((40, 1)))
    x0s = jnp.zeros((2, 2))
    gm, gst = gsf.new(x0s, jnp.eye(2), [narrow, wide])
    _, est = gsf.run(gm, gst, ys)
    assert float(est.weights[-1, 1]) > 0.99, np.asarray(est.weights[-1])


def _mixture_moments(xs, ps, logw):
    w = np.exp(np.asarray(logw) - np.logaddexp.reduce(np.asarray(logw)))
    xs, ps = np.asarray(xs), np.asarray(ps)
    mean = w @ xs
    dev = xs - mean
    cov = np.einsum("m,mij->ij", w, ps) + np.einsum("m,mi,mj->ij", w, dev,
                                                    dev)
    return mean, cov


def test_reduce_mixture_preserves_moments_and_merges_duplicates():
    """Runnalls reduction: every pairwise moment-matched merge
    preserves the overall mixture mean/covariance exactly, and exact
    duplicate components (zero-cost pairs) merge first."""
    rng = np.random.default_rng(5)
    n, m = 3, 8
    xs = rng.standard_normal((m, n))
    xs[5] = xs[2]  # exact duplicate pair
    ps = np.stack([gk_spd(rng, n) for _ in range(m)])
    ps[5] = ps[2]
    logw = np.log(rng.uniform(0.2, 1.0, m))
    xs_j, ps_j, logw_j = (jnp.asarray(xs), jnp.asarray(ps),
                          jnp.asarray(logw))

    mean0, cov0 = _mixture_moments(xs, ps, logw)
    xr, pr, lr = jax.jit(
        lambda a, b, c: gsf.reduce_mixture(a, b, c, m_out=7)
    )(xs_j, ps_j, logw_j)
    mean1, cov1 = _mixture_moments(xr, pr, lr)
    np.testing.assert_allclose(mean1, mean0, atol=1e-10)
    np.testing.assert_allclose(cov1, cov0, atol=1e-10)
    # The zero-cost duplicate pair merged: the merged component IS the
    # duplicate (moment match of two equal Gaussians), weight doubled.
    merged = np.asarray(xr)
    assert any(np.allclose(merged[i], xs[2], atol=1e-10)
               for i in range(7))
    assert not any(
        np.allclose(merged[i], xs[2], atol=1e-10)
        and np.allclose(merged[j], xs[2], atol=1e-10)
        for i in range(7) for j in range(i + 1, 7)
    )

    # Deep reduction 8 -> 2 still preserves the global moments exactly.
    xr2, pr2, lr2 = gsf.reduce_mixture(xs_j, ps_j, logw_j, m_out=2)
    mean2, cov2 = _mixture_moments(xr2, pr2, lr2)
    np.testing.assert_allclose(mean2, mean0, atol=1e-9)
    np.testing.assert_allclose(cov2, cov0, atol=1e-9)
    np.testing.assert_allclose(float(jnp.exp(lr2).sum()), 1.0, atol=1e-12)

    # m_out == m is a normalize-only no-op.
    xr3, _, _ = gsf.reduce_mixture(xs_j, ps_j, logw_j, m_out=m)
    np.testing.assert_allclose(xr3, xs, atol=0)
    with pytest.raises(ValueError):
        gsf.reduce_mixture(xs_j, ps_j, logw_j, m_out=0)


def gk_spd(rng, n):
    a = rng.standard_normal((n, n))
    return a @ a.T + n * np.eye(n)


def test_reduce_merges_overlapping_before_distinct_modes():
    """Two tight overlapping components + one distant mode, reduce to
    2: the overlapping pair merges, the distant mode survives intact."""
    xs = jnp.array([[0.0], [0.1], [10.0]])
    ps = jnp.broadcast_to(jnp.eye(1), (3, 1, 1))
    logw = jnp.log(jnp.array([0.4, 0.4, 0.2]))
    xr, pr, lr = gsf.reduce_mixture(xs, ps, logw, m_out=2)
    xr = np.asarray(xr)
    # Distant mode untouched.
    i10 = int(np.argmin(np.abs(xr[:, 0] - 10.0)))
    np.testing.assert_allclose(xr[i10, 0], 10.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pr)[i10], 1.0, atol=1e-12)
    np.testing.assert_allclose(np.exp(np.asarray(lr))[i10], 0.2, atol=1e-12)
    # Merged pair at the weighted midpoint.
    np.testing.assert_allclose(xr[1 - i10, 0], 0.05, atol=1e-12)


def test_gsf_ukf_single_component_equals_ukf():
    dt = 0.1

    def fx(x):
        return jnp.array([x[0] + dt * x[1], x[1] - dt * 0.2 * x[1] ** 3])

    def hx(x):
        return jnp.array([jnp.sqrt(1.0 + x[0] ** 2)])

    noise = gk.noise.noiseless(1e-4 * jnp.eye(2), jnp.array([[1e-3]]))
    rng = np.random.default_rng(6)
    ys = jnp.asarray(1.1 + 0.05 * rng.standard_normal((20, 1)))

    um, ust = ukf.new(jnp.array([0.8, 0.1]), jnp.eye(2), noise)
    _, uref = ukf.run(um, ust, ys, fx, hx)

    gm, gst = gsf.new_ukf(jnp.array([[0.8, 0.1]]), jnp.eye(2), um)
    _, est = gsf.run_ukf(gm, gst, ys, fx, hx)
    np.testing.assert_allclose(est.state, uref.state, atol=1e-9)
    np.testing.assert_allclose(est.covariance, uref.covariance, atol=1e-9)


def test_gsf_ukf_tracks_sign_ambiguous_measurement():
    """hx(x) = x^2 cannot distinguish ±x: a single UKF initialized at
    the wrong sign locks onto the wrong mode, while the GSF carries
    both hypotheses (weights stay split under the symmetric
    measurement) and snaps to the true mode the moment one
    sign-revealing linear measurement arrives."""
    q = jnp.diag(jnp.array([1e-6, 1e-6]))
    r = jnp.array([[1e-2]])
    noise = gk.noise.noiseless(q, r)
    dt = 0.1

    def fx(x):
        return jnp.array([x[0] + dt * x[1], x[1]])

    def hx_sq(x):
        return jnp.array([x[0] ** 2])

    def hx_lin(x):
        return jnp.array([x[0]])

    rng = np.random.default_rng(7)
    truth = np.array([2.0, 0.0])
    f = np.array([[1.0, dt], [0.0, 1.0]])
    ys = []
    for _ in range(25):
        truth = f @ truth
        ys.append(truth[0] ** 2 + 0.05 * rng.standard_normal())
    ys = jnp.asarray(np.asarray(ys)[:, None])

    # Single UKF at the wrong-sign hypothesis: stays on the wrong sign.
    um, ust = ukf.new(jnp.array([-2.0, 0.0]), 0.1 * jnp.eye(2), noise)
    stu, _ = ukf.run(um, ust, ys, fx, hx_sq)
    assert float(stu.x[0]) < 0.0

    gm, gst = gsf.new_ukf(jnp.array([[-2.0, 0.0], [2.0, 0.0]]),
                          0.1 * jnp.eye(2), um)
    st, est = gsf.run_ukf(gm, gst, ys, fx, hx_sq)
    w = np.asarray(est.weights[-1])
    # Symmetric measurement: both hypotheses stay alive.
    assert w.min() > 0.2, w
    # True state is inside the mixture's 3-sigma (the single wrong-sign
    # UKF's is not even close in position).
    mix_sd = float(jnp.sqrt(est.covariance[-1, 0, 0]))
    assert abs(float(est.state[-1, 0]) - truth[0]) < 3.0 * mix_sd

    # One sign-revealing measurement resolves the ambiguity.
    st2, est2 = gsf.step_ukf(gm, st, jnp.array([truth[0]]), fx, hx_lin)
    w2 = np.asarray(est2.weights)
    assert w2[1] > 0.999, w2
    assert abs(float(est2.state[0]) - truth[0]) < 0.1


def test_ctor_errors():
    model = _cv_model()
    with pytest.raises(ValueError):
        gsf.new(jnp.zeros(2), jnp.eye(2), model)  # x0s not [M, n]
    with pytest.raises(ValueError):
        gsf.new(jnp.zeros((2, 2)), jnp.eye(3), model)  # P0 dim mismatch
    with pytest.raises(ValueError):
        gsf.new(jnp.zeros((2, 2)), jnp.eye(2), [model])  # M mismatch


def test_checkpoint_roundtrip_resumes_exactly(tmp_path):
    """GSF state is a plain pytree: checkpoint/resume is exact,
    including the log-weights."""
    from gokalman_tpu import checkpoint

    model = _cv_model()
    rng = np.random.default_rng(8)
    ys = jnp.asarray(rng.standard_normal((20, 1)))
    gm, gst = gsf.new(jnp.array([[0.0, 0.0], [5.0, 0.0]]), jnp.eye(2), model)

    mid, _ = gsf.run(gm, gst, ys[:10])
    path = str(tmp_path / "gsf_ckpt")
    checkpoint.save(path, mid)
    restored = checkpoint.restore(path, mid)
    np.testing.assert_array_equal(np.asarray(restored.logw),
                                  np.asarray(mid.logw))

    fin_direct, _ = gsf.run(gm, mid, ys[10:])
    fin_resumed, _ = gsf.run(gm, restored, ys[10:])
    np.testing.assert_array_equal(np.asarray(fin_direct.xs),
                                  np.asarray(fin_resumed.xs))
    np.testing.assert_array_equal(np.asarray(fin_direct.logw),
                                  np.asarray(fin_resumed.logw))


def test_gsf_log_likelihood_is_differentiable():
    """The summed mixture log-likelihood differentiates through the
    whole scan (noise fitting through a multimodal filter), and the
    gradient points toward the true measurement variance."""
    rng = np.random.default_rng(9)
    truth_r = 0.25
    ys = jnp.asarray(np.sqrt(truth_r) * rng.standard_normal((60, 1)))
    dt = 0.5
    f = jnp.array([[1.0, dt], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    q = 1e-8 * jnp.eye(2)

    def total_ll(log_r):
        model, _ = vanilla.new(
            jnp.zeros(2), jnp.eye(2), f, None, h,
            gk.noise.noiseless(q, jnp.exp(log_r) * jnp.ones((1, 1))))
        gm, gst = gsf.new(jnp.zeros((2, 2)), jnp.eye(2), model)
        _, est = gsf.run(gm, gst, ys)
        return jnp.sum(est.log_likelihood)

    g_small = float(jax.grad(total_ll)(jnp.log(0.01)))
    g_large = float(jax.grad(total_ll)(jnp.log(25.0)))
    assert np.isfinite(g_small) and np.isfinite(g_large)
    assert g_small > 0.0 and g_large < 0.0, (g_small, g_large)


def test_f32_weight_collapse_stays_finite():
    """Log-space weights survive f32 hypothesis collapse: a hopeless
    hypothesis underflows in probability but the mixture stays finite
    and resolves correctly."""
    dt = 0.5
    f32 = jnp.float32
    f = jnp.array([[1.0, dt], [0.0, 1.0]], f32)
    h = jnp.array([[1.0, 0.0]], f32)
    q = jnp.asarray(1e-6 * np.eye(2), f32)
    r = jnp.array([[0.04]], f32)
    model, _ = vanilla.new(jnp.zeros(2, f32), jnp.eye(2, dtype=f32), f,
                           None, h, gk.noise.noiseless(q, r))
    rng = np.random.default_rng(10)
    ys = jnp.asarray(0.2 * rng.standard_normal((80, 1)), f32)
    gm, gst = gsf.new(jnp.array([[0.0, 0.0], [300.0, 0.0]], f32),
                      jnp.eye(2, dtype=f32), model)
    fst, est = gsf.run(gm, gst, ys)
    assert est.state.dtype == jnp.float32
    w = np.asarray(est.weights)
    assert np.isfinite(np.asarray(est.state)).all()
    assert np.isfinite(np.asarray(fst.logw)).all()
    assert w[-1, 0] > 1.0 - 1e-6, w[-1]


def test_reduce_mixture_pool():
    """pool >= M is a no-op (bit-identical to the full merge); a
    smaller pool keeps the dominant modes, stays normalized, and the
    dropped tail mass is redistributed by normalization."""
    import numpy as np
    key = jax.random.PRNGKey(4)
    m = 40
    xs = jax.random.normal(key, (m, 3))
    ps = jnp.broadcast_to(0.3 * jnp.eye(3), (m, 3, 3))
    logw = jnp.log(jnp.concatenate(
        [jnp.asarray([5.0, 4.0, 3.0]), 1e-4 * jnp.ones(m - 3)]))
    full = gsf.reduce_mixture(xs, ps, logw, 3)
    noop = gsf.reduce_mixture(xs, ps, logw, 3, pool=m)
    for a, b in zip(full, noop):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    xs8, ps8, lw8 = gsf.reduce_mixture(xs, ps, logw, 3, pool=8)
    np.testing.assert_allclose(np.exp(np.asarray(lw8)).sum(), 1.0,
                               rtol=1e-6)
    # the three dominant modes survive: each output mean is within the
    # merge radius of one of the heavy inputs
    heavy = np.asarray(xs[:3])
    for mu in np.asarray(xs8):
        assert np.min(np.linalg.norm(heavy - mu, axis=1)) < 1.5

    with pytest.raises(ValueError):
        gsf.reduce_mixture(xs, ps, logw, 5, pool=3)


def test_cluster_reduce():
    """Vo-Ma cluster merge: total mass preserved exactly, duplicate
    components merged with their moments matched, distinct modes kept,
    m_out >= M pads."""
    import numpy as np
    xs = jnp.asarray([[0.0, 0.0], [0.05, 0.0], [5.0, 5.0], [-4.0, 3.0]])
    ps = jnp.broadcast_to(0.25 * jnp.eye(2), (4, 2, 2))
    w = jnp.asarray([0.6, 0.5, 0.9, 0.02])
    xr, pr, wr = gsf.cluster_reduce(xs, ps, w, 3, dist2=4.0)
    np.testing.assert_allclose(float(wr.sum()), float(w.sum()), rtol=1e-6)
    # the two near-duplicates merged: one slot holds their weighted mean
    mu01 = np.asarray((0.6 * xs[0] + 0.5 * xs[1]) / 1.1)
    d = np.linalg.norm(np.asarray(xr) - mu01, axis=1)
    k = int(np.argmin(d))
    assert d[k] < 1e-6
    np.testing.assert_allclose(float(wr[k]), 1.1, rtol=1e-6)
    # merged covariance = moment match of the pair
    dd = np.asarray(xs[:2]) - mu01
    pm = (0.6 * (np.asarray(ps[0]) + np.outer(dd[0], dd[0]))
          + 0.5 * (np.asarray(ps[1]) + np.outer(dd[1], dd[1]))) / 1.1
    np.testing.assert_allclose(np.asarray(pr[k]), pm, atol=1e-6)
    # distinct modes survive unmerged
    assert min(np.linalg.norm(np.asarray(xr) - np.asarray(xs[2]), axis=1)) < 1e-6
    assert min(np.linalg.norm(np.asarray(xr) - np.asarray(xs[3]), axis=1)) < 1e-6
    # m_out >= M: identity + zero padding
    xr2, pr2, wr2 = gsf.cluster_reduce(xs, ps, w, 6)
    np.testing.assert_array_equal(np.asarray(wr2[:4]), np.asarray(w))
    assert float(wr2[4:].sum()) == 0.0
    # slot starvation redistributes mass proportionally (m_out=1)
    xr3, pr3, wr3 = gsf.cluster_reduce(xs, ps, w, 1, dist2=4.0)
    np.testing.assert_allclose(float(wr3.sum()), float(w.sum()), rtol=1e-6)
