"""Bootstrap particle filter: agreement with the exact KF on
linear-Gaussian models (mean + marginal likelihood), systematic
resampling statistics, ESS behavior, masked steps, non-Gaussian
tracking."""

import jax
import jax.numpy as jnp
import numpy as np

import gokalman_tpu as gk
from gokalman_tpu.filters import particle, vanilla


def _system():
    dt = 0.1
    f = jnp.array([[1.0, dt], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    q = jnp.array([[1e-3, 0.0], [0.0, 2e-3]])
    r = jnp.array([[0.05]])
    x0 = jnp.array([0.3, -0.2])
    p0 = jnp.array([[0.4, 0.0], [0.0, 0.2]])
    return f, h, q, r, x0, p0


def _measurements(t=25, seed=2):
    rng = np.random.default_rng(seed)
    return jnp.asarray(0.4 + 0.2 * rng.standard_normal((t, 1)))


def test_pf_matches_kf_mean_and_evidence():
    """Linear-Gaussian: the PF posterior mean tracks the exact KF mean
    (within Monte-Carlo error) and the summed incremental evidence
    matches the KF innovations log-likelihood."""
    f, h, q, r, x0, p0 = _system()
    ys = _measurements()
    noise = gk.noise.awgn(q, r)

    model, st = vanilla.new(x0, p0, f, None, h, gk.noise.noiseless(q, r))
    _, kf_est = vanilla.run(model, st, measurements=ys)
    kf_ll = float(vanilla.innovations_log_likelihood(model, kf_est))

    fx = lambda x: f @ x
    hx = lambda x: h @ x
    prop = particle.additive_dynamics(fx, noise)
    loglik = particle.gaussian_log_likelihood(hx, noise)
    s0 = particle.new(x0, p0, 8192, jax.random.PRNGKey(0))
    _, est = particle.run(s0, ys, prop, loglik, jax.random.PRNGKey(1))

    scale = jnp.sqrt(jnp.diagonal(kf_est.covariance, axis1=1, axis2=2))
    err = np.abs(np.asarray(est.state - kf_est.state)) / np.asarray(scale)
    assert err.max() < 0.15, err.max()
    pf_ll = float(jnp.sum(est.log_likelihood))
    assert abs(pf_ll - kf_ll) < 0.05 * abs(kf_ll), (pf_ll, kf_ll)
    # Posterior covariance close to the KF's at the end of the arc.
    rel = np.linalg.norm(est.covariance[-1] - kf_est.covariance[-1]) / (
        np.linalg.norm(kf_est.covariance[-1])
    )
    assert rel < 0.15, rel


def test_systematic_resample_counts():
    """Each weight w_i must spawn floor(N w_i) or ceil(N w_i) copies
    (the defining property of systematic resampling)."""
    w = jnp.array([0.45, 0.25, 0.15, 0.15])
    n = 16
    # 16 ancestors from the 4 weights (each spread over 4 equal slots;
    # a contiguous CDF block of mass w_i must spawn floor/ceil(N w_i)).
    idx = particle.systematic_resample_indices(
        jnp.log(jnp.repeat(w / 4.0, 4)), jax.random.PRNGKey(5)
    )
    counts = np.bincount(np.asarray(idx) // 4, minlength=4)
    expect = np.asarray(w) * n
    assert np.all(counts >= np.floor(expect)), (counts, expect)
    assert np.all(counts <= np.ceil(expect)), (counts, expect)


def test_ess_uniform_and_degenerate():
    n = 64
    uniform = jnp.full((n,), -jnp.log(float(n)))
    np.testing.assert_allclose(
        float(particle.effective_sample_size(uniform)), n, rtol=1e-10
    )
    degenerate = jnp.full((n,), -1e9).at[3].set(0.0)
    assert float(particle.effective_sample_size(degenerate)) < 1.001


def test_resampling_triggers_and_resets_weights():
    f, h, q, r, x0, p0 = _system()
    noise = gk.noise.awgn(q, jnp.array([[1e-6]]))  # razor likelihood
    prop = particle.additive_dynamics(lambda x: f @ x, noise)
    loglik = particle.gaussian_log_likelihood(lambda x: h @ x, noise)
    s0 = particle.new(x0, p0, 256, jax.random.PRNGKey(2))
    st, est = particle.step(s0, jnp.array([0.31]), prop, loglik,
                            jax.random.PRNGKey(3))
    assert bool(est.resampled)
    np.testing.assert_allclose(
        st.log_weights, -jnp.log(256.0), atol=1e-12
    )
    # Gentle likelihood: no resample, weights stay non-uniform.
    noise2 = gk.noise.awgn(q, jnp.array([[50.0]]))
    loglik2 = particle.gaussian_log_likelihood(lambda x: h @ x, noise2)
    st2, est2 = particle.step(s0, jnp.array([0.31]),
                              particle.additive_dynamics(lambda x: f @ x, noise2),
                              loglik2, jax.random.PRNGKey(3))
    assert not bool(est2.resampled)
    assert float(est2.ess) > 200


def test_masked_step_is_pure_propagation():
    f, h, q, r, x0, p0 = _system()
    noise = gk.noise.awgn(q, r)
    prop = particle.additive_dynamics(lambda x: f @ x, noise)
    loglik = particle.gaussian_log_likelihood(lambda x: h @ x, noise)
    s0 = particle.new(x0, p0, 128, jax.random.PRNGKey(7))
    st, est = particle.step(s0, jnp.array([99.0]), prop, loglik,
                            jax.random.PRNGKey(8), has=jnp.array(False))
    np.testing.assert_array_equal(st.log_weights, s0.log_weights)
    assert not bool(est.resampled)
    np.testing.assert_allclose(float(est.log_likelihood), 0.0, atol=1e-12)


def test_pf_non_gaussian_beats_ekf_class_linearization():
    """Bimodal measurement model y = |x| + v: the Gaussian filters
    cannot represent the sign ambiguity; the PF resolves it once the
    dynamics break the symmetry."""
    dt = 0.2

    def fx(x):
        return jnp.array([x[0] + dt * 0.8, x[1]])  # drift reveals sign

    def hx(x):
        return jnp.array([jnp.abs(x[0])])

    q = jnp.diag(jnp.array([1e-4, 1e-4]))
    r = jnp.array([[1e-3]])
    noise = gk.noise.awgn(q, r)

    truth = [jnp.array([-1.2, 0.0])]
    for _ in range(25):
        truth.append(fx(truth[-1]))
    truth = jnp.stack(truth[1:])
    rng = np.random.default_rng(4)
    ys = jax.vmap(hx)(truth) + jnp.asarray(
        rng.standard_normal((25, 1))
    ) * jnp.sqrt(r[0, 0])

    # Prior centered at +|x|: a unimodal Gaussian filter keeps the
    # wrong sign; the PF keeps both hypotheses alive and snaps to the
    # true (negative) branch.
    x0 = jnp.array([1.2, 0.0])
    p0 = jnp.diag(jnp.array([4.0, 0.01]))
    prop = particle.additive_dynamics(fx, noise)
    loglik = particle.gaussian_log_likelihood(hx, noise)
    s0 = particle.new(x0, p0, 4096, jax.random.PRNGKey(9))
    _, est = particle.run(s0, ys, prop, loglik, jax.random.PRNGKey(10))
    final_err = float(jnp.abs(est.state[-1, 0] - truth[-1, 0]))
    assert final_err < 0.2, final_err


def test_pf_reproducible_and_jittable():
    f, h, q, r, x0, p0 = _system()
    noise = gk.noise.awgn(q, r)
    ys = _measurements(t=8)
    prop = particle.additive_dynamics(lambda x: f @ x, noise)
    loglik = particle.gaussian_log_likelihood(lambda x: h @ x, noise)
    s0 = particle.new(x0, p0, 512, jax.random.PRNGKey(11))
    runner = jax.jit(lambda s, y, k: particle.run(s, y, prop, loglik, k))
    _, a = runner(s0, ys, jax.random.PRNGKey(12))
    _, b = runner(s0, ys, jax.random.PRNGKey(12))
    np.testing.assert_array_equal(a.state, b.state)
    assert a.state.shape == (8, 2)


def test_stratified_and_multinomial_resampling_unbiased():
    """All three schemes are unbiased (E[counts] = N w) and their
    count variances order multinomial >= stratified >= systematic."""
    w = jnp.array([0.5, 0.3, 0.15, 0.05])
    lw = jnp.log(w)
    n_trials = 400

    def counts(fn):
        out = []
        for s in range(n_trials):
            idx = fn(lw, jax.random.PRNGKey(s))
            out.append(np.bincount(np.asarray(idx), minlength=4))
        return np.asarray(out, dtype=float)

    for fn in (particle.systematic_resample_indices,
               particle.stratified_resample_indices,
               particle.multinomial_resample_indices):
        c = counts(fn)
        np.testing.assert_allclose(c.mean(0) / 4.0, np.asarray(w), atol=0.05)

    v_sys = counts(particle.systematic_resample_indices).var(0).sum()
    v_str = counts(particle.stratified_resample_indices).var(0).sum()
    v_mul = counts(particle.multinomial_resample_indices).var(0).sum()
    assert v_sys <= v_str + 0.05, (v_sys, v_str)
    assert v_str <= v_mul + 0.05, (v_str, v_mul)


def _gaussian_trans_logpdf(fx, noise):
    """log N(x_next; fx(x_prev), Q) for FFBS."""
    q_inv = np.linalg.inv(np.asarray(noise.q))
    _, logdet = np.linalg.slogdet(np.asarray(noise.q))
    n = noise.q.shape[0]
    qi = jnp.asarray(q_inv)
    c = -0.5 * (logdet + n * np.log(2 * np.pi))

    def f(x_next, x_prev):
        d = x_next - fx(x_prev)
        return c - 0.5 * d @ qi @ d

    return f


def test_ffbs_matches_rts_on_linear_gaussian():
    """N=2048 FFBS smoothing weights: the smoothed moments must land on
    the exact RTS smoother, far inside the filter-to-smoother gap (the
    EnKS-style pin), and the last step must equal the filter exactly."""
    from gokalman_tpu.filters import smoothing

    f, h, q, r, x0, p0 = _system()
    T = 30
    ys = _measurements(T, seed=5)
    model, st0 = vanilla.new(x0, p0, f, None, h, gk.noise.noiseless(q, r))
    _, kf_est = vanilla.run(model, st0, ys)
    phis = jnp.broadcast_to(f, (T, 2, 2))
    x_rts, p_rts = smoothing.rts_smoother(phis, q, kf_est.state,
                                          kf_est.covariance)

    fx = lambda x: f @ x
    hx = lambda x: h @ x
    noise = gk.noise.awgn(q, r)
    prop = particle.additive_dynamics(fx, noise)
    loglik = particle.gaussian_log_likelihood(hx, noise)
    s0 = particle.new(x0, p0, 2048, jax.random.PRNGKey(0))
    xs_sm, ps_sm, clouds, logw_sm = particle.run_ffbs(
        s0, ys, prop, loglik, _gaussian_trans_logpdf(fx, noise),
        jax.random.PRNGKey(1))

    err_sm = np.abs(np.asarray(xs_sm) - np.asarray(x_rts)).mean()
    err_filt = np.abs(np.asarray(kf_est.state) - np.asarray(x_rts)).mean()
    assert err_sm < 0.3 * err_filt, (err_sm, err_filt)
    # smoothed covariances near the RTS ones
    perr = np.abs(np.asarray(ps_sm) - np.asarray(p_rts)).mean()
    assert perr < 0.02, perr
    # weights normalized
    np.testing.assert_allclose(
        np.exp(np.asarray(jax.scipy.special.logsumexp(logw_sm, axis=1))),
        1.0, atol=1e-6)


def test_ffbs_last_step_is_filter():
    """FFBS emits POST-resample clouds (step() estimates pre-resample
    — measured while building); with resampling disabled the two
    representations coincide and the last smoothed step must equal the
    filter exactly."""
    f, h, q, r, x0, p0 = _system()
    T = 12
    ys = _measurements(T, seed=6)
    fx = lambda x: f @ x
    hx = lambda x: h @ x
    noise = gk.noise.awgn(q, r)
    prop = particle.additive_dynamics(fx, noise)
    loglik = particle.gaussian_log_likelihood(hx, noise)
    s0 = particle.new(x0, p0, 256, jax.random.PRNGKey(2))
    key = jax.random.PRNGKey(3)
    _, est = particle.run(s0, ys, prop, loglik, key,
                          resample_threshold=0.0)
    xs_sm, ps_sm, _, _ = particle.run_ffbs(
        s0, ys, prop, loglik, _gaussian_trans_logpdf(fx, noise), key,
        resample_threshold=0.0)
    np.testing.assert_allclose(np.asarray(xs_sm[-1]),
                               np.asarray(est.state[-1]), atol=1e-10)
    np.testing.assert_allclose(np.asarray(ps_sm[-1]),
                               np.asarray(est.covariance[-1]), atol=1e-10)
    # with resampling on, the last step matches the FINAL STATE's own
    # (post-resample) moments instead
    fin, _ = particle.run(s0, ys, prop, loglik, key)
    xs2, ps2, clouds2, logw2 = particle.run_ffbs(
        s0, ys, prop, loglik, _gaussian_trans_logpdf(fx, noise), key)
    w = np.exp(np.asarray(fin.log_weights))
    w = w / w.sum()
    mean_fin = w @ np.asarray(fin.particles)
    np.testing.assert_allclose(np.asarray(xs2[-1]), mean_fin, atol=1e-10)
