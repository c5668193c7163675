"""Rao-Blackwellized particle filter: exact-KF agreement when the
'nonlinear' substate is actually linear, variance reduction vs the
plain particle filter, masked steps, bookkeeping."""

import jax
import jax.numpy as jnp
import numpy as np

import gokalman_tpu as gk
from gokalman_tpu.filters import particle, rbpf, vanilla


def _system():
    """1-D 'nonlinear' substate η (drift a·η) + 2-D linear substate z,
    observed jointly: y = η + [1, 0] z + v."""
    a = 0.95
    f_z = jnp.array([[1.0, 0.1], [0.0, 0.98]])
    q_eta = jnp.array([[2e-3]])
    q_z = jnp.diag(jnp.array([1e-4, 5e-4]))
    r = jnp.array([[0.05]])
    c = jnp.array([[1.0, 0.0]])
    return a, f_z, q_eta, q_z, r, c


def _joint_kf(a, f_z, q_eta, q_z, r, c, ys):
    f = jnp.zeros((3, 3)).at[0, 0].set(a).at[1:, 1:].set(f_z)
    q = jnp.zeros((3, 3)).at[0, 0].set(q_eta[0, 0]).at[1:, 1:].set(q_z)
    h = jnp.concatenate([jnp.ones((1, 1)), c], axis=1)
    model, st = vanilla.new(jnp.array([0.5, 0.0, 0.2]), 0.5 * jnp.eye(3),
                            f, None, h, gk.noise.noiseless(q, r))
    _, est = vanilla.run(model, st, measurements=ys)
    ll = float(vanilla.innovations_log_likelihood(model, est))
    return est, ll


def _fns(a, c):
    f_eta = lambda e: a * e
    g_eta = lambda e: jnp.zeros(2, e.dtype)
    h_eta = lambda e: e[:1]
    c_eta = lambda e: c
    return f_eta, g_eta, h_eta, c_eta


def test_rbpf_matches_joint_kf_and_evidence():
    a, f_z, q_eta, q_z, r, c = _system()
    rng = np.random.default_rng(0)
    ys = jnp.asarray(0.5 + 0.3 * rng.standard_normal((30, 1)))
    kf_est, kf_ll = _joint_kf(a, f_z, q_eta, q_z, r, c, ys)

    model, st = rbpf.new(jnp.array([0.5]), 0.5 * jnp.eye(1),
                         jnp.array([0.0, 0.2]), 0.5 * jnp.eye(2),
                         f_z, q_eta, q_z, r, 4096, jax.random.PRNGKey(1))
    _, est = rbpf.run(model, st, ys, *_fns(a, c), key=jax.random.PRNGKey(2))

    scale = jnp.sqrt(jnp.diagonal(kf_est.covariance, axis1=1, axis2=2))
    joint = jnp.concatenate([est.eta, est.z], axis=1)
    err = np.abs(np.asarray(joint - kf_est.state)) / np.asarray(scale)
    assert err.max() < 0.15, err.max()
    pf_ll = float(jnp.sum(est.log_likelihood))
    assert abs(pf_ll - kf_ll) < 0.05 * abs(kf_ll), (pf_ll, kf_ll)
    # Marginalized z-covariance tracks the joint KF's z-block.
    rel = np.linalg.norm(est.z_covariance[-1]
                         - kf_est.covariance[-1, 1:, 1:]) / np.linalg.norm(
        kf_est.covariance[-1, 1:, 1:])
    assert rel < 0.15, rel


def test_rbpf_beats_plain_pf_at_small_n():
    """Rao-Blackwell theorem in action: at N=64 the RBPF (1 sampled
    dim) tracks the joint KF far better than a plain 3-D PF."""
    a, f_z, q_eta, q_z, r, c = _system()
    rng = np.random.default_rng(3)
    ys = jnp.asarray(0.5 + 0.3 * rng.standard_normal((30, 1)))
    kf_est, _ = _joint_kf(a, f_z, q_eta, q_z, r, c, ys)
    target = np.asarray(kf_est.state)

    def rbpf_rms(seed):
        model, st = rbpf.new(jnp.array([0.5]), 0.5 * jnp.eye(1),
                             jnp.array([0.0, 0.2]), 0.5 * jnp.eye(2),
                             f_z, q_eta, q_z, r, 64,
                             jax.random.PRNGKey(seed))
        _, est = rbpf.run(model, st, ys, *_fns(a, c),
                          key=jax.random.PRNGKey(seed + 100))
        joint = np.concatenate([np.asarray(est.eta), np.asarray(est.z)], 1)
        return np.sqrt(np.mean((joint - target) ** 2))

    def pf_rms(seed):
        f = jnp.zeros((3, 3)).at[0, 0].set(a).at[1:, 1:].set(f_z)
        q = jnp.zeros((3, 3)).at[0, 0].set(q_eta[0, 0]).at[1:, 1:].set(q_z)
        h = jnp.concatenate([jnp.ones((1, 1)), c], axis=1)
        noise = gk.noise.awgn(q + 1e-12 * jnp.eye(3), r)
        prop = particle.additive_dynamics(lambda x: f @ x, noise)
        loglik = particle.gaussian_log_likelihood(lambda x: h @ x, noise)
        s0 = particle.new(jnp.array([0.5, 0.0, 0.2]), 0.5 * jnp.eye(3), 64,
                          jax.random.PRNGKey(seed))
        _, est = particle.run(s0, ys, prop, loglik,
                              jax.random.PRNGKey(seed + 100))
        return np.sqrt(np.mean((np.asarray(est.state) - target) ** 2))

    seeds = [1, 2, 3, 4, 5, 6]
    rb = np.mean([rbpf_rms(s) for s in seeds])
    pf = np.mean([pf_rms(s) for s in seeds])
    assert rb < 0.7 * pf, (rb, pf)


def test_rbpf_masked_step_is_pure_propagation():
    a, f_z, q_eta, q_z, r, c = _system()
    model, st = rbpf.new(jnp.array([0.5]), 0.5 * jnp.eye(1),
                         jnp.array([0.0, 0.2]), 0.5 * jnp.eye(2),
                         f_z, q_eta, q_z, r, 32, jax.random.PRNGKey(4))
    st2, est = rbpf.step(model, st, jnp.array([99.0]), *_fns(a, c),
                         key=jax.random.PRNGKey(5), has=jnp.array(False))
    np.testing.assert_array_equal(st2.log_weights, st.log_weights)
    np.testing.assert_allclose(float(est.log_likelihood), 0.0, atol=1e-12)
    assert not bool(est.resampled)
    # z moments are the pure KF time update (identical across particles).
    np.testing.assert_allclose(
        st2.zs, st.zs @ f_z.T, atol=1e-12)


def test_rbpf_reproducible_under_jit():
    a, f_z, q_eta, q_z, r, c = _system()
    ys = 0.4 * jnp.ones((8, 1))
    model, st = rbpf.new(jnp.array([0.5]), 0.5 * jnp.eye(1),
                         jnp.array([0.0, 0.2]), 0.5 * jnp.eye(2),
                         f_z, q_eta, q_z, r, 128, jax.random.PRNGKey(6))
    fns = _fns(a, c)
    runner = jax.jit(lambda s, y, k: rbpf.run(model, s, y, *fns, key=k))
    _, e1 = runner(st, ys, jax.random.PRNGKey(7))
    _, e2 = runner(st, ys, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(e1.eta, e2.eta)
    assert e1.z.shape == (8, 2)
