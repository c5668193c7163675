"""Aux subsystem tests: checkpoint/resume, profiling timer, taxonomy,
pretty printers (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu import checkpoint, profiling, types
from gokalman_tpu import noise as gn
from gokalman_tpu.filters import vanilla

from fixtures import midterm2_system


def test_checkpoint_roundtrip_resumes_exactly(tmp_path):
    f, g, h, q, r, x0, p0 = midterm2_system()
    model, state0 = vanilla.new(x0, p0, f, g, h, gn.noiseless(q, r))
    ys = jnp.asarray(np.random.default_rng(1).standard_normal((20, 1)))
    us = jnp.zeros((20, 1))

    # Run 10 steps, checkpoint, run 10 more.
    mid, _ = vanilla.run(model, state0, measurements=ys[:10], controls=us[:10])
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, mid)
    restored = checkpoint.restore(path, mid)
    np.testing.assert_array_equal(np.asarray(restored.x), np.asarray(mid.x))
    assert int(restored.k) == int(mid.k)

    fin_direct, _ = vanilla.run(model, mid, measurements=ys[10:], controls=us[10:])
    fin_resumed, _ = vanilla.run(model, restored, measurements=ys[10:], controls=us[10:])
    np.testing.assert_array_equal(
        np.asarray(fin_direct.x), np.asarray(fin_resumed.x)
    )
    np.testing.assert_array_equal(
        np.asarray(fin_direct.p), np.asarray(fin_resumed.p)
    )


def test_time_fn():
    fn = jax.jit(lambda x: x @ x)
    secs, out = profiling.time_fn(fn, jnp.eye(16))
    assert secs > 0
    np.testing.assert_allclose(np.asarray(out), np.eye(16))


def test_filter_type_enum():
    assert str(types.FilterType.CKF) == "CKF"
    assert str(types.FilterType.SRIF) == "SRIF"
    assert len(types.FilterType) == 4  # CKF/EKF/UKF/SRIF (kalman.go:23-32)


def test_summaries():
    f, g, h, q, r, x0, p0 = midterm2_system()
    model, state0 = vanilla.new(x0, p0, f, g, h, gn.noiseless(q, r))
    _, est = vanilla.step(model, state0, jnp.zeros(1), jnp.zeros(1))
    s = types.estimate_summary(est)
    assert "s=" in s and "P=" in s and "K=" in s
    m = types.model_summary(model)
    assert "F=" in m and "Q=" in m and "R=" in m


def test_estimate_summary_covers_new_estimate_types():
    """The duck-typed pretty-printer works across the whole estimator
    zoo (skips absent fields instead of raising)."""
    import jax
    import numpy as np

    import gokalman_tpu as gk
    from gokalman_tpu.filters import enkf, particle, vanilla

    f = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    noise = gk.noise.awgn(1e-3 * jnp.eye(2), jnp.array([[0.05]]))
    ys = jnp.asarray(np.zeros((3, 1)))

    model, st = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h, noise)
    _, ve = vanilla.step(model, st, ys[0])
    fx, hx = enkf.linear_fns(f, h)
    es = enkf.new(jnp.zeros(2), jnp.eye(2), 16, key=jax.random.PRNGKey(0))
    _, ee = enkf.step(noise, es, ys[0], fx, hx, jax.random.PRNGKey(1))
    ps = particle.new(jnp.zeros(2), jnp.eye(2), 32, jax.random.PRNGKey(2))
    prop = particle.additive_dynamics(lambda x: f @ x, noise)
    ll = particle.gaussian_log_likelihood(lambda x: h @ x, noise)
    _, pe = particle.step(ps, ys[0], prop, ll, jax.random.PRNGKey(3))

    for est in (ve, ee, pe):
        s = gk.types.estimate_summary(est)
        assert isinstance(s, str) and "{" in s and len(s) > 10


def test_checkpoint_roundtrips_ensemble_and_particle_states(tmp_path):
    """The generic pytree checkpoint handles the new filter-state
    shapes (ensemble clouds, particle weights, RBPF joint particles)
    exactly — mid-run save/restore of any estimator in the zoo."""
    import jax
    import numpy as np

    import gokalman_tpu as gk
    from gokalman_tpu import checkpoint
    from gokalman_tpu.filters import enkf, particle, rbpf

    es = enkf.new(jnp.arange(3.0), jnp.eye(3), 16,
                  key=jax.random.PRNGKey(0))
    ps = particle.new(jnp.arange(2.0), jnp.eye(2), 64, jax.random.PRNGKey(1))
    _, rs = rbpf.new(jnp.zeros(1), jnp.eye(1), jnp.zeros(2), jnp.eye(2),
                     jnp.eye(2), jnp.eye(1), jnp.eye(2), jnp.eye(1),
                     32, jax.random.PRNGKey(2))

    for name, state in (("enkf", es), ("pf", ps), ("rbpf", rs)):
        p = str(tmp_path / name)
        checkpoint.save(p, state)
        back = checkpoint.restore(p, state)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrips_session3_states(tmp_path):
    """Mid-run save/restore for the round-3 tier's state pytrees:
    PMB (int labels + mixed shapes), set-membership ellipsoids, SISE,
    and a tracker bank — int32 leaves and bool masks must survive
    exactly."""
    import jax
    import numpy as np

    from gokalman_tpu import checkpoint
    from gokalman_tpu import noise as gn
    from gokalman_tpu.filters import pmb, setmembership, sise, tracker

    f = jnp.eye(4).at[0, 1].set(1.0)
    h = jnp.asarray(np.kron(np.eye(2), [[1.0, 0.0]]))
    q, r = 0.01 * jnp.eye(4), 0.1 * jnp.eye(2)
    nz = gn.noiseless(q, r)
    bm = jnp.zeros((1, 4))
    bp = 4.0 * jnp.eye(4)[None]
    _, s_pmb = pmb.new(f, None, h, nz, jnp.asarray([0.05]), bm, bp,
                       j_max=4, t_max=4)
    s_pmb = s_pmb._replace(r=s_pmb.r.at[0].set(0.7),
                           labels=s_pmb.labels.at[0].set(
                               jnp.asarray([3, 1], jnp.int32)))
    _, s_sm = setmembership.new(jnp.zeros(2), jnp.eye(2),
                                jnp.eye(2), None, jnp.eye(2)[:1],
                                gn.noiseless(0.1 * jnp.eye(2),
                                             jnp.asarray([[0.1]])))
    _, s_si = sise.new(jnp.zeros(4), jnp.eye(4), f, None, jnp.eye(4),
                       jnp.asarray([[0.0], [1.0], [0.0], [0.0]]),
                       gn.noiseless(q, 0.1 * jnp.eye(4)))
    _, s_tr = tracker.new(f, None, h, nz, n_slots=4,
                          p0_new=0.2 * jnp.eye(4))
    for name, state in (("pmb", s_pmb), ("sm", s_sm), ("sise", s_si),
                        ("trk", s_tr)):
        p = str(tmp_path / name)
        checkpoint.save(p, state)
        back = checkpoint.restore(p, state)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(back)):
            assert np.asarray(a).dtype == np.asarray(b).dtype
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
