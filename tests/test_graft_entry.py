"""Keep the driver entry points under test: entry() compiles and runs,
dryrun_multichip exercises the 8-device ensemble mesh."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import __graft_entry__


def test_entry_compiles_and_runs():
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.nees_means.shape == (20,)
    assert bool(jnp.all(jnp.isfinite(out.nees_means)))


def test_dryrun_multichip_eight_devices():
    assert len(jax.devices()) >= 8  # conftest provides the CPU mesh
    __graft_entry__.dryrun_multichip(8)


def test_batch_noise_replay():
    """noise.batch sequences replayed through run() reproduce the same
    estimates as explicit per-step draws (BatchNoise semantics)."""
    from gokalman_tpu import noise as gn
    from gokalman_tpu.filters import vanilla

    rng = np.random.default_rng(5)
    f = jnp.asarray(np.eye(2) + 0.05 * rng.standard_normal((2, 2)))
    h = jnp.asarray(rng.standard_normal((1, 2)))
    q = 0.01 * jnp.eye(2)
    r = jnp.asarray([[0.3]])
    model, state0 = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h, gn.noiseless(q, r))
    t = 12
    bn = gn.batch(rng.standard_normal((t, 2)), rng.standard_normal((t, 1)))
    ys = jnp.asarray(rng.standard_normal((t, 1)))
    _, ests = vanilla.run(model, state0, measurements=ys, ws=bn.ws, ws2=bn.ws, vs=bn.vs)

    state = state0
    for k in range(t):
        state, est = vanilla.step(
            model, state, ys[k], w=bn.ws[k], w2=bn.ws[k], v=bn.vs[k]
        )
    np.testing.assert_allclose(
        np.asarray(ests.state[-1]), np.asarray(est.state), rtol=1e-12
    )


def test_profiling_trace_smoke(tmp_path):
    from gokalman_tpu import profiling

    with profiling.trace(str(tmp_path)):
        x = jnp.ones((64, 64))
        jax.block_until_ready(jax.jit(lambda a: a @ a)(x))
    import os

    found = any(f for _, _, fs in os.walk(tmp_path) for f in fs)
    assert found, "no trace files written"
