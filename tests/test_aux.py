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
