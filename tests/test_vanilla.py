"""Vanilla CKF tests: constructor checks, 1e-9 numpy parity, scan driver,
pure-predictor mode (mirrors reference vanilla_test.go)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import vanilla

from fixtures import NumpyCKF, midterm2_system, robot1d_matrices


def test_constructor_errors():
    """vanilla_test.go:9-27: incompatible shapes must fail fast."""
    f, g, _ = robot1d_matrices()
    h = jnp.zeros((2, 2))
    nz = gn.noiseless(jnp.zeros((2, 2)), jnp.zeros((2, 2)))
    with pytest.raises(ValueError):
        vanilla.new(jnp.zeros(2), jnp.zeros((3, 3)), f, g, h, nz)
    with pytest.raises(ValueError):
        vanilla.new(jnp.zeros(3), jnp.zeros((3, 3)), f, g, h, nz)
    with pytest.raises(ValueError):
        vanilla.new(jnp.zeros(2), jnp.zeros((2, 2)), f, g, jnp.zeros((3, 3)), nz)


def test_parity_vs_numpy_oracle():
    """Step-for-step parity with the float64 numpy port of
    vanilla.go:128-220, to 1e-9 relative (BASELINE.md target)."""
    f, g, h, q, r, x0, p0 = midterm2_system()
    model, state = vanilla.new(x0, p0, f, g, h, gn.noiseless(q, r))
    oracle = NumpyCKF(x0, p0, f, g, h, q, r)

    rng = np.random.default_rng(42)
    step_jit = jax.jit(vanilla.step)
    for k in range(50):
        y = jnp.asarray(rng.standard_normal(1))
        u = jnp.asarray(rng.standard_normal(1))
        state, est = step_jit(model, state, y, u)
        ref = oracle.update(np.asarray(y), np.asarray(u))
        np.testing.assert_allclose(np.asarray(est.state), ref["x"], rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(est.covariance), ref["p"], rtol=1e-9, atol=1e-15)
        np.testing.assert_allclose(np.asarray(est.pred_covariance), ref["p_pred"], rtol=1e-9, atol=1e-15)
        np.testing.assert_allclose(np.asarray(est.gain), ref["k"], rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(est.innovation), ref["innov"], rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(est.measurement), ref["y_hat"], rtol=1e-9, atol=1e-12)


def test_run_scan_equals_step_loop():
    """The fused lax.scan driver must equal the per-step loop exactly."""
    f, g, h, q, r, x0, p0 = midterm2_system()
    model, state0 = vanilla.new(x0, p0, f, g, h, gn.noiseless(q, r))
    rng = np.random.default_rng(7)
    t = 20
    ys = jnp.asarray(rng.standard_normal((t, 1)))
    us = jnp.asarray(rng.standard_normal((t, 1)))

    final, ests = vanilla.run(model, state0, measurements=ys, controls=us)

    state = state0
    for k in range(t):
        state, est = vanilla.step(model, state, ys[k], us[k])
        np.testing.assert_allclose(
            np.asarray(ests.state[k]), np.asarray(est.state), rtol=1e-12
        )
    np.testing.assert_allclose(np.asarray(final.x), np.asarray(state.x), rtol=1e-12)
    assert int(final.k) == t


def test_pure_predictor():
    """vanilla.go:170-179: prediction-only estimates carry P^- as both
    covariance and pred covariance, zero innovation."""
    f, g, h, q, r, x0, p0 = midterm2_system()
    model, state0 = vanilla.new(x0, p0, f, g, h, gn.noiseless(q, r))
    _, ests = vanilla.run(model, state0, steps=10, prediction_only=True)
    np.testing.assert_allclose(
        np.asarray(ests.covariance), np.asarray(ests.pred_covariance)
    )
    np.testing.assert_allclose(np.asarray(ests.innovation), 0.0)
    # State must follow x_{k+1} = F x_k exactly (noiseless, no control).
    x = np.asarray(x0)
    fnp = np.asarray(f)
    for k in range(10):
        x = fnp @ x
        np.testing.assert_allclose(np.asarray(ests.state[k]), x, rtol=1e-12)


def test_awgn_reproducible_and_noisy():
    f, g, h, q, r, x0, p0 = midterm2_system()
    model, state0 = vanilla.new(x0, p0, f, g, h, gn.awgn(q, r))
    key = jax.random.PRNGKey(3)
    _, e1 = vanilla.run(model, state0, steps=10, key=key, prediction_only=True)
    _, e2 = vanilla.run(model, state0, steps=10, key=key, prediction_only=True)
    np.testing.assert_array_equal(np.asarray(e1.state), np.asarray(e2.state))
    _, e3 = vanilla.run(
        model, state0, steps=10, key=jax.random.PRNGKey(4), prediction_only=True
    )
    assert not np.allclose(np.asarray(e1.state), np.asarray(e3.state))
    # Measurement estimates must be noisy (AWGN measurement draws).
    assert np.std(np.asarray(e1.measurement)) > 0


def test_within_nsigma_outlier():
    """The σ-bound check flags a deliberate outlier (the yacc[99]=36.295
    trick in vanilla_test.go:61-68)."""
    f, g, h, q, r, x0, p0 = midterm2_system()
    model, state0 = vanilla.new(x0, p0, f, g, h, gn.noiseless(q, r))
    ys = jnp.zeros((100, 1)).at[99, 0].set(36.295)
    _, ests = vanilla.run(model, state0, measurements=ys)
    flags = ests.within_nsigma(2.0)
    assert bool(flags[50])
    assert not bool(flags[99])


def test_vmap_over_initial_states():
    """Filters vmap over a batch axis (the ensemble story, SURVEY §2)."""
    f, g, h, q, r, x0, p0 = midterm2_system()
    model, state0 = vanilla.new(x0, p0, f, g, h, gn.noiseless(q, r))
    xs0 = jnp.stack([x0, x0 + 1.0, x0 - 1.0])
    ys = jnp.zeros((5, 1))

    def one(x_init):
        st = state0._replace(x=x_init)
        _, ests = vanilla.run(model, st, measurements=ys)
        return ests.state

    out = jax.vmap(one)(xs0)
    assert out.shape == (3, 5, 3)
    single = one(xs0[1])
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single), rtol=1e-12)
