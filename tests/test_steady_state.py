"""Steady-state (DARE) gain and constant-gain filter tests."""

import jax.numpy as jnp
import numpy as np

from gokalman_tpu import linalg
from gokalman_tpu import noise as gn
from gokalman_tpu.filters import vanilla

from fixtures import random_spd


def _system(rng, n=4, p=2):
    f = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    f *= 0.95 / max(1.0, np.max(np.abs(np.linalg.eigvals(f))))
    h = rng.standard_normal((p, n))
    q = random_spd(rng, n, 0.05)
    r = random_spd(rng, p, 0.3)
    return map(jnp.asarray, (f, h, q, r))


def test_dare_fixed_point():
    """solve_dare's output must satisfy the Riccati equation."""
    rng = np.random.default_rng(101)
    f, h, q, r = _system(rng)
    p = linalg.solve_dare(f, h, q, r)
    pn = np.asarray(p)
    fn, hn, qn, rn = map(np.asarray, (f, h, q, r))
    s = hn @ pn @ hn.T + rn
    rhs = fn @ pn @ fn.T - fn @ pn @ hn.T @ np.linalg.solve(s, hn @ pn @ fn.T) + qn
    np.testing.assert_allclose(pn, rhs, rtol=1e-9, atol=1e-12)
    assert np.all(np.linalg.eigvalsh(pn) > 0)


def test_matches_converged_scan():
    """The scanned filter's P^- and K converge to the DARE solution."""
    rng = np.random.default_rng(102)
    f, h, q, r = _system(rng)
    model, state0 = vanilla.new(
        jnp.zeros(4), 10.0 * jnp.eye(4), f, None, h, gn.noiseless(q, r)
    )
    ys = jnp.asarray(rng.standard_normal((300, 2)))
    _, ests = vanilla.run(model, state0, measurements=ys)
    p_pred, k_gain, p_plus = vanilla.steady_state(model)
    np.testing.assert_allclose(
        np.asarray(ests.pred_covariance[-1]), np.asarray(p_pred), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(ests.gain[-1]), np.asarray(k_gain), rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(ests.covariance[-1]), np.asarray(p_plus), rtol=1e-7, atol=1e-9
    )


def test_steady_state_filter_tracks_full_filter():
    """After the transient, the constant-gain filter's states match the
    full filter's to the convergence tolerance."""
    rng = np.random.default_rng(103)
    f, h, q, r = _system(rng)
    model, state0 = vanilla.new(jnp.zeros(4), jnp.eye(4), f, None, h, gn.noiseless(q, r))
    t = 400
    ys = jnp.asarray(rng.standard_normal((t, 2)))
    _, full = vanilla.run(model, state0, measurements=ys)
    states, _ = vanilla.run_steady_state(model, jnp.zeros(4), ys)
    diff = np.abs(np.asarray(states[200:]) - np.asarray(full.state[200:])).max()
    assert diff < 1e-6, diff
