"""Monte-Carlo + chi-square tests (mirrors reference montecarlo_test.go
shape/stddev assertions and adds statistical NEES/NIS consistency)."""

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu import chisquare
from gokalman_tpu import noise as gn
from gokalman_tpu.montecarlo import monte_carlo
from gokalman_tpu.filters import vanilla

from fixtures import robot1d_matrices


def _robot_system():
    """2-state MC fixture like examples/robot/main.go:17-31."""
    f, g, dt = robot1d_matrices()
    h = jnp.array([[1.0, 0.0]])
    q = jnp.array([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]]) * 0.02
    r = jnp.array([[0.5]])
    x0 = jnp.zeros(2)
    p0 = jnp.eye(2) * 0.001
    return f, g, h, q, r, x0, p0


def test_shapes_and_stddev():
    f, g, h, q, r, x0, p0 = _robot_system()
    model, state0 = vanilla.new(x0, p0, f, g, h, gn.awgn(q, r))
    runs = monte_carlo(model, state0, samples=25, steps=40, key=jax.random.PRNGKey(0))
    assert runs.estimates.state.shape == (25, 40, 2)
    assert runs.mean().shape == (40, 2)
    assert runs.stddev().shape == (40, 2)
    # Noise makes runs distinct -> nonzero ensemble stddev
    # (montecarlo_test.go's nonzero-stddev assertion).
    assert float(jnp.min(runs.stddev()[5:])) > 0
    # Mean at step 0 roughly x0 propagated once.
    m0 = np.asarray(runs.mean(0))
    assert np.all(np.abs(m0) < 1.0)


def test_as_csv_line_counts():
    f, g, h, q, r, x0, p0 = _robot_system()
    model, state0 = vanilla.new(x0, p0, f, g, h, gn.awgn(q, r))
    runs = monte_carlo(model, state0, samples=5, steps=12, key=jax.random.PRNGKey(1))
    blobs = runs.as_csv(["x", "v"])
    assert len(blobs) == 2
    for blob in blobs:
        lines = blob.split("\n")
        assert len(lines) == 13  # header + one per step (montecarlo.go:68)
        assert lines[0].split(",")[-2:] == ["x-mean", "x-stddev"] or lines[0].split(
            ","
        )[-2:] == ["v-mean", "v-stddev"]
        assert len(lines[1].split(",")) == 7  # 5 runs + mean + stddev


def test_chi_square_consistency():
    """A consistent filter must have mean NEES ~ n and mean NIS ~ p
    (the chisquare.go workload; statistical gate instead of golden
    values since the reference's AWGN is wall-clock seeded)."""
    f, g, h, q, r, x0, p0 = _robot_system()
    model, state0 = vanilla.new(x0, p0, f, g, h, gn.awgn(q, r))
    runs = monte_carlo(model, state0, samples=400, steps=50, key=jax.random.PRNGKey(2))
    nis, nees = chisquare.chi_square(model, state0, runs)
    assert nis.shape == (50,)
    assert nees.shape == (50,)
    # Skip the transient, average the tail.
    nees_tail = float(jnp.mean(nees[20:]))
    nis_tail = float(jnp.mean(nis[20:]))
    assert 1.6 < nees_tail < 2.4, nees_tail  # n = 2
    assert 0.8 < nis_tail < 1.2, nis_tail  # p = 1


def test_chi_square_requires_a_test():
    import pytest

    f, g, h, q, r, x0, p0 = _robot_system()
    model, state0 = vanilla.new(x0, p0, f, g, h, gn.awgn(q, r))
    runs = monte_carlo(model, state0, samples=4, steps=5, key=jax.random.PRNGKey(3))
    with pytest.raises(ValueError):
        chisquare.chi_square(model, state0, runs, with_nees=False, with_nis=False)


def test_init_spread_matches_p0():
    """init_spread=True draws x0 ~ N(x̄0, P0) per run (robot/main.go:29-31):
    the ensemble spread of the first estimate must be sqrt of the
    diagonal of F P0 F^T + Q."""
    f, g, h, q, r, x0, p0 = _robot_system()
    p0 = jnp.diag(jnp.array([4.0, 0.25]))
    model, state0 = vanilla.new(x0, p0, f, g, h, gn.awgn(q, r))
    runs = monte_carlo(model, state0, samples=4000, steps=3,
                       key=jax.random.PRNGKey(9), init_spread=True)
    spread0 = np.asarray(runs.stddev(step=0))
    expected = np.sqrt(np.diag(np.asarray(f @ p0 @ f.T + q)))
    np.testing.assert_allclose(spread0, expected, rtol=0.08)
    # Without the flag every run starts at exactly state0.x.
    runs_ns = monte_carlo(model, state0, samples=64, steps=3,
                          key=jax.random.PRNGKey(9))
    assert float(runs_ns.stddev(step=0).max()) < np.sqrt(q.max()) * 4
