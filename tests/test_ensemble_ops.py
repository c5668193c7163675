"""Fused ensemble pipeline tests: statistical agreement with the
general vmap path, exact sharded-vs-unsharded equality on the 8-device
CPU mesh (SURVEY.md §4.8 multi-chip testing strategy)."""

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu import chisquare
from gokalman_tpu import noise as gn
from gokalman_tpu.filters import vanilla
from gokalman_tpu.montecarlo import monte_carlo
from gokalman_tpu.ops.ensemble import mc_chi_square, mc_stats
from gokalman_tpu.parallel import mesh as pmesh

from fixtures import robot1d_matrices


def _robot_system():
    f, g, dt = robot1d_matrices()
    h = jnp.array([[1.0, 0.0]])
    q = jnp.array([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]]) * 0.02
    r = jnp.array([[0.5]])
    return vanilla.new(jnp.zeros(2), 0.001 * jnp.eye(2), f, g, h, gn.awgn(q, r))


def test_consistency_gates():
    """The fused pipeline must show NEES ~ n, NIS ~ p like the general
    path (same statistics, different RNG layout)."""
    model, state0 = _robot_system()
    res = mc_chi_square(model, state0, samples=4096, steps=50, key=jax.random.PRNGKey(0))
    assert res.nees_means.shape == (50,)
    nees_tail = float(jnp.mean(res.nees_means[20:]))
    nis_tail = float(jnp.mean(res.nis_means[20:]))
    assert 1.8 < nees_tail < 2.2, nees_tail
    assert 0.9 < nis_tail < 1.1, nis_tail
    # Ensemble stddev grows from ~0 and stays positive.
    assert float(jnp.min(res.stddev[5:])) > 0


def test_matches_general_path_statistically():
    """Fused vs vmap-of-scan chi-square means agree to MC error."""
    model, state0 = _robot_system()
    res = mc_chi_square(model, state0, samples=8192, steps=40, key=jax.random.PRNGKey(1))
    runs = monte_carlo(model, state0, samples=512, steps=40, key=jax.random.PRNGKey(2))
    nis_g, nees_g = chisquare.chi_square(model, state0, runs)
    np.testing.assert_allclose(
        np.asarray(res.nees_means[10:]).mean(),
        np.asarray(nees_g[10:]).mean(),
        rtol=0.12,
    )
    np.testing.assert_allclose(
        np.asarray(res.nis_means[10:]).mean(),
        np.asarray(nis_g[10:]).mean(),
        rtol=0.12,
    )
    # MC stddev traces agree too (montecarlo.go:40-59 parity).
    means, devs = mc_stats(model, state0, samples=8192, steps=40, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(
        np.asarray(devs[30:]).mean(axis=0),
        np.asarray(runs.stddev()[30:]).mean(axis=0),
        rtol=0.1,
    )


def test_sharded_equals_unsharded():
    """Sharding the ensemble axis over the 8-device CPU mesh must not
    change the math: same key => identical NEES/NIS trajectories."""
    model, state0 = _robot_system()
    key = jax.random.PRNGKey(4)
    res_local = jax.jit(
        lambda k: mc_chi_square(model, state0, 1024, 30, k)
    )(key)
    mesh = pmesh.ensemble_mesh()
    assert mesh.devices.size == 8, "conftest must provide 8 CPU devices"
    res_shard = pmesh.sharded_mc_chi_square(model, state0, 1024, 30, key, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(res_shard.nees_means),
        np.asarray(res_local.nees_means),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(res_shard.nis_means),
        np.asarray(res_local.nis_means),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(res_shard.stddev), np.asarray(res_local.stddev), rtol=1e-9
    )


def test_sharded_rejects_indivisible():
    import pytest

    model, state0 = _robot_system()
    with pytest.raises(ValueError):
        pmesh.sharded_mc_chi_square(
            model, state0, 1001, 5, jax.random.PRNGKey(0), mesh=pmesh.ensemble_mesh()
        )
