"""Multi-slice (DCN) ensemble sharding: a 2-D ('slice', 'chip') mesh.

Real multi-slice hardware is unavailable here; the 8 virtual CPU
devices stand in as 2 slices x 4 chips.  The ensemble axis shards over
both mesh axes; the per-step statistic all-reduces decompose into an
intra-slice (ICI) and an inter-slice (DCN) leg that only ever moves
[T]-sized partials.  Results must match the 1-D mesh and the unsharded
pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import vanilla
from gokalman_tpu.ops.ensemble import mc_chi_square
from gokalman_tpu.parallel import mesh as pmesh


def _model():
    n, p = 4, 2
    f = jnp.eye(n) + 0.01 * jnp.triu(jnp.ones((n, n)), 1)
    h = jnp.eye(p, n)
    return vanilla.new(
        jnp.zeros(n), jnp.eye(n), f, None, h,
        gn.awgn(1e-3 * jnp.eye(n), 0.5 * jnp.eye(p)),
    )


def test_multislice_mesh_shape():
    mesh = pmesh.multislice_mesh(2, 4)
    assert mesh.axis_names == (pmesh.SLICE_AXIS, pmesh.CHIP_AXIS)
    assert mesh.devices.shape == (2, 4)


def test_xla_pipeline_matches_unsharded_on_multislice_mesh():
    """Sharding is a layout decision, not a semantic one: the fused XLA
    pipeline on the 2x4 mesh must reproduce the unsharded result."""
    model, st = _model()
    key = jax.random.PRNGKey(3)
    base = jax.jit(lambda k: mc_chi_square(
        model, st, 512, 20, k, init_spread=True,
        lagged_measurements=False))(key)
    mesh2d = pmesh.multislice_mesh(2, 4)
    sharded = pmesh.sharded_mc_chi_square(
        model, st, 512, 20, key, mesh=mesh2d, init_spread=True,
        lagged_measurements=False)
    for name in ("nees_means", "nis_means", "mean", "stddev"):
        np.testing.assert_allclose(
            np.asarray(getattr(sharded, name)),
            np.asarray(getattr(base, name)),
            rtol=2e-5, atol=1e-6, err_msg=name)


def test_pallas_pipeline_multislice_matches_1d():
    """The shard_map'd kernel pipeline on a 2-D mesh must agree with
    the 1-D mesh (same per-device seeds, hierarchical vs flat pooling)."""
    model, st = _model()
    mesh1d = pmesh.ensemble_mesh()
    mesh2d = pmesh.multislice_mesh(2, 4)
    kw = dict(samples_per_device=1024, steps=5, seed=11,
              init_spread=False, tile=1024)
    with pltpu.force_tpu_interpret_mode():
        out1 = pmesh.sharded_mc_chi_square_pallas(model, st, mesh=mesh1d, **kw)
        out2 = pmesh.sharded_mc_chi_square_pallas(model, st, mesh=mesh2d, **kw)
    for name in ("nees_means", "nis_means", "mean", "stddev"):
        np.testing.assert_allclose(
            np.asarray(getattr(out2, name)), np.asarray(getattr(out1, name)),
            rtol=1e-5, atol=1e-7, err_msg=name)
        assert np.isfinite(np.asarray(getattr(out2, name))).all()
