"""Multi-chip fused-kernel pipeline: mechanics on the 8-device CPU mesh
(interpreter PRNG is stubbed, so only shapes/finiteness here; the
statistics are validated on TPU hardware where NEES/NIS land on n/p)."""

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import vanilla
from gokalman_tpu.parallel import mesh as pmesh


def test_sharded_kernel_mechanics_on_cpu_mesh():
    n, p = 4, 2
    f = jnp.eye(n, dtype=jnp.float32) + 0.01 * jnp.triu(jnp.ones((n, n), jnp.float32), 1)
    h = jnp.eye(p, n, dtype=jnp.float32)
    model, st = vanilla.new(
        jnp.zeros(n, jnp.float32), jnp.eye(n, dtype=jnp.float32), f, None, h,
        gn.awgn(1e-3 * jnp.eye(n, dtype=jnp.float32), 0.5 * jnp.eye(p, dtype=jnp.float32)),
    )
    mesh = pmesh.ensemble_mesh()
    assert mesh.devices.size == 8
    with pltpu.force_tpu_interpret_mode():
        out = pmesh.sharded_mc_chi_square_pallas(
            model, st, samples_per_device=1024, steps=4, seed=0,
            mesh=mesh, init_spread=False, tile=1024,
        )
    assert out.nees_means.shape == (4,)
    assert out.mean.shape == (4, n)
    assert bool(jnp.all(jnp.isfinite(out.nees_means)))
    assert bool(jnp.all(jnp.isfinite(out.stddev)))
