"""Parallel covariance path must match the sequential recurrence."""

import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import vanilla
from gokalman_tpu.ops.ensemble import (
    _covariance_path,
    _covariance_path_sequential,
)

from fixtures import random_spd


def test_parallel_matches_sequential():
    rng = np.random.default_rng(81)
    n, p = 5, 2
    f = jnp.asarray(np.eye(n) + 0.1 * rng.standard_normal((n, n)))
    h = jnp.asarray(rng.standard_normal((p, n)))
    q = jnp.asarray(random_spd(rng, n, 0.05))
    r = jnp.asarray(random_spd(rng, p, 0.3))
    p0 = jnp.asarray(random_spd(rng, n, 1.0))
    model, _ = vanilla.new(jnp.zeros(n), p0, f, None, h, gn.noiseless(q, r))

    for steps in (1, 2, 7, 64):
        seq = _covariance_path_sequential(model, p0, steps)
        par = _covariance_path(model, p0, steps)
        for name, a, b in zip(("K", "Sinv", "Pinv"), par, seq):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9,
                err_msg=f"{name} steps={steps}",
            )
