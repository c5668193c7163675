"""Trajectory propagation and measurement generation.

The scan-based equivalent of smd's PreciseMission + export callbacks
(hybrid_test.go:89-125): one lax.scan produces the truth trajectory,
per-step STMs, and the station measurement stream (with visibility
masks) that the OD harness consumes — no goroutines, no channels.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import constants as c
from . import gravity, integrators, stations as st


class Trajectory(NamedTuple):
    states: jax.Array  # [T, 6]
    stms: jax.Array  # [T, 6, 6] per-step STM Φ(t_k, t_{k-1})
    times: jax.Array  # [T]


def propagate(
    x0,
    dt: float,
    steps: int,
    degree: int = 2,
    method: str = "rk4",
    substeps: int = 1,
    t0: float = 0.0,
    with_stm: bool = True,
) -> Trajectory:
    """Propagate the PV state `steps` times; returns states + per-step STMs."""
    x0 = jnp.asarray(x0)
    eom = functools.partial(gravity.eom, degree=degree)
    phi = integrators.flow(eom, dt, method, substeps)

    if with_stm:
        def body(x, _):
            x_next, stm = integrators.x_and_jac(phi, x)
            return x_next, (x_next, stm)
    else:
        eye = jnp.eye(6, dtype=x0.dtype)

        def body(x, _):
            x_next = phi(x)
            return x_next, (x_next, eye)

    _, (states, stms) = jax.lax.scan(body, x0, None, length=steps)
    times = t0 + dt * jnp.arange(1, steps + 1, dtype=x0.dtype)
    return Trajectory(states, stms, times)


class MeasurementSet(NamedTuple):
    obs: jax.Array  # [T, 2] range / range-rate (noisy if key given)
    htildes: jax.Array  # [T, 2, 6] Jacobians at the observed states
    has_meas: jax.Array  # [T] visibility mask
    station_idx: jax.Array  # [T] which station observed (-1 if none)


def generate_measurements(
    station_list,
    traj: Trajectory,
    theta0: float = 0.0,
    key=None,
    sqrt_r=None,
) -> MeasurementSet:
    """Station measurements along a trajectory.

    The per-step station sweep (hybrid_test.go:101-117) vectorized over
    time; `key` + `sqrt_r` add N(0, R) measurement noise.
    """
    thetas = theta0 + c.EARTH_ROTATION_RATE * traj.times

    def one(state, theta):
        return st.observe_any(station_list, state, theta)

    obs, hts, has, idx = jax.vmap(one)(traj.states, thetas)
    if key is not None and sqrt_r is not None:
        noise = jax.vmap(lambda k: sqrt_r @ jax.random.normal(k, (2,), obs.dtype))(
            jax.random.split(key, obs.shape[0])
        )
        obs = obs + jnp.where(has[:, None], noise, 0.0)
    return MeasurementSet(obs, hts, has, idx)
