"""Ground stations: range / range-rate measurements with elevation-mask
visibility and Earth rotation.

Equivalent of the smd station API the OD tests drive
(NewStation / PerformMeasurement / Measurement.Visible / HTilde,
hybrid_test.go:79-117, 287-294).  A station is a pytree of static
geometry; measurements are pure functions of (spacecraft ECI state,
time), and the 2x6 measurement Jacobian H̃ comes from jax.jacfwd of
the measurement function — consistent with the filter's linearization
by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import constants as c


class Station(NamedTuple):
    """Ground station at geocentric latitude/longitude [rad], altitude [km]."""

    latitude: jax.Array
    longitude: jax.Array
    altitude: jax.Array
    elevation_mask: jax.Array  # [rad]

    @property
    def ecef_position(self) -> jax.Array:
        rho = c.R_EARTH + self.altitude
        cl = jnp.cos(self.latitude)
        return rho * jnp.stack(
            [cl * jnp.cos(self.longitude), cl * jnp.sin(self.longitude),
             jnp.sin(self.latitude)]
        )


def new_station(lat_deg, lon_deg, alt_km=0.0, elevation_mask_deg=10.0) -> Station:
    d2r = jnp.pi / 180.0
    return Station(
        jnp.asarray(lat_deg * d2r),
        jnp.asarray(lon_deg * d2r),
        jnp.asarray(alt_km, dtype=jnp.result_type(float)),
        jnp.asarray(elevation_mask_deg * d2r),
    )


def eci_state(station: Station, theta_gst) -> tuple[jax.Array, jax.Array]:
    """Station ECI position and velocity at Earth rotation angle θ_gst."""
    r_ecef = station.ecef_position
    ct, st = jnp.cos(theta_gst), jnp.sin(theta_gst)
    dtype = r_ecef.dtype  # keep f32 workloads f32 (no weak-f64 upcast)
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    rot = jnp.array([[ct, -st, zero], [st, ct, zero], [zero, zero, one]])
    r_eci = rot @ r_ecef
    omega = jnp.array([zero, zero, jnp.asarray(c.EARTH_ROTATION_RATE, dtype)])
    v_eci = jnp.cross(omega, r_eci)
    return r_eci, v_eci


def range_range_rate(station: Station, state: jax.Array, theta_gst) -> jax.Array:
    """[ρ, ρ̇] of the spacecraft PV `state` [6] from the station."""
    r_s, v_s = eci_state(station, theta_gst)
    dr = state[:3] - r_s
    dv = state[3:] - v_s
    rho = jnp.linalg.norm(dr)
    return jnp.stack([rho, jnp.dot(dr, dv) / rho])


def elevation(station: Station, state: jax.Array, theta_gst) -> jax.Array:
    """Elevation angle [rad] of the spacecraft above the station horizon."""
    r_s, _ = eci_state(station, theta_gst)
    dr = state[:3] - r_s
    zenith = r_s / jnp.linalg.norm(r_s)
    return jnp.arcsin(jnp.clip(jnp.dot(dr, zenith) / jnp.linalg.norm(dr), -1.0, 1.0))


def visible(station: Station, state: jax.Array, theta_gst) -> jax.Array:
    """Elevation-mask visibility (Measurement.Visible equivalent)."""
    return elevation(station, state, theta_gst) >= station.elevation_mask


def measurement_jacobian(station: Station, state: jax.Array, theta_gst) -> jax.Array:
    """H̃ = ∂[ρ, ρ̇]/∂state, the 2x6 Jacobian (smd's HTilde,
    hybrid_test.go:293)."""
    return jax.jacfwd(lambda x: range_range_rate(station, x, theta_gst))(state)


def observe_any(stations, state: jax.Array, theta_gst):
    """Evaluate every station, pick the first visible one.

    Static-shape version of the OD loop's station scan
    (hybrid_test.go:101-117): returns (obs [2], htilde [2,6],
    has_meas bool, station_index int32).  When no station sees the
    spacecraft, obs/htilde are zeros and has_meas is False.
    """
    obs = jnp.stack([range_range_rate(s, state, theta_gst) for s in stations])
    hts = jnp.stack([measurement_jacobian(s, state, theta_gst) for s in stations])
    vis = jnp.stack([visible(s, state, theta_gst) for s in stations])
    idx = jnp.argmax(vis)
    has = jnp.any(vis)
    zero = jnp.zeros_like(obs[0])
    zero_h = jnp.zeros_like(hts[0])
    return (
        jnp.where(has, obs[idx], zero),
        jnp.where(has, hts[idx], zero_h),
        has,
        jnp.where(has, idx, -1),
    )
