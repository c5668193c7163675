"""Orbital dynamics module — the in-framework equivalent of the `smd`
dependency the reference's OD tests import (SURVEY.md §2.16):
two-body + J2/J3 gravity, fixed-step RK integrators with STM via
jax.jacfwd of the flow (replacing smd's hand-propagated variational
equations), orbital-element <-> RV conversions, ground stations with
range/range-rate measurements and elevation-mask visibility, and Earth
rotation.  Everything is jittable and vmappable.  `attitude` adds the
second application domain: quaternion kinematics + gyro error models
for the MEKF tier (filters/mekf.py); `liegroup` the SO(3)/SE_2(3)
substrate for the invariant-EKF navigation tier (filters/iekf.py).
"""

from . import (attitude, constants, elements, gravity, integrators,
               liegroup, propagate, stations)

__all__ = [
    "attitude",
    "constants",
    "elements",
    "gravity",
    "integrators",
    "liegroup",
    "propagate",
    "stations",
]
