"""Filter taxonomy and estimate pretty-printing.

Mirrors the reference's core contracts tier (reference: kalman.go:6-72):
FilterType enum and the human-readable String() output every estimate
type carries (e.g. vanilla.go:276-284).  The LDKF/NLDKF *interfaces*
map to this framework's module conventions instead of Go interfaces:
every linear filter module exposes new/step/run, every nonlinear one
new/predict/update/step/run (duck typing over pytrees — there is
nothing to dispatch on at runtime under jit).
"""

from __future__ import annotations

import enum

import numpy as np


class FilterType(enum.Enum):
    """Filter taxonomy (reference: kalman.go:23-32)."""

    CKF = "CKF"
    EKF = "EKF"
    UKF = "UKF"
    SRIF = "SRIF"

    def __str__(self) -> str:
        return self.value


def _fmt(arr) -> str:
    return np.array2string(
        np.asarray(arr), precision=6, suppress_small=True, prefix="  "
    )


def estimate_summary(est) -> str:
    """Human-readable estimate dump (the String() methods, e.g.
    vanilla.go:276-284).  Works on any estimate type in this package —
    fields are resolved by duck typing and skipped when absent."""
    lines = ["{"]
    for label, attr in [
        ("s", "state"),
        ("y", "measurement"),
        ("P", "covariance"),
        ("K", "gain"),
        ("P-", "pred_covariance"),
        ("i", "innovation"),
    ]:
        val = getattr(est, attr, None)
        if val is not None:
            lines.append(f"{label}={_fmt(val)}")
    lines.append("}")
    return "\n".join(lines)


def model_summary(model) -> str:
    """Filter-model dump (the reference's filter String(), vanilla.go:76-78)."""
    lines = []
    for name in ("f", "g", "h", "f_inv", "q_inv", "r_inv"):
        val = getattr(model, name, None)
        if val is not None:
            lines.append(f"{name.upper()}={_fmt(val)}")
    noise = getattr(model, "noise", None)
    if noise is not None:
        lines.append(f"Q={_fmt(noise.q)}")
        lines.append(f"R={_fmt(noise.r)}")
    return "\n".join(lines)
