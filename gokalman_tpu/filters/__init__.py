"""Filter implementations (the reference's L4 tier, SURVEY.md §1)."""

from . import (
    adaptive,
    batch,
    enkf,
    gsf,
    hybrid,
    imm,
    information,
    particle,
    rbpf,
    schmidt,
    smoothing,
    sqrt,
    srif,
    srukf,
    ukf,
    vanilla,
)

__all__ = [
    "vanilla", "information", "sqrt", "srif", "hybrid", "batch", "ukf",
    "srukf", "adaptive", "smoothing", "enkf", "particle", "imm", "rbpf",
    "gsf", "schmidt",
]
