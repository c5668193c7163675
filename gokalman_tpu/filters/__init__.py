"""Filter implementations (the reference's L4 tier, SURVEY.md §1)."""

from . import (
    adaptive,
    batch,
    constrained,
    cphd,
    enkf,
    gsf,
    hinf,
    hybrid,
    imm,
    mekf,
    information,
    jpda,
    mhe,
    particle,
    pdaf,
    phd,
    quadrature,
    rbpf,
    schmidt,
    smoothing,
    sqrt,
    srif,
    srukf,
    studentt,
    tracker,
    udu,
    ukf,
    vanilla,
)

__all__ = [
    "vanilla", "information", "sqrt", "srif", "hybrid", "batch", "ukf",
    "srukf", "adaptive", "smoothing", "enkf", "particle", "imm", "rbpf",
    "gsf", "schmidt", "udu", "hinf", "constrained", "pdaf", "mhe",
    "studentt", "quadrature", "mekf", "jpda", "tracker", "phd", "cphd",
]
