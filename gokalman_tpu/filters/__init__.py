"""Filter implementations (the reference's L4 tier, SURVEY.md §1)."""

from . import adaptive, batch, hybrid, information, smoothing, sqrt, srif, srukf, ukf, vanilla

__all__ = ["vanilla", "information", "sqrt", "srif", "hybrid", "batch", "ukf", "srukf", "adaptive", "smoothing"]
