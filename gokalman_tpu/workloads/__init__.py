"""Reference workload definitions (faithful system matrices + schedules)."""

from . import jerkcar  # noqa: F401
