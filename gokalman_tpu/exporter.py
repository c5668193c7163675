"""Streaming CSV export of estimates with ±Nσ bounds.

TPU rebuild of the reference exporter (reference: exporter.go:12-96).
The device side stays pure: filters return stacked estimate pytrees;
this module is the host boundary that drains them to CSV.  Headers
prefixed with `_` are written without covariance-bound columns
(exporter.go:74-76); files carry creation/closing timestamps
(exporter.go:26, 88).
"""

from __future__ import annotations

import datetime
import math
import os


class CSVExporter:
    """Per-estimate CSV writer (reference: exporter.go:18-57)."""

    def __init__(self, headers, filepath, filename, covar_bound: float = 2.0):
        self.covar_bound = covar_bound
        self.delimiter = ","
        self._bounded = [not h.startswith("_") for h in headers]
        self._fh = open(os.path.join(filepath, filename), "w")
        cols = []
        bhdr = f"{covar_bound:.0f}s"
        for h, bounded in zip(headers, self._bounded):
            if bounded:
                cols += [h, f"{h}+{bhdr}", f"{h}-{bhdr}"]
            else:
                cols.append(h[1:])
        now = datetime.datetime.now(datetime.timezone.utc)
        self._fh.write(f"# Creation date (UTC): {now}\n")
        self._fh.write(self.delimiter.join(cols) + "\n")

    def write(self, est) -> None:
        """Write one estimate row: value, +Nσ, -Nσ per state component
        (σ from the covariance diagonal, exporter.go:34-45); components
        whose header was `_`-prefixed get the value only, keeping rows
        aligned with the header (the Go reference's Write always emits
        three columns and silently misaligns such files)."""
        import numpy as np

        state = np.asarray(est.state).reshape(-1)
        covar = np.asarray(est.covariance)
        vals = []
        for i in range(state.shape[0]):
            vals.append(f"{state[i]:f}")
            if i >= len(self._bounded) or self._bounded[i]:
                bound = self.covar_bound * math.sqrt(max(covar[i, i], 0.0))
                vals += [f"{bound:f}", f"{-bound:f}"]
        self._fh.write(self.delimiter.join(vals) + "\n")

    def _trace_matrix(self, ests):
        """[T, out_cols] float64 matrix of (value, +Nσ, -Nσ) columns."""
        import numpy as np

        states = np.asarray(ests.state)
        covars = np.asarray(ests.covariance)
        cols = []
        for i in range(states.shape[1]):
            cols.append(states[:, i])
            if i >= len(self._bounded) or self._bounded[i]:
                bound = self.covar_bound * np.sqrt(
                    np.maximum(covars[:, i, i], 0.0)
                )
                cols += [bound, -bound]
        return np.stack(cols, axis=1)

    def write_all(self, ests) -> None:
        """Drain a stacked [T, ...] estimate pytree in one host transfer.

        Uses the native C++ formatter (gokalman_tpu.native.fastcsv,
        printf-"%f"-compatible so output is byte-identical) when
        available; Python string formatting otherwise."""
        matrix = self._trace_matrix(ests)
        from . import native

        text = native.format_csv(matrix)
        if text is not None:
            self._fh.write(text)
            return
        rows = []
        for k in range(matrix.shape[0]):
            rows.append(self.delimiter.join(f"{v:f}" for v in matrix[k]))
        self._fh.write("\n".join(rows) + "\n")

    def write_raw(self, s: str) -> None:
        self._fh.write(s)

    def write_raw_ln(self, s: str) -> None:
        self._fh.write(s + "\n")

    def close(self) -> None:
        now = datetime.datetime.now(datetime.timezone.utc)
        self.write_raw_ln(f"# Closing date (UTC): {now}\n")
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def new_csv_exporter(headers, filepath, filename):
    """Default 2σ bounds (reference: exporter.go:94-96)."""
    return CSVExporter(headers, filepath, filename, covar_bound=2.0)


def read_csv(path):
    """Read a CSV written by CSVExporter (or any comment-prefixed
    numeric CSV): returns (headers, data [rows, cols] float array).

    The reference's examples consume pre-recorded CSV inputs
    (examples/jerkcar reads measurement files); this is the matching
    ingest utility — `#` comment lines are skipped, the first
    non-comment line is the header.
    """
    import numpy as np

    headers = None
    rows = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if headers is None:
                headers = line.split(",")
                continue
            rows.append([float(v) for v in line.split(",")])
    return headers, np.asarray(rows)
