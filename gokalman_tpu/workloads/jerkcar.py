"""The reference's flagship linear workload: the jerk-car.

Faithful rebuild of the system in examples/jerkcar/main.go:92-131 —
a 4-state car model (position, velocity, acceleration, sensor bias)
driven by a recorded control stream, measured by an acceleration+bias
sensor H2 = [0,0,1,1] on every step and *additionally* by a position
sensor (H1, 2x4) on every 10th step.  The reference mutates H and R
mid-stream (main.go:141-158); here the time-varying measurement model
is the padded (hs, rs, masks) schedule consumed by the filters' `run`.

The reference ships the recorded inputs (uvec.csv, yacchist.csv,
yposhist.csv) and the Go filters' committed golden outputs
(vanilla.csv / information.csv / sqrt.csv); `load_inputs` /
`load_golden` ingest them so tests can assert row-level parity against
actual gonum output (see tests/test_jerkcar_golden.py).
"""

from __future__ import annotations

import os

import numpy as np

#: Default location of the reference's recorded jerkcar CSVs.
REFERENCE_DIR = "/root/reference/examples/jerkcar"

# System matrices, examples/jerkcar/main.go:94-109 (dt = 0.01).
F = np.array(
    [
        [1.0, 0.01, 0.00005, 0.0],
        [0.0, 1.0, 0.01, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0005125020836],
    ]
)
G = np.array([[0.0], [0.0001], [0.01], [0.0]])
H1 = np.array([[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0]])  # pos + (acc+bias)
H2 = np.array([[0.0, 0.0, 1.0, 1.0]])  # acc+bias only
Q = 1e-3 * np.array(
    [
        [0.0000000000025, 0.000000000625, 0.000000083333333, 0.0],
        [0.000000000625, 0.000000166666667, 0.000025, 0.0],
        [0.000000083333333, 0.000025, 0.005, 0.0],
        [0.0, 0.0, 0.0, 0.530265088355421],
    ]
)
R = np.array([[0.5, 0.0], [0.0, 0.05]])  # every-10th-step R (main.go:102)
RA = np.array([[0.05]])  # acceleration-only R (main.go:104)
X0 = np.array([0.0, 0.45, 0.0, 0.09])
P0 = 10.0 * np.eye(4)


def load_inputs(dirpath: str = REFERENCE_DIR):
    """Read the recorded (uvec, yacc, ypos) streams (main.go:17-68).

    uvec.csv is one control value per line; yacchist.csv / yposhist.csv
    are single-line comma-separated histories.  NaN entries map to 0
    (main.go:58-60; ypos is NaN except on the every-10th-step indices
    where it is actually consumed).
    """
    def _read_flat(name):
        with open(os.path.join(dirpath, name)) as fh:
            vals = [
                float(v)
                for line in fh
                for v in line.strip().split(",")
                if v.strip()
            ]
        return np.nan_to_num(np.asarray(vals), nan=0.0)

    uvec = _read_flat("uvec.csv")
    yacc = _read_flat("yacchist.csv")
    ypos = _read_flat("yposhist.csv")
    return uvec, yacc, ypos


def load_golden(dirpath: str = REFERENCE_DIR, name: str = "vanilla"):
    """Read a committed Go output CSV into (states [T,4], bounds [T,4]).

    The Go CSVExporter writes value, +2sigma, -2sigma per component
    (exporter.go:34-45) with a comment + header line; rows are est0
    followed by one row per Update.
    """
    from ..exporter import read_csv

    _, data = read_csv(os.path.join(dirpath, f"{name}.csv"))
    states = data[:, 0::3]
    bounds = data[:, 1::3]
    return states, bounds


def schedule(yacc, ypos, uvec, info_rinv_quirk: bool = False):
    """Build the padded time-varying (ys, controls, hs, rs, masks).

    Every step measures acceleration+bias through H2; every 10th step
    ((k+1) % 10 == 0) additionally measures position through H1 with
    the 2x2 R (main.go:141-158).  Padded to p=2 with row-validity
    masks; on 1-measurement steps row 0 carries the H2 measurement.

    info_rinv_quirk mirrors a genuine reference bug needed for
    golden-output parity: Information.SetNoise (information.go:136-138)
    never refreshes the cached Rinv, so the Go information filter uses
    the scalar 1/0.05 = 20 for *both* rows of the 2-measurement steps
    (the 1x1-Rinv special case at information.go:198-203 scales the
    whole 2x4 H^T by 20).  With the quirk on, the 2-measurement rs are
    diag(0.05, 0.05) instead of diag(0.5, 0.05).
    """
    yacc = np.asarray(yacc)
    t = yacc.shape[0]
    k = np.arange(t)
    two = (k + 1) % 10 == 0  # [T] bool: position row present

    h_one = np.zeros((2, 4))
    h_one[0] = H2[0]
    hs = np.where(two[:, None, None], H1, h_one)

    r_two = np.diag([0.05, 0.05]) if info_rinv_quirk else R
    r_one = np.diag([0.05, 1.0])
    rs = np.where(two[:, None, None], r_two, r_one)

    masks = np.stack([np.ones(t, bool), two], axis=1)

    ys = np.where(two[:, None],
                  np.stack([np.asarray(ypos)[:t], yacc], axis=1),
                  np.stack([yacc, np.zeros(t)], axis=1))
    controls = np.asarray(uvec)[:t, None]
    return ys, controls, hs, rs, masks
