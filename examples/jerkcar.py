"""The reference's jerkcar example, faithfully: the exact Go system
(reference: examples/jerkcar/main.go:92-161) on the exact recorded
input streams, run as ONE padded time-varying scan per filter.

State = (position, velocity, acceleration, sensor-bias); every step
measures acceleration+bias (H2 = [0,0,1,1]); every 10th step a 2x4
H1 adds a position row — the reference mutates H and R mid-stream
(main.go:141-158), here that is the (hs, rs, masks) schedule.  Vanilla,
information, and square-root filters run side-by-side and export CSV
traces with 2-sigma bounds, matching the reference's committed
vanilla.csv / information.csv / sqrt.csv row-for-row (verified at 2e-6
by tests/test_jerkcar_golden.py).

If the reference's recorded CSVs are unavailable, an equivalent input
stream is synthesized from the same system so the example still runs.

Run:  python examples/jerkcar.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# The reference is float64 gonum; run the parity example in x64 too.
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import gokalman_tpu as gk
from gokalman_tpu.workloads import jerkcar as jc


def synthesize_inputs(steps=2000, seed=7):
    """Stand-in (uvec, yacc, ypos) when the recorded CSVs are absent:
    truth from the same F/G dynamics with AWGN measurement noise."""
    key = jax.random.PRNGKey(seed)
    ku, kv = jax.random.split(key)
    uvec = 0.1 * np.asarray(jax.random.normal(ku, (steps + 1,)))
    x = np.array([0.0, 0.45, 0.0, 0.09])
    yacc, ypos = [], []
    vs = np.asarray(jax.random.normal(kv, (steps, 2)))
    for k in range(steps):
        x = jc.F @ x + jc.G[:, 0] * uvec[k]
        yacc.append(jc.H2[0] @ x + np.sqrt(0.05) * vs[k, 0])
        ypos.append(x[0] + np.sqrt(0.5) * vs[k, 1])
    return uvec, np.asarray(yacc), np.asarray(ypos)


def main(outdir="."):
    if os.path.isdir(jc.REFERENCE_DIR):
        uvec, yacc, ypos = jc.load_inputs()
        print(f"using recorded inputs from {jc.REFERENCE_DIR}")
    else:
        uvec, yacc, ypos = synthesize_inputs()
        print("reference CSVs unavailable; using synthesized inputs")

    headers = ["position", "velocity", "acceleration", "bias"]
    t = len(yacc)

    ys, us, hs, rs, masks = (jnp.asarray(a) for a in
                             jc.schedule(yacc, ypos, uvec))

    # Vanilla CKF (main.go:107-115).
    model, st = gk.vanilla.new(jc.X0, jc.P0, jc.F, jc.G, jc.H1,
                               gk.noise.noiseless(jc.Q, jc.R))
    _, vests = jax.jit(lambda m, s: gk.vanilla.run(
        m, s, measurements=ys, controls=us, hs=hs, rs=rs,
        meas_masks=masks))(model, st)

    # Square-root KF (main.go:126-131), Go-compatible upper-factor mode.
    q, r = jnp.asarray(jc.Q), jnp.asarray(jc.R)
    snoise = gk.noise.Noise(q, r, jnp.linalg.cholesky(q), jnp.linalg.cholesky(r))
    smodel, sst = gk.sqrt.new(jc.X0, jc.P0, jc.F, jc.G, jc.H1, snoise)
    _, sests = jax.jit(lambda m, s: gk.sqrt.run(
        m, s, measurements=ys, controls=us, hs=hs, rs=rs, meas_masks=masks,
        go_upper_pred_factor=True))(smodel, sst)

    # Information KF from zero information (main.go:117-124), with the
    # reference's stale-Rinv schedule (see workloads.jerkcar.schedule).
    iys, ius, ihs, irs, imasks = (jnp.asarray(a) for a in jc.schedule(
        yacc, ypos, uvec, info_rinv_quirk=True))
    imodel, ist = gk.information.new(np.zeros(4), np.zeros((4, 4)),
                                     jc.F, jc.G, jc.H2,
                                     gk.noise.noiseless(jc.Q, jc.RA))
    _, iests = jax.jit(lambda m, s: gk.information.run(
        m, s, measurements=iys, controls=ius, hs=ihs, rs=irs,
        meas_masks=imasks))(imodel, ist)

    class _Est0:  # est0 row: the Go mains push the initial estimate first
        def __init__(self, x, p):
            self.state, self.covariance = x, p

    est0 = {"vanilla": _Est0(jc.X0, jc.P0), "sqrt": _Est0(jc.X0, jc.P0),
            "information": _Est0(np.zeros(4), np.zeros((4, 4)))}
    for name, ests in (("vanilla", vests), ("sqrt", sests),
                       ("information", iests)):
        with gk.exporter.CSVExporter(headers, outdir, f"{name}.csv", 2.0) as e:
            e.write(est0[name])
            e.write_all(ests)
        x_end = np.asarray(ests.state)[-1]
        print(f"{name:12s} final state: {np.array2string(x_end, precision=4)}")
    print(f"wrote {t}-step traces to {outdir}/{{vanilla,sqrt,information}}.csv")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
