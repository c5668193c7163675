"""Closed-loop spacecraft statOD example.

Rebuild of the reference's statOD5044 example (reference:
examples/statOD5044/main.go): a 4-state linearized orbital deviation
system (dr, dr_dot, dtheta, dtheta_dot) with a feedback controller
folded into the dynamics (Fcl = F - G T, main.go:44-50); truth comes
from a pure-predictor AWGN filter; 15 Monte-Carlo runs with and without
control are exported; vanilla / information / square-root filters track
the truth measurements and NEES/NIS consistency is computed.

Run:  python examples/statod.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import gokalman_tpu as gk


def system():
    dt = 0.1
    f = jnp.array(
        [
            [1.0, 0.1, 0.0, 7.726e-2],
            [4.015e-7, 1.0, 0.0, 1.545],
            [-2.319e-16, -1.732e-9, 1.0, 0.1],
            [-6.956e-15, -3.465e-8, 0.0, 1.0],
        ]
    )
    g = jnp.array(
        [
            [5e-3, 3.85e-7],
            [0.1, 1.157e-5],
            [-5.775e-11, 7.487e-7],
            [1.732e-9, 1.498e-5],
        ]
    )
    h = jnp.array([[1.0, 0, 0, 0], [0.0, 0, 1.0, 0]])
    q = jnp.array(
        [
            [6.669e-16, 1.001e-14, 3.823e-19, 5.150e-18],
            [1.001e-14, 2.002e-13, 1.030e-17, 1.545e-16],
            [3.862e-19, 1.030e-17, 6.667e-19, 1.000e-17],
            [5.150e-18, 1.545e-16, 1.000e-17, 2.000e-16],
        ]
    )
    r = jnp.diag(jnp.array([2e-3, 2e-5])) / dt
    # LQR-style feedback gain; closed loop Fcl = F - G T.
    t_gain = jnp.array(
        [
            [0.930124736616832, 1.395260337125255, -0.000008568056356, 15.440297905873823],
            [0.000001749639349, 0.000000859493456, 0.001999922457941, 5.177881640687808],
        ]
    )
    fcl = f - g @ t_gain
    x0 = jnp.array([2.0, 0.5, 0.0, 0.0])
    p0 = jnp.diag(jnp.array([5.0, 1.0, 0.01, 0.00001]))
    return f, g, h, q, r, fcl, x0, p0


def main(outdir="."):
    f, g, h, q, r, fcl, x0, p0 = system()
    q = gk.linalg.sym(q)
    sc_period = 5.431e3
    samples = int((sc_period / 50) / 0.1)  # ~1086 steps
    num_mc = 15
    headers = ["dr", "dr_dot", "dtheta", "dtheta_dot"]
    noise = gk.noise.awgn(q, r)

    # Monte Carlo without control (open loop) and with control (Fcl).
    for tag, fmat in [("noctrl", f), ("ctrl", fcl)]:
        model, state0 = gk.vanilla.new(x0, p0, fmat, None, h, noise)
        runs = gk.montecarlo.monte_carlo(
            model, state0, samples=num_mc, steps=samples, key=jax.random.PRNGKey(1)
        )
        for name, blob in zip(headers, runs.as_csv(headers)):
            with open(os.path.join(outdir, f"mc-{tag}-{name}.csv"), "w") as fh:
                fh.write(blob)

    # Truth: one pure-predictor AWGN run of the closed-loop system.
    model_cl, state0_cl = gk.vanilla.new(x0, p0, fcl, None, h, noise)
    _, truth_ests = gk.vanilla.run(
        model_cl, state0_cl, steps=samples, key=jax.random.PRNGKey(2),
        prediction_only=True,
    )
    truth = gk.truth.BatchGroundTruth(truth_ests.state, truth_ests.measurement)
    with gk.exporter.CSVExporter(headers, outdir, "truth.csv", 2.0) as e:
        e.write_all(truth_ests)

    # Track the truth measurements with three filters; export error traces.
    nz = gk.noise.noiseless(q, r)
    ys = truth_ests.measurement
    for name in ("vanilla", "information", "sqrt"):
        if name == "vanilla":
            model, st = gk.vanilla.new(x0, p0, fcl, None, h, nz)
            _, ests = gk.vanilla.run(model, st, measurements=ys)
        elif name == "information":
            model, st = gk.information.new_from_state(x0, p0, fcl, None, h, nz)
            _, ests = gk.information.run(model, st, ys)
        else:
            model, st = gk.sqrt.new(x0, p0, fcl, None, h, noise)
            _, ests = gk.sqrt.run(model, st, ys)
        err = gk.truth.error_all(truth, gk.vanilla.Estimate(
            state=ests.state,
            measurement=ests.measurement,
            innovation=ests.innovation,
            covariance=ests.covariance,
            pred_covariance=ests.pred_covariance,
            gain=getattr(ests, "gain", jnp.zeros_like(ests.state[..., None])),
        ))
        with gk.exporter.CSVExporter(headers, outdir, f"{name}.csv", 2.0) as e:
            e.write_all(err)
        rms = float(jnp.sqrt(jnp.mean(err.state[samples // 2 :, 0] ** 2)))
        print(f"{name:12s} dr error RMS (tail): {rms:.3e}")

    # Chi-square consistency of the closed-loop CKF.
    model_mc, st_mc = gk.vanilla.new(x0, p0, fcl, None, h, noise)
    runs = gk.montecarlo.monte_carlo(
        model_mc, st_mc, samples=num_mc, steps=200, key=jax.random.PRNGKey(3)
    )
    nis, nees = gk.chisquare.chi_square(model_mc, st_mc, runs)
    # Lagged reference semantics inflate NEES (see examples/robot.py).
    print(f"NEES mean (lagged reference semantics): {float(jnp.mean(nees[50:])):.2f}")
    print(f"NIS mean  (expect ~2): {float(jnp.mean(nis[50:])):.2f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
