"""2-state robot Monte-Carlo + chi-square example.

Rebuild of the reference's robot example (reference:
examples/robot/main.go): a 1-D robot (position, velocity) with a
sinusoidal acceleration command, 50 Monte-Carlo runs x 120 steps of the
pure-predictor truth, then NEES/NIS consistency of the CKF — all as two
fused device computations instead of the Go loop nest.

Run:  python examples/robot.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import gokalman_tpu as gk


def main(outdir="."):
    os.makedirs(outdir, exist_ok=True)
    dt = 0.1
    f = jnp.array([[1.0, dt], [0.0, 1.0]])
    g = jnp.array([[0.5 * dt * dt], [dt]])
    h = jnp.array([[1.0, 0.0]])
    r = jnp.array([[0.05]])
    q = jnp.array([[5e-2, 5e-4], [5e-4, 1e-3]])
    x0 = jnp.zeros(2)
    p0 = 2.0 * jnp.eye(2)

    steps, sims = 120, 50
    controls = jnp.cos(0.75 * jnp.arange(1, steps + 1) * dt)[:, None]

    model, state0 = gk.vanilla.new(x0, p0, f, g, h, gk.noise.awgn(q, r))
    # init_spread: each run's x0 ~ N(x0, P0), the reference's per-run
    # distmv draw (examples/robot/main.go:29-31).
    runs = gk.montecarlo.monte_carlo(
        model, state0, samples=sims, steps=steps,
        key=jax.random.PRNGKey(0), controls=controls, init_spread=True,
    )
    headers = ["xi", "xi_dot"]
    for name, blob in zip(headers, runs.as_csv(headers)):
        with open(os.path.join(outdir, f"montecarlo-{name}.csv"), "w") as fh:
            fh.write(blob)

    nis, nees = gk.chisquare.chi_square(model, state0, runs, controls=controls)
    with open(os.path.join(outdir, "chisquare.csv"), "w") as fh:
        fh.write("NIS,NEES\n")
        for a, b in zip(nis.tolist(), nees.tolist()):
            fh.write(f"{a:f},{b:f}\n")
    # NOTE: the reference's Monte-Carlo records its measurement from the
    # *pre-predict* state (vanilla.go:155-157), so the replayed filter
    # sees a one-step-lagged measurement; with a control input this
    # inflates NEES above the state dimension.  The fused pipeline
    # (gk.ops.ensemble.mc_chi_square with lagged_measurements=False)
    # implements the calibrated variant where NEES -> n exactly.
    nees_mean = float(jnp.mean(nees[20:]))
    # Under the mirrored lag the NEES does NOT calibrate to n=2: the
    # unmodeled one-step measurement delay with this control schedule
    # inflates it to ~4.7 (empirical, seed-stable; without controls it
    # calibrates to n — tests/test_montecarlo.py pins 1.6-2.4).  Gate
    # at a band around the pinned inflated value so regressions in the
    # MC/replay plumbing still trip.
    nees_ok = 3.5 < nees_mean < 6.0
    print(f"NEES mean (lagged reference semantics): {nees_mean:.3f} "
          f"(expect ~4.7, NOT n=2 — one-step measurement lag + control; "
          f"band gate [3.5, 6.0] -> {'PASS' if nees_ok else 'FAIL'})")
    print(f"NIS mean  (expect ~1): {float(jnp.mean(nis[20:])):.3f}")
    # Formal gate: exact chi-square acceptance interval for the NIS
    # time-average (diagnostics toolkit, Bar-Shalom ch.5).
    mean, lo, hi, ok = gk.diagnostics.nees_test(nis[20:], dof=1)
    print(f"NIS chi-square gate: {float(mean):.3f} in [{lo:.3f}, {hi:.3f}] "
          f"-> {'PASS' if bool(ok) else 'FAIL'}")

    # PNG gallery (the reference commits Kst-rendered plots; here they
    # are generated on the fly when matplotlib is available).
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np

        fig, axes = plt.subplots(1, 3, figsize=(14, 4))
        states = np.asarray(runs.estimates.state)  # [S, T, 2]
        for r_ in range(min(sims, 25)):
            axes[0].plot(states[r_, :, 0], lw=0.5, alpha=0.4)
        mean = np.asarray(runs.mean())
        dev = np.asarray(runs.stddev())
        axes[0].plot(mean[:, 0], "k", lw=2, label="ensemble mean")
        axes[0].fill_between(
            range(steps), mean[:, 0] - 2 * dev[:, 0], mean[:, 0] + 2 * dev[:, 0],
            alpha=0.2, color="k", label="±2σ",
        )
        axes[0].set_title("Monte-Carlo position ensemble")
        axes[0].legend()
        axes[1].plot(np.asarray(nees), label="NEES")
        axes[1].axhline(2.0, color="k", ls="--", label="n = 2")
        axes[1].set_title("NEES")
        axes[1].legend()
        axes[2].plot(np.asarray(nis), label="NIS")
        axes[2].axhline(1.0, color="k", ls="--", label="p = 1")
        axes[2].set_title("NIS")
        axes[2].legend()
        fig.tight_layout()
        fig.savefig(os.path.join(outdir, "robot.png"), dpi=110)
        print(f"wrote {os.path.join(outdir, 'robot.png')}")
    except ImportError:
        pass


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
