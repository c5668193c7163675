"""End-to-end orbit determination example.

The full statOD workflow the reference needs an external library for
(its hybrid/SRIF tests import the `smd` propagator): propagate a LEO
truth orbit (two-body + J2), generate range/range-rate measurements
from three ground stations with visibility masking, then estimate the
orbit four ways — hybrid CKF, EKF (with mid-arc trigger), SRIF, and
iterated batch least squares — and compare RMS errors.

Run:  python examples/orbit_determination.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Orbit determination needs float64: ECI positions are ~7e3 km while the
# measurements resolve 1e-3 km — a 1e-7 relative scale right at float32's
# precision floor.  (The filters themselves run fine in f32 on deviation
# coordinates; it is the absolute trajectory/STM propagation that needs
# the headroom.)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import gokalman_tpu as gk
from gokalman_tpu import od
from gokalman_tpu.dynamics import elements, propagate, stations
from gokalman_tpu.dynamics.propagate import MeasurementSet


def main(outdir="."):
    os.makedirs(outdir, exist_ok=True)
    # Truth orbit: 7000 km LEO (the srif_test.go:73 scenario).
    r, v = elements.oe_to_rv(
        7000.0, 0.001, jnp.deg2rad(30.0), jnp.deg2rad(80.0), jnp.deg2rad(40.0), 0.0
    )
    x0_truth = jnp.concatenate([r, v])
    sts = (
        stations.new_station(-35.398333, 148.981944, 0.0, 10.0),  # Canberra
        stations.new_station(40.427222, -4.250556, 0.0, 10.0),  # Madrid
        stations.new_station(35.247164, -116.795, 0.0, 10.0),  # Goldstone
    )
    dt, steps = 10.0, 8640  # 24 h
    traj = propagate.propagate(x0_truth, dt, steps, degree=2, with_stm=False)

    # Noisy measurements: 1 m range, 1 mm/s range-rate.
    sqrt_r = jnp.diag(jnp.array([1e-3, 1e-6]))
    ms = propagate.generate_measurements(
        sts, traj, key=jax.random.PRNGKey(0), sqrt_r=sqrt_r
    )
    has = np.asarray(ms.has_meas)
    # Start the OD arc at the first measurement (the epoch state is the
    # step before it, so the first pass must not be step 0).
    first = max(int(np.argmax(has)), 1)
    print(f"{has.sum()} measurements over {steps} steps; first pass at step {first}")

    sl = slice(first, steps)
    ms = MeasurementSet(ms.obs[sl], ms.htildes[sl], ms.has_meas[sl], ms.station_idx[sl])
    t0 = float(traj.times[first - 1])
    truth = traj.states[sl]

    # Initial orbit estimate: 100 m / 0.1 mm/s off the truth.
    pert = jnp.array([0.08, -0.05, 0.03, 1e-7, -1e-7, 5e-8])
    x0_ref = traj.states[first - 1] + pert
    p0 = jnp.diag(jnp.array([1.0, 1.0, 1.0, 1e-6, 1e-6, 1e-6]))
    noise = gk.noise.noiseless(jnp.zeros((3, 3)), sqrt_r @ sqrt_r)

    results = {}
    results["CKF"] = od.run_hybrid_od(
        x0_ref, p0, noise, ms, dt, stations_list=sts, degree=2, t0=t0
    )
    results["EKF"] = od.run_hybrid_od(
        x0_ref, p0, noise, ms, dt, stations_list=sts, degree=2, t0=t0,
        ekf_mask=jnp.cumsum(ms.has_meas) > 30,
    )
    results["SRIF"] = od.run_srif_od(
        x0_ref, p0, noise, ms, dt, stations_list=sts, degree=2, t0=t0
    )
    for name, res in results.items():
        pos, vel = od.rms_errors(res, truth)
        print(f"{name:5s} tail RMS: position {float(pos)*1e3:8.3f} m, "
              f"velocity {float(vel)*1e6:8.3f} mm/s")

    x0_est, p0_batch, rms = od.run_batch_od(
        x0_ref, noise, ms, dt, stations_list=sts, degree=2, t0=t0, iterations=3
    )
    err = np.asarray(x0_est - traj.states[first - 1])
    print(f"Batch epoch error: position {np.linalg.norm(err[:3])*1e3:.3f} m, "
          f"velocity {np.linalg.norm(err[3:])*1e6:.3f} mm/s "
          f"(residual RMS per iteration: {np.asarray(rms).round(6)})")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 5))
        hrs = np.asarray(traj.times[first:]) / 3600.0
        for name, res in results.items():
            e = np.linalg.norm(
                np.asarray(res.est_states)[:, :3] - np.asarray(truth)[:, :3], axis=1
            )
            ax.semilogy(hrs, np.maximum(e * 1e3, 1e-4), label=name, lw=1)
        sig = np.sqrt(
            np.trace(np.asarray(results["EKF"].covariances)[:, :3, :3], axis1=1, axis2=2)
        )
        ax.semilogy(hrs, 2 * sig * 1e3, "k--", lw=1, label="EKF 2σ")
        pass_times = hrs[np.asarray(ms.has_meas)]
        ax.plot(pass_times, np.full_like(pass_times, 1e-4), "|", color="gray",
                label="measurements")
        ax.set_xlabel("hours")
        ax.set_ylabel("position error [m]")
        ax.set_title("Orbit determination: position error vs truth")
        ax.legend()
        fig.tight_layout()
        out = os.path.join(outdir, "orbit_determination.png")
        fig.savefig(out, dpi=110)
        print(f"wrote {out}")
    except ImportError:
        pass


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
