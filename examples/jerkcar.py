"""4-state jerk-car example with a time-varying measurement model.

Rebuild of the reference's jerkcar example (reference:
examples/jerkcar/main.go): a car with state (position, velocity,
acceleration, jerk-bias), measured by a 1x4 position sensor normally
and a 2x4 position+velocity sensor every 10th step — the reference
mutates H and R mid-stream (main.go:141-158); here the step schedule is
a padded (hs, rs, masks) input to one scan.  Vanilla, information, and
square-root filters run side-by-side on the same stream and their CSV
traces are exported with 2-sigma bounds.

Run:  python examples/jerkcar.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import gokalman_tpu as gk


def main(outdir="."):
    dt = 0.1
    n, steps = 4, 200
    f = jnp.array(
        [
            [1.0, dt, 0.5 * dt * dt, 0.0],
            [0.0, 1.0, dt, 0.0],
            [0.0, 0.0, 1.0, dt],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )
    q = 1e-6 * jnp.eye(n)
    h_full = jnp.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0]])  # every 10th step
    h_pos = jnp.array([[1.0, 0, 0, 0], [0.0, 0, 0, 0]])  # padded 1x4
    r_full = jnp.diag(jnp.array([0.25, 0.5]))
    r_pos = jnp.diag(jnp.array([0.25, 1.0]))
    x0 = jnp.zeros(n)
    p0 = jnp.diag(jnp.array([10.0, 1.0, 0.1, 0.01]))

    full_step = (jnp.arange(steps) % 10) == 0
    hs = jnp.where(full_step[:, None, None], h_full, h_pos)
    rs = jnp.where(full_step[:, None, None], r_full, r_pos)
    masks = jnp.stack([jnp.ones(steps, bool), full_step], axis=1)

    # Synthesize a truth trajectory + noisy measurements (the reference
    # reads pre-recorded CSVs; the system is the same).
    key = jax.random.PRNGKey(7)
    kw, kv = jax.random.split(key)
    lq = jnp.linalg.cholesky(q)
    truth = [jnp.array([0.0, 5.0, 0.0, 0.02])]
    for k in range(steps):
        wk = lq @ jax.random.normal(jax.random.fold_in(kw, k), (n,))
        truth.append(f @ truth[-1] + wk)
    truth = jnp.stack(truth[1:])
    vnoise = jax.vmap(
        lambda k: jnp.sqrt(jnp.diag(r_full)) * jax.random.normal(k, (2,))
    )(jax.random.split(kv, steps))
    ys = jnp.einsum("tpn,tn->tp", hs, truth) + vnoise * masks

    noise = gk.noise.awgn(q, r_full)
    filters = {
        "vanilla": gk.vanilla,
        "information": gk.information,
        "sqrt": gk.sqrt,
    }
    headers = ["x", "v", "a", "j"]
    for name, mod in filters.items():
        if mod is gk.vanilla:
            model, st = mod.new(x0, p0, f, None, h_full, noise)
            _, ests = mod.run(model, st, measurements=ys, hs=hs, rs=rs, meas_masks=masks)
        elif mod is gk.information:
            model, st = mod.new_from_state(x0, p0, f, None, h_full, noise)
            _, ests = mod.run(model, st, ys, hs=hs, rs=rs, meas_masks=masks)
        else:
            model, st = mod.new(x0, p0, f, None, h_full, noise)
            _, ests = mod.run(model, st, ys, hs=hs, rs=rs, meas_masks=masks)
        with gk.exporter.CSVExporter(headers, outdir, f"{name}.csv", 2.0) as e:
            e.write_all(ests)
        err = float(jnp.sqrt(jnp.mean((ests.state[:, 0] - truth[:, 0]) ** 2)))
        print(f"{name:12s} position RMS error: {err:.4f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
