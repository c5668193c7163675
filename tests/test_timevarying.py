"""Time-varying measurement model tests (the jerkcar workload:
examples/jerkcar/main.go:94-105, 136-161 switches between a 1x4 and a
2x4 H with matching R every 10th step).  Static shapes are kept by
padding to the max measurement size with per-row validity masks; parity
is checked against a float64 numpy loop using the true varying shapes.
"""

import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import information, sqrt as sr, vanilla

from fixtures import random_spd


def _jerkcar_like(rng):
    """4-state car (jerk + bias) style system."""
    dt = 0.1
    n = 4
    f = np.eye(n)
    f[0, 1] = dt
    f[1, 2] = dt
    f[2, 3] = 0.5 * dt
    q = random_spd(rng, n, 1e-4)
    h1 = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0]])  # 2x4 (every 10th step)
    h2 = np.array([[1.0, 0, 0, 0]])  # 1x4 (normal steps)
    r1 = np.diag([0.25, 0.5])
    r2 = np.array([[0.25]])
    x0 = rng.standard_normal(n)
    p0 = random_spd(rng, n, 1.0)
    return f, q, h1, h2, r1, r2, x0, p0


def _numpy_varying(f, q, h1, h2, r1, r2, x0, p0, ys_full, steps):
    """Reference float64 loop with true 1x4 / 2x4 shapes."""
    x = np.asarray(x0, float)
    p = np.asarray(p0, float)
    out = []
    for k in range(steps):
        full = k % 10 == 0
        h = h1 if full else h2
        r = r1 if full else r2
        y = ys_full[k][: h.shape[0]]
        xm = f @ x
        pm = f @ p @ f.T + q
        s = h @ pm @ h.T + r
        kk = pm @ h.T @ np.linalg.inv(s)
        x = xm + kk @ (y - h @ xm)
        ikh = np.eye(4) - kk @ h
        p = ikh @ pm @ ikh.T + kk @ r @ kk.T
        out.append((x.copy(), 0.5 * (p + p.T)))
    return out


def _padded_inputs(h1, h2, r1, r2, ys_full, steps):
    hs, rs, masks = [], [], []
    for k in range(steps):
        if k % 10 == 0:
            hs.append(h1)
            rs.append(r1)
            masks.append([True, True])
        else:
            hs.append(np.vstack([h2, np.zeros((1, 4))]))
            r = np.zeros((2, 2))
            r[:1, :1] = r2
            rs.append(r)
            masks.append([True, False])
    return (
        jnp.asarray(np.stack(hs)),
        jnp.asarray(np.stack(rs)),
        jnp.asarray(np.asarray(masks)),
    )


def test_vanilla_matches_varying_shapes():
    rng = np.random.default_rng(55)
    f, q, h1, h2, r1, r2, x0, p0 = _jerkcar_like(rng)
    steps = 40
    ys_full = rng.standard_normal((steps, 2))
    ref = _numpy_varying(f, q, h1, h2, r1, r2, x0, p0, ys_full, steps)
    hs, rs, masks = _padded_inputs(h1, h2, r1, r2, ys_full, steps)

    nz = gn.noiseless(jnp.asarray(q), jnp.asarray(r1))
    model, state = vanilla.new(
        jnp.asarray(x0), jnp.asarray(p0), jnp.asarray(f), None, jnp.asarray(h1), nz
    )
    _, ests = vanilla.run(
        model, state, measurements=jnp.asarray(ys_full),
        hs=hs, rs=rs, meas_masks=masks,
    )
    for k in (0, 1, 9, 10, 11, 39):
        np.testing.assert_allclose(
            np.asarray(ests.state[k]), ref[k][0], rtol=1e-9, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(ests.covariance[k]), ref[k][1], rtol=1e-9, atol=1e-12
        )


def test_three_filters_agree_time_varying():
    """The jerkcar example runs Vanilla/Information/SquareRoot
    side-by-side on the same stream (examples/jerkcar/main.go:133-161):
    all three must produce the same posterior."""
    rng = np.random.default_rng(56)
    f, q, h1, h2, r1, r2, x0, p0 = _jerkcar_like(rng)
    steps = 30
    ys_full = rng.standard_normal((steps, 2))
    hs, rs, masks = _padded_inputs(h1, h2, r1, r2, ys_full, steps)
    ys = jnp.asarray(ys_full)

    q = q + 1e-9 * np.eye(4)  # PD for the sqrt filter's chol(Q)
    nz = gn.awgn(jnp.asarray(q), jnp.asarray(r1))
    nz = gn.Noise(jnp.asarray(q), jnp.asarray(r1), nz.sqrt_q, nz.sqrt_r)

    vm, vs = vanilla.new(jnp.asarray(x0), jnp.asarray(p0), jnp.asarray(f), None, jnp.asarray(h1), nz)
    im, ist = information.new_from_state(jnp.asarray(x0), jnp.asarray(p0), jnp.asarray(f), None, jnp.asarray(h1), nz)
    sm, sst = sr.new(jnp.asarray(x0), jnp.asarray(p0), jnp.asarray(f), None, jnp.asarray(h1), nz)

    _, ve = vanilla.run(vm, vs, measurements=ys, hs=hs, rs=rs, meas_masks=masks)
    _, ie = information.run(im, ist, ys, hs=hs, rs=rs, meas_masks=masks)
    _, se = sr.run(sm, sst, ys, hs=hs, rs=rs, meas_masks=masks)

    np.testing.assert_allclose(
        np.asarray(ie.state), np.asarray(ve.state), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(se.state), np.asarray(ve.state), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(se.covariance), np.asarray(ve.covariance), rtol=1e-6, atol=1e-9
    )
