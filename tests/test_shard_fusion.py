"""Device-sharded multi-sensor fusion: S sensor streams sharded over
the 8-device CPU mesh, fused in information form with one psum per
step, must equal the CENTRAL Kalman filter on the stacked measurement
vector digit-for-digit — including per-sensor dropout masks and
controls."""

import jax
import jax.numpy as jnp
import numpy as np

import gokalman_tpu as gk
from gokalman_tpu.filters import vanilla
from gokalman_tpu.parallel import mesh as pmesh


def _system(n_sensors, seed=0, T=20):
    rng = np.random.default_rng(seed)
    dt = 0.5
    f = np.kron(np.eye(2), np.array([[1.0, dt], [0.0, 1.0]]))
    q = 0.01 * np.kron(np.eye(2), np.array(
        [[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]]))
    hs, rs = [], []
    for _ in range(n_sensors):
        hs.append(rng.standard_normal((2, 4)) * 0.5
                  + np.kron(np.eye(2), [[1.0, 0.0]]))
        a = rng.standard_normal((2, 2))
        rs.append(0.2 * (a @ a.T + 2 * np.eye(2)))
    hs, rs = np.stack(hs), np.stack(rs)
    x = np.array([1.0, 0.1, -1.0, 0.05])
    lq = np.linalg.cholesky(q)
    ys = np.zeros((n_sensors, T, 2))
    for k in range(T):
        x = f @ x + lq @ rng.standard_normal(4)
        for s_ in range(n_sensors):
            ys[s_, k] = hs[s_] @ x + np.linalg.cholesky(
                rs[s_]) @ rng.standard_normal(2)
    return f, q, hs, rs, ys


def _central(f, q, hs, rs, ys, masks=None, g=None, controls=None):
    """Stacked-measurement vanilla KF oracle."""
    s_, T, p = ys.shape
    h_big = hs.reshape(s_ * p, 4)
    r_big = np.zeros((s_ * p, s_ * p))
    for i in range(s_):
        r_big[i * p:(i + 1) * p, i * p:(i + 1) * p] = rs[i]
    y_big = np.swapaxes(ys, 0, 1).reshape(T, s_ * p)
    m, st = vanilla.new(jnp.zeros(4), jnp.eye(4), jnp.asarray(f),
                        None if g is None else jnp.asarray(g),
                        jnp.asarray(h_big),
                        gk.noise.noiseless(jnp.asarray(q),
                                           jnp.asarray(r_big)))
    if masks is None:
        _, est = vanilla.run(m, st, jnp.asarray(y_big),
                             None if controls is None
                             else jnp.asarray(controls))
        return est
    # masked: step loop with per-step stacked row masks
    rows = np.repeat(masks, p, axis=0).reshape(s_ * p, T).T  # [T, S*p]
    ests = []
    for k in range(T):
        st, e = vanilla.step(
            m, st, jnp.asarray(y_big[k]),
            None if controls is None else jnp.asarray(controls[k]),
            meas_mask=jnp.asarray(rows[k]))
        ests.append(e)
    return ests


def test_sharded_fusion_equals_central_kf():
    mesh = pmesh.ensemble_mesh()
    f, q, hs, rs, ys = _system(8)
    states, covs = pmesh.sharded_sensor_fusion_run(
        jnp.zeros(4), jnp.eye(4), f, q, hs, rs, ys, mesh)
    est = _central(f, q, hs, rs, ys)
    np.testing.assert_allclose(np.asarray(states), np.asarray(est.state),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(covs),
                               np.asarray(est.covariance), atol=1e-9)


def test_sharded_fusion_multiple_sensors_per_device_and_controls():
    mesh = pmesh.ensemble_mesh()
    f, q, hs, rs, ys = _system(16, seed=3)
    g = np.array([[0.0], [1.0], [0.0], [0.5]])
    us = 0.3 * np.sin(0.2 * np.arange(ys.shape[1]))[:, None]
    states, covs = pmesh.sharded_sensor_fusion_run(
        jnp.zeros(4), jnp.eye(4), f, q, hs, rs, ys, mesh, g=g,
        controls=us)
    est = _central(f, q, hs, rs, ys, g=g, controls=us)
    np.testing.assert_allclose(np.asarray(states), np.asarray(est.state),
                               rtol=0, atol=1e-9)


def test_sharded_fusion_sensor_dropout_masks():
    """Random per-sensor dropout (incl. whole frames with NO sensor up)
    == the central KF with the matching stacked row masks; masked
    slots poisoned with NaN to prove the jnp.where isolation."""
    mesh = pmesh.ensemble_mesh()
    f, q, hs, rs, ys = _system(8, seed=5)
    rng = np.random.default_rng(7)
    masks = rng.random((8, ys.shape[1])) < 0.7
    masks[:, 4] = False  # a dead frame
    ys_poison = np.array(ys, copy=True)
    ys_poison[~masks] = np.nan
    states, covs = pmesh.sharded_sensor_fusion_run(
        jnp.zeros(4), jnp.eye(4), f, q, hs, rs, ys_poison, mesh,
        meas_masks=masks)
    ests = _central(f, q, hs, rs, ys, masks=masks)
    central_states = np.stack([np.asarray(e.state) for e in ests])
    central_covs = np.stack([np.asarray(e.covariance) for e in ests])
    np.testing.assert_allclose(np.asarray(states), central_states,
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(covs), central_covs, atol=1e-9)


def test_sharded_fusion_validation():
    import pytest

    mesh = pmesh.ensemble_mesh()
    f, q, hs, rs, ys = _system(6)
    with pytest.raises(ValueError, match="divisible"):
        pmesh.sharded_sensor_fusion_run(jnp.zeros(4), jnp.eye(4), f, q,
                                        hs, rs, ys, mesh)
