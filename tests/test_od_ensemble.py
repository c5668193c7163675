"""Constellation OD: the whole orbit-determination harness vmaps over a
batch of spacecraft (pure functions all the way down) — the scaling
axis the reference's goroutine pipeline cannot express."""

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu import od
from gokalman_tpu.dynamics import elements, propagate, stations
from gokalman_tpu.dynamics.propagate import MeasurementSet


def test_vmapped_constellation_od():
    # Four spacecraft: same orbit, staggered true anomaly.
    nus = jnp.deg2rad(jnp.array([0.0, 5.0, 10.0, 15.0]))
    x0s = []
    for nu in nus:
        r, v = elements.oe_to_rv(
            7000.0, 0.001, jnp.deg2rad(45.0), jnp.deg2rad(30.0),
            jnp.deg2rad(10.0), nu,
        )
        x0s.append(jnp.concatenate([r, v]))
    x0s = jnp.stack(x0s)  # [B, 6]

    sts = (
        stations.new_station(-35.398333, 148.981944, 0.0, 10.0),
        stations.new_station(40.427222, -4.250556, 0.0, 10.0),
        stations.new_station(35.247164, -116.795, 0.0, 10.0),
    )
    dt, steps = 10.0, 2160  # 6 h; the i=45 deg orbit passes early

    trajs = jax.vmap(
        lambda x0: propagate.propagate(x0, dt, steps, degree=2, with_stm=False)
    )(x0s)
    mss = jax.vmap(lambda t: propagate.generate_measurements(sts, t))(trajs)
    counts = np.asarray(jnp.sum(mss.has_meas, axis=1))
    assert np.all(counts > 0), counts  # every spacecraft gets tracked

    p0 = jnp.diag(jnp.array([50.0, 50.0, 50.0, 1.0, 1.0, 1.0]))
    noise = gn.noiseless(jnp.zeros((3, 3)), jnp.diag(jnp.array([1e-6, 1e-6])))
    perts = 1e-3 * jnp.arange(1, 5)[:, None] * jnp.array([1.0, -1, 1, 0, 0, 0])

    def one(x0, ms):
        return od.run_hybrid_od(
            x0, p0, noise, ms, dt, stations_list=sts, degree=2
        )

    results = jax.vmap(one)(x0s + perts, mss)
    assert results.est_states.shape == (4, steps, 6)

    # Batched results equal per-spacecraft runs exactly.
    single = one(x0s[2] + perts[2], jax.tree.map(lambda a: a[2], mss))
    np.testing.assert_allclose(
        np.asarray(results.est_states[2]),
        np.asarray(single.est_states),
        rtol=1e-9,
    )

    # Every spacecraft's error vs its own truth stays bounded at
    # measurement steps after its first pass.
    for b in range(4):
        err = np.asarray(results.est_states[b]) - np.asarray(trajs.states[b])
        has = np.asarray(mss.has_meas[b])
        idx = np.nonzero(has)[0]
        late = idx[len(idx) // 2 :]
        pos = np.sqrt((err[late, :3] ** 2).sum(1)).mean()
        assert pos < 1e-2, (b, pos)
