"""Innovation gating (outlier rejection) tests — the protective version
of the reference's yacc[99]=36.295 outlier scenario."""

import jax
import jax.numpy as jnp
import numpy as np

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import vanilla

from fixtures import robot1d_matrices


def test_gate_rejects_outlier_and_protects_state():
    f, g, dt = robot1d_matrices()
    h = jnp.array([[1.0, 0.0]])
    q = jnp.array([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]]) * 0.02
    r = jnp.array([[0.25]])
    model, state0 = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h, gn.noiseless(q, r))

    rng = np.random.default_rng(7)
    t = 120
    # Truth + clean measurements, with a huge outlier at k=60.
    lq = np.linalg.cholesky(np.asarray(q))
    x = np.zeros(2)
    truth, ys = [], []
    for k in range(t):
        x = np.asarray(f) @ x + lq @ rng.standard_normal(2)
        truth.append(x.copy())
        y = x[0] + 0.5 * rng.standard_normal()
        if k == 60:
            y += 50.0  # the deliberate outlier (vanilla_test.go:61)
        ys.append([y])
    truth = np.stack(truth)
    ys = jnp.asarray(np.asarray(ys))

    _, plain = vanilla.run(model, state0, measurements=ys)
    _, gated, accepted = vanilla.run_gated(model, state0, ys, nis_gate=9.0)

    acc = np.asarray(accepted)
    assert not acc[60]  # the outlier is rejected
    assert acc[:55].mean() > 0.95  # clean data passes the gate

    # The plain filter is yanked by the outlier; the gated one is not.
    err_plain = abs(float(plain.state[60, 0]) - truth[60, 0])
    err_gated = abs(float(gated.state[60, 0]) - truth[60, 0])
    assert err_gated < err_plain / 5, (err_gated, err_plain)

    # And both recover eventually (gate does not wedge the filter).
    tail_gated = np.abs(np.asarray(gated.state[-20:, 0]) - truth[-20:, 0]).mean()
    assert tail_gated < 1.0


def test_gate_never_fires_on_clean_data():
    f, g, dt = robot1d_matrices()
    h = jnp.array([[1.0, 0.0]])
    q = jnp.array([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]]) * 0.02
    r = jnp.array([[0.25]])
    model, state0 = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h, gn.noiseless(q, r))
    key = jax.random.PRNGKey(0)
    # Consistent simulated measurements.
    _, truth_ests = vanilla.run(
        model, state0, steps=200, key=key, prediction_only=True
    )
    model_awgn, _ = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h, gn.awgn(q, r))
    _, truth_ests = vanilla.run(
        model_awgn, state0, steps=200, key=key, prediction_only=True
    )
    _, _, accepted = vanilla.run_gated(
        model, state0, truth_ests.measurement, nis_gate=16.0
    )
    assert float(jnp.mean(accepted)) > 0.97
