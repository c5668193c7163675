"""Row-level parity against the Go reference's committed outputs.

The reference ships the complete jerkcar workload on disk: recorded
inputs (uvec.csv, yacchist.csv, yposhist.csv) and the gonum filters'
golden outputs vanilla.csv / information.csv / sqrt.csv
(/root/reference/examples/jerkcar/, produced by
examples/jerkcar/main.go:60-160).  These tests run the exact reference
system — F with the 1.0005125020836 bias-decay term, the uvec control
stream, H2=[0,0,1,1] every step plus H1 (2x4) every 10th step — through
our vanilla / information / square-root filters as ONE padded
time-varying scan each, and assert per-row agreement of every state
component and every 2-sigma bound with the committed Go CSVs.

Golden values are printed with %f (6 decimals), so the attainable
tolerance is the 5e-7 print-rounding floor; we assert 2e-6.

Two genuine Go quirks must be (and are) mirrored for this to hold:
- information: SetNoise never refreshes the cached Rinv
  (information.go:136-138), and estimate covariances are zeroed while
  cond_1 > 1e16 (information.go:278-293 via mat64.Inverse);
- square-root: the time update carries the *upper* QR factor
  (squareroot.go:179-185) — see sqrt.time_update_factor(go_upper=True).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gokalman_tpu import noise as gnoise
from gokalman_tpu.filters import information, sqrt as sqrtf, vanilla
from gokalman_tpu.workloads import jerkcar as jc

pytestmark = pytest.mark.skipif(
    not os.path.isdir(jc.REFERENCE_DIR),
    reason="reference jerkcar CSVs not available",
)

TOL = 2e-6  # golden files print %f: 5e-7 rounding + algebra-order slack


def _diag_bounds(cov):
    n = cov.shape[-1]
    return 2.0 * np.sqrt(np.maximum(cov[:, np.arange(n), np.arange(n)], 0.0))


@pytest.fixture(scope="module")
def streams():
    uvec, yacc, ypos = jc.load_inputs()
    assert len(yacc) == 2000 and len(ypos) == 2000
    return uvec, yacc, ypos


def test_vanilla_matches_go_golden(streams):
    ys, us, hs, rs, masks = jc.schedule(streams[1], streams[2], streams[0])
    gold_x, gold_b = jc.load_golden(name="vanilla")

    model, state = vanilla.new(jc.X0, jc.P0, jc.F, jc.G, jc.H1,
                               gnoise.noiseless(jc.Q, jc.R))
    _, ests = jax.jit(lambda m, s: vanilla.run(
        m, s, measurements=jnp.asarray(ys), controls=jnp.asarray(us),
        hs=jnp.asarray(hs), rs=jnp.asarray(rs),
        meas_masks=jnp.asarray(masks)))(model, state)

    # Row 0 is est0 = (x0, P0) (main.go:108-115).
    np.testing.assert_allclose(gold_x[0], jc.X0, atol=TOL)
    np.testing.assert_allclose(gold_b[0], 2 * np.sqrt(np.diag(jc.P0)), atol=TOL)
    np.testing.assert_allclose(np.asarray(ests.state), gold_x[1:], atol=TOL)
    np.testing.assert_allclose(
        _diag_bounds(np.asarray(ests.covariance)), gold_b[1:], atol=TOL)


def test_sqrt_matches_go_golden(streams):
    ys, us, hs, rs, masks = jc.schedule(streams[1], streams[2], streams[0])
    gold_x, gold_b = jc.load_golden(name="sqrt")

    q, r = jnp.asarray(jc.Q), jnp.asarray(jc.R)
    noise = gnoise.Noise(q, r, jnp.linalg.cholesky(q), jnp.linalg.cholesky(r))
    model, state = sqrtf.new(jc.X0, jc.P0, jc.F, jc.G, jc.H1, noise)
    _, ests = jax.jit(lambda m, s: sqrtf.run(
        m, s, measurements=jnp.asarray(ys), controls=jnp.asarray(us),
        hs=jnp.asarray(hs), rs=jnp.asarray(rs), meas_masks=jnp.asarray(masks),
        go_upper_pred_factor=True))(model, state)

    np.testing.assert_allclose(np.asarray(ests.state), gold_x[1:], atol=TOL)
    np.testing.assert_allclose(
        _diag_bounds(np.asarray(ests.covariance)), gold_b[1:], atol=TOL)


def test_information_matches_go_golden(streams):
    # info_rinv_quirk: the Go filter keeps the scalar Rinv = 1/0.05
    # for the 2-measurement steps (information.go:136-138, 198-203).
    ys, us, hs, rs, masks = jc.schedule(streams[1], streams[2], streams[0],
                                        info_rinv_quirk=True)
    gold_x, gold_b = jc.load_golden(name="information")

    model, state = information.new(np.zeros(4), np.zeros((4, 4)),
                                   jc.F, jc.G, jc.H2,
                                   gnoise.noiseless(jc.Q, jc.RA))
    _, ests = jax.jit(lambda m, s: information.run(
        m, s, measurements=jnp.asarray(ys), controls=jnp.asarray(us),
        hs=jnp.asarray(hs), rs=jnp.asarray(rs),
        meas_masks=jnp.asarray(masks)))(model, state)

    cov = np.asarray(ests.covariance)
    states = np.einsum("tij,tj->ti", cov, np.asarray(ests.info_state))

    # The Go information CSV stays exactly zero until the information
    # matrix clears gonum's cond_1 <= 1e16 gate at step 20; the gate is
    # part of the parity check.
    first = np.nonzero(gold_x[1:].any(axis=1))[0][0]
    assert first == 19 and not states[:first].any()
    np.testing.assert_allclose(states, gold_x[1:], atol=TOL)
    np.testing.assert_allclose(_diag_bounds(cov), gold_b[1:], atol=TOL)


def test_sqrt_correct_mode_differs_from_go_quirk(streams):
    """The default (correct) time update must NOT reproduce the Go
    quirk: its P^- is the true F P F^T + Q, the quirk's is U U^T."""
    ys, us, hs, rs, masks = jc.schedule(streams[1], streams[2], streams[0])
    q, r = jnp.asarray(jc.Q), jnp.asarray(jc.R)
    noise = gnoise.Noise(q, r, jnp.linalg.cholesky(q), jnp.linalg.cholesky(r))
    model, state = sqrtf.new(jc.X0, jc.P0, jc.F, jc.G, jc.H1, noise)
    run = lambda quirk: jax.jit(lambda m, s: sqrtf.run(
        m, s, measurements=jnp.asarray(ys[:50]), controls=jnp.asarray(us[:50]),
        hs=jnp.asarray(hs[:50]), rs=jnp.asarray(rs[:50]),
        meas_masks=jnp.asarray(masks[:50]),
        go_upper_pred_factor=quirk))(model, state)[1]
    correct, quirky = run(False), run(True)
    # Correct mode agrees with the vanilla CKF covariance algebra.
    vmodel, vstate = vanilla.new(jc.X0, jc.P0, jc.F, jc.G, jc.H1,
                                 gnoise.noiseless(jc.Q, jc.R))
    _, vests = jax.jit(lambda m, s: vanilla.run(
        m, s, measurements=jnp.asarray(ys[:50]), controls=jnp.asarray(us[:50]),
        hs=jnp.asarray(hs[:50]), rs=jnp.asarray(rs[:50]),
        meas_masks=jnp.asarray(masks[:50])))(vmodel, vstate)
    np.testing.assert_allclose(np.asarray(correct.covariance),
                               np.asarray(vests.covariance), atol=1e-9)
    assert np.abs(np.asarray(quirky.covariance)
                  - np.asarray(vests.covariance)).max() > 1e-3
