"""Pallas fused-pipeline tests (interpreter mode on CPU).

The kernel's statistics must match the XLA pipeline's: NEES ~ n,
NIS ~ p, ensemble stddev consistent with the pure-predictor covariance
growth.  On real TPU hardware the same kernel runs compiled (bench.py);
here the Mosaic interpreter checks the logic on the CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import vanilla
from gokalman_tpu.ops import pallas_mc
from gokalman_tpu.ops.ensemble import mc_chi_square


def _model6(dtype=jnp.float32):
    i3 = jnp.eye(3, dtype=dtype)
    z3 = jnp.zeros((3, 3), dtype=dtype)
    f = jnp.block([[i3, 0.1 * i3], [z3, i3]]).astype(dtype)
    q = (1e-3 * jnp.eye(6)).astype(dtype)
    h = jnp.concatenate([i3, z3], axis=1).astype(dtype)
    return vanilla.new(
        jnp.zeros(6, dtype), jnp.eye(6, dtype=dtype), f, None, h,
        gn.awgn(q, (0.5 * i3).astype(dtype)),
    )


def test_kernel_statistics_on_tpu():
    """Compiled-kernel statistics vs the XLA pipeline.  Requires real
    TPU hardware: the Mosaic *interpreter* stubs prng_random_bits to
    zeros (every Box-Muller draw becomes the constant sqrt(50 ln 2)),
    so only the compiled path exercises the RNG.  bench.py asserts the
    same NEES/NIS gates on hardware every round."""
    if jax.default_backend() in ("cpu",):
        pytest.skip("fused kernel statistics need real TPU hardware")
    model, state0 = _model6()
    steps = 12
    out = pallas_mc.mc_chi_square_pallas(
        model, state0, pallas_mc.TILE, steps, jnp.int32(3), init_spread=True
    )
    ref = jax.jit(
        lambda k: mc_chi_square(
            model, state0, pallas_mc.TILE, steps, k,
            init_spread=True, lagged_measurements=False,
        )
    )(jax.random.PRNGKey(0))
    assert out.nees_means.shape == (steps,)
    assert bool(jnp.all(jnp.isfinite(out.nees_means)))
    # Same statistics as the XLA pipeline (different RNG streams, so
    # compare within Monte-Carlo error of a 2048-run ensemble).
    np.testing.assert_allclose(
        np.asarray(out.nees_means), np.asarray(ref.nees_means), rtol=0.25
    )
    np.testing.assert_allclose(
        np.asarray(out.nis_means), np.asarray(ref.nis_means), rtol=0.25
    )
    np.testing.assert_allclose(
        np.asarray(out.stddev[-1]), np.asarray(ref.stddev[-1]), rtol=0.2
    )


def test_kernel_lowers_and_runs_interpreted():
    """Structural check on CPU: the kernel traces, lowers through the
    Mosaic interpreter, and produces finite outputs of the right shapes
    (RNG statistics are TPU-only, see above)."""
    model, state0 = _model6()
    steps = 6
    with pltpu.force_tpu_interpret_mode():
        out = pallas_mc.mc_chi_square_pallas(
            model, state0, pallas_mc.TILE, steps, jnp.int32(0), init_spread=False
        )
    assert out.nees_means.shape == (steps,)
    assert out.mean.shape == (steps, 6)
    assert bool(jnp.all(jnp.isfinite(out.nees_means)))
    assert bool(jnp.all(jnp.isfinite(out.stddev)))


def test_kernel_shape_guards():
    model, state0 = _model6()
    with pytest.raises(ValueError):
        pallas_mc.mc_chi_square_pallas(model, state0, 1000, 4, jnp.int32(0))


def test_kernel_generalizes_to_other_shapes():
    """The kernel factory builds for any (n, p): run a 2-state/2-meas
    and a 4-state/1-meas model through the interpreter."""
    for n, p in [(2, 2), (4, 1)]:
        f = jnp.eye(n) + 0.01 * jnp.triu(jnp.ones((n, n)), 1)
        h = jnp.eye(p, n)
        model, st = vanilla.new(
            jnp.zeros(n), jnp.eye(n), f, None, h,
            gn.awgn(0.01 * jnp.eye(n), 0.5 * jnp.eye(p)),
        )
        with pltpu.force_tpu_interpret_mode():
            out = pallas_mc.mc_chi_square_pallas(
                model, st, 1024, 5, jnp.int32(0), init_spread=False, tile=1024
            )
        assert out.nees_means.shape == (5,)
        assert out.mean.shape == (5, n)
        assert bool(jnp.all(jnp.isfinite(out.nees_means)))


def test_kernel_tv_controls_matches_numpy_replica():
    """TV + controls mechanics in interpreter mode.  The stubbed PRNG
    makes every Box-Muller pair the constant (sqrt(50 ln 2), 0), so the
    whole kernel is deterministic; replicate it in numpy — including
    the per-step SMEM reads of (K_k, H_k, chol R_k, G u_k) — and demand
    agreement of the mean/NEES/NIS traces for a jerkcar-style padded
    schedule."""
    from gokalman_tpu.ops.ensemble import _covariance_path_tv, _masked_schedule
    from gokalman_tpu.workloads import jerkcar as jc

    t, n, p = 6, 4, 2
    model, st = vanilla.new(
        jnp.asarray(jc.X0, jnp.float32), jnp.asarray(jc.P0, jnp.float32),
        jnp.asarray(jc.F, jnp.float32), jnp.asarray(jc.G, jnp.float32),
        jnp.asarray(jc.H1, jnp.float32),
        gn.awgn(jnp.asarray(jc.Q, jnp.float32), jnp.asarray(jc.R, jnp.float32)),
    )
    rng = np.random.default_rng(2)
    yacc = rng.standard_normal(t)
    ypos = rng.standard_normal(t)
    uvec = rng.standard_normal(t + 1)
    _, us, hs, rs, masks = jc.schedule(yacc, ypos, uvec)
    us = jnp.asarray(us, jnp.float32)
    hs = jnp.asarray(hs, jnp.float32)
    rs = jnp.asarray(rs, jnp.float32)
    masks = jnp.asarray(masks)

    with pltpu.force_tpu_interpret_mode():
        out = pallas_mc.mc_chi_square_pallas(
            model, st, 1024, t, jnp.int32(0), init_spread=False, tile=1024,
            controls=us, hs=hs, rs=rs, meas_masks=masks,
        )

    # --- numpy replica ---
    hs_m, rs_m, lrs = _masked_schedule(model, hs, rs, masks)
    ks, s_inv, p_inv = _covariance_path_tv(model, st.p, hs_m, rs_m)
    ks, s_inv, p_inv, hs_m, lrs = (np.asarray(a, np.float64)
                                   for a in (ks, s_inv, p_inv, hs_m, lrs))
    f = np.asarray(jc.F)
    g = np.asarray(jc.G)
    lq = np.asarray(model.noise.sqrt_q, np.float64)
    c = np.sqrt(-2.0 * np.log(2.0**-25))  # stubbed Box-Muller cos branch
    wv = np.array([c if i % 2 == 0 else 0.0 for i in range(n + p)])
    w, v = wv[:n], wv[n:]
    x_t = np.asarray(jc.X0, np.float64)
    x_e = x_t.copy()
    exp_mean, exp_nees, exp_nis = [], [], []
    for k in range(t):
        gu = g[:, 0] * float(us[k, 0])
        x_t = f @ x_t + gu + lq @ w
        x_p = f @ x_e + gu
        innov = hs_m[k] @ (x_t - x_p) + lrs[k] @ v
        x_e = x_p + ks[k] @ innov
        err = x_t - x_e
        exp_mean.append(x_t.copy())
        exp_nees.append(err @ p_inv[k] @ err)
        exp_nis.append(innov @ s_inv[k] @ innov)
    np.testing.assert_allclose(np.asarray(out.mean), exp_mean,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.nees_means), exp_nees,
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.nis_means), exp_nis,
                               rtol=1e-3, atol=1e-5)


def test_box_muller_statistics_on_tpu():
    """Statistical unit test of the kernel's Box-Muller generator on
    hardware, independent of the filter pipeline: moments and tail
    quantiles over ~half a million draws."""
    if jax.default_backend() in ("cpu",):
        pytest.skip("hardware PRNG statistics need real TPU")
    z = np.asarray(pallas_mc.sample_normals_pallas(524_288, jnp.int32(7)))
    n = z.size
    assert np.isfinite(z).all()
    se = 1.0 / np.sqrt(n)  # standard error of the mean
    assert abs(z.mean()) < 6 * se, z.mean()
    assert abs(z.std() - 1.0) < 6 * se, z.std()
    # Skewness ~ 0, excess kurtosis ~ 0 (SE ~ sqrt(6/n), sqrt(24/n)).
    zc = z - z.mean()
    skew = (zc**3).mean() / z.std() ** 3
    kurt = (zc**4).mean() / z.std() ** 4 - 3.0
    assert abs(skew) < 6 * np.sqrt(6 / n), skew
    assert abs(kurt) < 6 * np.sqrt(24 / n), kurt
    # Tail mass: P(|z|>1)=.3173, P(|z|>2)=.0455, P(|z|>3)=.0027.
    for thresh, expect in ((1.0, 0.31731), (2.0, 0.04550), (3.0, 0.00270)):
        frac = float((np.abs(z) > thresh).mean())
        tol = 6 * np.sqrt(expect * (1 - expect) / n)
        assert abs(frac - expect) < tol, (thresh, frac, expect)
    # The 24-bit uniform floor must not produce duplicate spikes at 0.
    assert float((z == 0.0).mean()) < 1e-4


def test_clt_generator_statistics_on_tpu():
    """The fast_rng (popcount-CLT) generator's documented moments on
    hardware: mean/var/skew exact, excess kurtosis -0.082, bounded
    support — near-normal tail mass at 1/2 sigma."""
    if jax.default_backend() in ("cpu",):
        pytest.skip("hardware PRNG statistics need real TPU")
    z = np.asarray(pallas_mc.sample_normals_pallas(
        524_288, jnp.int32(11), generator="clt"))
    n = z.size
    assert np.isfinite(z).all()
    se = 1.0 / np.sqrt(n)
    assert abs(z.mean()) < 6 * se, z.mean()
    assert abs(z.std() - 1.0) < 6 * se, z.std()
    zc = z - z.mean()
    skew = (zc**3).mean() / z.std() ** 3
    kurt = (zc**4).mean() / z.std() ** 4 - 3.0
    assert abs(skew) < 6 * np.sqrt(6 / n), skew
    # Documented design value: -1/12.17 ~ -0.082.
    assert abs(kurt - (-0.082)) < 6 * np.sqrt(24 / n) + 0.01, kurt
    for thresh, expect, tol_extra in ((1.0, 0.31731, 0.01), (2.0, 0.04550, 0.005)):
        frac = float((np.abs(z) > thresh).mean())
        tol = 6 * np.sqrt(expect * (1 - expect) / n) + tol_extra
        assert abs(frac - expect) < tol, (thresh, frac, expect)
    # Bounded support: |z| can never exceed (12.5 + 0.5)/sqrt(6.083).
    assert float(np.abs(z).max()) <= 5.1


def test_fast_rng_kernel_compiles_interpret():
    """fast_rng=True pipeline compiles and produces the documented
    deterministic output under the interpreter's stubbed PRNG."""
    model, state0 = _model6()
    with pltpu.force_tpu_interpret_mode():
        out = pallas_mc.mc_chi_square_pallas(
            model, state0, 2048, 5, 0, tile=2048, fast_rng=True)
    assert out.nees_means.shape == (5,)
    assert bool(jnp.all(jnp.isfinite(out.stddev)))


def test_chunked_kernel_matches_unchunked_interpret():
    """chunk>0 is a duplicated schedule of the step body: pin it to the
    canonical kernel in interpret mode (stubbed RNG -> deterministic)
    so edits to one body can't silently diverge from the other."""
    model, state0 = _model6()
    with pltpu.force_tpu_interpret_mode():
        a = pallas_mc.mc_chi_square_pallas(model, state0, 2048, 6, 0,
                                           tile=2048)
        b = pallas_mc.mc_chi_square_pallas(model, state0, 2048, 6, 0,
                                           tile=2048, chunk=128)
    for name in ("nees_means", "nis_means", "mean"):
        np.testing.assert_allclose(
            np.asarray(getattr(b, name)), np.asarray(getattr(a, name)),
            rtol=2e-5, atol=1e-6,
        )
    # With the stubbed (all-zero) RNG the ensemble is degenerate, so the
    # stddev is pure f32 cancellation noise in x2sum - S*mean^2 and only
    # its magnitude (near zero) is meaningful across summation orders.
    np.testing.assert_allclose(
        np.asarray(b.stddev), np.asarray(a.stddev), atol=5e-3
    )
