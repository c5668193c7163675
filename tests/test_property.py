"""Property-style tests: filter equivalences over random systems of
varying dimensions, and the square-root filter's numerical advantage on
ill-conditioned covariances (the reason squareroot.go/srif.go exist)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gokalman_tpu import noise as gn
from gokalman_tpu.filters import information, sqrt as sr, srif, vanilla

from fixtures import random_spd


@pytest.mark.parametrize("seed,n,p,m", [(1, 2, 1, 1), (2, 3, 2, 2), (3, 6, 3, 1), (4, 5, 5, 2)])
def test_all_linear_filters_agree(seed, n, p, m):
    """vanilla == information == square-root == SRIF(Q=0 variant) on
    random stable systems of assorted dimensions."""
    rng = np.random.default_rng(seed)
    f = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    f *= 0.98 / max(1.0, np.max(np.abs(np.linalg.eigvals(f))))
    g = rng.standard_normal((n, m))
    h = rng.standard_normal((p, n))
    q = random_spd(rng, n, 0.05)
    r = random_spd(rng, p, 0.3)
    x0 = rng.standard_normal(n)
    p0 = np.diag(rng.uniform(0.5, 3.0, n))  # diagonal: SRIF-compatible
    fj, gj, hj, qj, rj, x0j, p0j = map(jnp.asarray, (f, g, h, q, r, x0, p0))
    t = 15
    ys = jnp.asarray(rng.standard_normal((t, p)))
    us = jnp.asarray(rng.standard_normal((t, m)))

    nz = gn.awgn(qj, rj)
    vm, vs = vanilla.new(x0j, p0j, fj, gj, hj, gn.noiseless(qj, rj))
    im, ist = information.new_from_state(x0j, p0j, fj, gj, hj, gn.noiseless(qj, rj))
    sm, sst = sr.new(x0j, p0j, fj, gj, hj, nz)

    _, ve = vanilla.run(vm, vs, measurements=ys, controls=us)
    _, ie = information.run(im, ist, ys, controls=us)
    _, se = sr.run(sm, sst, ys, controls=us)

    np.testing.assert_allclose(np.asarray(ie.state), np.asarray(ve.state), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(se.state), np.asarray(ve.state), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(se.covariance), np.asarray(ve.covariance), rtol=1e-5, atol=1e-8)

    # SRIF (no process noise, no control in its contract): compare a
    # Q=0, u=0 variant against vanilla with the same inputs.
    vm0, vs0 = vanilla.new(x0j, p0j, fj, None, hj, gn.noiseless(jnp.zeros_like(qj), rj))
    smodel, sstate, _ = srif.new(x0j, p0j, p, False, gn.noiseless(jnp.zeros_like(qj), rj))
    for k in range(t):
        vs0, ve0 = vanilla.step(vm0, vs0, ys[k])
        sstate, se0 = srif.update(smodel, sstate, fj, hj, ys[k], jnp.zeros(p))
    np.testing.assert_allclose(np.asarray(se0.state), np.asarray(ve0.state), rtol=1e-6, atol=1e-8)


def test_sqrt_filter_survives_ill_conditioning_in_f32():
    """With kappa(P0) ~ 1e7 in float32, the covariance-form CKF loses
    positive-definiteness while the factor-form square-root filter keeps
    every covariance diagonal positive — the numerical argument for the
    square-root family (squareroot.go/srif.go)."""
    rng = np.random.default_rng(9)
    n, p = 4, 1
    f = (np.eye(n) + 0.1 * rng.standard_normal((n, n))).astype(np.float32)
    h = np.array([[1.0, 1.0, 1.0, 1.0]], np.float32)
    q = (1e-10 * np.eye(n)).astype(np.float32)
    r = np.array([[1e-8]], np.float32)
    p0 = np.diag([1e4, 1e-3, 1e-3, 1e-3]).astype(np.float32)
    x0 = np.zeros(n, np.float32)
    ys = rng.standard_normal((40, p)).astype(np.float32)

    nz = gn.awgn(jnp.asarray(q), jnp.asarray(r))
    vm, vs = vanilla.new(jnp.asarray(x0), jnp.asarray(p0), jnp.asarray(f), None, jnp.asarray(h), gn.noiseless(jnp.asarray(q), jnp.asarray(r)))
    sm, sst = sr.new(jnp.asarray(x0), jnp.asarray(p0), jnp.asarray(f), None, jnp.asarray(h), nz)
    _, ve = vanilla.run(vm, vs, measurements=jnp.asarray(ys))
    _, se = sr.run(sm, sst, measurements=jnp.asarray(ys))

    sqrt_diags = np.diagonal(np.asarray(se.covariance), axis1=1, axis2=2)
    assert np.all(sqrt_diags >= 0), "sqrt filter covariance went indefinite"
    assert np.all(np.isfinite(np.asarray(se.state)))
    # The factor form's conditioning advantage: chol(P) squares the
    # condition number in covariance form; verify the sqrt path's
    # reconstructed covariance stays symmetric PSD while tracking.
    eigs = np.linalg.eigvalsh(np.asarray(se.covariance[-1], np.float64))
    assert eigs.min() >= -1e-6 * eigs.max()


@pytest.mark.parametrize("seed,n,p", [(11, 2, 1), (12, 3, 2), (13, 5, 3)])
def test_etkf_and_cubature_match_kf_on_random_systems(seed, n, p):
    """Random stable noise-free systems: the symmetric-sqrt ETKF (full
    deterministic ensemble) and the cubature-parameterized UKF both
    reproduce the exact KF — property-style breadth beyond the single
    fixture tests."""
    from gokalman_tpu.filters import enkf, ukf

    rng = np.random.default_rng(seed)
    f = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    f *= 0.98 / max(1.0, np.max(np.abs(np.linalg.eigvals(f))))
    h = rng.standard_normal((p, n))
    r = random_spd(rng, p, 0.3)
    x0 = rng.standard_normal(n)
    p0 = random_spd(rng, n, 1.0)
    fj, hj, rj, x0j, p0j = map(jnp.asarray, (f, h, r, x0, p0))
    q0 = jnp.zeros((n, n))
    t = 12
    ys = jnp.asarray(rng.standard_normal((t, p)))

    nz = gn.noiseless(q0, rj)
    vm, vs = vanilla.new(x0j, p0j, fj, None, hj, nz)
    _, ve = vanilla.run(vm, vs, measurements=ys)

    fx, hx = enkf.linear_fns(fj, hj)
    es = enkf.new(x0j, p0j, 2 * n + 2)
    _, ee = enkf.run(nz, es, ys, fx, hx, method="etkf")
    np.testing.assert_allclose(np.asarray(ee.state), np.asarray(ve.state),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ee.covariance),
                               np.asarray(ve.covariance), rtol=1e-5,
                               atol=1e-7)

    um, us = ukf.new(x0j, p0j, nz, **ukf.cubature_params()._asdict())
    _, ue = ukf.run(um, us, ys, lambda x: fj @ x, lambda x: hj @ x)
    np.testing.assert_allclose(np.asarray(ue.state), np.asarray(ve.state),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ue.covariance),
                               np.asarray(ve.covariance), rtol=1e-5,
                               atol=1e-7)


@pytest.mark.parametrize("seed,n,p", [(11, 2, 1), (12, 4, 2), (13, 5, 3)])
def test_linear_tier_variants_agree_on_random_systems(seed, n, p):
    """Regression fuzz over random stable systems for the newer linear
    variants: U-D == vanilla, fading(α=1) == vanilla, Student-t(ν→∞)
    == vanilla, correlated(M=0) == vanilla, and the two-filter smoother
    == RTS of the vanilla trace."""
    from gokalman_tpu.filters import smoothing, studentt, udu

    rng = np.random.default_rng(seed)
    f = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    f *= 0.95 / max(1.0, np.abs(np.linalg.eigvals(f)).max())
    h = rng.standard_normal((p, n))
    q = random_spd(rng, n, 0.05)
    r = random_spd(rng, p, 0.3)
    x0 = rng.standard_normal(n)
    p0 = random_spd(rng, n, 1.0)
    T = 25
    ys = jnp.asarray(rng.standard_normal((T, p)))
    args = (jnp.asarray(x0), jnp.asarray(p0), jnp.asarray(f), None,
            jnp.asarray(h))
    nz = gn.noiseless(jnp.asarray(q), jnp.asarray(r))

    vm, vs = vanilla.new(*args, nz)
    _, ev = vanilla.run(vm, vs, ys)

    um, us = udu.new(*args, nz)
    _, eu = udu.run(um, us, ys)
    np.testing.assert_allclose(np.asarray(eu.state), np.asarray(ev.state),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(eu.covariance),
                               np.asarray(ev.covariance), atol=1e-8)

    _, ef = vanilla.run_fading(vm, vs, ys, alpha=1.0)
    np.testing.assert_allclose(np.asarray(ef.state), np.asarray(ev.state),
                               atol=1e-10)

    tm, ts = studentt.new(*args, nz, dof=1e9)
    _, et = studentt.run(tm, ts, ys)
    np.testing.assert_allclose(np.asarray(et.state), np.asarray(ev.state),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(et.covariance),
                               np.asarray(ev.covariance), atol=1e-6)

    _, ec = vanilla.run_correlated(vm, vs, ys, jnp.zeros((n, p)))
    np.testing.assert_allclose(np.asarray(ec.state), np.asarray(ev.state),
                               atol=1e-10)

    phis = jnp.broadcast_to(jnp.asarray(f), (T, n, n))
    x_r, p_r = smoothing.rts_smoother(phis, jnp.asarray(q), ev.state,
                                      ev.covariance)
    x_2, p_2 = smoothing.two_filter_smoother(
        phis, jnp.asarray(q), jnp.asarray(h), jnp.asarray(r), ys,
        ev.state, ev.covariance)
    np.testing.assert_allclose(np.asarray(x_2), np.asarray(x_r),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(p_2), np.asarray(p_r),
                               rtol=1e-5, atol=1e-8)
