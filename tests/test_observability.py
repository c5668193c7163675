"""Observability analysis: structural rank (LTI matrix), arc Gramian
rank/conditioning, and R-weighting semantics."""

import jax.numpy as jnp
import numpy as np

from gokalman_tpu import diagnostics

from fixtures import robot1d_matrices


def test_observability_matrix_ranks():
    f, g, dt = robot1d_matrices()
    # Position measurement sees velocity through the dynamics: rank 2.
    obs, rank = diagnostics.observability_matrix(f, jnp.array([[1.0, 0.0]]))
    assert obs.shape == (2, 2)
    assert int(rank) == 2
    # Velocity-only measurement never sees position (F is upper
    # triangular): rank 1.
    _, rank_v = diagnostics.observability_matrix(f, jnp.array([[0.0, 1.0]]))
    assert int(rank_v) == 1


def test_gramian_rank_and_unobservable_direction():
    f, g, dt = robot1d_matrices()
    t = 20
    phis = jnp.broadcast_to(f, (t, 2, 2))
    h_pos = jnp.broadcast_to(jnp.array([[1.0, 0.0]]), (t, 1, 2))
    h_vel = jnp.broadcast_to(jnp.array([[0.0, 1.0]]), (t, 1, 2))

    res_pos = diagnostics.observability_gramian(phis, h_pos)
    assert int(res_pos.rank) == 2
    res_vel = diagnostics.observability_gramian(phis, h_vel)
    assert int(res_vel.rank) == 1
    # The null eigenvector of the velocity-only Gramian is the position
    # axis — the direction the arc carries no information about.
    gram = np.asarray(res_vel.gramian)
    w, v = np.linalg.eigh(gram)
    null = v[:, np.argmin(w)]
    np.testing.assert_allclose(np.abs(null), [1.0, 0.0], atol=1e-12)


def test_gramian_conditioning_improves_with_arc_length():
    f, g, dt = robot1d_matrices()
    h = jnp.array([[1.0, 0.0]])

    def cond_at(t):
        phis = jnp.broadcast_to(f, (t, 2, 2))
        hs = jnp.broadcast_to(h, (t, 1, 2))
        return float(diagnostics.observability_gramian(phis, hs).cond)

    # Two position fixes barely separate position from velocity; a long
    # arc conditions the epoch problem much better (measured ~418 vs
    # ~42 for this dt=0.1 constant-velocity model).
    assert cond_at(2) > 5.0 * cond_at(50)


def test_gramian_r_weighting():
    f, g, dt = robot1d_matrices()
    t = 10
    phis = jnp.broadcast_to(f, (t, 2, 2))
    hs = jnp.broadcast_to(jnp.array([[1.0, 0.0]]), (t, 1, 2))
    r = jnp.array([[4.0]])
    res_unit = diagnostics.observability_gramian(phis, hs)
    res_w = diagnostics.observability_gramian(phis, hs, rs=r)
    np.testing.assert_allclose(
        np.asarray(res_w.gramian), np.asarray(res_unit.gramian) / 4.0,
        rtol=1e-12,
    )
    # Per-step stacked rs path agrees with the shared-matrix path.
    res_tv = diagnostics.observability_gramian(
        phis, hs, rs=jnp.broadcast_to(r, (t, 1, 1))
    )
    np.testing.assert_allclose(
        np.asarray(res_tv.gramian), np.asarray(res_w.gramian), rtol=1e-12
    )
