"""Spacecraft attitude determination: MEKF with gyro + star tracker.

The second application domain beside orbit determination — the same
deviation-filter architecture the reference's hybrid CKF applies to
orbits (hybrid.go:104-204), here on the SO(3) manifold: a 6-state
[attitude error; gyro bias] multiplicative EKF around a quaternion
reference.

Scenario: a slowly tumbling spacecraft with a biased, noisy gyro
(ARW 10 arcsec/√s-class) and a two-vector star tracker at 1 Hz while
the gyro runs at 10 Hz (sparse measurements via the per-sensor mask
idiom).  Starts 30° off with zero bias knowledge.  Every printed claim
is asserted:

1. attitude error converges from 30° to < 0.02° (sub-star-tracker
   accuracy — the gyro lets the filter average many frames);
2. the gyro bias (never directly measured) is recovered to < 5e-5
   rad/s absolute (< 3% of its largest component);
3. the reported covariance is honest: attitude NEES ≈ 3 on the
   converged tail;
4. during star-tracker outages the error grows only as the gyro's
   random walk predicts (the covariance keeps tracking reality).

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/attitude.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from gokalman_tpu.dynamics import attitude as att
from gokalman_tpu.filters import mekf

DT = 0.1  # gyro rate 10 Hz
T = 6000  # 10 minutes
SV = 5e-5  # rad/sqrt(s) angle random walk
SU = 1e-7  # rad/s^1.5 rate random walk
SIG_ST = 3e-4  # rad per star-tracker axis (~60 arcsec)
BETA_TRUE = np.array([1.5e-3, -8e-4, 4e-4])  # rad/s gyro bias
REFS = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])


def simulate(rng):
    q = np.asarray(att.quat_identity())
    qs, omegas, obs, masks = [], [], [], []
    for k in range(T):
        t = k * DT
        w_true = 0.01 * np.array(
            [np.sin(0.005 * t), np.cos(0.008 * t), 0.7])
        q = np.asarray(att.propagate_quat(jnp.asarray(q),
                                          jnp.asarray(w_true), DT))
        qs.append(q)
        omegas.append(w_true + BETA_TRUE
                      + SV / np.sqrt(DT) * rng.standard_normal(3))
        a = np.asarray(att.attitude_matrix(jnp.asarray(q)))
        obs.append(REFS @ a.T + SIG_ST * rng.standard_normal((2, 3)))
        # star tracker at 1 Hz; a 60 s outage in the middle
        on = (k % 10 == 0) and not (3000 <= k < 3600)
        masks.append([on, on])
    return (np.array(qs), np.array(omegas), np.array(obs),
            np.array(masks))


def main():
    rng = np.random.default_rng(42)
    qs, omegas, obs, masks = simulate(rng)

    q0 = att.apply_error(jnp.asarray(qs[0]),
                         jnp.asarray(np.deg2rad([20.0, -15.0, 12.0])))
    p0 = jnp.diag(jnp.asarray([0.4**2] * 3 + [5e-3**2] * 3))
    model, state = mekf.new(q0, p0, REFS, SV, SU, SIG_ST, DT)
    _, est = mekf.run(model, state, jnp.asarray(omegas), jnp.asarray(obs),
                      jnp.asarray(masks))

    errs = np.asarray(jax.vmap(att.attitude_error_angle)(
        est.q, jnp.asarray(qs)))
    err0 = float(att.attitude_error_angle(q0, jnp.asarray(qs[0])))
    tail = slice(2000, 3000)  # converged, pre-outage

    print(f"initial attitude error: {np.rad2deg(err0):.1f} deg")
    tail_deg = np.rad2deg(errs[tail]).mean()
    print(f"converged error (pre-outage tail): {tail_deg*3600:.1f} arcsec")
    assert np.rad2deg(err0) > 20.0
    assert tail_deg < 0.02, tail_deg

    beta_err = np.abs(np.asarray(est.beta[2999]) - BETA_TRUE)
    print(f"gyro bias recovered to {beta_err.max():.2e} rad/s absolute "
          f"(true magnitudes {np.abs(BETA_TRUE)} rad/s)")
    assert beta_err.max() < 5e-5, beta_err  # < 3% of the largest component

    # honesty: attitude NEES on the converged tail
    dth = np.asarray(jax.vmap(lambda qe, qt: att.rotvec_from_quat(
        att.quat_compose(qe, att.quat_conj(qt))))(est.q, jnp.asarray(qs)))
    ptt = np.asarray(est.covariance)[:, :3, :3]
    nees = np.einsum("ti,tij,tj->t", dth[tail], np.linalg.inv(ptt[tail]),
                     dth[tail])
    print(f"attitude NEES (tail): {nees.mean():.2f}  (n = 3)")
    assert 1.0 < nees.mean() < 7.0, nees.mean()

    # outage: error grows, but stays inside the filter's own 3-sigma
    outage = slice(3000, 3600)
    sigma = np.sqrt(np.trace(ptt[outage], axis1=1, axis2=2))
    grow = np.rad2deg(errs[outage]).max() / np.rad2deg(errs[tail]).mean()
    inside = (np.linalg.norm(dth[outage], axis=1) < 3.2 * sigma).mean()
    print(f"outage: error grew {grow:.0f}x, {100*inside:.0f}% of steps "
          "inside 3.2-sigma of the reported covariance")
    assert grow > 2.0
    assert inside > 0.95, inside
    print("all claims verified.")


if __name__ == "__main__":
    main()
