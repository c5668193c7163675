"""Maneuvering-target tracking with the non-Gaussian tier.

Three estimators on one synthetic scenario (reference-style example
driver, cf. examples/robot/main.go):

1. IMM (quiet-CV + agile-CV bank) vs the single-model CKF on a target
   that goes ballistic -> weaving: the mode probabilities flag the
   maneuver onset and the IMM halves the tracking RMS.
2. Bootstrap particle filter on a sign-ambiguous |x| sensor where every
   Gaussian filter's unimodal posterior picks a side and the PF keeps
   both hypotheses alive.
3. ETKF on the same linear tracker, covariance-free.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/maneuvering_target.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import gokalman_tpu as gk
from gokalman_tpu.filters import enkf, imm, particle, vanilla

DT = 0.5


def cv_model(q_scale):
    f = jnp.array([[1.0, DT], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    q = q_scale * jnp.array([[DT**3 / 3, DT**2 / 2], [DT**2 / 2, DT]])
    r = jnp.array([[0.09]])
    model, _ = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h,
                           gk.noise.noiseless(q, r))
    return model


def main():
    rng = np.random.default_rng(7)

    # --- scenario: ballistic for 30 steps, then a hard weave ---------
    quiet, agile = cv_model(1e-4), cv_model(1.0)
    xs = [np.array([0.0, 0.4])]
    for k in range(80):
        x = np.asarray(quiet.f) @ xs[-1]
        if k >= 30:
            x[1] += 0.8 * np.sin(0.6 * k)
        xs.append(x)
    truth = np.stack(xs[1:])
    ys = jnp.asarray(truth[:, :1] + 0.3 * rng.standard_normal((80, 1)))

    # --- IMM vs single-model CKF -------------------------------------
    trans = jnp.array([[0.97, 0.03], [0.03, 0.97]])
    im, ist = imm.new(jnp.array([0.0, 0.4]), jnp.eye(2), [quiet, agile], trans)
    _, iest = imm.run(im, ist, ys)
    _, qst = vanilla.new(jnp.array([0.0, 0.4]), jnp.eye(2), quiet.f, None,
                         quiet.h, quiet.noise)
    _, kest = vanilla.run(quiet, qst, measurements=ys)

    def rms(a):
        return float(np.sqrt(np.mean((np.asarray(a)[35:, 0] - truth[35:, 0]) ** 2)))

    onset = int(np.argmax(np.asarray(iest.mode_probs)[:, 1] > 0.5))
    print(f"IMM: maneuver flagged at step {onset} (true onset 30); "
          f"post-maneuver RMS {rms(iest.state):.3f} vs single-model CKF "
          f"{rms(kest.state):.3f}")

    # --- particle filter on the sign-ambiguous sensor ----------------
    def fx(x):
        return jnp.array([x[0] + DT * 0.4, x[1]])

    def hx(x):
        return jnp.array([jnp.abs(x[0])])

    noise = gk.noise.awgn(jnp.diag(jnp.array([1e-4, 1e-4])),
                          jnp.array([[1e-3]]))
    truth_pf = [jnp.array([-2.0, 0.0])]
    for _ in range(30):
        truth_pf.append(fx(truth_pf[-1]))
    truth_pf = jnp.stack(truth_pf[1:])
    ys_pf = jax.vmap(hx)(truth_pf) + 0.03 * jnp.asarray(
        rng.standard_normal((30, 1)))

    s0 = particle.new(jnp.array([2.0, 0.0]), jnp.diag(jnp.array([9.0, 0.01])),
                      4096, jax.random.PRNGKey(0))
    prop = particle.additive_dynamics(fx, noise)
    loglik = particle.gaussian_log_likelihood(hx, noise)
    _, pest = particle.run(s0, ys_pf, prop, loglik, jax.random.PRNGKey(1))
    print(f"PF:  |x| sensor, prior on the wrong sign: final error "
          f"{abs(float(pest.state[-1, 0] - truth_pf[-1, 0])):.3f} "
          f"(ESS {float(pest.ess[-1]):.0f}/4096)")

    # --- ETKF: the covariance-free linear path -----------------------
    n0 = gk.noise.noiseless(jnp.zeros((2, 2)), jnp.array([[0.09]]))
    fx_l, hx_l = enkf.linear_fns(quiet.f, quiet.h)
    es0 = enkf.new(jnp.array([0.0, 0.4]), jnp.eye(2), 8, n0)
    _, eest = enkf.run(n0, es0, ys, fx_l, hx_l, method="etkf")
    m2, v0 = vanilla.new(jnp.array([0.0, 0.4]), jnp.eye(2), quiet.f, None,
                         quiet.h, n0)
    _, vest = vanilla.run(m2, v0, measurements=ys)
    d = float(jnp.max(jnp.abs(eest.state - vest.state)))
    print(f"ETKF: 8-member ensemble == exact KF to {d:.1e} (linear, Q=0)")


if __name__ == "__main__":
    main()
