"""Maneuvering-target tracking with the non-Gaussian tier.

Three estimators on one synthetic scenario (reference-style example
driver, cf. examples/robot/main.go):

1. IMM (quiet-CV + agile-CV bank) vs the single-model CKF on a target
   that goes ballistic -> weaving: the mode probabilities flag the
   maneuver onset and the IMM halves the tracking RMS.
2. Bootstrap particle filter on a sign-ambiguous |x| sensor where every
   Gaussian filter's unimodal posterior picks a side and the PF keeps
   both hypotheses alive.
3. Rao-Blackwellized PF: 1-D nonlinear "terrain" position + marginal
   KF over [velocity, sensor bias] — samples only the 1 nonlinear dim.
4. ETKF on the same linear tracker, covariance-free.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/maneuvering_target.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import gokalman_tpu as gk
from gokalman_tpu.filters import enkf, imm, particle, rbpf, vanilla

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

    # --- RBPF: terrain-aided navigation style ------------------------
    # Position eta moves with an estimated velocity z1 through a bumpy
    # "terrain" height sensor h(eta) (nonlinear in eta, linear in the
    # [velocity, bias] substate z): the PF samples only eta, the
    # per-particle KFs carry z exactly.
    a_drift = 1.0

    def f_eta(e):
        return a_drift * e

    def g_eta(e):
        return jnp.zeros(2)

    def h_eta(e):
        return jnp.array([jnp.sin(0.8 * e[0]) + 0.3 * e[0]])  # terrain

    c_mat = jnp.array([[0.0, 1.0]])  # sensor reads terrain + bias

    def c_eta(e):
        return c_mat

    f_z = jnp.array([[0.995, 0.0], [0.0, 1.0]])  # slow velocity, const bias
    q_eta = jnp.array([[4e-3]])
    q_z = jnp.diag(jnp.array([1e-5, 1e-8]))
    r_t = jnp.array([[4e-4]])

    rngp = np.random.default_rng(11)
    eta, z = np.array([0.3]), np.array([0.0, 0.15])  # true bias 0.15
    ys_r = []
    for _ in range(80):
        eta = a_drift * eta + rngp.normal(0, np.sqrt(4e-3), 1)
        ys_r.append(np.sin(0.8 * eta[0]) + 0.3 * eta[0] + z[1]
                    + rngp.normal(0, 2e-2))
    ys_r = jnp.asarray(np.asarray(ys_r).reshape(-1, 1))

    model_r, s0_r = rbpf.new(jnp.array([0.0]), jnp.eye(1),
                             jnp.array([0.0, 0.0]), jnp.diag(jnp.array([1e-4, 0.04])),
                             f_z, q_eta, q_z, r_t, 1024, jax.random.PRNGKey(20))
    _, rest = rbpf.run(model_r, s0_r, ys_r, f_eta, g_eta, h_eta, c_eta,
                       key=jax.random.PRNGKey(21))
    print(f"RBPF: terrain navigation, 1024 particles over 1 sampled dim; "
          f"bias estimate {float(rest.z[-1, 1]):.3f} (true 0.150), "
          f"ESS {float(rest.ess[-1]):.0f}")

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
