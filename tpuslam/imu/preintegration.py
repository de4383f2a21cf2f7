"""On-manifold IMU preintegration (Forster et al.) as a masked `lax.scan`.

Re-implements the semantics of `IMU::Preintegrated`
(/root/reference/src/ImuTypes.cc:282 `IntegrateNewMeasurement`, covariance
A/B update at :299-330; bias-correction getters `GetDeltaRotation/
Velocity/Position`; `Reintegrate` ~:265, `MergePrevious` ~:380), but as a
single fixed-shape functional kernel:

- a whole window of IMU samples is integrated in one `lax.scan` (the
  reference integrates sample-by-sample under a mutex);
- variable sample counts are handled with a validity mask (masked steps
  are identity), so tracking can run with a static shape;
- everything is differentiable, enabling exact factor Jacobians by AD as
  a cross-check of the analytic ones used in the solver.

State ordering of the 15x15 covariance matches the reference:
[dtheta(3), dv(3), dp(3), bg(3), ba(3)].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.geometry import lie

GRAVITY = 9.81  # /root/reference/include/ImuTypes.h:41


class PreintState(NamedTuple):
    """Preintegrated deltas between two frames/keyframes."""

    dT: jax.Array        # () accumulated time
    dR: jax.Array        # (3,3)
    dV: jax.Array        # (3,)
    dP: jax.Array        # (3,)
    cov: jax.Array       # (15,15) [theta, v, p, bg, ba]
    JRg: jax.Array       # (3,3) d dR / d bg
    JVg: jax.Array       # (3,3) d dV / d bg
    JVa: jax.Array       # (3,3) d dV / d ba
    JPg: jax.Array       # (3,3) d dP / d bg
    JPa: jax.Array       # (3,3) d dP / d ba
    bg: jax.Array        # (3,) linearization gyro bias
    ba: jax.Array        # (3,) linearization acc bias


def init_state(bias_gyro=None, bias_acc=None, dtype=jnp.float32) -> PreintState:
    z3 = jnp.zeros((3, 3), dtype)
    bg = jnp.zeros(3, dtype) if bias_gyro is None else jnp.asarray(bias_gyro, dtype)
    ba = jnp.zeros(3, dtype) if bias_acc is None else jnp.asarray(bias_acc, dtype)
    return PreintState(
        dT=jnp.zeros((), dtype),
        dR=jnp.eye(3, dtype=dtype),
        dV=jnp.zeros(3, dtype),
        dP=jnp.zeros(3, dtype),
        cov=jnp.zeros((15, 15), dtype),
        JRg=z3, JVg=z3, JVa=z3, JPg=z3, JPa=z3,
        bg=bg, ba=ba,
    )


def discrete_noise(noise_gyro, noise_acc, walk_gyro, walk_acc, freq, dtype=jnp.float32):
    """Continuous->discrete noise scaling (Tracking.cc:945-951: Ng*sqrt(f),
    Ngw/sqrt(f)). Returns (Nga (6,6), NgaWalk (6,6)) diagonal covariances."""
    sf = jnp.sqrt(jnp.asarray(freq, dtype))
    ng, na = noise_gyro * sf, noise_acc * sf
    wg, wa = walk_gyro / sf, walk_acc / sf
    nga = jnp.diag(jnp.asarray([ng, ng, ng, na, na, na], dtype) ** 2)
    walk = jnp.diag(jnp.asarray([wg, wg, wg, wa, wa, wa], dtype) ** 2)
    return nga, walk


@jax.jit
def integrate(state: PreintState, acc, gyro, dt, mask, nga, nga_walk) -> PreintState:
    """Integrate a window of samples: acc/gyro (N,3), dt (N,), mask (N,).

    Masked samples are skipped (identity update). Semantics follow
    `IntegrateNewMeasurement` (src/ImuTypes.cc:282): position/velocity and
    their Jacobians are updated with the *old* dR, then dR itself advances.

    Must stay under jit: called eagerly, the inner `lax.scan` closes over
    freshly-built constants every call and the executable cache never
    hits — one fresh XLA compile per frame (observed: OOM after ~500
    frames of leaked executables).
    """
    dtype = state.dR.dtype
    eye3 = jnp.eye(3, dtype=dtype)

    def step(s: PreintState, inp):
        a, w, h, m = inp
        a = a - s.ba
        w = w - s.bg
        h = jnp.asarray(h, dtype)

        W_a = lie.hat(a)
        dR_old = s.dR

        # Delta updates with old rotation.
        dP = s.dP + s.dV * h + 0.5 * dR_old @ a * h * h
        dV = s.dV + dR_old @ a * h

        # Covariance propagation (A 9x9, B 9x6), ref :299-330.
        dRi = lie.so3_exp(w * h)
        Jr = lie.so3_right_jacobian(w * h)

        A = jnp.zeros((9, 9), dtype)
        A = A.at[0:3, 0:3].set(dRi.T)
        A = A.at[3:6, 0:3].set(-dR_old @ W_a * h)
        A = A.at[6:9, 0:3].set(-0.5 * dR_old @ W_a * h * h)
        A = A.at[3:6, 3:6].set(eye3)
        A = A.at[6:9, 3:6].set(eye3 * h)
        A = A.at[6:9, 6:9].set(eye3)

        B = jnp.zeros((9, 6), dtype)
        B = B.at[0:3, 0:3].set(Jr * h)
        B = B.at[3:6, 3:6].set(dR_old * h)
        B = B.at[6:9, 3:6].set(0.5 * dR_old * h * h)

        cov9 = A @ s.cov[:9, :9] @ A.T + B @ nga @ B.T
        cov_bias = s.cov[9:15, 9:15] + nga_walk
        cov = s.cov.at[:9, :9].set(cov9).at[9:15, 9:15].set(cov_bias)

        # Bias Jacobians (P/V first with old JRg/dR, then R), ref semantics.
        JPa = s.JPa + s.JVa * h - 0.5 * dR_old * h * h
        JPg = s.JPg + s.JVg * h - 0.5 * dR_old @ W_a @ s.JRg * h * h
        JVa = s.JVa - dR_old * h
        JVg = s.JVg - dR_old @ W_a @ s.JRg * h
        JRg = dRi.T @ s.JRg - Jr * h

        dR = lie.normalize_rotation(dR_old @ dRi)
        new = PreintState(
            dT=s.dT + h, dR=dR, dV=dV, dP=dP, cov=cov,
            JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa, bg=s.bg, ba=s.ba,
        )
        out = jax.tree_util.tree_map(
            lambda n, o: jnp.where(m, n, o), new, s
        )
        return out, None

    acc = jnp.asarray(acc, dtype)
    gyro = jnp.asarray(gyro, dtype)
    dt = jnp.asarray(dt, dtype)
    mask = jnp.asarray(mask, bool)
    final, _ = jax.lax.scan(step, state, (acc, gyro, dt, mask))
    return final


def delta_rotation(state: PreintState, bg):
    """dR corrected to a new gyro bias. Ref: GetDeltaRotation."""
    dbg = bg - state.bg
    return lie.normalize_rotation(state.dR @ lie.so3_exp(state.JRg @ dbg))


def delta_velocity(state: PreintState, bg, ba):
    """Ref: GetDeltaVelocity."""
    return state.dV + state.JVg @ (bg - state.bg) + state.JVa @ (ba - state.ba)


def delta_position(state: PreintState, bg, ba):
    """Ref: GetDeltaPosition."""
    return state.dP + state.JPg @ (bg - state.bg) + state.JPa @ (ba - state.ba)


def predict(state: PreintState, R_i, p_i, v_i, bg, ba, gravity=None):
    """Propagate state i -> j through the preintegrated window.

    Ref: Tracking::PredictStateIMU (/root/reference/src/Tracking.cc:1372).
    Returns (R_j, p_j, v_j) in world frame (world-from-body convention).
    """
    dtype = state.dR.dtype
    g = (
        jnp.asarray([0.0, 0.0, -GRAVITY], dtype)
        if gravity is None
        else jnp.asarray(gravity, dtype)
    )
    dT = state.dT
    dR = delta_rotation(state, bg)
    dV = delta_velocity(state, bg, ba)
    dP = delta_position(state, bg, ba)
    R_j = lie.normalize_rotation(R_i @ dR)
    v_j = v_i + g * dT + R_i @ dV
    p_j = p_i + v_i * dT + 0.5 * g * dT * dT + R_i @ dP
    return R_j, p_j, v_j


def inertial_residual(state: PreintState, R_i, p_i, v_i, R_j, p_j, v_j, bg, ba,
                      gravity=None):
    """9-dim inertial factor residual [er, ev, ep].

    Ref: EdgeInertial::computeError (/root/reference/src/G2oTypes.cc; decl
    include/G2oTypes.h:509-565)."""
    dtype = state.dR.dtype
    g = (
        jnp.asarray([0.0, 0.0, -GRAVITY], dtype)
        if gravity is None
        else jnp.asarray(gravity, dtype)
    )
    dT = state.dT
    dR = delta_rotation(state, bg)
    dV = delta_velocity(state, bg, ba)
    dP = delta_position(state, bg, ba)
    er = lie.so3_log(dR.T @ R_i.T @ R_j)
    ev = R_i.T @ (v_j - v_i - g * dT) - dV
    ep = R_i.T @ (p_j - p_i - v_i * dT - 0.5 * g * dT * dT) - dP
    return jnp.concatenate([er, ev, ep])


def merge(prev: PreintState, nxt: PreintState, nga, nga_walk) -> PreintState:
    """Concatenate two preintegrated windows (prev then nxt) at prev's bias.

    Ref: MergePrevious (src/ImuTypes.cc ~:380) — used by keyframe culling to
    keep the temporal IMU chain intact (LocalMapping.cc:1282-1287). The
    reference re-integrates stored measurements; we compose the closed-form
    deltas and propagate covariance through the composition, correcting nxt
    to prev's bias linearization first.
    """
    bg, ba = prev.bg, prev.ba
    dR2 = delta_rotation(nxt, bg)
    dV2 = delta_velocity(nxt, bg, ba)
    dP2 = delta_position(nxt, bg, ba)
    dT1, dT2 = prev.dT, nxt.dT

    dR = lie.normalize_rotation(prev.dR @ dR2)
    dV = prev.dV + prev.dR @ dV2
    dP = prev.dP + prev.dV * dT2 + prev.dR @ dP2

    # Jacobians of the composed deltas wrt bias (chain rule on composition).
    JRg = dR2.T @ prev.JRg + nxt.JRg
    JVg = prev.JVg + prev.dR @ nxt.JVg - prev.dR @ lie.hat(dV2) @ prev.JRg
    JVa = prev.JVa + prev.dR @ nxt.JVa
    JPg = (
        prev.JPg + prev.JVg * dT2 + prev.dR @ nxt.JPg
        - prev.dR @ lie.hat(dP2) @ prev.JRg
    )
    JPa = prev.JPa + prev.JVa * dT2 + prev.dR @ nxt.JPa

    # Covariance: propagate prev cov through composition transition and add
    # nxt's covariance rotated into the composed frame.
    dtype = prev.dR.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    A = jnp.zeros((9, 9), dtype)
    A = A.at[0:3, 0:3].set(dR2.T)
    A = A.at[3:6, 0:3].set(-prev.dR @ lie.hat(dV2))
    A = A.at[3:6, 3:6].set(eye3)
    A = A.at[6:9, 0:3].set(-prev.dR @ lie.hat(dP2))
    A = A.at[6:9, 3:6].set(eye3 * dT2)
    A = A.at[6:9, 6:9].set(eye3)
    G = jnp.zeros((9, 9), dtype)
    G = G.at[0:3, 0:3].set(eye3)
    G = G.at[3:6, 3:6].set(prev.dR)
    G = G.at[6:9, 6:9].set(prev.dR)
    cov9 = A @ prev.cov[:9, :9] @ A.T + G @ nxt.cov[:9, :9] @ G.T
    cov = jnp.zeros((15, 15), dtype)
    cov = cov.at[:9, :9].set(cov9)
    cov = cov.at[9:15, 9:15].set(prev.cov[9:15, 9:15] + nxt.cov[9:15, 9:15])

    return PreintState(
        dT=dT1 + dT2, dR=dR, dV=dV, dP=dP, cov=cov,
        JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa, bg=bg, ba=ba,
    )
