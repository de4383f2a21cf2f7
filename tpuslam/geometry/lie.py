"""SO(3) / SE(3) / Sim(3) operations as pure, batch-friendly JAX.

Semantics mirror the reference's hand-rolled helpers
(`IMU::NormalizeRotation/ExpSO3/LogSO3/RightJacobianSO3`,
/root/reference/include/ImuTypes.h:312-321 and src/ImuTypes.cc) and g2o's
`se3quat.h` / `sim3.h` (Thirdparty/g2o), but everything here is functional,
differentiable, and vectorizes with `vmap` — no quaternion objects, no
dynamic graphs. Rotations are 3x3 matrices; small-angle branches are
handled with `jnp.where` on safe-denominator Taylor expansions so the
functions are jit- and grad-safe at the identity.

All functions accept arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """so(3) hat operator: w (...,3) -> skew matrix (...,3,3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: (...,3,3) -> (...,3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _theta(w):
    """Rotation angle with a grad-safe sqrt; returns (theta, theta2).

    The clamp keeps d(sqrt)/d(theta2) finite at theta2=0 (the clamp's
    gradient is zero there, so the chain rule yields the correct 0
    instead of inf*0=NaN through the unselected `where` branch).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    return theta, theta2


def so3_exp(w):
    """Exponential map so(3)->SO(3) (Rodrigues). Ref: IMU::ExpSO3."""
    theta, theta2 = _theta(w)
    small = theta < 1e-5
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks.
    safe_t = jnp.where(small, 1.0, theta)
    safe_t2 = jnp.where(small, 1.0, theta2)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe_t) / safe_t)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_t)) / safe_t2)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * (W @ W)


def rotmat_to_quat(R):
    """Rotation matrix -> unit quaternion [w,x,y,z], w>=0.

    Branchless Shepperd's method: all four extraction candidates are
    computed with clamped denominators and the numerically dominant one is
    selected per element — robust for any angle including theta ~ pi.
    """
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    t0 = 1.0 + r00 + r11 + r22
    t1 = 1.0 + r00 - r11 - r22
    t2 = 1.0 - r00 + r11 - r22
    t3 = 1.0 - r00 - r11 + r22
    ts = jnp.stack([t0, t1, t2, t3], axis=-1)

    def S(t):
        return 2.0 * jnp.sqrt(jnp.maximum(t, 1e-12))

    s0, s1, s2, s3 = S(t0), S(t1), S(t2), S(t3)
    c0 = jnp.stack([0.25 * s0, (r21 - r12) / s0, (r02 - r20) / s0,
                    (r10 - r01) / s0], axis=-1)
    c1 = jnp.stack([(r21 - r12) / s1, 0.25 * s1, (r01 + r10) / s1,
                    (r02 + r20) / s1], axis=-1)
    c2 = jnp.stack([(r02 - r20) / s2, (r01 + r10) / s2, 0.25 * s2,
                    (r12 + r21) / s2], axis=-1)
    c3 = jnp.stack([(r10 - r01) / s3, (r02 + r20) / s3, (r12 + r21) / s3,
                    0.25 * s3], axis=-1)
    k = jnp.argmax(ts, axis=-1)[..., None]
    q = jnp.where(k == 0, c0, jnp.where(k == 1, c1, jnp.where(k == 2, c2, c3)))
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    # Canonical hemisphere: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_to_rotmat(q):
    """Unit quaternion [w,x,y,z] -> rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                       2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                       2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                       1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def so3_log(R):
    """Logarithm map SO(3)->so(3). Ref: IMU::LogSO3.

    Goes through the quaternion for uniform robustness (including near
    theta=pi, where the classic trace formula loses the axis).
    """
    q = rotmat_to_quat(R)
    w, xyz = q[..., 0], q[..., 1:]
    n = jnp.linalg.norm(xyz, axis=-1)
    theta = 2.0 * jnp.arctan2(n, w)
    # theta/sin(theta/2) with Taylor fallback: 2/w * (1 + n^2/(6 w^2) ...)
    small = n < 1e-6
    scale = jnp.where(
        small,
        2.0 / jnp.maximum(w, 1e-12),
        theta / jnp.where(small, 1.0, n),
    )
    return xyz * scale[..., None]


def so3_right_jacobian(w):
    """Right Jacobian Jr of SO(3). Ref: IMU::RightJacobianSO3.

    Exp(w + dw) ~ Exp(w) Exp(Jr(w) dw).
    """
    theta, theta2 = _theta(w)
    small = theta < 1e-5
    safe_t = jnp.where(small, 1.0, theta)
    safe_t2 = jnp.where(small, 1.0, theta2)
    safe_t3 = safe_t2 * safe_t
    A = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_t)) / safe_t2)
    B = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (safe_t - jnp.sin(safe_t)) / safe_t3
    )
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - A[..., None, None] * W + B[..., None, None] * (W @ W)


def so3_right_jacobian_inv(w):
    """Inverse right Jacobian. Ref: IMU::InverseRightJacobianSO3."""
    theta, theta2 = _theta(w)
    small = theta < 1e-5
    safe_t = jnp.where(small, 1.0, theta)
    safe_t2 = jnp.where(small, 1.0, theta2)
    B = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / safe_t2
        - (1.0 + jnp.cos(safe_t)) / (2.0 * safe_t * jnp.sin(safe_t)),
    )
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + 0.5 * W + B[..., None, None] * (W @ W)


def so3_left_jacobian(w):
    """Left Jacobian Jl(w) = Jr(-w)."""
    return so3_right_jacobian(-w)


def normalize_rotation(R):
    """Re-orthonormalize a near-rotation. Ref: IMU::NormalizeRotation
    (src/ImuTypes.cc, SVD U V^T projection).

    Implemented as a quaternion round-trip instead of SVD: the SVD
    projection is NOT differentiable at repeated singular values — which
    for a rotation is ALWAYS (sigma = 1,1,1) — so any AD through it
    (inertial factor Jacobians) yields NaN. The quaternion round-trip is
    smooth for near-rotations and projects equally well.
    """
    return quat_to_rotmat(rotmat_to_quat(R))


# ---------------------------------------------------------------------------
# SE(3): represented as (R: (...,3,3), t: (...,3)) mapping points X -> R X + t.
# ---------------------------------------------------------------------------


def se3_exp(xi):
    """Exp: twist xi = [omega(3), v(3)] -> (R, t) with t = Jl(omega) v.

    Matches g2o::SE3Quat::exp ordering ([omega, upsilon],
    Thirdparty/g2o/g2o/types/se3quat.h).
    """
    omega, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(omega)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(omega), v)
    return R, t


def se3_log(R, t):
    """Log: (R, t) -> [omega, v]."""
    omega = so3_log(R)
    # Jl(w) = Jr(-w), so Jl^-1(w) = Jr^-1(-w).
    Jl_inv = so3_right_jacobian_inv(-omega)
    v = jnp.einsum("...ij,...j->...i", Jl_inv, t)
    return jnp.concatenate([omega, v], axis=-1)


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) o (Rb,tb): X -> Ra (Rb X + tb) + ta."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_apply(R, t, X):
    return jnp.einsum("...ij,...j->...i", R, X) + t


# ---------------------------------------------------------------------------
# Sim(3): (s: (...,), R, t) mapping X -> s R X + t. Ref: g2o sim3.h.
# ---------------------------------------------------------------------------


def sim3_inverse(s, R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return s_inv, Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)


def sim3_compose(sa, Ra, ta, sb, Rb, tb):
    """(sa,Ra,ta) o (sb,Rb,tb)."""
    return (
        sa * sb,
        Ra @ Rb,
        sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta,
    )


def sim3_apply(s, R, t, X):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, X) + t
