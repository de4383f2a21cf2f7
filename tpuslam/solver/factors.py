"""Residual / Jacobian kernels for the factor types of the SLAM back-end.

Replaces g2o's virtual vertex/edge machinery (Thirdparty/g2o +
/root/reference/include/OptimizableTypes.h, G2oTypes.h) with pure
functions over batched arrays. Conventions:

- Poses are camera-from-world (R_cw, t_cw) like the reference's Tcw.
- Pose tangent updates are LEFT-multiplicative on the camera frame,
  xi = [omega(3), v(3)]: T <- Exp(xi) * T, matching g2o's
  VertexSE3Expmap::oplusImpl.
- Residual = predicted - observed (so dx solves H dx = -J^T W r).
- Per-observation information = inv_sigma2 (1/scale^2 of the keypoint's
  pyramid level, reference Frame::mvInvLevelSigma2).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpuslam.geometry import cameras, lie


def transform_points(R_cw, t_cw, X_w):
    """Apply Tcw to world points; broadcasts pose batch against points."""
    return jnp.einsum("...ij,...j->...i", R_cw, X_w) + t_cw


def reproj_residual(R_cw, t_cw, X_w, uv_obs, cam_params, model="pinhole"):
    """Monocular reprojection residual (...,2).

    Ref: EdgeSE3ProjectXYZOnlyPose::computeError
    (/root/reference/include/OptimizableTypes.h:31) via
    GeometricCamera::project."""
    Xc = transform_points(R_cw, t_cw, X_w)
    return cameras.project(Xc, cam_params, model), Xc


def reproj_jacobians(Xc, R_cw, cam_params, model="pinhole"):
    """(J_pose (...,2,6), J_point (...,2,3)) for the left-mult tangent.

    d Xc / d omega = -hat(Xc), d Xc / d v = I  (g2o EdgeSE3ProjectXYZ
    jacobianOplusXj semantics), chained with the camera projection
    Jacobian; J_point = J_proj @ R_cw."""
    Jproj = cameras.project_jac(Xc, cam_params, model)          # (...,2,3)
    JXc_pose = jnp.concatenate(
        [-lie.hat(Xc), jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype),
                                        Xc.shape[:-1] + (3, 3))],
        axis=-1,
    )                                                            # (...,3,6)
    J_pose = jnp.einsum("...ij,...jk->...ik", Jproj, JXc_pose)   # (...,2,6)
    J_point = jnp.einsum("...ij,...jk->...ik", Jproj, R_cw)      # (...,2,3)
    return J_pose, J_point


def huber_weight(chi2, delta2):
    """IRLS weight of the Huber kernel on the squared error.

    w = 1 for chi2 <= delta2, sqrt(delta2/chi2) beyond — the standard
    reweighting equivalent of g2o's RobustKernelHuber."""
    return jnp.where(
        chi2 <= delta2,
        jnp.ones_like(chi2),
        jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)),
    )


def apply_pose_update(R_cw, t_cw, dx):
    """Left-multiplicative SE3 update: T <- Exp(dx) * T."""
    dR, dt = lie.se3_exp(dx)
    R_new = dR @ R_cw
    t_new = jnp.einsum("...ij,...j->...i", dR, t_cw) + dt
    return lie.normalize_rotation(R_new), t_new
