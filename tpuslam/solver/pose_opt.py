"""Frame pose-only optimization (motion tracking's inner loop).

Re-implements `Optimizer::PoseOptimization` (/root/reference/src/
Optimizer.cc:887): 4 rounds x 10 iterations, Huber delta = sqrt(5.991)
(:930), per-round chi-square outlier gating with kernel dropped from
round 3 (:1120-1237). g2o's LM on a dynamic graph becomes a fixed-shape
masked Gauss-Newton with mild damping: outlier "removal" is mask
reweighting, so the whole optimization is ONE jitted program of static
shape — no graph surgery, no per-edge virtual calls.

Stereo/RGBD observations add the reference's 3-dof residual
(u, v, u - bf/z) against the measured right-image coordinate with the
chi2=7.815 gate (EdgeStereoSE3ProjectXYZOnlyPose, Optimizer.cc:931/
:1129-1182): pass `ur` (N,) with entries < 0 for mono keypoints.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpuslam.solver import factors

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
CHI2_RCAM = 9.488   # joint 4-dof gate for left+right paired observations


class PoseOptResult(NamedTuple):
    R: jax.Array          # (3,3)
    t: jax.Array          # (3,)
    inlier: jax.Array     # (N,) bool
    chi2: jax.Array       # (N,) final squared errors (information-weighted)
    n_inliers: jax.Array  # () int32


@functools.partial(jax.jit, static_argnames=("model", "rounds", "iters"))
def optimize_pose(
    R0,
    t0,
    X_w,           # (N,3) world points
    uv,            # (N,2) observations
    inv_sigma2,    # (N,) information scale (1/level sigma^2)
    valid,         # (N,) bool
    cam_params,
    model: str = "pinhole",
    rounds: int = 4,
    iters: int = 10,
    chi2_th: float = CHI2_MONO,
    damping: float = 1e-6,
    ur: Optional[jax.Array] = None,  # (N,) right-image u; < 0 = mono
    bf: float = 0.0,
    chi2_th_stereo: float = CHI2_STEREO,
    uvr: Optional[jax.Array] = None,  # (N,2) fisheye right-cam pixel;
                                      # < 0 = no right observation
    cam_params_r=None,                # right intrinsics (fisheye rig)
    R_rl=None,                        # rig: X_r = R_rl X_l + t_rl
    t_rl=None,
    chi2_th_rcam: float = CHI2_RCAM,
) -> PoseOptResult:
    dtype = R0.dtype
    has_stereo = ur is not None
    has_rcam = uvr is not None
    if has_stereo:
        st = (ur > 0) & valid
        stf = st.astype(dtype)
        th = jnp.where(st, chi2_th_stereo, chi2_th)
    elif has_rcam:
        rc = (uvr[:, 0] >= 0) & valid
        rcf = rc.astype(dtype)
        th = jnp.where(rc, chi2_th_rcam, chi2_th)
    else:
        th = chi2_th

    def chi2_of(R, t):
        pred, Xc = factors.reproj_residual(R, t, X_w, uv, cam_params, model)
        r = pred - uv
        c2 = jnp.sum(r * r, axis=-1)
        r3 = None
        rr = None
        if has_stereo:
            z = jnp.maximum(Xc[..., 2], 1e-6)
            r3 = (pred[..., 0] - bf / z - ur) * stf
            c2 = c2 + r3 * r3
        if has_rcam:
            # Right-camera reprojection through the rig extrinsics
            # (EdgeSE3ProjectXYZToBodyOnlyPose analog, /root/reference/
            # include/OptimizableTypes.h:181).
            from tpuslam.geometry import cameras
            Xr = Xc @ R_rl.T + t_rl
            pred_r = cameras.project(Xr, cam_params_r, model)
            rr = (pred_r - uvr) * rcf[:, None]
            c2 = c2 + jnp.sum(rr * rr, axis=-1)
        return r, (r3, rr), Xc, c2 * inv_sigma2

    def gn_iter(carry, use_huber):
        R, t, inlier = carry
        r, (r3, rr), Xc, c2 = chi2_of(R, t)
        w = inv_sigma2 * inlier.astype(dtype)
        # Depth-positivity gate (see local_ba.lm_step): at/behind-plane
        # points have near-singular Jacobians that overflow f32.
        w = w * (Xc[..., 2] > 1e-2).astype(dtype)
        if use_huber:
            w = w * factors.huber_weight(c2, th)
        J_pose, _ = factors.reproj_jacobians(Xc, R, cam_params, model)
        H = jnp.einsum("nki,n,nkj->ij", J_pose, w, J_pose)
        b = -jnp.einsum("nki,n,nk->i", J_pose, w, r)
        if has_rcam:
            from tpuslam.geometry import cameras, lie
            Xr = Xc @ R_rl.T + t_rl
            A = cameras.project_jac(Xr, cam_params_r, model)  # (N,2,3)
            B = jnp.einsum("nij,jk->nik", A, R_rl)
            # dXc/d[omega, v] = [-hat(Xc) | I] (left-mult tangent).
            T = jnp.concatenate(
                [-jax.vmap(lie.hat)(Xc), jnp.broadcast_to(
                    jnp.eye(3, dtype=dtype), Xc.shape[:1] + (3, 3))], -1)
            Jr = jnp.einsum("nij,njk->nik", B, T)          # (N,2,6)
            wr = w * rcf * (Xr[..., 2] > 1e-2).astype(dtype)
            H = H + jnp.einsum("nki,n,nkj->ij", Jr, wr, Jr)
            b = b - jnp.einsum("nki,n,nk->i", Jr, wr, rr)
        if has_stereo:
            # d(u - bf/z)/dxi = row_u + bf/z^2 * dz/dxi,
            # dz/d[omega, v] = [y, -x, 0, 0, 0, 1] (left-mult tangent).
            x, y = Xc[..., 0], Xc[..., 1]
            z = jnp.maximum(Xc[..., 2], 1e-6)
            zi2 = 1.0 / (z * z)
            dz = jnp.stack([y, -x, jnp.zeros_like(x),
                            jnp.zeros_like(x), jnp.zeros_like(x),
                            jnp.ones_like(x)], axis=-1)   # (N,6)
            J3 = J_pose[:, 0, :] + (bf * zi2)[:, None] * dz
            w3 = w * stf
            H = H + jnp.einsum("ni,n,nj->ij", J3, w3, J3)
            b = b - jnp.einsum("ni,n,n->i", J3, w3, r3)
        H = H + damping * jnp.eye(6, dtype=dtype) * (1.0 + jnp.trace(H) / 6.0)
        dx = jnp.linalg.solve(H, b)
        R, t = factors.apply_pose_update(R, t, dx)
        return (R, t, inlier)

    R, t = R0, t0
    inlier = valid
    for rnd in range(rounds):
        use_huber = rnd < 2  # reference drops the kernel from round 3
        carry = (R, t, inlier)
        carry = jax.lax.fori_loop(
            0, iters, lambda i, c: gn_iter(c, use_huber), carry
        )
        R, t, _ = carry
        _, _, _, c2 = chi2_of(R, t)
        inlier = valid & (c2 <= th)

    _, _, _, c2 = chi2_of(R, t)
    return PoseOptResult(
        R=R, t=t, inlier=inlier, chi2=c2,
        n_inliers=jnp.sum(inlier).astype(jnp.int32),
    )
