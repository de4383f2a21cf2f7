"""Non-rectified (fisheye) stereo matching + per-pair triangulation.

Replaces `Frame::ComputeStereoFishEyeMatches`
(/root/reference/src/Frame.cc:1228) + `KannalaBrandt8::TriangulateMatches`
(/root/reference/src/CameraModels/KannalaBrandt8.cpp, decl
include/CameraModels/KannalaBrandt8.h:94): KB8 rigs (TUM-VI) cannot be
rectified, so left/right association is a dense descriptor match
restricted to each camera's LAPPING AREA (the column band both cameras
see, KannalaBrandt8.h:96 / Camera.lappingBegin in the stereo yamls),
and metric depth comes from per-pair two-view triangulation through the
calibrated rig extrinsics Tlr with the reference's acceptance gates:
parallax, cheirality in both cameras, and chi2-gated pixel reprojection
on both sides.

Output reuses `StereoMatches`; `u_right` stays -1 (there is no rectified
right-x coordinate — the metric constraint enters through the
triangulated 3D point `xc`, which the spawn path stores directly; the
reference likewise skips the u-bf/z residual for fisheye rigs and uses
right-camera reprojection edges instead, include/OptimizableTypes.h:117).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpuslam.frontend import matching
from tpuslam.frontend.extractor import FrameFeatures
from tpuslam.frontend.stereo import StereoMatches
from tpuslam.geometry import cameras, triangulation

CHI2_MONO = 5.991


@functools.partial(jax.jit, static_argnames=("model",))
def match_stereo_fisheye(
    left: FrameFeatures,
    right: FrameFeatures,
    cam_l,                # (8,) left KB8 params [fx,fy,cx,cy,k1..k4]
    cam_r,                # (8,) right KB8 params
    R_lr, t_lr,           # rig extrinsics: x_l = R_lr x_r + t_lr (Tlr)
    sigma2_lut,           # (L,) per-level sigma^2 (px^2)
    lapping_l,            # (2,) [x_begin, x_end] of the left lapping band
    lapping_r,            # (2,)
    model: str = "kb8",
    max_dist: int = matching.TH_LOW,   # STRICT: an epipolar-consistent
                                       # wrong match triangulates to a
                                       # plausible-looking wrong depth
                                       # that passes every geometric
                                       # gate (coplanar rays always
                                       # nearly intersect) and poisons
                                       # the metric map — precision
                                       # beats recall here
):
    """Returns (StereoMatches, xc (N,3) left-camera-frame 3D points,
    uv_r (N,2) observed right-image pixel of each accepted match, -1
    where unmatched — the measurement of the right-camera reprojection
    residual in BA (EdgeSE3ProjectXYZToBody,
    /root/reference/include/OptimizableTypes.h:117))."""
    # Lapping-area restriction (ComputeStereoFishEyeMatches only matches
    # the monoLeft/monoRight split, Frame.cc:1239).
    lap_l = ((left.uv[:, 0] >= lapping_l[0])
             & (left.uv[:, 0] <= lapping_l[1]) & left.valid)
    lap_r = ((right.uv[:, 0] >= lapping_r[0])
             & (right.uv[:, 0] <= lapping_r[1]) & right.valid)
    # Bearing-space epipolar gate from the CALIBRATED rig: b_l^T E b_r
    # with E = hat(t_lr) R_lr, thresholded by the right keypoint's
    # sigma in normalized coords — the rig-geometry prior that replaces
    # the rectified path's scanline band. No Lowe ratio: repeated
    # texture gives near-duplicate descriptors whose best/second-best
    # gap says nothing (the triangulation gates below are the outlier
    # filter).
    b_l_all = cameras.unproject(left.uv, cam_l, model)       # (N,3) z=1
    b_r_all = cameras.unproject(right.uv, cam_r, model)
    from tpuslam.geometry import lie
    E = lie.hat(t_lr) @ R_lr
    lines = jnp.einsum("ij,nj->ni", E, b_r_all)              # (Nr,3)
    num = jnp.einsum("mi,ni->mn", b_l_all, lines)            # (Nl,Nr)
    den = lines[None, :, 0] ** 2 + lines[None, :, 1] ** 2
    d2 = num * num / jnp.maximum(den, 1e-12)
    f2 = cam_r[0] * cam_r[0]
    s2_r_all = sigma2_lut[jnp.clip(right.level, 0,
                                   sigma2_lut.shape[0] - 1)]
    ep_mask = d2 <= 3.84 * s2_r_all[None, :] / f2
    ep_mask = ep_mask & matching.level_mask(left.level, right.level)
    res = matching.match(left.desc, right.desc, lap_l, lap_r,
                         mask=ep_mask, max_dist=max_dist, ratio=1.0,
                         mutual=True)
    j = jnp.clip(res.idx, 0, right.uv.shape[0] - 1)
    matched = res.idx >= 0

    # Per-pair triangulation in the LEFT camera frame: camera 1 = left
    # at identity, camera 2 = right with x_r = R_lr^T (x_l - t_lr).
    b_l = b_l_all
    b_r = b_r_all[j]
    R2 = jnp.swapaxes(R_lr, -1, -2)
    t2 = -R2 @ t_lr
    eye = jnp.eye(3, dtype=b_l.dtype)
    zero = jnp.zeros(3, b_l.dtype)
    X = triangulation.triangulate_dlt(eye, zero, R2, t2, b_l, b_r)

    # Acceptance gates (TriangulateMatches): parallax < 0.9998 between
    # the rig rays, positive depth both sides, chi2-gated PIXEL
    # reprojection both sides (5.991 * sigma^2 of each keypoint's level,
    # KannalaBrandt8.cpp's 5.991*sigmaLevel gates).
    ray_l = b_l / jnp.linalg.norm(b_l, axis=-1, keepdims=True)
    ray_r_w = jnp.einsum("ij,nj->ni", R_lr, b_r)
    ray_r_w = ray_r_w / jnp.linalg.norm(ray_r_w, axis=-1, keepdims=True)
    cosp = jnp.sum(ray_l * ray_r_w, axis=-1)

    Xc_l = X
    Xc_r = jnp.einsum("ij,nj->ni", R2, X) + t2
    uv_l = cameras.project(Xc_l, cam_l, model)
    uv_r = cameras.project(Xc_r, cam_r, model)
    s2_l = sigma2_lut[jnp.clip(left.level, 0, sigma2_lut.shape[0] - 1)]
    s2_r = sigma2_lut[jnp.clip(right.level[j], 0,
                               sigma2_lut.shape[0] - 1)]
    e_l = jnp.sum((uv_l - left.uv) ** 2, axis=-1)
    e_r = jnp.sum((uv_r - right.uv[j]) ** 2, axis=-1)

    ok = (matched
          & (cosp < 0.9998)
          & (Xc_l[:, 2] > 1e-3) & (Xc_r[:, 2] > 1e-3)
          & (e_l < CHI2_MONO * s2_l) & (e_r < CHI2_MONO * s2_r))
    depth = jnp.where(ok, Xc_l[:, 2], jnp.inf)
    sm = StereoMatches(
        disparity=jnp.where(ok, 1.0, -1.0),   # no rectified disparity
        u_right=jnp.full(left.uv.shape[:1], -1.0, b_l.dtype),
        depth=depth,
        valid=ok,
    )
    uv_r_obs = jnp.where(ok[:, None], right.uv[j], -1.0)
    return sm, jnp.where(ok[:, None], Xc_l, 0.0), uv_r_obs
