"""Monocular tracking + synchronous local mapping — the minimum end-to-end
slice (SURVEY.md section 7.1 M3).

Host-side: a small state machine (the reference's Tracking::Track,
/root/reference/src/Tracking.cc:1555, keeps its state machine on the host
too — SURVEY.md section 7.2). Device-side: a handful of fused jitted
programs with static shapes:

- `_init_match`: windowed descriptor matching for initialization
  (SearchForInitialization, src/ORBmatcher.cc:722).
- `_reconstruct`: batched essential RANSAC two-view init
  (mpCamera->ReconstructWithTwoViews, src/Tracking.cc:2492).
- `_track_pose`: project local map points -> guided match -> masked GN
  pose optimization (TrackWithMotionModel + TrackLocalMap collapsed:
  src/Tracking.cc:2870/2987 — two rounds with shrinking radius replace
  the reference's separate motion-model and local-map stages).
- `_triangulate_between`: epipolar-gated matching + batched DLT for new
  map points (LocalMapping::CreateNewMapPoints, src/LocalMapping.cc:470).
- local BA via tpuslam.solver.local_ba on a temporal keyframe window
  (visual analog of LocalInertialBA's Nd-window; the reference's
  covisibility window arrives with loop closing in a later stage).

The reference's LocalMapping runs in its own thread; here mapping is
synchronous per keyframe (M3 scope) — the async snapshot pipeline is a
later stage.
"""

from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, field
from typing import List, NamedTuple, Optional, Tuple

# Experiment toggles (trace-time constants; default on).
_GEOM_GATES = not os.environ.get("TPUSLAM_NO_GEOM_GATES")
_PRED_SCALE = not os.environ.get("TPUSLAM_NO_PREDSCALE")
_HYGIENE = not os.environ.get("TPUSLAM_NO_HYGIENE")
_RETIRE_DEBUG = bool(os.environ.get("TPUSLAM_RETIRE_DEBUG"))

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.config import SLAMConfig
from tpuslam.frontend import extractor, matching
from tpuslam.frontend.extractor import FrameFeatures
from tpuslam.geometry import lie, triangulation, two_view
from tpuslam.mapping import mapstate, retrieval
from tpuslam.solver import local_ba, pose_opt
from tpuslam.tracking import loop_closing

# ---------------------------------------------------------------------------
# Jitted device programs
# ---------------------------------------------------------------------------


@jax.jit
def _undistort_uv(uv, cam_params, dist):
    """Undistort keypoint pixels once per frame (Frame::UndistortKeyPoints,
    /root/reference/src/Frame.cc:277 via cv::undistortPoints): everything
    downstream then treats the camera as an ideal pinhole."""
    from tpuslam.geometry import cameras

    f = cam_params[0:2]
    c = cam_params[2:4]
    xy = (uv - c) / f
    return cameras.radtan_undistort(xy, dist) * f + c


@jax.jit
def _init_match(fa: FrameFeatures, fb: FrameFeatures):
    wmask = matching.window_mask(fa.uv, fb.uv, 100.0)
    res = matching.match(fa.desc, fb.desc, fa.valid, fb.valid, mask=wmask,
                         max_dist=60, ratio=0.9, mutual=True)
    return matching.rotation_consistency(fa.angle, fb.angle, res)


@functools.partial(jax.jit, static_argnames=("focal",))
def _reconstruct(b1, b2, valid, key, focal: float):
    return two_view.reconstruct(b1, b2, valid, key, focal=focal)


def _track_pose_impl(
    R0, t0,
    mp_ids,          # (P,) int32 local map point ids (-1 pad)
    mp_pos,          # (P,3) gathered positions
    mp_desc,         # (P,8)
    mp_level,        # (P,)
    mp_ok,           # (P,)
    mp_normal,       # (P,3) viewing normals (zero = unknown)
    mp_dmin,         # (P,) scale-invariance distance range
    mp_dmax,         # (P,) (<=0 = unknown)
    feats: FrameFeatures,
    cam_params,
    scale_lut,       # (L,) scale factor per level
    inv_sigma2_lut,  # (L,)
    img_wh,          # (2,) [w, h]
    model: str = "pinhole",
    radius1: float = 15.0,
    radius2: float = 4.0,
    sched: tuple = ((2, 3), (2, 4)),
    level_widen: bool = False,
    feats_ur=None,   # (N,) frame right-image u (<0 = mono keypoint)
    bf: float = 0.0,
    feats_uvr=None,  # (N,2) fisheye right-cam pixel (<0 = unmatched)
    rig=(None, None, None),   # (cam_params_r, R_rl, t_rl)
):
    """Two guided-match + pose-GN rounds against the local map.

    Round 1 with a wide window from the motion-model prediction
    (TrackWithMotionModel th=15, src/Tracking.cc:2906), round 2 with a
    tight window from the refined pose (TrackLocalMap's SearchLocalPoints
    th~1-4, src/Tracking.cc:3449)."""
    from tpuslam.geometry import cameras

    inv_sigma2_kp = inv_sigma2_lut[jnp.clip(feats.level, 0,
                                            inv_sigma2_lut.shape[0] - 1)]
    has_geom = mp_dmax > 0
    log_sf = jnp.log(scale_lut[1]) if scale_lut.shape[0] > 1 else 1.0

    def visibility(R, t):
        """Frustum + viewing-angle + distance-range checks and scale
        prediction (Frame::isInFrustum, /root/reference/src/Frame.cc:572:
        cos(view angle) > 0.5, dist in [0.8 min, 1.2 max];
        MapPoint::PredictScale, src/MapPoint.cc:570)."""
        Xc = jnp.einsum("ij,pj->pi", R, mp_pos) + t
        uv = cameras.project(Xc, cam_params, model)
        dist = jnp.linalg.norm(Xc, axis=-1)
        ok = (Xc[:, 2] > 0.05) & (
            (uv[:, 0] >= 0) & (uv[:, 0] < img_wh[0])
            & (uv[:, 1] >= 0) & (uv[:, 1] < img_wh[1])
        )
        if _GEOM_GATES:
            viewcos = jnp.sum(mp_normal * (Xc @ R), axis=-1) / jnp.maximum(
                dist, 1e-9)
            ok = ok & jnp.where(has_geom, viewcos > 0.5, True)
            ok = ok & jnp.where(
                has_geom,
                (dist >= 0.8 * mp_dmin) & (dist <= 1.2 * mp_dmax), True)
        lvl = jnp.ceil(
            jnp.log(jnp.maximum(mp_dmax, 1e-9) / jnp.maximum(dist, 1e-9))
            / log_sf).astype(jnp.int32)
        lvl = jnp.where(has_geom,
                        jnp.clip(lvl, 0, scale_lut.shape[0] - 1), mp_level)
        if not _PRED_SCALE:
            lvl = mp_level
        return Xc, uv, ok, lvl

    def rnd(R, t, radius, max_dist, rounds, iters):
        Xc, uv, frustum_ok, lvl = visibility(R, t)
        visible = mp_ok & frustum_ok
        # No Lowe ratio here: the frame-tracking SearchByProjection
        # variants (src/ORBmatcher.cc:44,2027) gate on distance + chi2
        # only — a ratio test would reject matches whenever the map holds
        # near-duplicate points.
        res = matching.search_by_projection(
            uv, lvl, visible, mp_desc, feats, scale_lut,
            radius=radius, max_dist=max_dist, ratio=1.0,
            level_ref=mp_level if level_widen else None,
        )
        matched = res.idx >= 0
        kp = jnp.clip(res.idx, 0, feats.capacity - 1)
        opt = pose_opt.optimize_pose(
            R, t,
            mp_pos,
            feats.uv[kp],
            inv_sigma2_kp[kp],
            matched,
            cam_params,
            model=model,
            rounds=rounds,
            iters=iters,
            # Stereo/RGBD keypoints add the 3-dof (u, v, u-bf/z) residual
            # (EdgeStereoOnlyPose, ref Optimizer.cc:931) — the per-frame
            # anchor that pins metric scale in sensor-depth modes.
            ur=(jnp.where(matched, feats_ur[kp], -1.0)
                if feats_ur is not None else None),
            bf=bf,
            # Fisheye rigs: right-camera reprojection rows through the
            # rig extrinsics (EdgeSE3ProjectXYZToBodyOnlyPose) — the
            # per-frame metric anchor of non-rectified stereo.
            uvr=(jnp.where(matched[:, None], feats_uvr[kp], -1.0)
                 if feats_uvr is not None else None),
            cam_params_r=rig[0], R_rl=rig[1], t_rl=rig[2],
        )
        return opt, res, visible

    # Shorter GN schedules than the reference's 4x10 (Optimizer.cc:887):
    # GN on a 6-dof pose converges in ~3 iterations from a motion-model
    # prediction; the chi2 re-gating rounds are what matter. Validated
    # on the synthetic e2e ATE gate.
    opt1, _, _ = rnd(R0, t0, radius1, matching.TH_HIGH, *sched[0])
    opt2, _, visible = rnd(opt1.R, opt1.t, radius2, matching.TH_LOW + 25,
                           *sched[1])

    # Final associate-only pass at the refined pose: tight window, chi2
    # acceptance — maximizes the observation set recorded for keyframe
    # creation (the role of the final SearchLocalPoints + pose refine in
    # TrackLocalMap, src/Tracking.cc:2997-3016).
    Xc, uv, frustum_ok, lvl = visibility(opt2.R, opt2.t)
    res2 = matching.search_by_projection(
        uv, lvl, mp_ok & frustum_ok, mp_desc, feats,
        scale_lut, radius=2.0 * radius2, max_dist=matching.TH_LOW + 25,
        ratio=1.0, level_ref=mp_level if level_widen else None,
    )
    kp = jnp.clip(res2.idx, 0, feats.capacity - 1)
    r = uv - feats.uv[kp]
    chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2_kp[kp]
    # Association gate is deliberately LOOSER than the pose-inlier gate:
    # freshly triangulated points carry a few px of depth error at these
    # baselines; BA can only pull them to sub-pixel accuracy if their
    # re-observations are recorded. The Huber kernel in BA handles the
    # tail. (Gating associations at the strict chi2 starves BA and the
    # map decays — observed as monotone per-KF association decline.)
    good = (res2.idx >= 0) & (chi2 <= 4.0 * pose_opt.CHI2_MONO)
    assoc = jnp.full((feats.capacity,), -1, jnp.int32)
    assoc = assoc.at[jnp.where(good, kp, feats.capacity)].set(
        jnp.where(good, mp_ids, -1), mode="drop"
    )
    visible_ids = jnp.where(visible, mp_ids, -1)
    found_ids = jnp.where(good, mp_ids, -1)
    return opt2.R, opt2.t, assoc, opt2.n_inliers, visible_ids, found_ids


_track_pose = functools.partial(jax.jit, static_argnames=(
    "model", "radius1", "radius2", "sched", "level_widen"))(
        _track_pose_impl)


@functools.partial(jax.jit, static_argnames=(
    "model", "radius1", "radius2", "sched", "level_widen"))
def _track_frame_fused(
    ms: "mapstate.MapState", mp_ids, R0, t0,
    feats: FrameFeatures, cam_params, scale_lut, inv_sigma2_lut,
    img_wh, min_ok,
    model: str = "pinhole",
    radius1: float = 15.0,
    radius2: float = 4.0,
    sched: tuple = ((2, 3), (2, 4)),
    level_widen: bool = False,
    feats_ur=None, bf: float = 0.0,
    feats_uvr=None, rig=(None, None, None),
):
    """ONE dispatch for the per-frame hot path: local-map gather +
    guided tracking (+ the conditional visible/found stat bump that
    used to be a separate update_point_stats dispatch). Through a
    network-attached device every eager op outside jit is its own
    ~30 ms round trip; the gathers alone were 8 of them (measured in
    the r04 e2e wall-clock loop)."""
    cap = ms.mp_capacity
    safe = jnp.clip(mp_ids, 0, cap - 1)
    mp_ok = (mp_ids >= 0) & ms.mp_valid[safe]
    R, t, assoc, n_inl, visible_ids, found_ids = _track_pose_impl(
        R0, t0, mp_ids, ms.mp_pos[safe], ms.mp_desc[safe],
        ms.mp_level[safe], mp_ok, ms.mp_normal[safe],
        ms.mp_dist_min[safe], ms.mp_dist_max[safe],
        feats, cam_params, scale_lut, inv_sigma2_lut, img_wh,
        model=model, radius1=radius1, radius2=radius2, sched=sched,
        level_widen=level_widen, feats_ur=feats_ur, bf=bf,
        feats_uvr=feats_uvr, rig=rig)
    # Stats bump only when the frame LOCKS (see _track: blank frames
    # must not decay found/visible for every predicted-visible point).
    apply = n_inl >= min_ok
    vis_tgt = jnp.where(apply & (visible_ids >= 0), visible_ids, cap)
    fnd_tgt = jnp.where(apply & (found_ids >= 0), found_ids, cap)
    new_vis = ms.mp_visible.at[vis_tgt].add(1, mode="drop")
    new_fnd = ms.mp_found.at[fnd_tgt].add(1, mode="drop")
    return R, t, assoc, n_inl, visible_ids, found_ids, new_vis, new_fnd


def _prefetch(tree):
    """Start async device->host copies for every leaf (PJRT
    copy_to_host_async): by the time the deferred device_get runs, the
    data is already in the host-side buffer cache and the fetch costs
    ~0.2 ms instead of a blocking tunnel round trip (measured ~25 ms
    on the network-attached chip)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        try:
            leaf.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass


@functools.partial(jax.jit, static_argnums=0)
def _pack_vec_j(_n, *leaves):
    """Flatten + f32-cast + concatenate a tree's leaves into ONE device
    vector. On the network-attached chip every fetched LEAF costs its
    own tunnel RPC (~10 ms measured when the value has not landed yet);
    packing a whole deferred scalar tree into one leaf makes the
    deferred fetch one RPC regardless of tree size. f32 is lossless for
    everything deferred here: poses/scores are f32 already and every
    integer (slot ids <= 4096, counts <= 32768, covisibility weights)
    is far below 2**24."""
    if not leaves:
        return jnp.zeros((0,), jnp.float32)
    return jnp.concatenate(
        [jnp.ravel(l).astype(jnp.float32) for l in leaves])


def _wire_u8(img):
    """Compress a frame for the host->device upload — the float32 wire
    cost (~1.4 MB, 10-35 ms measured) was the tunnel channel hog that
    delayed every readback completion queued behind it. uint8 camera
    frames ship as-is (4x less wire); float renders ship as float16
    (2x less): f16 keeps sub-integer intensity detail that uint8
    quantization destroyed — measured 42 lost-tracking frames on the
    ring fixture with u8, zero with f16. The device program converts
    back to f32."""
    a = np.asarray(img)
    if a.dtype == np.uint8 or os.environ.get("TPUSLAM_WIRE_F32"):
        return a if a.dtype == np.uint8 else a.astype(np.float32)
    return a.astype(np.float16)


def _poll_fetch(tree, poll_s: float = 0.002, max_wait_s: float = 30.0):
    """device_get that first POLLS readiness instead of blocking
    immediately. On the network-attached chip a blocking fetch issued
    before the value has landed costs ~100 ms (the client's blocking
    wait is served on a slow path), while is_ready() is a local check
    and a fetch of landed data is sub-ms — so poll at ms granularity,
    then fetch. Runs on a fetch-pool worker thread; the sleep also
    yields the GIL to the dispatching main thread."""
    import time as _time
    t0 = _time.monotonic()
    deadline = t0 + max_wait_s
    for leaf in jax.tree_util.tree_leaves(tree):
        while not leaf.is_ready():
            if _time.monotonic() > deadline:
                break
            _time.sleep(poll_s)
    t1 = _time.monotonic()
    out = jax.device_get(tree)
    if _RETIRE_DEBUG:
        t2 = _time.monotonic()
        print(f"[fetch] wait={1e3*(t1-t0):.1f} get={1e3*(t2-t1):.1f}",
              flush=True)
    return out


def _pack_tree(tree):
    """Returns (device_vec, meta) — meta unpacks the fetched vector."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    leaves = [jnp.asarray(l) for l in leaves]
    specs = [(l.shape, l.dtype) for l in leaves]
    vec = _pack_vec_j(len(leaves), *leaves)
    return vec, (treedef, specs)


def _unpack_tree(vec_np, meta):
    treedef, specs = meta
    vec_np = np.asarray(vec_np)
    out, off = [], 0
    for shape, dtype in specs:
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        v = vec_np[off:off + n]
        out.append(v.reshape(shape).astype(dtype) if shape
                   else dtype.type(v[0]))
        off += n
    return jax.tree_util.tree_unflatten(treedef, out)


class _FrameCarry(NamedTuple):
    """Device-resident inter-frame tracking state: last pose + the
    constant-velocity motion model. Lives on device so the steady-state
    frame program chains frame-to-frame with ZERO host round trips
    (SURVEY.md section 7.0: host traffic is image-in / pose-out)."""
    R: jax.Array        # (3,3) last camera pose (world->cam)
    t: jax.Array        # (3,)
    vel_R: jax.Array    # (3,3) frame-to-frame relative motion
    vel_t: jax.Array    # (3,)


@jax.jit
def _bump_stats(mp_visible, mp_found, vis_tgt, fnd_tgt):
    """Apply one frame's found/visible counter bumps to the CURRENT
    pools. The frame program emits target indices instead of updated
    arrays so a keyframe superstep dispatched between the frame's
    tracking and its retirement can never be clobbered by a stale
    full-array rebind (targets commute; arrays do not)."""
    return (mp_visible.at[vis_tgt].add(1, mode="drop"),
            mp_found.at[fnd_tgt].add(1, mode="drop"))


@jax.jit
def _gather_vi_matches(ms: mapstate.MapState, assoc, feats: FrameFeatures,
                       inv_sigma2_lut):
    """Per-keypoint 2D-3D match arrays for the VI pose optimizers."""
    cap = ms.mp_capacity
    safe = jnp.clip(assoc, 0, cap - 1)
    X_w = ms.mp_pos[safe]
    valid = (assoc >= 0) & ms.mp_valid[safe]
    inv_s2 = inv_sigma2_lut[jnp.clip(feats.level, 0,
                                     inv_sigma2_lut.shape[0] - 1)]
    return X_w, valid, inv_s2


@functools.partial(jax.jit, static_argnames=("focal", "model"))
def _triangulate_between(
    ms: mapstate.MapState,
    slot_i, slot_j,
    next_free,
    cam_params,
    sigma2_lut,      # (L,) sigma^2 per level (px^2)
    near_pos,        # (P,3) existing local map points (duplicate guard)
    near_ok,         # (P,)
    focal: float,
    model: str = "pinhole",
    enabled=None,    # () bool — gate for the fused superstep (a -1
                     # partner slot disables the whole pass on device)
):
    """Create new map points between keyframes i and j.

    Epipolar-gated descriptor matching of *unassociated* keypoints
    (SearchForTriangulation, src/ORBmatcher.cc:981) + batched DLT +
    checks (LocalMapping::CreateNewMapPoints, src/LocalMapping.cc:470).
    """
    from tpuslam.geometry import cameras

    Ri, ti = ms.kf_R[slot_i], ms.kf_t[slot_i]
    Rj, tj = ms.kf_R[slot_j], ms.kf_t[slot_j]

    free_i = ms.kf_kp_valid[slot_i] & (ms.kf_obs_mp[slot_i] < 0)
    free_j = ms.kf_kp_valid[slot_j] & (ms.kf_obs_mp[slot_j] < 0)

    bi = cameras.unproject(ms.kf_uv[slot_i], cam_params, model)
    bj = cameras.unproject(ms.kf_uv[slot_j], cam_params, model)

    # Relative pose j<-i and essential matrix.
    Rji = Rj @ Ri.T
    tji = tj - Rji @ ti
    E = lie.hat(tji) @ Rji

    # Epipolar gate threshold per candidate-j keypoint sigma (normalized).
    sj2 = sigma2_lut[jnp.clip(ms.kf_level[slot_j], 0, sigma2_lut.shape[0] - 1)]
    ep_th = 3.84 * sj2 / (focal * focal)
    l2 = jnp.einsum("ij,nj->ni", E, bi)       # epipolar lines in image j (Ni,3)
    num = jnp.einsum("mi,ni->nm", bj, l2)     # (Ni,Nj): bj^T E bi
    den = l2[:, None, 0] ** 2 + l2[:, None, 1] ** 2
    d2 = num * num / jnp.maximum(den, 1e-12)  # (Ni,Nj) dist^2 of bj to line
    ep_mask = d2 <= ep_th[None, :]            # threshold by j-keypoint sigma

    res = matching.match(
        ms.kf_desc[slot_i], ms.kf_desc[slot_j], free_i, free_j,
        mask=ep_mask, max_dist=matching.TH_LOW, ratio=0.9, mutual=True,
    )
    matched = res.idx >= 0
    kp_j = jnp.clip(res.idx, 0, bj.shape[0] - 1)

    X = triangulation.triangulate_dlt(Ri, ti, Rj, tj, bi, bj[kp_j])
    si2 = sigma2_lut[jnp.clip(ms.kf_level[slot_i], 0, sigma2_lut.shape[0] - 1)]
    chk = triangulation.check_triangulation(
        Ri, ti, Rj, tj, X, bi, bj[kp_j],
        reproj_th2=5.991 * si2,
        focal=focal,
    )
    ok = matched & chk.ok
    # Duplicate guard (the role of Fuse/SearchInNeighbors,
    # src/LocalMapping.cc:909): drop candidates that land within 3% of
    # their depth of an existing local map point — without this, map
    # points duplicate whenever an association was missed for one frame.
    d = jnp.linalg.norm(X[:, None, :] - near_pos[None, :, :], axis=-1)
    d = jnp.where(near_ok[None, :], d, jnp.inf)
    dup = jnp.min(d, axis=1) < 0.03 * jnp.maximum(chk.z1, 0.1)
    ok = ok & ~dup
    if enabled is not None:
        ok = ok & enabled
    ms, n_new = mapstate.add_points(
        ms, next_free,
        X, ms.kf_desc[slot_i], ms.kf_level[slot_i], ok,
        slot_i, jnp.arange(bi.shape[0], dtype=jnp.int32),
        slot_j, kp_j.astype(jnp.int32),
        scale_lut=jnp.sqrt(sigma2_lut),
    )
    return ms, n_new


@jax.jit
def _spawn_stereo_points(
    ms: mapstate.MapState,
    slot,
    depth,            # (N,) metric depth per keypoint (from stereo/RGBD)
    depth_valid,      # (N,)
    next_free,
    cam_params,
    scale_lut,
    depth_th,
    xc=None,          # (N,3) precomputed camera-frame points (fisheye
                      # rigs: TriangulateMatches output — the pinhole
                      # backprojection below is wrong for KB8)
):
    """Create map points directly from per-keypoint sensor depth for
    keyframe `slot`'s unassociated keypoints — the near-point spawning
    of StereoInitialization and CreateNewKeyFrame
    (/root/reference/src/Tracking.cc:2301, :3334-3421). Near points
    (depth < mThDepth) are reliable enough to skip triangulation; far
    points still go through the epipolar two-view path."""
    R, t = ms.kf_R[slot], ms.kf_t[slot]
    uv = ms.kf_uv[slot]
    fx, fy, cx, cy = (cam_params[0], cam_params[1], cam_params[2],
                      cam_params[3])
    z = jnp.where(jnp.isfinite(depth), depth, 0.0)
    if xc is None:
        Xc = jnp.stack([(uv[:, 0] - cx) / fx * z,
                        (uv[:, 1] - cy) / fy * z, z], axis=-1)
    else:
        Xc = xc
    X_w = jnp.einsum("ji,nj->ni", R, Xc - t)
    ok = (depth_valid & ms.kf_kp_valid[slot] & (ms.kf_obs_mp[slot] < 0)
          & (z > 0.0) & (z < depth_th))
    ids = jnp.arange(uv.shape[0], dtype=jnp.int32)
    return mapstate.add_points(
        ms, next_free, X_w, ms.kf_desc[slot], ms.kf_level[slot], ok,
        slot, ids, slot, ids, scale_lut=scale_lut)


@functools.partial(jax.jit, static_argnames=("level_widen", "model"))
def _fuse_into_kf(
    ms: mapstate.MapState,
    slot,
    mp_ids,          # (P,) local map point ids
    cam_params,
    scale_lut,
    inv_sigma2_lut,
    img_wh,
    level_widen: bool = False,
    model: str = "pinhole",
    enabled=None,    # () bool — device gate for the fused superstep
):
    """Add missing map-point observations to keyframe `slot` by guided
    projection into its stored keypoints (ORBmatcher::Fuse,
    src/ORBmatcher.cc:1425, called from SearchInNeighbors,
    src/LocalMapping.cc:909). Existing associations are kept; only
    unassociated keypoints gain links. This densifies the BA graph —
    without it every point is seen by only the two keyframes that
    triangulated it and local windows go floppy."""
    from tpuslam.geometry import cameras

    safe = jnp.clip(mp_ids, 0, ms.mp_capacity - 1)
    # Skip points this keyframe already observes (they'd get a second,
    # conflicting keypoint link).
    obs = ms.kf_obs_mp[slot]
    already = jnp.zeros((ms.mp_capacity,), bool).at[
        jnp.where(obs >= 0, obs, ms.mp_capacity)
    ].set(True, mode="drop")
    mp_ok = (mp_ids >= 0) & ms.mp_valid[safe] & ~already[safe]
    pos = ms.mp_pos[safe]
    R, t = ms.kf_R[slot], ms.kf_t[slot]
    Xc = jnp.einsum("ij,pj->pi", R, pos) + t
    uv = cameras.project(Xc, cam_params, model)
    visible = (
        mp_ok & (Xc[:, 2] > 0.05)
        & (uv[:, 0] >= 0) & (uv[:, 0] < img_wh[0])
        & (uv[:, 1] >= 0) & (uv[:, 1] < img_wh[1])
    )
    # Viewing-geometry gates + scale prediction (Fuse's isInFrustum-style
    # checks, src/ORBmatcher.cc:1445-1495).
    dmax = ms.mp_dist_max[safe]
    has_geom = dmax > 0
    dist = jnp.linalg.norm(Xc, axis=-1)
    if _GEOM_GATES:
        viewcos = jnp.sum(ms.mp_normal[safe] * (Xc @ R), axis=-1) \
            / jnp.maximum(dist, 1e-9)
        visible = visible & jnp.where(has_geom, viewcos > 0.5, True)
        visible = visible & jnp.where(
            has_geom,
            (dist >= 0.8 * ms.mp_dist_min[safe]) & (dist <= 1.2 * dmax),
            True)
    log_sf = jnp.log(scale_lut[1]) if scale_lut.shape[0] > 1 else 1.0
    lvl = jnp.ceil(jnp.log(jnp.maximum(dmax, 1e-9)
                           / jnp.maximum(dist, 1e-9)) / log_sf
                   ).astype(jnp.int32)
    lvl = jnp.where(has_geom, jnp.clip(lvl, 0, scale_lut.shape[0] - 1),
                    ms.mp_level[safe])
    if not _PRED_SCALE:
        lvl = ms.mp_level[safe]
    feats = FrameFeatures(
        uv=ms.kf_uv[slot], level=ms.kf_level[slot], angle=ms.kf_uv[slot][:, 0],
        response=ms.kf_uv[slot][:, 0], desc=ms.kf_desc[slot],
        valid=ms.kf_kp_valid[slot],
    )
    res = matching.search_by_projection(
        uv, lvl, visible, ms.mp_desc[safe], feats, scale_lut,
        radius=6.0, max_dist=50, ratio=1.0,
        level_ref=ms.mp_level[safe] if level_widen else None,
    )
    kp = jnp.clip(res.idx, 0, feats.capacity - 1)
    r = uv - feats.uv[kp]
    inv_s2 = inv_sigma2_lut[jnp.clip(feats.level[kp], 0,
                                     inv_sigma2_lut.shape[0] - 1)]
    chi2 = jnp.sum(r * r, axis=-1) * inv_s2
    # Loose gate for the same reason as the tracker's association pass:
    # BA refines what it can observe.
    good = (res.idx >= 0) & (chi2 <= 4.0 * pose_opt.CHI2_MONO)

    if enabled is not None:
        good = good & enabled
    existing = ms.kf_obs_mp[slot][kp]                     # (P,)
    link = good & (existing < 0)
    # Duplicate MERGE (MapPoint::Replace via ORBmatcher::Fuse,
    # src/ORBmatcher.cc:1425): a projected point matching a keypoint
    # that already carries a DIFFERENT map point means the two ids are
    # the same physical landmark. Keep the older (smaller, more-BA'd)
    # id everywhere and invalidate the newer — without this, duplicates
    # accumulate ~linearly with trajectory length and slowly poison
    # matching.
    conflict = good & (existing >= 0) & (existing != mp_ids)
    keep = jnp.minimum(existing, mp_ids)
    drop = jnp.maximum(existing, mp_ids)
    cap = ms.mp_capacity
    replace = jnp.arange(cap, dtype=jnp.int32).at[
        jnp.where(conflict, drop, cap)
    ].set(jnp.where(conflict, keep, -1).astype(jnp.int32), mode="drop")
    obs_all = ms.kf_obs_mp
    obs_all = jnp.where(
        obs_all >= 0, replace[jnp.clip(obs_all, 0, cap - 1)], obs_all)
    mp_valid = ms.mp_valid.at[jnp.where(conflict, drop, cap)].set(
        False, mode="drop")

    tgt = jnp.where(link, kp, feats.capacity)
    new_obs = obs_all[slot].at[tgt].set(
        jnp.where(link, mp_ids, -1), mode="drop"
    )
    return ms._replace(kf_obs_mp=obs_all.at[slot].set(new_obs),
                       mp_valid=mp_valid)


@functools.partial(jax.jit,
                   static_argnames=("iters", "model", "stereo", "n_free",
                                    "trust_region", "fisheye"))
def _run_local_ba(ms: mapstate.MapState, kf_ids, fixed, mp_ids,
                  local_of_global, inv_sigma2_lut, cam_params,
                  iters: int = 10, model: str = "pinhole",
                  stereo: bool = False, bf=0.0, n_free: int = None,
                  trust_region: bool = True,
                  fisheye: bool = False, rig=None):
    """`fisheye`+`rig`=(cam_params_r, R_rl, t_rl): right-camera
    reprojection rows through the rig extrinsics for non-rectified
    stereo (EdgeSE3ProjectXYZToBody,
    /root/reference/include/OptimizableTypes.h:117)."""
    prob = mapstate.build_ba_problem(
        ms, kf_ids, fixed, mp_ids, local_of_global, inv_sigma2_lut,
        stereo=stereo, fisheye=fisheye,
    )
    rig = rig if fisheye else (None, None, None)
    res = local_ba.optimize(prob, cam_params, iters=iters, model=model,
                            bf=bf, n_free=n_free,
                            trust_region=trust_region,
                            cam_params_r=rig[0], R_rl=rig[1],
                            t_rl=rig[2])
    # Keep points with at least one inlier observation in the window.
    observed = jnp.any(prob.obs_mask, axis=0)
    pt_keep = jnp.any(res.inlier, axis=0) | ~observed
    ms = mapstate.scatter_ba_result(
        ms, kf_ids, mp_ids, res.kf_R, res.kf_t, res.points, pt_keep
    )
    return ms, res.total_chi2


@functools.partial(
    jax.jit,
    static_argnames=("cap", "focal", "model", "stereo", "use_depth",
                     "fisheye", "hygiene", "iters", "n_free",
                     "trust_region"))
def _superstep_j(
    ms: mapstate.MapState,
    slot,             # () i32 new keyframe slot
    feats: FrameFeatures,
    assoc,            # (N,) keypoint -> map point
    R, t,             # new keyframe pose
    kf_ur,            # (N,) virtual right coords or None
    sp_depth, sp_valid, sp_xc,   # depth-spawn inputs (use_depth only)
    uvr,              # (N,2) right-cam pixels (fisheye) or None
    prev2,            # (2,) i32 triangulation partners, -1 = disabled
    fuse4,            # (4,) i32 fuse targets, -1 = disabled
    kf_ids, fixed,    # (W,) BA window layout (free-first)
    cull_cand,        # () i32 redundancy candidate, -1 = none
    min_obs,          # () i32 tracked-point multi-observation gate
    n_mp0,            # () i32 live point count before this superstep
    cull_ratio,       # () f32 found-ratio culling threshold
    cam_params, sigma2_lut, scale_lut, inv_sigma2_lut, img_wh,
    bf, depth_th,
    rig,              # (cam_params_r, R_rl, t_rl) or (None,)*3
    cap: int,
    focal: float,
    model: str,
    stereo: bool,
    use_depth: bool,
    fisheye: bool,
    hygiene: bool,
    iters: int,
    n_free: int,
    trust_region: bool,
):
    """The WHOLE visual keyframe superstep as ONE jitted program:
    insert + triangulate(x2) + fuse(x4) + depth spawn + warm local BA +
    hygiene + point culling + the deferred-commit scalars (redundancy,
    tracked-ref count, window occupancy, covisibility snapshot).

    This is LocalMapping::Run's per-keyframe pipeline
    (/root/reference/src/LocalMapping.cc:74) compiled into a single
    dispatch: the multi-dispatch version cost ~70 ms of host glue +
    ~15 tunnel RPCs per keyframe on the network-attached chip — the
    dominant term left in the production frame path after the per-frame
    program was fused (SURVEY.md section 7.0). Partner/fuse slots gate
    ON DEVICE (-1 disables a pass) so one compiled variant serves every
    map age. Returns (ms, pend) with pend the deferred-commit scalar
    tree (fetched one frame later; see _commit_superstep)."""
    ms = mapstate.add_keyframe(ms, slot, R, t, feats, assoc,
                               ur=kf_ur, uvr=uvr)
    mp_ids, _local = mapstate.local_point_ids(ms, kf_ids, cap=cap)
    safe = jnp.clip(mp_ids, 0, ms.mp_capacity - 1)
    near_pos = ms.mp_pos[safe]
    n_mp = n_mp0
    for k in range(2):
        prev = prev2[k]
        near_ok = (mp_ids >= 0) & ms.mp_valid[safe]
        ms, n_new = _triangulate_between(
            ms, jnp.maximum(prev, 0), slot, n_mp, cam_params,
            sigma2_lut, near_pos, near_ok, focal=focal, model=model,
            enabled=prev >= 0)
        n_mp = n_mp + n_new.astype(jnp.int32)
    mp_ids, _local = mapstate.local_point_ids(ms, kf_ids, cap=cap)
    for k in range(4):
        fs = fuse4[k]
        ms = _fuse_into_kf(
            ms, jnp.maximum(fs, 0), mp_ids, cam_params, scale_lut,
            inv_sigma2_lut, img_wh, level_widen=False, model=model,
            enabled=fs >= 0)
    if use_depth:
        ms, n_new = _spawn_stereo_points(
            ms, slot, sp_depth, sp_valid, n_mp, cam_params,
            scale_lut, depth_th, xc=sp_xc)
        n_mp = n_mp + n_new.astype(jnp.int32)
    mp_ids, local = mapstate.local_point_ids(ms, kf_ids, cap=cap)
    ms, chi2 = _run_local_ba(
        ms, kf_ids, fixed, mp_ids, local, inv_sigma2_lut, cam_params,
        iters=iters, model=model, stereo=stereo, bf=bf, n_free=n_free,
        trust_region=trust_region, fisheye=fisheye, rig=rig)
    if hygiene:
        mp_ids, local = mapstate.local_point_ids(ms, kf_ids, cap=cap)
        ms = mapstate.refresh_point_hygiene(ms, kf_ids, mp_ids, local,
                                            scale_lut)
    ms = mapstate.cull_points(ms, cull_ratio, min_visible=8)
    red = jnp.where(
        cull_cand >= 0,
        mapstate.keyframe_redundancy(ms, jnp.maximum(cull_cand, 0)),
        jnp.float32(0.0))
    pend = {
        "n_mp": n_mp,
        "chi2": chi2,
        "red": red,
        "ref": mapstate.kf_tracked_points(ms, slot, min_obs),
        "win_count": mapstate.count_window_points(ms, kf_ids),
        "covis": mapstate.covisibility_weights(ms, slot),
    }
    return ms, pend


# ---------------------------------------------------------------------------
# Host state machine
# ---------------------------------------------------------------------------


@dataclass
class FrameResult:
    state: str
    R: np.ndarray
    t: np.ndarray
    n_inliers: int
    is_keyframe: bool = False


@dataclass
class MonoTracker:
    cfg: SLAMConfig
    ms: mapstate.MapState = None
    state: str = "NOT_INITIALIZED"
    n_kf: int = 0
    n_mp: int = 0
    frames_since_kf: int = 0
    ref_tracked: int = 0
    init_feats: Optional[FrameFeatures] = None
    init_age: int = 0
    last_R: np.ndarray = None
    last_t: np.ndarray = None
    vel_R: np.ndarray = None
    vel_t: np.ndarray = None
    trajectory: List[np.ndarray] = field(default_factory=list)
    # Relative trajectory: per frame, the reference-keyframe slot (-1 =
    # absolute entry) and T_cr = T_cw o T_rw^-1 at track time. Export
    # chains T_cr with the keyframe's CURRENT pose, so pose-graph /
    # GBA / scale corrections retro-correct the whole frame trajectory
    # (SaveTrajectoryEuRoC, /root/reference/src/System.cc:623; producers
    # at src/Tracking.cc:2274-2296).
    traj_ref: List[int] = field(default_factory=list)
    traj_rel: List[np.ndarray] = field(default_factory=list)
    kf_slots: List[int] = field(default_factory=list)
    free_kf_slots: List[int] = field(default_factory=list)  # recycled slots
    kf_ts: dict = field(default_factory=dict)  # slot -> frame timestamp
    # (KeyFrame::mTimeStamp — SaveKeyFrameTrajectoryEuRoC writes it,
    # /root/reference/src/System.cc:746)
    _map_start_frame: int = 0   # trajectory index where the active map began
    last_ts: float = None       # previous frame timestamp (jump guards)
    _lost_t0: int = 0           # trajectory index where RECENTLY_LOST began
    stats: dict = field(default_factory=dict)
    enable_loop_closing: bool = True
    frozen: bool = False            # localization-only: no map mutation
    enable_pose_vi: bool = True     # per-frame VI pose refinement
    enable_viba: bool = True        # VI window BA (init + per keyframe)
    loop: loop_closing.LoopState = None
    n_loops_closed: int = 0
    n_merges: int = 0
    atlas: "object" = None          # mapping.atlas.Atlas
    lost_count: int = 0
    lost_patience: int = 20         # frames of failed reloc before new map
    timer: "object" = None          # utils.profiling.StageTimer
    # -- inertial state (sensor == "imu_mono"; body frame == camera for
    # Tbc == I — general extrinsics land with the full VI tracker).
    imu_initialized: bool = False
    vel: np.ndarray = None          # world velocity of the last frame
    bg: np.ndarray = None           # gyro bias estimate
    ba: np.ndarray = None           # acc bias estimate
    cur_preint: "object" = None     # PreintState since last keyframe
    frame_preint: "object" = None   # PreintState of the last frame gap
    kf_preint: dict = field(default_factory=dict)  # slot -> preint from prev
    kf_vel: dict = field(default_factory=dict)     # slot -> world velocity

    def __post_init__(self):
        mcfg = self.cfg.map
        # Sensor-capability flags (the reference's five modes,
        # include/System.h:85-91, decompose into two orthogonal bits):
        # inertial (imu_mono + imu_stereo) and per-keypoint sensor depth
        # (stereo + rgbd + imu_stereo).
        self._use_imu = self.cfg.sensor in ("imu_mono", "imu_stereo")
        self._use_depth = self.cfg.sensor in ("stereo", "rgbd",
                                              "imu_stereo")
        # Feature capacity = what the extractor actually emits.
        self.n_feat = sum(extractor.features_per_level(
            self.cfg.orb.n_features, self.cfg.orb.n_levels,
            self.cfg.orb.scale_factor))
        # Boosted monocular-init extractor (ref 5x, Tracking.cc:838-844).
        import dataclasses as _dc
        mult = max(1, int(self.cfg.orb.n_init_features_mult))
        self._init_orb = (_dc.replace(
            self.cfg.orb, n_features=self.cfg.orb.n_features * mult)
            if mult > 1 else None)
        self.ms = mapstate.empty(mcfg.max_keyframes, mcfg.max_points,
                                 self.n_feat)
        cam = self.cfg.camera
        # KB8 carries its distortion inside the projection model
        # ([fx,fy,cx,cy,k1..k4], geometry/cameras.py:17); pinhole
        # keypoints are undistorted once per frame instead.
        self.model = cam.model
        if cam.model == "kb8":
            self.cam_params = jnp.asarray(
                tuple(cam.params) + tuple(cam.dist[:4]), jnp.float32)
        else:
            self.cam_params = jnp.asarray(cam.params, jnp.float32)
        self.img_wh = jnp.asarray([cam.width, cam.height], jnp.float32)
        # Pinhole radtan distortion: undistort keypoints once per frame
        # (kb8 distortion is part of the projection model itself).
        self.dist = (jnp.asarray(cam.dist, jnp.float32)
                     if cam.model == "pinhole" and any(cam.dist) else None)
        sf = extractor.scale_factors(self.cfg.orb)
        self.scale_lut = jnp.asarray(sf)
        self.sigma2_lut = jnp.asarray(sf * sf)
        self.inv_sigma2_lut = jnp.asarray(1.0 / (sf * sf))
        # Stereo/RGBD: metric close-point threshold mThDepth =
        # bf * ThDepth / fx (src/Tracking.cc:661).
        self._cur_stereo = None
        self._need_close = False
        self.depth_th = (cam.bf * cam.th_depth / cam.fx
                         if cam.bf > 0 else 0.0)
        # Depth-sensor sessions carry 3-dof stereo residuals through
        # every BA (EdgeStereo, ref include/G2oTypes.h:439) — the map's
        # metric-scale anchor independent of fixed keyframes. Fisheye
        # (KB8) rigs have NO rectified right-x coordinate: their metric
        # anchor is the triangulated 3D point each stereo spawn stores
        # (TriangulateMatches path, KannalaBrandt8.h:94), so the u-bf/z
        # rows stay off.
        self._ba_stereo = self._use_depth and cam.model != "kb8"
        self._fisheye_stereo = self._use_depth and cam.model == "kb8"
        if self._fisheye_stereo:
            pr = tuple(cam.params_right) or tuple(cam.params)
            dr = tuple(cam.dist_right)[:4] or tuple(cam.dist)[:4]
            self.cam_params_r = jnp.asarray(pr + dr, jnp.float32)
            Tlr = (np.asarray(cam.Tlr, np.float32).reshape(4, 4)
                   if cam.Tlr else np.eye(4, dtype=np.float32))
            self.R_lr = jnp.asarray(Tlr[:3, :3])
            self.t_lr = jnp.asarray(Tlr[:3, 3])
            lap_l = cam.lapping_left if cam.lapping_left[1] > 0 \
                else (0.0, float(cam.width - 1))
            lap_r = cam.lapping_right if cam.lapping_right[1] > 0 \
                else (0.0, float(cam.width - 1))
            self.lapping_l = jnp.asarray(lap_l, jnp.float32)
            self.lapping_r = jnp.asarray(lap_r, jnp.float32)
            # Inverse rig transform for the right-camera reprojection
            # rows in BA: X_r = R_rl X_l + t_rl.
            R_rl = Tlr[:3, :3].T
            self._rig = (self.cam_params_r, jnp.asarray(R_rl),
                         jnp.asarray(-R_rl @ Tlr[:3, 3]))
        else:
            self._rig = None
        self._cur_stereo_xc = None
        self._cur_stereo_uvr = None
        from tpuslam.mapping.atlas import Atlas
        from tpuslam.utils.profiling import StageTimer

        self.key = jax.random.PRNGKey(self.cfg.seed)
        self.loop = loop_closing.LoopState.create(mcfg.max_keyframes)
        self.atlas = Atlas()
        self.timer = StageTimer()
        if self._use_imu:
            from tpuslam.imu import preintegration as pre

            icfg = self.cfg.imu
            self._nga, self._walk = pre.discrete_noise(
                icfg.noise_gyro, icfg.noise_acc, icfg.walk_gyro,
                icfg.walk_acc, icfg.freq)
            self.vel = np.zeros(3, np.float32)
            self.bg = np.zeros(3, np.float32)
            self.ba = np.zeros(3, np.float32)
            self.cur_preint = pre.init_state()
            # Extrinsics: cfg Tbc is body-from-camera (x_b = Rbc x_c + tbc,
            # the reference's Tbc, Tracking.cc:945); cache camera-from-body.
            Tbc = np.asarray(icfg.Tbc, np.float32).reshape(4, 4)
            Rbc, tbc = Tbc[:3, :3], Tbc[:3, 3]
            self.Rcb = Rbc.T.copy()
            self.tcb = (-Rbc.T @ tbc).astype(np.float32)
            # Per-frame-gap bias random-walk whitening 1/sigma
            # (EdgeGyroRW/EdgeAccRW information, G2oTypes.h:658/699):
            # sigma_walk(frame) = walk_density * sqrt(dt_frame).
            dtf = 1.0 / self.cfg.camera.fps
            wg = max(icfg.walk_gyro * np.sqrt(dtf), 1e-9)
            wa = max(icfg.walk_acc * np.sqrt(dtf), 1e-9)
            self.walk_info = jnp.asarray([1 / wg] * 3 + [1 / wa] * 3,
                                         jnp.float32)
            self.gravity_w = jnp.asarray([0.0, 0.0, -icfg.gravity],
                                         jnp.float32)
            self.prior_H = None        # 15x15 marginal prior (mpcpi)
            self.body_state = None     # last frame's (Rwb,pwb) np arrays
            self._map_updated = True
        self._vel_pred = None
        # Pipelined frame path state (SURVEY 7.0 fused production loop).
        self._fp = None               # built lazily per (sensor, shapes)
        self._inflight = []           # dispatched-not-yet-retired frames
        self._deferred = []           # (packed_vec, meta, handler) FIFO
        # Fetch workers: device_get blocks on tunnel RPCs in C++ (GIL
        # released), so worker threads overlap a frame's readback with
        # the host staging the next frame. 2 workers let a keyframe
        # frame's larger fetch overlap its successor's.
        from concurrent.futures import ThreadPoolExecutor
        self._fetch_pool = ThreadPoolExecutor(max_workers=2)
        self._gba_progs = {}          # (iters, cap, d) -> jitted chunk
        self.retire_wait_ms = []      # per-retire main-thread block (ms)
        self._extra_zero = None       # cached dummy `extra` upload
        self._carry = None            # _FrameCarry on device
        self._carry_valid = False
        self._pipe_fail = 0           # consecutive pipelined misses
        self._last_ninl = 0
        self._world_moved = False
        self._win_count_est = 0       # window landmark-count estimate
        self._superstep_busy = False
        self.viz_recorder = None      # viz.VizRecorder (FrameDrawer hook)
        self._viz_img = None
        self._loop_job = None         # phased loop/merge verify+correct
        self.last_R = np.eye(3, dtype=np.float32)
        self.last_t = np.zeros(3, np.float32)
        self.vel_R = np.eye(3, dtype=np.float32)
        self.vel_t = np.zeros(3, np.float32)
        # Real inter-frame intervals (timestamp-driven when ts is given;
        # datasets have jitter and drops — the constant-velocity model
        # must scale its step, the reference's mVelocity is implicitly
        # per-interval because it always tracks the previous frame).
        self._cur_dt = 1.0 / self.cfg.camera.fps
        self._prev_dt = 1.0 / self.cfg.camera.fps
        self.stats = {"kf": 0, "mp": 0, "ba_chi2": 0.0}

    # -- public API ---------------------------------------------------------

    def process(self, img: np.ndarray, imu=None, img_right=None,
                depth=None, ts=None) -> FrameResult:
        """Track one frame. `imu` (sensor == imu_mono): tuple
        (gyro (S,3), acc (S,3), dt (S,)) of samples since the previous
        frame (GrabImuData + PreintegrateIMU, src/Tracking.cc:1202/1217).
        `img_right` (sensor == stereo): rectified right image.
        `depth` (sensor == rgbd): (H,W) metric depth image.
        `ts`: frame timestamp (s) — enables the stream-corruption guards.

        Steady-state OK frames in visual modes run PIPELINED: the whole
        frame (extraction + prediction + guided tracking + motion-model
        update) is ONE jitted dispatch whose scalar outputs are fetched
        at the START of the next process() call — by then the device has
        finished and the async host copy has landed, so the fetch is
        sub-millisecond instead of a blocking tunnel round trip. The
        host state machine (keyframe decision, loss handling, superstep
        commits, place recognition) therefore runs one frame latent —
        the reference tolerates exactly this latency through its
        tracking/mapping/loop thread queues (SURVEY.md section 2.4)."""
        # Retire the in-flight pipelined frame FIRST: every decision
        # below then reads fresh state (the device worked on that frame
        # plus any keyframe superstep while the host staged this one).
        # Then advance any queued background global-BA by one chunk
        # (the GBA child-thread analog).
        depth = max(int(self.cfg.tracking.pipeline_depth), 1)
        if getattr(self, "_need_compaction", False):
            while self._inflight:
                self._retire(self._inflight.pop(0))
            self._need_compaction = False
            with self.timer.stage("compaction"):
                self.ms, n_valid, _ = mapstate.compact_points(self.ms)
                self.n_mp = int(n_valid)
                self._invalidate_window()
        if len(self._inflight) >= depth:
            while len(self._inflight) >= depth:
                self._retire(self._inflight.pop(0))
        elif not self._inflight:
            self._commit_mapping()
        self._gba_step()
        # Timestamp-jump guards (src/Tracking.cc:1584-1629): a backwards
        # timestamp means a corrupted stream; a >1 s forward gap breaks
        # the IMU preintegration chain beyond repair — both abandon the
        # active map into the Atlas and restart (CreateMapInAtlas /
        # ResetActiveMap).
        if (ts is not None and self.last_ts is not None
                and self.state != "NOT_INITIALIZED" and not self.frozen):
            if ts < self.last_ts - 1e-9:
                self._new_map_in_atlas()
            elif (ts - self.last_ts > 1.0
                  and self._use_imu):
                self._new_map_in_atlas()
        if ts is not None:
            if self.last_ts is not None:
                # Real inter-frame interval for the motion model and the
                # finite-difference velocity (datasets drop frames and
                # jitter; uniform-fps spacing is only the fallback).
                self._cur_dt = float(np.clip(ts - self.last_ts,
                                             1e-3, 1.0))
            self.last_ts = float(ts)
        if (self.cfg.tracking.pipeline and self.state == "OK"
                and not self._use_imu and not self.frozen
                and self.kf_slots):
            return self._dispatch_pipelined(img, img_right, depth, ts)
        # Leaving the pipelined path (loss/reset/localization): retire
        # any frames still in flight so the state machine and the
        # trajectory stay ordered.
        while self._inflight:
            self._retire(self._inflight.pop(0))
        self._commit_mapping()
        self._carry_valid = False
        if imu is not None and self._use_imu:
            with self.timer.stage("imu_preintegration"):
                self._integrate_imu(*imu)
        with self.timer.stage("orb_extraction"):
            # Monocular initialization runs a BOOSTED extractor (the
            # reference's mpIniORBextractor at 5x nFeatures,
            # src/Tracking.cc:838-844): low-texture scenes need the
            # deeper candidate pool to reach init_min_matches. The two
            # init keyframes are compressed back to the static pool
            # budget in _initialize (triangulated keypoints first).
            orb_cfg = (self._init_orb
                       if (self.state == "NOT_INITIALIZED"
                           and self._init_orb is not None
                           and not self._use_depth)
                       else self.cfg.orb)
            feats = extractor.extract_jit(jnp.asarray(img, jnp.float32),
                                          orb_cfg)
            if self.dist is not None:
                feats = feats._replace(uv=_undistort_uv(
                    feats.uv, self.cam_params, self.dist))
        if self.cfg.sensor in ("stereo", "imu_stereo") and img_right is not None:
            with self.timer.stage("stereo_match"):
                feats_r = extractor.extract_jit(
                    jnp.asarray(img_right, jnp.float32), self.cfg.orb)
                if self._fisheye_stereo:
                    # Non-rectified KB8 rig: lapping-area matching +
                    # per-pair triangulation (ComputeStereoFishEyeMatches
                    # + TriangulateMatches, ref Frame.cc:1228).
                    from tpuslam.frontend import stereo_fisheye
                    self._cur_stereo, self._cur_stereo_xc, \
                        self._cur_stereo_uvr = \
                        stereo_fisheye.match_stereo_fisheye(
                            feats, feats_r, self.cam_params,
                            self.cam_params_r, self.R_lr, self.t_lr,
                            self.sigma2_lut, self.lapping_l,
                            self.lapping_r)
                else:
                    from tpuslam.frontend import stereo as stereo_mod
                    sm = stereo_mod.match_stereo(
                        feats, feats_r, self.scale_lut,
                        self.cfg.camera.bf)
                    # SAD scanline subpixel refinement (Frame.cc:975-1022).
                    self._cur_stereo = stereo_mod.refine_subpixel(
                        jnp.asarray(img, jnp.float32),
                        jnp.asarray(img_right, jnp.float32),
                        feats.uv, sm, jnp.float32(self.cfg.camera.bf))
        elif self.cfg.sensor == "rgbd" and depth is not None:
            # Per-keypoint depth lookup replaces ComputeStereoFromRGBD
            # (/root/reference/src/Frame.cc:1143). The virtual right
            # coordinate u - bf/z (mvuRight, Frame.cc:1170) feeds the
            # 3-dof stereo residual in pose opt / BA.
            from tpuslam.frontend.stereo import StereoMatches
            d = jnp.asarray(depth, jnp.float32)
            ui = jnp.clip(feats.uv[:, 0].astype(jnp.int32), 0,
                          d.shape[1] - 1)
            vi = jnp.clip(feats.uv[:, 1].astype(jnp.int32), 0,
                          d.shape[0] - 1)
            z = d[vi, ui]
            ok = feats.valid & (z > 0)
            disp = self.cfg.camera.bf / jnp.maximum(z, 1e-6)
            self._cur_stereo = StereoMatches(
                disparity=jnp.where(ok, disp, -1.0),
                u_right=jnp.where(ok, feats.uv[:, 0] - disp, -1.0),
                depth=jnp.where(ok, z, jnp.inf), valid=ok)
        if self.state == "NOT_INITIALIZED":
            out = self._initialize(feats)
        elif self.state == "OK":
            out = self._track(feats)
        elif self.state == "RECENTLY_LOST":
            out = self._track_recently_lost(feats)
        else:  # LOST: attempt relocalization (Tracking.cc:3764)
            ok, R, t, n = loop_closing.relocalize(
                self.loop, self.ms, feats, self.cam_params,
                self.inv_sigma2_lut, model=self.model)
            if ok:
                self.state = "OK"
                self.lost_count = 0
                self.last_R, self.last_t = R, t
                self.vel_R = np.eye(3, dtype=np.float32)
                self.vel_t = np.zeros(3, np.float32)
                if self._use_imu:
                    # Fresh anchor after relocalization (ResetFrameIMU
                    # role, src/Tracking.cc:1548).
                    self.prior_H = None
                    self.body_state = None
                    self._map_updated = True
                out = FrameResult("OK", R, t, n)
            else:
                self.lost_count += 1
                if self.lost_count > self.lost_patience and not self.frozen:
                    # Atlas elastic recovery (CreateMapInAtlas /
                    # ResetActiveMap, src/Tracking.cc:2658/:3995).
                    self._new_map_in_atlas()
                out = FrameResult("LOST", self.last_R, self.last_t, 0)
        self.trajectory.append(np.concatenate([
            out.R.reshape(-1), out.t.reshape(-1)]))
        if self.kf_slots and out.state == "OK":
            ref = self.kf_slots[-1]
            if out.is_keyframe:
                # This frame IS the reference keyframe: T_cr = identity
                # by construction. Computing it from out.R vs the stored
                # keyframe pose instead would MIX WORLDS whenever the
                # inline superstep transformed the map between tracking
                # and here (IMU-init ApplyScaledRotation rotated the
                # keyframe, out.R is pre-rotation — measured as a 24 m
                # one-frame spike in the exported trajectory).
                self.traj_ref.append(ref)
                self.traj_rel.append(np.concatenate(
                    [np.eye(3, dtype=np.float32).reshape(-1),
                     np.zeros(3, np.float32)]))
            else:
                # The ref KF pose only changes when the map does: cache
                # the host copy keyed by (map version, ref) — most
                # frames then build the relative entry with ZERO device
                # round trips.
                rkey = (getattr(self, "_ms_version", 0), ref)
                if getattr(self, "_ref_pose_key", None) != rkey:
                    self._ref_pose = jax.device_get(
                        (self.ms.kf_R[ref], self.ms.kf_t[ref]))
                    self._ref_pose_key = rkey
                R_r, t_r = self._ref_pose
                R_cr = out.R @ R_r.T
                t_cr = out.t - R_cr @ t_r
                self.traj_ref.append(ref)
                self.traj_rel.append(np.concatenate(
                    [R_cr.reshape(-1), t_cr]).astype(np.float32))
        else:
            self.traj_ref.append(-1)
            self.traj_rel.append(self.trajectory[-1])
        return out

    # -- pipelined steady-state path ----------------------------------------

    def _dispatch_pipelined(self, img, img_right, depth, ts) -> FrameResult:
        """Dispatch the fused frame program (ONE device dispatch) and
        defer the scalar fetch to the next process() call. Returns a
        LAZY FrameResult: pose fields are device arrays (forcing them
        syncs — production consumers read the trajectory instead)."""
        if self._fp is None:
            self._fp = self._build_frame_program()
        if self._carry is None or not self._carry_valid:
            self._carry = _FrameCarry(
                R=jnp.asarray(self.last_R), t=jnp.asarray(self.last_t),
                vel_R=jnp.asarray(self.vel_R),
                vel_t=jnp.asarray(self.vel_t))
            self._carry_valid = True
        dt_ratio = self._cur_dt / max(self._prev_dt, 1e-6)
        _, _, mp_ids, _ = self._window()
        if self.cfg.sensor == "stereo":
            extra = _wire_u8(img_right)
        elif self.cfg.sensor == "rgbd":
            # Depth keeps float precision on the wire (metric values).
            extra = jnp.asarray(depth, jnp.float32)
        else:
            if self._extra_zero is None:
                self._extra_zero = jnp.zeros((1, 1), jnp.uint8)
            extra = self._extra_zero
        ref = self.kf_slots[-1]
        aux = np.array([dt_ratio, ref], np.float32)
        with self.timer.stage("frame_dispatch"):
            (carry2, small, feats, assoc, vis_tgt, fnd_tgt,
             stereo_t) = self._fp(
                _wire_u8(img), extra, self._carry,
                self.ms, mp_ids, aux)
        _prefetch(small)
        self._carry = carry2
        items, self._deferred = self._deferred, []
        # Overlapped fetch: a worker thread blocks on the tunnel RPCs
        # for this frame's packed scalars (and any deferred superstep
        # vectors) while the host stages the next frame — _retire then
        # reads a completed future instead of paying the round trip
        # inline. Two workers let a keyframe frame's fetch overlap the
        # next frame's (the RPCs run concurrently on the wire).
        if os.environ.get("TPUSLAM_SYNC_FETCH"):
            class _Now:
                def __init__(self, v):
                    self._v = v

                def result(self):
                    return self._v
            fut = _Now(jax.device_get(
                (small, [v for v, _, _ in items])))
        else:
            fut = self._fetch_pool.submit(
                _poll_fetch, (small, [v for v, _, _ in items]))
        self._inflight.append(dict(
            small=small, feats=feats, assoc=assoc, vis_tgt=vis_tgt,
            fnd_tgt=fnd_tgt, stereo=stereo_t, ts=ts, ref=ref,
            deferred=items, fut=fut,
            img=(img if self.viz_recorder is not None else None)))
        self._prev_dt = self._cur_dt
        # Pose fields: slicing the device vector here would cost 2 eager
        # dispatches = 2 tunnel RPCs per frame, so return the constant-
        # velocity PREDICTION of this frame's pose from the last retired
        # one (in-flight frames bridged by composing the motion model).
        # Production consumers read the trajectory, which logs the exact
        # retired poses.
        Rp, tp = self.last_R, self.last_t
        for _ in range(len(self._inflight)):
            tp = self.vel_R @ tp + self.vel_t
            Rp = self.vel_R @ Rp
        return FrameResult("OK", Rp.astype(np.float32),
                           tp.astype(np.float32), self._last_ninl)

    def prewarm(self):
        """Pre-TRACE every landmark-bucket variant of the per-frame and
        superstep programs. XLA binaries persist across processes
        (jax_compilation_cache_dir), but jaxpr TRACING is per-process:
        the first keyframe whose window occupancy crosses a pow2 bucket
        otherwise pays 2-6 s of host tracing IN the frame path (measured
        as the only remaining latency spikes in the warm ring probe —
        zero persistent-cache misses, frames 54/73 still 2-6 s). Call
        once after initialization; production drivers do (run_synthetic
        --prewarm, bench e2e before its timed window). The reference
        pays its analogous startup cost loading the ORB vocabulary
        (/root/reference/Examples/Monocular/mono_euroc.cc:58)."""
        if not self.kf_slots or self._fp is None:
            self._fp = self._build_frame_program()
        mcfg = self.cfg.map
        W = mcfg.local_window + mcfg.local_fixed
        h, w = self.cfg.camera.height, self.cfg.camera.width
        kf_ids = jnp.full((W,), -1, jnp.int32)
        fixed = jnp.ones((W,), bool)
        carry = _FrameCarry(
            R=jnp.eye(3, dtype=jnp.float32), t=jnp.zeros(3, jnp.float32),
            vel_R=jnp.eye(3, dtype=jnp.float32),
            vel_t=jnp.zeros(3, jnp.float32))
        img = jnp.zeros((h, w), jnp.float16)
        if self.cfg.sensor == "stereo":
            extra = img
        elif self.cfg.sensor == "rgbd":
            extra = jnp.zeros((h, w), jnp.float32)
        else:
            extra = jnp.zeros((1, 1), jnp.uint8)
        aux = np.array([1.0, 0.0], np.float32)
        N = self.cfg.orb.n_features
        dummy_feats = FrameFeatures(
            uv=jnp.zeros((N, 2), jnp.float32),
            level=jnp.zeros((N,), jnp.int32),
            angle=jnp.zeros((N,), jnp.float32),
            response=jnp.zeros((N,), jnp.float32),
            desc=jnp.zeros((N, 8), jnp.uint32),
            valid=jnp.zeros((N,), bool))
        if self._use_depth:
            sp_depth = jnp.zeros((N,), jnp.float32)
            sp_valid = jnp.zeros((N,), bool)
            sp_xc = (jnp.zeros((N, 3), jnp.float32)
                     if self._fisheye_stereo else None)
            d_ur = jnp.full((N,), -1.0, jnp.float32)
        else:
            sp_depth = jnp.zeros((1,), jnp.float32)
            sp_valid = jnp.zeros((1,), bool)
            sp_xc = None
            d_ur = None
        d_uvr = (jnp.full((N, 2), -1.0, jnp.float32)
                 if self._fisheye_stereo else None)
        assoc0 = jnp.full((N,), -1, jnp.int32)
        scfg = self.cfg.solver
        last = None
        cap = 512
        while True:
            mp_ids, local = mapstate.local_point_ids(self.ms, kf_ids,
                                                     cap=cap)
            last = self._fp(img, extra, carry, self.ms, mp_ids, aux)[0]
            if not self._use_imu:
                _ms, _pend = _superstep_j(
                    self.ms, jnp.int32(0), dummy_feats, assoc0,
                    jnp.eye(3, dtype=jnp.float32),
                    jnp.zeros(3, jnp.float32), d_ur,
                    sp_depth, sp_valid, sp_xc, d_uvr,
                    jnp.full((2,), -1, jnp.int32),
                    jnp.full((4,), -1, jnp.int32), kf_ids, fixed,
                    jnp.int32(-1), jnp.int32(3), jnp.int32(0),
                    jnp.float32(mcfg.cull_found_ratio),
                    self.cam_params, self.sigma2_lut, self.scale_lut,
                    self.inv_sigma2_lut, self.img_wh,
                    jnp.float32(self.cfg.camera.bf),
                    jnp.float32(self.depth_th),
                    (self._rig if self._fisheye_stereo
                     else (None, None, None)),
                    cap=cap, focal=float(self.cfg.camera.fx),
                    model=self.model, stereo=self._ba_stereo,
                    use_depth=self._use_depth,
                    fisheye=self._fisheye_stereo, hygiene=_HYGIENE,
                    iters=scfg.ba_warm_iters, n_free=mcfg.local_window,
                    trust_region=scfg.ba_warm_trust_region)
                last = _pend["covis"]
            else:
                near_pos = self.ms.mp_pos[jnp.clip(
                    mp_ids, 0, self.ms.mp_capacity - 1)]
                near_ok = jnp.zeros((cap,), bool)
                _ms, _n = _triangulate_between(
                    self.ms, 0, 1, jnp.int32(0), self.cam_params,
                    self.sigma2_lut, near_pos, near_ok,
                    focal=float(self.cfg.camera.fx), model=self.model)
                _ms = _fuse_into_kf(
                    self.ms, 0, mp_ids, self.cam_params, self.scale_lut,
                    self.inv_sigma2_lut, self.img_wh,
                    level_widen=self._use_imu, model=self.model)
                _ms, _chi2 = _run_local_ba(
                    self.ms, kf_ids, fixed, mp_ids, local,
                    self.inv_sigma2_lut, self.cam_params,
                    iters=scfg.ba_warm_iters, model=self.model,
                    stereo=self._ba_stereo,
                    bf=jnp.float32(self.cfg.camera.bf),
                    n_free=mcfg.local_window,
                    trust_region=scfg.ba_warm_trust_region,
                    fisheye=self._fisheye_stereo, rig=self._rig)
                if _HYGIENE:
                    _ms = mapstate.refresh_point_hygiene(
                        self.ms, kf_ids, mp_ids, local, self.scale_lut)
            if cap >= mcfg.ba_point_cap:
                break
            cap *= 2
        # Loop-closing device halves: detection fires mid-sequence (the
        # min_gap-th keyframe) and Sim3 verification at the first loop
        # event — both sizable traces that would otherwise land inside
        # a frame's budget.
        if self.enable_loop_closing and self.loop is not None:
            mask = jnp.zeros((self.ms.kf_capacity,), bool)
            _ = loop_closing.detect_loop_device(
                self.loop.db, self.ms, jnp.int32(0), mask)
            _ = loop_closing.verify_loop_device(
                self.ms, 0, 1, self.cam_params, jax.random.PRNGKey(0))
            # Correction phase (pose graph + point remap + seam fuse):
            # shapes are capacity/bucket-static (edge bucket 1024,
            # slots padded to K), so a throwaway 3-KF dummy traces the
            # exact programs a real correction runs. The LoopState is
            # a throwaway (correct_loop records the edge in it).
            Kc = self.ms.kf_capacity
            ls = loop_closing.LoopState(db=self.loop.db)
            _ms2 = loop_closing.correct_loop(
                ls, self.ms, 2, 0, [0, 1, 2], 1.0,
                np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                fix_scale=self._use_imu,
                gravity_w=None,
                covm=np.zeros((Kc, Kc), np.int32))
            _ms2, _nf = loop_closing.seam_fuse(self.ms, [0, 1, 2], 2, 0)
            _ = mapstate.covisibility_matrix(self.ms)
            # Post-loop background GBA chunks: trace the sharded-GBA
            # program for the common keyframe buckets (the landmark
            # axis is static, _gba_sharded_prog). A loop closure on a
            # >GBA_WINDOW map otherwise pays the full solver trace
            # inside the frames right after the correction — measured
            # ~10 s spikes (bench e2e max_ms) before this.
            for kb in (2 * self.GBA_WINDOW, 4 * self.GBA_WINDOW):
                if kb > self.ms.kf_capacity:
                    break
                # n == kb slots forces the K=kb bucket; the dummy map is
                # empty so the solve is vacuous and the result discarded.
                self._run_global_ba_sharded(
                    [0, 1, 2] + [0] * (kb - 3), self.GBA_CHUNK_ITERS,
                    commit=False)
        jax.block_until_ready(last)

    def _retire(self, rec):
        """Host half of a pipelined frame, one frame later: ONE
        device_get (async-prefetched, so usually sub-ms), then the
        state machine — superstep commit handlers, loss handling,
        keyframe decision + creation, trajectory bookkeeping."""
        tcfg = self.cfg.tracking
        with self.timer.stage("retire_fetch"):
            t0w = time.perf_counter()
            small, dvals = rec["fut"].result()
            self.retire_wait_ms.append(
                1e3 * (time.perf_counter() - t0w))
        # Handlers first (superstep cull/ref/loop + world corrections):
        # mirrors the sync ordering where _commit_mapping runs at frame
        # start before any tracking decision.
        self._world_moved = False
        for (_vec, meta, h), v in zip(rec["deferred"], dvals):
            h(_unpack_tree(v, meta))
        sv = np.asarray(small, np.float32)
        if self._use_depth:
            self._need_close = int(sv[25]) < 100 and int(sv[26]) > 70
        R = sv[:9].reshape(3, 3).copy()
        t = sv[9:12].copy()
        refR, reft = sv[13:22].reshape(3, 3), sv[22:25]
        n_inl = int(sv[12])
        self._last_ninl = n_inl
        if not self.frozen:
            vis, fnd = _bump_stats(self.ms.mp_visible, self.ms.mp_found,
                                   rec["vis_tgt"], rec["fnd_tgt"])
            self.ms = self.ms._replace(mp_visible=vis, mp_found=fnd)
        if n_inl < tcfg.min_inliers_track:
            self._pipe_fail += 1
            # Dead frame logs the last good pose as an absolute entry
            # (the sync loss path does the same).
            entry = np.concatenate([self.last_R.reshape(-1), self.last_t])
            self.trajectory.append(entry)
            self.traj_ref.append(-1)
            self.traj_rel.append(entry)
            if self._pipe_fail >= 2:
                # The in-flight retry (tracked from the last good pose
                # with zero velocity — the device carry holds exactly
                # that when a frame misses) also failed: hand over to
                # the loss state machine (reloc / Atlas recovery). The
                # pipelined misses count toward the loss patience —
                # they are lost frames exactly like the sync path's
                # (otherwise the Atlas recovery clock starts 2-3 frames
                # late and patience-boundary behavior depends on
                # pipeline depth).
                self.state = "LOST"
                self.lost_count = self._pipe_fail
                self._carry_valid = False
                self.vel_R = np.eye(3, dtype=np.float32)
                self.vel_t = np.zeros(3, np.float32)
            return
        recovered = self._pipe_fail > 0
        self._pipe_fail = 0
        if self._world_moved:
            # A handler transformed the world (loop correction / merge):
            # the fetched pose is in the PRE-correction frame. The
            # handler re-anchored last_R/last_t; keep those, log this
            # frame as a rel entry (rel chaining through the ref KF's
            # corrected pose absorbs the transform at export), and let
            # the next dispatch re-seed the device carry.
            self._carry_valid = False
            self.vel_R = np.eye(3, dtype=np.float32)
            self.vel_t = np.zeros(3, np.float32)
        elif recovered:
            # Re-entry across a gap: the step measures accumulated
            # drift, not motion (src/Tracking.cc:2153-2167).
            self.vel_R = np.eye(3, dtype=np.float32)
            self.vel_t = np.zeros(3, np.float32)
            self.last_R, self.last_t = R, t
        else:
            self.vel_R = R @ self.last_R.T
            self.vel_t = t - self.vel_R @ self.last_t
            self.last_R, self.last_t = R, t
        self.frames_since_kf += 1
        is_kf = False
        if not self._world_moved:
            is_kf = self._need_keyframe(n_inl)
        if is_kf:
            if self._use_depth:
                self._cur_stereo, self._cur_stereo_xc, \
                    self._cur_stereo_uvr = rec["stereo"]
            ts_save = self.last_ts
            self.last_ts = rec["ts"] if rec["ts"] is not None else ts_save
            self._create_keyframe(rec["feats"], R, t, rec["assoc"],
                                  n_inl)
            self.last_ts = ts_save
        if self.viz_recorder is not None:
            self.viz_recorder.on_frame(
                len(self.trajectory), rec.get("img"), rec["feats"],
                rec["assoc"], "OK" + (" KF" if is_kf else ""))
        # Trajectory (the producers at src/Tracking.cc:2274-2296).
        entry = np.concatenate([R.reshape(-1), t])
        self.trajectory.append(entry)
        if self.kf_slots:
            if is_kf:
                self.traj_ref.append(self.kf_slots[-1])
                self.traj_rel.append(np.concatenate(
                    [np.eye(3, dtype=np.float32).reshape(-1),
                     np.zeros(3, np.float32)]))
            else:
                refR = np.asarray(refR, np.float32)
                reft = np.asarray(reft, np.float32)
                R_cr = R @ refR.T
                t_cr = t - R_cr @ reft
                self.traj_ref.append(rec["ref"])
                self.traj_rel.append(np.concatenate(
                    [R_cr.reshape(-1), t_cr]).astype(np.float32))
        else:
            self.traj_ref.append(-1)
            self.traj_rel.append(entry)

    def _build_frame_program(self):
        """Build the fused per-frame device program for this tracker's
        sensor mode: extraction (+ stereo/RGBD depth association) +
        motion-model prediction + guided local-map tracking + the
        motion-model update, chained through a device-resident carry.
        This IS the production analog of tracking/step.py's bench
        kernel (SURVEY.md section 7.0: "the tracking step is one fused
        jitted program, host traffic image-in / pose-out")."""
        orb_cfg = self.cfg.orb
        sensor = self.cfg.sensor
        model = self.model
        cam_params = self.cam_params
        dist = self.dist
        scale_lut = self.scale_lut
        sigma2_lut = self.sigma2_lut
        inv_sigma2_lut = self.inv_sigma2_lut
        img_wh = self.img_wh
        min_ok = int(self.cfg.tracking.min_inliers_track)
        sched = ((2, 5), (3, 5)) if self._use_imu else ((2, 3), (2, 4))
        level_widen = bool(self._use_imu)
        use_depth = self._use_depth
        ba_stereo = self._ba_stereo
        fisheye = self._fisheye_stereo
        bf = jnp.float32(self.cfg.camera.bf)
        bf_f = float(self.cfg.camera.bf)
        depth_th = jnp.float32(self.depth_th)
        rig = self._rig
        cam_params_r = getattr(self, "cam_params_r", None)
        R_lr = getattr(self, "R_lr", None)
        t_lr = getattr(self, "t_lr", None)
        lap_l = getattr(self, "lapping_l", None)
        lap_r = getattr(self, "lapping_r", None)

        def fp(img, extra, carry, ms, mp_ids, aux):
            # aux packs the per-frame host scalars (dt_ratio, ref_slot)
            # into one tiny upload; img arrives as uint8 — the tunnel
            # wire cost of a float32 frame (~1.4 MB, 10-35 ms measured)
            # was the channel hog that delayed every completion behind
            # it (the per-frame readback rides the same ordered stream).
            dt_ratio = aux[0]
            ref_slot = aux[1].astype(jnp.int32)
            img = img.astype(jnp.float32)
            if sensor == "stereo":
                extra = extra.astype(jnp.float32)
            feats = extractor.extract(img, orb_cfg)
            if dist is not None:
                feats = feats._replace(uv=_undistort_uv(
                    feats.uv, cam_params, dist))
            stereo_t = (None, None, None)
            feats_ur = None
            feats_uvr = None
            rig_args = (None, None, None)
            if sensor == "stereo":
                feats_r = extractor.extract(extra, orb_cfg)
                if fisheye:
                    from tpuslam.frontend import stereo_fisheye
                    sm, xc, uvr = stereo_fisheye.match_stereo_fisheye(
                        feats, feats_r, cam_params, cam_params_r,
                        R_lr, t_lr, sigma2_lut, lap_l, lap_r)
                    stereo_t = (sm, xc, uvr)
                    feats_uvr = uvr
                    rig_args = rig
                else:
                    from tpuslam.frontend import stereo as stereo_mod
                    sm = stereo_mod.match_stereo(feats, feats_r,
                                                 scale_lut, bf_f)
                    sm = stereo_mod.refine_subpixel(img, extra, feats.uv,
                                                    sm, bf)
                    stereo_t = (sm, None, None)
                    feats_ur = sm.u_right
            elif sensor == "rgbd":
                from tpuslam.frontend.stereo import StereoMatches
                ui = jnp.clip(feats.uv[:, 0].astype(jnp.int32), 0,
                              extra.shape[1] - 1)
                vi = jnp.clip(feats.uv[:, 1].astype(jnp.int32), 0,
                              extra.shape[0] - 1)
                z = extra[vi, ui]
                okz = feats.valid & (z > 0)
                disp = bf / jnp.maximum(z, 1e-6)
                sm = StereoMatches(
                    disparity=jnp.where(okz, disp, -1.0),
                    u_right=jnp.where(okz, feats.uv[:, 0] - disp, -1.0),
                    depth=jnp.where(okz, z, jnp.inf), valid=okz)
                stereo_t = (sm, None, None)
                feats_ur = sm.u_right
            # Constant-velocity prediction, dt-scaled on the manifold.
            w = lie.so3_log(carry.vel_R) * dt_ratio
            vel_R_s = lie.so3_exp(w)
            R_pred = vel_R_s @ carry.R
            t_pred = vel_R_s @ carry.t + carry.vel_t * dt_ratio
            cap = ms.mp_capacity
            safe = jnp.clip(mp_ids, 0, cap - 1)
            mp_ok = (mp_ids >= 0) & ms.mp_valid[safe]
            R, t, assoc, n_inl, visible_ids, found_ids = _track_pose_impl(
                R_pred, t_pred, mp_ids, ms.mp_pos[safe],
                ms.mp_desc[safe], ms.mp_level[safe], mp_ok,
                ms.mp_normal[safe], ms.mp_dist_min[safe],
                ms.mp_dist_max[safe],
                feats, cam_params, scale_lut, inv_sigma2_lut, img_wh,
                model=model, sched=sched, level_widen=level_widen,
                feats_ur=(feats_ur if ba_stereo else None), bf=bf,
                feats_uvr=(feats_uvr if fisheye else None),
                rig=rig_args)
            ok = n_inl >= min_ok
            eye = jnp.eye(3, dtype=jnp.float32)
            zero3 = jnp.zeros((3,), jnp.float32)
            vel_R_new = jnp.where(ok, R @ carry.R.T, eye)
            vel_t_new = jnp.where(ok, t - vel_R_new @ carry.t, zero3)
            carry2 = _FrameCarry(
                R=jnp.where(ok, R, carry.R),
                t=jnp.where(ok, t, carry.t),
                vel_R=vel_R_new, vel_t=vel_t_new)
            vis_tgt = jnp.where(ok & (visible_ids >= 0), visible_ids, cap)
            fnd_tgt = jnp.where(ok & (found_ids >= 0), found_ids, cap)
            rs = jnp.clip(ref_slot, 0, ms.kf_capacity - 1)
            # ONE packed f32 vector instead of a scalar tuple: each
            # fetched leaf costs its own tunnel RPC (~10 ms measured
            # when not yet landed), so the per-frame host readback is a
            # single leaf. Layout: R[0:9] t[9:12] n_inl[12] refR[13:22]
            # reft[22:25] (+ close-point counts [25:27] for depth
            # sensors).
            parts = [R.reshape(-1), t, n_inl.astype(jnp.float32)[None],
                     ms.kf_R[rs].reshape(-1), ms.kf_t[rs]]
            if use_depth:
                sm = stereo_t[0]
                close = sm.valid & (sm.depth < depth_th)
                tracked = assoc >= 0
                parts.append(jnp.stack(
                    [jnp.sum(close & tracked).astype(jnp.float32),
                     jnp.sum(close & ~tracked).astype(jnp.float32)]))
            small = jnp.concatenate(parts)
            return carry2, small, feats, assoc, vis_tgt, fnd_tgt, stereo_t

        return jax.jit(fp)

    def _defer(self, tree, handler):
        """Queue device scalars for a deferred host fetch: the tree is
        packed into ONE device vector (one tunnel RPC at fetch time)
        and its async host copy starts now; the values land in the
        handler at the next frame's retire (pipelined) or the next
        _commit_mapping (sync)."""
        vec, meta = _pack_tree(tree)
        _prefetch(vec)
        self._deferred.append((vec, meta, handler))

    def flush(self):
        """Retire any in-flight pipelined frame, commit any pending
        deferred mapping superstep, and drain queued background
        global-BA chunks — the reference joins its GBA child thread on
        Shutdown (src/System.cc:498). Call before reading summary state
        (stats, loop/merge counters, n_mp) outside the per-frame loop."""
        while self._inflight:
            self._retire(self._inflight.pop(0))
        while self._deferred:
            # A drained handler may defer the next phase of a loop/merge
            # job (verify -> correct) — keep draining until quiescent.
            self._commit_mapping()
        while getattr(self, "_gba_left", 0):
            self._gba_step(force=True)

    def packed_trajectory(self) -> list:
        """Per-frame absolute camera poses (12 floats: R|t), relative
        entries chained through their reference keyframe's CURRENT pose
        so every map correction since track time is reflected."""
        self.flush()
        kf_R = np.asarray(self.ms.kf_R)
        kf_t = np.asarray(self.ms.kf_t)
        out = []
        for ref, rel in zip(self.traj_ref, self.traj_rel):
            if ref < 0:
                out.append(rel)   # absolute entry (kept world-current
                continue          # by _apply_scaled_rotation)
            R_cr = rel[:9].reshape(3, 3)
            t_cr = rel[9:]
            R = R_cr @ kf_R[ref]
            t = R_cr @ kf_t[ref] + t_cr
            out.append(np.concatenate([R.reshape(-1), t]))
        return out

    def positions(self) -> np.ndarray:
        """Camera centers (world frame) per processed frame."""
        out = []
        for p in self.packed_trajectory():
            R = p[:9].reshape(3, 3)
            t = p[9:]
            out.append(-R.T @ t)
        return np.stack(out) if out else np.zeros((0, 3))

    # -- initialization -----------------------------------------------------

    def _initialize(self, feats: FrameFeatures) -> FrameResult:
        if self._use_depth:
            return self._initialize_stereo(feats)
        tcfg = self.cfg.tracking
        n_valid = int(jnp.sum(feats.valid))
        if self.init_feats is None:
            if n_valid >= tcfg.init_min_matches:
                self.init_feats = feats
                self._init_ts = self.last_ts
                self.init_age = 0
            return FrameResult("NOT_INITIALIZED", self.last_R, self.last_t, 0)

        self.init_age += 1
        res = _init_match(self.init_feats, feats)
        n_match = int(jnp.sum(res.idx >= 0))
        if n_match < tcfg.init_min_matches:
            if self.init_age > 20 and n_valid >= tcfg.init_min_matches:
                self.init_feats = feats
                self._init_ts = self.last_ts
                self.init_age = 0
            return FrameResult("NOT_INITIALIZED", self.last_R, self.last_t,
                               n_match)

        from tpuslam.geometry import cameras

        fa, fb = self.init_feats, feats
        kp_b = jnp.clip(res.idx, 0, fb.capacity - 1)
        b1 = cameras.unproject(fa.uv, self.cam_params, self.model)
        b2 = cameras.unproject(fb.uv[kp_b], self.cam_params, self.model)
        self.key, sub = jax.random.split(self.key)
        rec = _reconstruct(b1, b2, res.idx >= 0, sub,
                           focal=float(self.cfg.camera.fx))
        if os.environ.get("TPUSLAM_INIT_DEBUG"):
            print(f"[init] ok={bool(rec.ok)} model="
                  f"{'H' if bool(rec.used_h) else 'E'} "
                  f"good={int(jnp.sum(rec.good))} inl={int(rec.n_inliers)}",
                  flush=True)
        if not bool(rec.ok) or int(jnp.sum(rec.good)) < tcfg.init_min_tri:
            return FrameResult("NOT_INITIALIZED", self.last_R, self.last_t,
                               n_match)

        # --- create the initial map (CreateInitialMapMonocular,
        # src/Tracking.cc:2520): normalize median depth to 1.
        good = np.asarray(rec.good)
        X = np.asarray(rec.X1)
        med_depth = float(np.median(X[good][:, 2]))
        s = 1.0 / max(med_depth, 1e-6)
        X = X * s
        R1 = np.asarray(rec.R21)
        t1 = np.asarray(rec.t21) * s

        good_j = rec.good
        if fa.capacity > self.n_feat:
            # Boosted-init frames carry n_init_features_mult x the pool
            # budget: compress both keyframes back to n_feat keypoints,
            # triangulated ones first, then by response (the static-shape
            # version of the reference's 5x init extractor whose frames
            # keep all features, Tracking.cc:838-844).
            fa, fb, kp_b, good_j, X = self._compress_init(
                fa, fb, kp_b, good, X)

        ms = self.ms
        eye = jnp.eye(3, dtype=jnp.float32)
        zero = jnp.zeros(3, jnp.float32)
        ms = mapstate.add_keyframe(ms, 0, eye, zero, fa,
                                   jnp.full((self.n_feat,), -1, jnp.int32))
        ms = mapstate.add_keyframe(ms, 1, jnp.asarray(R1), jnp.asarray(t1),
                                   fb, jnp.full((self.n_feat,), -1, jnp.int32))
        ms, n_new = mapstate.add_points(
            ms, jnp.int32(0),
            jnp.asarray(X), fa.desc, fa.level, good_j,
            0, jnp.arange(self.n_feat, dtype=jnp.int32),
            1, kp_b.astype(jnp.int32),
            scale_lut=self.scale_lut,
        )
        self.n_mp = int(n_new)
        self.n_kf = 2
        self.kf_slots = [0, 1]
        self._covis_host = None
        self.kf_ts[0] = getattr(self, "_init_ts", None)
        self.kf_ts[1] = self.last_ts

        # Initial BA over the two views (GlobalBundleAdjustemnt(20),
        # src/Tracking.cc:2573), KF0 fixed; then re-normalize depth.
        kf_ids, fixed, mp_ids, local = self._window(free=1)
        ms, chi2 = _run_local_ba(ms, kf_ids, fixed, mp_ids, local,
                                 self.inv_sigma2_lut, self.cam_params,
                                 iters=15, model=self.model,
                                 n_free=self.cfg.map.local_window)
        # Re-normalize scale: median depth of valid points in KF1 frame.
        pos = np.asarray(ms.mp_pos[: self.cfg.map.ba_point_cap])
        val = np.asarray(ms.mp_valid[: self.cfg.map.ba_point_cap])
        if val.sum() < tcfg.init_min_tri:
            # BA rejected too much — reset initialization.
            self._reset_init()
            return FrameResult("NOT_INITIALIZED", self.last_R, self.last_t,
                               n_match)
        med = float(np.median(pos[val][:, 2]))
        s2 = 1.0 / max(med, 1e-6)
        ms = ms._replace(
            mp_pos=ms.mp_pos * s2,
            kf_t=ms.kf_t * s2,
            mp_dist_min=ms.mp_dist_min * s2,
            mp_dist_max=ms.mp_dist_max * s2,
        )

        self.ms = ms
        self.state = "OK"
        if self._use_imu:
            # KF1 is the root of the keyframe preintegration chain.
            from tpuslam.imu import preintegration as pre
            self.cur_preint = pre.init_state(jnp.asarray(self.bg),
                                             jnp.asarray(self.ba))
        self.last_R = np.asarray(ms.kf_R[1])
        self.last_t = np.asarray(ms.kf_t[1])
        # Velocity guess: relative motion of the two init keyframes spread
        # over init_age frames is unknown — start from zero velocity.
        self.vel_R = np.eye(3, dtype=np.float32)
        self.vel_t = np.zeros(3, np.float32)
        self.frames_since_kf = 0
        self.ref_tracked = int(jnp.sum(good_j))
        self.stats["kf"] = 2
        self.stats["mp"] = self.n_mp
        return FrameResult("OK", self.last_R, self.last_t, self.ref_tracked,
                           is_keyframe=True)

    def _compress_init(self, fa, fb, kp_b, good, X):
        """Select the n_feat best keypoints of each boosted init frame
        (triangulated first, then valid-by-response) and remap the
        match/triangulation arrays onto the compressed rows. Host numpy:
        initialization is a rare host-interactive event."""
        n = self.n_feat
        resp_a = np.asarray(fa.response)
        valid_a = np.asarray(fa.valid)
        key_a = (~good).astype(np.int64) * 2 + (~valid_a).astype(np.int64) * 4
        sel_a = np.sort(np.lexsort((-resp_a, key_a))[:n])
        kp_b_np = np.asarray(kp_b)
        good_a = good[sel_a]
        matched_b = kp_b_np[sel_a][good_a]
        in_matched = np.zeros(fb.capacity, bool)
        in_matched[matched_b] = True
        resp_b = np.asarray(fb.response)
        valid_b = np.asarray(fb.valid)
        key_b = (~in_matched).astype(np.int64) * 2 \
            + (~valid_b).astype(np.int64) * 4
        sel_b = np.sort(np.lexsort((-resp_b, key_b))[:n])
        b_newrow = np.zeros(fb.capacity, np.int32)
        b_newrow[sel_b] = np.arange(n, dtype=np.int32)
        has_b = np.zeros(fb.capacity, bool)
        has_b[sel_b] = True
        kp_b_new = b_newrow[kp_b_np[sel_a]]
        good_new = good_a & has_b[kp_b_np[sel_a]]

        def gather(f, idx):
            i = jnp.asarray(idx)
            return jax.tree_util.tree_map(lambda a: a[i], f)

        return (gather(fa, sel_a), gather(fb, sel_b),
                jnp.asarray(kp_b_new), jnp.asarray(good_new), X[sel_a])

    def _track_recently_lost(self, feats: FrameFeatures) -> FrameResult:
        """IMU dead-reckoning grace period (src/Tracking.cc:1800,
        1835-1874): each frame first RETRIES guided local-map tracking
        from the IMU-predicted pose (PredictStateIMU feeding
        TrackLocalMap — the camera usually reconnects as soon as mapped
        space is back in view), falls back to relocalization, and keeps
        dead-reckoning otherwise; after time_recently_lost seconds
        without visual recovery the state drops to LOST (Atlas
        elastic-recovery path)."""
        t0 = self._lost_t0
        # Prediction-free local-map PnP FIRST: after a long gap the
        # dead-reckoned prediction can be off by more than any guided
        # window, and a widened window false-locks on repetitive texture
        # (measured: a 48 px window produced a 21-inlier fit 0.57 m off
        # that collapsed visibility 478 -> 113 one frame later).
        # Geometric RANSAC consensus over the whole local window is
        # alias-robust where the prediction prior is not.
        rec = self._reenter_local_pnp(feats)
        if rec is None:
            self.state = "OK"
            out = self._track(feats, reentry=True)
            if out.state == "OK":
                self.lost_count = 0
                return out
            self._lost_t0 = t0      # keep the original grace clock
            self.state = "RECENTLY_LOST"
        if rec is None:
            ok, R, t, n = loop_closing.relocalize(
                self.loop, self.ms, feats, self.cam_params,
                self.inv_sigma2_lut)
            if ok:
                rec = (R, t, n)
        if rec is not None:
            R, t, n = rec
            self.state = "OK"
            self.lost_count = 0
            self.last_R, self.last_t = R, t
            self.vel_R = np.eye(3, dtype=np.float32)
            self.vel_t = np.zeros(3, np.float32)
            # Fresh anchor after relocalization (ResetFrameIMU role,
            # src/Tracking.cc:1548).
            self.prior_H = None
            self.body_state = None
            self._map_updated = True
            return FrameResult("OK", R, t, n)
        if self.frame_preint is not None:
            R_pred, t_pred, vel = self._imu_predict()
            self.last_R = np.asarray(R_pred)
            self.last_t = np.asarray(t_pred)
            self.vel = np.asarray(vel)
        t_lost = ((len(self.trajectory) - self._lost_t0)
                  / self.cfg.camera.fps)
        if t_lost > self.cfg.tracking.time_recently_lost:
            self.state = "LOST"
            self.lost_count = 0
        return FrameResult("RECENTLY_LOST", self.last_R, self.last_t, 0)

    def _reenter_local_pnp(self, feats: FrameFeatures):
        """RECENTLY_LOST re-acquisition by geometric consensus.

        A wide guided window alone false-locks: GN from the drifted
        prediction converges onto whatever alias associations the first
        round found (measured: a 48 px window produced a 21-inlier fit
        0.57 m off that collapsed visibility 478 -> 113 one frame
        later). Instead, collect the wide-window guided match set from
        the dead-reckoned prediction and let batched EPnP-RANSAC pick
        the rigid-consistent subset — the prediction only PREFILTERS
        candidates; the pose comes from consensus (the role MLPnP
        RANSAC plays in the reference's reloc, src/Tracking.cc:3811).
        Falls back to prediction-free brute matching when there is no
        IMU prediction to guide with. Returns (R, t, n_inliers) or
        None; the >=30-inlier verification mirrors the reference's
        reloc acceptance (nGood >= 50 at full feature count, scaled to
        the thinner post-gap overlap)."""
        from tpuslam.geometry import cameras
        from tpuslam.solver import pnp

        _, _, mp_ids, _ = self._window()
        safe = jnp.clip(mp_ids, 0, self.ms.mp_capacity - 1)
        ok = (mp_ids >= 0) & self.ms.mp_valid[safe]
        mask = None
        if (self._use_imu and self.imu_initialized
                and self.frame_preint is not None):
            R_pred, t_pred, _ = self._imu_predict()
            Xc = jnp.einsum("ij,pj->pi", R_pred, self.ms.mp_pos[safe]) \
                + t_pred
            uv_pred = cameras.project(Xc, self.cam_params, self.model)
            ok = ok & (Xc[:, 2] > 0.05)
            d = jnp.linalg.norm(uv_pred[:, None] - feats.uv[None], axis=-1)
            mask = d <= 64.0
        # No Lowe ratio, no mutual gate: the map holds near-duplicate
        # descriptors (multi-view observations of the same structure),
        # which those gates misread as ambiguity and starve the pair
        # set (measured 36 -> 6 pairs). RANSAC's geometric consensus is
        # the outlier filter here.
        res = matching.match(self.ms.mp_desc[safe], feats.desc, ok,
                             feats.valid, mask=mask,
                             max_dist=matching.TH_HIGH, ratio=1.0)
        valid = res.idx >= 0
        if int(jnp.sum(valid)) < 20:
            return None
        kp = jnp.clip(res.idx, 0, feats.capacity - 1)
        bear = cameras.unproject(feats.uv, self.cam_params, self.model)
        self.key, sub = jax.random.split(self.key)
        hyp = pnp.ransac_pnp(
            self.ms.mp_pos[safe], bear[kp], valid, sub,
            inlier_th=8.0 / float(self.cfg.camera.fx), min_inliers=12,
            n_hyp=512)
        if os.environ.get("TPUSLAM_TRACK_DEBUG"):
            print(f"[pnp-reenter] pairs={int(jnp.sum(valid))} "
                  f"ok={bool(hyp.ok)} inl={int(hyp.n_inliers)}",
                  flush=True)
        if not bool(hyp.ok):
            return None
        inv_s2 = self.inv_sigma2_lut[jnp.clip(
            feats.level, 0, self.inv_sigma2_lut.shape[0] - 1)]
        opt = pose_opt.optimize_pose(
            hyp.R, hyp.t, self.ms.mp_pos[safe], feats.uv[kp], inv_s2[kp],
            valid, self.cam_params, model=self.model)
        if os.environ.get("TPUSLAM_TRACK_DEBUG"):
            print(f"[pnp-reenter] gn_inl={int(opt.n_inliers)}", flush=True)
        # Accept on combined evidence: a rigid consensus of >=25 at the
        # loose RANSAC threshold AND >=18 survivors of the strict-chi2
        # GN polish (the post-gap overlap is a fraction of the normal
        # ~nGood>=50 reloc regime, src/Tracking.cc:3908).
        if int(hyp.n_inliers) < 25 or int(opt.n_inliers) < 18:
            return None
        return np.asarray(opt.R), np.asarray(opt.t), int(opt.n_inliers)

    def _initialize_stereo(self, feats: FrameFeatures) -> FrameResult:
        """StereoInitialization (/root/reference/src/Tracking.cc:2301):
        one frame with enough sensor-depth keypoints seeds a METRIC map
        directly — no two-view reconstruction, no scale normalization."""
        sm = self._cur_stereo
        if sm is None:
            return FrameResult("NOT_INITIALIZED", self.last_R, self.last_t,
                               0)
        n_depth = int(jnp.sum(sm.valid & feats.valid
                              & (sm.depth < self.depth_th)))
        # N > 500 depth points to initialize (Tracking.cc:2306).
        # Fisheye rigs run a deliberately STRICT matcher (precision over
        # recall — see stereo_fisheye.match_stereo_fisheye) and yield
        # ~300 high-precision pairs where the rectified scanline path
        # yields 700+; the lower gate reflects the same map quality.
        min_init = 250 if self._fisheye_stereo else 500
        if n_depth < min_init:
            return FrameResult("NOT_INITIALIZED", self.last_R, self.last_t,
                               n_depth)
        slot = self._alloc_kf_slot()
        eye = jnp.eye(3, dtype=jnp.float32)
        zero = jnp.zeros(3, jnp.float32)
        self.ms = mapstate.add_keyframe(
            self.ms, slot, eye, zero, feats,
            jnp.full((self.n_feat,), -1, jnp.int32),
            ur=sm.u_right)
        self.ms, n_new = _spawn_stereo_points(
            self.ms, slot, sm.depth, sm.valid, jnp.int32(self.n_mp),
            self.cam_params, self.scale_lut, jnp.float32(self.depth_th),
            xc=self._cur_stereo_xc)
        self.n_mp += int(n_new)
        self.kf_slots = [slot]
        self._covis_host = None
        self.kf_ts[slot] = self.last_ts
        self.last_R = np.eye(3, dtype=np.float32)
        self.last_t = np.zeros(3, np.float32)
        self.vel_R = np.eye(3, dtype=np.float32)
        self.vel_t = np.zeros(3, np.float32)
        self.state = "OK"
        self.frames_since_kf = 0
        if self._use_imu:
            # The init keyframe roots the keyframe preintegration chain
            # (stereo-inertial StereoInitialization sets
            # mpImuPreintegratedFromLastKF the same way,
            # /root/reference/src/Tracking.cc:2311-2316).
            from tpuslam.imu import preintegration as pre
            self.cur_preint = pre.init_state(jnp.asarray(self.bg),
                                             jnp.asarray(self.ba))
            self.kf_vel[slot] = (self.vel.copy()
                                 if self.vel is not None else None)
        self.ref_tracked = max(int(n_new), 1)
        if self.enable_loop_closing:
            loop_closing.on_new_keyframe(self.loop, self.ms, slot)
        self.stats = {"kf": 1, "mp": self.n_mp, "loops": 0,
                      "merges": self.n_merges}
        return FrameResult("OK", self.last_R, self.last_t, int(n_new),
                           is_keyframe=True)

    def _new_map_in_atlas(self):
        """Archive the current map (if it earned enough keyframes) and
        start a fresh active map — the Atlas elastic-recovery path."""
        from tpuslam.mapping.atlas import ArchivedMap

        # Apply any in-flight superstep commits to the outgoing map
        # BEFORE archiving it (their handlers reference its slots).
        self.flush()
        kept = self.atlas.archive(ArchivedMap(
            ms=self.ms, kf_slots=list(self.kf_slots), n_kf=self.n_kf,
            n_mp=self.n_mp, trajectory=list(self.trajectory),
            n_loops=self.n_loops_closed,
            frame_range=(self._map_start_frame, len(self.trajectory)),
            loop_edges=list(self.loop.loop_edges) if self.loop else [],
            imu_initialized=self.imu_initialized,
            db=self.loop.db if self.loop else None,
        ))
        # Bake the relative trajectory to absolute: keyframe slots are
        # about to be recycled by the new map, so old entries must stop
        # referencing them. The archived map is frozen — its frames'
        # poses only change again if merge.weld transforms that map.
        packed = self.packed_trajectory()
        self.traj_rel = [np.asarray(p, np.float32) for p in packed]
        self.traj_ref = [-1] * len(packed)
        self._map_start_frame = len(self.trajectory)
        self._reset_init()
        self.loop = loop_closing.LoopState.create(self.cfg.map.max_keyframes)
        self.state = "NOT_INITIALIZED"
        self.lost_count = 0
        self.vel_R = np.eye(3, dtype=np.float32)
        self.vel_t = np.zeros(3, np.float32)
        return kept

    def _reset_init(self):
        self.ms = mapstate.empty(self.cfg.map.max_keyframes,
                                 self.cfg.map.max_points, self.n_feat)
        self.init_feats = None
        self.n_kf = 0
        self.n_mp = 0
        self.kf_slots = []
        self._covis_host = None
        self.free_kf_slots = []
        self.kf_ts = {}
        # Pipeline state dies with the map.
        self._inflight = []
        self._deferred = []
        self._carry_valid = False
        self._superstep_busy = False
        self._pipe_fail = 0
        self._win_count_est = 0
        self._loop_job = None
        self._invalidate_kf_set()
        if self._use_imu:
            # New map => new (non-metric) scale regime: the old map's
            # preintegration chain, metric velocity, and init bookkeeping
            # must not leak into it (slot keys get reused). Biases persist
            # — they are sensor properties (the reference's CreateMapInAtlas
            # keeps the last bias, src/Tracking.cc:2658).
            from tpuslam.imu import preintegration as pre

            self.kf_preint = {}
            self.kf_vel = {}
            self.imu_initialized = False
            self.vel = np.zeros(3, np.float32)
            self.cur_preint = pre.init_state(jnp.asarray(self.bg),
                                             jnp.asarray(self.ba))
            self.frame_preint = None
            self._init_scale_prev = None

    # -- multi-map merging ---------------------------------------------------

    def _merge_maps(self, mi: int, cand: int, slot: int,
                    s_cl, R_cl, t_cl) -> bool:
        """Weld the active map and archived map `mi` into one session
        (LoopClosing::MergeLocal, /root/reference/src/LoopClosing.cc:1450).

        Direction: visual sessions weld the ACTIVE map into the archived
        one (older, usually larger; its world frame wins). Once the IMU
        is initialized the active map is metric and gravity-aligned, so
        the roles flip and the archived map is welded into the active
        frame instead (MergeLocal2's choice, src/LoopClosing.cc:2282).

        `verify_loop` gave x_cand_cam = s R x_cur_cam + t with `cand` in
        the archived map and `slot` (current KF) in the active one.
        Returns False (no state change) if the destination pool cannot
        hold the source map."""
        from tpuslam.mapping import merge as mg

        am = self.atlas.maps[mi]
        into_archived = not self.imu_initialized
        if into_archived:
            ms_dst, ms_src = am.ms, self.ms
            src_slots = self.kf_slots
            w = mg.world_sim3_from_kf_pair(
                am.ms, cand, self.ms, slot, s_cl, R_cl, t_cl)
        else:
            ms_dst, ms_src = self.ms, am.ms
            src_slots = am.kf_slots
            s_i = 1.0 / float(s_cl)
            R_i = np.asarray(R_cl).T
            t_i = -s_i * (R_i @ np.asarray(t_cl))
            w = mg.world_sim3_from_kf_pair(
                self.ms, slot, am.ms, cand, s_i, R_i, t_i)
        plan = mg.plan_slot_maps(ms_dst, ms_src, src_slots)
        if plan is None:
            return False
        kf_map, mp_map, kf_remap = plan
        # Slot ids are remapped below: any deferred covisibility
        # snapshot keyed by an old id would alias a different keyframe.
        self._covis_host = None
        ms = mg.weld(ms_dst, ms_src, jnp.asarray(kf_map),
                     jnp.asarray(mp_map), jnp.float32(w.s),
                     jnp.asarray(w.R), jnp.asarray(w.t))
        new_mp = np.zeros((ms.mp_capacity,), bool)
        new_mp[mp_map[mp_map >= 0]] = True
        with self.timer.stage("merge_fuse"):
            ms, n_fused = mg.fuse_duplicate_points(
                ms, jnp.asarray(new_mp), ms_dst.mp_valid)
        self.ms = ms

        sRw = float(w.s) * np.asarray(w.R)
        if into_archived:
            moved_range = (self._map_start_frame, len(self.trajectory))
            new_ts = {kf_remap[s]: self.kf_ts.get(s)
                      for s in self.kf_slots if s in kf_remap}
            self.kf_slots = list(am.kf_slots) + [
                kf_remap[s] for s in self.kf_slots if s in kf_remap]
            self.kf_ts = new_ts
            cur_slot = kf_remap[slot]
            if self._use_imu:
                self.kf_preint = {kf_remap[k]: v
                                  for k, v in self.kf_preint.items()
                                  if k in kf_remap}
                self.kf_vel = {kf_remap[k]:
                               (sRw @ v if v is not None else None)
                               for k, v in self.kf_vel.items()
                               if k in kf_remap}
                if self.vel is not None:
                    self.vel = (sRw @ self.vel).astype(np.float32)
                # Archived map's metric status wins (it is the frame we
                # welded into); its ladder is considered finished.
                self.imu_initialized = am.imu_initialized
                if self.imu_initialized:
                    self._init_frame = len(self.trajectory)
                    self._imu_stage = 2
                    self._last_scale_ref = 0.0
        else:
            moved_range = am.frame_range
            self.kf_slots = [kf_remap[s] for s in am.kf_slots
                             if s in kf_remap] + list(self.kf_slots)
            cur_slot = slot

        # Transform the moved session's per-frame trajectory entries
        # into the merged world (mlRelativeFramePoses update in
        # CorrectLoop/MergeLocal; relative entries: R_cr invariant,
        # t_cr scales by s_w; absolute entries transform like cameras:
        # R' = R R_w^T, t' = s_w t - R' t_w).
        Rw_T = np.asarray(w.R).T
        for i in range(moved_range[0], min(moved_range[1],
                                           len(self.traj_rel))):
            p = self.traj_rel[i]
            ref = self.traj_ref[i]
            if ref >= 0:
                if into_archived and ref in kf_remap:
                    self.traj_ref[i] = kf_remap[ref]
                    self.traj_rel[i] = np.concatenate(
                        [p[:9], w.s * p[9:]]).astype(np.float32)
                    continue
                if not into_archived:
                    # active-session refs keep their slots; nothing moves
                    continue
                # ref was culled before the merge: bake via the pre-merge
                # source map, then fall through to the absolute rule.
                R_cr = p[:9].reshape(3, 3)
                R_ref = np.asarray(ms_src.kf_R[ref])
                t_ref = np.asarray(ms_src.kf_t[ref])
                R_abs = R_cr @ R_ref
                t_abs = R_cr @ t_ref + p[9:]
                p = np.concatenate([R_abs.reshape(-1), t_abs])
                self.traj_ref[i] = -1
            R_a = p[:9].reshape(3, 3) @ Rw_T
            t_a = w.s * p[9:] - R_a @ np.asarray(w.t)
            self.traj_rel[i] = np.concatenate(
                [R_a.reshape(-1), t_a]).astype(np.float32)

        # Pool counters from the merged validity masks.
        kf_valid = np.asarray(self.ms.kf_valid)
        mp_valid = np.asarray(self.ms.mp_valid)
        self.n_kf = (int(np.max(np.nonzero(kf_valid)[0])) + 1
                     if kf_valid.any() else 0)
        self.free_kf_slots = [int(i) for i in range(self.n_kf)
                              if not kf_valid[i]]
        self.n_mp = (int(np.max(np.nonzero(mp_valid)[0])) + 1
                     if mp_valid.any() else 0)

        # Rebuild the retrieval index over the merged keyframe set and
        # carry the Sim3 constraint history across (remapped for the
        # moved map); the seam itself becomes a loop edge for future
        # pose graphs (AddLoopEdge role, used at Optimizer.cc:2414).
        new_ls = loop_closing.LoopState.create(self.cfg.map.max_keyframes)
        for s in self.kf_slots:
            new_ls.db = retrieval.mark_keyframe(
                new_ls.db, s, self.ms.kf_desc[s],
                self.ms.kf_kp_valid[s], self.ms.kf_response[s])
        moved_edges, kept_edges = (
            (self.loop.loop_edges, am.loop_edges) if into_archived
            else (am.loop_edges, self.loop.loop_edges))
        for (ei, ej, es, eR, et) in kept_edges:
            new_ls.loop_edges.append((ei, ej, es, eR, et))
        for (ei, ej, es, eR, et) in moved_edges:
            if ei in kf_remap and ej in kf_remap:
                new_ls.loop_edges.append(
                    (kf_remap[ei], kf_remap[ej], es, eR,
                     np.asarray(w.s * np.asarray(et), np.float32)))
        seam_a = kf_remap[cand] if not into_archived else cand
        R_sa = np.asarray(self.ms.kf_R[seam_a])
        t_sa = np.asarray(self.ms.kf_t[seam_a])
        R_sb = np.asarray(self.ms.kf_R[cur_slot])
        t_sb = np.asarray(self.ms.kf_t[cur_slot])
        R_rel = R_sa @ R_sb.T
        t_rel = t_sa - R_rel @ t_sb
        new_ls.loop_edges.append((cur_slot, seam_a, 1.0,
                                  R_rel.astype(np.float32),
                                  t_rel.astype(np.float32)))
        new_ls.last_loop_order = len(self.kf_slots) - 1  # cooldown
        self.loop = new_ls

        # Session pose state continues from the merged current keyframe.
        self.last_R = np.asarray(self.ms.kf_R[cur_slot])
        self.last_t = np.asarray(self.ms.kf_t[cur_slot])
        self.vel_R = np.eye(3, dtype=np.float32)
        self.vel_t = np.zeros(3, np.float32)
        self._invalidate_kf_set()
        self._map_start_frame = 0   # one session now spans everything
        if self._use_imu:
            self._map_updated = True
            self.prior_H = None
            self.body_state = None
        self.atlas.maps.pop(mi)

        # Welding bundle adjustment over the seam: the covisibility
        # window of the current keyframe now spans both maps through the
        # fused landmarks (MergeBundleAdjustmentVisual,
        # /root/reference/src/Optimizer.cc:6040).
        with self.timer.stage("merge_weld_ba"):
            kf_ids, fixed, mp_ids, local = self._window()
            self.ms, _ = _run_local_ba(
                self.ms, kf_ids, fixed, mp_ids, local,
                self.inv_sigma2_lut, self.cam_params,
                iters=self.cfg.solver.ba_iters, model=self.model,
                stereo=self._ba_stereo,
                bf=jnp.float32(self.cfg.camera.bf),
                n_free=self.cfg.map.local_window,
                fisheye=self._fisheye_stereo, rig=self._rig,
            )
        self.last_R = np.asarray(self.ms.kf_R[cur_slot])
        self.last_t = np.asarray(self.ms.kf_t[cur_slot])
        return True

    # -- tracking -----------------------------------------------------------

    def _window_slots(self, free_target: int):
        """Select the local window: free = reference KF + most covisible
        KFs; fixed = the next covisible ring (UpdateLocalKeyFrames K1∪K2,
        /root/reference/src/Tracking.cc:3590; LocalBundleAdjustment's
        free/fixed rings, Optimizer.cc:1776). Returns (slots, fixed_mask)
        in temporal order. Falls back to the temporal window while the
        map is young."""
        mcfg = self.cfg.map
        slots = self.kf_slots
        n = len(slots)
        pos = {s: i for i, s in enumerate(slots)}
        W_total = mcfg.local_window + mcfg.local_fixed
        if n <= W_total:
            chosen = list(slots)
            n_free = min(free_target, max(n - 2, n - 1 if n <= 2 else 0, 0))
            free_set = set(chosen[n - n_free:])
            return chosen, free_set

        ref = slots[-1]
        # Covisibility ranking weights: prefer the snapshot the previous
        # superstep dispatched + deferred-fetched (landed ~free), over a
        # blocking fetch-after-dispatch here — measured 80-160 ms on the
        # network-attached chip (the tunnel serves a fresh dependent
        # fetch far slower than an async-copied one). The snapshot is
        # one keyframe stale (ranked from the PREVIOUS reference's
        # perspective) which only perturbs the covisibility RANKING —
        # the free seeds below pin the temporal window regardless, and
        # the reference's local-map selection tolerates exactly this
        # kind of staleness across its thread queues
        # (UpdateLocalKeyFrames, /root/reference/src/Tracking.cc:3590).
        snap = getattr(self, "_covis_host", None)
        if snap is not None and snap[0] in pos:
            cw = snap[1]
            wts = np.zeros((max(s for s in slots) + 1,), np.int32)
            m = min(len(cw), len(wts))
            wts[:m] = cw[:m]
        else:
            wts = np.asarray(mapstate.covisibility_weights(self.ms, ref))
        # Free set: the reference KF, its 2 temporal predecessors (the
        # triangulation partners), then covisibility-ranked.
        free_set = {ref, slots[-2], slots[-3]}
        ranked = sorted((s for s in slots[:-3] if wts[s] > 0),
                        key=lambda s: -int(wts[s]))
        for s in ranked:
            if len(free_set) >= free_target:
                break
            free_set.add(s)
        # Fixed ring: next covisible KFs (they anchor gauge + scale).
        fixed_ring = [s for s in ranked if s not in free_set]
        fixed_set = fixed_ring[: mcfg.local_fixed]
        # >=2 fixed anchors whenever possible: with fewer the monocular
        # scale gauge is unpinned and sliding-window BA drifts the local
        # map against the rest (observed as map corruption ~10 KFs in).
        while len(fixed_set) < 2:
            # Take the temporally-oldest free KF (keep ref free).
            old = min((s for s in free_set if s != ref),
                      key=lambda s: pos[s], default=None)
            if old is None:
                break
            free_set.discard(old)
            fixed_set.append(old)
        chosen = sorted(free_set | set(fixed_set), key=lambda s: pos[s])
        return chosen, free_set

    def _invalidate_window(self):
        """The map's point set changed: refresh the window's point
        gather on next use. The slot CHOICE is cached separately (it
        syncs the host on covisibility weights) so that mid-superstep
        point updates don't force a device->host round trip — the key
        enabler of the deferred-commit mapping pipeline."""
        self._ms_version = getattr(self, "_ms_version", 0) + 1

    def _invalidate_kf_set(self):
        """The keyframe SET changed (add/cull/reset/merge): recompute
        both the slot choice and the point gather."""
        self._kf_version = getattr(self, "_kf_version", 0) + 1
        self._invalidate_window()

    def _bucket_cap(self) -> int:
        """Pow2 landmark-bucket capacity from the deferred occupancy
        estimate (see _window for the rationale)."""
        mcfg = self.cfg.map
        est = self._win_count_est if self._win_count_est > 0 \
            else self.n_mp
        count = int(1.3 * max(est, 256))
        cap = 512
        while cap < min(count, mcfg.ba_point_cap):
            cap *= 2
        return min(cap, mcfg.ba_point_cap)

    def _window(self, free: Optional[int] = None,
                slots_only: bool = False):
        """Local covisibility window as fixed-shape arrays for the jitted
        BA/matching programs. Two-level cache: slot selection (host,
        syncs on covisibility weights) keyed by the keyframe set; point
        gather (pure device, lazy) keyed by the map version.
        `slots_only` skips the point gather (the fused superstep
        computes its own gathers on device)."""
        mcfg = self.cfg.map
        W = mcfg.local_window + mcfg.local_fixed
        target = mcfg.local_window if free is None else free
        # Monotonic keyframe-set version (a cull followed by an add
        # returns to the same len with different slots — len alone
        # would collide).
        skey = (getattr(self, "_kf_version", 0), target)
        if getattr(self, "_win_slots_key", None) != skey:
            chosen, free_set = self._window_slots(target)
            # FREE-FIRST layout: rows [0, local_window) hold the free
            # keyframes (temporal order, -1 padded), rows
            # [local_window, W) the fixed anchors. This is the static
            # n_free promise local_ba.optimize exploits: the Schur
            # camera system covers only the free block ((K/F)^2 less
            # matmul on the BA critical path).
            Fcap = mcfg.local_window
            free_rows = [s for s in chosen if s in free_set]
            fixed_rows = [s for s in chosen if s not in free_set]
            # _window_slots must honor the layout capacities — silent
            # truncation here would shrink the BA problem without any
            # signal (ADVICE r03).
            assert len(free_rows) <= Fcap, (
                f"window selection returned {len(free_rows)} free KFs "
                f"> local_window={Fcap}")
            assert len(fixed_rows) <= W - Fcap, (
                f"window selection returned {len(fixed_rows)} fixed KFs "
                f"> local_fixed={W - Fcap}")
            kf_ids = np.full((W,), -1, np.int32)
            fixed = np.ones((W,), bool)
            kf_ids[:len(free_rows)] = free_rows
            fixed[:len(free_rows)] = False
            kf_ids[Fcap:Fcap + len(fixed_rows)] = fixed_rows
            self._win_slots = (jnp.asarray(kf_ids), jnp.asarray(fixed))
            self._win_slots_key = skey
            self._win_pts_key = None
        if slots_only:
            return (self._win_slots[0], self._win_slots[1], None, None)
        pkey = (getattr(self, "_ms_version", 0), target)
        if getattr(self, "_win_pts_key", None) != pkey:
            # Landmark-axis shape bucket: the BA grid (and every
            # window-gathered kernel) is bandwidth-bound in the landmark
            # dimension, so size it to the smallest power-of-two bucket
            # holding the occupancy instead of always paying the full
            # cap (VERDICT r02: ~95% of the dense grid was padding).
            # The occupancy ESTIMATE is the previous superstep's
            # device-counted value (deferred-fetched), +30% margin for
            # the triangulations since — fetching an exact count here
            # was one blocking tunnel round trip per superstep stage
            # (measured 48 ms each in the r04 e2e loop). Young maps
            # (no estimate yet) fall back to the global live-point
            # count, which upper-bounds any window.
            mp_ids, local = mapstate.local_point_ids(
                self.ms, self._win_slots[0], cap=self._bucket_cap()
            )
            self._win_pts = (mp_ids, local)
            self._win_pts_key = pkey
        return (self._win_slots[0], self._win_slots[1],
                self._win_pts[0], self._win_pts[1])

    # -- inertial plumbing ---------------------------------------------------

    def _body_from_cam(self, R_cw, t_cw):
        """Body pose world-from-body from a camera pose (Tbw = Tbc Tcw)."""
        Rbc = self.Rcb.T
        R_bw = Rbc @ np.asarray(R_cw)
        t_bw = Rbc @ np.asarray(t_cw) - Rbc @ self.tcb
        Rwb = R_bw.T
        return Rwb.astype(np.float32), (-R_bw.T @ t_bw).astype(np.float32)

    def _init_body_terms(self, slots):
        """Body rotations + scale-split position terms for the inertial
        initializer: Rwb, the visual (scalable) camera centers p_wc, and
        the metric lever Rwc @ tcb — p_wb = s * p_wc + lever (see
        vi_ba.inertial_init's `lever` doc for why the split matters)."""
        Rcw = np.stack([np.asarray(self.ms.kf_R[s]) for s in slots])
        tcw = np.stack([np.asarray(self.ms.kf_t[s]) for s in slots])
        Rwc = Rcw.transpose(0, 2, 1)
        pwc = -np.einsum("kij,kj->ki", Rwc, tcw)
        Rwb = np.einsum("kij,jl->kil", Rwc, self.Rcb)
        lever = np.einsum("kij,j->ki", Rwc, self.tcb)
        return (jnp.asarray(Rwb.astype(np.float32)),
                jnp.asarray(pwc.astype(np.float32)),
                jnp.asarray(lever.astype(np.float32)))

    def _cam_from_body(self, Rwb, pwb):
        R_cw = self.Rcb @ np.asarray(Rwb).T
        t_cw = self.tcb - R_cw @ np.asarray(pwb)
        return R_cw.astype(np.float32), t_cw.astype(np.float32)

    def _integrate_imu(self, gyro, acc, dt):
        """Integrate the frame gap's samples into both the keyframe-level
        and the per-frame preintegrations."""
        from tpuslam.imu import preintegration as pre

        g = jnp.asarray(gyro, jnp.float32)
        a = jnp.asarray(acc, jnp.float32)
        h = jnp.asarray(dt, jnp.float32)
        m = jnp.ones(g.shape[0], bool)
        bg = jnp.asarray(self.bg)
        ba = jnp.asarray(self.ba)
        self.frame_preint = pre.integrate(
            pre.init_state(bg, ba), a, g, h, m, self._nga, self._walk)
        self.cur_preint = pre.integrate(
            self.cur_preint, a, g, h, m, self._nga, self._walk)

    def _imu_predict(self):
        """PredictStateIMU (src/Tracking.cc:1372): propagate the last
        frame's body state through the frame preintegration."""
        from tpuslam.imu import preintegration as pre

        Rwb_np, pwb_np = self._body_from_cam(self.last_R, self.last_t)
        Rj, pj, vj = jax.device_get(pre.predict(
            self.frame_preint, jnp.asarray(Rwb_np), jnp.asarray(pwb_np),
            jnp.asarray(self.vel),
            jnp.asarray(self.bg), jnp.asarray(self.ba)))
        R_cw, t_cw = self._cam_from_body(Rj, pj)
        return jnp.asarray(R_cw), jnp.asarray(t_cw), vj

    def _try_imu_init(self):
        """IMU init ladder entry (LocalMapping::InitializeIMU,
        src/LocalMapping.cc:1437): inertial-only optimization over the
        keyframe chain, then ApplyScaledRotation to the whole map."""
        from tpuslam.solver import vi_ba

        # Chain: the recent consecutive keyframe tail spanning at least
        # init_window_t seconds (kf_preint[s] holds the preintegration
        # from the previous keyframe to s). The young map's early
        # keyframes carry mono scale drift; a recent window is
        # internally scale-consistent — but it must span enough TIME or
        # scale/gravity are unobservable (minTime gate,
        # src/LocalMapping.cc:1443).
        icfg = self.cfg.imu
        if len(self.kf_slots) < icfg.init_min_kf:
            return
        slots = self._preint_tail_time(icfg.init_window_t)
        if len(slots) < 6:
            return
        Rwb, pwc, lever = self._init_body_terms(slots)
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[self.kf_preint[s] for s in slots[1:]])
        # Stereo/RGBD-inertial maps are metric from the first keyframe:
        # the scale variable is pinned at 1 (the reference fixes
        # VertexScale when bFixedScale = sensor==IMU_STEREO,
        # src/Optimizer.cc:5391/src/LocalMapping.cc:1437).
        fix_scale = self._use_depth
        res = vi_ba.inertial_init(
            Rwb, pwc, stacked, jnp.ones((len(slots) - 1,), bool),
            gravity_mag=self.cfg.imu.gravity, lever=lever,
            fix_scale=fix_scale,
        )
        s = float(res.scale)
        if os.environ.get("TPUSLAM_VI_DEBUG"):
            print(f"[vi-init] kf={len(self.kf_slots)} window={slots} "
                  f"s={s:.3f} g_lin={float(res.g_lin_norm):.3f} "
                  f"prev={getattr(self, '_init_scale_prev', None)} "
                  f"bg={np.asarray(res.bg).round(4)}", flush=True)
        # Acceptance gates:
        # 1. scale sanity (LocalMapping.cc:1558);
        # 2. PHYSICAL health check: the closed-form linear alignment
        #    solves gravity as a FREE vector — its norm is ~9.81 only
        #    when the window's scale regime is consistent (VINS-Mono's
        #    standard check; whitened MAP cost cannot discriminate and
        #    consecutive estimates can be consistently wrong on a
        #    drifting young map);
        # 3. stability: consecutive keyframes' estimates agree
        #    (mono only — with fixed scale, gates 1 and 3 are vacuous).
        prev = getattr(self, "_init_scale_prev", None)
        # prev updates on EVERY attempt (even rejected ones) so the
        # agreement check is between genuinely consecutive estimates.
        self._init_scale_prev = s
        if not (0.1 < s < 50.0) or not np.isfinite(s):
            return
        if abs(float(res.g_lin_norm) - self.cfg.imu.gravity) > 0.5:
            return
        if not fix_scale and (prev is None
                              or abs(s - prev) > 0.4 * max(s, prev)):
            return
        # ApplyScaledRotation (Map.h:122): x' = s Rwg^T x so gravity
        # aligns with -z and the map becomes metric.
        Rgw_np = np.asarray(res.Rwg).T
        self._apply_scaled_rotation(s, Rgw_np)
        self.bg = np.asarray(res.bg)
        self.ba = np.asarray(res.ba)
        self.vel = Rgw_np @ np.asarray(res.vel[-1])
        self.imu_initialized = True
        self._init_frame = len(self.trajectory)
        self._imu_stage = 0
        self._last_scale_ref = 0.0
        self._map_updated = True
        self.prior_H = None
        self.body_state = None
        # Seed keyframe velocities from the init solution (old-world
        # velocities rotated into the gravity-aligned world).
        for i, s_kf in enumerate(slots):
            self.kf_vel[s_kf] = np.asarray(
                Rgw_np @ np.asarray(res.vel[i]))
        # Joint visual-inertial refinement of the init window — the
        # FullInertialBA(its=100) the reference runs right after
        # InitializeIMU (src/LocalMapping.cc:1593, VIBA1): the
        # inertial-only estimate leaves bias/scale residue only the
        # joint problem resolves.
        if self.enable_viba:
            self._local_inertial_ba(iters=12)
        # Re-linearize the keyframe preintegration accumulator.
        from tpuslam.imu import preintegration as pre
        self.cur_preint = pre.init_state(jnp.asarray(self.bg),
                                         jnp.asarray(self.ba))

    def _apply_scaled_rotation(self, s: float, Rgw_np: np.ndarray):
        """Rigid+scale world transform x' = s Rgw x applied to the whole
        map and all cached per-session state (Map::ApplyScaledRotation,
        include/Map.h:122, bScaledVel=true: velocities transform as
        v' = s Rgw v to stay consistent with the rescaled positions)."""
        Rgw = jnp.asarray(Rgw_np, jnp.float32)
        Rwg = Rgw.T
        self.ms = self.ms._replace(
            mp_pos=s * jnp.einsum("ij,mj->mi", Rgw, self.ms.mp_pos),
            kf_R=jnp.einsum("kij,jl->kil", self.ms.kf_R, Rwg),
            kf_t=s * self.ms.kf_t,
            mp_normal=jnp.einsum("ij,mj->mi", Rgw, self.ms.mp_normal),
            mp_dist_min=s * self.ms.mp_dist_min,
            mp_dist_max=s * self.ms.mp_dist_max,
        )
        self.last_R = np.asarray(self.ms.kf_R[self.kf_slots[-1]])
        self.last_t = np.asarray(self.ms.kf_t[self.kf_slots[-1]])
        self.vel_t = self.vel_t * s
        if self.vel is not None:
            self.vel = s * (Rgw_np @ self.vel)
        self.kf_vel = {k: (s * (Rgw_np @ v) if v is not None else None)
                       for k, v in self.kf_vel.items()}
        # Relative trajectory entries: T_cr translation is in map units
        # (scale by s); absolute entries transform like keyframe poses
        # (UpdateFrameIMU rescales mlRelativeFramePoses the same way,
        # src/Tracking.cc:4133).
        Rwg_np = Rgw_np.T
        for i, ref in enumerate(self.traj_ref):
            p = self.traj_rel[i]
            if ref >= 0:
                self.traj_rel[i] = np.concatenate(
                    [p[:9], s * p[9:]]).astype(np.float32)
            else:
                R = p[:9].reshape(3, 3) @ Rwg_np
                self.traj_rel[i] = np.concatenate(
                    [R.reshape(-1), s * p[9:]]).astype(np.float32)
        self._map_updated = True
        self.prior_H = None
        self.body_state = None
        self._invalidate_window()

    def _imu_stage_ladder(self):
        """Post-init refinement staging (LocalMapping::Run,
        /root/reference/src/LocalMapping.cc:227-268): VIBA1 re-init at
        t>5 s, VIBA2 at t>15 s, then mono scale refinement every 10 s.
        The first init's scale is rough BY DESIGN (the reference claims
        <5% only after this ladder, MyChangelog.md:27)."""
        icfg = self.cfg.imu
        t_init = ((len(self.trajectory) - self._init_frame)
                  / self.cfg.camera.fps)
        # DEVIATION from the reference's relaxing prior schedule
        # (1e2 -> 1 -> 0): the gyro prior stays strong at every stage.
        # The inertial-only problem holds poses fixed, so any visual
        # rotational drift in the keyframe chain is absorbed by bg when
        # the prior relaxes — measured on the inward-orbit fixture:
        # prior_g=1 turned bg_y from -0.035 into -0.053 and produced
        # |ba|~1.1 m/s^2. The joint window BA (_local_inertial_ba) is
        # where biases and poses trade off properly.
        if self._imu_stage == 0 and t_init > icfg.viba1_t:
            self._imu_stage = 1
            self._last_scale_ref = t_init
            self._inertial_refine(prior_g=1e2, prior_a=1e5, tag="viba1",
                                  s_range=(0.4, 2.5))
        elif self._imu_stage == 1 and t_init > icfg.viba2_t:
            self._imu_stage = 2
            self._last_scale_ref = t_init
            self._inertial_refine(prior_g=1e2, prior_a=1e4, tag="viba2",
                                  s_range=(0.5, 2.0))
        elif (self.cfg.sensor == "imu_mono"
              and t_init > self._last_scale_ref + icfg.scale_ref_interval):
            # Periodic scale refinement is MONO-inertial only — stereo
            # sessions are metric from frame one and the reference gates
            # ScaleRefinement on mbMonocular (src/LocalMapping.cc:256).
            self._last_scale_ref = t_init
            # Periodic refinement re-runs the FULL inertial-only problem
            # (velocities + biases + scale + gravity dir, poses fixed)
            # rather than the reference's scale+gdir-only variant: with
            # velocities held at map scale, that variant is blind to
            # scale error (measured: a 0.87-scaled window refines to
            # s=1.0006 instead of 1.149 — the velocity constraints pin
            # the wrong scale). The full problem on the same window
            # recovers s to 4 decimals. The joint window BA cannot do
            # this either: the scale valley stalls GN (measured
            # 0.87 -> 0.83 and stuck), which is exactly why the
            # reference re-runs explicit-scale inertial optimizations
            # on a schedule instead of trusting LocalInertialBA.
            self._inertial_refine(prior_g=1e2, prior_a=1e4,
                                  tag="scale-ref")

    def _preint_tail(self, n: int, need_vel: bool = False):
        """Longest consecutive tail of kf_slots (up to n slots) whose
        inertial edges all exist: every slot after the first must carry
        the preintegration from its predecessor (adjacent kf_slots
        entries are linked by construction; culling merges the chain,
        src/LocalMapping.cc:1282)."""
        tail = []
        for s in reversed(self.kf_slots):
            if len(tail) >= n:
                break
            if need_vel and self.kf_vel.get(s) is None:
                break
            if s not in self.kf_preint:
                # `s` is the base slot: its own incoming edge is unused.
                tail.append(s)
                break
            tail.append(s)
        return tail[::-1]

    def _preint_tail_time(self, min_span: float, need_vel: bool = False,
                          sizes=(9, 13, 17, 21, 25, 33),
                          max_span: float = None):
        """Most recent consecutive preint tail whose inertial edges span
        >= min_span seconds of IMU time. Keyframe cadence is adaptive
        (ratio-gated), so a fixed-COUNT window can span arbitrarily
        little time — and scale is unobservable over a short baseline
        (the reference windows InitializeIMU by minTime, not count,
        src/LocalMapping.cc:1443). Window lengths are quantized to a few
        sizes so the stacked inertial problem compiles O(1) times.

        Prefers the LARGEST window within max_span (default 4x
        min_span): the reference's InitializeIMU runs on ALL keyframes,
        and for good reason — minimum-span windows barely cover one
        excitation cycle, and consecutive scale estimates scatter 2-3x
        (measured 1.9/5.0/3.65 on the orbit fixture); quadrupling the
        span stabilizes them. Returns [] if the chain cannot span
        min_span yet."""
        tail = self._preint_tail(sizes[-1], need_vel=need_vel)
        if len(tail) < 3:
            return []
        dts = [float(self.kf_preint[s].dT) for s in tail[1:]]
        if max_span is None:
            max_span = 4.0 * min_span
        best = None
        for n in sizes:
            if n > len(tail):
                break
            span = sum(dts[-(n - 1):])
            if span < min_span:
                continue
            if best is not None and span > max_span:
                break
            best = n
        return tail[-best:] if best else []

    def _inertial_refine(self, prior_g: float, prior_a: float,
                         tag: str = "refine",
                         s_range: tuple = (0.77, 1.3)):
        """Re-run the full inertial-only estimation (velocities, biases,
        gravity direction, scale; poses fixed) over the recent keyframe
        chain and absorb the residual similarity correction, then joint
        VI BA. This is InitializeIMU re-entered with relaxed priors —
        VIBA1 (1, 1e5) / VIBA2 (0, 0), src/LocalMapping.cc:230-253 —
        and also serves as the periodic mono scale refinement
        (ScaleRefinement role, :1646; see _imu_stage_ladder for why the
        full problem replaces the scale+gdir-only variant).

        `s_range` gates the applied scale correction. The VIBA1/VIBA2
        re-init stages pass a wide range: the FIRST init's scale is
        rough by design (single-window estimates on a drifting young
        map scatter 2x — measured 1.9/5.0/3.65 on consecutive
        attempts), and these stages exist precisely to absorb that. The
        steady-state scale-ref keeps the tight default so a bad window
        cannot de-calibrate a settled metric map."""
        from tpuslam.solver import vi_ba

        # Same time-span rule as init: short windows make scale/gravity
        # unobservable and the "refinement" would inject noise.
        slots = self._preint_tail_time(self.cfg.imu.init_window_t)
        if len(slots) < 5:
            return
        Rwb, pwc, lever = self._init_body_terms(slots)
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[self.kf_preint[s] for s in slots[1:]])
        res = vi_ba.inertial_init(
            Rwb, pwc, stacked, jnp.ones((len(slots) - 1,), bool),
            gravity_mag=self.cfg.imu.gravity, lever=lever,
            prior_g=prior_g, prior_a=prior_a,
            fix_scale=self._use_depth,
        )
        s = float(res.scale)
        if os.environ.get("TPUSLAM_VI_DEBUG"):
            print(f"[{tag}] s={s:.3f} bg={np.asarray(res.bg).round(4)}"
                  f" ba={np.asarray(res.ba).round(4)}", flush=True)
        # Gates. Scale/gravity and biases are gated SEPARATELY: the
        # inertial-only problem (poses fixed) dumps visual position
        # drift into the accelerometer bias, so its ba estimate can be
        # garbage (measured |ba|~0.5-2 m/s^2) while its scale/gravity
        # solution is excellent (measured s=1.004 on a 1.36x-off map in
        # the same solve). Rejecting the whole result for a bad ba
        # threw away exactly the correction the ladder exists to make;
        # instead apply the similarity and let the joint window BA —
        # where poses and biases trade off properly — re-estimate ba.
        if not np.isfinite(s) or not (s_range[0] < s < s_range[1]):
            return
        if abs(float(res.g_lin_norm) - self.cfg.imu.gravity) > 0.5:
            return
        Rgw_np = np.asarray(res.Rwg).T
        self._apply_scaled_rotation(s, Rgw_np)
        if float(np.max(np.abs(res.bg))) < 0.2:
            self.bg = np.asarray(res.bg)
        if float(np.max(np.abs(res.ba))) < 0.3:
            self.ba = np.asarray(res.ba)
        vel_out = np.asarray(res.vel)
        for i, s_kf in enumerate(slots):
            self.kf_vel[s_kf] = Rgw_np @ vel_out[i]
        self.vel = Rgw_np @ vel_out[-1]
        if self.enable_viba:
            self._local_inertial_ba(iters=10)
        from tpuslam.imu import preintegration as pre
        self.cur_preint = pre.init_state(jnp.asarray(self.bg),
                                         jnp.asarray(self.ba))

    # Distributed FullInertialBA kicks in beyond this window size when
    # the process sees >1 device (the all-KF inertial problem is the
    # long-context workload SURVEY 5.7 says must shard).
    VIBA_SHARD_MIN_K = 64

    def _viba_window_size(self) -> Tuple[int, int]:
        """LocalInertialBA window: Nd=10, escalated to 25 while tracking
        is strong — the reference's bLarge switch selects the big window
        when the frame holds >75 inliers (>100 for sensor-depth modes)
        (/root/reference/src/LocalMapping.cc:179,
        src/Optimizer.cc:4508-4511). Returns (Nd, pow2 array bucket)."""
        strong = self._last_ninl > (100 if self._use_depth else 75)
        return (25, 32) if strong else (10, 16)

    def _local_inertial_ba(self, iters: int = 8):
        """Sliding-window VI bundle adjustment over the temporal keyframe
        chain (LocalInertialBA, /root/reference/src/Optimizer.cc:4504,
        Nd-window via mPrevKF links; also the VIBA1 role right after IMU
        init, src/LocalMapping.cc:1593)."""
        nd, bucket = self._viba_window_size()
        slots = self._preint_tail(nd)
        self._inertial_window_ba(slots, bucket,
                                 self.cfg.map.ba_point_cap, iters)

    def _full_inertial_ba(self, iters: int = 7):
        """FullInertialBA analog (/root/reference/src/Optimizer.cc:420):
        joint 15-dof VI BA over the WHOLE live keyframe chain + all their
        landmarks — the reference runs it with its=100 after IMU init
        (src/LocalMapping.cc:1597) and its=7 as the inertial global BA
        after loop closure (src/LoopClosing.cc:2788). Window size and
        landmark capacity are bucketed to powers of two so the kernel
        compiles O(log) times. Big windows on a multi-device process
        route through the landmark-sharded engine
        (parallel.dist_ba.distributed_optimize_vi)."""
        slots = self._preint_tail(len(self.kf_slots))
        n = len(slots)
        if n < 3:
            return
        K = 16
        while K < n:
            K *= 2
        K = min(K, self.ms.kf_capacity)
        # Host-tracked live-point count bounds the landmark axis — a
        # device count fetch here was one blocking round trip per call.
        cap = 2048
        while cap < min(int(1.2 * self.n_mp), self.cfg.map.max_points):
            cap *= 2
        cap = min(cap, self.cfg.map.max_points)
        sharded = (K >= self.VIBA_SHARD_MIN_K
                   and len(jax.devices()) > 1
                   and cap % len(jax.devices()) == 0)
        self._inertial_window_ba(slots[:K], K, cap, iters,
                                 sharded=sharded)

    def _inertial_window_ba(self, slots, K: int, pt_cap: int,
                            iters: int, sharded: bool = False):
        """Joint VI BA over `slots` (a consecutive preint chain) padded
        to the static window size K with up to pt_cap landmarks.
        Refines window poses, velocities, biases and points jointly;
        writes back."""
        from tpuslam.solver import vi_ba

        # Consecutive tail of the keyframe chain whose inertial edges all
        # exist (kf_preint[s] = preintegration from the previous KF to s).
        n = len(slots)
        if n < 3:
            return
        kf_ids = np.full((K,), -1, np.int32)
        kf_ids[:n] = slots
        kf_ids_j = jnp.asarray(kf_ids)
        mp_ids, local = mapstate.local_point_ids(
            self.ms, kf_ids_j, cap=pt_cap)
        prob = mapstate.build_ba_problem(
            self.ms, kf_ids_j, jnp.zeros((K,), bool), mp_ids, local,
            self.inv_sigma2_lut, stereo=self._ba_stereo,
            fisheye=self._fisheye_stereo)

        # Body states from the map (through Tbc).
        Rcb_j = jnp.asarray(self.Rcb)
        tcb_j = jnp.asarray(self.tcb)
        Rwb = jnp.einsum("kja,jb->kab", prob.kf_R, Rcb_j)   # R_cw^T Rcb
        t_bw = jnp.einsum("ji,kj->ki", Rcb_j, prob.kf_t - tcb_j)
        pwb = -jnp.einsum("kij,kj->ki", Rwb, t_bw)
        vel = np.zeros((K, 3), np.float32)
        for i, s_kf in enumerate(slots):
            v = self.kf_vel.get(s_kf)
            vel[i] = v if v is not None else self.vel
        fixed = np.ones((K,), bool)
        fixed[1:n] = False  # first row anchors the gauge
        preints = [self.kf_preint[s] for s in slots[1:]]
        pad_edges = K - 1 - len(preints)
        if pad_edges:
            preints = preints + [preints[-1]] * pad_edges
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *preints)
        edge_valid = np.zeros((K - 1,), bool)
        edge_valid[: n - 1] = True

        win = vi_ba.VIWindow(
            Rwb=Rwb, pwb=pwb, vel=jnp.asarray(vel),
            bg=jnp.tile(jnp.asarray(self.bg), (K, 1)),
            ba=jnp.tile(jnp.asarray(self.ba), (K, 1)),
            fixed=jnp.asarray(fixed),
            points=prob.points, pt_valid=prob.pt_valid,
            obs_uv=prob.obs_uv, obs_mask=prob.obs_mask,
            obs_inv_sigma2=prob.obs_inv_sigma2,
            preint=stacked, edge_valid=jnp.asarray(edge_valid),
            Rcb=Rcb_j,
            tcb=tcb_j,
            obs_ur=prob.obs_ur,
            obs_uvr=prob.obs_uvr,
        )
        rig_kw = ({"cam_params_r": self._rig[0], "R_rl": self._rig[1],
                   "t_rl": self._rig[2]} if self._fisheye_stereo else {})
        if sharded:
            from jax.sharding import Mesh

            from tpuslam.parallel import dist_ba

            devs = jax.devices()
            d = 1
            while d * 2 <= len(devs) and pt_cap % (d * 2) == 0:
                d *= 2
            with self.timer.stage("viba_sharded"):
                mesh = Mesh(np.asarray(devs[:d]), (dist_ba.AXIS,))
                res = dist_ba.distributed_optimize_vi(
                    win, self.cam_params, self.gravity_w, self.walk_info,
                    mesh, iters=iters, model=self.model,
                    bf=jnp.float32(self.cfg.camera.bf), **rig_kw)
        else:
            res = vi_ba.optimize_vi(
                win, self.cam_params, self.gravity_w,
                self.walk_info, iters=iters, model=self.model,
                bf=jnp.float32(self.cfg.camera.bf), **rig_kw)

        # Write back: poses (Tcw from body), points, bias/velocities.
        R_cw = jnp.einsum("ij,kaj->kia", Rcb_j, res.Rwb)
        t_cw = tcb_j - jnp.einsum("kij,kj->ki", R_cw, res.pwb)
        keep = jnp.any(res.inlier, axis=0) | ~jnp.any(prob.obs_mask, axis=0)
        if os.environ.get("TPUSLAM_VI_DEBUG"):
            obs = jnp.any(prob.obs_mask, axis=0)
            dp = jnp.linalg.norm(res.pwb[:n] - pwb[:n], axis=-1)
            nan_in = (bool(jnp.isnan(pwb[:n]).any())
                      or bool(jnp.isnan(win.vel[:n]).any())
                      or bool(jnp.isnan(stacked.cov[:n - 1]).any()))
            print(f"[viba-win] n={n} obs_pts={int(jnp.sum(obs))} "
                  f"culled={int(jnp.sum(obs & ~keep))} "
                  f"max|dp|={float(jnp.max(dp)):.4f} "
                  f"chi2={float(res.total_chi2):.1f} "
                  f"nan_in={nan_in} nan_out={bool(jnp.isnan(res.pwb).any())} "
                  f"inl_frac={float(jnp.sum(res.inlier) / jnp.maximum(jnp.sum(win.obs_mask), 1)):.3f}",
                  flush=True)
        self.ms = mapstate.scatter_ba_result(
            self.ms, kf_ids_j, mp_ids, R_cw, t_cw, res.points, keep)
        vel_out = np.asarray(res.vel)
        for i, s_kf in enumerate(slots):
            self.kf_vel[s_kf] = vel_out[i].copy()
        self.bg = np.asarray(res.bg[n - 1])
        self.ba = np.asarray(res.ba[n - 1])
        self.vel = vel_out[n - 1]
        self.last_R = np.asarray(self.ms.kf_R[slots[-1]])
        self.last_t = np.asarray(self.ms.kf_t[slots[-1]])
        self._map_updated = True
        self._invalidate_window()

    def _refine_pose_vi(self, R_np, t_np, assoc, feats):
        """Frame VI pose optimization against the last keyframe (map just
        updated) or the previous frame + its marginal prior (sliding
        window of size one — the ConstraintPoseImu chain). Returns
        (R_cw, t_cw, n_inliers) or None on failure/fallback."""
        from tpuslam.solver import vi_ba

        tcfg = self.cfg.tracking
        X_w, vvalid, inv_s2 = _gather_vi_matches(
            self.ms, assoc, feats, self.inv_sigma2_lut)
        Rwb0, pwb0 = self._body_from_cam(R_np, t_np)
        vel0 = (self._vel_pred if self._vel_pred is not None else self.vel)
        Rcb_j = jnp.asarray(self.Rcb)
        tcb_j = jnp.asarray(self.tcb)
        args = (jnp.asarray(Rwb0), jnp.asarray(pwb0), jnp.asarray(vel0),
                jnp.asarray(self.bg), jnp.asarray(self.ba))
        # Stereo-inertial: the frame's stereo-matched keypoints carry the
        # 3-dof residual in the VI pose problems too (EdgeStereoOnlyPose
        # inside PoseInertialOptimization*, ref Optimizer.cc:7790).
        stereo_kw = {}
        if self._ba_stereo and self._cur_stereo is not None:
            stereo_kw = dict(ur=self._cur_stereo.u_right,
                             bf=jnp.float32(self.cfg.camera.bf))
        elif self._fisheye_stereo and self._cur_stereo_uvr is not None:
            # Fisheye stereo-inertial: right-camera rows through the rig
            # (the EdgeSE3ProjectXYZToBody role in the VI pose problems).
            stereo_kw = dict(uvr=self._cur_stereo_uvr,
                             cam_params_r=self._rig[0],
                             R_rl=self._rig[1], t_rl=self._rig[2])

        use_last_kf = (self._map_updated or self.prior_H is None
                       or self.body_state is None)
        if use_last_kf:
            slot = self.kf_slots[-1]
            kfR, kfp = self._body_from_cam(np.asarray(self.ms.kf_R[slot]),
                                           np.asarray(self.ms.kf_t[slot]))
            kf_vel = self.kf_vel.get(slot)
            if kf_vel is None:
                kf_vel = self.vel
            res = vi_ba.optimize_pose_vi(
                *args,
                jnp.asarray(kfR), jnp.asarray(kfp), jnp.asarray(kf_vel),
                self.cur_preint, X_w, feats.uv, inv_s2, vvalid,
                self.cam_params, Rcb_j, tcb_j, self.gravity_w,
                self.walk_info, model=self.model, **stereo_kw)
            prior_H = res.H
        else:
            if self.frame_preint is None:
                return None
            pR, pp = self.body_state
            res = vi_ba.optimize_pose_vi_prior(
                jnp.asarray(pR), jnp.asarray(pp), jnp.asarray(self.vel),
                jnp.asarray(self.bg), jnp.asarray(self.ba),
                jnp.asarray(self.prior_H),
                *args,
                self.frame_preint, X_w, feats.uv, inv_s2, vvalid,
                self.cam_params, Rcb_j, tcb_j, self.gravity_w,
                self.walk_info, model=self.model, **stereo_kw)
            prior_H = res.H_marg
        self._map_updated = False
        # One batched host fetch for the whole VI result (7 separate
        # np.asarray calls = 7 tunnel round trips otherwise).
        (n_vi, Rwb_np, pwb_np, vel_np, bg_np, ba_np,
         prior_np) = jax.device_get(
            (res.n_inliers, res.Rwb, res.pwb, res.vel, res.bg, res.ba,
             prior_H))
        n_vi = int(n_vi)
        if n_vi < tcfg.min_inliers_track:
            # VI refinement diverged — keep the visual pose, break the
            # marginal chain (next frame re-anchors on the keyframe).
            self.prior_H = None
            self.body_state = None
            return None
        R2, t2 = self._cam_from_body(Rwb_np, pwb_np)
        self.vel = vel_np
        self.bg = bg_np
        self.ba = ba_np
        self.prior_H = prior_np
        self.body_state = (Rwb_np, pwb_np)
        return R2, t2, n_vi

    def _track(self, feats: FrameFeatures, reentry: bool = False
               ) -> FrameResult:
        tcfg = self.cfg.tracking
        if (self._use_imu and self.imu_initialized
                and self.frame_preint is not None):
            R_pred, t_pred, vel_pred = self._imu_predict()
            self._vel_pred = vel_pred
        else:
            # Constant-velocity motion model, scaled to the actual
            # inter-frame interval (the stored step was measured over
            # _prev_dt seconds; rotation rescales on the so3 manifold,
            # translation linearly).
            a = self._cur_dt / max(self._prev_dt, 1e-6)
            if abs(a - 1.0) > 1e-3:
                from tpuslam.geometry import lie
                w = np.asarray(lie.so3_log(jnp.asarray(self.vel_R)))
                vel_R = np.asarray(lie.so3_exp(jnp.asarray(
                    w * a, jnp.float32)))
                vel_t = self.vel_t * a
            else:
                vel_R, vel_t = self.vel_R, self.vel_t
            R_pred = jnp.asarray(vel_R @ self.last_R)
            t_pred = jnp.asarray(vel_R @ self.last_t + vel_t)
            self._vel_pred = None

        kf_ids, _, mp_ids, _ = self._window()
        # Inertial mode keeps the longer GN schedule: pose accuracy
        # feeds the preintegration chain and the init's scale estimate.
        sched = (((2, 5), (3, 5)) if self._use_imu
                 else ((2, 3), (2, 4)))
        # Re-entry needs a SOLID lock (reference: >=15 VIO inliers,
        # src/Tracking.cc:3113) — accepting a marginal fit here poisons
        # the velocity/prior chain and the next dead-reckoning diverges
        # (measured: a 15-inlier re-entry at 48 px radius sent |vel|
        # 1.7 -> 7 m/s over the following grace period).
        min_ok = max(tcfg.min_inliers_track, 15) if reentry \
            else tcfg.min_inliers_track
        with self.timer.stage("local_map_track"):
            (R, t, assoc, n_inl, visible_ids, found_ids,
             new_vis, new_fnd) = _track_frame_fused(
                self.ms, mp_ids, R_pred, t_pred,
                feats, self.cam_params, self.scale_lut, self.inv_sigma2_lut,
                self.img_wh, jnp.int32(min_ok), sched=sched,
                # Dead-reckoned re-entry keeps the NORMAL window: wide
                # windows false-lock under GN (alias-consistent fits);
                # large prediction drift is _reenter_local_pnp's job
                # (RANSAC consensus), which runs before this retry.
                radius1=15.0,
                level_widen=(self._use_imu),
                model=self.model,
                # Depth-sensor modes add the 3-dof (u, v, u-bf/z)
                # residual per stereo-matched keypoint — the per-frame
                # metric-scale anchor (EdgeStereoOnlyPose,
                # ref Optimizer.cc:931).
                feats_ur=(self._cur_stereo.u_right
                          if (self._ba_stereo
                              and self._cur_stereo is not None)
                          else None),
                bf=jnp.float32(self.cfg.camera.bf),
                feats_uvr=(self._cur_stereo_uvr
                           if (self._fisheye_stereo
                               and self._cur_stereo_uvr is not None)
                           else None),
                rig=(self._rig if (self._fisheye_stereo
                                   and self._cur_stereo_uvr is not None)
                     else (None, None, None)),
            )
            # ONE batched host fetch for everything the host-side frame
            # logic needs (each separate int()/asarray is a full tunnel
            # round trip; device_get pipelines them).
            R_np, t_np, n_inl = jax.device_get((R, t, n_inl))
            n_inl = int(n_inl)
        if os.environ.get("TPUSLAM_TRACK_DEBUG"):
            c_pred = -np.asarray(R_pred).T @ np.asarray(t_pred)
            c_fit = -np.asarray(R).T @ np.asarray(t)
            print(f"[track] reentry={reentry} ninl={n_inl} "
                  f"|pred-fit|={np.linalg.norm(c_pred - c_fit):.3f} "
                  f"nvis={int(jnp.sum(visible_ids >= 0))} "
                  f"nfound={int(jnp.sum(found_ids >= 0))}", flush=True)
        if not self.frozen:
            # Stats were bumped INSIDE the fused step, gated on the
            # frame locking (n_inl >= min_ok): blank/lost frames must
            # not decay found/visible for every predicted-visible point
            # or the next culling pass massacres a perfectly good map
            # (measured on the blackout fixture: 550 visible x 10 blank
            # frames). Adopting them here is a pytree rebind, not a
            # device dispatch.
            self.ms = self.ms._replace(mp_visible=new_vis,
                                       mp_found=new_fnd)
        if n_inl < min_ok:
            if self._use_imu:
                self.prior_H = None     # the marginal chain is broken
                self.body_state = None
                if self.imu_initialized:
                    # Two-stage loss: a metric-IMU session dead-reckons
                    # through a grace period before giving up
                    # (RECENTLY_LOST, src/Tracking.cc:1800).
                    self.state = "RECENTLY_LOST"
                    self._lost_t0 = len(self.trajectory)
                    return FrameResult("RECENTLY_LOST", self.last_R,
                                       self.last_t, n_inl)
            self.state = "LOST"
            return FrameResult("LOST", self.last_R, self.last_t, n_inl)

        vi_applied = False
        if (self._use_imu and self.imu_initialized
                and self.enable_pose_vi and not reentry):
            # Live VI pose refinement on the frame's associations
            # (PoseInertialOptimizationLastKeyFrame/LastFrame,
            # Optimizer.cc:7608/8009 — called from TrackLocalMap,
            # src/Tracking.cc:3035-3041).
            with self.timer.stage("pose_vi"):
                out = self._refine_pose_vi(R_np, t_np, assoc, feats)
            if out is not None:
                R_np, t_np, n_vi = out
                n_inl = max(n_inl, n_vi)
                vi_applied = True
        # Velocity (camera-from-camera relative motion over _cur_dt).
        # On re-entry the previous pose is the dead-reckoned one — the
        # step across the gap measures the accumulated drift, not motion
        # (the reference recomputes mVelocity only from consecutively
        # tracked frames, src/Tracking.cc:2153-2167).
        if reentry:
            self.vel_R = np.eye(3, dtype=np.float32)
            self.vel_t = np.zeros(3, np.float32)
        else:
            self.vel_R = R_np @ self.last_R.T
            self.vel_t = t_np - self.vel_R @ self.last_t
        self._prev_dt = self._cur_dt
        if self._use_imu and not vi_applied and not reentry:
            # World-velocity estimate from the OPTIMIZED poses (finite
            # difference): the IMU-propagated velocity is never corrected
            # by vision and its error integrates (bias/gravity residuals)
            # until guided search misses — the classic VIO failure.
            # (Once the VI optimizer runs, its velocity IS vision-
            # corrected and replaces this.)
            c_prev = -self.last_R.T @ self.last_t
            c_now = -R_np.T @ t_np
            self.vel = ((c_now - c_prev) / self._cur_dt
                        ).astype(np.float32)
        self.last_R, self.last_t = R_np, t_np
        self.frames_since_kf += 1

        if (self._use_depth
                and self._cur_stereo is not None):
            # bNeedToInsertClose (src/Tracking.cc:3203): too few tracked
            # close points while plenty of untracked close depth exists.
            sm = self._cur_stereo
            close = sm.valid & (sm.depth < self.depth_th)
            tracked = assoc >= 0
            n_trk, n_untrk = jax.device_get(
                (jnp.sum(close & tracked), jnp.sum(close & ~tracked)))
            self._need_close = int(n_trk) < 100 and int(n_untrk) > 70
        is_kf = self._need_keyframe(n_inl)
        if is_kf:
            self._create_keyframe(feats, R, t, assoc, n_inl)
            if self._use_imu:
                # The inline inertial superstep may have transformed the
                # world (init/ladder similarity, VI window BA). Those
                # paths maintain last_R/last_t at this keyframe's
                # CURRENT-world pose — return that, not the stale
                # pre-transform fit (motion model + FrameResult both).
                R_np, t_np = self.last_R, self.last_t
        return FrameResult("OK", R_np, t_np, n_inl, is_keyframe=is_kf)

    GBA_SHARDED_CAP = None  # landmark capacity of the sharded global
                            # problem; None = cfg.map.max_points.
                            # STATIC (not n_mp-bucketed) so a session
                            # has ONE landmark shape per chunk variant
                            # — prewarmable, no mid-run retrace.
    GBA_WINDOW = 64  # largest map solved as ONE dense local_ba problem;
                     # bigger maps go landmark-sharded over ALL live KFs

    GBA_CHUNK_ITERS = 3  # LM iterations per background GBA chunk
    GBA_CHUNK_SPACING = 3  # frames between chunks: a big-map chunk is
                           # tens-of-ms of device time that would
                           # otherwise land on consecutive frames'
                           # latency right after a loop closure
                           # (p95 criterion, VERDICT r04 task 2)

    def run_global_ba(self, iters: int = 12):
        """GlobalBundleAdjustemnt analog (Optimizer.cc:54/62) over ALL
        live keyframes: one dense BA for maps up to GBA_WINDOW
        keyframes; beyond that, the landmark-sharded engine
        (parallel/dist_ba) with the keyframe axis bucketed to the next
        power of two — a 512-KF camera system is a 3072^2 Cholesky, well
        within one chip, while the landmark grid shards across every
        local device. No keyframe is ever beyond the horizon (round-3
        verdict: the old 256-KF cap left old map segments merely
        pose-graph-corrected, never BA'd)."""
        # kf_slots IS the live set (culls/resets maintain it on host) —
        # a kf_valid fetch here was one blocking round trip per chunk.
        live = list(self.kf_slots)
        if len(live) > self.GBA_WINDOW:
            self._run_global_ba_sharded(live, iters)
            return
        W = self.GBA_WINDOW
        slots = live[-W:]
        n = len(slots)
        if n < 3:
            return
        # Free-first layout: the two gauge anchors (oldest KFs) sit in
        # the last two rows so the Schur camera system covers only the
        # free block (n_free = W - 2 static).
        kf_ids = np.full((W,), -1, np.int32)
        kf_ids[:n - 2] = slots[2:]
        kf_ids[W - 2:] = slots[:2]
        fixed = np.ones((W,), bool)
        fixed[:n - 2] = False
        kf_ids_j = jnp.asarray(kf_ids)
        mp_ids, local = mapstate.local_point_ids(
            self.ms, kf_ids_j, cap=self.cfg.map.ba_point_cap)
        self.ms, _ = _run_local_ba(
            self.ms, kf_ids_j, jnp.asarray(fixed), mp_ids, local,
            self.inv_sigma2_lut, self.cam_params, iters=iters,
            model=self.model, stereo=self._ba_stereo,
            bf=jnp.float32(self.cfg.camera.bf), n_free=W - 2,
            fisheye=self._fisheye_stereo, rig=self._rig)
        self._invalidate_window()

    def _gba_sharded_prog(self, iters: int):
        """Build (once) the WHOLE sharded-GBA chunk as ONE cached jitted
        program: window gather + problem grids + shard_map'd LM solve +
        result scatter. `dist_ba.distributed_optimize` constructs a
        fresh `shard_map` closure per call, so calling it directly from
        the chunk path re-TRACED the full solver at EVERY chunk —
        measured as ~10 s latency spikes on the 3-4 frames following a
        loop closure (the bench e2e max_ms). A stable function object
        lets jax.jit cache by shape: the first chunk after a map-size
        bucket change traces, every later chunk is a single dispatch —
        and prewarm() can pay the common buckets' traces up front."""
        from jax.sharding import Mesh

        from tpuslam.parallel import dist_ba

        cap = int(self.GBA_SHARDED_CAP or self.cfg.map.max_points)
        devs = jax.devices()
        d = 1
        while d * 2 <= len(devs) and cap % (d * 2) == 0:
            d *= 2
        key = (iters, cap, d)
        prog = self._gba_progs.get(key)
        if prog is not None:
            return prog, cap
        mesh = Mesh(np.asarray(devs[:d]), (dist_ba.AXIS,))
        stereo = self._ba_stereo
        fisheye = self._fisheye_stereo
        model = self.model
        bf = float(self.cfg.camera.bf)
        rig = self._rig

        @jax.jit
        def run(ms, kf_ids, fixed, cam_params, inv_sigma2_lut):
            mp_ids, local = mapstate.local_point_ids(ms, kf_ids,
                                                     cap=cap)
            prob = mapstate.build_ba_problem(
                ms, kf_ids, fixed, mp_ids, local, inv_sigma2_lut,
                stereo=stereo, fisheye=fisheye)
            rig_kw = ({"cam_params_r": rig[0], "R_rl": rig[1],
                       "t_rl": rig[2]} if fisheye else {})
            res = dist_ba.distributed_optimize(
                prob, cam_params, mesh, iters=iters, model=model,
                bf=jnp.float32(bf), **rig_kw)
            keep = (jnp.any(res.inlier, axis=0)
                    | ~jnp.any(prob.obs_mask, axis=0))
            return mapstate.scatter_ba_result(
                ms, kf_ids, mp_ids, res.kf_R, res.kf_t,
                res.points, keep)

        self._gba_progs[key] = run
        return run, cap

    def _run_global_ba_sharded(self, slots, iters: int,
                               commit: bool = True):
        """Landmark-sharded global BA over ALL live keyframes: the
        replicated camera system stays small (bucketed K <= pool size)
        while the landmark blocks shard across all local devices and the
        reduced Schur system is psum-summed over the mesh
        (parallel/dist_ba.distributed_optimize; the scale-out design
        SURVEY.md section 5.7 specifies). The keyframe axis is bucketed
        to powers of two and the landmark axis is STATIC
        (GBA_SHARDED_CAP, default cfg.map.max_points) so one session
        compiles O(log) chunk variants, prewarmable up front.
        `commit=False` (prewarm) discards the result."""
        n = len(slots)
        if n < 3:
            return
        K = self.GBA_WINDOW
        while K < n:
            K *= 2
        K = min(K, self.ms.kf_capacity)
        kf_ids = np.full((K,), -1, np.int32)
        kf_ids[:n] = slots
        fixed = np.ones((K,), bool)
        fixed[2:n] = False
        run, _cap = self._gba_sharded_prog(iters)
        with self.timer.stage("gba_sharded"):
            ms2 = run(self.ms, jnp.asarray(kf_ids), jnp.asarray(fixed),
                      self.cam_params, self.inv_sigma2_lut)
            if commit:
                self.ms = ms2
        if commit:
            self._invalidate_window()

    # -- background (chunked, abortable) global BA ---------------------------

    def _schedule_global_ba(self, iters: int = 12,
                            inertial: bool = False):
        """Queue a global BA to run as small chunks across the next
        frames instead of stalling this one — the reference's
        RunGlobalBundleAdjustment CHILD THREAD + mbAbortBA
        interruption semantics (/root/reference/src/LoopClosing.cc:1440,
        src/LocalMapping.cc:119) re-expressed for the superstep
        pipeline: each chunk is a short LM run over the full problem
        rebuilt from the CURRENT functional snapshot, so interim
        keyframes/points are naturally included and no correction
        propagation pass is needed."""
        self._gba_left = iters
        self._gba_inertial = inertial

    def _gba_step(self, force: bool = False):
        """Run one background-GBA chunk if one is queued and the mapping
        superstep is idle (a dispatched superstep takes priority — the
        mbAbortBA rule: tracking/mapping must not wait on GBA).
        `force` (flush/shutdown) ignores the pacing cooldown."""
        left = getattr(self, "_gba_left", 0)
        if not left or self.frozen:
            return
        if not force:
            if getattr(self, "_superstep_busy", False):
                return
            self._gba_cooldown = getattr(self, "_gba_cooldown", 0) - 1
            if self._gba_cooldown > 0:
                return
            self._gba_cooldown = self.GBA_CHUNK_SPACING
        chunk = min(self.GBA_CHUNK_ITERS, left)
        with self.timer.stage("gba_chunk"):
            if self._gba_inertial:
                self._full_inertial_ba(iters=chunk)
            else:
                self.run_global_ba(iters=chunk)
        self._gba_left = left - chunk

    def _need_keyframe(self, n_inl: int) -> bool:
        """NeedNewKeyFrame (src/Tracking.cc:3140-3270): ratio condition
        c2 against the reference KF's multi-observed point count, plus
        the inertial time-force c3 and weak-tracking c4. The reference's
        c1b idles on the mapping thread; the synchronous pipeline's
        analog is a minimum frame gap (kf_min_interval), which also
        keeps adjacent-keyframe baselines wide enough for conditioned
        triangulation (measured: 1-frame KF cadence gives ~1 deg
        relative-rotation noise that inertial init then absorbs as a
        fake gyro bias ~40x the true one)."""
        tcfg = self.cfg.tracking
        if self.frozen:
            # Localization-only mode never spawns keyframes
            # (mbOnlyTracking, src/Tracking.cc:3140).
            return False
        if (not self.free_kf_slots
                and self.n_kf >= self.cfg.map.max_keyframes_cap):
            return False
        imu = self._use_imu
        # c3: inertial keyframe cadence — force one every 0.5 s so the
        # preintegration chain's covariance stays small
        # (src/Tracking.cc:3246-3252).
        if imu and self.frames_since_kf >= int(0.5 * self.cfg.camera.fps):
            return True
        # c4: weak-but-alive inertial tracking inserts aggressively —
        # IMU_MONOCULAR only in the reference (src/Tracking.cc:3259).
        if (self.cfg.sensor == "imu_mono" and 15 < n_inl < 75
                and self.frames_since_kf >= 1):
            return True
        if n_inl < 15:
            return False
        stereo = self._use_depth
        # c1c: depth-sensor tracking is weak (src/Tracking.cc:3221).
        if stereo and (n_inl < 0.25 * self.ref_tracked
                       or self._need_close):
            return True
        # thRefRatio: 0.9 mono, 0.75 stereo/RGBD (src/Tracking.cc:3207).
        ratio = 0.75 if stereo else tcfg.kf_ref_ratio
        c1a = self.frames_since_kf >= tcfg.kf_max_interval
        c2 = ((n_inl < ratio * self.ref_tracked or self._need_close)
              and self.frames_since_kf >= tcfg.kf_min_interval)
        return c1a or c2

    def _alloc_kf_slot(self) -> Optional[int]:
        """Keyframe slot allocation with recycling: culled slots return
        to a free list instead of leaking capacity (the reference
        deletes KeyFrame objects; fixed pools recycle instead). A full
        pool DOUBLES up to map.max_keyframes_cap — slot ids stay valid
        so in-flight frames and the trajectory's keyframe references
        survive the growth (VERDICT r04 task 8: no silent 512-KF cap)."""
        if self.free_kf_slots:
            return self.free_kf_slots.pop(0)
        cap = self.ms.kf_capacity
        if self.n_kf >= cap and cap < self.cfg.map.max_keyframes_cap:
            new_cap = min(cap * 2, self.cfg.map.max_keyframes_cap)
            with self.timer.stage("kf_pool_growth"):
                self.ms = mapstate.grow_keyframes(self.ms, new_cap)
                if self.loop is not None:
                    self.loop.db = retrieval.grow_db(self.loop.db,
                                                     new_cap)
            self._invalidate_kf_set()
        if self.n_kf < self.ms.kf_capacity:
            s = self.n_kf
            self.n_kf += 1
            return s
        return None

    def _create_keyframe(self, feats, R, t, assoc, n_inl: int):
        """Keyframe superstep DISPATCH (LocalMapping::Run's per-KF
        pipeline, src/LocalMapping.cc:74). All device work (triangulate,
        fuse, spawn, local BA, hygiene, culling, redundancy) is enqueued
        without a single host round trip — the new-point counter chains
        as a device scalar — and the host-side decisions that need the
        results (slot bookkeeping, loop closing, stats) run in
        `_commit_mapping` at the START of the next frame. That is the
        reference's tracking/mapping thread overlap re-expressed for an
        async accelerator: the tracker keeps feeding frames while the
        device chews on the superstep; pure-functional snapshots replace
        the mutex handshake (SURVEY.md section 7.0). Inertial sessions
        commit immediately (the IMU init ladder is host-interactive)."""
        # Map-point pool compaction before we add more (slot recycling:
        # culled points' slots become reusable tail capacity). n_mp is
        # at most one keyframe stale in async mode; the 0.9 margin
        # covers a full keyframe's worth of spawns.
        if (self.n_mp > int(0.9 * self.cfg.map.max_points)
                and not self._inflight):
            with self.timer.stage("compaction"):
                self.ms, n_valid, _ = mapstate.compact_points(self.ms)
                self.n_mp = int(n_valid)
                self._invalidate_window()
        elif self.n_mp > int(0.9 * self.cfg.map.max_points):
            # Compaction REMAPS point slots, and frames still in flight
            # hold pre-compaction assoc indices — request it for the
            # top of the next process() call, where the pipeline can be
            # drained safely (no re-entrant retire).
            self._need_compaction = True
        slot = self._alloc_kf_slot()
        if slot is None:
            return
        kf_ur = None
        if (self._use_depth
                and self._cur_stereo is not None):
            kf_ur = self._cur_stereo.u_right
        kf_uvr = (self._cur_stereo_uvr
                  if self._fisheye_stereo else None)
        if not self._use_imu and not os.environ.get("TPUSLAM_NO_FUSED_SS"):
            # Visual sessions: the WHOLE superstep is one fused jitted
            # dispatch (insert + triangulate + fuse + spawn + BA +
            # hygiene + cull + commit scalars) — see _superstep_j.
            self._create_keyframe_fused(slot, feats, R, t, assoc,
                                        kf_ur, kf_uvr)
            return
        with self.timer.stage("kf_insert"):
            self.ms = mapstate.add_keyframe(self.ms, slot, R, t, feats,
                                            assoc, ur=kf_ur, uvr=kf_uvr)
        self.kf_slots.append(slot)
        self.kf_ts[slot] = self.last_ts
        self._invalidate_kf_set()
        self.frames_since_kf = 0

        if self._use_imu and self.cur_preint is not None:
            from tpuslam.imu import preintegration as pre

            # Record the preintegration linking the previous keyframe to
            # this one (mpImuPreintegratedFromLastKF handoff,
            # src/Tracking.cc:3330) and reset the accumulator.
            if len(self.kf_slots) >= 2:
                self.kf_preint[slot] = self.cur_preint
            self.kf_vel[slot] = (self.vel.copy()
                                 if self.vel is not None else None)
            self.cur_preint = pre.init_state(jnp.asarray(self.bg),
                                             jnp.asarray(self.ba))
            if not self.imu_initialized:
                self._try_imu_init()
            else:
                self._imu_stage_ladder()

        n_mp_dev = jnp.int32(self.n_mp)
        # Triangulate vs up to 2 previous keyframes. (Adding a third,
        # older partner was measured WORSE on the 120-frame fixture:
        # the older pose's drift leaks into the new points.)
        with self.timer.stage("triangulation"):
            _, _, near_ids, _ = self._window()
            near_safe = jnp.clip(near_ids, 0, self.ms.mp_capacity - 1)
            for prev in self.kf_slots[-3:-1]:
                near_pos = self.ms.mp_pos[near_safe]
                near_ok = (near_ids >= 0) & self.ms.mp_valid[near_safe]
                self.ms, n_new = _triangulate_between(
                    self.ms, prev, slot, n_mp_dev,
                    self.cam_params, self.sigma2_lut, near_pos, near_ok,
                    focal=float(self.cfg.camera.fx), model=self.model,
                )
                n_mp_dev = n_mp_dev + n_new.astype(jnp.int32)
        self._invalidate_window()   # fuse/BA must gather the new points

        # Fuse: densify cross-observations over the recent keyframes.
        with self.timer.stage("fuse"):
            _, _, fuse_ids, _ = self._window()
            for s in self.kf_slots[-4:]:
                self.ms = _fuse_into_kf(
                    self.ms, s, fuse_ids, self.cam_params, self.scale_lut,
                    self.inv_sigma2_lut, self.img_wh,
                    level_widen=(self._use_imu),
                    model=self.model,
                )

        # Depth-sensor near-point spawning for keypoints that stayed
        # unassociated through tracking + fuse (CreateNewKeyFrame,
        # src/Tracking.cc:3334-3421).
        if (self._use_depth
                and self._cur_stereo is not None):
            with self.timer.stage("stereo_spawn"):
                sm = self._cur_stereo
                self.ms, n_new = _spawn_stereo_points(
                    self.ms, slot, sm.depth, sm.valid,
                    n_mp_dev, self.cam_params, self.scale_lut,
                    jnp.float32(self.depth_th),
                    xc=self._cur_stereo_xc)
                n_mp_dev = n_mp_dev + n_new.astype(jnp.int32)
            self._invalidate_window()

        # Local BA: visual on the covisibility window, or the joint VI
        # window once the IMU is initialized (LocalMapping::Run picks
        # LocalInertialBA over LocalBundleAdjustment the same way,
        # src/LocalMapping.cc:179/186).
        with self.timer.stage("local_ba"):
            if (self._use_imu and self.imu_initialized
                    and self.enable_viba):
                self._local_inertial_ba(iters=self.cfg.solver.ba_iters)
                chi2 = jnp.float32(0.0)
            else:
                kf_ids, fixed, mp_ids, local = self._window()
                # Warm schedule: the window overlaps the previous
                # superstep's, so a short damped-GN run replaces the
                # full LM schedule (cold problems — init, GBA, merge —
                # keep ba_iters LM, see SolverConfig).
                self.ms, chi2 = _run_local_ba(
                    self.ms, kf_ids, fixed, mp_ids, local,
                    self.inv_sigma2_lut, self.cam_params,
                    iters=self.cfg.solver.ba_warm_iters, model=self.model,
                    stereo=self._ba_stereo,
                    bf=jnp.float32(self.cfg.camera.bf),
                    n_free=self.cfg.map.local_window,
                    trust_region=self.cfg.solver.ba_warm_trust_region,
                    fisheye=self._fisheye_stereo, rig=self._rig,
                )
        self._invalidate_window()   # BA re-gates point validity
        # Map-point hygiene over the refined window: distinctive
        # descriptors + viewing normals + scale ranges
        # (ComputeDistinctiveDescriptors / UpdateNormalAndDepth,
        # src/MapPoint.cc:350/467 — refreshed in SearchInNeighbors,
        # src/LocalMapping.cc:1060).
        if _HYGIENE:
            with self.timer.stage("hygiene"):
                kf_ids, _, mp_ids, local = self._window()
                self.ms = mapstate.refresh_point_hygiene(
                    self.ms, kf_ids, mp_ids, local, self.scale_lut)

        # Found-ratio culling (MapPointCulling analog) + the keyframe
        # redundancy score, still device-side.
        with self.timer.stage("culling"):
            self.ms = mapstate.cull_points(
                self.ms, self.cfg.map.cull_found_ratio, min_visible=8)
            self._invalidate_window()
            cull_cand, red_dev = None, None
            if len(self.kf_slots) > 6:
                cand = self.kf_slots[-3]
                cullable = True
                if self._use_imu:
                    idx = self.kf_slots.index(cand)
                    nxt = self.kf_slots[idx + 1]
                    cullable = (self.imu_initialized
                                and cand in self.kf_preint
                                and nxt in self.kf_preint
                                # keep the chain's time steps short: the
                                # reference only culls if dt stays < 0.5 s
                                and float(self.kf_preint[cand].dT
                                          + self.kf_preint[nxt].dT) < 0.5)
                if cullable:
                    cull_cand = cand
                    red_dev = mapstate.keyframe_redundancy(self.ms, cand)

        min_obs = 3 if len(self.kf_slots) > 2 else 2
        pend = {
            "n_mp": n_mp_dev,
            "chi2": chi2,
            "red": (red_dev if red_dev is not None
                    else jnp.float32(0.0)),
            "ref": mapstate.kf_tracked_points(self.ms, slot, min_obs),
            # Window landmark occupancy AFTER this superstep — the
            # next window's bucket estimate (replaces the blocking
            # per-stage count fetch, see _window).
            "win_count": mapstate.count_window_points(
                self.ms, self._window()[0]),
            # Covisibility weights of THIS keyframe (post-triangulate/
            # fuse/BA/cull): the next superstep's window selection ranks
            # with this deferred snapshot instead of a blocking
            # fetch-after-dispatch (see _window_slots).
            "covis": mapstate.covisibility_weights(self.ms, slot),
        }
        # Place recognition for the new keyframe: the DEVICE halves
        # (retrieval scoring + covisibility-group accumulation; merge
        # scoring against every archived map) dispatch here and ride
        # the superstep's queue; the host gates + temporal-consistency
        # counting run in the commit handler on the deferred scalars.
        # Detection therefore never blocks the frame path — the
        # reference runs it in the LoopClosing thread
        # (/root/reference/src/LoopClosing.cc:56).
        if self.enable_loop_closing and not self.frozen:
            with self.timer.stage("loop_mark"):
                loop_closing.on_new_keyframe(self.loop, self.ms, slot)
            with self.timer.stage("loop_detect"):
                mask = loop_closing.loop_excl_mask(
                    self.loop, slot, self.kf_slots, self.ms.kf_capacity)
                if mask is not None:
                    pend["loop"] = loop_closing.detect_loop_device(
                        self.loop.db, self.ms, jnp.int32(slot),
                        jnp.asarray(mask))
            if self.atlas is not None and self.atlas.n_maps:
                with self.timer.stage("merge_detect"):
                    pend["merge"] = loop_closing.merge_scores_device(
                        self.ms, slot, self.atlas)
        self._superstep_busy = True
        self._defer(pend, functools.partial(self._commit_superstep,
                                            slot, cull_cand))
        # Inertial sessions commit in place (the init ladder and the
        # preintegration bookkeeping are host-interactive anyway);
        # visual sessions defer the host round trips to the next frame.
        if (self._use_imu
                or not self.cfg.tracking.async_mapping):
            self._commit_mapping()

    def _create_keyframe_fused(self, slot, feats, R, t, assoc,
                               kf_ur, kf_uvr):
        """Visual-session keyframe superstep: bookkeeping + ONE fused
        device dispatch (_superstep_j) + the loop/merge detection
        dispatches, all deferred-committed. Replaces ~15 dispatches and
        ~70 ms of host glue per keyframe with a single program launch."""
        self.kf_slots.append(slot)
        self.kf_ts[slot] = self.last_ts
        self._invalidate_kf_set()
        self.frames_since_kf = 0
        # Covisibility-ranking fallback for the window selection: the
        # new keyframe is not in the device map yet (insertion happens
        # inside the fused program), so a missing snapshot anchors on
        # the previous keyframe instead.
        mcfg = self.cfg.map
        if (getattr(self, "_covis_host", None) is None
                and len(self.kf_slots) > mcfg.local_window
                + mcfg.local_fixed and len(self.kf_slots) >= 2):
            anchor = self.kf_slots[-2]
            self._covis_host = (anchor, np.asarray(
                mapstate.covisibility_weights(self.ms, anchor)))
        kf_ids, fixed, _, _ = self._window(slots_only=True)
        cull_cand = None
        if len(self.kf_slots) > 6:
            cull_cand = self.kf_slots[-3]
        prev2 = np.full((2,), -1, np.int32)
        partners = self.kf_slots[-3:-1]
        prev2[:len(partners)] = partners
        fuse4 = np.full((4,), -1, np.int32)
        targets = self.kf_slots[-4:]
        fuse4[:len(targets)] = targets
        min_obs = 3 if len(self.kf_slots) > 2 else 2
        if self._use_depth and self._cur_stereo is not None:
            sm = self._cur_stereo
            sp_depth, sp_valid = sm.depth, sm.valid
            sp_xc = self._cur_stereo_xc
        else:
            sp_depth = jnp.zeros((1,), jnp.float32)
            sp_valid = jnp.zeros((1,), bool)
            sp_xc = None
        scfg = self.cfg.solver
        with self.timer.stage("superstep_dispatch"):
            self.ms, pend = _superstep_j(
                self.ms, jnp.int32(slot), feats, assoc,
                jnp.asarray(R), jnp.asarray(t), kf_ur,
                sp_depth, sp_valid, sp_xc, kf_uvr,
                jnp.asarray(prev2), jnp.asarray(fuse4), kf_ids, fixed,
                jnp.int32(cull_cand if cull_cand is not None else -1),
                jnp.int32(min_obs), jnp.int32(self.n_mp),
                jnp.float32(mcfg.cull_found_ratio),
                self.cam_params, self.sigma2_lut, self.scale_lut,
                self.inv_sigma2_lut, self.img_wh,
                jnp.float32(self.cfg.camera.bf),
                jnp.float32(self.depth_th),
                self._rig if self._fisheye_stereo else (None, None, None),
                cap=self._bucket_cap(),
                focal=float(self.cfg.camera.fx), model=self.model,
                stereo=self._ba_stereo, use_depth=self._use_depth,
                fisheye=self._fisheye_stereo, hygiene=_HYGIENE,
                iters=scfg.ba_warm_iters, n_free=mcfg.local_window,
                trust_region=scfg.ba_warm_trust_region)
        self._invalidate_window()
        if self.enable_loop_closing and not self.frozen:
            with self.timer.stage("loop_mark"):
                loop_closing.on_new_keyframe(self.loop, self.ms, slot)
            with self.timer.stage("loop_detect"):
                mask = loop_closing.loop_excl_mask(
                    self.loop, slot, self.kf_slots, self.ms.kf_capacity)
                if mask is not None:
                    pend["loop"] = loop_closing.detect_loop_device(
                        self.loop.db, self.ms, jnp.int32(slot),
                        jnp.asarray(mask))
            if self.atlas is not None and self.atlas.n_maps:
                with self.timer.stage("merge_detect"):
                    pend["merge"] = loop_closing.merge_scores_device(
                        self.ms, slot, self.atlas)
        self._superstep_busy = True
        self._defer(pend, functools.partial(self._commit_superstep,
                                            slot, cull_cand))
        if not self.cfg.tracking.async_mapping:
            self._commit_mapping()

    def _commit_mapping(self):
        """Superstep COMMIT, sync flavor: blocking-fetch every deferred
        device scalar tree and run its handler now. The inertial path
        and flush() use this; the pipelined path drains the SAME FIFO
        inside _retire where the fetch is async-prefetched and
        therefore sub-millisecond."""
        if not self._deferred:
            return
        items, self._deferred = self._deferred, []
        vals = jax.device_get([v for v, _, _ in items])
        for (_vec, meta, h), v in zip(items, vals):
            h(_unpack_tree(v, meta))

    def _commit_superstep(self, slot, cull_cand, vals):
        """Host-decision half of LocalMapping::Run + LoopClosing::Run,
        applied to one superstep's fetched scalars: keyframe culling,
        KF-decision reference count, loop/merge gating + correction.
        Runs one-to-two frames after the superstep dispatch (pipelined)
        or immediately (sync/inertial)."""
        self._superstep_busy = False
        self.n_mp = int(vals["n_mp"])
        chi2 = float(vals["chi2"])
        red = float(vals["red"])
        ref = int(vals["ref"])
        self._win_count_est = int(vals["win_count"])

        # Keyframe culling (LocalMapping::KeyFrameCulling, th 0.9): the
        # 3rd-newest keyframe once the window is warm. In inertial mode
        # the culled keyframe's preintegration is merged into its
        # successor so the temporal IMU chain stays intact
        # (src/LocalMapping.cc:1282-1287).
        cand = cull_cand
        if cand is not None and cand in self.kf_slots \
                and float(red) > 0.9:
            if self._use_imu:
                from tpuslam.imu import preintegration as pre
                idx = self.kf_slots.index(cand)
                nxt = self.kf_slots[idx + 1]
                self.kf_preint[nxt] = pre.merge(
                    self.kf_preint[cand], self.kf_preint[nxt],
                    self._nga, self._walk)
            self.ms = mapstate.cull_keyframe(self.ms, cand)
            self.kf_slots.remove(cand)
            self.free_kf_slots.append(cand)
            self._invalidate_kf_set()
            self.kf_preint.pop(cand, None)
            self.kf_vel.pop(cand, None)
            self.kf_ts.pop(cand, None)
            # Drop it from the retrieval index too, or its stale
            # descriptors keep winning loop/reloc candidacy.
            self.loop.db = retrieval.unmark_keyframe(self.loop.db,
                                                     cand)

        # Reference tracked-point count for the KF-insertion ratio gate:
        # the new keyframe's multi-observed map points
        # (KeyFrame::TrackedMapPoints(minObs), used by NeedNewKeyFrame,
        # src/Tracking.cc:3185). Measured failure mode of the previous
        # "inliers at creation time" baseline: each KF fires exactly at
        # ratio*prev, so the threshold decays geometrically (100 -> 95
        # -> ... -> 25) until the tracker runs at the 15-inlier cliff
        # and one bad frame kills it.
        self.ref_tracked = max(int(ref), 1)
        self._covis_host = (slot, np.asarray(vals["covis"]))

        # Loop closing (LoopClosing::Run per-keyframe logic): gate the
        # superstep-dispatched detection scalars; a confirmed candidate
        # starts a PHASED job — Sim3 verification dispatches now with
        # its scalars deferred one frame, the essential-graph correction
        # applies one frame after that (covisibility matrix prefetched
        # in between). Mirrors the reference's LoopClosing-thread
        # latency (src/LoopClosing.cc:56): detection/verification/
        # correction never stall the frame that triggered them
        # (VERDICT r04 task 7).
        if self.enable_loop_closing:
            cand = None
            if "loop" in vals:
                c, sc, base = vals["loop"]
                with self.timer.stage("loop_decide"):
                    cand = loop_closing.loop_decide(
                        self.loop, slot, self.kf_slots, int(c),
                        float(sc), float(base))
            if cand is not None and self._loop_job is None:
                self.key, sub = jax.random.split(self.key)
                self._loop_job = ("verify", slot, cand)
                scal = loop_closing.verify_loop_device(
                    self.ms, slot, cand, self.cam_params, sub)
                self._defer(scal, functools.partial(
                    self._loop_verify_done, slot, cand))
            # Cross-map place recognition: the same new keyframe is also
            # scored against every archived map; a stable verified hit
            # triggers the weld (NewDetectCommonRegions' merge branch,
            # /root/reference/src/LoopClosing.cc:430-443).
            mcand = None
            if "merge" in vals:
                bm, bs, bsc = vals["merge"]
                with self.timer.stage("merge_detect"):
                    mcand = loop_closing.merge_decide(
                        self.loop, int(bm), int(bs), float(bsc), slot)
            if mcand is not None and self._loop_job is None:
                mi, mkf = mcand
                if mi < (self.atlas.n_maps if self.atlas else 0):
                    self.key, sub = jax.random.split(self.key)
                    self._loop_job = ("merge_verify", slot, mkf)
                    scal = loop_closing.verify_loop_device(
                        self.ms, slot, mkf, self.cam_params, sub,
                        ms_cand=self.atlas.maps[mi].ms)
                    self._defer(scal, functools.partial(
                        self._merge_verify_done, mi, mkf, slot))

        if self._use_imu:
            # The keyframe superstep moved poses/points: the next frame
            # re-anchors VI optimization on this keyframe
            # (mbMapUpdated -> LastKeyFrame variant, Tracking.cc:3035).
            self._map_updated = True
        self.stats = {"kf": len(self.kf_slots), "mp": self.n_mp,
                      "ba_chi2": float(chi2),
                      "loops": self.n_loops_closed,
                      "merges": self.n_merges}

    def _loop_verify_done(self, slot, cand, vals):
        """Phase 2 of a loop job: gate the deferred Sim3-verification
        scalars; on success prefetch the covisibility matrix and defer
        the correction apply one more frame."""
        ok, s_cl, R_cl, t_cl, _n = vals
        if (not bool(ok) or slot not in self.kf_slots
                or cand not in self.kf_slots):
            self._loop_job = None
            return
        self._loop_job = ("correct", slot, cand)
        covm = mapstate.covisibility_matrix(self.ms)
        self._defer({"covm": covm}, functools.partial(
            self._loop_correct_apply, slot, cand, float(s_cl),
            np.asarray(R_cl, np.float32), np.asarray(t_cl, np.float32)))

    def _loop_correct_apply(self, slot, cand, s_cl, R_cl, t_cl, vals):
        """Phase 3: essential-graph correction + seam fuse + background
        GBA scheduling (CorrectLoop, /root/reference/src/LoopClosing.cc:
        1210). The covisibility matrix arrives prefetched; the only
        blocking step left is the corrected-pose re-anchor fetch."""
        self._loop_job = None
        if slot not in self.kf_slots or cand not in self.kf_slots:
            return
        with self.timer.stage("loop_correct"):
            self.ms = loop_closing.correct_loop(
                self.loop, self.ms, slot, cand, self.kf_slots,
                s_cl, R_cl, t_cl,
                # IMU-initialized maps are metric AND gravity-aligned:
                # lock scale and bend only yaw+translation (the 4-DoF
                # essential graph, Optimizer.cc:8520).
                fix_scale=self.imu_initialized,
                gravity_w=(self.gravity_w
                           if self.imu_initialized else None),
                covm=vals["covm"])
            # Fuse duplicate landmarks across the seam BEFORE global BA
            # (SearchAndFuse, LoopClosing.cc:2631): the cross-seam
            # observations it creates are what keep GBA from pulling
            # the loop ends apart again.
            self.ms, _ = loop_closing.seam_fuse(
                self.ms, self.kf_slots, slot, cand)
            # Post-loop global refinement — queued as background chunks
            # (RunGlobalBundleAdjustment child thread analog,
            # LoopClosing.cc:1440); inertial maps get the
            # FullInertialBA(its=7) variant (LoopClosing.cc:2788).
            self._schedule_global_ba(
                iters=18 if not self.imu_initialized else 7,
                inertial=self.imu_initialized)
            self._invalidate_window()  # poses+points moved
            self.last_R = np.asarray(self.ms.kf_R[slot])
            self.last_t = np.asarray(self.ms.kf_t[slot])
            self.vel_R = np.eye(3, dtype=np.float32)
            self.vel_t = np.zeros(3, np.float32)
            self._world_moved = True
            self._carry_valid = False
            self.n_loops_closed += 1
            self.stats["loops"] = self.n_loops_closed

    def _merge_verify_done(self, mi, mkf, slot, vals):
        """Deferred cross-map Sim3 verification scalars -> the weld
        (MergeLocal, rare; the weld itself runs inline)."""
        self._loop_job = None
        ok, s_m, R_m, t_m, _n = vals
        if (not bool(ok) or slot not in self.kf_slots
                or mi >= (self.atlas.n_maps if self.atlas else 0)):
            return
        with self.timer.stage("merge"):
            if self._merge_maps(mi, mkf, slot, float(s_m),
                                np.asarray(R_m, np.float32),
                                np.asarray(t_m, np.float32)):
                self._world_moved = True
                self._carry_valid = False
                self.n_merges += 1
                self.stats["merges"] = self.n_merges
