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
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

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


@functools.partial(jax.jit, static_argnames=(
    "model", "radius1", "radius2", "sched"))
def _track_pose(
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
        ratio=1.0,
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


@functools.partial(jax.jit, static_argnames=("focal",))
def _triangulate_between(
    ms: mapstate.MapState,
    slot_i, slot_j,
    next_free,
    cam_params,
    sigma2_lut,      # (L,) sigma^2 per level (px^2)
    near_pos,        # (P,3) existing local map points (duplicate guard)
    near_ok,         # (P,)
    focal: float,
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

    bi = cameras.unproject(ms.kf_uv[slot_i], cam_params)
    bj = cameras.unproject(ms.kf_uv[slot_j], cam_params)

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
    ms, n_new = mapstate.add_points(
        ms, next_free,
        X, ms.kf_desc[slot_i], ms.kf_level[slot_i], ok,
        slot_i, jnp.arange(bi.shape[0], dtype=jnp.int32),
        slot_j, kp_j.astype(jnp.int32),
        scale_lut=jnp.sqrt(sigma2_lut),
    )
    return ms, n_new


@jax.jit
def _fuse_into_kf(
    ms: mapstate.MapState,
    slot,
    mp_ids,          # (P,) local map point ids
    cam_params,
    scale_lut,
    inv_sigma2_lut,
    img_wh,
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
    uv = cameras.project(Xc, cam_params)
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
    viewcos = jnp.sum(ms.mp_normal[safe] * (Xc @ R), axis=-1) \
        / jnp.maximum(dist, 1e-9)
    visible = visible & jnp.where(has_geom, viewcos > 0.5, True)
    visible = visible & jnp.where(
        has_geom,
        (dist >= 0.8 * ms.mp_dist_min[safe]) & (dist <= 1.2 * dmax), True)
    log_sf = jnp.log(scale_lut[1]) if scale_lut.shape[0] > 1 else 1.0
    lvl = jnp.ceil(jnp.log(jnp.maximum(dmax, 1e-9)
                           / jnp.maximum(dist, 1e-9)) / log_sf
                   ).astype(jnp.int32)
    lvl = jnp.where(has_geom, jnp.clip(lvl, 0, scale_lut.shape[0] - 1),
                    ms.mp_level[safe])
    feats = FrameFeatures(
        uv=ms.kf_uv[slot], level=ms.kf_level[slot], angle=ms.kf_uv[slot][:, 0],
        response=ms.kf_uv[slot][:, 0], desc=ms.kf_desc[slot],
        valid=ms.kf_kp_valid[slot],
    )
    res = matching.search_by_projection(
        uv, lvl, visible, ms.mp_desc[safe], feats, scale_lut,
        radius=6.0, max_dist=50, ratio=1.0,
    )
    kp = jnp.clip(res.idx, 0, feats.capacity - 1)
    r = uv - feats.uv[kp]
    inv_s2 = inv_sigma2_lut[jnp.clip(feats.level[kp], 0,
                                     inv_sigma2_lut.shape[0] - 1)]
    chi2 = jnp.sum(r * r, axis=-1) * inv_s2
    # Loose gate for the same reason as the tracker's association pass:
    # BA refines what it can observe.
    good = (res.idx >= 0) & (chi2 <= 4.0 * pose_opt.CHI2_MONO)

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


@functools.partial(jax.jit, static_argnames=("iters",))
def _run_local_ba(ms: mapstate.MapState, kf_ids, fixed, mp_ids,
                  local_of_global, inv_sigma2_lut, cam_params,
                  iters: int = 10):
    prob = mapstate.build_ba_problem(
        ms, kf_ids, fixed, mp_ids, local_of_global, inv_sigma2_lut
    )
    res = local_ba.optimize(prob, cam_params, iters=iters)
    # Keep points with at least one inlier observation in the window.
    observed = jnp.any(prob.obs_mask, axis=0)
    pt_keep = jnp.any(res.inlier, axis=0) | ~observed
    ms = mapstate.scatter_ba_result(
        ms, kf_ids, mp_ids, res.kf_R, res.kf_t, res.points, pt_keep
    )
    return ms, res.total_chi2


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
    kf_slots: List[int] = field(default_factory=list)
    free_kf_slots: List[int] = field(default_factory=list)  # recycled slots
    stats: dict = field(default_factory=dict)
    enable_loop_closing: bool = True
    frozen: bool = False            # localization-only: no map mutation
    loop: loop_closing.LoopState = None
    n_loops_closed: int = 0
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
        # Feature capacity = what the extractor actually emits.
        self.n_feat = sum(extractor.features_per_level(
            self.cfg.orb.n_features, self.cfg.orb.n_levels,
            self.cfg.orb.scale_factor))
        self.ms = mapstate.empty(mcfg.max_keyframes, mcfg.max_points,
                                 self.n_feat)
        cam = self.cfg.camera
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
        from tpuslam.mapping.atlas import Atlas
        from tpuslam.utils.profiling import StageTimer

        self.key = jax.random.PRNGKey(self.cfg.seed)
        self.loop = loop_closing.LoopState.create(mcfg.max_keyframes)
        self.atlas = Atlas()
        self.timer = StageTimer()
        if self.cfg.sensor == "imu_mono":
            from tpuslam.imu import preintegration as pre

            icfg = self.cfg.imu
            self._nga, self._walk = pre.discrete_noise(
                icfg.noise_gyro, icfg.noise_acc, icfg.walk_gyro,
                icfg.walk_acc, icfg.freq)
            self.vel = np.zeros(3, np.float32)
            self.bg = np.zeros(3, np.float32)
            self.ba = np.zeros(3, np.float32)
            self.cur_preint = pre.init_state()
        self._vel_pred = None
        self.last_R = np.eye(3, dtype=np.float32)
        self.last_t = np.zeros(3, np.float32)
        self.vel_R = np.eye(3, dtype=np.float32)
        self.vel_t = np.zeros(3, np.float32)
        self.stats = {"kf": 0, "mp": 0, "ba_chi2": 0.0}

    # -- public API ---------------------------------------------------------

    def process(self, img: np.ndarray, imu=None) -> FrameResult:
        """Track one frame. `imu` (sensor == imu_mono): tuple
        (gyro (S,3), acc (S,3), dt (S,)) of samples since the previous
        frame (GrabImuData + PreintegrateIMU, src/Tracking.cc:1202/1217).
        """
        if imu is not None and self.cfg.sensor == "imu_mono":
            with self.timer.stage("imu_preintegration"):
                self._integrate_imu(*imu)
        with self.timer.stage("orb_extraction"):
            feats = extractor.extract_jit(jnp.asarray(img, jnp.float32),
                                          self.cfg.orb)
            if self.dist is not None:
                feats = feats._replace(uv=_undistort_uv(
                    feats.uv, self.cam_params, self.dist))
        if self.state == "NOT_INITIALIZED":
            out = self._initialize(feats)
        elif self.state == "OK":
            out = self._track(feats)
        else:  # LOST: attempt relocalization (Tracking.cc:3764)
            ok, R, t, n = loop_closing.relocalize(
                self.loop, self.ms, feats, self.cam_params,
                self.inv_sigma2_lut)
            if ok:
                self.state = "OK"
                self.lost_count = 0
                self.last_R, self.last_t = R, t
                self.vel_R = np.eye(3, dtype=np.float32)
                self.vel_t = np.zeros(3, np.float32)
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
        return out

    def positions(self) -> np.ndarray:
        """Camera centers (world frame) per processed frame."""
        out = []
        for p in self.trajectory:
            R = p[:9].reshape(3, 3)
            t = p[9:]
            out.append(-R.T @ t)
        return np.stack(out) if out else np.zeros((0, 3))

    # -- initialization -----------------------------------------------------

    def _initialize(self, feats: FrameFeatures) -> FrameResult:
        tcfg = self.cfg.tracking
        n_valid = int(jnp.sum(feats.valid))
        if self.init_feats is None:
            if n_valid >= tcfg.init_min_matches:
                self.init_feats = feats
                self.init_age = 0
            return FrameResult("NOT_INITIALIZED", self.last_R, self.last_t, 0)

        self.init_age += 1
        res = _init_match(self.init_feats, feats)
        n_match = int(jnp.sum(res.idx >= 0))
        if n_match < tcfg.init_min_matches:
            if self.init_age > 20 and n_valid >= tcfg.init_min_matches:
                self.init_feats = feats
                self.init_age = 0
            return FrameResult("NOT_INITIALIZED", self.last_R, self.last_t,
                               n_match)

        from tpuslam.geometry import cameras

        fa, fb = self.init_feats, feats
        kp_b = jnp.clip(res.idx, 0, fb.capacity - 1)
        b1 = cameras.unproject(fa.uv, self.cam_params)
        b2 = cameras.unproject(fb.uv[kp_b], self.cam_params)
        self.key, sub = jax.random.split(self.key)
        rec = _reconstruct(b1, b2, res.idx >= 0, sub,
                           focal=float(self.cfg.camera.fx))
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

        ms = self.ms
        eye = jnp.eye(3, dtype=jnp.float32)
        zero = jnp.zeros(3, jnp.float32)
        ms = mapstate.add_keyframe(ms, 0, eye, zero, fa,
                                   jnp.full((self.n_feat,), -1, jnp.int32))
        ms = mapstate.add_keyframe(ms, 1, jnp.asarray(R1), jnp.asarray(t1),
                                   fb, jnp.full((self.n_feat,), -1, jnp.int32))
        ms, n_new = mapstate.add_points(
            ms, jnp.int32(0),
            jnp.asarray(X), fa.desc, fa.level, rec.good,
            0, jnp.arange(self.n_feat, dtype=jnp.int32),
            1, kp_b.astype(jnp.int32),
            scale_lut=self.scale_lut,
        )
        self.n_mp = int(n_new)
        self.n_kf = 2
        self.kf_slots = [0, 1]

        # Initial BA over the two views (GlobalBundleAdjustemnt(20),
        # src/Tracking.cc:2573), KF0 fixed; then re-normalize depth.
        kf_ids, fixed, mp_ids, local = self._window(free=1)
        ms, chi2 = _run_local_ba(ms, kf_ids, fixed, mp_ids, local,
                                 self.inv_sigma2_lut, self.cam_params,
                                 iters=15)
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
        if self.cfg.sensor == "imu_mono":
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
        self.ref_tracked = int(jnp.sum(rec.good))
        self.stats["kf"] = 2
        self.stats["mp"] = self.n_mp
        return FrameResult("OK", self.last_R, self.last_t, self.ref_tracked,
                           is_keyframe=True)

    def _new_map_in_atlas(self):
        """Archive the current map (if it earned enough keyframes) and
        start a fresh active map — the Atlas elastic-recovery path."""
        from tpuslam.mapping.atlas import ArchivedMap

        kept = self.atlas.archive(ArchivedMap(
            ms=self.ms, kf_slots=list(self.kf_slots), n_kf=self.n_kf,
            n_mp=self.n_mp, trajectory=list(self.trajectory),
            n_loops=self.n_loops_closed,
        ))
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
        self.free_kf_slots = []
        self._win_cache_key = None
        if self.cfg.sensor == "imu_mono":
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

    def _window(self, free: Optional[int] = None):
        """Local covisibility window as fixed-shape arrays for the jitted
        BA/matching programs."""
        mcfg = self.cfg.map
        W = mcfg.local_window + mcfg.local_fixed
        target = mcfg.local_window if free is None else free
        cache_key = (len(self.kf_slots), self.n_mp, self.n_loops_closed,
                     target)
        if getattr(self, "_win_cache_key", None) == cache_key:
            return self._win_cache
        chosen, free_set = self._window_slots(target)
        n = len(chosen)
        kf_ids = np.full((W,), -1, np.int32)
        fixed = np.ones((W,), bool)
        kf_ids[:n] = chosen
        for i, s in enumerate(chosen):
            fixed[i] = s not in free_set
        kf_ids_j = jnp.asarray(kf_ids)
        mp_ids, local = mapstate.local_point_ids(
            self.ms, kf_ids_j, cap=mcfg.ba_point_cap
        )
        out = (kf_ids_j, jnp.asarray(fixed), mp_ids, local)
        self._win_cache_key = cache_key
        self._win_cache = out
        return out

    # -- inertial plumbing ---------------------------------------------------

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

        Rwb = jnp.asarray(self.last_R.T)
        pwb = jnp.asarray(-self.last_R.T @ self.last_t)
        Rj, pj, vj = pre.predict(
            self.frame_preint, Rwb, pwb, jnp.asarray(self.vel),
            jnp.asarray(self.bg), jnp.asarray(self.ba))
        R_cw = jnp.swapaxes(Rj, -1, -2)
        t_cw = -jnp.einsum("ij,j->i", R_cw, pj)
        return R_cw, t_cw, np.asarray(vj)

    def _try_imu_init(self):
        """IMU init ladder entry (LocalMapping::InitializeIMU,
        src/LocalMapping.cc:1437): inertial-only optimization over the
        keyframe chain, then ApplyScaledRotation to the whole map."""
        from tpuslam.solver import vi_ba

        # Chain: use the LAST <=8 keyframes (kf_preint[s] holds the
        # preintegration from the previous keyframe to s). The young
        # map's early keyframes carry mono scale drift; a recent window
        # is internally scale-consistent (the reference equally windows
        # InertialOptimization over the latest keyframes).
        if len(self.kf_slots) < 2:
            return
        chain = [self.kf_slots[1]] + [
            s for s in self.kf_slots[2:] if s in self.kf_preint]
        slots = chain[-8:]
        # Map maturity gate (>=10 KFs, LocalMapping.cc:1443): the young
        # map's scale drift produces confidently-wrong early estimates.
        if len(slots) < 6 or len(self.kf_slots) < 10:
            return
        Rwb = jnp.asarray(np.stack(
            [np.asarray(self.ms.kf_R[s]).T for s in slots]))
        pwb = jnp.asarray(np.stack(
            [-np.asarray(self.ms.kf_R[s]).T @ np.asarray(self.ms.kf_t[s])
             for s in slots]))
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[self.kf_preint[s] for s in slots[1:]])
        res = vi_ba.inertial_init(
            Rwb, pwb, stacked, jnp.ones((len(slots) - 1,), bool),
            gravity_mag=self.cfg.imu.gravity,
        )
        s = float(res.scale)
        # Acceptance gates:
        # 1. scale sanity (LocalMapping.cc:1558);
        # 2. PHYSICAL health check: the closed-form linear alignment
        #    solves gravity as a FREE vector — its norm is ~9.81 only
        #    when the window's scale regime is consistent (VINS-Mono's
        #    standard check; whitened MAP cost cannot discriminate and
        #    consecutive estimates can be consistently wrong on a
        #    drifting young map);
        # 3. stability: consecutive keyframes' estimates agree.
        prev = getattr(self, "_init_scale_prev", None)
        # prev updates on EVERY attempt (even rejected ones) so the
        # agreement check is between genuinely consecutive estimates.
        self._init_scale_prev = s
        if not (0.1 < s < 50.0) or not np.isfinite(s):
            return
        if abs(float(res.g_lin_norm) - self.cfg.imu.gravity) > 0.5:
            return
        if prev is None or abs(s - prev) > 0.4 * max(s, prev):
            return
        # ApplyScaledRotation (Map.h:122): x' = s Rwg^T x so gravity
        # aligns with -z and the map becomes metric.
        Rgw = jnp.asarray(res.Rwg).T
        self.ms = self.ms._replace(
            mp_pos=s * jnp.einsum("ij,mj->mi", Rgw, self.ms.mp_pos),
            kf_R=jnp.einsum("kij,jl->kil", self.ms.kf_R,
                            jnp.asarray(res.Rwg)),
            kf_t=s * self.ms.kf_t,
            mp_normal=jnp.einsum("ij,mj->mi", Rgw, self.ms.mp_normal),
            mp_dist_min=s * self.ms.mp_dist_min,
            mp_dist_max=s * self.ms.mp_dist_max,
        )
        self.last_R = np.asarray(self.ms.kf_R[self.kf_slots[-1]])
        self.last_t = np.asarray(self.ms.kf_t[self.kf_slots[-1]])
        self.bg = np.asarray(res.bg)
        self.ba = np.asarray(res.ba)
        self.vel = np.asarray(Rgw @ jnp.asarray(res.vel[-1]))
        self.vel_t = self.vel_t * s
        Rgw_np = np.asarray(Rgw)
        self.kf_vel = {k: (Rgw_np @ v if v is not None else None)
                       for k, v in self.kf_vel.items()}
        self.imu_initialized = True
        # Joint visual-inertial refinement of the init window — the
        # FullInertialBA(its=100) the reference runs right after
        # InitializeIMU (src/LocalMapping.cc:1593): the inertial-only
        # estimate leaves large bias/scale residue that only the joint
        # problem can resolve.
        # NOTE: disabled pending weight tuning — with near-noiseless
        # simulated IMU the whitened inertial terms dominate the joint
        # cost 10:1 and pull poses off the visual map's self-consistency,
        # which breaks guided tracking. Round 2: balance via proper
        # visual whitening or staged vis_weight.
        # self._viba_window(slots, jnp.asarray(Rgw), s, res)
        # Re-linearize the keyframe preintegration accumulator.
        from tpuslam.imu import preintegration as pre
        self.cur_preint = pre.init_state(jnp.asarray(self.bg),
                                         jnp.asarray(self.ba))

    VIBA_K = 8  # static window size of the post-init VI refinement

    def _viba_window(self, slots, Rgw, s_init, init_res):
        """Visual-inertial BA over the init chain (VIBA1 analog).

        Runs on the ALREADY-transformed (metric, gravity-aligned) map;
        refines window poses, velocities, shared-ish biases and points
        jointly, then writes everything back."""
        from tpuslam.solver import vi_ba

        K = self.VIBA_K
        slots = slots[-K:]
        n = len(slots)
        kf_ids = np.full((K,), -1, np.int32)
        kf_ids[:n] = slots
        kf_ids_j = jnp.asarray(kf_ids)
        mp_ids, local = mapstate.local_point_ids(
            self.ms, kf_ids_j, cap=self.cfg.map.ba_point_cap)
        prob = mapstate.build_ba_problem(
            self.ms, kf_ids_j, jnp.zeros((K,), bool), mp_ids, local,
            self.inv_sigma2_lut)

        # Body states from the transformed map (body == camera).
        Rwb = jnp.swapaxes(prob.kf_R, -1, -2)
        pwb = -jnp.einsum("kij,kj->ki", Rwb, prob.kf_t)
        # Velocities from the init result, rotated into the new (metric,
        # gravity-aligned) world: v' = Rgw v. Pad rows replicate the last.
        vel_new = np.asarray(init_res.vel) @ np.asarray(Rgw).T
        vel = np.zeros((K, 3), np.float32)
        vel[:n] = vel_new[-n:]
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
            Rcb=jnp.eye(3, dtype=jnp.float32),
            tcb=jnp.zeros(3, jnp.float32),
        )
        walk_info = jnp.full((6,), 1.0 / 1e-3, jnp.float32)
        res = vi_ba.optimize_vi(
            win, self.cam_params,
            jnp.asarray([0.0, 0.0, -self.cfg.imu.gravity], jnp.float32),
            walk_info, iters=10)

        # Write back: poses (Tcw from body), points, bias/velocity.
        R_cw = jnp.swapaxes(res.Rwb, -1, -2)
        t_cw = -jnp.einsum("kij,kj->ki", R_cw, res.pwb)
        keep = jnp.any(res.inlier, axis=0) | ~jnp.any(prob.obs_mask, axis=0)
        self.ms = mapstate.scatter_ba_result(
            self.ms, kf_ids_j, mp_ids, R_cw, t_cw, res.points, keep)
        self.bg = np.asarray(res.bg[n - 1])
        self.ba = np.asarray(res.ba[n - 1])
        self.vel = np.asarray(res.vel[n - 1])
        self.last_R = np.asarray(self.ms.kf_R[slots[-1]])
        self.last_t = np.asarray(self.ms.kf_t[slots[-1]])

    def _track(self, feats: FrameFeatures) -> FrameResult:
        tcfg = self.cfg.tracking
        if (self.cfg.sensor == "imu_mono" and self.imu_initialized
                and self.frame_preint is not None):
            R_pred, t_pred, vel_pred = self._imu_predict()
            self._vel_pred = vel_pred
        else:
            # Constant-velocity motion model.
            R_pred = jnp.asarray(self.vel_R @ self.last_R)
            t_pred = jnp.asarray(self.vel_R @ self.last_t + self.vel_t)
            self._vel_pred = None

        kf_ids, _, mp_ids, _ = self._window()
        safe = jnp.clip(mp_ids, 0, self.ms.mp_capacity - 1)
        mp_ok = (mp_ids >= 0) & self.ms.mp_valid[safe]
        # Inertial mode keeps the longer GN schedule: pose accuracy
        # feeds the preintegration chain and the init's scale estimate.
        sched = (((2, 5), (3, 5)) if self.cfg.sensor == "imu_mono"
                 else ((2, 3), (2, 4)))
        with self.timer.stage("local_map_track"):
            R, t, assoc, n_inl, visible_ids, found_ids = _track_pose(
                R_pred, t_pred,
                mp_ids, self.ms.mp_pos[safe], self.ms.mp_desc[safe],
                self.ms.mp_level[safe], mp_ok,
                self.ms.mp_normal[safe], self.ms.mp_dist_min[safe],
                self.ms.mp_dist_max[safe],
                feats, self.cam_params, self.scale_lut, self.inv_sigma2_lut,
                self.img_wh, sched=sched,
            )
            n_inl = int(n_inl)
        if not self.frozen:
            self.ms = mapstate.update_point_stats(self.ms, visible_ids,
                                                  found_ids)

        if n_inl < tcfg.min_inliers_track:
            self.state = "LOST"
            return FrameResult("LOST", self.last_R, self.last_t, n_inl)

        R_np, t_np = np.asarray(R), np.asarray(t)
        # Velocity (camera-from-camera relative motion).
        self.vel_R = R_np @ self.last_R.T
        self.vel_t = t_np - self.vel_R @ self.last_t
        if self.cfg.sensor == "imu_mono":
            # World-velocity estimate from the OPTIMIZED poses (finite
            # difference): the IMU-propagated velocity is never corrected
            # by vision and its error integrates (bias/gravity residuals)
            # until guided search misses — the classic VIO failure.
            c_prev = -self.last_R.T @ self.last_t
            c_now = -R_np.T @ t_np
            self.vel = ((c_now - c_prev) * self.cfg.camera.fps
                        ).astype(np.float32)
        self.last_R, self.last_t = R_np, t_np
        self.frames_since_kf += 1

        is_kf = self._need_keyframe(n_inl)
        if is_kf:
            self._create_keyframe(feats, R, t, assoc, n_inl)
        return FrameResult("OK", R_np, t_np, n_inl, is_keyframe=is_kf)

    GBA_WINDOW = 64  # static shape of the global-BA problem

    def run_global_ba(self, iters: int = 12):
        """GlobalBundleAdjustemnt analog (Optimizer.cc:54): one dense BA
        over (up to) the last GBA_WINDOW keyframes — truly global for
        maps below that size; the sharded variant in parallel/dist_ba
        scales beyond. Called after loop correction like the reference's
        RunGlobalBundleAdjustment thread (LoopClosing.cc:1440)."""
        W = self.GBA_WINDOW
        slots = [s for s in self.kf_slots if bool(self.ms.kf_valid[s])][-W:]
        n = len(slots)
        if n < 3:
            return
        kf_ids = np.full((W,), -1, np.int32)
        kf_ids[:n] = slots
        fixed = np.ones((W,), bool)
        fixed[2:n] = False  # first two anchor the gauge
        kf_ids_j = jnp.asarray(kf_ids)
        mp_ids, local = mapstate.local_point_ids(
            self.ms, kf_ids_j, cap=self.cfg.map.ba_point_cap)
        self.ms, _ = _run_local_ba(
            self.ms, kf_ids_j, jnp.asarray(fixed), mp_ids, local,
            self.inv_sigma2_lut, self.cam_params, iters=iters)

    def _need_keyframe(self, n_inl: int) -> bool:
        """NeedNewKeyFrame rules c1a/c2 (src/Tracking.cc:3227-3240)."""
        tcfg = self.cfg.tracking
        if self.frozen:
            # Localization-only mode never spawns keyframes
            # (mbOnlyTracking, src/Tracking.cc:3140).
            return False
        if (not self.free_kf_slots
                and self.n_kf >= self.cfg.map.max_keyframes):
            return False
        if n_inl < 15:
            return False
        c1a = self.frames_since_kf >= tcfg.kf_max_interval
        c2 = (n_inl < tcfg.kf_ref_ratio * self.ref_tracked
              and self.frames_since_kf >= 1)
        return c1a or c2

    def _alloc_kf_slot(self) -> Optional[int]:
        """Keyframe slot allocation with recycling: culled slots return
        to a free list instead of leaking capacity (the reference deletes
        KeyFrame objects; fixed pools recycle instead)."""
        if self.free_kf_slots:
            return self.free_kf_slots.pop(0)
        if self.n_kf < self.cfg.map.max_keyframes:
            s = self.n_kf
            self.n_kf += 1
            return s
        return None

    def _create_keyframe(self, feats, R, t, assoc, n_inl: int):
        # Map-point pool compaction before we add more (slot recycling:
        # culled points' slots become reusable tail capacity).
        if self.n_mp > int(0.9 * self.cfg.map.max_points):
            with self.timer.stage("compaction"):
                self.ms, n_valid, _ = mapstate.compact_points(self.ms)
                self.n_mp = int(n_valid)
                self._win_cache_key = None
        slot = self._alloc_kf_slot()
        if slot is None:
            return
        with self.timer.stage("kf_insert"):
            self.ms = mapstate.add_keyframe(self.ms, slot, R, t, feats,
                                            assoc)
        self.kf_slots.append(slot)
        self._win_cache_key = None
        self.frames_since_kf = 0
        self.ref_tracked = max(n_inl, 1)

        if self.cfg.sensor == "imu_mono" and self.cur_preint is not None:
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
                    self.ms, prev, slot, jnp.int32(self.n_mp),
                    self.cam_params, self.sigma2_lut, near_pos, near_ok,
                    focal=float(self.cfg.camera.fx),
                )
                self.n_mp += int(n_new)

        # Fuse: densify cross-observations over the recent keyframes.
        with self.timer.stage("fuse"):
            _, _, fuse_ids, _ = self._window()
            for s in self.kf_slots[-4:]:
                self.ms = _fuse_into_kf(
                    self.ms, s, fuse_ids, self.cam_params, self.scale_lut,
                    self.inv_sigma2_lut, self.img_wh,
                )

        # Local BA on the temporal window.
        with self.timer.stage("local_ba"):
            kf_ids, fixed, mp_ids, local = self._window()
            self.ms, chi2 = _run_local_ba(
                self.ms, kf_ids, fixed, mp_ids, local,
                self.inv_sigma2_lut, self.cam_params,
                iters=self.cfg.solver.ba_iters,
            )
        # Map-point hygiene over the refined window: distinctive
        # descriptors + viewing normals + scale ranges
        # (ComputeDistinctiveDescriptors / UpdateNormalAndDepth,
        # src/MapPoint.cc:350/467 — refreshed in SearchInNeighbors,
        # src/LocalMapping.cc:1060).
        with self.timer.stage("hygiene"):
            kf_ids, _, mp_ids, local = self._window()
            self.ms = mapstate.refresh_point_hygiene(
                self.ms, kf_ids, mp_ids, local, self.scale_lut)

        # Found-ratio culling (MapPointCulling analog).
        with self.timer.stage("culling"):
            self.ms = mapstate.cull_points(
                self.ms, self.cfg.map.cull_found_ratio, min_visible=8)
            # Keyframe culling (LocalMapping::KeyFrameCulling, th 0.9):
            # check the 3rd-newest keyframe once the window is warm.
            # Skipped in inertial mode for now — culling must merge the
            # temporal preintegration chain (LocalMapping.cc:1282).
            if (self.cfg.sensor == "mono" and len(self.kf_slots) > 6):
                cand = self.kf_slots[-3]
                if float(mapstate.keyframe_redundancy(self.ms, cand)) > 0.9:
                    self.ms = mapstate.cull_keyframe(self.ms, cand)
                    self.kf_slots.remove(cand)
                    self.free_kf_slots.append(cand)
                    self._win_cache_key = None
                    self.kf_preint.pop(cand, None)
                    self.kf_vel.pop(cand, None)
                    # Drop it from the retrieval index too, or its stale
                    # descriptors keep winning loop/reloc candidacy.
                    self.loop.db = retrieval.unmark_keyframe(self.loop.db,
                                                             cand)

        # Loop closing (LoopClosing::Run per-keyframe logic).
        if self.enable_loop_closing:
            loop_closing.on_new_keyframe(self.loop, self.ms, slot)
            with self.timer.stage("loop_detect"):
                cand = loop_closing.detect_loop(self.loop, self.ms, slot,
                                                self.kf_slots)
            if cand is not None:
                self.key, sub = jax.random.split(self.key)
                with self.timer.stage("loop_correct"):
                    ok, s_cl, R_cl, t_cl = loop_closing.verify_loop(
                        self.ms, slot, cand, self.cam_params, sub)
                    if ok:
                        self.ms = loop_closing.correct_loop(
                            self.loop, self.ms, slot, cand, self.kf_slots,
                            s_cl, R_cl, t_cl,
                            # Metric maps (IMU-initialized) lock scale —
                            # the 4-DoF-variant role (Optimizer.cc:8520).
                            fix_scale=self.imu_initialized)
                        # Post-loop global refinement
                        # (RunGlobalBundleAdjustment analog).
                        self.run_global_ba()
                        self.last_R = np.asarray(self.ms.kf_R[slot])
                        self.last_t = np.asarray(self.ms.kf_t[slot])
                        self.vel_R = np.eye(3, dtype=np.float32)
                        self.vel_t = np.zeros(3, np.float32)
                        self.n_loops_closed += 1

        self.stats = {"kf": len(self.kf_slots), "mp": self.n_mp,
                      "ba_chi2": float(chi2),
                      "loops": self.n_loops_closed}
