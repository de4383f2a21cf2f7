"""SoA map pools: the functional replacement of Map/KeyFrame/MapPoint.

The reference's map is a pointer graph guarded by a mutex hierarchy
(/root/reference/include/Map.h, KeyFrame.h:304-330 covisibility,
MapPoint.h observations; SURVEY.md section 2.1). Here the whole map is a
NamedTuple of fixed-capacity device arrays with validity masks:

- keyframes: pose + feature SoA + per-keypoint map-point id
  (`kf_obs_mp`, the inverse of MapPoint::mObservations);
- map points: position, descriptor, reference level, visible/found
  counters (MapPoint::mnVisible/mnFound for culling,
  /root/reference/src/LocalMapping.cc:414 MapPointCulling).

Updates are pure functions returning new states, so a background BA can
run on a snapshot while tracking continues — the reference's
change-index versioning (Map.h:113-116) without locks. Slot allocation
is append-only with host-side counters; culling clears validity bits
(slots are recycled only by future compaction).

Everything here jits with static capacities; out-of-capacity writes are
dropped via scatter mode="drop" on a sentinel index.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.frontend.extractor import FrameFeatures
from tpuslam.solver.local_ba import BAProblem


class MapState(NamedTuple):
    # Keyframes.
    kf_R: jax.Array         # (K,3,3) camera-from-world
    kf_t: jax.Array         # (K,3)
    kf_valid: jax.Array     # (K,)
    kf_uv: jax.Array        # (K,N,2)
    kf_level: jax.Array     # (K,N)
    kf_desc: jax.Array      # (K,N,8)
    kf_kp_valid: jax.Array  # (K,N)
    kf_response: jax.Array  # (K,N) FAST score (retrieval gates on it)
    kf_obs_mp: jax.Array    # (K,N) int32 map-point id or -1
    # Rectified-stereo / RGBD virtual right-image u per keypoint
    # (Frame::mvuRight, /root/reference/include/Frame.h); < 0 = mono
    # observation. Feeds the 3-dof EdgeStereo residual in BA.
    kf_ur: jax.Array        # (K,N)
    # Non-rectified (fisheye) rigs: observed RIGHT-image pixel of the
    # keypoint's stereo match (< 0 = no right observation). Feeds the
    # right-camera reprojection residual through the rig extrinsics
    # (EdgeSE3ProjectXYZToBody, /root/reference/include/
    # OptimizableTypes.h:117) in BA — the metric-scale constraint of
    # KB8 stereo, which has no rectified u-bf/z coordinate.
    kf_uvr: jax.Array       # (K,N,2)
    # Map points.
    mp_pos: jax.Array       # (M,3)
    mp_valid: jax.Array     # (M,)
    mp_desc: jax.Array      # (M,8)
    mp_level: jax.Array     # (M,) reference octave for scale prediction
    mp_visible: jax.Array   # (M,) int32
    mp_found: jax.Array     # (M,) int32
    # Viewing geometry (MapPoint::UpdateNormalAndDepth,
    # /root/reference/src/MapPoint.cc:467): mean camera->point direction
    # and the scale-invariance distance range for PredictScale (:570).
    mp_normal: jax.Array    # (M,3) unit world-frame viewing direction
    mp_dist_min: jax.Array  # (M,)
    mp_dist_max: jax.Array  # (M,) <=0 means "not yet computed"

    @property
    def kf_capacity(self) -> int:
        return self.kf_R.shape[0]

    @property
    def mp_capacity(self) -> int:
        return self.mp_pos.shape[0]


def empty(max_kf: int, max_mp: int, n_feat: int, dtype=jnp.float32) -> MapState:
    return MapState(
        kf_R=jnp.tile(jnp.eye(3, dtype=dtype), (max_kf, 1, 1)),
        kf_t=jnp.zeros((max_kf, 3), dtype),
        kf_valid=jnp.zeros((max_kf,), bool),
        kf_uv=jnp.zeros((max_kf, n_feat, 2), dtype),
        kf_level=jnp.zeros((max_kf, n_feat), jnp.int32),
        kf_desc=jnp.zeros((max_kf, n_feat, 8), jnp.uint32),
        kf_kp_valid=jnp.zeros((max_kf, n_feat), bool),
        kf_response=jnp.zeros((max_kf, n_feat), dtype),
        kf_obs_mp=jnp.full((max_kf, n_feat), -1, jnp.int32),
        kf_ur=jnp.full((max_kf, n_feat), -1.0, dtype),
        kf_uvr=jnp.full((max_kf, n_feat, 2), -1.0, dtype),
        mp_pos=jnp.zeros((max_mp, 3), dtype),
        mp_valid=jnp.zeros((max_mp,), bool),
        mp_desc=jnp.zeros((max_mp, 8), jnp.uint32),
        mp_level=jnp.zeros((max_mp,), jnp.int32),
        mp_visible=jnp.zeros((max_mp,), jnp.int32),
        mp_found=jnp.zeros((max_mp,), jnp.int32),
        mp_normal=jnp.zeros((max_mp, 3), dtype),
        mp_dist_min=jnp.zeros((max_mp,), dtype),
        mp_dist_max=jnp.zeros((max_mp,), dtype),
    )


def grow_keyframes(ms: MapState, new_cap: int) -> MapState:
    """Double-class capacity growth of the KEYFRAME pools (the
    reference has no pool bound at all — KeyFrames are heap objects,
    and multi-session EuRoC runs reach thousands,
    /root/reference/RUN/euroc_eval_examples.sh:15). Point pools are
    unchanged; slot ids keep their meaning, so in-flight frames and
    cached windows stay valid (shape change does force the O(log)
    recompiles of kf-shaped programs)."""
    K = ms.kf_capacity
    if new_cap <= K:
        return ms
    pad = new_cap - K

    def grow(x, fill):
        widths = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    eye_pad = jnp.tile(jnp.eye(3, dtype=ms.kf_R.dtype), (pad, 1, 1))
    return ms._replace(
        kf_R=jnp.concatenate([ms.kf_R, eye_pad]),
        kf_t=grow(ms.kf_t, 0.0),
        kf_valid=grow(ms.kf_valid, False),
        kf_uv=grow(ms.kf_uv, 0.0),
        kf_level=grow(ms.kf_level, 0),
        kf_desc=grow(ms.kf_desc, 0),
        kf_kp_valid=grow(ms.kf_kp_valid, False),
        kf_response=grow(ms.kf_response, 0.0),
        kf_obs_mp=grow(ms.kf_obs_mp, -1),
        kf_ur=grow(ms.kf_ur, -1.0),
        kf_uvr=grow(ms.kf_uvr, -1.0),
    )


@jax.jit
def add_keyframe(ms: MapState, slot, R, t, feats: FrameFeatures, assoc,
                 ur=None, uvr=None):
    """Insert a frame as keyframe at `slot`; `assoc` (N,) are the frame's
    map-point associations (mirrors Tracking::CreateNewKeyFrame,
    /root/reference/src/Tracking.cc:3298). `ur` (N,): per-keypoint
    right-image u (stereo/RGBD), < 0 = mono. `uvr` (N,2): per-keypoint
    observed right-image pixel of a fisheye rig (< 0 = no match)."""
    if ur is None:
        ur = jnp.full(feats.uv.shape[:1], -1.0, ms.kf_ur.dtype)
    if uvr is None:
        uvr = jnp.full(feats.uv.shape[:1] + (2,), -1.0, ms.kf_uvr.dtype)
    return ms._replace(
        kf_R=ms.kf_R.at[slot].set(R),
        kf_t=ms.kf_t.at[slot].set(t),
        kf_valid=ms.kf_valid.at[slot].set(True),
        kf_uv=ms.kf_uv.at[slot].set(feats.uv),
        kf_level=ms.kf_level.at[slot].set(feats.level),
        kf_desc=ms.kf_desc.at[slot].set(feats.desc),
        kf_kp_valid=ms.kf_kp_valid.at[slot].set(feats.valid),
        kf_response=ms.kf_response.at[slot].set(feats.response),
        kf_obs_mp=ms.kf_obs_mp.at[slot].set(assoc),
        kf_ur=ms.kf_ur.at[slot].set(ur),
        kf_uvr=ms.kf_uvr.at[slot].set(uvr),
    )


@jax.jit
def add_points(
    ms: MapState,
    next_free,          # () int32 first free map-point slot
    pos,                # (P,3) new point positions (world)
    desc,               # (P,8)
    level,              # (P,)
    ok,                 # (P,) bool acceptance mask
    kf_i, kp_i,         # source keyframe slot + (P,) keypoint indices
    kf_j, kp_j,         # second keyframe slot + (P,) keypoint indices
    scale_lut=None,     # (L,) pyramid scale factors (for dist range)
):
    """Append accepted points; register observations in both keyframes.
    Returns (new_state, n_added). Drops silently at capacity.

    With `scale_lut`, seeds the viewing normal and scale-invariance
    distance range from the first observing keyframe (the role of
    UpdateNormalAndDepth right after creation,
    /root/reference/src/LocalMapping.cc:594)."""
    P = pos.shape[0]
    order = jnp.cumsum(ok.astype(jnp.int32)) - 1
    cap = ms.mp_capacity
    slot = jnp.where(ok, next_free + order, cap)  # cap -> dropped
    ids = jnp.where(ok, slot, -1).astype(jnp.int32)
    in_cap = ok & (slot < cap)

    if scale_lut is None:
        normal = jnp.zeros_like(pos)
        dmin = jnp.zeros((P,), pos.dtype)
        dmax = jnp.zeros((P,), pos.dtype)
    else:
        Ci = -jnp.einsum("ji,j->i", ms.kf_R[kf_i], ms.kf_t[kf_i])
        d = pos - Ci[None, :]
        dist = jnp.linalg.norm(d, axis=-1)
        normal = d / jnp.maximum(dist, 1e-9)[:, None]
        sf = jnp.take(scale_lut, jnp.clip(level, 0, scale_lut.shape[0] - 1))
        dmax = dist * sf
        dmin = dmax / scale_lut[-1]

    ms = ms._replace(
        mp_pos=ms.mp_pos.at[slot].set(pos, mode="drop"),
        mp_valid=ms.mp_valid.at[slot].set(in_cap, mode="drop"),
        mp_desc=ms.mp_desc.at[slot].set(desc, mode="drop"),
        mp_level=ms.mp_level.at[slot].set(level, mode="drop"),
        mp_visible=ms.mp_visible.at[slot].set(1, mode="drop"),
        mp_found=ms.mp_found.at[slot].set(1, mode="drop"),
        mp_normal=ms.mp_normal.at[slot].set(normal, mode="drop"),
        mp_dist_min=ms.mp_dist_min.at[slot].set(dmin, mode="drop"),
        mp_dist_max=ms.mp_dist_max.at[slot].set(dmax, mode="drop"),
        kf_obs_mp=ms.kf_obs_mp.at[kf_i, jnp.where(in_cap, kp_i, ms.kf_obs_mp.shape[1])]
        .set(ids, mode="drop")
        .at[kf_j, jnp.where(in_cap, kp_j, ms.kf_obs_mp.shape[1])]
        .set(ids, mode="drop"),
    )
    return ms, jnp.sum(in_cap).astype(jnp.int32)


@jax.jit
def count_window_points(ms: MapState, kf_ids):
    """Number of distinct valid map points observed by the window —
    lets the host pick the smallest shape bucket for the BA grid
    (bandwidth on the landmark axis is the local-BA cost)."""
    obs = ms.kf_obs_mp[jnp.clip(kf_ids, 0, ms.kf_capacity - 1)]
    obs = jnp.where((kf_ids >= 0)[:, None], obs, -1)
    member = jnp.zeros((ms.mp_capacity,), bool).at[
        jnp.where(obs.reshape(-1) >= 0, obs.reshape(-1), ms.mp_capacity)
    ].set(True, mode="drop")
    return jnp.sum(member & ms.mp_valid).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cap",))
def local_point_ids(ms: MapState, kf_ids, cap: int):
    """Union of map points observed by the window keyframes `kf_ids` (W,)
    (-1 entries ignored) — the UpdateLocalPoints analog
    (/root/reference/src/Tracking.cc:3559). Returns (mp_ids (cap,) int32
    padded with -1, local_of_global (M,) int32 mapping or -1)."""
    obs = ms.kf_obs_mp[jnp.clip(kf_ids, 0, ms.kf_capacity - 1)]  # (W,N)
    obs = jnp.where((kf_ids >= 0)[:, None], obs, -1)
    member = jnp.zeros((ms.mp_capacity,), bool).at[
        jnp.where(obs.reshape(-1) >= 0, obs.reshape(-1), ms.mp_capacity)
    ].set(True, mode="drop")
    flags = member & ms.mp_valid
    (mp_ids,) = jnp.nonzero(flags, size=cap, fill_value=-1)
    mp_ids = mp_ids.astype(jnp.int32)
    local = jnp.full((ms.mp_capacity,), -1, jnp.int32)
    local = local.at[jnp.where(mp_ids >= 0, mp_ids, ms.mp_capacity)].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop"
    )
    return mp_ids, local


@functools.partial(jax.jit, static_argnames=("stereo", "fisheye"))
def build_ba_problem(
    ms: MapState,
    kf_ids,            # (W,) keyframe slots (-1 = unused row)
    fixed,             # (W,) bool
    mp_ids,            # (P,) map-point ids (-1 pad)
    local_of_global,   # (M,)
    inv_sigma2_lut,    # (L,) per-level 1/sigma^2
    stereo: bool = False,  # gather kf_ur into 3-dof stereo observations
    fisheye: bool = False,  # gather kf_uvr into right-camera observations
) -> BAProblem:
    """Gather the dense (W,P) observation grid for the local-BA window."""
    W = kf_ids.shape[0]
    P = mp_ids.shape[0]
    kf_safe = jnp.clip(kf_ids, 0, ms.kf_capacity - 1)
    row_ok = kf_ids >= 0

    obs = ms.kf_obs_mp[kf_safe]                      # (W,N)
    lidx = local_of_global[
        jnp.clip(obs, 0, ms.mp_capacity - 1)
    ]
    lidx = jnp.where((obs >= 0) & row_ok[:, None], lidx, -1)  # (W,N)

    obs_uv = jnp.zeros((W, P, 2), ms.kf_uv.dtype)
    obs_w = jnp.zeros((W, P), ms.kf_uv.dtype)
    rows = jnp.broadcast_to(jnp.arange(W)[:, None], lidx.shape)
    tgt = jnp.where(lidx >= 0, lidx, P)              # P -> dropped
    obs_uv = obs_uv.at[rows, tgt].set(ms.kf_uv[kf_safe], mode="drop")
    inv_s2 = inv_sigma2_lut[jnp.clip(ms.kf_level[kf_safe], 0,
                                     inv_sigma2_lut.shape[0] - 1)]
    obs_w = obs_w.at[rows, tgt].set(inv_s2, mode="drop")
    obs_mask = obs_w > 0
    obs_ur = None
    if stereo:
        obs_ur = jnp.full((W, P), -1.0, ms.kf_uv.dtype).at[rows, tgt].set(
            ms.kf_ur[kf_safe], mode="drop")
    obs_uvr = None
    if fisheye:
        obs_uvr = jnp.full((W, P, 2), -1.0, ms.kf_uv.dtype).at[
            rows, tgt].set(ms.kf_uvr[kf_safe], mode="drop")

    pts = ms.mp_pos[jnp.clip(mp_ids, 0, ms.mp_capacity - 1)]
    pt_valid = (mp_ids >= 0) & ms.mp_valid[
        jnp.clip(mp_ids, 0, ms.mp_capacity - 1)
    ]
    return BAProblem(
        kf_R=ms.kf_R[kf_safe],
        kf_t=ms.kf_t[kf_safe],
        kf_fixed=fixed | ~row_ok,
        points=pts,
        pt_valid=pt_valid,
        obs_uv=obs_uv,
        obs_mask=obs_mask,
        obs_inv_sigma2=obs_w,
        obs_ur=obs_ur,
        obs_uvr=obs_uvr,
    )


@jax.jit
def scatter_ba_result(ms: MapState, kf_ids, mp_ids, kf_R, kf_t, points,
                      pt_keep):
    """Write optimized window poses/points back into the pools; points
    with pt_keep=False are invalidated (outlier removal after BA,
    Optimizer.cc:1972-2008)."""
    kf_tgt = jnp.where(kf_ids >= 0, kf_ids, ms.kf_capacity)
    mp_tgt = jnp.where(mp_ids >= 0, mp_ids, ms.mp_capacity)
    return ms._replace(
        kf_R=ms.kf_R.at[kf_tgt].set(kf_R, mode="drop"),
        kf_t=ms.kf_t.at[kf_tgt].set(kf_t, mode="drop"),
        mp_pos=ms.mp_pos.at[mp_tgt].set(points, mode="drop"),
        mp_valid=ms.mp_valid.at[mp_tgt].set(
            pt_keep & (mp_ids >= 0), mode="drop"
        ),
    )


@jax.jit
def update_point_stats(ms: MapState, visible_ids, found_ids):
    """Bump visible/found counters (ids may contain -1)."""
    vis_tgt = jnp.where(visible_ids >= 0, visible_ids, ms.mp_capacity)
    fnd_tgt = jnp.where(found_ids >= 0, found_ids, ms.mp_capacity)
    return ms._replace(
        mp_visible=ms.mp_visible.at[vis_tgt].add(1, mode="drop"),
        mp_found=ms.mp_found.at[fnd_tgt].add(1, mode="drop"),
    )


@jax.jit
def cull_points(ms: MapState, min_ratio, min_visible):
    """Found-ratio culling (MapPointCulling thresholds,
    /root/reference/src/LocalMapping.cc:423-459)."""
    ratio = ms.mp_found.astype(jnp.float32) / jnp.maximum(
        ms.mp_visible.astype(jnp.float32), 1.0
    )
    keep = ms.mp_valid & (
        (ms.mp_visible < min_visible) | (ratio >= min_ratio)
    )
    return ms._replace(mp_valid=keep)


@jax.jit
def keyframe_redundancy(ms: MapState, slot):
    """Fraction of `slot`'s observed points that are seen by >=3 OTHER
    keyframes (KeyFrameCulling redundancy measure,
    /root/reference/src/LocalMapping.cc:1158, threshold 0.9 at :1168)."""
    obs_all = ms.kf_obs_mp
    counts = jnp.zeros((ms.mp_capacity,), jnp.int32).at[
        jnp.where((obs_all >= 0) & ms.kf_valid[:, None],
                  obs_all, ms.mp_capacity)
    ].add(1, mode="drop")
    mine = ms.kf_obs_mp[slot]
    mine_valid = (mine >= 0) & ms.mp_valid[
        jnp.clip(mine, 0, ms.mp_capacity - 1)]
    c = counts[jnp.clip(mine, 0, ms.mp_capacity - 1)]
    redundant = mine_valid & (c >= 4)  # >=3 others + itself
    n = jnp.maximum(jnp.sum(mine_valid), 1)
    return jnp.sum(redundant) / n.astype(jnp.float32)


@jax.jit
def kf_tracked_points(ms: MapState, slot, min_obs):
    """Number of `slot`'s observed map points seen by >= min_obs
    keyframes in total (KeyFrame::TrackedMapPoints,
    /root/reference/src/KeyFrame.cc:693) — the reference count that
    NeedNewKeyFrame's c2 ratio compares against (Tracking.cc:3185).
    Counting only multi-observed points makes the threshold
    self-stabilizing: fresh 2-view triangulations don't inflate it."""
    obs_all = ms.kf_obs_mp
    counts = jnp.zeros((ms.mp_capacity,), jnp.int32).at[
        jnp.where((obs_all >= 0) & ms.kf_valid[:, None],
                  obs_all, ms.mp_capacity)
    ].add(1, mode="drop")
    mine = ms.kf_obs_mp[slot]
    safe = jnp.clip(mine, 0, ms.mp_capacity - 1)
    ok = (mine >= 0) & ms.mp_valid[safe] & (counts[safe] >= min_obs)
    return jnp.sum(ok).astype(jnp.int32)


@jax.jit
def covisibility_weights(ms: MapState, slot):
    """(K,) number of valid map points keyframe k shares with keyframe
    `slot` — the covisibility-graph edge weight
    (KeyFrame::UpdateConnections, /root/reference/src/KeyFrame.cc:407;
    edges kept at weight >= 15, :449). Computed fresh from `kf_obs_mp`
    instead of maintaining adjacency lists.

    Formulated as scatter(one-hot pool rows) + ONE (K,cap)x(cap,)
    matvec: the obvious member[obs] gather is 524k random lookups that
    serialize on TPU (measured 5.6 ms at the full pool; this form runs
    0.9 ms). bf16 one-hot entries are exact; accumulation is forced
    f32 so shared counts above 256 stay exact integers."""
    mine = ms.kf_obs_mp[slot]
    cap = ms.mp_capacity
    K = ms.kf_capacity
    mine_ok = (mine >= 0) & ms.mp_valid[jnp.clip(mine, 0, cap - 1)]
    member = jnp.zeros((cap,), jnp.bfloat16).at[
        jnp.where(mine_ok, mine, cap)].set(1.0, mode="drop")
    obs = ms.kf_obs_mp                                  # (K,N)
    rows = jnp.broadcast_to(jnp.arange(K)[:, None], obs.shape)
    B = jnp.zeros((K, cap), jnp.bfloat16).at[
        rows, jnp.where(obs >= 0, obs, cap)].set(1.0, mode="drop")
    w = jax.lax.dot_general(
        B, member, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    w = jnp.where(ms.kf_valid, w, 0)
    return w.at[slot].set(0)


@jax.jit
def covisibility_matrix(ms: MapState):
    """(K,K) full covisibility weight matrix via one MXU matmul over the
    boolean membership matrix. Used by loop correction to build the
    essential graph (OptimizeEssentialGraph's covisibility edges,
    /root/reference/src/Optimizer.cc:2570, minFeat=100)."""
    K, N = ms.kf_obs_mp.shape
    cap = ms.mp_capacity
    obs = ms.kf_obs_mp
    ok = (obs >= 0) & ms.mp_valid[jnp.clip(obs, 0, cap - 1)] \
        & ms.kf_valid[:, None]
    rows = jnp.broadcast_to(jnp.arange(K)[:, None], obs.shape)
    B = jnp.zeros((K, cap), jnp.float32).at[
        rows, jnp.where(ok, obs, cap)].set(1.0, mode="drop")
    W = (B @ B.T).astype(jnp.int32)
    return W - jnp.diag(jnp.diag(W))


@jax.jit
def refresh_point_hygiene(ms: MapState, kf_ids, mp_ids, local_of_global,
                          scale_lut):
    """Recompute distinctive descriptors, viewing normals, and
    scale-invariance distance ranges for the window's map points.

    One pass replaces three reference per-point loops:
    - ComputeDistinctiveDescriptors (/root/reference/src/MapPoint.cc:350):
      the observation descriptor with minimum median Hamming distance to
      the others;
    - UpdateNormalAndDepth (:467): normal = mean camera->point direction;
    - distance range from the newest observation's level (:490-496).
    """
    W = kf_ids.shape[0]
    P = mp_ids.shape[0]
    K, N = ms.kf_obs_mp.shape
    cap = ms.mp_capacity
    kf_safe = jnp.clip(kf_ids, 0, K - 1)
    row_ok = kf_ids >= 0

    # (W,P) keypoint index grid: which keypoint of window-KF w observes
    # local point p (-1 = none).
    obs = ms.kf_obs_mp[kf_safe]                               # (W,N)
    lidx = local_of_global[jnp.clip(obs, 0, cap - 1)]
    lidx = jnp.where((obs >= 0) & row_ok[:, None], lidx, -1)
    rows = jnp.broadcast_to(jnp.arange(W)[:, None], lidx.shape)
    kp_grid = jnp.full((W, P), -1, jnp.int32).at[
        rows, jnp.where(lidx >= 0, lidx, P)
    ].set(jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), lidx.shape),
          mode="drop")
    have = kp_grid >= 0                                        # (W,P)
    kp_safe = jnp.clip(kp_grid, 0, N - 1)

    desc = jnp.take_along_axis(
        ms.kf_desc[kf_safe], kp_safe[:, :, None], axis=1)      # (W,P,8)
    level = jnp.take_along_axis(ms.kf_level[kf_safe], kp_safe, axis=1)

    # Pairwise Hamming between a point's observation descriptors:
    # bit-matmul per point (W is small, P large -> batched einsum).
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = ((desc[..., None] >> shifts) & jnp.uint32(1)).reshape(
        W, P, 256).astype(jnp.bfloat16)
    na = jnp.sum(bits, axis=-1, dtype=jnp.float32)             # (W,P)
    ab = jnp.einsum("ipc,jpc->pij", bits, bits,
                    preferred_element_type=jnp.float32)        # (P,W,W)
    dist = na.T[:, :, None] + na.T[:, None, :] - 2.0 * ab      # (P,W,W)
    pair_ok = have.T[:, :, None] & have.T[:, None, :]
    dist = jnp.where(pair_ok, dist, jnp.inf)
    # Median distance of observation i to the others = element
    # (n_valid-1)//2 of its ascending row (invalid sort to +inf).
    srt = jnp.sort(dist, axis=-1)
    nv = jnp.sum(have.T, axis=-1)                              # (P,)
    med_idx = jnp.maximum(nv - 1, 0) // 2
    med = jnp.take_along_axis(
        srt, jnp.broadcast_to(med_idx[:, None, None], (P, W, 1)), axis=-1
    )[..., 0]                                                  # (P,W)
    med = jnp.where(have.T, med, jnp.inf)
    best_w = jnp.argmin(med, axis=-1)                          # (P,)
    new_desc = jnp.take_along_axis(
        desc.transpose(1, 0, 2), best_w[:, None, None], axis=1)[:, 0]
    new_level = jnp.take_along_axis(level.T, best_w[:, None], axis=1)[:, 0]

    # Viewing normal: mean direction from observing camera centers.
    C = -jnp.einsum("wji,wj->wi", ms.kf_R[kf_safe], ms.kf_t[kf_safe])
    pos = ms.mp_pos[jnp.clip(mp_ids, 0, cap - 1)]              # (P,3)
    d = pos[None, :, :] - C[:, None, :]                        # (W,P,3)
    dn = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    normal = jnp.sum(jnp.where(have[:, :, None], dn, 0.0), axis=0)
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)

    # Distance range from the distinctive observation's camera + level.
    dist_ref = jnp.linalg.norm(
        pos - C[best_w], axis=-1)                              # (P,)
    sf = jnp.take(scale_lut, jnp.clip(new_level, 0, scale_lut.shape[0] - 1))
    dmax = dist_ref * sf
    dmin = dmax / scale_lut[-1]

    upd = (mp_ids >= 0) & (nv >= 2) & ms.mp_valid[
        jnp.clip(mp_ids, 0, cap - 1)]
    tgt = jnp.where(upd, mp_ids, cap)
    return ms._replace(
        mp_desc=ms.mp_desc.at[tgt].set(new_desc, mode="drop"),
        mp_level=ms.mp_level.at[tgt].set(new_level, mode="drop"),
        mp_normal=ms.mp_normal.at[tgt].set(normal, mode="drop"),
        mp_dist_min=ms.mp_dist_min.at[tgt].set(dmin, mode="drop"),
        mp_dist_max=ms.mp_dist_max.at[tgt].set(dmax, mode="drop"),
    )


@jax.jit
def compact_points(ms: MapState):
    """Move valid map points to the front of the pool and remap all
    keyframe observations — the slot-recycling/compaction step that keeps
    long runs inside the fixed capacity (the reference deletes MapPoint
    objects instead; here culled slots become reusable tail space).
    Returns (new_state, n_valid, remap (M,) old->new or -1)."""
    cap = ms.mp_capacity
    (perm,) = jnp.nonzero(ms.mp_valid, size=cap, fill_value=cap)
    keep = perm < cap
    src = jnp.clip(perm, 0, cap - 1)
    remap = jnp.full((cap,), -1, jnp.int32).at[
        jnp.where(keep, perm, cap)
    ].set(jnp.arange(cap, dtype=jnp.int32), mode="drop")
    obs = ms.kf_obs_mp
    new_obs = jnp.where(obs >= 0, remap[jnp.clip(obs, 0, cap - 1)], -1)
    z = jnp.zeros((), ms.mp_pos.dtype)
    ms = ms._replace(
        mp_pos=jnp.where(keep[:, None], ms.mp_pos[src], z),
        mp_valid=keep,
        mp_desc=jnp.where(keep[:, None], ms.mp_desc[src], jnp.uint32(0)),
        mp_level=jnp.where(keep, ms.mp_level[src], 0),
        mp_visible=jnp.where(keep, ms.mp_visible[src], 0),
        mp_found=jnp.where(keep, ms.mp_found[src], 0),
        mp_normal=jnp.where(keep[:, None], ms.mp_normal[src], z),
        mp_dist_min=jnp.where(keep, ms.mp_dist_min[src], z),
        mp_dist_max=jnp.where(keep, ms.mp_dist_max[src], z),
        kf_obs_mp=new_obs,
    )
    return ms, jnp.sum(keep).astype(jnp.int32), remap


@jax.jit
def cull_keyframe(ms: MapState, slot):
    """Remove a redundant keyframe: invalidate it and clear its
    observations (the pose array keeps its last value for trajectory
    export, like the reference's bad-flagged keyframes)."""
    return ms._replace(
        kf_valid=ms.kf_valid.at[slot].set(False),
        kf_obs_mp=ms.kf_obs_mp.at[slot].set(
            jnp.full((ms.kf_obs_mp.shape[1],), -1, jnp.int32)),
    )
