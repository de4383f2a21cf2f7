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
    # Map points.
    mp_pos: jax.Array       # (M,3)
    mp_valid: jax.Array     # (M,)
    mp_desc: jax.Array      # (M,8)
    mp_level: jax.Array     # (M,) reference octave for scale prediction
    mp_visible: jax.Array   # (M,) int32
    mp_found: jax.Array     # (M,) int32

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
        mp_pos=jnp.zeros((max_mp, 3), dtype),
        mp_valid=jnp.zeros((max_mp,), bool),
        mp_desc=jnp.zeros((max_mp, 8), jnp.uint32),
        mp_level=jnp.zeros((max_mp,), jnp.int32),
        mp_visible=jnp.zeros((max_mp,), jnp.int32),
        mp_found=jnp.zeros((max_mp,), jnp.int32),
    )


@jax.jit
def add_keyframe(ms: MapState, slot, R, t, feats: FrameFeatures, assoc):
    """Insert a frame as keyframe at `slot`; `assoc` (N,) are the frame's
    map-point associations (mirrors Tracking::CreateNewKeyFrame,
    /root/reference/src/Tracking.cc:3298)."""
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
):
    """Append accepted points; register observations in both keyframes.
    Returns (new_state, n_added). Drops silently at capacity."""
    P = pos.shape[0]
    order = jnp.cumsum(ok.astype(jnp.int32)) - 1
    cap = ms.mp_capacity
    slot = jnp.where(ok, next_free + order, cap)  # cap -> dropped
    ids = jnp.where(ok, slot, -1).astype(jnp.int32)
    in_cap = ok & (slot < cap)

    ms = ms._replace(
        mp_pos=ms.mp_pos.at[slot].set(pos, mode="drop"),
        mp_valid=ms.mp_valid.at[slot].set(in_cap, mode="drop"),
        mp_desc=ms.mp_desc.at[slot].set(desc, mode="drop"),
        mp_level=ms.mp_level.at[slot].set(level, mode="drop"),
        mp_visible=ms.mp_visible.at[slot].set(1, mode="drop"),
        mp_found=ms.mp_found.at[slot].set(1, mode="drop"),
        kf_obs_mp=ms.kf_obs_mp.at[kf_i, jnp.where(in_cap, kp_i, ms.kf_obs_mp.shape[1])]
        .set(ids, mode="drop")
        .at[kf_j, jnp.where(in_cap, kp_j, ms.kf_obs_mp.shape[1])]
        .set(ids, mode="drop"),
    )
    return ms, jnp.sum(in_cap).astype(jnp.int32)


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


@functools.partial(jax.jit, static_argnames=())
def build_ba_problem(
    ms: MapState,
    kf_ids,            # (W,) keyframe slots (-1 = unused row)
    fixed,             # (W,) bool
    mp_ids,            # (P,) map-point ids (-1 pad)
    local_of_global,   # (M,)
    inv_sigma2_lut,    # (L,) per-level 1/sigma^2
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
def cull_keyframe(ms: MapState, slot):
    """Remove a redundant keyframe: invalidate it and clear its
    observations (the pose array keeps its last value for trajectory
    export, like the reference's bad-flagged keyframes)."""
    return ms._replace(
        kf_valid=ms.kf_valid.at[slot].set(False),
        kf_obs_mp=ms.kf_obs_mp.at[slot].set(
            jnp.full((ms.kf_obs_mp.shape[1],), -1, jnp.int32)),
    )
