"""Multi-map merging: welding an active map into an archived one.

The reference's headline Atlas capability (LoopClosing::MergeLocal,
/root/reference/src/LoopClosing.cc:1450): when place recognition matches
the current keyframe against a keyframe of a DIFFERENT map, the two maps
are welded — the current (usually younger) map is transformed into the
matched map's frame by the verified Sim3, duplicate landmarks are fused
(SearchAndFuse, :2631), a welding bundle adjustment refines the seam
(MergeBundleAdjustmentVisual, /root/reference/src/Optimizer.cc:6040),
and the merged map becomes the active one.

TPU-native design: both maps are fixed-capacity SoA pools, so the weld
is a batched scatter — src keyframes/points are Sim3-transformed and
written into the dst pool's free slots in one fused device program; the
slot assignments (host-side free-list bookkeeping) are the only
sequential work. No pointer surgery, no locks: the merge produces a new
immutable MapState snapshot.

Sim3 conventions: verify gives x_cand_cam = s R x_cur_cam + t with cand
in dst and cur in src. The induced world map src->dst is
  x_dst = s_w R_w x_src + t_w,
  s_w = s, R_w = R_cand^T R R_cur,
  t_w = R_cand^T (s R t_cur + t - t_cand),
and an SE3 camera (R_k, t_k) in src becomes
  R_k' = R_k R_w^T,  t_k' = s_w t_k - R_k' t_w
(its view of transformed points scales uniformly by s_w — the same
recovery CorrectLoop uses, /root/reference/src/LoopClosing.cc:1253).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.frontend import matching
from tpuslam.mapping import mapstate


class WorldSim3(NamedTuple):
    s: float
    R: np.ndarray    # (3,3)
    t: np.ndarray    # (3,)


def world_sim3_from_kf_pair(ms_dst: mapstate.MapState, cand: int,
                            ms_src: mapstate.MapState, cur: int,
                            s, R, t) -> WorldSim3:
    """Lift the verified camera-frame Sim3 (x_cand_cam = s R x_cur_cam + t)
    to the world-to-world map src->dst."""
    R_cand = np.asarray(ms_dst.kf_R[cand])
    t_cand = np.asarray(ms_dst.kf_t[cand])
    R_cur = np.asarray(ms_src.kf_R[cur])
    t_cur = np.asarray(ms_src.kf_t[cur])
    s = float(s)
    R = np.asarray(R)
    t = np.asarray(t)
    R_w = R_cand.T @ R @ R_cur
    t_w = R_cand.T @ (s * (R @ t_cur) + t - t_cand)
    return WorldSim3(s=s, R=R_w.astype(np.float32),
                     t=t_w.astype(np.float32))


@jax.jit
def weld(ms_dst: mapstate.MapState, ms_src: mapstate.MapState,
         kf_map, mp_map, s_w, R_w, t_w) -> mapstate.MapState:
    """Scatter src keyframes/points into dst under the world Sim3.

    kf_map (K_src,) / mp_map (M_src,): dst slot per src slot, -1 = drop.
    One fused device program — the welding analog of MergeLocal's
    transform loop (/root/reference/src/LoopClosing.cc:1678-1783)."""
    Kd = ms_dst.kf_capacity
    Md = ms_dst.mp_capacity

    # --- keyframes.
    src_valid = ms_src.kf_valid & (kf_map >= 0)
    idx = jnp.where(src_valid, kf_map, Kd)          # OOB rows dropped
    Rp = jnp.einsum("kij,lj->kil", ms_src.kf_R, R_w)       # R_k R_w^T
    tp = s_w * ms_src.kf_t - jnp.einsum("kij,j->ki", Rp, t_w)
    obs = ms_src.kf_obs_mp
    obs_safe = jnp.clip(obs, 0, mp_map.shape[0] - 1)
    obs_new = jnp.where(obs >= 0, mp_map[obs_safe], -1)

    ms = ms_dst._replace(
        kf_R=ms_dst.kf_R.at[idx].set(Rp, mode="drop"),
        kf_t=ms_dst.kf_t.at[idx].set(tp, mode="drop"),
        kf_valid=ms_dst.kf_valid.at[idx].set(src_valid, mode="drop"),
        kf_uv=ms_dst.kf_uv.at[idx].set(ms_src.kf_uv, mode="drop"),
        kf_level=ms_dst.kf_level.at[idx].set(ms_src.kf_level, mode="drop"),
        kf_desc=ms_dst.kf_desc.at[idx].set(ms_src.kf_desc, mode="drop"),
        kf_kp_valid=ms_dst.kf_kp_valid.at[idx].set(
            ms_src.kf_kp_valid, mode="drop"),
        kf_response=ms_dst.kf_response.at[idx].set(
            ms_src.kf_response, mode="drop"),
        kf_obs_mp=ms_dst.kf_obs_mp.at[idx].set(obs_new, mode="drop"),
        kf_ur=ms_dst.kf_ur.at[idx].set(ms_src.kf_ur, mode="drop"),
        kf_uvr=ms_dst.kf_uvr.at[idx].set(ms_src.kf_uvr, mode="drop"),
    )

    # --- map points.
    mp_valid = ms_src.mp_valid & (mp_map >= 0)
    midx = jnp.where(mp_valid, mp_map, Md)
    pos = s_w * jnp.einsum("ij,mj->mi", R_w, ms_src.mp_pos) + t_w
    nrm = jnp.einsum("ij,mj->mi", R_w, ms_src.mp_normal)
    return ms._replace(
        mp_pos=ms.mp_pos.at[midx].set(pos, mode="drop"),
        mp_valid=ms.mp_valid.at[midx].set(mp_valid, mode="drop"),
        mp_desc=ms.mp_desc.at[midx].set(ms_src.mp_desc, mode="drop"),
        mp_level=ms.mp_level.at[midx].set(ms_src.mp_level, mode="drop"),
        mp_visible=ms.mp_visible.at[midx].set(
            ms_src.mp_visible, mode="drop"),
        mp_found=ms.mp_found.at[midx].set(ms_src.mp_found, mode="drop"),
        mp_normal=ms.mp_normal.at[midx].set(nrm, mode="drop"),
        mp_dist_min=ms.mp_dist_min.at[midx].set(
            s_w * ms_src.mp_dist_min, mode="drop"),
        mp_dist_max=ms.mp_dist_max.at[midx].set(
            s_w * ms_src.mp_dist_max, mode="drop"),
    )


@jax.jit
def fuse_duplicate_points(ms: mapstate.MapState, new_mask, old_mask):
    """Replace welded-in duplicates by their pre-existing counterparts
    (MapPoint::Replace driven by SearchAndFuse,
    /root/reference/src/LoopClosing.cc:2631, src/MapPoint.cc:249).

    new_mask / old_mask (M,) bool: the just-welded group and the
    established (replacement-eligible) group.

    A new point is a duplicate of an old one when their descriptors are
    near (Hamming < TH_LOW) and positions agree within the old point's
    scale-range tolerance. All kf_obs_mp references to the new id are
    rewired to the old id; the new point is invalidated. Fully batched:
    one (M, M) bit-matmul + a matmul-form distance + masked argmin."""
    M = ms.mp_capacity
    new_ok = new_mask & ms.mp_valid
    old_ok = old_mask & ms.mp_valid

    ham = matching.hamming_matrix(ms.mp_desc, ms.mp_desc)         # (M,M)
    # Squared distances via the matmul identity (no (M,M,3) broadcast).
    sq = jnp.sum(ms.mp_pos * ms.mp_pos, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (ms.mp_pos @ ms.mp_pos.T)
    tol = jnp.maximum(0.1 * jnp.maximum(ms.mp_dist_max, 1e-3), 0.05)
    cand_ok = (new_ok[:, None] & old_ok[None, :] & (ham < 50)
               & (d2 < tol[None, :] ** 2))
    score = jnp.where(cand_ok, ham, 1e9)
    best = jnp.argmin(score, axis=1).astype(jnp.int32)            # (M,)
    has = new_ok & (jnp.min(score, axis=1) < 1e8)

    # Rewire observations through an (M,) redirect lut.
    ids = jnp.arange(M, dtype=jnp.int32)
    lut = jnp.where(has, best, ids)
    obs = ms.kf_obs_mp
    obs_new = jnp.where(obs >= 0, lut[jnp.clip(obs, 0, M - 1)], -1)
    mp_valid = ms.mp_valid & ~has
    # The replacement inherits the duplicate's visibility counters
    # (Replace keeps nvisible/nfound, src/MapPoint.cc:270).
    mp_visible = ms.mp_visible.at[jnp.where(has, best, M)].add(
        jnp.where(has, ms.mp_visible, 0), mode="drop")
    mp_found = ms.mp_found.at[jnp.where(has, best, M)].add(
        jnp.where(has, ms.mp_found, 0), mode="drop")
    n_fused = jnp.sum(has).astype(jnp.int32)
    return ms._replace(kf_obs_mp=obs_new, mp_valid=mp_valid,
                       mp_visible=mp_visible, mp_found=mp_found), n_fused


def plan_slot_maps(ms_dst: mapstate.MapState, ms_src: mapstate.MapState,
                   src_kf_slots) -> Optional[tuple]:
    """Host-side free-list planning: dst slots for every live src entity.
    Returns (kf_map (K_src,), mp_map (M_src,), kf_remap dict) or None if
    the dst pool lacks capacity."""
    dst_kf_free = np.where(~np.asarray(ms_dst.kf_valid))[0]
    dst_mp_free = np.where(~np.asarray(ms_dst.mp_valid))[0]
    src_live_kf = [s for s in src_kf_slots
                   if bool(ms_src.kf_valid[s])]
    src_live_mp = np.where(np.asarray(ms_src.mp_valid))[0]
    if (len(src_live_kf) > len(dst_kf_free)
            or len(src_live_mp) > len(dst_mp_free)):
        return None
    kf_map = np.full((ms_src.kf_capacity,), -1, np.int32)
    kf_remap = {}
    for i, s in enumerate(src_live_kf):
        kf_map[s] = dst_kf_free[i]
        kf_remap[s] = int(dst_kf_free[i])
    mp_map = np.full((ms_src.mp_capacity,), -1, np.int32)
    mp_map[src_live_mp] = dst_mp_free[: len(src_live_mp)]
    return kf_map, mp_map, kf_remap
