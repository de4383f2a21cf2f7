"""Loop detection + correction and relocalization (host orchestration).

The device kernels live in solver.sim3 / solver.pose_graph /
mapping.retrieval; this module is the LoopClosing-thread logic
(/root/reference/src/LoopClosing.cc): candidate retrieval with temporal
consistency (NewDetectCommonRegions :296, nCoincidences>=3), Sim3 RANSAC
+ refinement verification (DetectCommonRegionsFromBoW :628 thresholds),
loop correction with pose-graph optimization and map-point re-mapping
(CorrectLoop :1210 + OptimizeEssentialGraph), and relocalization
(Tracking::Relocalization src/Tracking.cc:3764 — retrieval + 2D-3D
matching + robust pose optimization seeded from the candidate keyframe).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field
from typing import Optional

_DEBUG = bool(os.environ.get("TPUSLAM_LOOP_DEBUG"))

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.frontend import matching
from tpuslam.mapping import mapstate, retrieval
from tpuslam.solver import pose_graph, pose_opt, sim3


@dataclass
class LoopState:
    db: retrieval.RetrievalDB
    min_gap: int = 12            # candidate must be this many KFs older
    consistency_needed: int = 3  # consecutive hits (mnLoopNumCoincidences)
    min_score: float = 0.3       # absolute putative-match fraction
    min_margin: float = 1.15     # vs median score of non-neighbors
    last_candidate: int = -1
    consistency: int = 0
    last_loop_order: int = -999  # temporal index of last correction (cooldown)
    # Merge detection state (mnMergeNumCoincidences analog,
    # /root/reference/src/LoopClosing.cc:430-443).
    merge_map: int = -1          # atlas index of the tracked candidate map
    merge_candidate: int = -1    # keyframe slot inside that map
    merge_consistency: int = 0
    # Accumulated loop constraints (slot_i, slot_j, s, R, t): every past
    # correction's verified Sim3 stays an edge in later pose graphs
    # (the reference's KeyFrame::AddLoopEdge, used at Optimizer.cc:2414).
    loop_edges: list = field(default_factory=list)

    @staticmethod
    def create(max_kf: int) -> "LoopState":
        return LoopState(db=retrieval.empty_db(max_kf))


STRONG_RESPONSE = 20.0  # retrieval uses confident corners only


def _strong(ms: mapstate.MapState, slot: int):
    return ms.kf_kp_valid[slot] & (ms.kf_response[slot] > STRONG_RESPONSE)


def _acc_group_scores_j(scores, covis, min_weight: int = 15,
                        top_n: int = 10):
    """Device (jnp) covisibility-group score accumulation — same
    semantics as retrieval.accumulate_group_scores (the reference's
    DetectNBestCandidates accScore, KeyFrameDatabase.cc:620) but
    jit-traceable so loop detection can run as a dispatched program
    whose scalars the tracker fetches one frame later."""
    ok = scores >= 0.0
    w = jnp.where((covis >= min_weight) & ok[None, :],
                  covis.astype(jnp.float32), -1.0)
    k = min(top_n, scores.shape[0])
    top_w, top_idx = jax.lax.top_k(w, k)
    acc = scores + jnp.sum(jnp.where(top_w > 0, scores[top_idx], 0.0),
                           axis=1)
    return jnp.where(ok, acc, -1.0)


@jax.jit
def detect_loop_device(db: retrieval.RetrievalDB, ms: mapstate.MapState,
                       slot, excl_mask):
    """Device half of loop detection: retrieval scoring + neighbor
    exclusion + group accumulation. Returns (cand, cand_score,
    baseline) as DEVICE scalars — the tracker defers the fetch to the
    next frame so place recognition never blocks the frame path
    (the reference runs it in the LoopClosing thread,
    /root/reference/src/LoopClosing.cc:56).

    `excl_mask`: (K,) bool — slots excluded on host knowledge (the
    temporally-adjacent window + the query itself)."""
    scores = retrieval.score_db(
        db, ms.kf_desc[slot], _strong(ms, slot), ms.kf_response[slot],
        match_th=25)
    scores = jnp.where(excl_mask, -1.0, scores)
    # Covisibility-connected keyframes can never be loop candidates
    # (spConnectedKeyFrames exclusion, KeyFrameDatabase.cc:620).
    shared = mapstate.covisibility_weights(ms, slot)
    scores = jnp.where(shared >= 15, -1.0, scores)
    covm = mapstate.covisibility_matrix(ms)
    group = _acc_group_scores_j(scores, covm)
    top_group = jnp.argmax(group)
    in_group = (covm[top_group] >= 15) & (scores >= 0)
    in_group = in_group.at[top_group].set(scores[top_group] >= 0)
    raw = jnp.where(in_group, scores, -1.0)
    cand = jnp.argmax(raw).astype(jnp.int32)
    # Median raw score of the surviving candidates = the alias
    # baseline for the relative gate (upper-median; the host gate
    # multiplies by min_margin so the half-sample difference from
    # numpy's interpolating median is immaterial).
    ok = scores >= 0
    n_ok = jnp.sum(ok)
    sorted_s = jnp.sort(jnp.where(ok, scores, jnp.inf))
    med = sorted_s[jnp.clip(n_ok // 2, 0, scores.shape[0] - 1)]
    baseline = jnp.where(n_ok > 3, med, 0.0)
    return cand, raw[jnp.clip(cand, 0, scores.shape[0] - 1)], baseline


def loop_decide(ls: LoopState, slot: int, kf_slots: list, cand: int,
                cand_score: float, baseline: float) -> Optional[int]:
    """Host half of loop detection: absolute/relative gates + temporal
    consistency counting over the fetched device scalars. Shared by the
    synchronous path (immediate fetch) and the pipelined path (fetch
    deferred one frame)."""
    order_of = {s: i for i, s in enumerate(kf_slots)}
    cur_order = order_of.get(slot, len(kf_slots) - 1)
    if _DEBUG:
        print(f"[loop] kf={slot} order={cur_order} cand={cand} "
              f"score={cand_score:.3f} med={baseline:.3f} "
              f"need={max(ls.min_score, ls.min_margin * baseline):.3f} "
              f"consist={ls.consistency}", flush=True)
    if (cand < 0 or cand_score
            < max(ls.min_score, ls.min_margin * baseline)):
        ls.consistency = 0
        ls.last_candidate = -1
        return None
    if (ls.last_candidate >= 0 and ls.last_candidate in order_of
            and cand in order_of
            and abs(order_of[cand] - order_of[ls.last_candidate]) <= 3):
        ls.consistency += 1
    else:
        ls.consistency = 1
    ls.last_candidate = cand
    if ls.consistency >= ls.consistency_needed:
        return cand
    return None


def loop_excl_mask(ls: LoopState, slot: int, kf_slots: list, max_kf: int
                   ) -> Optional[np.ndarray]:
    """Host-knowledge exclusion mask for detect_loop_device, or None if
    detection should be skipped entirely (map too young / cooldown)."""
    order_of = {s: i for i, s in enumerate(kf_slots)}
    cur_order = order_of.get(slot, len(kf_slots) - 1)
    if (len(kf_slots) < ls.min_gap + 3
            or cur_order - ls.last_loop_order < ls.min_gap):
        return None
    mask = np.zeros((max_kf,), bool)
    for s in kf_slots[max(cur_order - ls.min_gap, 0): cur_order + 1]:
        mask[s] = True
    mask[slot] = True
    return mask


def on_new_keyframe(ls: LoopState, ms: mapstate.MapState, slot: int):
    """Register the keyframe in the retrieval index (caches its top
    descriptors pre-unpacked — see retrieval.RetrievalDB)."""
    ls.db = retrieval.mark_keyframe(ls.db, slot, ms.kf_desc[slot],
                                    ms.kf_kp_valid[slot],
                                    ms.kf_response[slot])


def detect_loop(ls: LoopState, ms: mapstate.MapState, slot: int,
                kf_slots: list) -> Optional[int]:
    """Returns a geometrically-unverified candidate slot or None.

    Synchronous wrapper: dispatch the device half and fetch its scalars
    immediately, then apply the shared host gates. The pipelined
    tracker instead defers the fetch to the next frame (same device
    program, same loop_decide).

    `kf_slots` is the live keyframe list in temporal order — slot ids are
    recycled, so recency is measured by list position, not slot value."""
    mask = loop_excl_mask(ls, slot, kf_slots, ms.kf_capacity)
    if mask is None:
        return None
    cand, score, baseline = jax.device_get(detect_loop_device(
        ls.db, ms, slot, jnp.asarray(mask)))
    return loop_decide(ls, slot, kf_slots, int(cand), float(score),
                       float(baseline))


def detect_merge(ls: LoopState, ms: mapstate.MapState, slot: int,
                 atlas) -> Optional[tuple]:
    """Cross-map place recognition: score the new keyframe against every
    ARCHIVED map's keyframes; a stable hit is a merge candidate.

    Mirrors the loop/merge split of DetectNBestCandidates
    (/root/reference/src/KeyFrameDatabase.cc:620: same-map hits become
    loop candidates, other-map hits merge candidates) with the same
    temporal-consistency counting as loops (mnMergeNumCoincidences >= 3,
    src/LoopClosing.cc:430). Returns (map_index, candidate_slot) once
    confirmed, else None."""
    if atlas is None or atlas.n_maps == 0:
        return None
    best_map, best_slot, best_score = jax.device_get(
        merge_scores_device(ms, slot, atlas))
    best_map, best_slot, best_score = (int(best_map), int(best_slot),
                                       float(best_score))
    return merge_decide(ls, best_map, best_slot, best_score, slot)


def merge_scores_device(ms: mapstate.MapState, slot: int, atlas):
    """Device half of merge detection: best (map, slot, score) over all
    archived maps as DEVICE scalars (fetch deferrable). One scoring
    dispatch per archived map; the arg-reduce rides the same queue."""
    q_desc = ms.kf_desc[slot]
    q_valid = _strong(ms, slot)
    q_resp = ms.kf_response[slot]
    best_map = jnp.int32(-1)
    best_slot = jnp.int32(-1)
    best_score = jnp.float32(0.0)
    for mi, am in enumerate(atlas.maps):
        if getattr(am, "db", None) is not None:
            scores = retrieval.score_db(am.db, q_desc, q_valid, q_resp,
                                        match_th=25)
        else:
            scores = retrieval.score_keyframes(
                am.ms.kf_desc, am.ms.kf_kp_valid, am.ms.kf_valid,
                q_desc, q_valid, match_th=25)
        cand = jnp.argmax(scores).astype(jnp.int32)
        sc = scores[cand]
        better = sc > best_score
        best_map = jnp.where(better, jnp.int32(mi), best_map)
        best_slot = jnp.where(better, cand, best_slot)
        best_score = jnp.where(better, sc, best_score)
    return best_map, best_slot, best_score


def merge_decide(ls: LoopState, best_map: int, best_slot: int,
                 best_score: float, slot: int) -> Optional[tuple]:
    """Host half of merge detection (temporal-consistency counting,
    mnMergeNumCoincidences >= 3, src/LoopClosing.cc:430)."""
    if _DEBUG:
        print(f"[merge] kf={slot} best_map={best_map} slot={best_slot} "
              f"score={best_score:.3f} consist={ls.merge_consistency}",
              flush=True)
    if best_map < 0 or best_score < ls.min_score:
        ls.merge_consistency = 0
        ls.merge_map = -1
        ls.merge_candidate = -1
        return None
    order_prev = ls.merge_candidate
    same_region = (ls.merge_map == best_map and order_prev >= 0
                   and abs(best_slot - order_prev) <= 6)
    ls.merge_consistency = ls.merge_consistency + 1 if same_region else 1
    ls.merge_map = best_map
    ls.merge_candidate = best_slot
    if ls.merge_consistency >= ls.consistency_needed:
        return best_map, best_slot
    return None


def _kf_point_pairs(ms_a: mapstate.MapState, slot_a: int, slot_b: int,
                    ms_b: mapstate.MapState = None):
    """Descriptor-match keyframes a<->b; return camera-frame 3D pairs of
    their associated map points + pixel observations. `ms_b` (defaults
    to ms_a) lets a and b live in DIFFERENT maps — the cross-map variant
    place recognition needs for merge detection
    (/root/reference/src/KeyFrameDatabase.cc:620 splits loop vs merge
    candidates by map)."""
    if ms_b is None:
        ms_b = ms_a
    res = matching.match(
        ms_a.kf_desc[slot_a], ms_b.kf_desc[slot_b],
        ms_a.kf_kp_valid[slot_a] & (ms_a.kf_obs_mp[slot_a] >= 0),
        ms_b.kf_kp_valid[slot_b] & (ms_b.kf_obs_mp[slot_b] >= 0),
        max_dist=matching.TH_LOW, ratio=0.9, mutual=True,
    )
    idx_b = jnp.clip(res.idx, 0, ms_b.kf_obs_mp.shape[1] - 1)
    mp_a = ms_a.kf_obs_mp[slot_a]
    mp_b = ms_b.kf_obs_mp[slot_b][idx_b]
    valid = (res.idx >= 0) & (mp_a >= 0) & (mp_b >= 0)
    mp_a_s = jnp.clip(mp_a, 0, ms_a.mp_capacity - 1)
    mp_b_s = jnp.clip(mp_b, 0, ms_b.mp_capacity - 1)
    valid = valid & ms_a.mp_valid[mp_a_s] & ms_b.mp_valid[mp_b_s]
    Xa_w = ms_a.mp_pos[mp_a_s]
    Xb_w = ms_b.mp_pos[mp_b_s]
    Xa_c = Xa_w @ ms_a.kf_R[slot_a].T + ms_a.kf_t[slot_a]
    Xb_c = Xb_w @ ms_b.kf_R[slot_b].T + ms_b.kf_t[slot_b]
    uv_a = ms_a.kf_uv[slot_a]
    uv_b = ms_b.kf_uv[slot_b][idx_b]
    return Xa_c, Xb_c, uv_a, uv_b, valid


def verify_loop_device(ms: mapstate.MapState, cur: int, cand: int,
                       cam_params, key, min_inliers: int = 20,
                       ms_cand: mapstate.MapState = None):
    """Sim3 verification as ONE device dispatch with NO host branching:
    returns (ok, s, R, t, n_inl) as device values so the tracker can
    defer the fetch (the LoopClosing-thread latency of the reference,
    src/LoopClosing.cc:56 — verification never blocks the frame path).
    Runs RANSAC and the Sim3 GN refinement unconditionally; the gates
    fold into the returned `ok`."""
    Xc, Xl, uv_c, uv_l, valid = _kf_point_pairs(ms, cur, cand,
                                                ms_b=ms_cand)
    eye = jnp.eye(3, dtype=jnp.float32)
    zero = jnp.zeros(3, jnp.float32)
    ones = jnp.ones(valid.shape[0], jnp.float32)
    res = sim3.ransac_sim3(
        Xc, Xl, valid, key, uv_c, uv_l, ones, ones,
        eye, zero, eye, zero, cam_params, min_inliers=15,
    )
    s, R, t, inlier, n = sim3.optimize_sim3(
        res.s, res.R, res.t, Xc, Xl, res.inlier,
        uv_c, uv_l, ones, ones, eye, zero, eye, zero, cam_params,
    )
    ok = (jnp.sum(valid) >= 12) & res.ok & (n >= min_inliers)
    return ok, s, R, t, n


def verify_loop(ms: mapstate.MapState, cur: int, cand: int, cam_params,
                key, min_inliers: int = 20,
                ms_cand: mapstate.MapState = None):
    """Sim3 RANSAC + GN refinement between current and candidate KF.

    Returns (ok, s, R, t) with x_cand_cam = s R x_cur_cam + t
    (nBoWInliers=15 RANSAC / nSim3Inliers=20 gates,
    src/LoopClosing.cc:641-645). `ms_cand` places the candidate in a
    different map (merge verification)."""
    Xc, Xl, uv_c, uv_l, valid = _kf_point_pairs(ms, cur, cand,
                                                ms_b=ms_cand)
    if int(jnp.sum(valid)) < 12:
        return False, None, None, None
    eye = jnp.eye(3, dtype=jnp.float32)
    zero = jnp.zeros(3, jnp.float32)
    ones = jnp.ones(valid.shape[0], jnp.float32)
    res = sim3.ransac_sim3(
        Xc, Xl, valid, key, uv_c, uv_l, ones, ones,
        eye, zero, eye, zero, cam_params, min_inliers=15,
    )
    if not bool(res.ok):
        return False, None, None, None
    s, R, t, inlier, n = sim3.optimize_sim3(
        res.s, res.R, res.t, Xc, Xl, res.inlier,
        uv_c, uv_l, ones, ones, eye, zero, eye, zero, cam_params,
    )
    if int(n) < min_inliers:
        return False, None, None, None
    return True, s, R, t


def correct_loop(
    ls: LoopState,
    ms: mapstate.MapState,
    cur: int,
    cand: int,
    kf_slots: list,          # live keyframes, temporal order
    s_cl, R_cl, t_cl,        # x_cand_cam = S(x_cur_cam)
    fix_scale: bool = False,
    gravity_w=None,          # set => 4-DoF yaw-only graph (inertial map)
    covm=None,               # prefetched host covisibility matrix
):
    """Pose-graph correction (CorrectLoop /root/reference/src/LoopClosing.cc:1210
    + OptimizeEssentialGraph, Optimizer.cc:2385).

    The essential graph: temporal-chain odometry edges over the live
    keyframe list (the spanning tree of a sequential trajectory),
    covisibility edges with weight >= minFeat=100 (Optimizer.cc:2570),
    every previously-accepted loop edge (KeyFrame::AddLoopEdge at
    :2414), and the newly verified loop edge. Only the candidate KF is
    pinned — earlier keyframes stay free, held by their odometry and
    covisibility edges (this is what lets a second loop move them).
    Map points are re-mapped through their observing keyframe's
    correction. `fix_scale=True` is the inertial/stereo variant."""
    K = ms.kf_capacity
    dtype = jnp.float32
    n_live = len(kf_slots)

    s0 = jnp.ones((K,), dtype)
    R0 = ms.kf_R
    t0 = ms.kf_t
    valid = ms.kf_valid

    # --- edge set (host-assembled; corrections are rare events).
    slots = np.asarray(kf_slots, np.int32)
    ei, ej, ew = [], [], []
    for d, w in ((1, 1.0), (2, 0.5)):
        if n_live > d:
            ei.append(slots[:-d])
            ej.append(slots[d:])
            ew.append(np.full(n_live - d, w, np.float32))
    # Covisibility edges (strong co-observation; dedup i<j, skip pairs
    # already adjacent in the temporal chain). The pipelined tracker
    # passes `covm` prefetched (async host copy one frame earlier).
    W_cov = (np.asarray(covm) if covm is not None
             else np.asarray(mapstate.covisibility_matrix(ms)))
    order_of = {s: i for i, s in enumerate(kf_slots)}
    ci, cj = np.nonzero(np.triu(W_cov, 1) >= 100)
    keep = np.array([
        a in order_of and b in order_of
        and abs(order_of[a] - order_of[b]) > 2
        for a, b in zip(ci.tolist(), cj.tolist())
    ], bool) if ci.size else np.zeros(0, bool)
    if ci.size:
        ei.append(ci[keep].astype(np.int32))
        ej.append(cj[keep].astype(np.int32))
        ew.append(np.full(int(keep.sum()), 1.0, np.float32))
    ei = np.concatenate(ei) if ei else np.zeros(0, np.int32)
    ej = np.concatenate(ej) if ej else np.zeros(0, np.int32)
    ew = np.concatenate(ew) if ew else np.zeros(0, np.float32)
    n_odo = len(ei)

    # Historical + new loop edges carry explicit Sim3 measurements.
    loop_list = [e for e in ls.loop_edges
                 if e[0] in order_of and e[1] in order_of]
    loop_list.append((cand, cur, np.asarray(s_cl), np.asarray(R_cl),
                      np.asarray(t_cl)))
    ei = np.concatenate([ei, np.asarray([e[0] for e in loop_list],
                                        np.int32)])
    ej = np.concatenate([ej, np.asarray([e[1] for e in loop_list],
                                        np.int32)])
    ew = np.concatenate([ew, np.full(len(loop_list), 5.0, np.float32)])

    # Pad the edge arrays to a power-of-two bucket (min 1024) so the
    # pose-graph program compiles O(log) times AND the persistent
    # compilation cache hits across runs — the exact edge count varies
    # run to run, and a fine-grained bucket made every loop correction
    # a fresh ~40 s XLA compile on the tunnel-attached chip.
    E = len(ei)
    E_pad = 1024
    while E_pad < E:
        E_pad *= 2
    pad = E_pad - E
    eim = jnp.asarray(np.concatenate([ei, np.zeros(pad, np.int32)]))
    ejm = jnp.asarray(np.concatenate([ej, np.zeros(pad, np.int32)]))
    ewm = jnp.asarray(np.concatenate([ew, np.zeros(pad, np.float32)]))
    edge_valid = (jnp.arange(E_pad) < E) & valid[eim] & valid[ejm]

    # Measurements: S_ij = S_iw o S_jw^-1 from CURRENT (drifted) states
    # for odometry/covisibility edges; loop edges use their verified Sim3.
    Ri, ti = R0[eim], t0[eim]
    Rj, tj = R0[ejm], t0[ejm]
    sij = jnp.ones((E_pad,), dtype)
    Rij = jnp.einsum("eij,ekj->eik", Ri, Rj)
    tij = ti - jnp.einsum("eij,ej->ei", Rij, tj)
    for k, (a, b, s_m, R_m, t_m) in enumerate(loop_list):
        idx = n_odo + k
        sij = sij.at[idx].set(jnp.asarray(s_m, dtype))
        Rij = Rij.at[idx].set(jnp.asarray(R_m, dtype))
        tij = tij.at[idx].set(jnp.asarray(t_m, dtype))

    fixed = jnp.zeros((K,), bool).at[cand].set(True)

    # Inertial maps use the 4-DoF graph (OptimizeEssentialGraph4DoF,
    # ref Optimizer.cc:8520; selected at LoopClosing.cc:1412-1415):
    # gravity pins pitch/roll, the graph may only bend yaw+translation.
    yaw_only = gravity_w is not None
    res = pose_graph.optimize_pose_graph(
        s0, R0, t0, valid, fixed,
        eim, ejm, sij, Rij, tij,
        edge_valid, ewm, fix_scale=fix_scale,
        yaw_only=yaw_only,
        gravity_w=(jnp.asarray(gravity_w, dtype) if yaw_only else None),
    )

    # Corrected camera poses: Tcw = [R, t/s].
    new_R = res.R
    new_t = res.t / jnp.maximum(res.s[:, None], 1e-9)

    # Re-map points through an observing keyframe's correction:
    # x' = S_kw_new^-1 ( S_kw_old (x) ). The slot list is PADDED to the
    # keyframe capacity so these programs keep ONE shape regardless of
    # map age — n_live-shaped gathers made every correction a fresh
    # trace+compile (measured as a multi-second spike at each loop).
    slots_pad = np.full((K,), -1, np.int32)
    slots_pad[:n_live] = slots
    slots_j = jnp.asarray(slots_pad)
    live_row = slots_j >= 0
    slots_safe = jnp.clip(slots_j, 0, K - 1)
    owner = jnp.full((ms.mp_capacity,), -1, jnp.int32)
    obs = jnp.where(live_row[:, None],
                    ms.kf_obs_mp[slots_safe], -1)  # (K, N)
    flat = obs.reshape(-1)
    kf_of = jnp.repeat(slots_safe, obs.shape[1])
    owner = owner.at[jnp.where(flat >= 0, flat, ms.mp_capacity)].set(
        kf_of.astype(jnp.int32), mode="drop")
    has_owner = owner >= 0
    ow = jnp.clip(owner, 0, K - 1)
    # old: x_cam = R0 x + t0 ; new world: x' = s_new^-1 R_new^T (x_cam*?).
    # S_kw_new^-1 = (1/s, R^T, -R^T t / s).
    x_cam = jnp.einsum("mij,mj->mi", R0[ow], ms.mp_pos) + t0[ow]
    s_new = jnp.maximum(res.s[ow], 1e-9)
    x_new = jnp.einsum("mji,mj->mi", res.R[ow],
                       x_cam - res.t[ow]) / s_new[:, None]
    moved = has_owner & ms.mp_valid
    mp_pos = jnp.where(moved[:, None], x_new, ms.mp_pos)
    # Viewing normals ride the same rotation; distance ranges the same
    # scale (the owner's correction is a similarity: world -> world).
    n_cam = jnp.einsum("mij,mj->mi", R0[ow], ms.mp_normal)
    n_new = jnp.einsum("mji,mj->mi", res.R[ow], n_cam)
    mp_normal = jnp.where(moved[:, None], n_new, ms.mp_normal)
    mp_dmin = jnp.where(moved, ms.mp_dist_min / s_new, ms.mp_dist_min)
    mp_dmax = jnp.where(moved, ms.mp_dist_max / s_new, ms.mp_dist_max)

    ms = ms._replace(kf_R=new_R, kf_t=new_t, mp_pos=mp_pos,
                     mp_normal=mp_normal, mp_dist_min=mp_dmin,
                     mp_dist_max=mp_dmax)
    ls.last_loop_order = order_of.get(cur, n_live - 1)
    ls.loop_edges.append((cand, cur, np.asarray(s_cl), np.asarray(R_cl),
                          np.asarray(t_cl)))
    ls.consistency = 0
    ls.last_candidate = -1
    return ms


@functools.partial(jax.jit, static_argnames=("cap",))
def _seam_fuse_core(ms: mapstate.MapState, new_mask, old_mask,
                    cap: int = 8192):
    """Batched MapPoint::Replace across the loop seam
    (SearchAndFuse, /root/reference/src/LoopClosing.cc:2631 +
    src/MapPoint.cc:249): current-side points that duplicate an
    established candidate-side point are invalidated and every
    observation of them is rewired to the old point.

    Unlike merge.fuse_duplicate_points this gathers each side into a
    `cap`-padded subset first — the seam involves a bounded window of
    keyframes, so an all-pairs sweep over mp_capacity² (32k² here)
    would be ~1000x wasted work."""
    M = ms.mp_capacity
    new_ok_full = new_mask & ms.mp_valid
    old_ok_full = old_mask & ms.mp_valid
    # Stable gather: indices of each side's points, padded with slots
    # whose mask is False (argsort of ~mask puts True entries first).
    ni = jnp.argsort(~new_ok_full)[:cap].astype(jnp.int32)
    oi = jnp.argsort(~old_ok_full)[:cap].astype(jnp.int32)
    nok = new_ok_full[ni]
    ook = old_ok_full[oi]

    ham = matching.hamming_matrix(ms.mp_desc[ni], ms.mp_desc[oi])
    pn, po = ms.mp_pos[ni], ms.mp_pos[oi]
    d2 = (jnp.sum(pn * pn, -1)[:, None] + jnp.sum(po * po, -1)[None, :]
          - 2.0 * (pn @ po.T))
    tol = jnp.maximum(0.1 * jnp.maximum(ms.mp_dist_max[oi], 1e-3), 0.05)
    cand_ok = (nok[:, None] & ook[None, :] & (ham < 50)
               & (d2 < tol[None, :] ** 2))
    score = jnp.where(cand_ok, ham, 1e9)
    best = jnp.argmin(score, axis=1).astype(jnp.int32)       # (cap,)
    has = nok & (jnp.min(score, axis=1) < 1e8)
    target = oi[best]                                        # (cap,) global id

    # Redirect lut over the full pool; identity elsewhere.
    ids = jnp.arange(M, dtype=jnp.int32)
    lut = ids.at[jnp.where(has, ni, M)].set(
        jnp.where(has, target, 0), mode="drop")
    obs = ms.kf_obs_mp
    obs_new = jnp.where(obs >= 0, lut[jnp.clip(obs, 0, M - 1)], -1)
    mp_valid = ms.mp_valid.at[jnp.where(has, ni, M)].set(
        False, mode="drop")
    # Replacement inherits the duplicate's counters (MapPoint::Replace
    # keeps nvisible/nfound, src/MapPoint.cc:270).
    mp_visible = ms.mp_visible.at[jnp.where(has, target, M)].add(
        jnp.where(has, ms.mp_visible[ni], 0), mode="drop")
    mp_found = ms.mp_found.at[jnp.where(has, target, M)].add(
        jnp.where(has, ms.mp_found[ni], 0), mode="drop")
    n_fused = jnp.sum(has).astype(jnp.int32)
    return ms._replace(kf_obs_mp=obs_new, mp_valid=mp_valid,
                       mp_visible=mp_visible, mp_found=mp_found), n_fused


def seam_fuse(ms: mapstate.MapState, kf_slots: list, cur: int, cand: int,
              width: int = 10):
    """Fuse duplicate map points across a just-closed loop seam.

    After correct_loop the two loop ends coincide spatially but their
    landmarks are still disjoint: the seam is held only by the one Sim3
    edge, and the post-loop GBA — seeing two unconnected point clouds —
    can pull it back apart. The reference solves this with SearchAndFuse
    (/root/reference/src/LoopClosing.cc:2631): project the corrected
    current-side points into the loop-side keyframes and Replace
    duplicates, creating cross-seam observations that anchor the GBA.

    Sides: points observed by keyframes within `width` of cur / cand in
    temporal order. Points already seen by both sides tie the seam by
    themselves and are skipped."""
    order_of = {s: i for i, s in enumerate(kf_slots)}
    i_cur, i_cand = order_of[cur], order_of[cand]
    cur_side = [s for s in kf_slots if abs(order_of[s] - i_cur) <= width]
    cand_side = [s for s in kf_slots if abs(order_of[s] - i_cand) <= width]

    def owned(slots):
        obs = ms.kf_obs_mp[jnp.asarray(np.asarray(slots, np.int32))]
        flat = obs.reshape(-1)
        m = jnp.zeros((ms.mp_capacity,), bool)
        return m.at[jnp.where(flat >= 0, flat, ms.mp_capacity)].set(
            True, mode="drop")

    new_mask = owned(cur_side)
    old_mask = owned(cand_side)
    new_mask = new_mask & ~old_mask
    ms, n_fused = _seam_fuse_core(ms, new_mask, old_mask)
    return ms, int(n_fused)


def relocalize(ls: LoopState, ms: mapstate.MapState, feats, cam_params,
               inv_sigma2_lut, top_k: int = 3, min_inliers: int = 20,
               key=None, model: str = "pinhole"):
    """Tracking::Relocalization analog (src/Tracking.cc:3764): retrieval
    -> 2D-3D matches -> batched EPnP RANSAC (the MLPnP role, :3811) ->
    GN polish (PoseOptimization, :3844). The minimal-solver RANSAC means
    recovery works even when the query pose is far from every stored
    keyframe pose. Returns (ok, R, t, n_inliers)."""
    from tpuslam.geometry import cameras
    from tpuslam.solver import pnp

    if key is None:
        key = jax.random.PRNGKey(0)
    scores = np.asarray(retrieval.score_db(
        ls.db, feats.desc, feats.valid, feats.response))
    # Rank GROUPS by accumulated covisibility score, then reduce each
    # group to its best RAW-score member and suppress candidates
    # covisible with an already-selected one
    # (DetectRelocalizationCandidates, KeyFrameDatabase.cc:814: one
    # pBestKF per group, so the top-k candidates span distinct places —
    # members of one group share nearly identical accumulated scores,
    # and raw score, not group degree, predicts PnP success).
    covm = np.asarray(mapstate.covisibility_matrix(ms))
    group = retrieval.accumulate_group_scores(scores, covm)
    order = []
    for s in np.argsort(-group):
        if group[s] < 0 or len(order) >= top_k:
            break
        members = np.nonzero((covm[s] >= 15) & (scores >= 0))[0]
        if scores[s] >= 0:
            members = np.append(members, s)
        if members.size == 0:
            continue
        rep = int(members[np.argmax(scores[members])])
        if scores[rep] < 0.05:
            continue
        if any(rep == p or covm[rep, p] >= 15 for p in order):
            continue
        order.append(rep)
    inv_sigma2_kp = inv_sigma2_lut[jnp.clip(feats.level, 0,
                                            inv_sigma2_lut.shape[0] - 1)]
    bear_all = cameras.unproject(feats.uv, cam_params, model)
    focal = float(cam_params[0])
    for cand in order:
        cand = int(cand)
        res = matching.match(
            ms.kf_desc[cand], feats.desc,
            ms.kf_kp_valid[cand] & (ms.kf_obs_mp[cand] >= 0), feats.valid,
            max_dist=matching.TH_LOW, ratio=0.85, mutual=True,
        )
        mp = ms.kf_obs_mp[cand]
        mp_s = jnp.clip(mp, 0, ms.mp_capacity - 1)
        valid = (res.idx >= 0) & (mp >= 0) & ms.mp_valid[mp_s]
        if _DEBUG:
            print(f"[reloc] cand={cand} score={scores[cand]:.3f} "
                  f"pairs={int(jnp.sum(valid))}", flush=True)
        if int(jnp.sum(valid)) < 10:
            continue
        kp = jnp.clip(res.idx, 0, feats.capacity - 1)
        key, sub = jax.random.split(key)
        hyp = pnp.ransac_pnp(
            ms.mp_pos[mp_s], bear_all[kp], valid, sub,
            inlier_th=8.0 / focal, min_inliers=10,
        )
        if _DEBUG:
            print(f"[reloc] cand={cand} pnp_ok={bool(hyp.ok)} "
                  f"pnp_inl={int(hyp.n_inliers)}", flush=True)
        if not bool(hyp.ok):
            continue
        opt = pose_opt.optimize_pose(
            hyp.R, hyp.t,
            ms.mp_pos[mp_s], feats.uv[kp], inv_sigma2_kp[kp],
            valid, cam_params, model=model,
        )
        if _DEBUG:
            print(f"[reloc] cand={cand} gn_inl={int(opt.n_inliers)}",
                  flush=True)
        if int(opt.n_inliers) >= min_inliers:
            return True, np.asarray(opt.R), np.asarray(opt.t), \
                int(opt.n_inliers)
    return False, None, None, 0
