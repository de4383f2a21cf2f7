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

from dataclasses import dataclass, field
from typing import Optional

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
    last_loop_kf: int = -999     # cooldown after a correction

    @staticmethod
    def create(max_kf: int) -> "LoopState":
        return LoopState(db=retrieval.empty_db(max_kf))


STRONG_RESPONSE = 20.0  # retrieval uses confident corners only


def _strong(ms: mapstate.MapState, slot: int):
    return ms.kf_kp_valid[slot] & (ms.kf_response[slot] > STRONG_RESPONSE)


def on_new_keyframe(ls: LoopState, ms: mapstate.MapState, slot: int):
    """Register the keyframe in the retrieval index."""
    ls.db = retrieval.mark_keyframe(ls.db, slot)


def detect_loop(ls: LoopState, ms: mapstate.MapState, slot: int,
                n_kf: int) -> Optional[int]:
    """Returns a geometrically-unverified candidate slot or None."""
    if n_kf < ls.min_gap + 3 or slot - ls.last_loop_kf < ls.min_gap:
        return None
    scores = np.array(retrieval.score_keyframes(
        ms.kf_desc, ms.kf_kp_valid, ls.db.kf_valid,
        ms.kf_desc[slot], _strong(ms, slot), match_th=25))
    # Exclude the temporally-adjacent window (the reference excludes
    # covisible keyframes, KeyFrameDatabase.cc:620).
    lo = max(slot - ls.min_gap, 0)
    scores[lo: slot + 1] = -1.0
    cand = int(np.argmax(scores))
    others = scores[(scores >= 0)]
    baseline = float(np.median(others)) if others.size > 3 else 0.0
    # Absolute + relative gates (the reference compares against the
    # worst covisible-neighbor score, LoopClosing.cc minScore).
    if scores[cand] < max(ls.min_score, ls.min_margin * baseline):
        ls.consistency = 0
        ls.last_candidate = -1
        return None
    # Temporal consistency: same region hit on consecutive keyframes.
    if ls.last_candidate >= 0 and abs(cand - ls.last_candidate) <= 3:
        ls.consistency += 1
    else:
        ls.consistency = 1
    ls.last_candidate = cand
    if ls.consistency >= ls.consistency_needed:
        return cand
    return None


def _kf_point_pairs(ms: mapstate.MapState, slot_a: int, slot_b: int):
    """Descriptor-match keyframes a<->b; return camera-frame 3D pairs of
    their associated map points + pixel observations."""
    res = matching.match(
        ms.kf_desc[slot_a], ms.kf_desc[slot_b],
        ms.kf_kp_valid[slot_a] & (ms.kf_obs_mp[slot_a] >= 0),
        ms.kf_kp_valid[slot_b] & (ms.kf_obs_mp[slot_b] >= 0),
        max_dist=matching.TH_LOW, ratio=0.9, mutual=True,
    )
    idx_b = jnp.clip(res.idx, 0, ms.kf_obs_mp.shape[1] - 1)
    mp_a = ms.kf_obs_mp[slot_a]
    mp_b = ms.kf_obs_mp[slot_b][idx_b]
    valid = (res.idx >= 0) & (mp_a >= 0) & (mp_b >= 0)
    mp_a_s = jnp.clip(mp_a, 0, ms.mp_capacity - 1)
    mp_b_s = jnp.clip(mp_b, 0, ms.mp_capacity - 1)
    valid = valid & ms.mp_valid[mp_a_s] & ms.mp_valid[mp_b_s]
    Xa_w = ms.mp_pos[mp_a_s]
    Xb_w = ms.mp_pos[mp_b_s]
    Xa_c = Xa_w @ ms.kf_R[slot_a].T + ms.kf_t[slot_a]
    Xb_c = Xb_w @ ms.kf_R[slot_b].T + ms.kf_t[slot_b]
    uv_a = ms.kf_uv[slot_a]
    uv_b = ms.kf_uv[slot_b][idx_b]
    return Xa_c, Xb_c, uv_a, uv_b, valid


def verify_loop(ms: mapstate.MapState, cur: int, cand: int, cam_params,
                key, min_inliers: int = 20):
    """Sim3 RANSAC + GN refinement between current and candidate KF.

    Returns (ok, s, R, t) with x_cand_cam = s R x_cur_cam + t
    (nBoWInliers=15 RANSAC / nSim3Inliers=20 gates,
    src/LoopClosing.cc:641-645)."""
    Xc, Xl, uv_c, uv_l, valid = _kf_point_pairs(ms, cur, cand)
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
    n_kf: int,
    s_cl, R_cl, t_cl,        # x_cand_cam = S(x_cur_cam)
):
    """Pose-graph correction (CorrectLoop + OptimizeEssentialGraph).

    States S_iw initialized from current poses (scale 1), sequential
    odometry edges + the verified loop edge (cand <- cur); candidate
    side fixed; map points re-mapped through their observing keyframe's
    correction."""
    K = ms.kf_capacity
    dtype = jnp.float32
    kf_slots = jnp.arange(n_kf)

    s0 = jnp.ones((K,), dtype)
    R0 = ms.kf_R
    t0 = ms.kf_t
    valid = ms.kf_valid

    # Sequential odometry edges between consecutive keyframes (the
    # spanning tree of a linear trajectory) + neighbor edges at +-2.
    ei, ej, ew = [], [], []
    for d, w in ((1, 1.0), (2, 0.5)):
        ei.append(np.arange(0, n_kf - d))
        ej.append(np.arange(d, n_kf))
        ew.append(np.full(n_kf - d, w, np.float32))
    ei = np.concatenate(ei)
    ej = np.concatenate(ej)
    ew = np.concatenate(ew)
    # Loop edge with high weight: (i=cand, j=cur), measurement = S_cl.
    ei = np.append(ei, cand).astype(np.int32)
    ej = np.append(ej, cur).astype(np.int32)
    ew = np.append(ew, 5.0).astype(np.float32)

    E = len(ei)
    eim = jnp.asarray(ei)
    ejm = jnp.asarray(ej)
    # Measurements: S_ij = S_iw o S_jw^-1 from CURRENT (drifted) states
    # for odometry edges; the loop edge uses the verified Sim3.
    Ri = R0[eim]
    ti = t0[eim]
    Rj = R0[ejm]
    tj = t0[ejm]
    sij, Rij, tij = jax.vmap(
        lambda Ra, ta, Rb, tb: (
            jnp.ones((), dtype) / 1.0,
            Ra @ Rb.T,
            ta - jnp.einsum("ij,j->i", Ra @ Rb.T, tb),
        )
    )(Ri, ti, Rj, tj)
    sij = sij.at[E - 1].set(s_cl)
    Rij = Rij.at[E - 1].set(R_cl)
    tij = tij.at[E - 1].set(t_cl)

    fixed = jnp.zeros((K,), bool).at[cand].set(True)
    # Also pin everything up to the candidate (that part of the map is
    # the reference frame, as the reference keeps the loop side fixed).
    fixed = fixed.at[jnp.arange(K)].set(jnp.arange(K) <= cand)

    res = pose_graph.optimize_pose_graph(
        s0, R0, t0, valid, fixed,
        eim, ejm, sij, Rij, tij,
        jnp.ones((E,), bool), jnp.asarray(ew),
    )

    # Corrected camera poses: Tcw = [R, t/s].
    new_R = res.R
    new_t = res.t / jnp.maximum(res.s[:, None], 1e-9)

    # Re-map points through an observing keyframe's correction:
    # x' = S_kw_new^-1 ( S_kw_old (x) ).
    owner = jnp.full((ms.mp_capacity,), -1, jnp.int32)
    obs = ms.kf_obs_mp[kf_slots]  # (n_kf, N)
    flat = obs.reshape(-1)
    kf_of = jnp.repeat(kf_slots, obs.shape[1])
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
    mp_pos = jnp.where(has_owner[:, None] & ms.mp_valid[:, None],
                       x_new, ms.mp_pos)

    ms = ms._replace(kf_R=new_R, kf_t=new_t, mp_pos=mp_pos)
    ls.last_loop_kf = cur
    ls.consistency = 0
    ls.last_candidate = -1
    return ms


def relocalize(ls: LoopState, ms: mapstate.MapState, feats, cam_params,
               inv_sigma2_lut, top_k: int = 3, min_inliers: int = 20):
    """Tracking::Relocalization analog: retrieval -> 2D-3D matches ->
    robust pose optimization seeded from each candidate keyframe pose.
    Returns (ok, R, t, n_inliers)."""
    scores = np.asarray(retrieval.score_keyframes(
        ms.kf_desc, ms.kf_kp_valid, ls.db.kf_valid,
        feats.desc, feats.valid))
    order = np.argsort(-scores)[:top_k]
    inv_sigma2_kp = inv_sigma2_lut[jnp.clip(feats.level, 0,
                                            inv_sigma2_lut.shape[0] - 1)]
    for cand in order:
        if scores[cand] < 0.05:
            break
        cand = int(cand)
        res = matching.match(
            ms.kf_desc[cand], feats.desc,
            ms.kf_kp_valid[cand] & (ms.kf_obs_mp[cand] >= 0), feats.valid,
            max_dist=matching.TH_LOW, ratio=0.85, mutual=True,
        )
        mp = ms.kf_obs_mp[cand]
        mp_s = jnp.clip(mp, 0, ms.mp_capacity - 1)
        valid = (res.idx >= 0) & (mp >= 0) & ms.mp_valid[mp_s]
        if int(jnp.sum(valid)) < 10:
            continue
        kp = jnp.clip(res.idx, 0, feats.capacity - 1)
        opt = pose_opt.optimize_pose(
            ms.kf_R[cand], ms.kf_t[cand],
            ms.mp_pos[mp_s], feats.uv[kp], inv_sigma2_kp[kp],
            valid, cam_params,
        )
        if int(opt.n_inliers) >= min_inliers:
            return True, np.asarray(opt.R), np.asarray(opt.t), \
                int(opt.n_inliers)
    return False, None, None, 0
