"""Sim3 / pose-graph / retrieval unit tests + loop-closing integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.geometry import lie
from tpuslam.mapping import retrieval
from tpuslam.solver import pose_graph, sim3

CAM = jnp.array([450.0, 450.0, 320.0, 240.0], jnp.float32)


def test_horn_sim3_exact(rng):
    X1 = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
    s = 1.7
    R = np.asarray(lie.so3_exp(jnp.asarray([0.2, -0.3, 0.5], jnp.float32)))
    t = np.array([1.0, -2.0, 0.5], np.float32)
    X2 = s * X1 @ R.T + t
    s_e, R_e, t_e = sim3.horn_sim3(X1, jnp.asarray(X2))
    assert abs(float(s_e) - s) < 1e-3
    np.testing.assert_allclose(R_e, R, atol=1e-4)
    np.testing.assert_allclose(t_e, t, atol=1e-3)


def test_ransac_sim3_with_outliers(rng):
    P = 120
    # Camera-frame points in front of both cameras.
    X1 = rng.uniform([-2, -2, 4], [2, 2, 8], size=(P, 3)).astype(np.float32)
    s = 0.8
    R = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.1, 0.3], jnp.float32)))
    t = np.array([0.4, -0.1, 0.6], np.float32)
    X2 = s * X1 @ R.T + t
    out = rng.choice(P, 30, replace=False)
    X2[out] += rng.uniform(1, 3, (30, 3)).astype(np.float32)

    def proj(X):
        return np.stack([450 * X[:, 0] / X[:, 2] + 320,
                         450 * X[:, 1] / X[:, 2] + 240], 1).astype(np.float32)

    uv1, uv2 = proj(X1), proj(X2)
    eye, zero = jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32)
    ones = jnp.ones(P, jnp.float32)
    res = sim3.ransac_sim3(
        jnp.asarray(X1), jnp.asarray(X2), jnp.ones(P, bool),
        jax.random.PRNGKey(1), jnp.asarray(uv1), jnp.asarray(uv2),
        ones, ones, eye, zero, eye, zero, CAM,
    )
    assert bool(res.ok)
    assert abs(float(res.s) - s) < 0.02
    np.testing.assert_allclose(res.R, R, atol=5e-3)
    inl = np.asarray(res.inlier)
    assert inl[out].sum() == 0


def test_pose_graph_closes_loop(rng):
    """A drifted circular chain + one exact loop edge: optimization must
    pull the end of the chain back onto the start."""
    K = 40
    # Ground-truth poses on a circle (world->kf i).
    Rt, tt = [], []
    for k in range(K):
        a = 2 * np.pi * k / K
        R = np.asarray(lie.so3_exp(jnp.asarray([0, 0, a], jnp.float32)))
        c = np.array([np.cos(a), np.sin(a), 0], np.float32) * 5
        Rt.append(R)
        tt.append(-R @ c)
    Rt = np.stack(Rt)
    tt = np.stack(tt)

    # Relative measurements (exact) consecutive; drifted initial states.
    s0 = np.ones(K, np.float32)
    Rd = Rt.copy()
    td = tt.copy()
    drift = np.asarray(lie.so3_exp(jnp.asarray([0, 0, 0.01], jnp.float32)))
    acc_R = np.eye(3, dtype=np.float32)
    acc_t = np.zeros(3, np.float32)
    for k in range(1, K):
        # apply accumulating drift to states
        acc_R = acc_R @ drift
        acc_t = acc_t + np.array([0.01, 0.005, 0], np.float32)
        Rd[k] = Rt[k] @ acc_R
        td[k] = tt[k] + acc_t

    ei = np.arange(K - 1)
    ej = np.arange(1, K)
    s_m, R_m, t_m = [], [], []
    for k in range(K - 1):
        # exact relative S_ij = T_i T_j^-1 from ground truth
        Rij = Rt[k] @ Rt[k + 1].T
        tij = tt[k] - Rij @ tt[k + 1]
        s_m.append(1.0)
        R_m.append(Rij)
        t_m.append(tij)
    # Loop edge (0, K-1), exact.
    ei = np.append(ei, 0)
    ej = np.append(ej, K - 1)
    Rij = Rt[0] @ Rt[K - 1].T
    tij = tt[0] - Rij @ tt[K - 1]
    s_m.append(1.0)
    R_m.append(Rij)
    t_m.append(tij)

    E = len(ei)
    fixed = np.zeros(K, bool)
    fixed[0] = True
    res = pose_graph.optimize_pose_graph(
        jnp.asarray(s0), jnp.asarray(Rd), jnp.asarray(td),
        jnp.ones(K, bool), jnp.asarray(fixed),
        jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
        jnp.asarray(np.array(s_m, np.float32)), jnp.asarray(np.stack(R_m)),
        jnp.asarray(np.stack(t_m)), jnp.ones(E, bool),
        jnp.ones(E, jnp.float32),
    )
    # End-of-chain error before/after.
    err_before = np.linalg.norm(td[K - 1] - tt[K - 1])
    err_after = np.linalg.norm(np.asarray(res.t[K - 1]) - tt[K - 1])
    assert err_after < 0.05 * err_before, (err_before, err_after)
    s_fin = np.asarray(res.s)
    assert np.all(np.abs(s_fin - 1.0) < 0.05)


def test_pose_graph_4dof_yaw_only(rng):
    """Inertial (4-DoF) essential graph (OptimizeEssentialGraph4DoF,
    /root/reference/src/Optimizer.cc:8520): yaw+translation drift on a
    circle is corrected, while every state's gravity direction
    (pitch/roll) is EXACTLY preserved — the defining invariant of the
    yaw-only parameterization."""
    K = 30
    g_w = np.array([0.0, 0.0, -9.81], np.float32)
    Rt, tt = [], []
    for k in range(K):
        a = 2 * np.pi * k / K
        # small static pitch so gravity is NOT trivially axis-aligned
        # with the state frames
        R = np.asarray(lie.so3_exp(jnp.asarray([0.12, 0, a], jnp.float32)))
        c = np.array([np.cos(a), np.sin(a), 0], np.float32) * 5
        Rt.append(R)
        tt.append(-R @ c)
    Rt, tt = np.stack(Rt), np.stack(tt)

    Rd, td = Rt.copy(), tt.copy()
    yaw_drift = np.asarray(lie.so3_exp(jnp.asarray([0, 0, 0.012],
                                                   jnp.float32)))
    acc_R, acc_t = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
    for k in range(1, K):
        acc_R = acc_R @ yaw_drift
        acc_t = acc_t + np.array([0.012, 0.006, 0], np.float32)
        Rd[k] = Rt[k] @ acc_R
        td[k] = tt[k] + acc_t

    ei = np.append(np.arange(K - 1), 0)
    ej = np.append(np.arange(1, K), K - 1)
    R_m = np.stack([Rt[i] @ Rt[j].T for i, j in zip(ei, ej)])
    t_m = np.stack([tt[i] - Rm @ tt[j]
                    for i, j, Rm in zip(ei, ej, R_m)])
    E = len(ei)
    fixed = np.zeros(K, bool)
    fixed[0] = True
    res = pose_graph.optimize_pose_graph(
        jnp.ones(K, jnp.float32), jnp.asarray(Rd), jnp.asarray(td),
        jnp.ones(K, bool), jnp.asarray(fixed),
        jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
        jnp.ones(E, jnp.float32), jnp.asarray(R_m), jnp.asarray(t_m),
        jnp.ones(E, bool), jnp.ones(E, jnp.float32),
        fix_scale=True, yaw_only=True, gravity_w=jnp.asarray(g_w),
    )
    err_before = np.linalg.norm(td[K - 1] - tt[K - 1])
    err_after = np.linalg.norm(np.asarray(res.t[K - 1]) - tt[K - 1])
    assert err_after < 0.1 * err_before, (err_before, err_after)
    # Gravity direction in every state frame is untouched (updates
    # rotate about a_k = R_k g, which fixes R_k g pointwise).
    g_before = Rd @ (g_w / np.linalg.norm(g_w))
    g_after = np.asarray(res.R) @ (g_w / np.linalg.norm(g_w))
    np.testing.assert_allclose(g_after, g_before, atol=2e-4)
    assert np.all(np.abs(np.asarray(res.s) - 1.0) < 1e-6)


def test_retrieval_scores(rng):
    Kmax, N = 16, 256
    kf_desc = jnp.asarray(rng.integers(0, 2**32, size=(Kmax, N, 8),
                                       dtype=np.uint32))
    kp_valid = jnp.ones((Kmax, N), bool)
    response = jnp.asarray(rng.uniform(21.0, 80.0, size=(Kmax, N)),
                           jnp.float32)
    db = retrieval.empty_db(Kmax)
    for k in range(4):
        db = retrieval.mark_keyframe(db, k, kf_desc[k], kp_valid[k],
                                     response[k])
    # Query with a noisy copy of KF2's descriptors (flip one bit each).
    noisy = np.asarray(kf_desc[2]).copy()
    noisy[:, 0] ^= 1
    scores = np.asarray(retrieval.score_db(
        db, jnp.asarray(noisy), jnp.ones(N, bool), response[2]))
    assert np.argmax(scores) == 2
    assert scores[2] > 0.9          # near-exact copies all match
    assert scores[np.r_[0, 1, 3]].max() < 0.2  # random descriptors do not
    assert scores[4:].max() == -1.0  # unregistered slots masked
    # Culling removes the keyframe from the index.
    db2 = retrieval.unmark_keyframe(db, 2)
    scores2 = np.asarray(retrieval.score_db(
        db2, jnp.asarray(noisy), jnp.ones(N, bool), response[2]))
    assert scores2[2] == -1.0


@pytest.fixture(scope="module")
def drifted_map():
    """A keyframe ring with sim3 drift injected into the second half —
    the canonical pre-loop-closure situation.

    Built to be geometrically faithful: map points are BACKPROJECTED
    KEYPOINTS (at ground-truth depth), deduplicated by position within
    each drift era, so reprojection against matched keypoints is
    subpixel-consistent; the revisiting keyframes create DRIFTED
    duplicate points exactly like a real drifting front-end would."""
    import jax
    from tpuslam.config import ORBConfig
    from tpuslam.datasets import synthetic
    from tpuslam.frontend import extractor
    from tpuslam.mapping import mapstate

    # Wide world + outward-looking ring: each view sees only a sector.
    world = synthetic.make_world(n_points=700, h=480, w=640, seed=0,
                                 extent=(36.0, 36.0, 8.0))
    # 28 keyframes, ring period 24: the last four revisit the first
    # sector so the detector's temporal consistency can accumulate.
    K, RING = 28, 24
    cfg = ORBConfig(n_features=512, n_levels=4)
    n_feat = sum(extractor.features_per_level(512, 4, 1.2))
    fx, fy, cx, cy = world.cam

    def drift_of(k):
        a = max(0, (k - K // 2)) / (K // 2)
        s = 1.0 + 0.04 * a
        R = np.asarray(lie.so3_exp(jnp.asarray([0, 0, 0.05 * a],
                                               jnp.float32)))
        t = np.array([0.3 * a, -0.2 * a, 0.1 * a], np.float32)
        return s, R, t

    ms = mapstate.empty(64, 4096, n_feat)
    mp_list = []      # world positions (drifted frame of their era)
    mp_desc = []
    mp_level = []
    poses = []
    for k in range(K):
        a = 2 * np.pi * k / RING
        eye = np.array([5.0 * np.cos(a), 5.0 * np.sin(a), 0.5])
        R, t = synthetic.look_at(eye, eye * 3.0)   # looking outward
        poses.append((R, t))
        img = synthetic.render(world, R, t)
        feats = extractor.extract(jnp.asarray(img), cfg)
        kp = np.asarray(feats.uv)
        kval = np.asarray(feats.valid)
        lvl = np.asarray(feats.level)
        desc = np.asarray(feats.desc)
        # True depth at each keypoint = depth of the landmark it sits on.
        uv, z, vis = synthetic.project(world, R, t)
        d = np.linalg.norm(kp[:, None] - uv[None], axis=-1)
        d[:, ~vis] = 1e9
        lm = np.argmin(d, axis=1)
        on_lm = (d[np.arange(len(kp)), lm] < 14) & kval

        # Drifted camera pose (rigid part) + scale-drifted depth.
        s_d, R_d, t_d = drift_of(k)
        Rk = (R @ R_d.T).astype(np.float32)
        tk = (t - Rk @ t_d).astype(np.float32)
        z_used = (z[lm] * s_d).astype(np.float32)

        # Backproject keypoints through the DRIFTED pose.
        bearing = np.stack([(kp[:, 0] - cx) / fx, (kp[:, 1] - cy) / fy,
                            np.ones(len(kp))], 1)
        Xc_pt = bearing * z_used[:, None]
        Xw = (Xc_pt - tk) @ Rk    # R^T (Xc - t)

        # Dedup against existing points (same-era corners coincide).
        assoc = np.full(n_feat, -1, np.int32)
        if mp_list:
            pool = np.stack(mp_list)
        else:
            pool = np.zeros((0, 3), np.float32)
        for i in np.nonzero(on_lm)[0]:
            if pool.shape[0]:
                dd = np.linalg.norm(pool - Xw[i], axis=1)
                j = int(np.argmin(dd))
                if dd[j] < 0.12:
                    assoc[i] = j
                    continue
            mp_list.append(Xw[i].astype(np.float32))
            mp_desc.append(desc[i])
            mp_level.append(lvl[i])
            pool = np.zeros((0, 3), np.float32)  # rebuilt next iter
            pool = np.stack(mp_list)
            assoc[i] = len(mp_list) - 1

        ms = mapstate.add_keyframe(ms, k, jnp.asarray(Rk), jnp.asarray(tk),
                                   feats, jnp.asarray(assoc))

    P = len(mp_list)
    assert P < 4096
    mp_pos = np.zeros((4096, 3), np.float32)
    mp_pos[:P] = np.stack(mp_list)
    descs = np.zeros((4096, 8), np.uint32)
    descs[:P] = np.stack(mp_desc)
    lvls = np.zeros((4096,), np.int32)
    lvls[:P] = np.asarray(mp_level)
    ms = ms._replace(
        mp_pos=jnp.asarray(mp_pos),
        mp_valid=jnp.asarray(np.arange(4096) < P),
        mp_desc=jnp.asarray(descs),
        mp_level=jnp.asarray(lvls),
    )
    return world, ms, poses, K


def test_loop_detect_verify_correct(drifted_map):
    from tpuslam.tracking import loop_closing

    world, ms, poses, K = drifted_map
    cam = jnp.asarray(world.cam)
    ls = loop_closing.LoopState.create(64)
    ls.min_gap = 8
    for k in range(K):
        loop_closing.on_new_keyframe(ls, ms, k)

    # Detection: feed the last keyframes (which revisit the start).
    kf_slots = list(range(K))
    cand = None
    for k in range(K - 4, K):
        cand = loop_closing.detect_loop(ls, ms, k, kf_slots) or cand
    assert cand is not None and cand <= 6, f"candidate {cand}"

    cur = K - 1
    ok, s, R, t = loop_closing.verify_loop(
        ms, cur, cand, cam, jax.random.PRNGKey(0), min_inliers=15)
    assert ok, "sim3 verification failed"
    # The injected drift inflates the late map's scale: the verified
    # sim3 (cur drifted cam -> loop cam) must shrink, and not wildly.
    assert 0.75 < float(s) < 0.995, float(s)

    err_before = float(jnp.linalg.norm(
        ms.kf_t[cur] - jnp.asarray(poses[cur][1])))
    ms2 = loop_closing.correct_loop(ls, ms, cur, cand, kf_slots, s, R, t)
    err_after = float(jnp.linalg.norm(
        ms2.kf_t[cur] - jnp.asarray(poses[cur][1])))
    assert err_after < 0.5 * err_before, (err_before, err_after)


def test_double_loop_with_culled_holes(drifted_map):
    """Two corrections in one session, over a chain with culled-KF
    holes: the first loop's Sim3 stays an active edge in the second
    graph (KeyFrame::AddLoopEdge accumulation, used at
    /root/reference/src/Optimizer.cc:2414), culled slots must neither
    anchor the chain nor break the +-1/+-2 adjacency (edges are built
    over the LIVE keyframe list, not slot arithmetic), and the second
    correction must still converge."""
    from tpuslam.mapping import mapstate
    from tpuslam.tracking import loop_closing

    world, ms, poses, K = drifted_map
    cam = jnp.asarray(world.cam)
    ls = loop_closing.LoopState.create(64)
    ls.min_gap = 8
    for k in range(K):
        loop_closing.on_new_keyframe(ls, ms, k)

    # Cull two mid-chain keyframes -> holes in the slot sequence.
    kf_slots = list(range(K))
    for c in (10, 17):
        ms = mapstate.cull_keyframe(ms, c)
        kf_slots.remove(c)
        ls.db = retrieval.unmark_keyframe(ls.db, c)

    # First loop: detect on the revisiting tail, verify, correct.
    cand = None
    for k in range(K - 4, K):
        cand = loop_closing.detect_loop(ls, ms, k, kf_slots) or cand
    assert cand is not None and cand <= 6
    cur = K - 1
    ok, s, R, t = loop_closing.verify_loop(
        ms, cur, cand, cam, jax.random.PRNGKey(0), min_inliers=15)
    assert ok
    ms = loop_closing.correct_loop(ls, ms, cur, cand, kf_slots, s, R, t)
    assert len(ls.loop_edges) == 1

    # Fresh rigid drift on the tail (tracking continued and drifted
    # again): world-side x' = R2 x + t2 on tail-only points, camera
    # poses move consistently (Tcw' = [R R2^T, t - R R2^T t2]).
    tail = kf_slots[-5:]
    R2 = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, 0.03],
                                            jnp.float32)))
    t2 = np.array([0.25, -0.15, 0.05], np.float32)
    obs = np.asarray(ms.kf_obs_mp)
    in_tail = np.zeros(ms.mp_capacity, bool)
    in_head = np.zeros(ms.mp_capacity, bool)
    for s_ in kf_slots:
        ids = obs[s_]
        ids = ids[ids >= 0]
        (in_tail if s_ in tail else in_head)[ids] = True
    only_tail = in_tail & ~in_head
    mp_pos = np.array(ms.mp_pos)
    mp_pos[only_tail] = mp_pos[only_tail] @ R2.T + t2
    kf_R = np.array(ms.kf_R)
    kf_t = np.array(ms.kf_t)
    for s_ in tail:
        Rk = kf_R[s_] @ R2.T
        kf_t[s_] = kf_t[s_] - Rk @ t2
        kf_R[s_] = Rk
    ms = ms._replace(mp_pos=jnp.asarray(mp_pos),
                     kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(kf_t))

    # Second loop closes from a different late keyframe against the
    # same early region (detection is cooldown-gated after a fresh
    # correction, so drive verify+correct directly — the machinery
    # under test is edge accumulation + re-correction).
    cur2 = kf_slots[-2]
    ok2, s2, R2v, t2v = loop_closing.verify_loop(
        ms, cur2, cand, cam, jax.random.PRNGKey(1), min_inliers=15)
    assert ok2, "second sim3 verification failed"
    err_before = float(jnp.linalg.norm(
        ms.kf_t[cur2] - jnp.asarray(poses[cur2][1])))
    ms2 = loop_closing.correct_loop(ls, ms, cur2, cand, kf_slots,
                                    s2, R2v, t2v)
    err_after = float(jnp.linalg.norm(
        ms2.kf_t[cur2] - jnp.asarray(poses[cur2][1])))
    assert len(ls.loop_edges) == 2
    assert err_after < 0.6 * err_before, (err_before, err_after)
    # Culled slots: never NaN, and their odometry edges were dropped
    # (edge_valid &= kf_valid) so the live chain converged around them.
    assert np.isfinite(np.asarray(ms2.kf_t)).all()
    live_err = [float(jnp.linalg.norm(ms2.kf_t[s_]
                                      - jnp.asarray(poses[s_][1])))
                for s_ in kf_slots]
    assert max(live_err) < 1.0, max(live_err)
