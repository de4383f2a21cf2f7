"""Multi-map merging: weld/fuse unit tests + blackout-ring integration.

The reference's headline Atlas capability (LoopClosing::MergeLocal,
/root/reference/src/LoopClosing.cc:1450): after tracking loss the
archived map must be re-joinable once the camera revisits mapped space.
The integration gate lives in test_merge_e2e.py (expensive); these are
the cheap invariants of the welding math.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.geometry import lie
from tpuslam.mapping import mapstate, merge


def _mini_map(n_kf, n_mp, n_feat=8, seed=0, kf_cap=16, mp_cap=64):
    rng = np.random.default_rng(seed)
    ms = mapstate.empty(kf_cap, mp_cap, n_feat)
    kf_R = np.stack([np.asarray(lie.so3_exp(jnp.asarray(
        rng.normal(size=3) * 0.2, jnp.float32))) for _ in range(n_kf)])
    kf_t = rng.normal(size=(n_kf, 3)).astype(np.float32)
    mp = rng.uniform(-2, 2, size=(n_mp, 3)).astype(np.float32)
    desc = rng.integers(0, 2**31, size=(n_mp, 8)).astype(np.uint32)
    ms = ms._replace(
        kf_R=ms.kf_R.at[:n_kf].set(jnp.asarray(kf_R)),
        kf_t=ms.kf_t.at[:n_kf].set(jnp.asarray(kf_t)),
        kf_valid=ms.kf_valid.at[:n_kf].set(True),
        kf_obs_mp=ms.kf_obs_mp.at[:n_kf, :n_feat].set(
            jnp.arange(n_feat, dtype=jnp.int32)),
        kf_kp_valid=ms.kf_kp_valid.at[:n_kf].set(True),
        mp_pos=ms.mp_pos.at[:n_mp].set(jnp.asarray(mp)),
        mp_valid=ms.mp_valid.at[:n_mp].set(True),
        mp_desc=ms.mp_desc.at[:n_mp].set(jnp.asarray(desc)),
        mp_dist_max=ms.mp_dist_max.at[:n_mp].set(5.0),
        mp_dist_min=ms.mp_dist_min.at[:n_mp].set(0.5),
    )
    return ms


def test_weld_transforms_src_into_dst():
    """Welded keyframes must view the Sim3-transformed points exactly as
    they viewed the originals (up to the uniform scale s)."""
    dst = _mini_map(3, 10, seed=1)
    src = _mini_map(4, 12, seed=2)
    s = 1.7
    R = np.asarray(lie.so3_exp(jnp.asarray([0.3, -0.2, 0.5], jnp.float32)))
    t = np.array([1.0, -2.0, 0.5], np.float32)

    kf_map = np.full((dst.kf_capacity,), -1, np.int32)
    mp_map = np.full((dst.mp_capacity,), -1, np.int32)
    kf_map[:4] = [5, 6, 7, 8]
    mp_map[:12] = np.arange(20, 32)
    ms = merge.weld(dst, src, jnp.asarray(kf_map), jnp.asarray(mp_map),
                    jnp.float32(s), jnp.asarray(R), jnp.asarray(t))

    # Points moved by the world Sim3.
    got = np.asarray(ms.mp_pos[20:32])
    want = s * np.asarray(src.mp_pos[:12]) @ R.T + t
    np.testing.assert_allclose(got, want, atol=1e-4)
    # Dst entities untouched.
    np.testing.assert_allclose(np.asarray(ms.mp_pos[:10]),
                               np.asarray(dst.mp_pos[:10]))
    assert bool(jnp.all(ms.kf_valid[5:9]))
    # Camera-frame coordinates of transformed points = s * original
    # (the Sim3 camera recovery, LoopClosing.cc:1253).
    for k in range(4):
        Xc_old = (np.asarray(src.mp_pos[:12]) @ np.asarray(src.kf_R[k]).T
                  + np.asarray(src.kf_t[k]))
        Xc_new = got @ np.asarray(ms.kf_R[5 + k]).T + np.asarray(
            ms.kf_t[5 + k])
        np.testing.assert_allclose(Xc_new, s * Xc_old, atol=1e-3)
    # Observation ids rewired through mp_map.
    np.testing.assert_array_equal(
        np.asarray(ms.kf_obs_mp[5, :8]), np.arange(20, 28))


def test_fuse_duplicate_points_rewires_and_counts():
    ms = _mini_map(2, 8, seed=3)
    # Make points 10..13 near-duplicates of 0..3 (same desc, close pos),
    # flagged as the newly-welded group.
    dup = jnp.arange(4)
    ms = ms._replace(
        mp_pos=ms.mp_pos.at[10:14].set(ms.mp_pos[dup] + 0.01),
        mp_desc=ms.mp_desc.at[10:14].set(ms.mp_desc[dup]),
        mp_valid=ms.mp_valid.at[10:14].set(True),
        mp_visible=ms.mp_visible.at[10:14].set(7),
        mp_dist_max=ms.mp_dist_max.at[10:14].set(5.0),
        # keyframe 1 observes the duplicates
        kf_obs_mp=ms.kf_obs_mp.at[1, :4].set(jnp.arange(10, 14)),
    )
    new_mask = jnp.zeros((ms.mp_capacity,), bool).at[10:14].set(True)
    old_mask = jnp.zeros((ms.mp_capacity,), bool).at[:8].set(True)
    out, n_fused = merge.fuse_duplicate_points(ms, new_mask, old_mask)
    assert int(n_fused) == 4
    # Duplicates invalidated, observations rewired to the originals.
    assert not bool(jnp.any(out.mp_valid[10:14]))
    np.testing.assert_array_equal(np.asarray(out.kf_obs_mp[1, :4]),
                                  np.arange(4))
    # Replacement inherits the duplicate's visibility counters.
    np.testing.assert_array_equal(np.asarray(out.mp_visible[:4]),
                                  np.asarray(ms.mp_visible[:4]) + 7)


def test_world_sim3_roundtrip():
    """world_sim3_from_kf_pair must reproduce the camera-frame relation
    it was derived from: welding with it makes cand's view of src points
    equal s * (cur's view)."""
    dst = _mini_map(3, 10, seed=4)
    src = _mini_map(3, 10, seed=5)
    s = 0.8
    R = np.asarray(lie.so3_exp(jnp.asarray([0.1, 0.4, -0.2], jnp.float32)))
    t = np.array([0.5, 0.25, -1.0], np.float32)
    w = merge.world_sim3_from_kf_pair(dst, 1, src, 2, s, R, t)
    X = np.asarray(src.mp_pos[:10])
    X_cur = X @ np.asarray(src.kf_R[2]).T + np.asarray(src.kf_t[2])
    Xw_dst = float(w.s) * X @ w.R.T + w.t
    X_cand = Xw_dst @ np.asarray(dst.kf_R[1]).T + np.asarray(dst.kf_t[1])
    np.testing.assert_allclose(X_cand, s * X_cur @ R.T + t, atol=1e-4)


def test_plan_slot_maps_capacity():
    dst = _mini_map(14, 60, kf_cap=16, mp_cap=64)   # nearly full
    src = _mini_map(4, 12, kf_cap=16, mp_cap=64)
    assert merge.plan_slot_maps(dst, src, list(range(4))) is None
    dst2 = _mini_map(3, 10, kf_cap=16, mp_cap=64)
    plan = merge.plan_slot_maps(dst2, src, list(range(4)))
    assert plan is not None
    kf_map, mp_map, kf_remap = plan
    tgt = kf_map[kf_map >= 0]
    assert len(set(tgt.tolist())) == 4          # distinct free slots
    assert not np.any(np.asarray(dst2.kf_valid)[tgt])
    assert set(kf_remap) == {0, 1, 2, 3}
