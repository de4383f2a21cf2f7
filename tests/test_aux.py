"""Auxiliary subsystems: profiling, viz dump, fault injection."""

import numpy as np

from tpuslam.datasets import faults, synthetic
from tpuslam.utils.profiling import StageTimer


def test_stage_timer():
    t = StageTimer()
    with t.stage("orb_extraction"):
        pass
    with t.stage("local_ba"):
        pass
    with t.stage("local_ba"):
        pass
    rep = t.report()
    assert rep["local_ba"]["calls"] == 2
    assert "orb_extraction" in t.summary()


def test_fault_injection_blackout():
    sched = faults.FaultSchedule.blackout(5, 3)
    img = np.random.default_rng(0).uniform(0, 255, (32, 32)).astype(
        np.float32)
    out = faults.apply_frame_fault(img, 6, sched)
    assert np.all(out == out.flat[0])         # constant frame
    same = faults.apply_frame_fault(img, 2, sched)
    np.testing.assert_array_equal(same, img)  # untouched outside schedule
    g = np.ones((10, 3)); a = np.ones((10, 3))
    _, _, mask = faults.apply_imu_fault(
        g, a, 1, faults.FaultSchedule(drop_imu_windows=frozenset([1])))
    assert not mask.any()


def test_viz_dump_and_plot(tmp_path):
    from tpuslam import viz
    from tpuslam.mapping import mapstate

    ms = mapstate.empty(8, 64, 16)
    ms = ms._replace(
        mp_valid=ms.mp_valid.at[:10].set(True),
        kf_valid=ms.kf_valid.at[:3].set(True),
    )
    traj = [np.concatenate([np.eye(3).reshape(-1),
                            np.array([0.1 * i, 0, 0])]) for i in range(5)]
    viz.dump_map(ms, tmp_path / "map.npz", traj)
    data = np.load(tmp_path / "map.npz")
    assert data["mp_pos"].shape == (10, 3)
    assert data["kf_R"].shape == (3, 3, 3)
    assert data["traj"].shape == (5, 3)
    viz.plot_map(ms, tmp_path / "map.png", traj)
    assert (tmp_path / "map.png").stat().st_size > 1000


def test_viz_frame_overlay_and_covis(tmp_path):
    """FrameDrawer/MapDrawer analogs: tracked-feature overlay render +
    covisibility-graph export (VERDICT r04 task 6)."""
    import jax.numpy as jnp

    from tpuslam import viz
    from tpuslam.mapping import mapstate

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    uv = rng.uniform([5, 5], [155, 115], (32, 2)).astype(np.float32)
    valid = np.ones(32, bool)
    assoc = np.where(np.arange(32) < 12, np.arange(32), -1)
    canvas = viz.frame_overlay(img, uv, valid, assoc)
    assert canvas.shape == (120, 160, 3)
    # Tracked keypoints leave green box pixels; untracked leave blue.
    assert (canvas[..., 1] == 220).any() and (canvas[..., 2] == 255).any()
    viz.save_frame_overlay(tmp_path / "f.png", img, uv, valid, assoc,
                           state="OK")
    assert (tmp_path / "f.png").stat().st_size > 1000

    # Covis graph: two KFs observing the same points are connected.
    ms = mapstate.empty(8, 64, 16)
    obs = jnp.arange(16, dtype=jnp.int32)
    ms = ms._replace(
        mp_valid=ms.mp_valid.at[:16].set(True),
        kf_valid=ms.kf_valid.at[:2].set(True),
        kf_kp_valid=ms.kf_kp_valid.at[:2].set(True),
        kf_obs_mp=ms.kf_obs_mp.at[0].set(obs).at[1].set(obs),
    )
    centers, slots, edges, weights = viz.covis_graph(ms, min_weight=15)
    assert len(slots) == 2 and len(edges) == 1 and weights[0] >= 15
    viz.plot_covis_graph(ms, tmp_path / "covis.png")
    assert (tmp_path / "covis.png").stat().st_size > 1000


def test_keyframe_pool_growth():
    """A full keyframe pool doubles (up to max_keyframes_cap) instead of
    silently refusing keyframes — the retrieval index grows with it and
    tracking continues across the growth (VERDICT r04 task 8)."""
    from tpuslam.config import (CameraConfig, MapConfig, ORBConfig,
                                SLAMConfig)
    from tpuslam.tracking.tracker import MonoTracker

    h, w = 480, 640
    world = synthetic.make_world(n_points=1400, h=h, w=w, seed=0,
                                 extent=(36.0, 36.0, 10.0))
    poses = synthetic.ring_trajectory(150, arc=0.7 * np.pi)
    cfg = SLAMConfig(
        camera=CameraConfig(width=w, height=h, fx=float(world.cam[0]),
                            fy=float(world.cam[1]), cx=float(world.cam[2]),
                            cy=float(world.cam[3])),
        orb=ORBConfig(n_features=512),
        map=MapConfig(max_keyframes=16, max_keyframes_cap=64),
    )
    tr = MonoTracker(cfg)
    states = []
    for R, t in poses:
        states.append(tr.process(synthetic.render(world, R, t)).state)
    tr.flush()
    assert tr.ms.kf_capacity > 16, "pool never grew"
    assert tr.loop.db.bits.shape[0] == tr.ms.kf_capacity
    assert len(tr.kf_slots) > 16
    n_ok = sum(s == "OK" for s in states)
    assert n_ok >= len(poses) - 15, f"{n_ok}/{len(poses)} OK"


def test_tracker_records_stage_times():
    from tpuslam.config import CameraConfig, ORBConfig, SLAMConfig
    from tpuslam.tracking.tracker import MonoTracker

    h, w = 480, 640
    world = synthetic.make_world(n_points=300, h=h, w=w, seed=0)
    poses = synthetic.orbit_trajectory(12, arc=0.12 * np.pi)
    cfg = SLAMConfig(
        camera=CameraConfig(width=w, height=h, fx=float(world.cam[0]),
                            fy=float(world.cam[1]), cx=float(world.cam[2]),
                            cy=float(world.cam[3])),
        orb=ORBConfig(n_features=512),
    )
    tr = MonoTracker(cfg)
    for R, t in poses:
        tr.process(synthetic.render(world, R, t))
    rep = tr.timer.report()
    # Pre-init frames run the sync path (orb_extraction stage); once OK
    # the pipelined path takes over (frame_dispatch + retire_fetch per
    # frame, the whole frame fused into one dispatch).
    n_ext = rep.get("orb_extraction", {}).get("calls", 0)
    n_pipe = rep.get("frame_dispatch", {}).get("calls", 0)
    assert n_ext + n_pipe == len(poses)
    if tr.state == "OK":
        assert "retire_fetch" in rep or "local_map_track" in rep


def test_timestamp_jump_guards():
    """Stream-corruption guards (src/Tracking.cc:1584-1629): a backwards
    timestamp abandons the active map and restarts; a >1 s forward gap
    does the same for inertial sessions (the preintegration chain is
    unrecoverable)."""
    from tpuslam.config import CameraConfig, ORBConfig, SLAMConfig
    from tpuslam.tracking.tracker import MonoTracker

    h, w = 480, 640
    world = synthetic.make_world(n_points=500, h=h, w=w, seed=0)
    poses = synthetic.orbit_trajectory(20, arc=0.2 * np.pi)
    cfg = SLAMConfig(
        camera=CameraConfig(width=w, height=h, fx=float(world.cam[0]),
                            fy=float(world.cam[1]), cx=float(world.cam[2]),
                            cy=float(world.cam[3])),
        orb=ORBConfig(n_features=512),
    )
    tr = MonoTracker(cfg)
    for i, (R, t) in enumerate(poses):
        tr.process(synthetic.render(world, R, t), ts=i / 20.0)
    assert tr.state == "OK"
    # Backwards timestamp: the map is abandoned before the frame runs.
    R, t = poses[-1]
    tr.process(synthetic.render(world, R, t), ts=0.1)
    assert tr.state in ("NOT_INITIALIZED", "OK")
    assert len(tr.kf_slots) <= 2, "active map survived a backwards ts"
