"""Full-map global BA: every live keyframe is optimizable (no horizon),
and the post-loop GBA runs as abortable background chunks.

Ref: GlobalBundleAdjustemnt over ALL keyframes+points
(/root/reference/src/Optimizer.cc:62), executed in a child thread with
mbAbortBA interruption (src/LoopClosing.cc:1440,
src/LocalMapping.cc:119)."""

import numpy as np
import pytest

from tpuslam.config import CameraConfig, ORBConfig, SLAMConfig
from tpuslam.datasets import synthetic
from tpuslam.tracking.tracker import MonoTracker


@pytest.fixture(scope="module")
def tracked_map():
    h, w = 480, 640
    world = synthetic.make_world(n_points=900, h=h, w=w, seed=0,
                                 extent=(30.0, 30.0, 9.0))
    poses = synthetic.ring_trajectory(170, arc=0.9 * np.pi)
    cfg = SLAMConfig(
        camera=CameraConfig(width=w, height=h, fx=float(world.cam[0]),
                            fy=float(world.cam[1]), cx=float(world.cam[2]),
                            cy=float(world.cam[3])),
        orb=ORBConfig(n_features=1024),
    )
    tracker = MonoTracker(cfg)
    for R, t in poses:
        out = tracker.process(synthetic.render(world, R, t))
    tracker.flush()
    assert tracker.state == "OK"
    assert len(tracker.kf_slots) >= 14, len(tracker.kf_slots)
    return world, poses, tracker


@pytest.mark.slow
def test_gba_moves_keyframes_beyond_any_window(tracked_map):
    """Perturb keyframes OLDER than the dense window, then run the
    (forcibly sharded) all-KF global BA: the old keyframes must move
    back toward their unperturbed poses — the r03 design capped the
    sharded problem at the last 256 KFs and could never touch older
    segments; now there is no horizon."""
    import jax.numpy as jnp

    from tpuslam.eval import ate

    _, _, tracker = tracked_map
    tracker.GBA_WINDOW = 8  # force the sharded all-KF path (instance attr)
    slots = list(tracker.kf_slots)
    n = len(slots)
    # Strictly beyond the dense window, excluding the two oldest KFs —
    # they are the gauge anchors and stay fixed by design.
    old = slots[2: n - 8]
    assert len(old) >= 4

    def centers(ms):
        return np.stack([-np.asarray(ms.kf_R[s]).T @ np.asarray(ms.kf_t[s])
                         for s in slots])

    c_before = centers(tracker.ms)
    before_t = {s: np.asarray(tracker.ms.kf_t[s]).copy() for s in slots}
    # Perturb the OLD keyframes' translations (5 cm in map units).
    rng = np.random.default_rng(0)
    kf_t = np.asarray(tracker.ms.kf_t).copy()
    noise = {}
    for s in old:
        noise[s] = rng.normal(0, 0.05, 3).astype(np.float32)
        kf_t[s] = kf_t[s] + noise[s]
    tracker.ms = tracker.ms._replace(kf_t=jnp.asarray(kf_t))
    tracker._invalidate_window()
    rmse_pert = ate.ate(c_before, centers(tracker.ms)).rmse_scaled

    tracker.run_global_ba(iters=20)

    moved = 0
    for s in old:
        after = np.asarray(tracker.ms.kf_t[s])
        if np.linalg.norm(after - (before_t[s] + noise[s])) > 1e-5:
            moved += 1
    assert moved == len(old), f"only {moved}/{len(old)} old KFs moved"
    # Recovery is measured GAUGE-INVARIANTLY (Horn-aligned): BA restores
    # the map's internal geometry; the perturbation's mean shift is a
    # gauge mode the two anchors only weakly pin (measured: 0.075 ->
    # 0.015 aligned rmse at 20 iters).
    rmse_after = ate.ate(c_before, centers(tracker.ms)).rmse_scaled
    assert rmse_after < 0.45 * rmse_pert, (
        f"aligned keyframe rmse {rmse_after:.4f} vs perturbed "
        f"{rmse_pert:.4f} — old segments not re-optimized")


@pytest.mark.slow
def test_gba_background_chunks_drain(tracked_map):
    """The post-loop GBA runs as background chunks: scheduling N
    iterations consumes GBA_CHUNK_ITERS per subsequent frame (the
    mbAbortBA child-thread semantics), never stalling one frame with
    the whole solve; flush() drains the remainder."""
    world, poses, tracker = tracked_map
    tracker._schedule_global_ba(iters=7, inertial=False)
    assert tracker._gba_left == 7
    lefts = []
    for R, t in poses[:3]:
        tracker.process(synthetic.render(world, R, t))
        lefts.append(tracker._gba_left)
    # Monotone decrease, at most GBA_CHUNK_ITERS per frame (a frame
    # that created a keyframe yields to the superstep and skips).
    prev = 7
    for left in lefts:
        assert prev - tracker.GBA_CHUNK_ITERS <= left <= prev
        prev = left
    assert lefts[-1] < 7, "no chunk ever ran"
    tracker.flush()
    assert tracker._gba_left == 0
