"""Long-trajectory survival + tracker-triggered loop closure.

The reference's flagship online behavior (LoopClosing::Run,
/root/reference/src/LoopClosing.cc:56-279) exercised end-to-end: a
600-frame closed circuit on the outward-looking ring world must track
to the end on ONE map, fire at least one loop closure from inside
MonoTracker (detection -> Sim3 verification -> essential-graph
correction -> GBA), and land scale-aligned ATE at reference-grade
accuracy (~1% of the ~35 m path).

This is the expensive integration gate (~6 min CPU); the cheap unit
gates live in test_loop.py.
"""

import numpy as np
import pytest

from tpuslam.config import CameraConfig, ORBConfig, SLAMConfig
from tpuslam.datasets import synthetic
from tpuslam.eval import ate
from tpuslam.tracking.tracker import MonoTracker


@pytest.fixture(scope="module")
def ring_run():
    h, w = 480, 640
    world = synthetic.make_world(n_points=1400, h=h, w=w, seed=0,
                                 extent=(36.0, 36.0, 10.0))
    poses = synthetic.ring_trajectory(600, arc=2.25 * np.pi)
    cfg = SLAMConfig(
        camera=CameraConfig(width=w, height=h, fx=float(world.cam[0]),
                            fy=float(world.cam[1]), cx=float(world.cam[2]),
                            cy=float(world.cam[3])),
        orb=ORBConfig(n_features=1024),
    )
    tracker = MonoTracker(cfg)
    # Force the post-loop GBA through the landmark-sharded ALL-keyframe
    # path (instance attr; the ~50-KF map would otherwise take the dense
    # branch) — the flagship e2e then exercises the no-horizon global BA
    # + background chunking in the real loop-closure flow.
    tracker.GBA_WINDOW = 24
    states = []
    for R, t in poses:
        out = tracker.process(synthetic.render(world, R, t))
        states.append(out.state)
    tracker.flush()
    gt = np.stack([-R.T @ t for R, t in poses])
    return tracker, states, gt


def test_survives_600_frames_one_map(ring_run):
    tracker, states, gt = ring_run
    n_ok = sum(s == "OK" for s in states)
    assert n_ok >= 580, f"only {n_ok}/600 frames tracked OK"
    # One continuous map: no Atlas loss-recovery reset happened.
    assert tracker.atlas.n_maps == 0
    assert len(tracker.kf_slots) >= 40


def test_loop_closes_from_tracker(ring_run):
    tracker, states, gt = ring_run
    assert tracker.n_loops_closed >= 1, "no tracker-triggered loop closure"


def test_ate_reference_grade(ring_run):
    tracker, states, gt = ring_run
    est = tracker.positions()
    res = ate.ate(gt[5:], est[5:])
    # Path length ~35 m (radius-5 ring, 2.25 pi): gate at 1.5%.
    assert res.rmse_scaled < 0.52, f"ATE {res.rmse_scaled:.3f} m"


def test_keyframe_trajectory_corrected(ring_run):
    """Keyframe poses ARE retro-corrected by the pose graph: their ATE
    must be at least as good as the (never-corrected) frame trajectory."""
    tracker, states, gt = ring_run
    # Keyframe camera centers vs the same-scale GT via Horn.
    ms = tracker.ms
    centers = []
    for s in tracker.kf_slots:
        R = np.asarray(ms.kf_R[s])
        t = np.asarray(ms.kf_t[s])
        centers.append(-R.T @ t)
    centers = np.stack(centers)
    span = np.ptp(centers[:, :2])
    # The accepted loop edge's endpoints genuinely view the same place:
    # after correction their estimated camera centers must be close
    # (before correction they were ~the accumulated drift apart). Culled
    # slots keep their last pose, so reading ms directly is safe.
    assert tracker.loop.loop_edges, "no recorded loop edge"
    cand, cur = tracker.loop.loop_edges[0][:2]

    def center(slot):
        R = np.asarray(ms.kf_R[slot])
        t = np.asarray(ms.kf_t[slot])
        return -R.T @ t

    d_close = np.linalg.norm(center(cur) - center(cand))
    assert d_close < 0.15 * span, (d_close, span)
