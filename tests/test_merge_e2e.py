"""Atlas multi-map merge, end to end.

The VERDICT-1 done-criterion for merging: lose tracking mid-run
(blackout), let the Atlas archive the map and start a fresh one,
revisit mapped space, and the tracker itself must detect the overlap
(cross-map place recognition), verify a Sim3, weld the maps and leave
ONE consistent trajectory whose ATE is evaluated over the whole run —
the reference's LoopClosing::MergeLocal flow
(/root/reference/src/LoopClosing.cc:430-443 detection, :1450 weld).

Expensive integration gate (~10 min CPU); unit invariants live in
test_merge.py.
"""

import numpy as np
import pytest

from tpuslam.config import CameraConfig, ORBConfig, SLAMConfig
from tpuslam.datasets import faults, synthetic
from tpuslam.eval import ate
from tpuslam.tracking.tracker import MonoTracker


@pytest.fixture(scope="module")
def blackout_ring_run():
    h, w = 480, 640
    world = synthetic.make_world(n_points=1400, h=h, w=w, seed=0,
                                 extent=(36.0, 36.0, 10.0))
    poses = synthetic.ring_trajectory(600, arc=2.4 * np.pi)
    cfg = SLAMConfig(
        camera=CameraConfig(width=w, height=h, fx=float(world.cam[0]),
                            fy=float(world.cam[1]), cx=float(world.cam[2]),
                            cy=float(world.cam[3])),
        orb=ORBConfig(n_features=1024),
    )
    tracker = MonoTracker(cfg)
    # 28 blank frames > lost_patience: forces CreateMapInAtlas mid-run.
    sched = faults.FaultSchedule.blackout(200, 28)
    states = []
    for i, (R, t) in enumerate(poses):
        img = faults.apply_frame_fault(synthetic.render(world, R, t), i,
                                       sched)
        states.append(tracker.process(img).state)
    gt = np.stack([-R.T @ t for R, t in poses])
    return tracker, states, gt


@pytest.mark.slow
def test_merge_fires_and_rejoins(blackout_ring_run):
    tracker, states, gt = blackout_ring_run
    assert tracker.n_merges >= 1, "revisit never merged the archived map"
    assert tracker.atlas.n_maps == 0, "archived map still un-merged"


@pytest.mark.slow
def test_merged_trajectory_single_world(blackout_ring_run):
    """After the weld, frames from BOTH map sessions live in one world:
    whole-run scale-aligned ATE must be reference-grade (~1.5% of the
    ~38 m path) — impossible if the two sessions stayed in different
    frames/scales."""
    tracker, states, gt = blackout_ring_run
    ok = np.array([s == "OK" for s in states])
    assert ok.sum() >= 540, f"only {int(ok.sum())}/600 frames tracked"
    est = np.stack(tracker.positions())
    res = ate.ate(gt[ok], est[ok])
    assert res.rmse_scaled < 0.8, f"ATE {res.rmse_scaled:.3f} m"
