"""End-to-end monocular SLAM on the synthetic world with exact ground
truth — the integration gate (SURVEY.md section 4: dataset-driven runs +
ATE metric are the reference's only verification; the synthetic world
gives it exact expectations)."""

import numpy as np
import pytest

from tpuslam.config import CameraConfig, ORBConfig, SLAMConfig
from tpuslam.datasets import synthetic
from tpuslam.eval import ate
from tpuslam.tracking.tracker import MonoTracker


@pytest.fixture(scope="module")
def run_result():
    h, w = 480, 640
    world = synthetic.make_world(n_points=400, h=h, w=w, seed=0)
    poses = synthetic.orbit_trajectory(80)
    cfg = SLAMConfig(
        camera=CameraConfig(width=w, height=h, fx=float(world.cam[0]),
                            fy=float(world.cam[1]), cx=float(world.cam[2]),
                            cy=float(world.cam[3])),
        orb=ORBConfig(n_features=1024),
    )
    tracker = MonoTracker(cfg)
    states = []
    for R, t in poses:
        out = tracker.process(synthetic.render(world, R, t))
        states.append(out.state)
    gt = np.stack([-R.T @ t for R, t in poses])
    return tracker, states, gt


def test_initializes_and_tracks(run_result):
    tracker, states, gt = run_result
    n_ok = sum(s == "OK" for s in states)
    assert n_ok >= 75, f"only {n_ok}/80 frames tracked OK ({states[:10]}...)"
    assert tracker.stats["kf"] >= 8
    assert int(tracker.ms.mp_valid.sum()) > 300


def test_ate_within_bound(run_result):
    tracker, states, gt = run_result
    est = tracker.positions()
    res = ate.ate(gt[2:], est[2:])
    # Trajectory arc length ~16 m; gate at 1.5% (measured 0.176 m with
    # covisibility windows + map-point hygiene; reference-quality <1%).
    assert res.rmse_scaled < 0.24, f"ATE {res.rmse_scaled:.3f} m"


def test_trajectory_has_motion(run_result):
    tracker, states, gt = run_result
    est = tracker.positions()
    # Sanity: the estimate isn't static/degenerate.
    assert np.linalg.norm(est[-1] - est[2]) > 0.1


def test_ate_metric_self_consistency():
    """ATE of a noiselessly transformed trajectory is ~0."""
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(50, 3))
    from tpuslam.geometry import lie
    import jax.numpy as jnp
    R = np.asarray(lie.so3_exp(jnp.asarray([0.3, -0.2, 0.5], jnp.float32)))
    est = 0.37 * (gt @ R.T) + np.array([1.0, -2.0, 3.0])
    res = ate.ate(gt, est)
    assert res.rmse_scaled < 1e-5
    assert abs(res.scale - 1 / 0.37) < 1e-3


def test_relocalization_after_blackout():
    """Feed blank frames mid-run (tracking lost), then real frames again:
    the tracker must relocalize against the keyframe database
    (Tracking::Relocalization analog)."""
    h, w = 480, 640
    world = synthetic.make_world(n_points=400, h=h, w=w, seed=0)
    poses = synthetic.orbit_trajectory(40)
    cfg = SLAMConfig(
        camera=CameraConfig(width=w, height=h, fx=float(world.cam[0]),
                            fy=float(world.cam[1]), cx=float(world.cam[2]),
                            cy=float(world.cam[3])),
        orb=ORBConfig(n_features=1024),
    )
    tracker = MonoTracker(cfg)
    pre_centers = {}
    for i, (R, t) in enumerate(poses[:30]):
        out = tracker.process(synthetic.render(world, R, t))
        pre_centers[i] = -out.R.T @ out.t
    assert tracker.state == "OK"
    blank = np.full((h, w), 60.0, np.float32)
    # Loss discovery is pipeline_depth frames latent (the fetch of a
    # frame's inlier count is deferred while later frames dispatch) —
    # feed enough blanks for two consecutive misses to RETIRE.
    for _ in range(3 + tracker.cfg.tracking.pipeline_depth):
        out = tracker.process(blank)
    assert tracker.state == "LOST"
    # Re-show a view close to an earlier one: must relocalize.
    recovered_at = None
    for j, (R, t) in enumerate(poses[24:30]):
        out = tracker.process(synthetic.render(world, R, t))
        if out.state == "OK":
            recovered_at = 24 + j
            break
    assert recovered_at is not None, "did not relocalize after blackout"
    # The recovered pose must AGREE with the pre-blackout estimate of
    # the SAME frame — same map, same (arbitrary) scale, so the two
    # camera centers are directly comparable; gate at a fraction of the
    # pre-blackout trajectory's spread (no blind isfinite-only check).
    est_c = -out.R.T @ out.t
    pre_c = pre_centers[recovered_at]
    spread = np.ptp(np.stack(list(pre_centers.values())), axis=0).max()
    err = np.linalg.norm(est_c - pre_c)
    assert err < 0.15 * spread, (
        f"relocalized {err:.3f} from the pre-blackout estimate "
        f"(trajectory spread {spread:.3f})")


def test_boosted_init_extractor():
    """Monocular initialization runs the n_init_features_mult-boosted
    extractor (ref mpIniORBextractor at 5x, src/Tracking.cc:838-844) and
    compresses the two init keyframes back to the static pool budget,
    triangulated keypoints first: the boosted session must initialize
    and seed MORE initial structure than the unboosted one on the same
    frames, with pool shapes untouched."""
    h, w = 480, 640
    world = synthetic.make_world(n_points=400, h=h, w=w, seed=0)
    poses = synthetic.orbit_trajectory(8, arc=0.08 * np.pi)

    def run(mult):
        cfg = SLAMConfig(
            camera=CameraConfig(width=w, height=h, fx=float(world.cam[0]),
                                fy=float(world.cam[1]),
                                cx=float(world.cam[2]),
                                cy=float(world.cam[3])),
            orb=ORBConfig(n_features=1024, n_init_features_mult=mult),
        )
        tr = MonoTracker(cfg)
        for R, t in poses:
            tr.process(synthetic.render(world, R, t))
        tr.flush()
        return tr

    tr1 = run(1)
    tr2 = run(2)
    assert tr2.state == "OK"
    # Pool shapes stay at the base budget (static-shape promise).
    assert tr2.ms.kf_uv.shape[1] == tr2.n_feat == tr1.n_feat
    # The boosted candidate pool seeds a denser initial map.
    assert tr2.n_mp > tr1.n_mp, (tr1.n_mp, tr2.n_mp)
