"""System facade, checkpoint/resume, Atlas recovery, EuRoC loader."""

import numpy as np
import pytest

from tpuslam.config import CameraConfig, ORBConfig, SLAMConfig
from tpuslam.datasets import euroc, synthetic
from tpuslam.system import System


@pytest.fixture(scope="module")
def small_setup():
    h, w = 480, 640
    world = synthetic.make_world(n_points=400, h=h, w=w, seed=0)
    # Same angular rate as the 80-frame/0.8pi e2e runs.
    poses = synthetic.orbit_trajectory(36, arc=0.36 * np.pi)
    cfg = SLAMConfig(
        camera=CameraConfig(width=w, height=h, fx=float(world.cam[0]),
                            fy=float(world.cam[1]), cx=float(world.cam[2]),
                            cy=float(world.cam[3])),
        orb=ORBConfig(n_features=1024),
    )
    return world, poses, cfg


def test_system_tracks_and_saves_trajectory(small_setup, tmp_path_factory):
    world, poses, cfg = small_setup
    sysm = System(cfg)
    for i, (R, t) in enumerate(poses):
        sysm.track_monocular(synthetic.render(world, R, t), timestamp=i / 20.0)
    assert sysm.tracking_state() == "OK"
    stats = sysm.map_stats()
    assert stats["keyframes"] >= 4 and stats["map_points"] > 200

    tmp = tmp_path_factory.mktemp("traj")
    sysm.save_trajectory(tmp / "traj.txt")
    lines = (tmp / "traj.txt").read_text().strip().splitlines()
    assert len(lines) == len(poses)
    vals = np.asarray([[float(v) for v in ln.split()] for ln in lines])
    assert vals.shape[1] == 8  # t xyz qxyzw
    # Quaternions normalized.
    qn = np.linalg.norm(vals[:, 4:8], axis=1)
    np.testing.assert_allclose(qn[2:], 1.0, atol=1e-3)

    sysm.save_keyframe_trajectory(tmp / "kf.txt")
    assert len((tmp / "kf.txt").read_text().splitlines()) == stats["keyframes"]


def test_atlas_checkpoint_roundtrip(small_setup, tmp_path_factory):
    world, poses, cfg = small_setup
    sysm = System(cfg)
    for i, (R, t) in enumerate(poses[:24]):
        sysm.track_monocular(synthetic.render(world, R, t), timestamp=i / 20.0)
    stats = sysm.map_stats()
    tmp = tmp_path_factory.mktemp("atlas")
    sysm.save_atlas(tmp / "atlas.npz")

    # Fresh session, load, relocalize on a seen view.
    sys2 = System(cfg)
    sys2.load_atlas(tmp / "atlas.npz")
    assert sys2.map_stats() == stats
    assert sys2.tracking_state() == "LOST"
    recovered = False
    for R, t in poses[18:24]:
        out = sys2.track_monocular(synthetic.render(world, R, t))
        if out.state == "OK":
            recovered = True
            break
    assert recovered, "no relocalization after atlas load"


def test_localization_mode_freezes_map(small_setup):
    world, poses, cfg = small_setup
    sysm = System(cfg)
    for i, (R, t) in enumerate(poses[:24]):
        sysm.track_monocular(synthetic.render(world, R, t))
    kf_before = sysm.map_stats()["keyframes"]
    sysm.activate_localization_mode()
    for R, t in poses[24:]:
        sysm.track_monocular(synthetic.render(world, R, t))
    assert sysm.map_stats()["keyframes"] == kf_before


def test_atlas_new_map_on_prolonged_loss(small_setup):
    world, poses, cfg = small_setup
    sysm = System(cfg)
    # Half the shared fixture's angular rate: this test's subject is the
    # ATLAS ARCHIVAL state machine, not tracking robustness — the shared
    # 1.8 deg/frame sequence runs at ~15 tracked inliers (the knife edge
    # the blackout/loss tests probe deliberately) and XLA:CPU scatter
    # reorders float adds run-to-run, so survival to frame 24 flaked.
    poses = synthetic.orbit_trajectory(24, arc=0.12 * np.pi)
    for R, t in poses:
        sysm.track_monocular(synthetic.render(world, R, t))
    tr = sysm.tracker
    tr.flush()
    assert tr.state == "OK"
    n_kf_old = tr.n_kf
    # Slow test sequence earns few keyframes; lower the keep threshold
    # so the archive (CreateMapInAtlas) path is exercised.
    tr.atlas.min_keyframes_to_keep = min(3, n_kf_old)
    blank = np.full((world.h, world.w), 60.0, np.float32)
    for _ in range(tr.lost_patience + 3):
        sysm.track_monocular(blank)
    # Old map archived, fresh map started.
    assert tr.atlas.n_maps == 1
    assert tr.atlas.maps[0].n_kf == n_kf_old
    assert tr.state == "NOT_INITIALIZED"
    assert tr.n_kf == 0


def test_euroc_loader_roundtrip(small_setup, tmp_path_factory):
    """Mini EuRoC-layout dataset from synthetic renders -> loader ->
    full run_sequence with ATE against written ground truth."""
    world, poses, cfg = small_setup
    tmp = tmp_path_factory.mktemp("euroc") / "seq"
    n = 24
    imgs = [synthetic.render(world, R, t) for R, t in poses[:n]]
    ts = [i / 20.0 + 1.0 for i in range(n)]
    gt = np.stack([-R.T @ t for R, t in poses[:n]])
    euroc.write_mini_sequence(tmp, imgs, ts, gt=gt)

    seq = euroc.EuRoCSequence(tmp)
    assert len(seq) == n
    img0 = seq.image(0)
    assert img0.shape == (world.h, world.w)
    np.testing.assert_allclose(img0, np.round(imgs[0]), atol=1.0)

    sysm, res = euroc.run_sequence(seq, cfg=cfg)
    assert sysm.tracking_state() == "OK"
    assert res is not None
    assert res.rmse_scaled < 0.5, res.rmse_scaled


def test_euroc_imu_driver_roundtrip(tmp_path_factory):
    """Mini EuRoC-layout dataset WITH IMU csv -> run_sequence routes the
    IMU windows through track_monocular_inertial (the
    mono_inertial_euroc.cc analog — r03 left imu_between unused), and
    the exported keyframe trajectory parses as TUM format with real
    frame timestamps (SaveKeyFrameTrajectoryEuRoC, System.cc:746)."""
    h, w = 480, 640
    n = 30
    fps, freq = 20.0, 200.0
    world = synthetic.make_world(n_points=500, h=h, w=w, seed=0)
    sim = synthetic.simulate_imu(n, fps=fps, imu_freq=freq,
                                 arc=0.4 * np.pi)
    t0 = 1403636579.0  # EuRoC-style epoch timestamps
    ts = [t0 + i / fps for i in range(n)]
    imgs = [synthetic.render(world, R, t) for R, t in sim["poses"]]
    # Flatten the per-interval IMU blocks into one stream.
    S = int(freq / fps)
    imu_t, imu_g, imu_a = [], [], []
    for i in range(n - 1):
        for k in range(S):
            imu_t.append(ts[i] + k / freq)
            imu_g.append(sim["imu_gyro"][i][k])
            imu_a.append(sim["imu_acc"][i][k])
    gt = np.stack([-R.T @ t for R, t in sim["poses"]])
    tmp = tmp_path_factory.mktemp("euroc_imu") / "seq"
    euroc.write_mini_sequence(
        tmp, imgs, ts,
        imu={"t": np.asarray(imu_t), "gyro": np.asarray(imu_g),
             "acc": np.asarray(imu_a)},
        gt=gt)

    seq = euroc.EuRoCSequence(tmp)
    assert seq.imu is not None and len(seq.imu["t"]) == (n - 1) * S
    cfg = euroc.euroc_config(sensor="imu_mono").replace(
        camera=CameraConfig(width=w, height=h, fx=float(world.cam[0]),
                            fy=float(world.cam[1]), cx=float(world.cam[2]),
                            cy=float(world.cam[3]), fps=fps))
    sysm, res = euroc.run_sequence(seq, cfg=cfg)
    assert sysm.tracking_state() == "OK"
    # The IMU stream actually reached the tracker: the keyframe
    # preintegration chain exists (it only fills via _integrate_imu).
    tr = sysm.tracker
    assert tr.kf_preint, "IMU never routed through the driver"
    assert res is not None and res.rmse_scaled < 0.5, res

    # Exported keyframe trajectory: TUM format, REAL timestamps.
    tmp2 = tmp_path_factory.mktemp("traj")
    sysm.save_keyframe_trajectory(tmp2 / "kf.txt")
    lines = (tmp2 / "kf.txt").read_text().strip().splitlines()
    assert len(lines) == len(tr.kf_slots)
    vals = np.asarray([[float(v) for v in ln.split()] for ln in lines])
    assert vals.shape[1] == 8
    # Timestamps are frame timestamps (epoch range), strictly increasing.
    assert np.all(vals[:, 0] >= t0) and np.all(np.diff(vals[:, 0]) > 0)
    # KITTI export: 12 floats per frame line.
    kitti = sysm.trajectory_kitti().strip().splitlines()
    assert len(kitti) == n
    assert all(len(ln.split()) == 12 for ln in kitti)


def test_multi_sequence_change_dataset(small_setup, tmp_path_factory):
    """ChangeDataset (multi-sequence sessions, mono_euroc.cc:139): two
    mini sequences through ONE System — the first map is archived into
    the Atlas at the boundary and the session keeps tracking; since both
    view the same world, cross-map place recognition may merge them back
    (either outcome proves the multi-session machinery)."""
    world, poses, cfg = small_setup
    tmp = tmp_path_factory.mktemp("euroc_ms")
    seqs = []
    for si, sl in enumerate((slice(0, 20), slice(8, 30))):
        ps = poses[sl]
        imgs = [synthetic.render(world, R, t) for R, t in ps]
        ts = [100.0 * si + i / 20.0 for i in range(len(ps))]
        root = tmp / f"seq{si}"
        euroc.write_mini_sequence(root, imgs, ts)
        seqs.append(euroc.EuRoCSequence(root))
    from tpuslam.system import System
    sysm = System(cfg)
    sysm.tracker.atlas.min_keyframes_to_keep = 1  # mini maps are small
    for si, seq in enumerate(seqs):
        if si > 0:
            sysm.change_dataset()
        for i in range(len(seq)):
            sysm.track_monocular(seq.image(i), seq.timestamp(i))
    tr = sysm.tracker
    assert sysm.tracking_state() == "OK"
    # Either the first session is archived, or it was merged back in.
    assert tr.atlas.n_maps >= 1 or tr.n_merges >= 1, (
        tr.atlas.n_maps, tr.n_merges)
    # The helper covers the same flow end to end (fresh session).
    sysm2 = euroc.run_sequences(seqs, cfg=cfg, max_frames=12)
    assert sysm2.tracker is not None
