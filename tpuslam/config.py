"""Typed configuration for the whole engine.

The reference parses one YAML per run with three sections
(`Tracking::ParseCamParamFile` /root/reference/src/Tracking.cc:174,
`ParseORBParamFile` :772, `ParseIMUParamFile` :857) and hard-codes most
other thresholds at point of use. Here every knob is a documented,
typed field with the reference's defaults, grouped by subsystem.

All capacities are *static* (they become array shapes under `jit`).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class CameraConfig:
    """Camera intrinsics. Reference: /root/reference/src/Tracking.cc:174-770."""

    model: str = "pinhole"  # "pinhole" | "kb8" (Kannala-Brandt-8 fisheye)
    width: int = 640
    height: int = 480
    fx: float = 458.654
    fy: float = 457.296
    cx: float = 367.215
    cy: float = 248.375
    # Radial-tangential distortion (pinhole) or k1..k4 (kb8).
    dist: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    fps: float = 20.0
    # Stereo: baseline times fx (reference `mbf`) and depth threshold.
    bf: float = 0.0
    th_depth: float = 35.0
    # Non-rectified (fisheye) stereo rig: right-camera intrinsics +
    # distortion, rig extrinsics Tlr (x_left = R x_right + t, 16 floats
    # row-major; the reference's Tlr, Stereo-Inertial/TUM_512.yaml:33),
    # and per-camera lapping column bands
    # (Camera.lappingBegin/lappingEnd, KannalaBrandt8.h:96). Empty =
    # rectified rig (scanline stereo path).
    params_right: Tuple[float, ...] = ()
    dist_right: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    Tlr: Tuple[float, ...] = ()
    lapping_left: Tuple[float, float] = (-1.0, -1.0)
    lapping_right: Tuple[float, float] = (-1.0, -1.0)

    @property
    def params(self) -> Tuple[float, ...]:
        return (self.fx, self.fy, self.cx, self.cy)


@dataclass(frozen=True)
class ORBConfig:
    """Feature extraction. Reference defaults: EuRoC.yaml + ORBextractor ctor
    (/root/reference/src/ORBextractor.cc:408)."""

    n_features: int = 1024          # padded feature capacity per frame (ref: 1000)
    scale_factor: float = 1.2       # pyramid scale between levels
    n_levels: int = 8
    ini_th_fast: int = 20           # preferred FAST threshold (per-cell)
    min_th_fast: int = 7            # fallback threshold
    cell_size: int = 16             # spatial-balance cell (replaces octree, see
                                    # ORBextractor::DistributeOctTree :537)
    patch_radius: int = 15          # intensity-centroid orientation patch (ref HALF_PATCH_SIZE)
    edge_margin: int = 19           # no features closer than this to the border (ref EDGE_THRESHOLD)
    n_init_features_mult: int = 2   # monocular-init extractor boost (ref 5x, Tracking.cc:838-844)


@dataclass(frozen=True)
class IMUConfig:
    """IMU noise model. Reference: Tracking::ParseIMUParamFile
    (/root/reference/src/Tracking.cc:857-981); continuous→discrete scaling
    Ng*sqrt(freq) at :945-951."""

    freq: float = 200.0
    noise_gyro: float = 1.7e-4      # continuous-time densities (EuRoC.yaml)
    noise_acc: float = 2.0e-3
    walk_gyro: float = 1.9e-5
    walk_acc: float = 3.0e-3
    gravity: float = 9.81           # GRAVITY_VALUE, /root/reference/include/ImuTypes.h:41
    # Post-init refinement staging times (s since IMU init): VIBA1/VIBA2
    # re-initialization and mono scale refinement cadence
    # (/root/reference/src/LocalMapping.cc:227-268; scale ref at 25 s,
    # then every 10 s). Tests on short synthetic sequences shrink these.
    viba1_t: float = 5.0
    viba2_t: float = 15.0
    scale_ref_interval: float = 10.0
    # Inertial-init window: the keyframe chain must span this much time
    # (mono minTime=2 s) and the map must have this many keyframes
    # (nMinKF=10) before InertialOptimization is attempted
    # (/root/reference/src/LocalMapping.cc:1443-1445).
    init_window_t: float = 2.0
    init_min_kf: int = 10
    # Body-from-camera extrinsics as a flat 4x4 row-major tuple (Tbc).
    Tbc: Tuple[float, ...] = tuple(
        float(v) for v in (1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1)
    )


@dataclass(frozen=True)
class MatcherConfig:
    """Hamming matching thresholds. Reference: /root/reference/src/ORBmatcher.cc:36-38
    and per-call-site ratios."""

    th_high: int = 100
    th_low: int = 50
    nn_ratio: float = 0.75          # best/second-best gate (0.7/0.75/0.9 by call site)
    histo_bins: int = 30            # rotation-consistency histogram
    check_orientation: bool = True
    search_radius: float = 15.0     # projection search window (px at level 0)


@dataclass(frozen=True)
class SolverConfig:
    """Gauss-Newton / LM engine. Reference solver schedules catalogued in
    SURVEY.md section 2.2 (Optimizer.cc)."""

    pose_rounds: int = 4            # PoseOptimization: 4 rounds x 10 iters (Optimizer.cc:887)
    pose_iters: int = 10
    chi2_mono: float = 5.991        # Huber delta^2, 2-dof (Optimizer.cc:930)
    chi2_stereo: float = 7.815      # 3-dof (Optimizer.cc:931)
    ba_iters: int = 10              # local BA LM iterations for COLD
                                    # problems (init, GBA, merge weld)
    ba_warm_iters: int = 8          # per-keyframe window BA: the window
                                    # overlaps the previous superstep's,
                                    # so poses/points start warm and a
                                    # short LM run converges. Measured on
                                    # the 600-frame ring (ATE m): 8 it =
                                    # 0.193, 10 it = 0.271, 6 it = 0.541
                                    # (under the convergence knee) —
                                    # 8 beats 10 at 20% less cost
    ba_warm_trust_region: bool = True   # plain GN (False) diverges on
                                    # the COLD entries each superstep
                                    # adds (fresh triangulations) —
                                    # measured: lost at frame ~50 of the
                                    # 80-frame ring; LM's reject is the
                                    # shield, keep it
    ba_lambda0: float = 1e-4        # initial LM damping
    dtype: str = "float32"


@dataclass(frozen=True)
class MapConfig:
    """Fixed capacities of the SoA map pools (replace the KeyFrame/MapPoint
    pointer graph, /root/reference/include/KeyFrame.h, MapPoint.h)."""

    max_keyframes: int = 512        # INITIAL keyframe-pool capacity;
                                    # pools double on demand up to
                                    # max_keyframes_cap (the reference
                                    # has no bound at all — multi-
                                    # session EuRoC reaches thousands,
                                    # RUN/euroc_eval_examples.sh:15)
    max_keyframes_cap: int = 4096   # hard ceiling of pool growth
    max_points: int = 32768
    local_window: int = 16          # KFs in the local-BA first ring (ref covisible set)
    local_fixed: int = 8            # fixed anchor KFs (second ring; 6 was
                                    # measured +43% ATE on the 600-frame
                                    # ring — anchors gauge the window)
    ba_point_cap: int = 4096        # landmark capacity of one local-BA problem
                                    # (4096 halves BA time vs 8192 with
                                    # IDENTICAL ring-e2e ATE — isolated
                                    # from the anchor count by ablation)
    covis_min_weight: int = 15      # covisibility edge threshold (KeyFrame.cc:449)
    cull_found_ratio: float = 0.25  # MapPointCulling (LocalMapping.cc:423-427)
    cull_min_obs: int = 3


@dataclass(frozen=True)
class TrackingConfig:
    """Tracking state machine thresholds. Reference: /root/reference/src/Tracking.cc."""

    min_matches_motion: int = 20    # TrackWithMotionModel acceptance (Tracking.cc:2954)
    min_inliers_track: int = 10     # post pose-opt inliers to stay OK
    min_matches_local: int = 30     # TrackLocalMap success, pure visual (Tracking.cc:3093)
    kf_max_interval: int = 10       # force KF after this many frames (c1a analog)
    kf_min_interval: int = 3        # min frames between ratio-triggered KFs
                                    # (c1b mapping-idle backpressure analog)
    async_mapping: bool = True      # defer the keyframe superstep's host
                                    # commits to the next frame so tracking
                                    # overlaps mapping (the reference's
                                    # thread pipeline, SURVEY.md 2.4; the
                                    # inertial path always commits inline)
    pipeline: bool = True           # steady-state OK frames run as ONE
                                    # fused jitted dispatch with the
                                    # scalar fetch deferred one frame
                                    # (zero blocking host syncs — the
                                    # SURVEY 7.0 "image-in / pose-out"
                                    # production path). False = fetch
                                    # within the frame (legacy/sync).
    pipeline_depth: int = 2         # frames in flight before the host
                                    # reads one back. Measured device
                                    # time per frame is ~2 ms; through
                                    # a network-attached chip each
                                    # dispatch->result chain costs a
                                    # ~28 ms round trip, so depth 2
                                    # hides a full extra round trip.
                                    # The host state machine (keyframe
                                    # decision, loss handling) runs
                                    # `depth` frames latent — the
                                    # reference's mapping/loop threads
                                    # have the same order of latency
                                    # through their keyframe queues.
    time_recently_lost: float = 5.0  # IMU dead-reckoning grace period (s)
                                     # (Tracking ctor, src/Tracking.cc:1800)
    kf_ref_ratio: float = 0.9       # insert KF if tracked < ratio * ref KF's
                                    # multi-observed points (c2, mono thRefRatio
                                    # 0.9, src/Tracking.cc:3227)
    init_min_matches: int = 100     # monocular init needs this many matches (Tracking.cc:2457)
    init_min_tri: int = 50          # and this many triangulated points


@dataclass(frozen=True)
class SLAMConfig:
    camera: CameraConfig = field(default_factory=CameraConfig)
    orb: ORBConfig = field(default_factory=ORBConfig)
    imu: IMUConfig = field(default_factory=IMUConfig)
    matcher: MatcherConfig = field(default_factory=MatcherConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    map: MapConfig = field(default_factory=MapConfig)
    tracking: TrackingConfig = field(default_factory=TrackingConfig)
    sensor: str = "mono"            # mono | stereo | rgbd | imu_mono | imu_stereo
    seed: int = 0

    def replace(self, **kw) -> "SLAMConfig":
        return dataclasses.replace(self, **kw)


def euroc_mono_config(**overrides) -> SLAMConfig:
    """EuRoC machine-hall monocular preset (Examples/Monocular/EuRoC.yaml)."""
    cam = CameraConfig(
        width=752, height=480,
        fx=458.654, fy=457.296, cx=367.215, cy=248.375,
        dist=(-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05),
        fps=20.0,
    )
    return SLAMConfig(camera=cam, sensor="mono").replace(**overrides)
