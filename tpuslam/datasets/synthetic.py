"""Deterministic synthetic worlds: textured landmark fields rendered along
known trajectories, with optional IMU simulation.

The reference has no unit-level test data — its only verification is
EuRoC/TUM-VI dataset runs (SURVEY.md section 4). No dataset ships in this
container, so the synthetic world is the primary integration fixture: a
rendered scene with exact ground-truth trajectory gives exact ATE
expectations, and IMU measurements can be derived analytically from the
trajectory for visual-inertial tests.

Rendering is host-side numpy (test fixture, not a perf path): each 3D
landmark carries a unique random texture patch pasted at its projection,
over a low-frequency background, so FAST/BRIEF have distinctive,
trackable corners exactly at landmark locations.

Convention: poses are camera-from-world (R_cw, t_cw), matching the
reference's Tcw; world points X project as uv = proj(R_cw X + t_cw).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np


@dataclass
class SyntheticWorld:
    points: np.ndarray      # (P,3) world landmarks
    patches: np.ndarray     # (P,ps,ps) float32 textures in [0,255]
    patch_size: int
    background: np.ndarray  # (H,W) float32
    h: int
    w: int
    cam: np.ndarray         # [fx,fy,cx,cy]


def make_world(
    n_points: int = 600,
    h: int = 480,
    w: int = 640,
    fx: float = 450.0,
    seed: int = 0,
    extent: Tuple[float, float, float] = (8.0, 8.0, 4.0),
    patch_size: int = 27,
) -> SyntheticWorld:
    # patch_size must exceed the BRIEF sampling span (+-13 px around the
    # keypoint) so descriptors sample landmark texture, not the (screen-
    # fixed) background, which moves with parallax between views.
    rng = np.random.default_rng(seed)
    ex, ey, ez = extent
    pts = rng.uniform([-ex / 2, -ey / 2, -ez / 2], [ex / 2, ey / 2, ez / 2],
                      size=(n_points, 3)).astype(np.float32)
    # High-contrast blocky patches: random binary-ish blobs -> strong FAST
    # corners and distinctive BRIEF bits.
    raw = rng.uniform(0, 255, size=(n_points, patch_size, patch_size))
    coarse = rng.uniform(0, 255, size=(n_points, 4, 4))
    up = np.kron(coarse, np.ones((1, (patch_size + 3) // 4, (patch_size + 3) // 4)))
    # Mostly random texture: a dominant coarse-block component makes
    # different landmarks' descriptors correlated (they all sample the
    # same 4x4 block geometry), which hurts place recognition.
    patches = (0.3 * up[:, :patch_size, :patch_size] + 0.7 * raw).astype(np.float32)

    # Smooth, LOW-CONTRAST background: local intensity differences stay
    # below the FAST threshold so no corners fire off-landmark. (The
    # background is screen-fixed — a high-contrast one would emit
    # identical corners in every frame, which poisons place recognition
    # with a shared histogram component no real scene has.)
    gy, gx = np.mgrid[0:h, 0:w]
    background = (
        60
        + 6 * np.sin(gx / 97.0)
        + 5 * np.cos(gy / 71.0)
        + 4 * np.sin((gx + gy) / 53.0)
    ).astype(np.float32)

    cam = np.array([fx, fx, w / 2.0, h / 2.0], np.float32)
    return SyntheticWorld(pts, patches, patch_size, background, h, w, cam)


# Photo-derived material textures shipped inside packages baked into
# this container (gymnasium_robotics kitchen assets — photographs of
# wood grain / marble / metal / tile, MIT-licensed). They carry REAL
# image statistics (1/f spectra, anisotropic grain, low-contrast
# regions) that the procedural patches above do not — the validation
# the reference gets from running real EuRoC/TUM-VI imagery
# (/root/reference/RUN/euroc_examples.sh), rebuilt from what exists in
# this offline container (VERDICT r04 missing #5).
_NATURAL_TEXTURE_DIRS = (
    "/opt/venv/lib/python3.12/site-packages/gymnasium_robotics/envs/"
    "assets/kitchen_franka/kitchen_assets/textures",
)


def _load_natural_textures():
    """Grayscale float32 [0,255] photo textures, or [] if unavailable."""
    import glob
    import os
    try:
        from PIL import Image
    except ImportError:
        return []
    out = []
    for d in _NATURAL_TEXTURE_DIRS:
        for p in sorted(glob.glob(os.path.join(d, "*.png"))):
            try:
                im = Image.open(p).convert("L")
            except Exception:
                continue
            a = np.asarray(im, np.float32)
            if a.shape[0] >= 256 and a.shape[1] >= 256:
                out.append(a)
    return out


def natural_textures_available() -> bool:
    return len(_load_natural_textures()) > 0


def make_world_natural(
    n_points: int = 600,
    h: int = 480,
    w: int = 640,
    fx: float = 450.0,
    seed: int = 0,
    extent: Tuple[float, float, float] = (8.0, 8.0, 4.0),
    patch_size: int = 27,
) -> SyntheticWorld:
    """make_world with landmark patches CROPPED FROM PHOTOGRAPHS
    instead of procedural noise: corner strength, descriptor
    distinctiveness, and retrieval scores then face natural-image
    statistics (repeating grain, flat regions, correlated texture) —
    the regime the loop/reloc/merge thresholds
    (tracking/loop_closing.py min_score/min_margin/STRONG_RESPONSE,
    mapping/retrieval.py match_th) must survive."""
    tex = _load_natural_textures()
    if not tex:
        raise RuntimeError("no natural textures available in container")
    rng = np.random.default_rng(seed)
    ex, ey, ez = extent
    pts = rng.uniform([-ex / 2, -ey / 2, -ez / 2],
                      [ex / 2, ey / 2, ez / 2],
                      size=(n_points, 3)).astype(np.float32)
    patches = np.empty((n_points, patch_size, patch_size), np.float32)
    for i in range(n_points):
        t = tex[rng.integers(len(tex))]
        # Random scale: crop k*ps then stride-subsample — wider crops
        # see coarser structure, like landmarks at different depths.
        k = int(rng.integers(1, 4))
        span = patch_size * k
        y = int(rng.integers(0, t.shape[0] - span))
        x = int(rng.integers(0, t.shape[1] - span))
        patches[i] = t[y:y + span:k, x:x + span:k]
        # Per-patch contrast normalization to a NATURAL range: photos
        # have flat crops (marble) and busy ones (wood) — stretch only
        # enough that the median landmark clears the FAST threshold,
        # keeping a realistic weak-texture tail.
        p = patches[i]
        lo, hi = np.percentile(p, [5, 95])
        if hi - lo < 1e-3:
            hi = lo + 1.0
        patches[i] = np.clip(
            40.0 + (p - lo) * (180.0 / (hi - lo)), 0.0, 255.0)

    # Low-contrast background from a heavily subsampled photo texture
    # (scaled below the FAST threshold — a screen-fixed high-contrast
    # background would emit identical corners every frame; see
    # make_world).
    t = tex[0]
    ty = np.linspace(0, t.shape[0] - 1, h).astype(np.int64)
    tx = np.linspace(0, t.shape[1] - 1, w).astype(np.int64)
    bg = t[np.ix_(ty, tx)]
    bg = bg - bg.mean()
    sd = max(float(bg.std()), 1e-3)
    background = (60.0 + bg * (4.0 / sd)).astype(np.float32)

    cam = np.array([fx, fx, w / 2.0, h / 2.0], np.float32)
    return SyntheticWorld(pts, patches, patch_size, background, h, w, cam)


def look_at(eye: np.ndarray, target: np.ndarray, up=(0.0, 0.0, 1.0)):
    """Camera-from-world pose for a camera at `eye` looking at `target`.

    Camera axes: +z forward (optical), +x right, +y down (OpenCV style).
    Returns (R_cw, t_cw).
    """
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    upv = np.asarray(up, np.float64)
    right = np.cross(fwd, upv)
    nr = np.linalg.norm(right)
    if nr < 1e-6:  # forward parallel to up; pick another up
        upv = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, upv)
        nr = np.linalg.norm(right)
    right /= nr
    down = np.cross(fwd, right)
    R_wc = np.stack([right, down, fwd], axis=1)  # columns = cam axes in world
    R_cw = R_wc.T
    t_cw = -R_cw @ eye
    return R_cw.astype(np.float32), t_cw.astype(np.float32)


def orbit_trajectory(n_frames: int, radius: float = 9.0, height: float = 1.5,
                     arc: float = 0.8 * np.pi, target=(0.0, 0.0, 0.0),
                     wobble: float = 0.15, seed: int = 1):
    """Camera orbiting the world center, looking inward. Returns list of
    (R_cw, t_cw). `wobble` adds smooth out-of-plane motion so the
    trajectory is not degenerate for BA."""
    rng = np.random.default_rng(seed)
    phase = rng.uniform(0, 2 * np.pi, size=3)
    poses = []
    for i in range(n_frames):
        a = arc * i / max(n_frames - 1, 1)
        eye = np.array(
            [
                radius * np.cos(a),
                radius * np.sin(a),
                height + wobble * radius * 0.3 * np.sin(3 * a + phase[0]),
            ]
        )
        poses.append(look_at(eye, np.asarray(target)))
    return poses


def ring_trajectory(n_frames: int, radius: float = 5.0, height: float = 0.5,
                    arc: float = 2.0 * np.pi, look_out: float = 3.0,
                    wobble: float = 0.1, seed: int = 1):
    """Camera on a ring looking OUTWARD (radially away from center): each
    view covers only a sector of the world, so place recognition is
    meaningful and a closed circuit produces a genuine loop-closure
    situation (unlike the inward orbit, where every frame sees the same
    central landmark field). Pair with a wide world extent (e.g. 36 m).
    """
    rng = np.random.default_rng(seed)
    phase = rng.uniform(0, 2 * np.pi)
    poses = []
    for i in range(n_frames):
        a = arc * i / max(n_frames - 1, 1)
        eye = np.array([
            radius * np.cos(a),
            radius * np.sin(a),
            height + wobble * np.sin(3 * a + phase),
        ])
        target = eye * np.array([look_out, look_out, 1.0])
        poses.append(look_at(eye, target))
    return poses


def project(world: SyntheticWorld, R_cw, t_cw, kb8=None):
    """Project landmarks: returns uv (P,2), depth (P,), in_view (P,) bool.

    `kb8` = (k1,k2,k3,k4) switches to the Kannala-Brandt equidistant
    fisheye model (matches geometry/cameras.kb8_project:
    d(theta) = theta + k1 th^3 + ... + k4 th^9)."""
    Xc = world.points @ R_cw.T + t_cw
    z = Xc[:, 2]
    fx, fy, cx, cy = world.cam
    with np.errstate(divide="ignore", invalid="ignore"):
        if kb8 is None:
            u = fx * Xc[:, 0] / z + cx
            v = fy * Xc[:, 1] / z + cy
        else:
            k1, k2, k3, k4 = kb8
            r = np.sqrt(np.maximum(Xc[:, 0] ** 2 + Xc[:, 1] ** 2, 1e-18))
            theta = np.arctan2(r, z)
            th2 = theta * theta
            d = theta * (1.0 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4))))
            u = fx * d * Xc[:, 0] / r + cx
            v = fy * d * Xc[:, 1] / r + cy
    m = world.patch_size
    in_view = (
        (z > 0.5)
        & (u >= m) & (u < world.w - m)
        & (v >= m) & (v < world.h - m)
    )
    return np.stack([u, v], 1), z, in_view


def _blur(img: np.ndarray, passes: int = 2) -> np.ndarray:
    """Cheap separable [1,2,1]/4 blur, `passes` times (~= Gaussian sigma 1).
    Models optical/sensor blur: without it the aliased rendering makes FAST
    corner positions jitter between views, which no real camera does."""
    out = img
    for _ in range(passes):
        p = np.pad(out, 1, mode="edge")
        out = 0.25 * (2 * p[1:-1, 1:-1] + p[:-2, 1:-1] + p[2:, 1:-1])
        p = np.pad(out, 1, mode="edge")
        out = 0.25 * (2 * p[1:-1, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:])
    return out


def render(world: SyntheticWorld, R_cw, t_cw, noise: float = 0.0,
           seed: int = 0, kb8=None) -> np.ndarray:
    """Render one grayscale frame (H,W) float32 in [0,255]."""
    img = world.background.copy()
    uv, z, in_view = project(world, R_cw, t_cw, kb8=kb8)
    ps = world.patch_size
    half = ps // 2
    order = np.argsort(-z)  # far first so near landmarks overwrite
    for i in order:
        if not in_view[i]:
            continue
        cx, cy = int(round(uv[i, 0])), int(round(uv[i, 1]))
        y0, x0 = cy - half, cx - half
        img[y0 : y0 + ps, x0 : x0 + ps] = world.patches[i]
    img = _blur(img)
    if noise > 0:
        rng = np.random.default_rng(seed)
        img = img + rng.normal(0, noise, img.shape).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.float32)


def render_depth(world: SyntheticWorld, R_cw, t_cw) -> np.ndarray:
    """Metric depth image aligned with render(): each landmark's patch
    pixels carry its camera depth; the background has no depth (0 =
    invalid), like a real RGBD sensor's holes."""
    depth = np.zeros((world.h, world.w), np.float32)
    uv, z, in_view = project(world, R_cw, t_cw)
    ps = world.patch_size
    half = ps // 2
    order = np.argsort(-z)
    for i in order:
        if not in_view[i]:
            continue
        cx, cy = int(round(uv[i, 0])), int(round(uv[i, 1]))
        y0, x0 = cy - half, cx - half
        depth[y0: y0 + ps, x0: x0 + ps] = z[i]
    return depth


# ---------------------------------------------------------------------------
# IMU simulation (visual-inertial tests)
# ---------------------------------------------------------------------------


def orbit_pose(a: float, radius: float = 9.0, height: float = 1.5,
               wobble: float = 0.15, phase: float = 0.0,
               target=(0.0, 0.0, 0.0)):
    """Continuous-parameter orbit pose (same family as orbit_trajectory)."""
    eye = np.array([
        radius * np.cos(a),
        radius * np.sin(a),
        height + wobble * radius * 0.3 * np.sin(3 * a + phase),
    ])
    return look_at(eye, np.asarray(target))


def simulate_imu(
    n_frames: int,
    fps: float = 20.0,
    imu_freq: float = 200.0,
    arc: float = 0.8 * np.pi,
    gravity: float = 9.81,
    bias_gyro=(0.0, 0.0, 0.0),
    bias_acc=(0.0, 0.0, 0.0),
    noise_gyro: float = 0.0,
    noise_acc: float = 0.0,
    seed: int = 3,
    Tbc=None,
    speed_mod: float = 0.0,
    speed_cycles: float = 3.0,
    **orbit_kw,
):
    """Simulate an orbit trajectory with IMU.

    `speed_mod` adds a smooth +-speed_mod relative speed oscillation
    (speed_cycles periods over the run). A constant-speed orbit gives
    the accelerometer only a small centripetal signal — scale is then
    near-unobservable and inertial initialization is ill-conditioned
    (the reason EuRoC sequences begin with an excitation shake; the
    reference requires this motion before InitializeIMU can succeed).

    `Tbc` (4x4 body-from-camera, the reference's convention) places the
    IMU off the optical center; None = identity. Returns dict with:
    - poses: list of n_frames (R_cw, t_cw) at camera rate,
    - vel: (n_frames,3) true BODY world velocities at frame times,
    - imu_acc/imu_gyro: (n_frames-1, S, 3) per-inter-frame sample blocks,
    - imu_dt: scalar sample period.

    Measurements come from finite differences of the smooth analytic
    trajectory at the IMU rate (h=1/freq, error O(h^2)): gyro_k =
    Log(Rwb_k^T Rwb_{k+1})/h, acc = Rwb^T (a_world - g).
    """
    import jax.numpy as jnp

    from tpuslam.geometry import lie

    rng = np.random.default_rng(seed)
    S = int(round(imu_freq / fps))           # samples per frame interval
    h = 1.0 / imu_freq
    total = (n_frames - 1) * S + 1
    T = (n_frames - 1) / fps
    if speed_mod:
        two_pi_c = 2.0 * np.pi * speed_cycles
        a_of_t = lambda t: arc * (                      # noqa: E731
            t / T + speed_mod * np.sin(two_pi_c * t / T) / two_pi_c)
    else:
        a_of_t = lambda t: arc * t / T       # noqa: E731

    # Dense sampling (need one extra sample each side for differences).
    # No clipping: the orbit is analytic for any t, and clipping would
    # corrupt the finite-difference velocity/acceleration at t=0 and t=T.
    ts = np.arange(-1, total + 1) * h
    Rcw_d, tcw_d = [], []
    for t in ts:
        R, tt = orbit_pose(a_of_t(t), **orbit_kw)
        Rcw_d.append(R)
        tcw_d.append(tt)
    Rcw_d = np.stack(Rcw_d)
    tcw_d = np.stack(tcw_d)
    # Body pose through the extrinsics: Twb = Twc o Tcb.
    if Tbc is None:
        Rcb = np.eye(3)
        tcb = np.zeros(3)
    else:
        Tbc = np.asarray(Tbc, np.float64).reshape(4, 4)
        Rcb = Tbc[:3, :3].T
        tcb = -Tbc[:3, :3].T @ Tbc[:3, 3]
    Rwc_d = Rcw_d.transpose(0, 2, 1)
    twc_d = -np.einsum("nij,nj->ni", Rwc_d, tcw_d)
    Rwb_d = np.einsum("nij,jk->nik", Rwc_d, Rcb)
    pwb_d = np.einsum("nij,j->ni", Rwc_d, tcb) + twc_d

    g = np.array([0.0, 0.0, -gravity])
    # Gyro via relative rotation between consecutive dense samples.
    Rel = np.einsum("nji,njk->nik", Rwb_d[:-1], Rwb_d[1:])  # R_k^T R_k+1
    w_body = np.asarray(lie.so3_log(jnp.asarray(Rel, jnp.float32))) / h
    # World acceleration via central second differences.
    acc_w = (pwb_d[2:] - 2 * pwb_d[1:-1] + pwb_d[:-2]) / (h * h)
    acc_body = np.einsum("nji,nj->ni", Rwb_d[1:-1], acc_w - g)
    # Velocity (central differences) at every dense sample.
    vel_d = (pwb_d[2:] - pwb_d[:-2]) / (2 * h)

    # Sample k of the measurement stream covers [k h, (k+1) h): use gyro
    # between k and k+1, acc at k (midpoint-ish; fine at 200 Hz).
    gyro = w_body[1:total] + np.asarray(bias_gyro)
    acc = acc_body[:total - 1] + np.asarray(bias_acc)
    if noise_gyro > 0:
        gyro = gyro + rng.normal(0, noise_gyro, gyro.shape)
    if noise_acc > 0:
        acc = acc + rng.normal(0, noise_acc, acc.shape)

    poses = []
    vel = []
    for f in range(n_frames):
        k = f * S
        poses.append((Rcw_d[1 + k].astype(np.float32),
                      tcw_d[1 + k].astype(np.float32)))
        vel.append(vel_d[k])
    return {
        "poses": poses,
        "vel": np.stack(vel).astype(np.float32),
        "imu_gyro": gyro.reshape(n_frames - 1, S, 3).astype(np.float32),
        "imu_acc": acc.reshape(n_frames - 1, S, 3).astype(np.float32),
        "imu_dt": h,
        "Rwb": Rwb_d[1:-1][::S][:n_frames].astype(np.float32),
        "pwb": pwb_d[1:-1][::S][:n_frames].astype(np.float32),
    }
