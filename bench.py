"""Benchmark: fused monocular tracking-step throughput on the TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference's real-time budget is the dataset rate — EuRoC 20 fps,
50 ms/frame on a desktop CPU (/root/reference/Examples/Monocular/
mono_euroc.cc:124-132, BASELINE.md). vs_baseline = achieved fps / 20,
so 5.0 == the BASELINE.json north-star of 5x real time on one chip.

The whole per-frame pipeline (pyramid + FAST + NMS + top-k + moments +
blur + BRIEF + guided map matching + 2x masked-GN pose optimization)
runs as ONE jitted program; frames are pre-staged on device and iterated
with lax.scan so the measurement is device throughput, not host/tunnel
round-trips.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=16,
                   help="distinct staged frames (cycled)")
    p.add_argument("--reps", type=int, default=4, help="timed scan passes")
    p.add_argument("--features", type=int, default=1024)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import os
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from tpuslam.config import CameraConfig, ORBConfig, SLAMConfig
    from tpuslam.datasets import synthetic
    from tpuslam.tracking import step as trackstep

    h, w = 480, 752  # EuRoC frame size
    world = synthetic.make_world(n_points=500, h=h, w=w, fx=458.0, seed=0)
    cfg = SLAMConfig(
        camera=CameraConfig(width=w, height=h, fx=458.0, fy=458.0,
                            cx=w / 2.0, cy=h / 2.0),
        orb=ORBConfig(n_features=args.features),
    )

    # Stage frames along an orbit.
    poses = synthetic.orbit_trajectory(args.frames)
    imgs = np.stack([synthetic.render(world, R, t) for R, t in poses])
    imgs = jnp.asarray(imgs, jnp.float32)

    step = trackstep.make_tracking_step(cfg)
    ex = trackstep.example_args(cfg, n_map_points=2048)
    _, R0, t0, mp_ids, mp_pos, mp_desc, mp_level, mp_ok = ex

    @jax.jit
    def scan_frames(imgs, R0, t0):
        def body(carry, img):
            R, t = carry
            out = step(img, R, t, mp_ids, mp_pos, mp_desc, mp_level, mp_ok)
            return (out.R, out.t), out.n_inliers
        (_, _), ninl = jax.lax.scan(body, (R0, t0), imgs)
        return ninl

    # Warmup / compile.
    t0c = time.perf_counter()
    jax.block_until_ready(scan_frames(imgs, R0, t0))
    compile_s = time.perf_counter() - t0c

    times = []
    for _ in range(args.reps):
        t0t = time.perf_counter()
        jax.block_until_ready(scan_frames(imgs, R0, t0))
        times.append(time.perf_counter() - t0t)
    best = min(times)
    ms_per_frame = 1e3 * best / args.frames
    fps = args.frames / best

    print(json.dumps({
        "metric": "mono_tracking_step_fps",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 20.0, 3),
        "detail": {
            "ms_per_frame": round(ms_per_frame, 3),
            "features": args.features,
            "map_points": 2048,
            "frame": f"{w}x{h}",
            "compile_s": round(compile_s, 1),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
