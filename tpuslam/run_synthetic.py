"""End-to-end monocular SLAM run on the synthetic world.

The dataset-driver analog of Examples/Monocular/mono_euroc.cc
(/root/reference/Examples/Monocular/mono_euroc.cc:35): render frames
along a known orbit, feed them through MonoTracker, report ATE (Horn,
scale-corrected — evaluation/evaluate_ate_scale.py methodology) and
timing.

Usage: python -m tpuslam.run_synthetic [--frames N] [--points P] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--points", type=int, default=500)
    p.add_argument("--features", type=int, default=1024)
    p.add_argument("--arc", type=float, default=0.8,
                   help="orbit arc in units of pi (2.0 = closed circuit)")
    p.add_argument("--traj", choices=("orbit", "ring"), default="orbit",
                   help="orbit = inward-looking; ring = outward-looking "
                        "(sector views -> real loop-closure geometry)")
    p.add_argument("--log", type=str, default=None,
                   help="write per-frame diagnostics CSV here")
    p.add_argument("--viz-dir", type=str, default=None,
                   help="live observability: write tracked-feature "
                        "overlay frames (FrameDrawer analog) + final "
                        "map/covisibility-graph renders here")
    p.add_argument("--viz-every", type=int, default=10,
                   help="overlay every Nth frame")
    p.add_argument("--cpu", action="store_true",
                   help="force CPU backend (tests/dev)")
    p.add_argument("--quiet", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tpuslam.config import CameraConfig, ORBConfig, SLAMConfig
    from tpuslam.datasets import synthetic
    from tpuslam.eval import ate
    from tpuslam.tracking.tracker import MonoTracker

    h, w = 480, 640
    if args.traj == "ring":
        world = synthetic.make_world(n_points=args.points, h=h, w=w, seed=0,
                                     extent=(36.0, 36.0, 10.0))
        poses = synthetic.ring_trajectory(args.frames, arc=args.arc * np.pi)
    else:
        world = synthetic.make_world(n_points=args.points, h=h, w=w, seed=0)
        poses = synthetic.orbit_trajectory(args.frames, arc=args.arc * np.pi)

    cfg = SLAMConfig(
        camera=CameraConfig(width=w, height=h, fx=float(world.cam[0]),
                            fy=float(world.cam[1]), cx=float(world.cam[2]),
                            cy=float(world.cam[3])),
        orb=ORBConfig(n_features=args.features),
    )
    tracker = MonoTracker(cfg)
    if args.viz_dir:
        from tpuslam import viz
        tracker.viz_recorder = viz.VizRecorder(args.viz_dir,
                                               every=args.viz_every)

    t_render = 0.0
    t_track = 0.0
    n_ok = 0
    log_rows = []
    for i, (R, t) in enumerate(poses):
        t0 = time.perf_counter()
        img = synthetic.render(world, R, t)
        t_render += time.perf_counter() - t0
        t0 = time.perf_counter()
        out = tracker.process(img)
        dt = time.perf_counter() - t0
        t_track += dt
        n_ok += out.state == "OK"
        if args.log:
            c_gt = -R.T @ t
            c_est = -out.R.T @ out.t
            log_rows.append(
                f"{i},{out.state},{out.n_inliers},{tracker.stats.get('kf', 0)},"
                f"{tracker.stats.get('mp', 0)},{int(out.is_keyframe)},"
                f"{tracker.n_loops_closed},{1e3 * dt:.1f},"
                f"{c_gt[0]:.4f},{c_gt[1]:.4f},{c_gt[2]:.4f},"
                f"{c_est[0]:.4f},{c_est[1]:.4f},{c_est[2]:.4f}")
        if not args.quiet and (i % 20 == 0 or out.is_keyframe):
            print(f"[{i:4d}] {out.state:16s} inliers={out.n_inliers:4d} "
                  f"kf={tracker.stats['kf']:3d} mp={tracker.stats['mp']:5d} "
                  f"loops={tracker.n_loops_closed}"
                  f"{' KF' if out.is_keyframe else ''}", flush=True)
    if args.log:
        with open(args.log, "w") as f:
            f.write("frame,state,inliers,kf,mp,is_kf,loops,ms,"
                    "gx,gy,gz,ex,ey,ez\n")
            f.write("\n".join(log_rows) + "\n")

    est = tracker.positions()
    if args.viz_dir:
        tracker.viz_recorder.finish(tracker.ms, tracker.packed_trajectory())
        print(f"viz: {tracker.viz_recorder.n_written} overlay frames + "
              f"map.png + covis_graph.png -> {args.viz_dir}")
    gt = np.stack([-R.T @ t for R, t in poses])
    # Evaluate only frames after initialization succeeded.
    ok_from = next((i for i, p in enumerate(tracker.trajectory)
                    if np.any(p != tracker.trajectory[0])), 0)
    res = ate.ate(gt[ok_from:], est[ok_from:])
    fps = (len(poses)) / max(t_track, 1e-9)
    print(f"frames={len(poses)} tracked_ok={n_ok} "
          f"kf={tracker.stats['kf']} mp={tracker.stats['mp']}")
    print(f"ATE rmse={res.rmse:.4f} m  scaled={res.rmse_scaled:.4f} m  "
          f"scale={res.scale:.3f}")
    print(f"track {1e3*t_track/len(poses):.1f} ms/frame ({fps:.1f} fps), "
          f"render {1e3*t_render/len(poses):.1f} ms/frame")
    return res, tracker


if __name__ == "__main__":
    main()
