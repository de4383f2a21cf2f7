"""Quick wall-clock probe of the production pipelined tracking loop on
the real device: per-frame ms + sync count + state, with stage timers.

Usage: python scripts/e2e_probe.py [--frames N] [--radius R] [--arc A]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=96)
    p.add_argument("--radius", type=float, default=12.0)
    p.add_argument("--arc", type=float, default=0.8 * np.pi)
    p.add_argument("--features", type=int, default=1024)
    p.add_argument("--warm", type=int, default=24)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--no-pipeline", action="store_true")
    p.add_argument("--ring", action="store_true",
                   help="ring-world circuit (the bench e2e fixture)")
    args = p.parse_args()

    import os
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from tpuslam.config import CameraConfig, ORBConfig, SLAMConfig, \
        TrackingConfig
    from tpuslam.datasets import synthetic
    from tpuslam.system import System

    h, w = 480, 752
    if args.ring:
        world = synthetic.make_world(n_points=1400, h=h, w=w, fx=458.0,
                                     seed=0, extent=(36.0, 36.0, 10.0))
        poses = synthetic.ring_trajectory(args.frames, arc=2.25 * np.pi)
    else:
        world = synthetic.make_world(n_points=6000, h=h, w=w, fx=458.0,
                                     seed=0, extent=(16.0, 16.0, 8.0))
        poses = synthetic.orbit_trajectory(args.frames, radius=args.radius,
                                           arc=args.arc)
    cfg = SLAMConfig(
        camera=CameraConfig(width=w, height=h, fx=458.0, fy=458.0,
                            cx=w / 2.0, cy=h / 2.0),
        orb=ORBConfig(n_features=args.features),
        tracking=TrackingConfig(
            pipeline=not args.no_pipeline,
            pipeline_depth=int(os.environ.get("TPUSLAM_DEPTH", "2"))),
    )
    print("rendering...", flush=True)
    frames = [synthetic.render(world, R, t) for R, t in poses]
    sysm = System(cfg)
    t_pw = time.perf_counter()
    sysm.tracker.prewarm()
    print(f"prewarm: {time.perf_counter() - t_pw:.1f} s", flush=True)

    counter = {"n": 0}
    orig_dg = jax.device_get

    def cdg(x):
        counter["n"] += 1
        return orig_dg(x)
    jax.device_get = cdg
    from jax._src.array import ArrayImpl
    patched = []
    for name in ("__array__", "__int__", "__float__", "__bool__",
                 "__index__"):
        o = getattr(ArrayImpl, name)

        def wrap(o):
            def f(self, *a, **k):
                counter["n"] += 1
                return o(self, *a, **k)
            return f
        setattr(ArrayImpl, name, wrap(o))
        patched.append((name, o))

    per = []
    try:
        for i in range(args.frames):
            c0 = counter["n"]
            t0 = time.perf_counter()
            r = sysm.track_monocular(frames[i], timestamp=i / 20.0)
            per.append((1e3 * (time.perf_counter() - t0),
                        counter["n"] - c0, r.state))
    finally:
        jax.device_get = orig_dg
        for name, o in patched:
            setattr(ArrayImpl, name, o)
    sysm.shutdown()

    timed = per[args.warm:]
    ms = np.array([x[0] for x in timed])
    sy = np.array([x[1] for x in timed])
    n_ok = sum(1 for x in timed if x[2] == "OK")
    print(f"frames={len(timed)} ok={n_ok} "
          f"mean={ms.mean():.1f}ms p50={np.percentile(ms, 50):.1f} "
          f"p95={np.percentile(ms, 95):.1f} max={ms.max():.1f} "
          f"fps={1e3 / ms.mean():.1f} syncs/frame={sy.mean():.2f}")
    tr = sysm.tracker
    print("stats:", tr.stats)
    for k in tr.timer.total_s:
        print(f"  {k}: {1e3 * tr.timer.total_s[k]:.0f} ms "
              f"/ {tr.timer.count[k]}")
    # worst frames
    worst = np.argsort(-ms)[:8]
    print("worst:", [(int(i) + args.warm, round(float(ms[i])), int(sy[i]),
                      timed[i][2]) for i in worst])


if __name__ == "__main__":
    main()
