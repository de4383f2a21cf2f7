"""Time _run_local_ba exactly as bench.py does (for old/new comparison)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.config import CameraConfig, ORBConfig, SLAMConfig
from tpuslam.datasets import synthetic
from tpuslam.mapping import mapstate
from tpuslam.tracking import tracker as trk
import bench as benchmod

h, w = 480, 752
world = synthetic.make_world(n_points=6000, h=h, w=w, fx=458.0, seed=0,
                             extent=(16.0, 16.0, 8.0))
cfg = SLAMConfig(
    camera=CameraConfig(width=w, height=h, fx=458.0, fy=458.0,
                        cx=w / 2.0, cy=h / 2.0),
    orb=ORBConfig(n_features=1024),
)
poses = synthetic.orbit_trajectory(16, radius=12.0)
W = cfg.map.local_window + cfg.map.local_fixed
ms_map = benchmod._build_map(world, poses, cfg, n_kf=W + 2, n_feat=1024,
                             n_mp=6000)
sf = np.asarray([cfg.orb.scale_factor ** i for i in range(cfg.orb.n_levels)])
inv_sigma2 = jnp.asarray(1.0 / (sf * sf), jnp.float32)
cam_params = jnp.asarray(cfg.camera.params, jnp.float32)
kf_ids = jnp.asarray(np.arange(W, dtype=np.int32))
fixed = jnp.asarray(np.arange(W) >= cfg.map.local_window)
mp_ids_w, local = mapstate.local_point_ids(ms_map, kf_ids,
                                           cap=cfg.map.ba_point_cap)
kf_t_vars = [ms_map.kf_t + 1e-4 * i for i in range(1, 7)]
jax.block_until_ready(kf_t_vars)


def scan_timed(body_fn, variants):
    stacked = jnp.stack(variants)

    @jax.jit
    def run(stacked):
        def body(c, x):
            out = body_fn(x)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + jnp.sum(leaf).astype(jnp.float32), 0.0
        c, _ = jax.lax.scan(body, jnp.float32(0.0), stacked)
        return c
    float(run(stacked))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(stacked))
        best = min(best, 1e3 * (time.perf_counter() - t0))
    return best / len(variants)


ba_ms = scan_timed(
    lambda kt: trk._run_local_ba(
        ms_map._replace(kf_t=kt), kf_ids, fixed, mp_ids_w, local,
        inv_sigma2, cam_params, iters=cfg.solver.ba_iters),
    kf_t_vars)
print(f"local_ba iters=10             {ba_ms:.2f} ms", flush=True)

ba_ms = scan_timed(
    lambda kt: trk._run_local_ba(
        ms_map._replace(kf_t=kt), kf_ids, fixed, mp_ids_w, local,
        inv_sigma2, cam_params, iters=cfg.solver.ba_iters,
        n_free=cfg.map.local_window),
    kf_t_vars)
print(f"local_ba iters=10 n_free=16   {ba_ms:.2f} ms", flush=True)

from tpuslam.solver import local_ba as lba
from tpuslam.mapping import mapstate as msmod
prob = msmod.build_ba_problem(ms_map, kf_ids, fixed, mp_ids_w, local,
                              inv_sigma2)


def gn(kt):
    return lba.optimize(prob._replace(kf_t=kt), cam_params, iters=6,
                        n_free=cfg.map.local_window, trust_region=False)


kt_vars = [prob.kf_t + 1e-4 * i for i in range(1, 7)]
ba_ms = scan_timed(gn, kt_vars)
print(f"optimize GN iters=6 n_free=16 {ba_ms:.2f} ms", flush=True)


def gn16(kt):
    return lba.optimize(prob._replace(kf_t=kt), cam_params, iters=6,
                        n_free=cfg.map.local_window, trust_region=False,
                        compute_dtype="bfloat16")


ba_ms = scan_timed(gn16, kt_vars)
print(f"optimize GN6 nf16 bf16        {ba_ms:.2f} ms", flush=True)


def lm16(kt):
    return lba.optimize(prob._replace(kf_t=kt), cam_params, iters=10,
                        n_free=cfg.map.local_window,
                        compute_dtype="bfloat16")


ba_ms = scan_timed(lm16, kt_vars)
print(f"optimize LM10 nf16 bf16       {ba_ms:.2f} ms", flush=True)

# M=2048 bucket
mp2, loc2 = msmod.local_point_ids(ms_map, kf_ids, cap=2048)
prob2 = msmod.build_ba_problem(ms_map, kf_ids, fixed, mp2, loc2, inv_sigma2)


def gn2048(kt):
    return lba.optimize(prob2._replace(kf_t=kt), cam_params, iters=6,
                        n_free=cfg.map.local_window, trust_region=False,
                        compute_dtype="bfloat16")


ba_ms = scan_timed(gn2048, kt_vars)
print(f"optimize GN6 nf16 bf16 M=2048 {ba_ms:.2f} ms", flush=True)
