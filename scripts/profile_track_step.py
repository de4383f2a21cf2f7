"""Profile the fused tracking step's components on the real chip.

Breaks the 10 ms step into: ORB extraction (pyramid / FAST / orient /
descriptors), guided matching rounds, pose GN — each timed as an in-jit
scan over staged variants (same methodology as bench.py scan_timed)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.config import SLAMConfig, CameraConfig, ORBConfig
from tpuslam.datasets import synthetic
from tpuslam.frontend import extractor, matching
from tpuslam.tracking import step as trackstep
from tpuslam.tracking import tracker as trk
from tpuslam.solver import pose_opt

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def scan_timed(body_fn, variants, min_total_ms=200.0):
    def run_once(n_tile):
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *(variants * n_tile))

        @jax.jit
        def run(stacked):
            def body(c, x):
                out = body_fn(x)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return c + jnp.sum(leaf).astype(jnp.float32), 0.0
            c, _ = jax.lax.scan(body, jnp.float32(0.0), stacked)
            return c
        float(run(stacked))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(stacked))
            best = min(best, 1e3 * (time.perf_counter() - t0))
        return best, len(variants) * n_tile

    total_ms, n = run_once(1)
    if total_ms < min_total_ms:
        tile = max(2, int(min_total_ms / max(total_ms, 1e-3)) + 1)
        total_ms, n = run_once(tile)
    return total_ms / n


def main():
    h, w = 480, 752
    world = synthetic.make_world(n_points=6000, h=h, w=w, fx=458.0,
                                 seed=0, extent=(16.0, 16.0, 8.0))
    cfg = SLAMConfig(
        camera=CameraConfig(width=w, height=h, fx=458.0, fy=458.0,
                            cx=w / 2.0, cy=h / 2.0),
        orb=ORBConfig(n_features=1024),
    )
    poses = synthetic.orbit_trajectory(4, radius=12.0)
    imgs = [jnp.asarray(synthetic.render(world, R, t), jnp.float32)
            for R, t in poses]
    jax.block_until_ready(imgs)

    # full step
    step = trackstep.make_tracking_step(cfg)
    ex = trackstep.example_args(cfg, n_map_points=2048)
    _, R0, t0, mp_ids, mp_pos, mp_desc, mp_level, mp_ok = ex
    full_ms = scan_timed(
        lambda im: step(im, R0, t0, mp_ids, mp_pos, mp_desc, mp_level,
                        mp_ok).assoc, imgs)
    print(f"full step:        {full_ms:8.3f} ms")

    ext_ms = scan_timed(lambda im: extractor.extract(im, cfg.orb).desc,
                        imgs)
    print(f"  extraction:     {ext_ms:8.3f} ms")

    # extraction internals
    from tpuslam.frontend import pyramid, fast, orb
    pyr_ms = scan_timed(
        lambda im: pyramid.build_pyramid(im, cfg.orb.n_levels, cfg.orb.scale_factor)[0], imgs)
    print(f"    pyramid:      {pyr_ms:8.3f} ms")

    feats = [extractor.extract_jit(im, cfg.orb) for im in imgs]
    jax.block_until_ready(feats)
    sf = extractor.scale_factors(cfg.orb)
    scale_lut = jnp.asarray(sf)
    inv_s2 = jnp.asarray(1.0 / (sf * sf))
    cam = jnp.asarray(cfg.camera.params, jnp.float32)
    img_wh = jnp.asarray([w, h], jnp.float32)

    P = mp_pos.shape[0]
    zeros3 = jnp.zeros((P, 3), jnp.float32)
    zeros1 = jnp.zeros((P,), jnp.float32)
    tp_ms = scan_timed(
        lambda f: trk._track_pose(
            R0, t0, mp_ids, mp_pos, mp_desc, mp_level, mp_ok,
            zeros3, zeros1, zeros1, f, cam, scale_lut, inv_s2,
            img_wh)[2],
        feats)
    print(f"  track_pose:     {tp_ms:8.3f} ms")

    # matching alone (search_by_projection one round)
    from tpuslam.geometry import cameras
    def one_match(f):
        Xc = jnp.einsum("ij,pj->pi", R0, mp_pos) + t0
        uv = cameras.project(Xc, cam, "pinhole")
        return matching.search_by_projection(
            uv, mp_level, mp_ok, mp_desc, f, scale_lut,
            radius=15.0, max_dist=100, ratio=1.0).idx
    m_ms = scan_timed(one_match, feats)
    print(f"    one guided match: {m_ms:6.3f} ms")

    def one_gn(f):
        opt = pose_opt.optimize_pose(
            R0, t0, mp_pos, f.uv[:P] if f.uv.shape[0] >= P else
            jnp.zeros((P, 2)), jnp.ones((P,)), mp_ok, cam,
            rounds=2, iters=3)
        return opt.R
    gn_ms = scan_timed(one_gn, feats)
    print(f"    pose GN (2x3):  {gn_ms:8.3f} ms")


if __name__ == "__main__":
    main()
