"""Per-stage profile of ORB extraction on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from tpuslam.config import ORBConfig
from tpuslam.datasets import synthetic
from tpuslam.frontend import extractor, fast, orb, pyramid


def scan_timed(body_fn, variants, min_total_ms=200.0):
    def run_once(n_tile):
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *(variants * n_tile))

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
    cfg = ORBConfig(n_features=1024)
    world = synthetic.make_world(n_points=6000, h=h, w=w, fx=458.0,
                                 seed=0, extent=(16.0, 16.0, 8.0))
    poses = synthetic.orbit_trajectory(4, radius=12.0)
    imgs = [jnp.asarray(synthetic.render(world, R, t), jnp.float32)
            for R, t in poses]
    jax.block_until_ready(imgs)

    full = scan_timed(lambda im: extractor.extract(im, cfg).desc, imgs)
    print(f"extract total:        {full:8.3f} ms")

    def all_levels(fn):
        def run(im):
            levels = pyramid.build_pyramid(im, cfg.n_levels,
                                           cfg.scale_factor)
            return sum(jnp.sum(fn(lv)) for lv in levels)
        return run

    pyr = scan_timed(
        lambda im: pyramid.build_pyramid(im, cfg.n_levels,
                                         cfg.scale_factor)[-1], imgs)
    print(f"  pyramid:            {pyr:8.3f} ms")
    fast_ms = scan_timed(all_levels(
        lambda lv: fast.detect(lv, 7.0, cfg.edge_margin)), imgs)
    print(f"  FAST+NMS all lvls:  {fast_ms:8.3f} ms (incl pyramid)")
    fs_ms = scan_timed(all_levels(lambda lv: fast.fast_score(lv, 7.0)),
                       imgs)
    print(f"    fast_score only:  {fs_ms:8.3f} ms (incl pyramid)")
    blur_ms = scan_timed(all_levels(pyramid.gaussian_blur), imgs)
    print(f"  blur all lvls:      {blur_ms:8.3f} ms (incl pyramid)")

    # cell top1 + topk
    def sel_levels(im):
        levels = pyramid.build_pyramid(im, cfg.n_levels, cfg.scale_factor)
        budget = extractor.features_per_level(
            cfg.n_features, cfg.n_levels, cfg.scale_factor)
        out = 0.0
        for lv, n_lv in zip(levels, budget):
            score = fast.detect(lv, 7.0, cfg.edge_margin)
            cs, cxy = extractor._cell_top1(score, cfg.cell_size)
            k = min(n_lv, cs.shape[0])
            tv, ti = jax.lax.top_k(cs, k)
            out = out + jnp.sum(cxy[ti])
        return out
    sel_ms = scan_timed(sel_levels, imgs)
    print(f"  detect+cell+topk:   {sel_ms:8.3f} ms (incl pyramid+fast)")

    # patches + descriptors on staged keypoints per level
    budget = extractor.features_per_level(
        cfg.n_features, cfg.n_levels, cfg.scale_factor)
    rng = np.random.default_rng(0)

    def desc_stage(im):
        levels = pyramid.build_pyramid(im, cfg.n_levels, cfg.scale_factor)
        out = 0.0
        for lv, n_lv in zip(levels, budget):
            hh, ww = lv.shape
            xy = jnp.stack([
                jnp.linspace(20.0, ww - 20.0, n_lv),
                jnp.linspace(20.0, hh - 20.0, n_lv)], axis=-1)
            blurred = pyramid.gaussian_blur(lv)
            ang, desc = orb.orient_and_describe(blurred, xy)
            out = out + jnp.sum(desc)
        return out
    de_ms = scan_timed(desc_stage, imgs)
    print(f"  blur+patch+desc:    {de_ms:8.3f} ms (incl pyramid)")

    def patch_stage(im):
        levels = pyramid.build_pyramid(im, cfg.n_levels, cfg.scale_factor)
        out = 0.0
        for lv, n_lv in zip(levels, budget):
            hh, ww = lv.shape
            xy = jnp.stack([
                jnp.linspace(20.0, ww - 20.0, n_lv),
                jnp.linspace(20.0, hh - 20.0, n_lv)], axis=-1)
            out = out + jnp.sum(orb.extract_patches(lv, xy))
        return out
    pa_ms = scan_timed(patch_stage, imgs)
    print(f"  patches only:       {pa_ms:8.3f} ms (incl pyramid)")


if __name__ == "__main__":
    main()
