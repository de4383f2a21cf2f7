"""The fused per-frame tracking step as one jittable device program.

This is the latency path of the whole engine (SURVEY.md section 7.0:
"the tracking step is one fused jitted program per sensor mode"): raw
grayscale frame in -> ORB extraction -> guided local-map matching ->
masked GN pose optimization -> pose + associations out. Host traffic is
image-in / pose-out; everything else stays on device.

Used by bench.py (throughput on the real chip) and __graft_entry__.py
(the driver's single-chip compile check)."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.config import SLAMConfig
from tpuslam.frontend import extractor
from tpuslam.tracking import tracker as _tracker


class TrackStepOut(NamedTuple):
    R: jax.Array
    t: jax.Array
    assoc: jax.Array
    n_inliers: jax.Array


def make_tracking_step(cfg: SLAMConfig):
    """Returns (step_fn, make_example_args). step_fn is jittable."""
    sf = extractor.scale_factors(cfg.orb)
    scale_lut = jnp.asarray(sf)
    inv_sigma2_lut = jnp.asarray(1.0 / (sf * sf))
    cam_params = jnp.asarray(cfg.camera.params, jnp.float32)
    img_wh = jnp.asarray([cfg.camera.width, cfg.camera.height], jnp.float32)
    orb_cfg = cfg.orb

    @jax.jit
    def step(img, R0, t0, mp_ids, mp_pos, mp_desc, mp_level, mp_ok):
        feats = extractor.extract(img, orb_cfg)
        # Geometry-free map stats (normal/dist range unset => the
        # viewing gates pass-through, matching a freshly spawned map).
        P = mp_pos.shape[0]
        mp_normal = jnp.zeros((P, 3), jnp.float32)
        mp_dmin = jnp.zeros((P,), jnp.float32)
        mp_dmax = jnp.zeros((P,), jnp.float32)
        R, t, assoc, n_inl, _, _ = _tracker._track_pose(
            R0, t0, mp_ids, mp_pos, mp_desc, mp_level, mp_ok,
            mp_normal, mp_dmin, mp_dmax,
            feats, cam_params, scale_lut, inv_sigma2_lut, img_wh,
        )
        return TrackStepOut(R=R, t=t, assoc=assoc, n_inliers=n_inl)

    return step


def example_args(cfg: SLAMConfig, n_map_points: int = 2048, seed: int = 0):
    """Synthetic-but-plausible inputs for compile checks / benches."""
    import numpy as np

    from tpuslam.datasets import synthetic

    world = synthetic.make_world(
        n_points=min(n_map_points, 500),
        h=cfg.camera.height, w=cfg.camera.width,
        fx=cfg.camera.fx, seed=seed,
    )
    R, t = synthetic.look_at(np.array([9.0, 0.0, 1.5]), np.zeros(3))
    img = synthetic.render(world, R, t)

    rng = np.random.default_rng(seed)
    P = n_map_points
    mp_pos = rng.uniform(-4, 4, size=(P, 3)).astype(np.float32)
    mp_pos[: len(world.points)] = world.points
    mp_desc = rng.integers(0, 2**32, size=(P, 8), dtype=np.uint32)
    mp_level = rng.integers(0, cfg.orb.n_levels, size=(P,), dtype=np.int32)
    mp_ok = np.ones((P,), bool)
    mp_ids = np.arange(P, dtype=np.int32)
    return (
        jnp.asarray(img, jnp.float32),
        jnp.asarray(R), jnp.asarray(t),
        jnp.asarray(mp_ids), jnp.asarray(mp_pos), jnp.asarray(mp_desc),
        jnp.asarray(mp_level), jnp.asarray(mp_ok),
    )
