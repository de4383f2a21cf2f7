"""ORB feature extraction: pyramid -> FAST -> spatial top-k -> orientation
-> rBRIEF, as one jitted fixed-shape program per image size.

Replaces `ORBextractor::operator()` (/root/reference/src/ORBextractor.cc:1071):
pyramid (:1186), per-cell FAST with octree balancing (:763, :537),
Gaussian blur + descriptors (:1136-1150), coordinate rescale to level 0.

The octree (`DistributeOctTree`) is recursive/ragged and hostile to XLA;
it is replaced by per-cell top-1 selection followed by a per-level top-k
over cell winners — same spatial-spread objective, fixed shapes
(SURVEY.md section 7.2 flags this as an ATE-validated approximation).

Output is a fixed-capacity SoA `FrameFeatures` with a validity mask.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.config import ORBConfig
from tpuslam.frontend import fast, orb, pyramid


class FrameFeatures(NamedTuple):
    uv: jax.Array        # (N,2) float32, level-0 pixel coords
    level: jax.Array     # (N,)  int32 pyramid level
    angle: jax.Array     # (N,)  float32 orientation (radians)
    response: jax.Array  # (N,)  float32 FAST score
    desc: jax.Array      # (N,8) uint32 packed 256-bit descriptor
    valid: jax.Array     # (N,)  bool

    @property
    def capacity(self) -> int:
        return self.uv.shape[0]


def features_per_level(n_features: int, n_levels: int, scale: float) -> List[int]:
    """Geometric feature budget per level (ORBextractor ctor :408-460)."""
    inv = 1.0 / scale
    first = n_features * (1 - inv) / (1 - inv ** n_levels)
    counts, acc = [], 0
    for lv in range(n_levels - 1):
        c = int(round(first * inv ** lv))
        counts.append(c)
        acc += c
    counts.append(max(n_features - acc, 0))
    return counts


def _cell_top1(score, cell: int):
    """Per-cell maxima: returns (cell_scores (C,), cell_xy (C,2))."""
    h, w = score.shape
    hc, wc = h // cell, w // cell
    s = score[: hc * cell, : wc * cell]
    s = s.reshape(hc, cell, wc, cell).transpose(0, 2, 1, 3).reshape(hc * wc, -1)
    idx = jnp.argmax(s, axis=-1)
    val = jnp.take_along_axis(s, idx[:, None], axis=-1)[:, 0]
    cy = idx // cell
    cx = idx % cell
    gy = (jnp.arange(hc * wc) // wc) * cell + cy
    gx = (jnp.arange(hc * wc) % wc) * cell + cx
    return val, jnp.stack([gx, gy], axis=-1)


def _select_level(img_lv, n_kp: int, cfg: ORBConfig, threshold: float):
    """One pyramid level -> fixed n_kp keypoints (masked): FAST + cell
    balancing + top-k. Patches/descriptors are computed by the caller
    over ALL levels at once (one big MXU batch instead of 8 small
    ones)."""
    score = fast.detect(img_lv, threshold, cfg.edge_margin)
    cell_scores, cell_xy = _cell_top1(score, cfg.cell_size)
    k = min(n_kp, cell_scores.shape[0])
    top_val, top_idx = jax.lax.top_k(cell_scores, k)
    xy = cell_xy[top_idx].astype(jnp.float32)
    valid = top_val > 0
    if k < n_kp:  # pad to capacity
        pad = n_kp - k
        xy = jnp.concatenate([xy, jnp.zeros((pad, 2), jnp.float32)])
        top_val = jnp.concatenate([top_val, jnp.zeros((pad,), top_val.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    return xy, top_val.astype(jnp.float32), valid


def extract(img, cfg: ORBConfig):
    """Full-frame ORB extraction. img: (H,W) float32 grayscale [0,255].

    Returns FrameFeatures with capacity = cfg.n_features (+ rounding).

    Structure: per-level FAST/selection/patch-gather (image shapes
    differ per level), then ONE batched orientation + descriptor stage
    over the concatenated patch tensor — the descriptor matmul is the
    extraction hot spot and wants the full keypoint batch (measured
    7.2 ms as 8 per-level matmuls vs ~0.5 ms batched)."""
    levels = pyramid.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    budget = features_per_level(cfg.n_features, cfg.n_levels, cfg.scale_factor)

    uvs, lvls, resps, valids, patches = [], [], [], [], []
    for lv, (img_lv, n_lv) in enumerate(zip(levels, budget)):
        xy, resp, valid = _select_level(
            img_lv, n_lv, cfg, float(cfg.min_th_fast)
        )
        blurred = pyramid.gaussian_blur(img_lv)
        patches.append(orb.extract_patches(blurred, xy))
        s = cfg.scale_factor ** lv
        uvs.append(xy * s)
        lvls.append(jnp.full((xy.shape[0],), lv, jnp.int32))
        resps.append(resp)
        valids.append(valid)

    all_patches = jnp.concatenate(patches)
    angle = orb.orientation(all_patches)
    desc = orb.descriptors_from_patches(all_patches, angle)

    return FrameFeatures(
        uv=jnp.concatenate(uvs),
        level=jnp.concatenate(lvls),
        angle=angle,
        response=jnp.concatenate(resps),
        desc=desc,
        valid=jnp.concatenate(valids),
    )


@functools.partial(jax.jit, static_argnums=(1,))
def extract_jit(img, cfg: ORBConfig):
    return extract(img, cfg)


def scale_factors(cfg: ORBConfig) -> np.ndarray:
    return np.asarray([cfg.scale_factor ** lv for lv in range(cfg.n_levels)],
                      np.float32)
