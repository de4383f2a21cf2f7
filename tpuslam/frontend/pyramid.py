"""Image pyramid + separable Gaussian blur, fixed static shapes per level.

Replaces `ORBextractor::ComputePyramid` (/root/reference/src/ORBextractor.cc:1186)
and the 7x7 sigma=2 GaussianBlur applied before descriptor sampling
(:1136-1150). Level shapes are computed at trace time from the static
input shape, so the whole pyramid is one fused XLA program — no OpenCV,
no per-level host round trips.
"""

from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(h: int, w: int, n_levels: int, scale: float) -> List[Tuple[int, int]]:
    """Static (h, w) per pyramid level (level 0 = full resolution)."""
    out = []
    for lv in range(n_levels):
        s = scale ** lv
        out.append((max(int(round(h / s)), 16), max(int(round(w / s)), 16)))
    return out


def build_pyramid(img, n_levels: int, scale: float):
    """img (H,W) float32 -> list of per-level images (static shapes)."""
    h, w = img.shape
    shapes = level_shapes(h, w, n_levels, scale)
    levels = [img]
    for lv in range(1, n_levels):
        lh, lw = shapes[lv]
        # Resize from the previous level (matches the reference's chained
        # cv::resize) — cheaper than resizing from level 0 every time.
        prev = levels[-1]
        levels.append(jax.image.resize(prev, (lh, lw), method="bilinear"))
    return levels


@functools.lru_cache(maxsize=8)
def _gauss_kernel(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img, size: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur with reflect padding (cv::GaussianBlur
    BORDER_REFLECT_101 analog).

    Implemented as unrolled shift-multiply-adds (pure VPU work): XLA's
    single-channel spatial-conv path costs ~ms per level on TPU, the
    shift-add form is microseconds."""
    k = _gauss_kernel(size, sigma)
    pad = size // 2
    h, w = img.shape
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="reflect")
    img = sum(float(k[i]) * x[i : i + h, :] for i in range(size))
    x = jnp.pad(img, ((0, 0), (pad, pad)), mode="reflect")
    return sum(float(k[i]) * x[:, i : i + w] for i in range(size))
