"""FAST-16/9 corner scores + 3x3 non-max suppression, fully vectorized.

Replaces the per-cell cv::FAST calls of `ORBextractor::ComputeKeyPointsOctTree`
(/root/reference/src/ORBextractor.cc:763, FAST grid at :767-854). Instead of
data-dependent per-cell detection, the score is computed densely for every
pixel with 16 static shifts of the image (pure VPU work that XLA fuses),
then NMS'd; spatial balancing happens afterwards in the extractor via
per-cell top-k (the TPU reformulation of the octree,
`DistributeOctTree` :537).

Score definition: for a corner (>=9 contiguous circle pixels all brighter
than center+t or all darker than center-t), the score is the summed
threshold excess over the full circle on the dominant side — the same
"sum of absolute difference over the arc" family OpenCV uses; selection
downstream is rank-based so only the ordering matters (validated by the
end ATE metric per SURVEY.md section 7.2).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3 (same 16 offsets as the reference's FAST),
# ordered around the circle so arc contiguity is meaningful.
CIRCLE = np.array(
    [
        (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1),
        (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    ],
    dtype=np.int32,
)
ARC_LEN = 9


def _shifted(img, dy: int, dx: int):
    """Image translated by (dy,dx) with edge padding (borders are masked
    out by the caller's edge margin anyway)."""
    return jnp.roll(img, shift=(-dy, -dx), axis=(0, 1))


def fast_score(img, threshold: float):
    """Dense FAST-9/16 score map, zero where not a corner.

    img: (H,W) float32 grayscale.
    """
    t = jnp.asarray(threshold, img.dtype)
    ring = jnp.stack(
        [_shifted(img, int(dy), int(dx)) for (dx, dy) in CIRCLE], axis=0
    )  # (16,H,W)
    center = img[None]
    bright = ring > center + t
    dark = ring < center - t

    def has_arc(flags):
        # >=9 contiguous true values on the circular ring.
        ext = jnp.concatenate([flags, flags[: ARC_LEN - 1]], axis=0)  # (24,H,W)
        acc = ext[:16]
        for j in range(1, ARC_LEN):
            acc = jnp.logical_and(acc, ext[j : j + 16])
        return jnp.any(acc, axis=0)

    is_bright = has_arc(bright)
    is_dark = has_arc(dark)

    excess_b = jnp.sum(jnp.maximum(ring - center - t, 0.0), axis=0)
    excess_d = jnp.sum(jnp.maximum(center - ring - t, 0.0), axis=0)
    score = jnp.maximum(
        jnp.where(is_bright, excess_b, 0.0), jnp.where(is_dark, excess_d, 0.0)
    )
    return score


def nms3(score):
    """3x3 non-max suppression: keep strict local maxima (ties broken by
    keeping the first in raster order via epsilon on shifted copies)."""
    h, w = score.shape
    p = jnp.pad(score, 1, mode="constant")
    neigh = jnp.stack(
        [
            p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
            if not (dy == 0 and dx == 0)
        ],
        axis=0,
    )
    keep = score >= jnp.max(neigh, axis=0) + 1e-6
    return jnp.where(keep, score, 0.0)


def detect(img, threshold: float, edge_margin: int):
    """FAST score map with NMS and border masking. Returns (H,W) scores."""
    s = nms3(fast_score(img, threshold))
    h, w = img.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inb = (
        (ys >= edge_margin)
        & (ys < h - edge_margin)
        & (xs >= edge_margin)
        & (xs < w - edge_margin)
    )
    return jnp.where(inb, s, 0.0)
