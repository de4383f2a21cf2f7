"""Keypoint orientation (intensity centroid) + rotated-BRIEF descriptors.

Replaces `computeOrientation`/`IC_Angle` and `computeOrbDescriptor`
(/root/reference/src/ORBextractor.cc, invoked from operator() :1071,
blur+descriptors at :1136-1150) with a TPU-friendly formulation:

- Orientation: instead of per-keypoint patch loops, the circular-patch
  image moments m10/m01 are computed DENSELY for the whole level with two
  31x31 convolutions (MXU-friendly), then gathered at keypoint locations.
  angle = atan2(m01, m10), identical math to IC_Angle.
- Descriptors: a 256-pair sampling pattern is rotated by the keypoint
  angle and sampled with nearest-neighbor gathers from the Gaussian-
  blurred level image, then bit-packed to 8 x uint32.

The sampling pattern is generated once from a fixed seed (Gaussian
sigma = patch/5, the construction described in the ORB paper) rather
than copying the learned `bit_pattern_31` table — descriptors are
self-consistent within this engine (we also build our own vocabulary),
so only the pattern's statistical properties matter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PATCH_RADIUS = 15  # HALF_PATCH_SIZE in the reference
N_BITS = 256


@functools.lru_cache(maxsize=4)
def _moment_kernels(radius: int):
    """Circular-patch x/y moment kernels, shape (2, 1, K, K)."""
    k = 2 * radius + 1
    ys, xs = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    circle = (xs * xs + ys * ys <= radius * radius).astype(np.float32)
    mx = (xs * circle).astype(np.float32)
    my = (ys * circle).astype(np.float32)
    return np.stack([mx[None], my[None]])  # (2,1,K,K)


def moment_maps(img, radius: int = PATCH_RADIUS):
    """Dense (m10, m01) maps over the image via convolution."""
    kern = jnp.asarray(_moment_kernels(radius))  # (2,1,K,K)
    out = jax.lax.conv_general_dilated(
        img[None, None, :, :],
        kern,
        window_strides=(1, 1),
        padding="SAME",
    )  # (1,2,H,W)
    return out[0, 0], out[0, 1]


def angles_at(m10, m01, xy):
    """Gather orientation (radians) at integer keypoint positions xy (N,2)."""
    h, w = m10.shape
    x = jnp.clip(xy[:, 0].astype(jnp.int32), 0, w - 1)
    y = jnp.clip(xy[:, 1].astype(jnp.int32), 0, h - 1)
    flat = y * w + x
    return jnp.arctan2(
        jnp.take(m01.reshape(-1), flat), jnp.take(m10.reshape(-1), flat)
    )


@functools.lru_cache(maxsize=2)
def _brief_pattern(seed: int = 42, n_bits: int = N_BITS, radius: int = 13):
    """(n_bits, 2, 2) int32 point-pair offsets, Gaussian sigma=radius/2,
    clipped to the patch (fits inside the 31x31 descriptor patch even
    after rotation margin handled by the extractor's edge margin)."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, radius / 2.0, size=(n_bits, 2, 2))
    pts = np.clip(np.round(pts), -radius, radius).astype(np.float32)
    return pts  # (256, 2 points, 2 coords [x, y])


def descriptors(blurred, xy, angle, pattern_seed: int = 42):
    """Compute 256-bit rBRIEF descriptors.

    blurred: (H,W) float32 Gaussian-blurred level image.
    xy: (N,2) float32 keypoint positions (level pixel coords).
    angle: (N,) float32 orientation in radians.
    Returns (N,8) uint32.
    """
    h, w = blurred.shape
    pat = jnp.asarray(_brief_pattern(pattern_seed))  # (256,2,2)
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # (N,)
    # Rotate pattern per keypoint: p' = [[c,-s],[s,c]] @ [px,py].
    px, py = pat[..., 0], pat[..., 1]  # (256,2)
    rx = ca[:, None, None] * px[None] - sa[:, None, None] * py[None]
    ry = sa[:, None, None] * px[None] + ca[:, None, None] * py[None]
    sx = jnp.clip(jnp.round(xy[:, 0, None, None] + rx), 0, w - 1).astype(jnp.int32)
    sy = jnp.clip(jnp.round(xy[:, 1, None, None] + ry), 0, h - 1).astype(jnp.int32)
    flat = (sy * w + sx).reshape(xy.shape[0], -1)  # (N, 512)
    vals = jnp.take(blurred.reshape(-1), flat).reshape(xy.shape[0], N_BITS, 2)
    bits = (vals[:, :, 0] < vals[:, :, 1]).astype(jnp.uint32)  # (N,256)
    # Pack to (N,8) uint32.
    bits = bits.reshape(xy.shape[0], 8, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)
