"""Stereo matching between rectified left/right ORB feature sets.

Replaces `Frame::ComputeStereoMatches` (/root/reference/src/Frame.cc:901):
the reference does per-row candidate lists + descriptor matching + SAD
subpixel scanline refinement; here the whole left-x-right association is
one dense masked Hamming matrix with epipolar-band, disparity-range and
scale gates (the same gates as the reference), solved by masked argmin.
Subpixel SAD refinement is TODO (the rounded keypoint disparity is
within ~0.5 px; the depth prior it feeds is refined by BA anyway).

Outputs per left keypoint: disparity + right-x (mvuRight analog) and
depth given bf (= baseline * fx).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.frontend import matching
from tpuslam.frontend.extractor import FrameFeatures


class StereoMatches(NamedTuple):
    disparity: jax.Array  # (N,) px at level 0 (<=0 if invalid)
    u_right: jax.Array    # (N,) matched right-image x (level 0)
    depth: jax.Array      # (N,) bf/disparity (inf if invalid)
    valid: jax.Array      # (N,)


@jax.jit
def match_stereo(
    left: FrameFeatures,
    right: FrameFeatures,
    scale_lut,            # (L,)
    bf,                   # baseline * fx
    min_disp: float = 0.5,
    max_disp: float = 128.0,
    max_dist: int = matching.TH_HIGH,
) -> StereoMatches:
    # Epipolar band: same row within ~2 px scaled by the left octave
    # (Frame.cc:934 uses 2*sigma of the level).
    lv = jnp.clip(left.level, 0, scale_lut.shape[0] - 1)
    band = 2.0 * scale_lut[lv]
    dv = jnp.abs(left.uv[:, None, 1] - right.uv[None, :, 1])
    du = left.uv[:, None, 0] - right.uv[None, :, 0]  # disparity candidates
    mask = (
        (dv <= band[:, None])
        & (du >= min_disp)
        & (du <= max_disp)
    )
    mask = mask & matching.level_mask(left.level, right.level)
    res = matching.match(left.desc, right.desc, left.valid, right.valid,
                         mask=mask, max_dist=max_dist, ratio=1.0)
    j = jnp.clip(res.idx, 0, right.uv.shape[0] - 1)
    disp = left.uv[:, 0] - right.uv[j, 0]
    ok = (res.idx >= 0) & (disp > min_disp)
    disp = jnp.where(ok, disp, -1.0)
    depth = jnp.where(ok, bf / jnp.maximum(disp, 1e-6), jnp.inf)
    return StereoMatches(
        disparity=disp,
        u_right=jnp.where(ok, right.uv[j, 0], -1.0),
        depth=depth,
        valid=ok,
    )


def backproject(feats: FrameFeatures, stereo: StereoMatches, cam_params):
    """Camera-frame 3D points for valid stereo matches (the near-point
    spawning of StereoInitialization / CreateNewKeyFrame,
    src/Tracking.cc:2301/:3334)."""
    fx, fy, cx, cy = (cam_params[0], cam_params[1], cam_params[2],
                      cam_params[3])
    z = stereo.depth
    x = (feats.uv[:, 0] - cx) / fx * z
    y = (feats.uv[:, 1] - cy) / fy * z
    X = jnp.stack([x, y, z], axis=-1)
    return jnp.where(stereo.valid[:, None], X, 0.0)
