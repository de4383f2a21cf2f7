"""Stereo matching between rectified left/right ORB feature sets.

Replaces `Frame::ComputeStereoMatches` (/root/reference/src/Frame.cc:901):
the reference does per-row candidate lists + descriptor matching + SAD
subpixel scanline refinement; here the whole left-x-right association is
one dense masked Hamming matrix with epipolar-band, disparity-range and
scale gates (the same gates as the reference), solved by masked argmin;
`refine_subpixel` then runs the reference's SAD scanline correlation
(11 px window slid over +-5 px, parabola-interpolated minimum,
Frame.cc:975-1022) as one batched gather + einsum over every match at
once instead of a per-keypoint scalar loop.

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


_SAD_W = 5    # half-width of the correlation window (reference w=5)
_SAD_L = 5    # half-range of the scanline search (reference L=5)


@jax.jit
def refine_subpixel(
    img_l,                # (H,W) level-0 grayscale (same input as extract)
    img_r,                # (H,W)
    left_uv,              # (N,2) left keypoints
    sm: StereoMatches,
    bf,
) -> StereoMatches:
    """Subpixel disparity via SAD scanline correlation around the
    descriptor match (Frame::ComputeStereoMatches' refinement stage,
    /root/reference/src/Frame.cc:975-1022): an 11x11 left patch is
    correlated against 11 horizontal shifts of the right patch, the
    discrete minimum is refined by fitting a parabola through the three
    central SADs (deltaR = (L - R) / (2 (L - 2C + R))), and matches
    whose correction exceeds 1 px are dropped, exactly the reference's
    acceptance rule. Runs batched over all N matches as one gather +
    one |.| contraction — no per-keypoint loop."""
    H, W = img_l.shape
    N = left_uv.shape[0]
    w, L = _SAD_W, _SAD_L
    ui = jnp.round(left_uv[:, 0]).astype(jnp.int32)
    vi = jnp.round(left_uv[:, 1]).astype(jnp.int32)
    uri = jnp.round(sm.u_right).astype(jnp.int32)

    inb = (
        sm.valid
        & (vi >= w) & (vi < H - w)
        & (ui >= w) & (ui < W - w)
        & (uri >= w + L) & (uri < W - w - L)
    )
    ui_s = jnp.clip(ui, w, W - 1 - w)
    vi_s = jnp.clip(vi, w, H - 1 - w)
    uri_s = jnp.clip(uri, w + L, W - 1 - w - L)

    dy = jnp.arange(-w, w + 1)
    dx = jnp.arange(-w, w + 1)
    rows = vi_s[:, None] + dy[None, :]                      # (N,11)
    # Left patch, mean-normalized like the reference (it subtracts the
    # center intensity; the window mean is the same invariance and
    # vectorizes cleaner).
    patch_l = img_l[rows[:, :, None], (ui_s[:, None] + dx[None, :])[:, None, :]]
    patch_l = patch_l - jnp.mean(patch_l, axis=(1, 2), keepdims=True)
    # Right strip spans the full search range: 11 + 2L columns.
    sx = jnp.arange(-w - L, w + L + 1)
    strip = img_r[rows[:, :, None], (uri_s[:, None] + sx[None, :])[:, None, :]]
    # (N, offsets=2L+1, 11, 11) windows of the strip.
    off = jnp.arange(2 * L + 1)
    win_ix = off[:, None] + jnp.arange(2 * w + 1)[None, :]  # (11,11)
    wins = strip[:, :, win_ix]                              # (N,11,11off,11)
    wins = jnp.swapaxes(wins, 1, 2)                         # (N,off,11,11)
    wins = wins - jnp.mean(wins, axis=(2, 3), keepdims=True)
    sad = jnp.sum(jnp.abs(wins - patch_l[:, None]), axis=(2, 3))  # (N,off)

    best = jnp.argmin(sad, axis=1)
    best_c = jnp.clip(best, 1, 2 * L - 1)
    sL = jnp.take_along_axis(sad, (best_c - 1)[:, None], 1)[:, 0]
    sC = jnp.take_along_axis(sad, best_c[:, None], 1)[:, 0]
    sR = jnp.take_along_axis(sad, (best_c + 1)[:, None], 1)[:, 0]
    denom = 2.0 * (sL - 2.0 * sC + sR)
    delta = jnp.where(jnp.abs(denom) > 1e-6, (sL - sR) / denom, 0.0)
    ok_sub = (jnp.abs(delta) <= 1.0) & (best == best_c) & inb
    u_r_ref = uri_s.astype(jnp.float32) + (best_c - L) + delta
    disp = left_uv[:, 0] - u_r_ref
    ok = sm.valid & (jnp.where(ok_sub, disp, sm.disparity) > 0.0)
    disp = jnp.where(ok_sub, disp, sm.disparity)
    return StereoMatches(
        disparity=jnp.where(ok, disp, -1.0),
        u_right=jnp.where(ok, jnp.where(ok_sub, u_r_ref, sm.u_right), -1.0),
        depth=jnp.where(ok, bf / jnp.maximum(disp, 1e-6), jnp.inf),
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
