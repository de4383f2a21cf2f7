"""Keypoint orientation (intensity centroid) + rotated-BRIEF descriptors,
patch-based and MXU-friendly.

Replaces `IC_Angle` / `computeOrbDescriptor`
(/root/reference/src/ORBextractor.cc, invoked from operator() :1071,
blur+descriptors at :1136-1150). TPU formulation chosen by measurement:

- A dense 31x31 moment convolution costs ~160 ms/frame on v5e (XLA's
  large-spatial-kernel conv path); per-sample random gathers for BRIEF
  cost ~0.4 us each; per-keypoint dynamic_slice patch DMAs serialize.
  Everything is instead formulated as MXU matmuls on one (N,33,33)
  patch tensor extracted by one-hot row/col selection matmuls:
  * orientation: two masked-moment dot products over the patch,
  * BRIEF: rotation quantized to N_ANGLE_BINS with linear interpolation
    between adjacent bins (angle-continuous sampling); per-bin sampling
    = precomputed +-1 difference-selection matrices, evaluated for all
    bins in one (N,1089)x(B,1089,256) einsum, keypoint bins picked with
    take_along_axis.

Bits are compared on f32 accumulations, then packed to 8 x uint32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PATCH_RADIUS = 15   # HALF_PATCH_SIZE in the reference
PATCH = 33          # gathered patch edge (covers +-13 pattern + rotation)
HALF = PATCH // 2
N_BITS = 256
# 32 angle bins (11.25 deg, close to the original ORB's 12 deg): the
# linear interpolation between adjacent bins in descriptors_from_patches
# makes sampling effectively continuous in angle, so finer bins only
# cost MXU work (measured: purity holds at 32+interp; it degraded at
# 32 with hard nearest-bin lookup).
N_ANGLE_BINS = 32


def extract_patches(img, xy, patch: int = PATCH):
    """Gather (N, patch, patch) windows centered at integer keypoint
    positions (clamped at borders; the extractor's edge margin keeps
    real keypoints interior).

    Implemented as TWO one-hot selection matmuls (row-select then
    col-select) instead of N vmapped dynamic_slices: per-keypoint DMAs
    serialize on TPU (~5 ms/frame across the pyramid), while the
    selection matmuls ride the MXU (<1 ms). One-hot entries are exact in
    bf16 and each output is a single selected value, so an hi/lo split
    of the image keeps patches f32-exact at bf16 matmul speed."""
    h, w = img.shape
    n = xy.shape[0]
    starts_y = jnp.clip(xy[:, 1].astype(jnp.int32) - patch // 2, 0, h - patch)
    starts_x = jnp.clip(xy[:, 0].astype(jnp.int32) - patch // 2, 0, w - patch)
    rows = starts_y[:, None] + jnp.arange(patch)[None, :]       # (N,P)
    cols = starts_x[:, None] + jnp.arange(patch)[None, :]       # (N,P)
    row_sel = (rows[:, :, None] ==
               jnp.arange(h)[None, None, :]).astype(jnp.bfloat16)
    col_sel = (cols[:, None, :] ==
               jnp.arange(w)[None, :, None]).astype(jnp.bfloat16)  # (N,W,P)

    hi = img.astype(jnp.bfloat16)
    lo = (img - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    # Row selection: (N*P, H) @ (H, W) — exact per hi/lo component.
    def rsel(component):
        return jnp.einsum("nph,hw->npw", row_sel, component,
                          preferred_element_type=jnp.float32)

    tmp = rsel(hi) + rsel(lo)                                    # (N,P,W) f32
    thi = tmp.astype(jnp.bfloat16)
    tlo = (tmp - thi.astype(jnp.float32)).astype(jnp.bfloat16)

    def csel(component):
        return jnp.einsum("npw,nwq->npq", component, col_sel,
                          preferred_element_type=jnp.float32)

    return csel(thi) + csel(tlo)                                 # (N,P,P)


@functools.lru_cache(maxsize=4)
def _moment_masks(patch: int = PATCH, radius: int = PATCH_RADIUS):
    c = patch // 2
    ys, xs = np.mgrid[0:patch, 0:patch]
    ys = ys - c
    xs = xs - c
    circle = (xs * xs + ys * ys <= radius * radius).astype(np.float32)
    return (
        (xs * circle).astype(np.float32).reshape(-1),
        (ys * circle).astype(np.float32).reshape(-1),
    )


def orientation(patches):
    """Intensity-centroid angle per patch: atan2(m01, m10). Ref: IC_Angle."""
    mx, my = _moment_masks(patches.shape[-1])
    flat = patches.reshape(patches.shape[0], -1)
    m10 = flat @ jnp.asarray(mx)
    m01 = flat @ jnp.asarray(my)
    return jnp.arctan2(m01, m10)


@functools.lru_cache(maxsize=2)
def _brief_pattern(seed: int = 42, n_bits: int = N_BITS, radius: int = 12):
    """(n_bits, 2, 2) float point-pair offsets, Gaussian sigma=radius/2,
    resampled into the DISC |p| <= radius (the ORB paper's generative
    construction; we do not copy the learned bit_pattern_31 table —
    descriptors are self-consistent within this engine).

    Disc (not square-clip) support matters: rotation preserves the L2
    radius, so every rotated sample stays inside the radius-12 disc and
    the descriptor never reads pixels that leave the structure patch as
    it rotates. With the original square clip, ~12% of samples sat at
    L2 up to radius*sqrt(2) and swung onto unrelated surroundings under
    rotation — measured as a cross-descriptor alias floor of 54 bits
    (different landmarks matching at 54!) because those bits encode the
    shared background, not the landmark."""
    rng = np.random.default_rng(seed)
    out = np.zeros((n_bits, 2, 2), np.float32)
    for k in range(n_bits):
        for w in range(2):
            while True:
                p = rng.normal(0.0, radius / 2.0, size=2)
                if p @ p <= radius * radius:
                    out[k, w] = np.round(p)
                    break
    return out


@functools.lru_cache(maxsize=2)
def _rotated_diff_selection(seed: int = 42, patch: int = PATCH,
                            bins: int = N_ANGLE_BINS):
    """(bins, patch*patch, N_BITS) +-1 difference matrices: column k of
    bin b computes I(p2_k) - I(p1_k) for pattern pair k rotated by bin
    b's angle (entries exact in bf16)."""
    pat = _brief_pattern(seed)          # (256, 2 points, 2 coords)
    c = patch // 2
    sel = np.zeros((bins, patch * patch, N_BITS), np.float32)
    # Each sample reads a 3x3 box average instead of a single pixel:
    # the synthetic/natural texture under a keypoint decorrelates within
    # ~1 px, so single-pixel BRIEF flips ~24/256 bits per pixel of
    # redetection scatter (measured); the box average (still the same
    # selection-matmul, just 9 entries of weight sign/9 per sample)
    # halves that at zero runtime cost. BRIEF's own authors smooth the
    # samples for exactly this reason (sigma-5 integral windows).
    box = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    for b in range(bins):
        a = 2.0 * np.pi * b / bins
        ca, sa = np.cos(a), np.sin(a)
        for which, sign in ((0, -1.0), (1, +1.0)):  # bit = I(p1) < I(p2)
            px, py = pat[:, which, 0], pat[:, which, 1]
            rx = np.clip(np.round(ca * px - sa * py), -c + 1, c - 1)
            ry = np.clip(np.round(sa * px + ca * py), -c + 1, c - 1)
            for dx, dy in box:
                idx = ((ry + dy + c) * patch
                       + (rx + dx + c)).astype(np.int64)
                # += so a pair that rounds to the same pixel nets to 0.
                np.add.at(sel[b], (idx, np.arange(N_BITS)), sign / 9.0)
    # Cache as a HOST array (ml_dtypes bf16): caching a jnp array here
    # would capture a tracer when first touched inside a jit trace and
    # poison every later trace (UnexpectedTracerError).
    import ml_dtypes
    return sel.astype(ml_dtypes.bfloat16)


def descriptors_from_patches(patches, angle, pattern_seed: int = 42):
    """(N,patch,patch) float patches + (N,) angles -> (N,8) uint32.

    The bf16 hi/lo split keeps the sampled differences f32-exact while
    both matmuls ride the MXU (bf16 quantization of raw patches flips
    near-equal BRIEF comparisons otherwise).

    The bin axis is FOLDED into the matmul columns: an "nf,bfs->nbs"
    einsum lowers to B batched (N,F)x(F,S) matmuls whose tiny M x S
    tiles leave the MXU pipeline-latency-bound (measured 7.2 ms/frame
    across the pyramid); one (N,F)x(F,B*S) matmul with the same FLOPs
    runs in a few hundred microseconds."""
    n = patches.shape[0]
    patch = patches.shape[-1]
    sel = _rotated_diff_selection(pattern_seed, patch)           # (B,F,S)
    B, F, S = sel.shape
    sel2d = np.transpose(sel, (1, 0, 2)).reshape(F, B * S)       # (F,B*S)
    flat = patches.reshape(n, -1)                                # (N,F) f32
    hi = flat.astype(jnp.bfloat16)
    lo = (flat - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    diff = (
        jnp.einsum("nf,fs->ns", hi, sel2d,
                   preferred_element_type=jnp.float32)
        + jnp.einsum("nf,fs->ns", lo, sel2d,
                     preferred_element_type=jnp.float32)
    ).reshape(n, B, S)                                           # (N,B,S)
    # Linear interpolation between the two adjacent angle bins: the diff
    # is linear in the selection matrix, so this equals sampling with an
    # angle-continuous (bilinear) pattern — removes the bin-boundary
    # descriptor jumps that a hard nearest-bin lookup causes.
    # Implemented as a per-keypoint one-hot bin-weight contraction, NOT
    # take_along_axis: a middle-axis gather from (N,B,S) lowers to
    # serialized per-row DMAs on TPU (measured 7.3 ms/frame — the
    # single hottest op of the whole tracking step); the einsum is a
    # trivial fused multiply-reduce.
    two_pi = 2.0 * jnp.pi
    pos = jnp.mod(angle, two_pi) * (N_ANGLE_BINS / two_pi)
    b0 = jnp.floor(pos).astype(jnp.int32) % N_ANGLE_BINS
    b1 = (b0 + 1) % N_ANGLE_BINS
    wfrac = pos - jnp.floor(pos)
    bins = jnp.arange(N_ANGLE_BINS, dtype=jnp.int32)
    wbin = (jnp.where(b0[:, None] == bins[None, :], 1.0 - wfrac[:, None],
                      0.0)
            + jnp.where(b1[:, None] == bins[None, :], wfrac[:, None],
                        0.0))                                    # (N,B)
    dsel = jnp.einsum("nb,nbs->ns", wbin, diff)                  # (N,S)
    bits = (dsel > 0).astype(jnp.uint32)                         # I(p1)<I(p2)
    bits = bits.reshape(n, 8, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None]
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)


def orient_and_describe(blurred, xy, pattern_seed: int = 42):
    """Fused helper: patches -> (angle (N,), desc (N,8))."""
    patches = extract_patches(blurred, xy)
    ang = orientation(patches)
    return ang, descriptors_from_patches(patches, ang, pattern_seed)
