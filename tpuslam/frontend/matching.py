"""Hamming-distance data association, batched as dense masked matrices.

Replaces the 11 pointer-chasing search loops of `ORBmatcher`
(/root/reference/src/ORBmatcher.cc: SearchByProjection x4 :44/:489/:2027/
:2291, SearchByBoW :273/:839, SearchForInitialization :722,
SearchForTriangulation :981, Fuse :1425/:1664, SearchBySim3 :1788).

The reference prunes candidates with a per-frame 64x48 grid and DBoW2
feature-vector buckets because CPU Hamming tests are expensive. On TPU
the full NxM popcount distance matrix is cheap (XOR + popcount on
(N,1,8)^(1,M,8) uint32 words), so every matcher is: full distance
matrix -> boolean candidate mask (window / epipolar / level / already-
matched) -> masked row argmin -> ratio & threshold & mutual gates ->
rotation-consistency histogram. Constants TH_HIGH=100, TH_LOW=50,
HISTO_LENGTH=30 from /root/reference/src/ORBmatcher.cc:36-38.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

TH_HIGH = 100
TH_LOW = 50
HISTO_BINS = 30
BIG = jnp.int32(1 << 30)


def unpack_bits(desc):
    """(N,8) uint32 packed descriptor -> (N,256) bfloat16 {0,1} bits."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(desc.shape[0], -1).astype(jnp.bfloat16)


def hamming_matrix(da, db):
    """(N,8) x (M,8) uint32 -> (N,M) int32 Hamming distances.

    Ref: ORBmatcher::DescriptorDistance (:2463) popcount. The TPU-native
    formulation rides the MXU: with descriptors unpacked to {0,1} bit
    vectors, popcount(a XOR b) = |a| + |b| - 2 a.b, so the whole NxM
    distance matrix is one 256-deep matmul (exact: bf16 products are
    0/1, accumulation forced to f32). The elementwise XOR+popcount
    broadcast variant is ~50x slower on TPU — it cannot use the MXU.
    """
    A = unpack_bits(da)
    B = unpack_bits(db)
    na = jnp.sum(A, axis=1, dtype=jnp.float32)
    nb = jnp.sum(B, axis=1, dtype=jnp.float32)
    ab = jax.lax.dot_general(
        A, B,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (na[:, None] + nb[None, :] - 2.0 * ab).astype(jnp.int32)


class MatchResult(NamedTuple):
    idx: jax.Array    # (N,) int32 index into B, -1 if unmatched
    dist: jax.Array   # (N,) int32 best distance (BIG if unmatched)


def masked_best2(dist, mask):
    """Row-wise best and second-best over a masked distance matrix."""
    d = jnp.where(mask, dist, BIG)
    best_idx = jnp.argmin(d, axis=1)
    best = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(BIG)
    second = jnp.min(d2, axis=1)
    return best_idx.astype(jnp.int32), best, second


def match(
    da,
    db,
    valid_a,
    valid_b,
    mask: Optional[jax.Array] = None,
    max_dist: int = TH_LOW,
    ratio: float = 1.0,
    mutual: bool = False,
) -> MatchResult:
    """Generic masked matcher A->B with threshold / Lowe-ratio / mutual gates."""
    dist = hamming_matrix(da, db)
    m = valid_a[:, None] & valid_b[None, :]
    if mask is not None:
        m = m & mask
    idx, best, second = masked_best2(dist, m)
    ok = (best <= max_dist) & valid_a
    if ratio < 1.0:
        ok = ok & (best.astype(jnp.float32) <= ratio * second.astype(jnp.float32))
    if mutual:
        # B's best-A must point back (SearchForInitialization's reciprocal
        # overwrite check, ORBmatcher.cc:722 vnMatches21 bookkeeping).
        idx_b, _, _ = masked_best2(dist.T, m.T)
        back = jnp.take(idx_b, jnp.clip(idx, 0, db.shape[0] - 1))
        ok = ok & (back == jnp.arange(da.shape[0]))
    return MatchResult(
        idx=jnp.where(ok, idx, -1),
        dist=jnp.where(ok, best, BIG),
    )


def rotation_consistency(angle_a, angle_b, res: MatchResult,
                         bins: int = HISTO_BINS, keep_top: int = 3) -> MatchResult:
    """Keep only matches whose orientation difference falls in the top-k
    histogram bins (ORBmatcher.cc:36-38 HISTO_LENGTH logic, e.g. :2110-2136)."""
    n = angle_a.shape[0]
    matched = res.idx >= 0
    ang_b = jnp.take(angle_b, jnp.clip(res.idx, 0, angle_b.shape[0] - 1))
    dang = angle_a - ang_b
    two_pi = 2.0 * jnp.pi
    dang = jnp.mod(dang, two_pi)  # [0, 2pi)
    bin_idx = jnp.clip((dang * bins / two_pi).astype(jnp.int32), 0, bins - 1)
    hist = jnp.zeros((bins,), jnp.int32).at[bin_idx].add(matched.astype(jnp.int32))
    top_vals, top_bins = jax.lax.top_k(hist, keep_top)
    # Reference keeps bins 2&3 only if reasonably populated (>0.1*max common).
    good_bin = (top_vals > 0) & (top_vals.astype(jnp.float32)
                                 >= 0.1 * top_vals[0].astype(jnp.float32))
    in_top = jnp.any(
        (bin_idx[:, None] == top_bins[None, :]) & good_bin[None, :], axis=1
    )
    ok = matched & in_top
    return MatchResult(idx=jnp.where(ok, res.idx, -1),
                       dist=jnp.where(ok, res.dist, BIG))


def window_mask(uv_a, uv_b, radius):
    """(N,M) mask: |uv_a - uv_b|_inf within radius (scalar or (N,) per-row)."""
    d = jnp.abs(uv_a[:, None, :] - uv_b[None, :, :])
    r = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (uv_a.shape[0],))
    return jnp.all(d <= r[:, None, None], axis=-1)


def level_mask(level_a, level_b, lo: int = -1, hi: int = 1):
    """Scale-consistency gate: level_b within [level_a+lo, level_a+hi]."""
    d = level_b[None, :] - level_a[:, None]
    return (d >= lo) & (d <= hi)


def epipolar_mask(E12, bearings1, bearings2, th: float = 3.84e-4):
    """(N,M) Sampson-style epipolar gate in normalized coords.

    Ref: CheckDistEpipolarLine in SearchForTriangulation (:981); threshold
    on the squared distance to the epipolar line (3.84 * sigma^2 in pixels
    in the reference; here in normalized coords, caller scales th by
    1/f^2 * level sigma^2).
    """
    # l2 = E12 @ x1 ; distance of x2 to line l2.
    l2 = jnp.einsum("ij,nj->ni", E12, bearings1)  # (N,3)
    num = jnp.einsum("mi,ni->nm", bearings2, l2)  # (N,M): x2^T E x1
    den = l2[:, None, 0] ** 2 + l2[:, None, 1] ** 2
    d2 = num * num / jnp.maximum(den, 1e-12)
    return d2 <= th


def search_by_projection(
    uv_proj,        # (M,2) projected map points (level-0 px)
    level_pred,     # (M,) predicted octave per map point
    valid_mp,       # (M,)
    desc_mp,        # (M,8)
    feats,          # FrameFeatures
    scale_factors,  # (L,) jnp array
    radius: float = 15.0,
    max_dist: int = TH_HIGH,
    ratio: float = 1.0,
    level_ref=None,  # (M,) optional stored reference octave
) -> MatchResult:
    """Map-point -> frame-keypoint guided matching.

    Ref: ORBmatcher::SearchByProjection (frame tracking variants :44/:2027):
    search window scaled by the predicted octave's scale factor, candidate
    levels [pred-1, pred+1]. With `level_ref`, a keypoint level inside
    EITHER window (predicted-from-distance or stored-at-creation) is
    accepted — robust when the scene violates the constant-physical-size
    assumption behind PredictScale (the descriptor gate still decides).
    """
    r = radius * jnp.take(scale_factors, jnp.clip(level_pred, 0,
                                                  scale_factors.shape[0] - 1))
    mask = window_mask(uv_proj, feats.uv, r)
    lmask = level_mask(level_pred, feats.level)
    if level_ref is not None:
        lmask = lmask | level_mask(level_ref, feats.level)
    mask = mask & lmask
    return match(desc_mp, feats.desc, valid_mp, feats.valid, mask,
                 max_dist=max_dist, ratio=ratio)
