"""Place recognition: brute-force descriptor-set scoring on the MXU.

Replaces DBoW2's `TemplatedVocabulary` + `KeyFrameDatabase` inverted file
(/root/reference/Thirdparty/DBoW2, src/KeyFrameDatabase.cc:620
DetectNBestCandidates / :814 DetectRelocalizationCandidates).

The reference needs a 1M-word learned vocabulary tree + inverted file
because brute-force Hamming matching against every stored keyframe is
hopeless on a CPU. On TPU that brute force IS the idiomatic solution:
scoring a query frame against EVERY keyframe's full descriptor set is a
chunked batch of 256-deep bit matmuls (~hundreds of GFLOP-seconds worth
of MXU for a 512-keyframe map, i.e. milliseconds), and it is strictly
more discriminative than any quantized vocabulary — no word-collision
noise, no training data needed. (An LSH-word TF-IDF variant was tried
first and measured: word collisions across distinct landmarks saturated
the histograms; see git history.)

Score(query, keyframe) = #{query descriptors whose best Hamming match in
that keyframe is below `match_th`} / #query descriptors — a normalized
putative-match count, the same quantity the reference approximates with
shared-word counting.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.frontend import matching


class RetrievalDB(NamedTuple):
    """Kept for API symmetry: the descriptor 'database' is the keyframe
    pool itself (desc (Kmax,N,8) uint32 + masks); nothing is duplicated."""

    kf_valid: jax.Array  # (Kmax,)


def empty_db(max_kf: int) -> RetrievalDB:
    return RetrievalDB(kf_valid=jnp.zeros((max_kf,), bool))


@jax.jit
def mark_keyframe(db: RetrievalDB, slot) -> RetrievalDB:
    return RetrievalDB(kf_valid=db.kf_valid.at[slot].set(True))


@jax.jit
def unmark_keyframe(db: RetrievalDB, slot) -> RetrievalDB:
    """Remove a culled keyframe from the index (KeyFrameDatabase::erase,
    /root/reference/src/KeyFrameDatabase.cc:56) — its stale descriptors
    must not keep winning retrieval scores."""
    return RetrievalDB(kf_valid=db.kf_valid.at[slot].set(False))


def accumulate_group_scores(scores, covis, min_weight: int = 15,
                            top_n: int = 10):
    """Covisibility-group accumulated scores (host numpy, K<=pool size).

    The reference stabilizes place recognition by ranking *groups*: each
    candidate's score is accumulated over its covisibility group (the
    candidate plus its best covisible neighbors), and the best keyframe
    of the best group wins (KeyFrameDatabase::DetectNBestCandidates,
    /root/reference/src/KeyFrameDatabase.cc:620 — accScore over the
    top-10 covisibles). A true revisit lights up several neighboring
    keyframes at once; a perceptual-alias one-off lights up only itself,
    so group accumulation separates them.

    The group is each keyframe's top-`top_n` MOST-COVISIBLE neighbors
    (ranked by shared-point weight, the reference's
    GetBestCovisibilityKeyFrames(10)) — not the top-scoring neighbors,
    which would inflate large densely-connected groups.

    scores: (K,) raw per-keyframe scores, -1 = excluded/invalid.
    covis:  (K,K) covisibility weight matrix (shared-point counts).
    Returns (K,) accumulated scores; excluded slots stay -1.
    """
    import numpy as np

    scores = np.asarray(scores)
    covis = np.asarray(covis)
    K = scores.shape[0]
    ok = scores >= 0.0
    w = np.where((covis >= min_weight) & ok[None, :], covis, -1)
    k = min(top_n, K)
    if k < K:
        top_idx = np.argpartition(-w, k - 1, axis=1)[:, :k]
    else:
        top_idx = np.broadcast_to(np.arange(K), (K, K)).copy()
    rows = np.arange(K)[:, None]
    sel_ok = w[rows, top_idx] > 0
    acc = scores + np.where(sel_ok, scores[top_idx], 0.0).sum(axis=1)
    return np.where(ok, acc, -1.0)


@functools.partial(jax.jit, static_argnames=("chunk", "match_th"))
def score_keyframes(
    kf_desc,      # (Kmax, N, 8) uint32 — the map's keyframe descriptors
    kf_kp_valid,  # (Kmax, N)
    kf_valid,     # (Kmax,)
    desc_q,       # (Nq, 8) query frame descriptors
    valid_q,      # (Nq,)
    chunk: int = 32,
    match_th: int = 50,
):
    """(Kmax,) fraction of query descriptors with a < match_th Hamming
    match in each keyframe (-1 for invalid slots)."""
    Kmax, N, _ = kf_desc.shape
    Q = matching.unpack_bits(desc_q)                    # (Nq,256) bf16
    nq = jnp.sum(Q, axis=1, dtype=jnp.float32)          # (Nq,)
    n_valid_q = jnp.maximum(jnp.sum(valid_q), 1.0)

    def score_chunk(dc, vc):
        # dc: (C,N,8) -> bits (C*N,256)
        B = matching.unpack_bits(dc.reshape(-1, 8))
        nb = jnp.sum(B, axis=1, dtype=jnp.float32)
        ab = jax.lax.dot_general(
            Q, B, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # (Nq, C*N)
        dist = nq[:, None] + nb[None, :] - 2.0 * ab
        dist = jnp.where(vc.reshape(-1)[None, :], dist, 1e9)
        dmin = jnp.min(dist.reshape(Q.shape[0], dc.shape[0], N), axis=-1)
        hit = (dmin < match_th) & valid_q[:, None]
        return jnp.sum(hit, axis=0).astype(jnp.float32) / n_valid_q

    n_chunks = (Kmax + chunk - 1) // chunk
    pad = n_chunks * chunk - Kmax
    dpad = jnp.pad(kf_desc, ((0, pad), (0, 0), (0, 0)))
    vpad = jnp.pad(kf_kp_valid, ((0, pad), (0, 0)))
    scores = jax.lax.map(
        lambda args: score_chunk(*args),
        (dpad.reshape(n_chunks, chunk, N, 8),
         vpad.reshape(n_chunks, chunk, N)),
    ).reshape(-1)[:Kmax]
    return jnp.where(kf_valid, scores, -1.0)
