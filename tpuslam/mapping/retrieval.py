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


DB_DESC = 256   # descriptors cached per keyframe (top-by-response)
DB_QUERY = 256  # query descriptors scored (top-by-response among valid)
# 256/256 sizing: revisit scoring lives on the most REPEATABLE corners,
# and response rank is stable under viewpoint change, so the top-256
# band on both sides carries the signal; the 4x FLOP cut puts the whole
# per-keyframe loop-detection budget (score + covisibility) near 2 ms
# at a full 512-KF pool (measured; 512/512 was 4.8 ms scoring alone).


class RetrievalDB(NamedTuple):
    """Device-resident retrieval index: each keyframe's top-DB_DESC
    descriptors (by response) stored PRE-UNPACKED as {0,1} bf16 bit rows
    with cached popcounts. Scoring a query is then one chunked
    (DB_QUERY,256)x(256,K*DB_DESC) MXU matmul — the bit unpacking (the
    r03 hot spot: re-unpacking the whole pool per query put loop
    detection at 16 ms/keyframe on chip) is paid once per keyframe at
    insertion, and the per-query device cost is FLAT in map size."""

    kf_valid: jax.Array  # (Kmax,)
    bits: jax.Array      # (Kmax, DB_DESC, 256) bf16 unpacked bits
    nbits: jax.Array     # (Kmax, DB_DESC) f32 popcounts
    valid: jax.Array     # (Kmax, DB_DESC)


def empty_db(max_kf: int, s: int = DB_DESC) -> RetrievalDB:
    return RetrievalDB(
        kf_valid=jnp.zeros((max_kf,), bool),
        bits=jnp.zeros((max_kf, s, 256), jnp.bfloat16),
        nbits=jnp.zeros((max_kf, s), jnp.float32),
        valid=jnp.zeros((max_kf, s), bool),
    )


def grow_db(db: RetrievalDB, new_cap: int) -> RetrievalDB:
    """Lazily grow the index with the keyframe pools
    (mapstate.grow_keyframes): the bit cache is the dominant per-map
    HBM cost (~131 KB/KF), so it only ever holds what the session has
    actually reached."""
    K = db.bits.shape[0]
    if new_cap <= K:
        return db
    pad = new_cap - K
    return RetrievalDB(
        kf_valid=jnp.pad(db.kf_valid, (0, pad)),
        bits=jnp.pad(db.bits, ((0, pad), (0, 0), (0, 0))),
        nbits=jnp.pad(db.nbits, ((0, pad), (0, 0))),
        valid=jnp.pad(db.valid, ((0, pad), (0, 0))),
    )


@jax.jit
def mark_keyframe(db: RetrievalDB, slot, desc, kp_valid,
                  response) -> RetrievalDB:
    """Insert keyframe `slot`: cache its top-DB_DESC valid descriptors
    by response, unpacked. Strong corners match strong corners across
    revisits (response is stable under viewpoint change), so the
    truncation keeps exactly the rows place recognition hits."""
    S = db.bits.shape[1]
    k = min(S, desc.shape[0])
    key = jnp.where(kp_valid, -response, jnp.inf)
    order = jnp.argsort(key)[:k]
    bits = matching.unpack_bits(desc[order])
    val = kp_valid[order]
    if k < S:  # frame capacity below the cache width: pad invalid rows
        bits = jnp.pad(bits, ((0, S - k), (0, 0)))
        val = jnp.pad(val, (0, S - k))
    return RetrievalDB(
        kf_valid=db.kf_valid.at[slot].set(True),
        bits=db.bits.at[slot].set(bits),
        nbits=db.nbits.at[slot].set(
            jnp.sum(bits, axis=1, dtype=jnp.float32)),
        valid=db.valid.at[slot].set(val),
    )


@jax.jit
def unmark_keyframe(db: RetrievalDB, slot) -> RetrievalDB:
    """Remove a culled keyframe from the index (KeyFrameDatabase::erase,
    /root/reference/src/KeyFrameDatabase.cc:56) — its stale descriptors
    must not keep winning retrieval scores."""
    return db._replace(kf_valid=db.kf_valid.at[slot].set(False),
                       valid=db.valid.at[slot].set(False))


@functools.partial(jax.jit, static_argnames=("chunk", "match_th"))
def score_db(
    db: RetrievalDB,
    desc_q,       # (Nq, 8) query frame descriptors
    valid_q,      # (Nq,)
    response_q,   # (Nq,) keypoint responses (query-side top-k selection)
    chunk: int = 128,
    match_th: int = 50,
):
    """(Kmax,) fraction of (top-DB_QUERY) query descriptors with a
    < match_th Hamming match in each keyframe's cached set (-1 for
    invalid slots)."""
    Q = min(DB_QUERY, desc_q.shape[0])
    key = jnp.where(valid_q, -response_q, jnp.inf)
    order = jnp.argsort(key)[:Q]
    q_bits = matching.unpack_bits(desc_q[order])     # (Q,256)
    q_valid = valid_q[order]
    nq = jnp.sum(q_bits, axis=1, dtype=jnp.float32)
    n_sel = jnp.maximum(jnp.sum(q_valid), 1.0)

    Kmax, S, _ = db.bits.shape

    def score_chunk(args):
        bits_c, nb_c, val_c = args                   # (C,S,256),(C,S)x2
        C = bits_c.shape[0]
        ab = jax.lax.dot_general(
            q_bits, bits_c.reshape(-1, 256),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (Q, C*S)
        dist = nq[:, None] + nb_c.reshape(-1)[None, :] - 2.0 * ab
        dist = jnp.where(val_c.reshape(-1)[None, :], dist, 1e9)
        dmin = jnp.min(dist.reshape(Q, C, S), axis=-1)
        hit = (dmin < match_th) & q_valid[:, None]
        return jnp.sum(hit, axis=0).astype(jnp.float32) / n_sel

    n_chunks = (Kmax + chunk - 1) // chunk
    pad = n_chunks * chunk - Kmax
    bp = jnp.pad(db.bits, ((0, pad), (0, 0), (0, 0)))
    np_ = jnp.pad(db.nbits, ((0, pad), (0, 0)))
    vp = jnp.pad(db.valid, ((0, pad), (0, 0)))
    scores = jax.lax.map(
        score_chunk,
        (bp.reshape(n_chunks, chunk, S, 256),
         np_.reshape(n_chunks, chunk, S),
         vp.reshape(n_chunks, chunk, S)),
    ).reshape(-1)[:Kmax]
    return jnp.where(db.kf_valid, scores, -1.0)


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
