"""Monocular two-view bootstrapping: batched essential-matrix RANSAC +
pose recovery + structure.

Replaces `TwoViewReconstruction` / `Initializer`
(/root/reference/src/TwoViewReconstruction.cc, src/Initializer.cc:
parallel H/F RANSAC with 200 iterations, model selection, ReconstructF/H,
CheckRT). RANSAC is embarrassingly parallel, so the TPU formulation runs
ALL hypotheses as one batch: sample (iters,8) minimal sets, solve the
8-point systems with one batched SVD, score every hypothesis against
every correspondence as an (iters, N) matrix, and argmax — no early
exit, fixed shapes, deterministic under a PRNG key.

The homography path of the reference handles planar/low-parallax init;
it is not yet implemented (model selection hook kept). The essential
path subsumes it for general 3D scenes; low-parallax failure is caught
by the parallax/cheirality gates and simply reports ok=False so the
caller retries with the next frame (same behavior as the reference's
failed init).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.geometry import triangulation


def essential_from_8pt(b1_sets, b2_sets):
    """Batched 8-point algorithm. b*_sets: (B,8,3) unit-depth bearings.
    Returns E (B,3,3) with essential structure enforced."""
    x1, y1 = b1_sets[..., 0], b1_sets[..., 1]
    x2, y2 = b2_sets[..., 0], b2_sets[..., 1]
    ones = jnp.ones_like(x1)
    # Rows of the constraint x2^T E x1 = 0.
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # (B,8,9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    e = vt[..., -1, :]  # (B,9) smallest singular vector
    E = e.reshape(e.shape[:-1] + (3, 3))
    # Enforce rank-2 with equal singular values.
    u, s, vt2 = jnp.linalg.svd(E)
    d = jnp.stack([jnp.ones_like(s[..., 0]), jnp.ones_like(s[..., 0]),
                   jnp.zeros_like(s[..., 0])], axis=-1)
    return u @ (d[..., None] * vt2)


def epipolar_errors(E, b1, b2):
    """Squared point-to-epipolar-line distances both ways.

    E: (...,3,3); b1,b2: (N,3). Returns (d1 (...,N), d2 (...,N)):
    d2 = distance of b2 to line E b1, d1 = distance of b1 to line E^T b2.
    Mirrors TwoViewReconstruction::CheckFundamental's two-sided scoring.
    """
    l2 = jnp.einsum("...ij,nj->...ni", E, b1)   # line in image 2
    l1 = jnp.einsum("...ji,nj->...ni", E, b2)   # line in image 1
    num = jnp.einsum("ni,...ni->...n", b2, l2)  # x2^T E x1 (same both ways)
    d2 = num * num / jnp.maximum(l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12)
    d1 = num * num / jnp.maximum(l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12)
    return d1, d2


def decompose_essential(E):
    """E -> (R (4,3,3), t (4,3)) candidate relative poses (cam2-from-cam1,
    |t|=1). Ref: TwoViewReconstruction::DecomposeE."""
    u, _, vt = jnp.linalg.svd(E)
    # Ensure proper rotations.
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))[..., None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                    E.dtype)
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[..., :, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


class TwoViewResult(NamedTuple):
    ok: jax.Array         # () bool
    R21: jax.Array        # (3,3) cam2-from-cam1
    t21: jax.Array        # (3,) unit norm
    X1: jax.Array         # (N,3) points in cam1 frame (world=cam1)
    good: jax.Array       # (N,) bool triangulated & checked
    n_inliers: jax.Array  # () int32 epipolar inliers of best model


def reconstruct(
    b1,
    b2,
    valid,
    key,
    iters: int = 256,
    focal: float = 450.0,
    sigma: float = 1.0,
    min_good: int = 50,
    min_parallax_cos: float = 0.99995,
):
    """Full two-view reconstruction from matched bearings (N,3) + mask.

    Scoring follows the reference (CheckFundamental): per-direction
    inlier test at chi2 3.841 sigma^2 px, score accumulates
    (5.991 sigma^2 - d2_px). Success criteria follow ReconstructF:
    the winning (R,t) must dominate alternatives and triangulate
    enough well-conditioned points.
    """
    n = b1.shape[0]
    dtype = b1.dtype
    p = valid.astype(dtype)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx = jax.random.choice(key, n, shape=(iters, 8), replace=True, p=p)
    E = essential_from_8pt(b1[idx], b2[idx])  # (iters,3,3)

    f2 = focal * focal
    th = 3.841 * sigma * sigma / f2
    th_score = 5.991 * sigma * sigma / f2
    d1, d2 = epipolar_errors(E, b1, b2)  # (iters, N)
    in1 = (d1 < th) & valid[None]
    in2 = (d2 < th) & valid[None]
    inl = in1 & in2
    score = jnp.sum(
        jnp.where(in1, th_score - d1, 0.0) + jnp.where(in2, th_score - d2, 0.0),
        axis=-1,
    ) * f2  # rescale for readability only
    best = jnp.argmax(score)
    E_best = E[best]
    inlier = inl[best]

    # Polish: least-squares refit of E on all inliers (two rounds with
    # re-scored inlier sets) — the minimal 8-point model alone leaves
    # degrees of direction error at realistic pixel noise.
    def refit(E_cur, inl_cur):
        x1, y1 = b1[:, 0], b1[:, 1]
        x2, y2 = b2[:, 0], b2[:, 1]
        ones = jnp.ones_like(x1)
        A = jnp.stack(
            [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones],
            axis=-1,
        ) * inl_cur.astype(dtype)[:, None]
        _, _, vt = jnp.linalg.svd(A[None], full_matrices=True)
        e = vt[0, -1, :]
        En = e.reshape(3, 3)
        u, s, vt2 = jnp.linalg.svd(En)
        En = u @ (jnp.asarray([1.0, 1.0, 0.0], dtype)[:, None] * vt2)
        dd1, dd2 = epipolar_errors(En, b1, b2)
        inl_new = (dd1 < th) & (dd2 < th) & valid
        return En, inl_new

    E_best, inlier = refit(E_best, inlier)
    E_best, inlier = refit(E_best, inlier)
    n_inl = jnp.sum(inlier).astype(jnp.int32)

    # Pose recovery: triangulate with all 4 candidates, count good points.
    Rs, ts = decompose_essential(E_best)  # (4,3,3),(4,3)
    eye = jnp.eye(3, dtype=dtype)
    zero = jnp.zeros(3, dtype)

    def eval_candidate(R, t):
        X = triangulation.triangulate_dlt(eye, zero, R, t, b1, b2)
        chk = triangulation.check_triangulation(
            eye, zero, R, t, X, b1, b2,
            reproj_th2=4.0 * sigma * sigma,
            min_parallax_cos=min_parallax_cos,
            focal=focal,
        )
        good = chk.ok & inlier
        return X, good, jnp.sum(good)

    Xs, goods, counts = jax.vmap(eval_candidate)(Rs, ts)
    k = jnp.argmax(counts)
    n_best = counts[k]
    # Uniqueness: best must clearly dominate (ReconstructF: no second
    # candidate above 0.75 * max).
    sorted_counts = jnp.sort(counts)
    second = sorted_counts[-2]
    ok = (
        (n_best >= min_good)
        & (second.astype(dtype) < 0.75 * n_best.astype(dtype))
    )
    return TwoViewResult(
        ok=ok,
        R21=Rs[k],
        t21=ts[k],
        X1=Xs[k],
        good=goods[k],
        n_inliers=n_inl,
    )
