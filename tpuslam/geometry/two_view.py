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

Both models of the reference run side by side: essential (8-point) and
homography (4-point DLT + Faugeras decomposition), each as one batched
hypothesis sweep, scored with the reference's accumulation rule; the
winner is picked by the score ratio RH = SH/(SH+SF) > 0.40
(TwoViewReconstruction::Reconstruct, src/TwoViewReconstruction.cc:120)
— planar and low-parallax scenes initialize through H, general scenes
through E, inside one fixed-shape jitted program (both families'
candidate poses are evaluated and the inactive family is masked out —
no data-dependent branching).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.geometry import triangulation

# Ablation toggle: force the essential path (trace-time constant).
_NO_H = bool(os.environ.get("TPUSLAM_NO_HINIT"))


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


def homography_from_4pt(b1_sets, b2_sets):
    """Batched 4-point DLT. b*_sets: (B,4,3) normalized-plane coords.
    Returns H (B,3,3) with x2 ~ H x1 (calibrated homography
    H = R + t n^T / d). Ref: TwoViewReconstruction::ComputeH21."""
    x1, y1 = b1_sets[..., 0], b1_sets[..., 1]
    x2, y2 = b2_sets[..., 0], b2_sets[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([-x1, -y1, -o, z, z, z, x2 * x1, x2 * y1, x2], axis=-1)
    r2 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)          # (B,8,9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    h = vt[..., -1, :]
    return h.reshape(h.shape[:-1] + (3, 3))


def homography_errors(H, b1, b2):
    """Symmetric transfer squared errors on the normalized plane.
    H: (...,3,3); b1,b2: (N,3). Returns (d1, d2) like epipolar_errors
    (CheckHomography's two-sided scoring)."""
    Hi = jnp.linalg.inv(H)

    def xfer(M, src, dst):
        p = jnp.einsum("...ij,nj->...ni", M, src)
        p = p[..., :2] / jnp.where(
            jnp.abs(p[..., 2:3]) > 1e-12, p[..., 2:3], 1e-12)
        return jnp.sum((p - dst[None, :, :2]) ** 2, axis=-1)

    return xfer(Hi, b2, b1), xfer(H, b1, b2)


def decompose_homography(H):
    """Calibrated H -> 8 motion hypotheses (R (8,3,3), t (8,3) unit).
    Faugeras & Lustman SVD decomposition, exactly the reference's
    ReconstructH case table (src/TwoViewReconstruction.cc:577)."""
    dtype = H.dtype
    U, w, Vt = jnp.linalg.svd(H)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = w[0], w[1], w[2]
    eps = 1e-12
    aux1 = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    aux3 = jnp.sqrt(jnp.maximum(
        (d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    sgn1 = jnp.asarray([1.0, 1.0, -1.0, -1.0], dtype)
    sgn3 = jnp.asarray([1.0, -1.0, 1.0, -1.0], dtype)
    x1 = sgn1 * aux1
    x3 = sgn3 * aux3

    # case d' = +d2 (rotation about y by theta)
    aux_st = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) \
        / jnp.maximum((d1 + d3) * d2, eps)
    ctheta = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, eps)
    stheta = jnp.asarray([1.0, -1.0, -1.0, 1.0], dtype) * aux_st

    def rp_pos(st):
        return jnp.asarray([[ctheta, 0.0, -st],
                            [0.0, 1.0, 0.0],
                            [st, 0.0, ctheta]], dtype)

    Rp_a = jax.vmap(rp_pos)(stheta)                       # (4,3,3)
    tp_a = jnp.stack([x1, jnp.zeros_like(x1), -x3], -1) * (d1 - d3)

    # case d' = -d2 (rotation about y by phi, with a flip)
    aux_sp = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) \
        / jnp.maximum((d1 - d3) * d2, eps)
    cphi = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, eps)
    sphi = jnp.asarray([1.0, -1.0, -1.0, 1.0], dtype) * aux_sp

    def rp_neg(sp):
        return jnp.asarray([[cphi, 0.0, sp],
                            [0.0, -1.0, 0.0],
                            [sp, 0.0, -cphi]], dtype)

    Rp_b = jax.vmap(rp_neg)(sphi)
    tp_b = jnp.stack([x1, jnp.zeros_like(x1), x3], -1) * (d1 + d3)

    Rp = jnp.concatenate([Rp_a, Rp_b])                    # (8,3,3)
    tp = jnp.concatenate([tp_a, tp_b])                    # (8,3)
    R = s * jnp.einsum("ij,njk,kl->nil", U, Rp, Vt)
    t = jnp.einsum("ij,nj->ni", U, tp)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    return R, t


class TwoViewResult(NamedTuple):
    ok: jax.Array         # () bool
    R21: jax.Array        # (3,3) cam2-from-cam1
    t21: jax.Array        # (3,) unit norm
    X1: jax.Array         # (N,3) points in cam1 frame (world=cam1)
    good: jax.Array       # (N,) bool triangulated & checked
    n_inliers: jax.Array  # () int32 epipolar inliers of best model
    used_h: jax.Array = None  # () bool: homography model won selection


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
    sf_d1, sf_d2 = epipolar_errors(E_best[None], b1, b2)
    SF = jnp.sum(
        jnp.where((sf_d1[0] < th) & valid, th_score - sf_d1[0], 0.0)
        + jnp.where((sf_d2[0] < th) & valid, th_score - sf_d2[0], 0.0))

    # ---- homography model on the same samples (4-point subsets).
    # CheckHomography tests AND scores at chi2 5.991 (two 2-dof
    # transfers), unlike F's 3.841 test (TwoViewReconstruction.cc:350).
    th_h = 5.991 * sigma * sigma / f2
    H = homography_from_4pt(b1[idx[:, :4]], b2[idx[:, :4]])
    hd1, hd2 = homography_errors(H, b1, b2)
    h_in = (hd1 < th_h) & (hd2 < th_h) & valid[None]
    h_score = jnp.sum(
        jnp.where((hd1 < th_h) & valid[None], th_h - hd1, 0.0)
        + jnp.where((hd2 < th_h) & valid[None], th_h - hd2, 0.0),
        axis=-1)
    h_best = jnp.argmax(h_score)
    H_best = H[h_best]
    h_inlier = h_in[h_best]

    def refit_h(H_cur, inl_cur):
        x1, y1 = b1[:, 0], b1[:, 1]
        x2, y2 = b2[:, 0], b2[:, 1]
        z = jnp.zeros_like(x1)
        o = jnp.ones_like(x1)
        w_r = inl_cur.astype(dtype)[:, None]
        r1 = jnp.stack([-x1, -y1, -o, z, z, z, x2 * x1, x2 * y1, x2],
                       axis=-1) * w_r
        r2 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2],
                       axis=-1) * w_r
        A = jnp.concatenate([r1, r2], axis=0)
        _, _, vt = jnp.linalg.svd(A[None], full_matrices=True)
        Hn = vt[0, -1, :].reshape(3, 3)
        dd1, dd2 = homography_errors(Hn[None], b1, b2)
        return Hn, (dd1[0] < th_h) & (dd2[0] < th_h) & valid

    H_best, h_inlier = refit_h(H_best, h_inlier)
    hh1, hh2 = homography_errors(H_best[None], b1, b2)
    SH = jnp.sum(
        jnp.where((hh1[0] < th_h) & valid, th_h - hh1[0], 0.0)
        + jnp.where((hh2[0] < th_h) & valid, th_h - hh2[0], 0.0))

    # Model selection: RH = SH/(SH+SF) > 0.40 picks the homography
    # (TwoViewReconstruction.cc:120; scores rescaled identically so the
    # ratio is unit-free).
    use_h = SH * f2 > 0.40 * (SH * f2 + SF * f2)
    if _NO_H:
        use_h = jnp.asarray(False)
    inlier = jnp.where(use_h, h_inlier, inlier)
    n_inl = jnp.sum(inlier).astype(jnp.int32)

    # Pose recovery: triangulate every candidate of BOTH families (4
    # essential + 8 Faugeras), mask the inactive family, count good
    # points (CheckRT vote of ReconstructF/ReconstructH).
    Rs_f, ts_f = decompose_essential(E_best)       # (4,3,3),(4,3)
    Rs_h, ts_h = decompose_homography(H_best)      # (8,3,3),(8,3)
    Rs = jnp.concatenate([Rs_f, Rs_h])
    ts = jnp.concatenate([ts_f, ts_h])
    fam_h = jnp.arange(12) >= 4
    active = jnp.where(use_h, fam_h, ~fam_h)
    eye = jnp.eye(3, dtype=dtype)
    zero = jnp.zeros(3, dtype)

    def eval_candidate(R, t, pcos):
        X = triangulation.triangulate_dlt(eye, zero, R, t, b1, b2)
        chk = triangulation.check_triangulation(
            eye, zero, R, t, X, b1, b2,
            reproj_th2=4.0 * sigma * sigma,
            min_parallax_cos=pcos,
            focal=focal,
        )
        good = chk.ok & inlier
        return X, good, jnp.sum(good)

    # The homography fits low-parallax pairs perfectly, so its
    # acceptance needs the reference's stricter parallax floor (1 deg,
    # ReconstructH's minParallax) — measured: without it a near-zero-
    # parallax pair initializes through H with biased depths and the
    # map never recovers (5x worse ATE downstream).
    pcos_vec = jnp.where(fam_h, jnp.float32(0.99985),
                         jnp.float32(min_parallax_cos))
    Xs, goods, counts = jax.vmap(eval_candidate)(Rs, ts, pcos_vec)
    counts = jnp.where(active, counts, 0)
    k = jnp.argmax(counts)
    n_best = counts[k]
    # Uniqueness: best must clearly dominate (ReconstructF/H: no second
    # candidate above 0.75 * max); H additionally must triangulate 90%
    # of its inliers (ReconstructH's bestGood > 0.9 N).
    sorted_counts = jnp.sort(counts)
    second = sorted_counts[-2]
    ok = (
        (n_best >= min_good)
        & (second.astype(dtype) < 0.75 * n_best.astype(dtype))
        & (~use_h | (n_best.astype(dtype)
                     > 0.9 * n_inl.astype(dtype)))
    )
    return TwoViewResult(
        ok=ok,
        R21=Rs[k],
        t21=ts[k],
        X1=Xs[k],
        good=goods[k],
        n_inliers=n_inl,
        used_h=use_h,
    )
