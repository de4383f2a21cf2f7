"""Batched EPnP-RANSAC absolute-pose solver (relocalization).

Plays the role of MLPnPsolver in Tracking::Relocalization
(/root/reference/src/Tracking.cc:3811-3836: RANSAC(0.99, 10 inliers,
300 iters, min set 6) over 2D-3D matches) and of the legacy EPnP
PnPsolver (/root/reference/src/PnPsolver.cc). The reference iterates
hypotheses sequentially until enough inliers; RANSAC is embarrassingly
parallel, so here ALL hypotheses run at once as one batched program:

  sample H minimal sets of 6 matches -> per-hypothesis EPnP:
    world points as barycentric combinations of 4 control points,
    camera-frame control points from the null vector of M^T M
    (12x12 symmetric eigendecomposition — batched `eigh` is TPU-native),
    scale+sign from inter-control-point distances and cheirality,
    rigid Horn alignment world->camera
  -> score every hypothesis against ALL matches by reprojection inliers
  -> pick the best.

The caller polishes the winner with solver.pose_opt (the reference also
follows RANSAC with PoseOptimization, src/Tracking.cc:3844).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

MINSET = 6


class PnPResult(NamedTuple):
    ok: jax.Array         # () bool
    R: jax.Array          # (3,3) camera-from-world
    t: jax.Array          # (3,)
    inlier: jax.Array     # (N,) bool (under the winning hypothesis)
    n_inliers: jax.Array  # () int32


def _horn_rigid(A, B, w):
    """Weighted rigid alignment B ~= R A + t (no scale). A,B (n,3), w (n,)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    ca = jnp.einsum("n,ni->i", w, A) / wsum
    cb = jnp.einsum("n,ni->i", w, B) / wsum
    H = jnp.einsum("n,ni,nj->ij", w, A - ca, B - cb)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0]).at[2].set(d))
    R = Vt.T @ D @ U.T
    t = cb - R @ ca
    return R, t


def _epnp_one(Xw, bear, cw, alpha):
    """One EPnP hypothesis from MINSET world points + bearings.

    Xw (m,3), bear (m,3) unit-depth bearings (x/z, y/z, 1), cw (4,3)
    world control points, alpha (m,4) barycentric coords. Returns (R, t).
    """
    m = Xw.shape[0]
    # M rows: for each point i and its bearing (u,v) (normalized):
    #   sum_j alpha_ij * (cx_j - u * cz_j) = 0
    #   sum_j alpha_ij * (cy_j - v * cz_j) = 0
    u = bear[:, 0]
    v = bear[:, 1]
    zeros = jnp.zeros((m, 4))
    # Unknown x = [c1x c1y c1z c2x ... c4z] (12,)
    row_u = jnp.stack([alpha, zeros, -u[:, None] * alpha], axis=-1)  # (m,4,3)
    row_v = jnp.stack([zeros, alpha, -v[:, None] * alpha], axis=-1)
    M = jnp.concatenate([row_u.reshape(m, 12), row_v.reshape(m, 12)], axis=0)
    MtM = M.T @ M
    _, vecs = jnp.linalg.eigh(MtM)
    x = vecs[:, 0].reshape(4, 3)          # camera control points, up to scale
    # Scale beta: match the 6 inter-control-point distances.
    ii, jj = jnp.triu_indices(4, 1)
    dc = jnp.linalg.norm(x[ii] - x[jj], axis=-1)
    dw = jnp.linalg.norm(cw[ii] - cw[jj], axis=-1)
    beta = jnp.sum(dc * dw) / jnp.maximum(jnp.sum(dc * dc), 1e-12)
    cc = beta * x
    # Cheirality: points must land in front of the camera.
    Xc = alpha @ cc
    sign = jnp.where(jnp.mean(Xc[:, 2]) < 0, -1.0, 1.0)
    Xc = sign * Xc
    return _horn_rigid(Xw, Xc, jnp.ones((m,)))


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def ransac_pnp(
    Xw,            # (N,3) world points
    bear,          # (N,3) unit-depth bearings of matched keypoints
    valid,         # (N,) bool
    key,
    inlier_th: float = 0.01,   # reproj threshold in normalized coords
    min_inliers: int = 10,
    n_hyp: int = 128,
) -> PnPResult:
    N = Xw.shape[0]
    # Sample minimal sets weighted toward valid entries: draw from the
    # valid indices (with replacement across hypotheses; a degenerate
    # duplicate sample just wastes one hypothesis).
    (vidx,) = jnp.nonzero(valid, size=N, fill_value=0)
    n_valid = jnp.sum(valid)
    picks = jax.random.randint(
        key, (n_hyp, MINSET), 0, jnp.maximum(n_valid, 1))
    sets = vidx[picks]                                # (H,m)

    # World control points: centroid + principal axes of the full set
    # (shared across hypotheses — EPnP's standard choice).
    wmask = valid.astype(Xw.dtype)
    wsum = jnp.maximum(jnp.sum(wmask), 1.0)
    c0 = jnp.einsum("n,ni->i", wmask, Xw) / wsum
    d = (Xw - c0) * wmask[:, None]
    C = d.T @ d / wsum
    evals, evecs = jnp.linalg.eigh(C)
    axes = evecs.T * jnp.sqrt(jnp.maximum(evals, 1e-9))[:, None]
    cw = jnp.concatenate([c0[None], c0[None] + axes], axis=0)  # (4,3)

    # Barycentric coordinates: [cw1; ...] affine basis inverse.
    B = jnp.concatenate([cw.T, jnp.ones((1, 4), Xw.dtype)], axis=0)  # (4,4)
    Binv = jnp.linalg.inv(B)

    def alpha_of(X):
        Xh = jnp.concatenate([X, jnp.ones((X.shape[0], 1), X.dtype)], axis=1)
        return Xh @ Binv.T                                        # (m,4)

    def hyp(idx):
        Xs = Xw[idx]
        bs = bear[idx]
        R, t = _epnp_one(Xs, bs, cw, alpha_of(Xs))
        return R, t

    Rs, ts = jax.vmap(hyp)(sets)                      # (H,3,3), (H,3)

    # Score each hypothesis against all matches (normalized reprojection).
    Xc = jnp.einsum("hij,nj->hni", Rs, Xw) + ts[:, None, :]
    z = Xc[..., 2]
    pu = Xc[..., 0] / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    pv = Xc[..., 1] / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    err2 = (pu - bear[None, :, 0]) ** 2 + (pv - bear[None, :, 1]) ** 2
    good = (err2 < inlier_th * inlier_th) & (z > 0.01) & valid[None, :]
    scores = jnp.sum(good, axis=1)
    finite = jnp.all(jnp.isfinite(Rs.reshape(n_hyp, -1)), axis=1) \
        & jnp.all(jnp.isfinite(ts), axis=1)
    scores = jnp.where(finite, scores, -1)
    best = jnp.argmax(scores)
    n_inl = scores[best]
    return PnPResult(
        ok=n_inl >= min_inliers,
        R=Rs[best],
        t=ts[best],
        inlier=good[best],
        n_inliers=n_inl.astype(jnp.int32),
    )
