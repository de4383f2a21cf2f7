"""Sim(3) estimation: batched Horn RANSAC + reprojection refinement.

Replaces `Sim3Solver` (/root/reference/src/Sim3Solver.cc — RANSAC Horn
closed-form between two keyframes' matched 3D points, used by place
recognition at src/LoopClosing.cc:810-812) and `Optimizer::OptimizeSim3`
(src/Optimizer.cc:3970 — g2o refinement over bidirectional reprojection
edges). All RANSAC hypotheses are solved and scored as one batch.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.geometry import cameras, lie


def horn_sim3(X1, X2, w=None):
    """Closed-form (s, R, t) minimizing ||X2 - (s R X1 + t)||^2.

    X1, X2: (...,P,3); w: optional (...,P) weights. Horn's method with
    Umeyama's scale (the reference's ComputeSim3)."""
    if w is None:
        w = jnp.ones(X1.shape[:-1], X1.dtype)
    wsum = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-9)
    mu1 = jnp.sum(X1 * w[..., None], -2) / wsum
    mu2 = jnp.sum(X2 * w[..., None], -2) / wsum
    c1 = X1 - mu1[..., None, :]
    c2 = X2 - mu2[..., None, :]
    cov = jnp.einsum("...pi,...p,...pj->...ij", c2, w, c1) / wsum[..., None]
    u, d, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(u) * jnp.linalg.det(vt)
    S = jnp.ones_like(d).at[..., 2].set(jnp.sign(det))
    R = u @ (S[..., :, None] * vt)
    var1 = jnp.sum(jnp.sum(c1 * c1, -1) * w, -1) / wsum[..., 0]
    s = jnp.sum(d * S, -1) / jnp.maximum(var1, 1e-12)
    t = mu2 - s[..., None] * jnp.einsum("...ij,...j->...i", R, mu1)
    return s, R, t


class Sim3Result(NamedTuple):
    ok: jax.Array
    s: jax.Array          # ()
    R: jax.Array          # (3,3)
    t: jax.Array          # (3,)
    inlier: jax.Array     # (P,)
    n_inliers: jax.Array


@functools.partial(jax.jit, static_argnames=("iters", "min_inliers"))
def ransac_sim3(
    X1, X2, valid, key,
    uv1, uv2, inv_sigma1, inv_sigma2,
    R1, t1, R2, t2,
    cam_params,
    iters: int = 128,
    chi2_th: float = 9.21,
    min_inliers: int = 20,
) -> Sim3Result:
    """Batched RANSAC Sim3 between matched map points of two keyframes.

    X1/X2: (P,3) world points as seen by each map side; valid: (P,) the
    putative matches. Scoring = bidirectional reprojection chi2 in both
    keyframes (Sim3Solver::CheckInliers semantics): project X1 through
    S21 into KF2 and X2 through S12 into KF1.
    """
    P = X1.shape[0]
    dtype = X1.dtype
    p = valid.astype(dtype)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx = jax.random.choice(key, P, shape=(iters, 3), replace=True, p=p)
    s_h, R_h, t_h = horn_sim3(X1[idx], X2[idx])    # hypotheses (iters,...)

    def reproj_chi2(s, R, t):
        # Map side-1 points into side-2 world, project into KF2.
        X1in2 = s[..., None, None] * jnp.einsum("...ij,pj->...pi", R, X1) + \
            t[..., None, :]
        uv_pred2 = cameras.project(
            jnp.einsum("ij,...pj->...pi", R2, X1in2) + t2, cam_params)
        e2 = jnp.sum((uv_pred2 - uv2) ** 2, -1) * inv_sigma2
        # Inverse transform side-2 points into side-1 world, project KF1.
        si, Ri, ti = lie.sim3_inverse(s, R, t)
        X2in1 = si[..., None, None] * jnp.einsum("...ij,pj->...pi", Ri, X2) \
            + ti[..., None, :]
        uv_pred1 = cameras.project(
            jnp.einsum("ij,...pj->...pi", R1, X2in1) + t1, cam_params)
        e1 = jnp.sum((uv_pred1 - uv1) ** 2, -1) * inv_sigma1
        return e1, e2

    e1, e2 = reproj_chi2(s_h, R_h, t_h)           # (iters,P)
    inl = (e1 < chi2_th) & (e2 < chi2_th) & valid[None]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    inlier = inl[best]

    # Refit on inliers.
    s, R, t = horn_sim3(X1, X2, inlier.astype(dtype))
    e1, e2 = reproj_chi2(s, R, t)
    inlier = (e1 < chi2_th) & (e2 < chi2_th) & valid
    n = jnp.sum(inlier).astype(jnp.int32)
    return Sim3Result(ok=n >= min_inliers, s=s, R=R, t=t,
                      inlier=inlier, n_inliers=n)


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_sim3(
    s0, R0, t0,
    X1, X2, valid,
    uv1, uv2, inv_sigma1, inv_sigma2,
    R1, t1, R2, t2,
    cam_params,
    iters: int = 10,
    chi2_th: float = 9.21,
    fix_scale: bool = False,
):
    """GN refinement of Sim3 over bidirectional reprojection
    (OptimizeSim3, Optimizer.cc:3970). Parameterized as
    [omega(3), v(3), log_ds(1)] applied left-multiplicatively."""
    dtype = X1.dtype

    def residuals(th, s, R, t):
        dR, dt = lie.se3_exp(th[:6])
        ds = jnp.exp(th[6])
        s2 = s * ds
        R2_ = dR @ R
        t2_ = jnp.einsum("ij,j->i", dR, t) * ds + dt
        X1in2 = s2 * X1 @ R2_.T + t2_
        uvp2 = cameras.project(X1in2 @ R2.T + t2, cam_params)
        r2 = (uvp2 - uv2) * jnp.sqrt(inv_sigma2)[:, None]
        si, Ri, ti = lie.sim3_inverse(s2, R2_, t2_)
        X2in1 = si * X2 @ Ri.T + ti
        uvp1 = cameras.project(X2in1 @ R1.T + t1, cam_params)
        r1 = (uvp1 - uv1) * jnp.sqrt(inv_sigma1)[:, None]
        return r1, r2, s2, R2_, t2_

    def step(carry, _):
        s, R, t, inlier = carry
        z = jnp.zeros(7, dtype)

        def flat_res(th):
            r1, r2, _, _, _ = residuals(th, s, R, t)
            w = inlier.astype(dtype)[:, None]
            return jnp.concatenate([(r1 * w).reshape(-1),
                                    (r2 * w).reshape(-1)])

        r = flat_res(z)
        J = jax.jacfwd(flat_res)(z)
        if fix_scale:
            J = J.at[:, 6].set(0.0)
        H = J.T @ J + 1e-6 * jnp.eye(7, dtype=dtype)
        d = jnp.linalg.solve(H, -J.T @ r)
        if fix_scale:
            d = d.at[6].set(0.0)
        _, _, s, R, t = residuals(d, s, R, t)
        r1, r2, _, _, _ = residuals(jnp.zeros(7, dtype), s, R, t)
        chi1 = jnp.sum(r1 * r1, -1)
        chi2 = jnp.sum(r2 * r2, -1)
        inlier = valid & (chi1 < chi2_th) & (chi2 < chi2_th)
        return (s, R, t, inlier), None

    (s, R, t, inlier), _ = jax.lax.scan(
        step, (s0, R0, t0, valid), None, length=iters)
    return s, R, t, inlier, jnp.sum(inlier).astype(jnp.int32)
