"""Batched local bundle adjustment with explicit landmark Schur complement.

Replaces `Optimizer::LocalBundleAdjustment` (/root/reference/src/
Optimizer.cc:1776; g2o LM, BlockSolver_6_3, landmarks marginalized) with
a dense, fixed-shape Levenberg-Marquardt:

- Observations are a dense (K keyframes x M points) masked grid — on TPU
  the dense residual/Jacobian grid is cheaper than sparse bookkeeping at
  local-window sizes (K<=32, M<=8192), and every contraction is an
  einsum the MXU eats directly.
- The normal system  [[U, W],[W^T, V]] [dc, dp] = [bc, bp]  is reduced by
  eliminating landmarks: S = U - W V^-1 W^T (6K x 6K dense Cholesky),
  then dp = V^-1 (bp - W^T dc). This IS the reference's BlockSolver
  landmark marginalization, expressed as three einsums + one small solve.
- Fixed keyframes (the one-hop anchor ring, Optimizer.cc:1817-1832) are
  conditioned out by zeroing their rows/cols of S and unit-pinning the
  diagonal, i.e. solving with dc_fixed = 0.
- Robust Huber reweighting per iteration; LM damping with accept/reject
  on the true masked chi2 (no graph surgery — outliers are weights).

The same routine serves GlobalBundleAdjustment for maps that fit the
dense grid; the sharded variant for big maps lives in tpuslam.parallel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.geometry import cameras
from tpuslam.solver import factors

CHI2_MONO = 5.991


class BAProblem(NamedTuple):
    kf_R: jax.Array        # (K,3,3) camera-from-world
    kf_t: jax.Array        # (K,3)
    kf_fixed: jax.Array    # (K,) bool — anchors (and invalid slots)
    points: jax.Array      # (M,3) world
    pt_valid: jax.Array    # (M,) bool
    obs_uv: jax.Array      # (K,M,2)
    obs_mask: jax.Array    # (K,M) bool
    obs_inv_sigma2: jax.Array  # (K,M)


class BAResult(NamedTuple):
    kf_R: jax.Array
    kf_t: jax.Array
    points: jax.Array
    chi2: jax.Array        # (K,M) final per-observation chi2
    inlier: jax.Array      # (K,M) chi2 <= threshold & mask
    total_chi2: jax.Array  # ()


def _residuals(prob: BAProblem, kf_R, kf_t, points, cam_params, model):
    Xc = jnp.einsum("kij,mj->kmi", kf_R, points) + kf_t[:, None, :]
    pred = cameras.project(Xc, cam_params, model)
    r = pred - prob.obs_uv
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    return r, Xc, chi2


@functools.partial(
    jax.jit, static_argnames=("model", "iters", "use_huber", "axis_name")
)
def optimize(
    prob: BAProblem,
    cam_params,
    model: str = "pinhole",
    iters: int = 10,
    lambda0: float = 1e-4,
    chi2_th: float = CHI2_MONO,
    use_huber: bool = True,
    axis_name: str = None,
) -> BAResult:
    """When `axis_name` is set, the problem's landmark dimension M is a
    LOCAL shard inside a `shard_map` over that mesh axis: every sum over
    landmarks (pose-block Hessian U, Schur matrix S, reduced gradient,
    cost) becomes a partial sum + `psum`, while the landmark-block solve
    (V^-1, point updates) stays shard-local. That is the distributed-BA
    layout of SURVEY.md section 5.7: landmark blocks sharded, reduced
    camera system assembled via collectives over ICI, solved replicated."""
    K = prob.kf_R.shape[0]
    M = prob.points.shape[0]
    dtype = prob.kf_R.dtype
    eyeK6 = jnp.eye(6 * K, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)

    if axis_name is not None:
        allreduce = lambda x: jax.lax.psum(x, axis_name)  # noqa: E731
    else:
        allreduce = lambda x: x  # noqa: E731

    mask = prob.obs_mask & prob.pt_valid[None, :]
    maskf = mask.astype(dtype)

    def masked_chi2(kf_R, kf_t, points):
        _, _, chi2 = _residuals(prob, kf_R, kf_t, points, cam_params, model)
        return allreduce(
            jnp.sum(jnp.where(mask, jnp.minimum(chi2, 4.0 * chi2_th), 0.0))
        )

    def lm_step(carry, _):
        kf_R, kf_t, points, lam, prev_cost = carry
        r, Xc, chi2 = _residuals(prob, kf_R, kf_t, points, cam_params, model)
        w = prob.obs_inv_sigma2 * maskf
        if use_huber:
            w = w * factors.huber_weight(chi2, chi2_th)

        J_pose, J_point = factors.reproj_jacobians(
            Xc, kf_R[:, None], cam_params, model
        )  # (K,M,2,6), (K,M,2,3)

        U = allreduce(jnp.einsum("kmri,km,kmrj->kij", J_pose, w, J_pose))
        V = jnp.einsum("kmri,km,kmrj->mij", J_point, w, J_point)  # (M,3,3) local
        Wb = jnp.einsum("kmri,km,kmrj->kmij", J_pose, w, J_point)  # (K,M,6,3)
        bc = -allreduce(jnp.einsum("kmri,km,kmr->ki", J_pose, w, r))
        bp = -jnp.einsum("kmri,km,kmr->mi", J_point, w, r)       # (M,3) local

        # LM damping (additive, Levenberg).
        U = U + lam * jnp.eye(6, dtype=dtype)[None]
        V = V + lam * eye3[None]
        Vinv = jnp.linalg.inv(V)                                  # (M,3,3)

        WVinv = jnp.einsum("kmij,mjl->kmil", Wb, Vinv)            # (K,M,6,3)
        S_off = allreduce(jnp.einsum("kmil,qmjl->kiqj", WVinv, Wb))
        S = -S_off
        S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(U)
        S = S.reshape(6 * K, 6 * K)
        bred = (bc - allreduce(jnp.einsum("kmil,ml->ki", WVinv, bp))
                ).reshape(-1)

        # Condition on fixed poses: dc_fixed = 0.
        free = (~prob.kf_fixed).astype(dtype)
        fmask = jnp.repeat(free, 6)
        S = S * fmask[:, None] * fmask[None, :] + jnp.diag(1.0 - fmask)
        bred = bred * fmask

        L, low = jax.scipy.linalg.cho_factor(
            S + 1e-8 * eyeK6, lower=True
        )
        dc = jax.scipy.linalg.cho_solve((L, low), bred).reshape(K, 6)
        dp = jnp.einsum(
            "mij,mj->mi", Vinv, bp - jnp.einsum("kmij,ki->mj", Wb, dc)
        )
        dp = dp * prob.pt_valid[:, None].astype(dtype)

        new_R, new_t = factors.apply_pose_update(kf_R, kf_t, dc)
        new_pts = points + dp
        new_cost = masked_chi2(new_R, new_t, new_pts)
        accept = new_cost < prev_cost
        kf_R = jnp.where(accept, new_R, kf_R)
        kf_t = jnp.where(accept, new_t, kf_t)
        points = jnp.where(accept, new_pts, points)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        cost = jnp.where(accept, new_cost, prev_cost)
        return (kf_R, kf_t, points, lam, cost), cost

    cost0 = masked_chi2(prob.kf_R, prob.kf_t, prob.points)
    init = (prob.kf_R, prob.kf_t, prob.points,
            jnp.asarray(lambda0, dtype), cost0)
    (kf_R, kf_t, points, _, total), _ = jax.lax.scan(
        lm_step, init, None, length=iters
    )

    _, _, chi2 = _residuals(prob, kf_R, kf_t, points, cam_params, model)
    inlier = mask & (chi2 <= chi2_th)
    return BAResult(
        kf_R=kf_R, kf_t=kf_t, points=points,
        chi2=chi2, inlier=inlier, total_chi2=total,
    )
