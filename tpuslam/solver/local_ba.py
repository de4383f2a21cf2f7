"""Batched local bundle adjustment with explicit landmark Schur complement.

Replaces `Optimizer::LocalBundleAdjustment` (/root/reference/src/
Optimizer.cc:1776; g2o LM, BlockSolver_6_3, landmarks marginalized) with
a dense, fixed-shape Levenberg-Marquardt:

- Observations are a dense (K keyframes x M points) masked grid — on TPU
  the dense residual/Jacobian grid is cheaper than sparse bookkeeping at
  local-window sizes (K<=32, M<=8192).
- **Landmark-last layout**: every per-observation quantity is (K, ..., M)
  with the landmark axis LAST (the TPU lane dimension). Jacobians are
  kept as separate scalar planes (K,M) instead of (K,M,2,6) tensors —
  trailing dims of 2/6/3 force sub-lane padding and relayouts that
  dominated the original formulation (measured 9.2 ms vs 0.6 ms per LM
  iteration at K=24, M=4096 on v5e). The residual rows (u, v[, u_right])
  are folded into the lane axis so the pose-block Hessian U and the
  Schur product are plain batched matmuls the MXU eats directly:
  S_off = (W V^-1)(K6, 3M) @ W^T(3M, K6).
- The normal system  [[U, W],[W^T, V]] [dc, dp] = [bc, bp]  is reduced by
  eliminating landmarks: S = U - W V^-1 W^T (6K x 6K dense Cholesky),
  then dp = V^-1 (bp - W^T dc) — the reference's BlockSolver landmark
  marginalization. V^-1 is a closed-form 3x3 inverse over lane-batched
  planes (eigh/inv on (M,3,3) arrays relayouts; the plane form doesn't).
- Fixed keyframes (the one-hop anchor ring, Optimizer.cc:1817-1832) are
  conditioned out by zeroing their rows/cols of S and unit-pinning the
  diagonal, i.e. solving with dc_fixed = 0.
- Robust Huber reweighting per iteration; LM damping with accept/reject
  on the true masked chi2 (no graph surgery — outliers are weights).
- **Stereo observations** (rectified-stereo / RGBD virtual right
  coordinate): pass `obs_ur` (K,M) with the observed right-image u
  (entries < 0 = mono-only) and `bf` = baseline*fx. Those observations
  contribute the reference's 3-dof EdgeStereo residual
  (u, v, u - bf/z) with the chi2_stereo=7.815 gate
  (/root/reference/include/G2oTypes.h:439, src/Optimizer.cc:931) — one
  extra residual row folded into the lane axis.

The same routine serves GlobalBundleAdjustment for maps that fit the
dense grid; the sharded variant for big maps lives in tpuslam.parallel
(`axis_name` turns every cross-landmark sum into partial-sum + psum).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpuslam.geometry import cameras
from tpuslam.solver import factors

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
# 2-dof left + 2-dof right reprojection summed per observation cell:
# chi2_{0.05, 4 dof} (the reference gates its left and right edges
# separately at 5.991 each; the dense grid holds ONE chi2 per (kf,pt)
# cell, so paired observations are gated jointly at the 4-dof quantile).
CHI2_RCAM = 9.488


class BAProblem(NamedTuple):
    kf_R: jax.Array        # (K,3,3) camera-from-world
    kf_t: jax.Array        # (K,3)
    kf_fixed: jax.Array    # (K,) bool — anchors (and invalid slots)
    points: jax.Array      # (M,3) world
    pt_valid: jax.Array    # (M,) bool
    obs_uv: jax.Array      # (K,M,2)
    obs_mask: jax.Array    # (K,M) bool
    obs_inv_sigma2: jax.Array  # (K,M)
    obs_ur: Optional[jax.Array] = None  # (K,M) right-image u; <0 = mono
    # Non-rectified rigs: observed right-camera pixel (<0 = no right
    # observation). Adds two reprojection rows through the rig
    # extrinsics (EdgeSE3ProjectXYZToBody,
    # /root/reference/include/OptimizableTypes.h:117).
    obs_uvr: Optional[jax.Array] = None  # (K,M,2)


class BAResult(NamedTuple):
    kf_R: jax.Array
    kf_t: jax.Array
    points: jax.Array
    chi2: jax.Array        # (K,M) final per-observation chi2
    inlier: jax.Array      # (K,M) chi2 <= threshold & mask
    total_chi2: jax.Array  # ()


def _residuals(prob: BAProblem, kf_R, kf_t, points, cam_params, model):
    """Compatibility helper (profiling scripts): mono residual grid."""
    Xc = jnp.einsum("kij,mj->kmi", kf_R, points) + kf_t[:, None, :]
    pred = cameras.project(Xc, cam_params, model)
    r = pred - prob.obs_uv
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    return r, Xc, chi2


def _proj_rows(kf_R, kf_t, points, cam_params, model, bf, has_stereo,
               rig=None):
    """Landmark-last projection + Jacobian planes.

    Returns (u, v, ur, uvr, rows, Xc) with u/v/ur (K,M) predictions,
    uvr a (u_r, v_r) pair of (K,M) right-camera predictions (or None),
    and `rows` a list of per-residual-row tuples (p, q, s) of (K,M)
    planes — the row of d(residual)/d(X_cam_left). ur/row 3 only when
    has_stereo; the two right-camera rows only when `rig` is given as
    (cam_params_r, R_rl, t_rl) with X_r = R_rl X_l + t_rl: their
    Jacobian w.r.t. the LEFT camera point is J_proj(X_r) @ R_rl
    (chain rule through the constant rig extrinsics — the
    EdgeSE3ProjectXYZToBody linearization).
    """
    Xw = points.T                                        # (3,M)
    Xc = jnp.einsum("kij,jm->kim", kf_R, Xw) + kf_t[:, :, None]  # (K,3,M)
    x, y = Xc[:, 0], Xc[:, 1]
    z = jnp.maximum(Xc[:, 2], 1e-6)
    zi = 1.0 / z
    if model == "pinhole":
        fx, fy, cx, cy = (cam_params[0], cam_params[1], cam_params[2],
                          cam_params[3])
        u = fx * x * zi + cx
        v = fy * y * zi + cy
        a = fx * zi
        b = -a * x * zi
        c = fy * zi
        d = -c * y * zi
        zero = jnp.zeros_like(a)
        rows = [(a, zero, b), (zero, c, d)]
    else:
        # Generic camera (KB8): project/Jacobian in (K,M,3) layout, then
        # peel into planes. The transposes are small relative to the
        # plane algebra and keep one code path per camera model.
        Xc_t = jnp.moveaxis(Xc, 1, 2)                    # (K,M,3)
        uv = cameras.project(Xc_t, cam_params, model)    # (K,M,2)
        J = cameras.project_jac(Xc_t, cam_params, model)  # (K,M,2,3)
        u, v = uv[..., 0], uv[..., 1]
        rows = [(J[..., 0, 0], J[..., 0, 1], J[..., 0, 2]),
                (J[..., 1, 0], J[..., 1, 1], J[..., 1, 2])]
    ur = None
    if has_stereo:
        # u_right = u - bf/z; d(u_r)/dXc = row_u + [0, 0, bf/z^2].
        ur = u - bf * zi
        p, q, s = rows[0]
        rows = rows + [(p, q, s + bf * zi * zi)]
    uvr = None
    if rig is not None:
        cam_r, R_rl, t_rl = rig
        Xr = jnp.einsum("ij,kjm->kim", R_rl, Xc) + t_rl[:, None]  # (K,3,M)
        Xr_t = jnp.moveaxis(Xr, 1, 2)                    # (K,M,3)
        uv_r = cameras.project(Xr_t, cam_r, model)       # (K,M,2)
        Jr = cameras.project_jac(Xr_t, cam_r, model)     # (K,M,2,3)
        # Compose with dX_r/dX_l = R_rl (plane-wise, no relayout).
        for i in range(2):
            rows = rows + [tuple(
                sum(Jr[..., i, j] * R_rl[j, c] for j in range(3))
                for c in range(3))]
        uvr = (uv_r[..., 0], uv_r[..., 1])
    return u, v, ur, uvr, rows, Xc


def _row_jacobian_planes(row, Xc, kf_R):
    """Pose (6 planes) + point (3 planes) Jacobian of one residual row.

    row = (p,q,s) = d r / d X_cam. Left-mult tangent [omega, vel]:
    d X_cam = -hat(X_cam) d omega + d vel; d X_cam = R_cw d X_world.
    """
    p, q, s = row
    x, y, z = Xc[:, 0], Xc[:, 1], Xc[:, 2]
    zero = jnp.zeros_like(p)
    j6 = [q * (-z) + s * y,
          p * z + s * (-x),
          p * (-y) + q * x,
          p, q, s]
    j3 = [p * kf_R[:, 0, j][:, None] + q * kf_R[:, 1, j][:, None]
          + s * kf_R[:, 2, j][:, None] for j in range(3)]
    return j6, j3


def _inv3x3_planes(V):
    """Closed-form inverse of a (3,3,M) plane-batched symmetric matrix."""
    a, b, c = V[0, 0], V[0, 1], V[0, 2]
    d, e, f = V[1, 0], V[1, 1], V[1, 2]
    g, h, i = V[2, 0], V[2, 1], V[2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    II = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12,
                              jnp.where(det < 0, -1e-12, 1e-12), det)
    return jnp.stack([
        jnp.stack([A, B, C]), jnp.stack([D, E, F]), jnp.stack([G, H, II])
    ]) * inv_det


@functools.partial(
    jax.jit,
    static_argnames=("model", "iters", "use_huber", "axis_name", "n_free",
                     "trust_region", "compute_dtype"),
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
    bf: float = 0.0,
    chi2_th_stereo: float = CHI2_STEREO,
    n_free: int = None,
    trust_region: bool = True,
    compute_dtype: str = "float32",
    cam_params_r=None,     # right-camera intrinsics (fisheye rigs)
    R_rl=None,             # rig extrinsics: X_r = R_rl X_l + t_rl
    t_rl=None,
    chi2_th_rcam: float = CHI2_RCAM,
) -> BAResult:
    """When `axis_name` is set, the problem's landmark dimension M is a
    LOCAL shard inside a `shard_map` over that mesh axis: every sum over
    landmarks (Schur-reduced camera system, gradient, cost) becomes a
    partial sum + `psum`, while the landmark-block solve (V^-1, point
    updates) stays shard-local. That is the distributed-BA layout of
    SURVEY.md section 5.7: landmark blocks sharded, reduced camera
    system assembled via collectives over ICI, solved replicated.

    `n_free`: static promise that every keyframe at row >= n_free is
    FIXED (callers order the window free-first). The pose-block work
    (J6, U, W, Schur matmul, camera solve) then runs only on the free
    block — on this device the (6K)^2 Schur product is the whole BA
    cost, so shrinking K -> n_free is a (K/n_free)^2 saving. Fixed
    keyframes still contribute observations to the landmark blocks
    V/bp, exactly like the reference's fixed anchors
    (Optimizer.cc:1817-1832). None = all rows (legacy layout).

    `trust_region=False` runs damped Gauss-Newton (constant lambda,
    every step accepted) instead of LM accept/reject — saves the extra
    cost-evaluation projection pass per iteration; appropriate for
    warm-started window BA where the basin is known-good.

    `compute_dtype="bfloat16"` carries the Jacobian PLANES and W blocks
    in bf16 with f32 accumulation (preferred_element_type) — the BA
    iteration is HBM-bandwidth-bound, so halving plane bytes ~halves
    iteration time. Residuals/costs/solves stay f32: residuals are
    small DIFFERENCES of large pixel coordinates (must subtract in
    f32), while Jacobian entries tolerate bf16's 0.4% rounding (they
    only steer the descent direction; Huber reweighting perturbs them
    more than that)."""
    K = prob.kf_R.shape[0]
    M = prob.points.shape[0]
    F = K if n_free is None else n_free
    dtype = prob.kf_R.dtype
    has_stereo = prob.obs_ur is not None
    has_rcam = prob.obs_uvr is not None
    assert not (has_stereo and has_rcam), (
        "rectified u_r rows and rig right-camera rows are exclusive")
    rig = ((cam_params_r, R_rl, t_rl) if has_rcam else None)
    n_rows = (3 if has_stereo else 2) + (2 if has_rcam else 0)

    if axis_name is not None:
        allreduce = lambda x: jax.lax.psum(x, axis_name)  # noqa: E731
        # The camera-block damping U += lam*eye is assembled SHARD-LOCALLY
        # and then psum-reduced into S — without this scale, the effective
        # camera damping would be lam * n_shards and distributed BA would
        # drift from the single-device semantics (over-damped, mesh-size
        # dependent). Landmark-block damping (V) is shard-local and needs
        # no scale.
        cam_lam_scale = 1.0 / jax.lax.psum(1.0, axis_name)
    else:
        allreduce = lambda x: x  # noqa: E731
        cam_lam_scale = 1.0

    mask = prob.obs_mask & prob.pt_valid[None, :]
    maskf = mask.astype(dtype)
    obs_u = prob.obs_uv[..., 0]
    obs_v = prob.obs_uv[..., 1]
    if has_stereo:
        st_mask = mask & (prob.obs_ur > 0)
        stf = st_mask.astype(dtype)
        th = jnp.where(st_mask, chi2_th_stereo, chi2_th)
    elif has_rcam:
        rc_mask = mask & (prob.obs_uvr[..., 0] >= 0)
        rcf = rc_mask.astype(dtype)
        th = jnp.where(rc_mask, chi2_th_rcam, chi2_th)
    else:
        th = jnp.full((K, M), chi2_th, dtype)

    def chi2_of(kf_R, kf_t, points):
        u, v, ur, uvr, rows, Xc = _proj_rows(
            kf_R, kf_t, points, cam_params, model, bf, has_stereo,
            rig=rig)
        ru = u - obs_u
        rv = v - obs_v
        c2 = ru * ru + rv * rv
        extra = []
        if has_stereo:
            rr = (ur - prob.obs_ur) * stf
            c2 = c2 + rr * rr
            extra = [rr]
        if has_rcam:
            rru = (uvr[0] - prob.obs_uvr[..., 0]) * rcf
            rrv = (uvr[1] - prob.obs_uvr[..., 1]) * rcf
            c2 = c2 + rru * rru + rrv * rrv
            extra = [rru, rrv]
        return c2 * prob.obs_inv_sigma2, (ru, rv, extra), rows, Xc

    def cost_from_chi2(c2):
        return allreduce(jnp.sum(jnp.where(mask, jnp.minimum(c2, 4.0 * th),
                                           0.0)))

    def masked_cost(kf_R, kf_t, points):
        c2, _, _, _ = chi2_of(kf_R, kf_t, points)
        return cost_from_chi2(c2)

    # Condition on fixed poses inside the free block (padding rows and,
    # in the legacy n_free=None layout, interleaved anchors):
    # dc_fixed = 0 by zeroing rows/cols + unit diagonal.
    free = (~prob.kf_fixed[:F]).astype(dtype)
    fmask = jnp.repeat(free, 6)
    eyeF6 = jnp.eye(6 * F, dtype=dtype)

    def lm_step(carry, _):
        kf_R, kf_t, points, lam, prev_cost = carry
        chi2, (ru, rv, extra), rows, Xc = chi2_of(kf_R, kf_t, points)
        w = prob.obs_inv_sigma2 * maskf
        # Depth-positivity gate, re-evaluated each linearization: a point
        # at/behind a camera's plane has a near-singular projection
        # Jacobian (J ~ fx/z with z clamped) whose squared entries
        # OVERFLOW the f32 3x3 determinant in _inv3x3_planes (inf - inf
        # = NaN poisons the whole Schur system — measured on a
        # perturbed global-BA problem). Such observations are geometric
        # outliers by definition; the reference's edges drop them via
        # depth checks too.
        w = w * (Xc[:, 2] > 1e-2).astype(dtype)
        if use_huber:
            w = w * factors.huber_weight(chi2, th)
        res_rows = [ru, rv] + extra
        if has_stereo:
            w_rows = [w, w, w * stf]
        elif has_rcam:
            # Right rows additionally gated on positive right-camera
            # depth (same near-plane Jacobian-overflow guard as left).
            zr = (jnp.einsum("j,kjm->km", R_rl[2], Xc)
                  + t_rl[2] > 1e-2).astype(dtype)
            w_rows = [w, w, w * rcf * zr, w * rcf * zr]
        else:
            w_rows = [w, w]

        # Per-row Jacobian planes. J3 spans all K rows (fixed anchors
        # constrain the points); J6 only the free block [:F].
        J6_rows, J3_rows = [], []
        for row in rows:
            j6, j3 = _row_jacobian_planes(row, Xc, kf_R)
            J6_rows.append([p[:F] for p in j6])
            J3_rows.append(j3)
        # Lane-folded blocks: residual rows concatenated into the lane
        # (last) axis, so contractions are clean (.., 6|3, R*M) matmuls.
        cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else dtype
        acc = {"preferred_element_type": dtype}
        J6 = jnp.stack([jnp.concatenate([J6_rows[r][i]
                                         for r in range(n_rows)], -1)
                        for i in range(6)], 1).astype(cdt)   # (F,6,RM)
        J3 = jnp.stack([jnp.concatenate([J3_rows[r][i]
                                         for r in range(n_rows)], -1)
                        for i in range(3)], 1).astype(cdt)   # (K,3,RM)
        wlanes = jnp.concatenate(w_rows, -1)             # (K,RM) f32
        rwlanes = (jnp.concatenate(res_rows, -1)
                   * wlanes).astype(cdt)                 # (K,RM) w-folded

        J6w = J6 * wlanes[:F, None, :].astype(cdt)
        U = jnp.einsum("kim,kjm->kij", J6w, J6, **acc)   # (F,6,6)
        bc = -jnp.einsum("kim,km->ki", J6.astype(cdt), rwlanes[:F],
                         **acc)                          # (F,6)
        J3w = J3 * wlanes[:, None, :].astype(cdt)
        # Landmark blocks are per-point m: sum rows blockwise.
        V = sum(jnp.einsum("kim,kjm->ijm",
                           J3w[..., r * M:(r + 1) * M],
                           J3[..., r * M:(r + 1) * M], **acc)
                for r in range(n_rows))                  # (3,3,M) f32
        bp = -sum(jnp.einsum("kim,km->im",
                             J3[..., r * M:(r + 1) * M],
                             rwlanes[..., r * M:(r + 1) * M], **acc)
                  for r in range(n_rows))                # (3,M) f32
        # W blocks as THREE (F,6,M) planes (point-coordinate l last-2
        # dims stay (6,M) -> no sublane padding; a (F,6,3,M) tensor pads
        # 3 -> 8 and costs 2.7x the bytes on TPU tiling).
        Wl = [sum(J6w[..., r * M:(r + 1) * M]
                  * J3[:F, None, l, r * M:(r + 1) * M]
                  for r in range(n_rows)) for l in range(3)]

        # LM damping (additive, Levenberg).
        U = U + (cam_lam_scale * lam) * jnp.eye(6, dtype=dtype)[None]
        V = V + lam * jnp.eye(3, dtype=dtype)[:, :, None]
        Vinv = _inv3x3_planes(V)                         # (3,3,M) f32

        WVl = [sum(Wl[j] * Vinv[j, l][None, None].astype(cdt)
                   for j in range(3)) for l in range(3)]  # 3x (F,6,M)
        S = -sum(jax.lax.dot_general(
            WVl[l].reshape(F * 6, M), Wl[l].reshape(F * 6, M),
            (((1,), (1,)), ((), ())), preferred_element_type=dtype)
            for l in range(3))
        S = S.reshape(F, 6, F, 6)
        S = S.at[jnp.arange(F), :, jnp.arange(F), :].add(U)
        S = allreduce(S.reshape(6 * F, 6 * F))
        bred = allreduce(
            (bc - sum(jnp.einsum("kim,m->ki", WVl[l],
                                 bp[l].astype(cdt), **acc)
                      for l in range(3))).reshape(-1))

        S = S * fmask[:, None] * fmask[None, :] + jnp.diag(1.0 - fmask)
        bred = bred * fmask

        L, low = jax.scipy.linalg.cho_factor(S + 1e-8 * eyeF6, lower=True)
        dc = jax.scipy.linalg.cho_solve((L, low), bred).reshape(F, 6)
        tmp = jnp.stack([bp[l] - jnp.einsum("kim,ki->m", Wl[l],
                                            dc.astype(cdt), **acc)
                         for l in range(3)])             # (3,M)
        dp = jnp.einsum("jlm,lm->jm", Vinv, tmp)
        dp = (dp * prob.pt_valid[None, :].astype(dtype)).T
        dc_full = jnp.zeros((K, 6), dtype).at[:F].set(dc)

        new_R, new_t = factors.apply_pose_update(kf_R, kf_t, dc_full)
        new_pts = points + dp
        if not trust_region:
            # Damped GN: always accept; report the cost at the PREVIOUS
            # iterate (already reduced from this linearization).
            return ((new_R, new_t, new_pts, lam, cost_from_chi2(chi2)),
                    prev_cost)
        new_cost = masked_cost(new_R, new_t, new_pts)
        accept = new_cost < prev_cost
        kf_R = jnp.where(accept, new_R, kf_R)
        kf_t = jnp.where(accept, new_t, kf_t)
        points = jnp.where(accept, new_pts, points)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        cost = jnp.where(accept, new_cost, prev_cost)
        return (kf_R, kf_t, points, lam, cost), cost

    cost0 = (masked_cost(prob.kf_R, prob.kf_t, prob.points)
             if trust_region else jnp.asarray(0.0, dtype))
    init = (prob.kf_R, prob.kf_t, prob.points,
            jnp.asarray(lambda0, dtype), cost0)
    (kf_R, kf_t, points, _, total), _ = jax.lax.scan(
        lm_step, init, None, length=iters
    )

    chi2, _, _, _ = chi2_of(kf_R, kf_t, points)
    inlier = mask & (chi2 <= th)
    if not trust_region:
        total = cost_from_chi2(chi2)
    return BAResult(
        kf_R=kf_R, kf_t=kf_t, points=points,
        chi2=chi2, inlier=inlier, total_chi2=total,
    )
