"""Visual-inertial optimization: VI local BA, inertial-only init, and
frame VI pose optimization.

Replaces the inertial problems of /root/reference/src/Optimizer.cc
(catalog in SURVEY.md section 2.2):
- `LocalInertialBA` (:4504) / `FullInertialBA` (:420)  -> optimize_vi
- `InertialOptimization` (:5391 + variants)            -> inertial_init
- `PoseInertialOptimizationLastKeyFrame/LastFrame` (:7608/:8009)
                                                        -> optimize_pose_vi

Design: each keyframe carries a 15-dof state [theta(3), p(3), v(3),
bg(3), ba(3)] (body pose world-from-body, right-multiplicative rotation
update R <- R Exp(dtheta)). Factors:
- monocular reprojection (pose rows only) through the camera-from-body
  extrinsics,
- 9-dim preintegrated inertial residuals between consecutive keyframes
  (imu.preintegration.inertial_residual), whitened by the preintegrated
  covariance,
- 6-dim bias random-walk residuals.

Jacobians of the inertial edges come from forward-mode AD at the zero
tangent (vmapped over edges) — no hand-derived 24x24 Hessian blocks as
in the reference's G2oTypes (:509-565); XLA fuses the jacfwd just fine
at window sizes. Landmarks are Schur-eliminated exactly as in
solver.local_ba; the reduced system is dense (15K x 15K, K<=32).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpuslam.geometry import cameras, lie
from tpuslam.imu import preintegration as pre
from tpuslam.solver import factors

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
# Joint 4-dof gate for left+right paired fisheye observations (see
# local_ba.CHI2_RCAM: the reference gates separate 2-dof edges at 5.991
# each; the dense grid holds one chi2 per cell).
CHI2_RCAM = 9.488
# 9-dof inertial-edge Huber threshold (LocalInertialBA's
# rki->setDelta(sqrt(16.92)), /root/reference/src/Optimizer.cc:574).
CHI2_INERTIAL = 16.92
DOF = 15


class VIWindow(NamedTuple):
    # Body states (world-from-body).
    Rwb: jax.Array        # (K,3,3)
    pwb: jax.Array        # (K,3)
    vel: jax.Array        # (K,3)
    bg: jax.Array         # (K,3)
    ba: jax.Array         # (K,3)
    fixed: jax.Array      # (K,) bool
    # Landmarks + dense observation grid (camera frame via Tcb).
    points: jax.Array     # (M,3)
    pt_valid: jax.Array   # (M,)
    obs_uv: jax.Array     # (K,M,2)
    obs_mask: jax.Array   # (K,M)
    obs_inv_sigma2: jax.Array  # (K,M)
    # Inertial edges i -> i+1 (stacked PreintState) + validity.
    preint: pre.PreintState    # leading dim (K-1,)
    edge_valid: jax.Array      # (K-1,)
    # Extrinsics camera-from-body.
    Rcb: jax.Array        # (3,3)
    tcb: jax.Array        # (3,)
    # Stereo-inertial: observed right-image u per observation (<0 = mono
    # keypoint). Present => the 3-dof (u, v, u - bf/z) residual of the
    # reference's EdgeStereo (include/G2oTypes.h:439) replaces the 2-dof
    # row for those observations inside LocalInertialBA
    # (src/Optimizer.cc:4504 builds EdgeStereo alongside EdgeMono).
    obs_ur: Optional[jax.Array] = None  # (K,M)
    # Fisheye (KB8) stereo-inertial: observed right-camera pixel per
    # observation (<0 = no right match). Present => two right-camera
    # reprojection rows through the rig extrinsics join the window
    # (the EdgeSE3ProjectXYZToBody role inside LocalInertialBA for
    # non-rectified rigs, /root/reference/src/Optimizer.cc:4571).
    obs_uvr: Optional[jax.Array] = None  # (K,M,2)


class VIResult(NamedTuple):
    Rwb: jax.Array
    pwb: jax.Array
    vel: jax.Array
    bg: jax.Array
    ba: jax.Array
    points: jax.Array
    chi2: jax.Array       # (K,M) visual chi2
    inlier: jax.Array     # (K,M)
    total_chi2: jax.Array


def _cam_from_body(Rwb, pwb, Rcb, tcb):
    """Tcw = Tcb o Tbw."""
    Rbw = jnp.swapaxes(Rwb, -1, -2)
    R_cw = Rcb @ Rbw
    t_cw = tcb - jnp.einsum("...ij,...j->...i", R_cw, pwb)
    return R_cw, t_cw


def _apply_delta(Rwb, pwb, vel, bg, ba, d):
    """d: (...,15) tangent -> updated states."""
    dth, dp, dv, dbg, dba = (d[..., :3], d[..., 3:6], d[..., 6:9],
                             d[..., 9:12], d[..., 12:15])
    R = lie.normalize_rotation(Rwb @ lie.so3_exp(dth))
    return R, pwb + dp, vel + dv, bg + dbg, ba + dba


def _whiten(cov9, r):
    """r (...,9) whitened by chol(inv(cov9)): solve L w = r."""
    L = jnp.linalg.cholesky(
        cov9 + 1e-10 * jnp.eye(9, dtype=r.dtype)
    )
    return jax.scipy.linalg.solve_triangular(L, r[..., None],
                                             lower=True)[..., 0]


def _inertial_residual_white(st: pre.PreintState, Ri, pi, vi, bgi, bai,
                             Rj, pj, vj, gravity):
    r = pre.inertial_residual(st, Ri, pi, vi, Rj, pj, vj, bgi, bai,
                              gravity=gravity)
    return _whiten(st.cov[:9, :9], r)


def _edge_residual_and_jac(st: pre.PreintState, Ri, pi, vi, bgi, bai,
                           Rj, pj, vj, gravity):
    """Whitened 9-dim inertial residual + Jacobians wrt the two 15-dof
    states (AD at the zero tangent)."""

    def f(di, dj):
        Ri2, pi2, vi2, bgi2, bai2 = _apply_delta(
            Ri, pi, vi, bgi, bai, di)
        Rj2, pj2, vj2, _, _ = _apply_delta(Rj, pj, vj, bgi, bai, dj)
        return _inertial_residual_white(st, Ri2, pi2, vi2, bgi2, bai2,
                                        Rj2, pj2, vj2, gravity)

    z = jnp.zeros(DOF, Ri.dtype)
    r = f(z, z)
    Ji = jax.jacfwd(f, argnums=0)(z, z)   # (9,15)
    Jj = jax.jacfwd(f, argnums=1)(z, z)   # (9,15)
    return r, Ji, Jj


def _bias_rw_residual(bgi, bai, bgj, baj, inv_sigma_walk):
    """(6,) whitened bias random-walk residual (EdgeGyroRW/EdgeAccRW,
    include/G2oTypes.h:658/699)."""
    return jnp.concatenate([bgj - bgi, baj - bai]) * inv_sigma_walk


@functools.partial(jax.jit, static_argnames=("iters", "model",
                                             "axis_name"))
def optimize_vi(
    win: VIWindow,
    cam_params,
    gravity,
    walk_info,            # (6,) 1/sigma of bias walk per edge
    model: str = "pinhole",
    iters: int = 8,
    lambda0: float = 1e-3,
    chi2_th: float = CHI2_MONO,
    vis_weight: float = 1.0,
    bf: float = 0.0,
    chi2_th_stereo: float = CHI2_STEREO,
    cam_params_r=None,     # right-camera intrinsics (fisheye rigs)
    R_rl=None,             # rig extrinsics: X_r = R_rl X_l + t_rl
    t_rl=None,
    chi2_th_rcam: float = CHI2_RCAM,
    axis_name: str = None,
) -> VIResult:
    """Sliding-window VI bundle adjustment (LocalInertialBA analog).

    When `win.obs_ur` is present (stereo-inertial), observations with
    obs_ur > 0 carry the 3-dof (u, v, u - bf/z) residual with the
    chi2=7.815 gate (EdgeStereo inside LocalInertialBA,
    /root/reference/src/Optimizer.cc:4504-4630).

    `axis_name`: landmark-sharded distributed variant (the
    FullInertialBA long-context workload, SURVEY.md section 5.7 /
    /root/reference/src/Optimizer.cc:420). The window's M dimension is
    a per-device shard under shard_map: the visual reduced camera
    blocks (U6, Schur off-diagonals, reduced gradient) and the visual
    cost become partial-sum + psum, the inertial/bias chains — whose
    inputs are replicated — are assembled identically on every device,
    and the 15K-dof solve is replicated while landmark back-
    substitution stays shard-local (exactly local_ba.optimize's
    layout, wired through parallel.dist_ba.distributed_optimize_vi)."""
    K = win.Rwb.shape[0]
    M = win.points.shape[0]
    dtype = win.Rwb.dtype
    has_stereo = win.obs_ur is not None
    n = DOF * K
    eye_n = jnp.eye(n, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    mask = win.obs_mask & win.pt_valid[None, :]
    maskf = mask.astype(dtype)
    free = (~win.fixed).astype(dtype)
    # Mono keeps the scalar threshold (and below, the 2-row einsums) so
    # the mono path stays BIT-IDENTICAL to the pre-stereo formulation:
    # blackout-recovery trajectories are chaotic enough that a different
    # einsum contraction order flips e2e gates (measured r04).
    has_rcam = win.obs_uvr is not None
    assert not (has_stereo and has_rcam)
    if has_stereo:
        st = mask & (win.obs_ur > 0)
        stf = st.astype(dtype)
        th = jnp.where(st, chi2_th_stereo, chi2_th)
    elif has_rcam:
        rc = mask & (win.obs_uvr[..., 0] >= 0)
        rcf = rc.astype(dtype)
        th = jnp.where(rc, chi2_th_rcam, chi2_th)
    else:
        th = chi2_th

    edge_i = jnp.arange(K - 1)
    edge_j = edge_i + 1
    if axis_name is not None:
        allreduce = lambda x: jax.lax.psum(x, axis_name)  # noqa: E731
    else:
        allreduce = lambda x: x  # noqa: E731

    def visual_terms(Rwb, pwb, points):
        """Residual rows r (K,M,R) with R=3 in stereo mode (row 3 already
        masked by stf), combined chi2, and the camera-frame geometry."""
        R_cw, t_cw = _cam_from_body(Rwb, pwb, win.Rcb, win.tcb)
        Xc = jnp.einsum("kij,mj->kmi", R_cw, points) + t_cw[:, None, :]
        pred = cameras.project(Xc, cam_params, model)
        r = pred - win.obs_uv
        if has_stereo:
            z = jnp.maximum(Xc[..., 2], 1e-6)
            r3 = (pred[..., 0] - bf / z - win.obs_ur) * stf
            r = jnp.concatenate([r, r3[..., None]], axis=-1)
        if has_rcam:
            Xr = jnp.einsum("ij,kmj->kmi", R_rl, Xc) + t_rl
            pred_r = cameras.project(Xr, cam_params_r, model)
            rr = (pred_r - win.obs_uvr) * rcf[..., None]
            r = jnp.concatenate([r, rr], axis=-1)
        chi2 = jnp.sum(r * r, axis=-1) * win.obs_inv_sigma2
        return r, Xc, R_cw, chi2

    def vis_jacobians(Xc, Rwb, pwb, points, R_cw):
        """J wrt body tangent [theta(3), p(3)] and point.

        With the right-multiplicative body update Rwb <- Rwb Exp(th):
        x_c = Rcb Exp(-th) Rwb^T (x - p), so
        d x_c / d th = Rcb hat(y) with y = Rwb^T (x - p),
        d x_c / d p  = -R_cw, and d x_c / d x = R_cw.
        """
        Jproj = cameras.project_jac(Xc, cam_params, model)      # (K,M,2,3)
        if has_stereo:
            # Row 3: d(u - bf/z)/dXc = row_u + [0, 0, bf/z^2].
            z = jnp.maximum(Xc[..., 2], 1e-6)
            zi2 = (bf / (z * z))[..., None]
            e3 = jnp.zeros_like(Jproj[..., 0, :]).at[..., 2].set(1.0)
            Jr3 = Jproj[..., 0, :] + zi2 * e3
            Jproj = jnp.concatenate([Jproj, Jr3[..., None, :]], axis=-2)
        if has_rcam:
            # Rows 3-4: right-camera projection through the rig;
            # d r_r / d Xc = J_proj(X_r) @ R_rl (chain rule through the
            # constant extrinsics).
            Xr = jnp.einsum("ij,kmj->kmi", R_rl, Xc) + t_rl
            Jr = cameras.project_jac(Xr, cam_params_r, model)   # (K,M,2,3)
            Jr = jnp.einsum("kmri,ij->kmrj", Jr, R_rl)
            Jproj = jnp.concatenate([Jproj, Jr], axis=-2)
        pm = points[None, :, :] - pwb[:, None, :]               # (K,M,3)
        y = jnp.einsum("kji,kmj->kmi", Rwb, pm)
        Jth = jnp.einsum("ij,kmjl->kmil", win.Rcb, lie.hat(y))  # (K,M,3,3)
        Jp = -jnp.broadcast_to(R_cw[:, None], Xc.shape[:2] + (3, 3))
        JXc_pose = jnp.concatenate([Jth, Jp], axis=-1)          # (K,M,3,6)
        J_pose = jnp.einsum("kmri,kmij->kmrj", Jproj, JXc_pose)  # (K,M,R,6)
        J_pt = jnp.einsum("kmri,kij->kmrj", Jproj, R_cw)        # (K,M,R,3)
        return J_pose, J_pt

    def row_weights(w, Xc=None):
        """Per-row observation weights (K,M,R): rows u,v get w; the
        stereo row gets w masked to stereo observations; right-camera
        rows get w masked to right-matched cells with positive
        right-camera depth (near-plane Jacobian guard)."""
        if has_stereo:
            return jnp.stack([w, w, w * stf], axis=-1)
        if has_rcam:
            zr = (jnp.einsum("j,kmj->km", R_rl[2], Xc)
                  + t_rl[2] > 1e-2).astype(dtype)
            wrr = w * rcf * zr
            return jnp.stack([w, w, wrr, wrr], axis=-1)
        return jnp.broadcast_to(w[..., None], w.shape + (2,))

    def masked_cost(Rwb, pwb, vel, bg, ba, points):
        _, _, _, chi2 = visual_terms(Rwb, pwb, points)
        # Visual cost is a cross-landmark sum (partial per shard);
        # the inertial/bias terms below are computed from replicated
        # inputs and added ONCE (identical on every shard).
        vis = allreduce(jnp.sum(
            jnp.where(mask, jnp.minimum(chi2, 4.0 * th), 0.0)))
        r_in, _, _ = jax.vmap(
            lambda st, i, j: _edge_residual_and_jac(
                st, Rwb[i], pwb[i], vel[i], bg[i], ba[i],
                Rwb[j], pwb[j], vel[j], gravity)
        )(win.preint, edge_i, edge_j)
        chi2_e = jnp.sum(r_in * r_in, axis=-1)
        rho = jnp.where(
            chi2_e <= CHI2_INERTIAL, chi2_e,
            2.0 * jnp.sqrt(CHI2_INERTIAL * jnp.maximum(chi2_e, 1e-12))
            - CHI2_INERTIAL)   # Huber cost, matches the edge weighting
        inert = jnp.sum(jnp.where(win.edge_valid, rho, 0.0))
        rw = jax.vmap(lambda i, j: _bias_rw_residual(
            bg[i], ba[i], bg[j], ba[j], walk_info))(edge_i, edge_j)
        rw_c = jnp.sum(jnp.where(win.edge_valid[:, None], rw * rw, 0.0))
        return vis_weight * vis + inert + rw_c

    def lm_step(carry, _):
        Rwb, pwb, vel, bg, ba, points, lam, prev_cost = carry

        # ---- visual part (landmark Schur as in local_ba) ----
        r, Xc, R_cw, chi2 = visual_terms(Rwb, pwb, points)
        w = win.obs_inv_sigma2 * maskf * vis_weight
        # Depth-positivity gate (see local_ba.lm_step): at/behind-plane
        # points have near-singular Jacobians that overflow f32.
        w = w * (Xc[..., 2] > 1e-2).astype(dtype)
        w = w * factors.huber_weight(chi2, th)
        J_pose, J_pt = vis_jacobians(Xc, Rwb, pwb, points, R_cw)

        if has_stereo or has_rcam:
            wr = row_weights(w, Xc)                               # (K,M,R)
            U6 = jnp.einsum("kmri,kmr,kmrj->kij", J_pose, wr, J_pose)
            V = jnp.einsum("kmri,kmr,kmrj->mij", J_pt, wr, J_pt)
            Wb = jnp.einsum("kmri,kmr,kmrj->kmij", J_pose, wr, J_pt)
            bc6 = -jnp.einsum("kmri,kmr,kmr->ki", J_pose, wr, r)
            bp = -jnp.einsum("kmri,kmr,kmr->mi", J_pt, wr, r)
        else:
            U6 = jnp.einsum("kmri,km,kmrj->kij", J_pose, w, J_pose)
            V = jnp.einsum("kmri,km,kmrj->mij", J_pt, w, J_pt)
            Wb = jnp.einsum("kmri,km,kmrj->kmij", J_pose, w, J_pt)
            bc6 = -jnp.einsum("kmri,km,kmr->ki", J_pose, w, r)
            bp = -jnp.einsum("kmri,km,kmr->mi", J_pt, w, r)

        V = V + lam * eye3[None]
        Vinv = jnp.linalg.inv(V)
        WVinv = jnp.einsum("kmij,mjl->kmil", Wb, Vinv)
        S6_off = jnp.einsum("kmil,qmjl->kiqj", WVinv, Wb)         # (K,6,K,6)
        b6red = bc6 - jnp.einsum("kmil,ml->ki", WVinv, bp)
        # Distributed: the visual reduced-camera pieces are partial
        # sums over this shard's landmarks — reduce them here so the
        # 15K system below is replicated-consistent before the
        # (replicated) inertial blocks and damping are added.
        U6 = allreduce(U6)
        S6_off = allreduce(S6_off)
        b6red = allreduce(b6red)

        # Scatter the 6-dof visual blocks into the 15K system.
        S = jnp.zeros((K, DOF, K, DOF), dtype)
        S = S.at[:, :6, :, :6].add(-S6_off)
        S = S.at[jnp.arange(K), :6, jnp.arange(K), :6].add(U6)
        b = jnp.zeros((K, DOF), dtype)
        b = b.at[:, :6].add(b6red)

        # ---- inertial edges ----
        r_in, Ji, Jj = jax.vmap(
            lambda st, i, j: _edge_residual_and_jac(
                st, Rwb[i], pwb[i], vel[i], bg[i], ba[i],
                Rwb[j], pwb[j], vel[j], gravity)
        )(win.preint, edge_i, edge_j)                 # (K-1,9),(K-1,9,15)x2
        # Huber on the whitened 9-dof inertial residual, delta^2=16.92
        # (the reference robustifies LocalInertialBA's inertial edges the
        # same way, src/Optimizer.cc:573-574) — without it, a window
        # whose visual chain disagrees with the IMU (bias residue, map
        # drift) gets its poses DRAGGED to the inertial solution, mass-
        # culling reprojection inliers (measured: map death ~60 frames
        # after IMU init).
        chi2_in = jnp.sum(r_in * r_in, axis=-1)
        # IRLS weight rho'(chi2) = min(1, delta/||r||); J and r each get
        # its square root so J^T J and J^T r carry exactly rho'.
        sw_in = jnp.minimum(
            1.0, CHI2_INERTIAL / jnp.maximum(chi2_in, 1e-12)) ** 0.25
        r_in = r_in * sw_in[:, None]
        ev = (win.edge_valid.astype(dtype) * sw_in)[:, None, None]
        Ji = Ji * ev
        Jj = Jj * ev
        S = S.at[edge_i, :, edge_i, :].add(
            jnp.einsum("eri,erj->eij", Ji, Ji))
        S = S.at[edge_j, :, edge_j, :].add(
            jnp.einsum("eri,erj->eij", Jj, Jj))
        S = S.at[edge_i, :, edge_j, :].add(
            jnp.einsum("eri,erj->eij", Ji, Jj))
        S = S.at[edge_j, :, edge_i, :].add(
            jnp.einsum("eri,erj->eij", Jj, Ji))
        b = b.at[edge_i].add(-jnp.einsum("eri,er->ei", Ji, r_in))
        b = b.at[edge_j].add(-jnp.einsum("eri,er->ei", Jj, r_in))

        # ---- bias random walk ----
        # Residual rw = diag(walk_info) [bg_j-bg_i, ba_j-ba_i] (whitened),
        # so d rw / d bias_j = diag(walk_info) on the tangent's bias
        # columns (9:15) and d / d bias_i = -that.
        rw = jax.vmap(lambda i, j: _bias_rw_residual(
            bg[i], ba[i], bg[j], ba[j], walk_info))(edge_i, edge_j)
        rw = rw * win.edge_valid.astype(dtype)[:, None]
        Jrw = jnp.zeros((6, DOF), dtype).at[:, 9:15].set(
            jnp.diag(walk_info.astype(dtype)))
        Jpos = Jrw[None] * win.edge_valid.astype(dtype)[:, None, None]
        Jneg = -Jpos                                   # (K-1,6,15)
        S = S.at[edge_i, :, edge_i, :].add(
            jnp.einsum("eri,erj->eij", Jneg, Jneg))
        S = S.at[edge_j, :, edge_j, :].add(
            jnp.einsum("eri,erj->eij", Jpos, Jpos))
        S = S.at[edge_i, :, edge_j, :].add(
            jnp.einsum("eri,erj->eij", Jneg, Jpos))
        S = S.at[edge_j, :, edge_i, :].add(
            jnp.einsum("eri,erj->eij", Jpos, Jneg))
        b = b.at[edge_i].add(-jnp.einsum("eri,er->ei", Jneg, rw))
        b = b.at[edge_j].add(-jnp.einsum("eri,er->ei", Jpos, rw))

        # ---- damp, fix, solve ----
        S = S.reshape(n, n) + lam * eye_n
        bflat = b.reshape(n)
        fmask = jnp.repeat(free, DOF)
        S = S * fmask[:, None] * fmask[None, :] + jnp.diag(1.0 - fmask)
        bflat = bflat * fmask
        Lc, low = jax.scipy.linalg.cho_factor(S + 1e-8 * eye_n, lower=True)
        d = jax.scipy.linalg.cho_solve((Lc, low), bflat).reshape(K, DOF)

        dp_pts = jnp.einsum(
            "mij,mj->mi", Vinv,
            bp - jnp.einsum("kmij,ki->mj", Wb, d[:, :6])
        ) * win.pt_valid[:, None].astype(dtype)

        Rn, pn, vn, bgn, ban = _apply_delta(Rwb, pwb, vel, bg, ba, d)
        pts_n = points + dp_pts
        new_cost = masked_cost(Rn, pn, vn, bgn, ban, pts_n)
        accept = new_cost < prev_cost
        out = jax.tree_util.tree_map(
            lambda a_new, a_old: jnp.where(accept, a_new, a_old),
            (Rn, pn, vn, bgn, ban, pts_n),
            (Rwb, pwb, vel, bg, ba, points),
        )
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        cost = jnp.where(accept, new_cost, prev_cost)
        return (*out, lam, cost), cost

    cost0 = masked_cost(win.Rwb, win.pwb, win.vel, win.bg, win.ba,
                        win.points)
    init = (win.Rwb, win.pwb, win.vel, win.bg, win.ba, win.points,
            jnp.asarray(lambda0, dtype), cost0)
    (Rwb, pwb, vel, bg, ba, points, _, total), _ = jax.lax.scan(
        lm_step, init, None, length=iters)

    _, _, _, chi2 = visual_terms(Rwb, pwb, points)
    inlier = mask & (chi2 <= th)
    return VIResult(Rwb=Rwb, pwb=pwb, vel=vel, bg=bg, ba=ba, points=points,
                    chi2=chi2, inlier=inlier, total_chi2=total)

# ---------------------------------------------------------------------------
# Inertial-only initialization (gravity direction, scale, biases, velocities)
# ---------------------------------------------------------------------------


class InertialInitResult(NamedTuple):
    vel: jax.Array     # (K,3) body velocities
    Rwg: jax.Array     # (3,3) world-from-"gravity-aligned world"
    scale: jax.Array   # () map scale correction
    bg: jax.Array      # (3,)
    ba: jax.Array      # (3,)
    cost: jax.Array    # () final cost
    g_lin_norm: jax.Array  # () |g| of the UNCONSTRAINED linear alignment:
                           # ~9.81 only when the solution regime is right
                           # (VINS-Mono's init health check)


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def inertial_init(
    Rwb,              # (K,3,3) body rotations from visual SLAM (fixed)
    pwb,              # (K,3) positions' SCALABLE part (fixed up to scale)
    preint: pre.PreintState,  # stacked (K-1,) edges
    edge_valid,       # (K-1,)
    gravity_mag: float = 9.81,
    prior_g: float = 1e2,
    prior_a: float = 1e6,
    iters: int = 30,
    fix_scale: bool = False,  # stereo/RGBD-inertial: the map is already
                              # metric, so the scale variable is pinned at
                              # 1 (the reference fixes VertexScale when
                              # bFixedScale, src/Optimizer.cc:5391 for
                              # IMU_STEREO sessions)
    lever=None,       # (K,3) METRIC lever-arm part: p_body(s) = s*pwb + lever.
                      # With camera-IMU extrinsics, p_wb = p_wc + Rwc tcb —
                      # the visual p_wc scales with the unknown s but the
                      # Rwc tcb lever term is already metric. Folding it into
                      # a single scaled position (what GetImuPosition feeds
                      # g2o in the reference) distorts relative positions by
                      # (s-1)*|tcb| per keyframe; over a window where Rwc
                      # swings a radian that rivals the inter-KF motion and
                      # wrecks the scale estimate. Passing it separately
                      # keeps the model exact and still linear in s.
) -> InertialInitResult:
    """Ref: Optimizer::InertialOptimization (/root/reference/src/
    Optimizer.cc:5391) called from LocalMapping::InitializeIMU (:1437)
    with staged bias priors. Variables: per-KF velocity, 2-dof gravity
    direction, log-scale, shared gyro/acc bias; keyframe poses fixed.
    Solved as one dense AD-Gauss-Newton (packed dim 3K+9)."""
    K = Rwb.shape[0]
    dtype = Rwb.dtype
    lev = jnp.zeros_like(pwb) if lever is None else jnp.asarray(lever, dtype)
    edge_i = jnp.arange(K - 1)

    # --- Closed-form linear visual-inertial alignment (the standard
    # Martinelli/VINS-Mono initializer): solve LS for
    # [s, g(3), v_1..v_K] from
    #   s (p_{i+1}-p_i) = v_i dT + 0.5 g dT^2 + R_i dP_i
    #   v_{i+1} = v_i + g dT + R_i dV_i .
    # Starting the nonlinear MAP refinement at scale=1 (the reference's
    # VertexScale default) stalls when the true scale is far from 1.
    E9 = K - 1
    n_lin = 4 + 3 * K
    A = jnp.zeros((6 * E9, n_lin), dtype)
    b = jnp.zeros((6 * E9,), dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    for e in range(E9):  # static small loop; unrolled at trace time
        dT = preint.dT[e]
        row_p = 6 * e
        row_v = 6 * e + 3
        dp = pwb[e + 1] - pwb[e]
        if fix_scale:
            # s == 1: the scaled relative position moves to the rhs.
            b = b.at[row_p:row_p + 3].set(Rwb[e] @ preint.dP[e]
                                          - (lev[e + 1] - lev[e]) - dp)
        else:
            A = A.at[row_p:row_p + 3, 0].set(dp)
            # Metric lever part of the relative position -> rhs.
            b = b.at[row_p:row_p + 3].set(Rwb[e] @ preint.dP[e]
                                          - (lev[e + 1] - lev[e]))
        A = A.at[row_p:row_p + 3, 1:4].set(-0.5 * dT * dT * eye3)
        A = A.at[row_p:row_p + 3, 4 + 3 * e:7 + 3 * e].set(-dT * eye3)
        A = A.at[row_v:row_v + 3, 1:4].set(-dT * eye3)
        A = A.at[row_v:row_v + 3, 4 + 3 * e:7 + 3 * e].set(-eye3)
        A = A.at[row_v:row_v + 3, 7 + 3 * e:10 + 3 * e].set(eye3)
        b = b.at[row_v:row_v + 3].set(Rwb[e] @ preint.dV[e])
    x_lin = jnp.linalg.lstsq(A, b)[0]
    s_lin = (jnp.asarray(1.0, dtype) if fix_scale
             else jnp.maximum(x_lin[0], 1e-3))
    g_lin = x_lin[1:4]
    v_lin = x_lin[4:].reshape(K, 3)

    g0 = g_lin / jnp.maximum(jnp.linalg.norm(g_lin), 1e-9)
    gI = jnp.asarray([0.0, 0.0, -1.0], dtype)
    v = jnp.cross(gI, g0)
    s = jnp.linalg.norm(v)
    c = jnp.dot(gI, g0)
    Rwg0 = jnp.where(
        s < 1e-6,
        jnp.eye(3, dtype=dtype),
        lie.so3_exp(v / jnp.maximum(s, 1e-9) * jnp.arctan2(s, c)),
    )

    n_par = 3 * K + 2 + 1 + 6

    def unpack(th):
        vel = th[: 3 * K].reshape(K, 3)
        dg = th[3 * K : 3 * K + 2]
        log_s = th[3 * K + 2]
        bg = th[3 * K + 3 : 3 * K + 6]
        ba = th[3 * K + 6 : 3 * K + 9]
        Rwg = Rwg0 @ lie.so3_exp(jnp.concatenate([dg, jnp.zeros(1, dtype)]))
        g = Rwg @ jnp.asarray([0.0, 0.0, -gravity_mag], dtype)
        scale = (jnp.asarray(1.0, dtype) if fix_scale
                 else jnp.exp(log_s))  # frozen param -> zero gradient;
        return vel, Rwg, scale, g, bg, ba  # LM damping keeps H regular

    def residuals(th):
        vel, Rwg, scale, g, bg, ba = unpack(th)

        def edge_res(e):
            st = jax.tree_util.tree_map(lambda x: x[e], preint)
            r = pre.inertial_residual(
                st, Rwb[e], scale * pwb[e] + lev[e], vel[e],
                Rwb[e + 1], scale * pwb[e + 1] + lev[e + 1], vel[e + 1],
                bg, ba, gravity=g,
            )
            return _whiten(st.cov[:9, :9], r) * edge_valid[e]

        r_edges = jax.vmap(edge_res)(edge_i).reshape(-1)
        r_prior = jnp.concatenate([
            jnp.sqrt(jnp.asarray(prior_g, dtype)) * bg,
            jnp.sqrt(jnp.asarray(prior_a, dtype)) * ba,
        ])
        return jnp.concatenate([r_edges, r_prior])

    def gn_step(i, state):
        th, lam = state
        r = residuals(th)
        J = jax.jacfwd(residuals)(th)
        H = J.T @ J + lam * jnp.eye(n_par, dtype=dtype)
        b = -J.T @ r
        dth = jnp.linalg.solve(H, b)
        th_new = th + dth
        better = jnp.sum(residuals(th_new) ** 2) < jnp.sum(r * r)
        th = jnp.where(better, th_new, th)
        lam = jnp.where(better, lam * 0.5, lam * 4.0)
        return (th, lam)

    th0 = jnp.zeros((n_par,), dtype)
    th0 = th0.at[: 3 * K].set(v_lin.reshape(-1))
    th0 = th0.at[3 * K + 2].set(jnp.log(s_lin))
    th, _ = jax.lax.fori_loop(0, iters, gn_step,
                              (th0, jnp.asarray(1e-4, dtype)))
    vel, Rwg, scale, g, bg, ba = unpack(th)
    return InertialInitResult(
        vel=vel, Rwg=Rwg, scale=scale, bg=bg, ba=ba,
        cost=jnp.sum(residuals(th) ** 2),
        g_lin_norm=jnp.linalg.norm(g_lin),
    )


class ScaleRefineResult(NamedTuple):
    scale: jax.Array   # () multiplicative map-scale correction
    Rwg: jax.Array     # (3,3) residual gravity-direction correction
    cost0: jax.Array   # () initial whitened cost (at s=1, Rwg=I)
    cost: jax.Array    # () final cost


@functools.partial(jax.jit, static_argnames=("iters",))
def scale_gravity_refine(
    Rwb,              # (K,3,3) body rotations (fixed)
    pwb,              # (K,3) body positions (fixed up to the scale var)
    vel,              # (K,3) body world velocities (fixed)
    bg, ba,           # (3,) biases (fixed)
    preint: pre.PreintState,  # stacked (K-1,) consecutive-KF edges
    edge_valid,       # (K-1,)
    gravity_mag: float = 9.81,
    iters: int = 10,
) -> ScaleRefineResult:
    """Mono scale refinement: scale + 2-dof gravity direction ONLY, all
    keyframe states fixed. Ref: Optimizer::InertialOptimization(Map*,
    Rwg, scale) (/root/reference/src/Optimizer.cc:5937) called from
    LocalMapping::ScaleRefinement (:1646) every 10 s — the init scale is
    rough by design; this cheap global problem absorbs the residue."""
    K = Rwb.shape[0]
    dtype = Rwb.dtype
    edge_i = jnp.arange(K - 1)

    def residuals(th):
        Rwg = lie.so3_exp(jnp.concatenate([th[:2], jnp.zeros(1, dtype)]))
        scale = jnp.exp(th[2])
        g = Rwg @ jnp.asarray([0.0, 0.0, -gravity_mag], dtype)

        def edge_res(e):
            st = jax.tree_util.tree_map(lambda x: x[e], preint)
            r = pre.inertial_residual(
                st, Rwb[e], scale * pwb[e], vel[e],
                Rwb[e + 1], scale * pwb[e + 1], vel[e + 1],
                bg, ba, gravity=g)
            return _whiten(st.cov[:9, :9], r) * edge_valid[e]

        return jax.vmap(edge_res)(edge_i).reshape(-1)

    def gn_step(i, state):
        th, lam = state
        r = residuals(th)
        J = jax.jacfwd(residuals)(th)
        H = J.T @ J + lam * jnp.eye(3, dtype=dtype)
        dth = jnp.linalg.solve(H, -J.T @ r)
        th_new = th + dth
        better = jnp.sum(residuals(th_new) ** 2) < jnp.sum(r * r)
        th = jnp.where(better, th_new, th)
        lam = jnp.where(better, lam * 0.5, lam * 4.0)
        return (th, lam)

    th0 = jnp.zeros((3,), dtype)
    cost0 = jnp.sum(residuals(th0) ** 2)
    th, _ = jax.lax.fori_loop(0, iters, gn_step,
                              (th0, jnp.asarray(1e-6, dtype)))
    Rwg = lie.so3_exp(jnp.concatenate([th[:2], jnp.zeros(1, dtype)]))
    return ScaleRefineResult(scale=jnp.exp(th[2]), Rwg=Rwg,
                             cost0=cost0,
                             cost=jnp.sum(residuals(th) ** 2))


# ---------------------------------------------------------------------------
# Frame VI pose-only optimization
# ---------------------------------------------------------------------------


class PoseVIResult(NamedTuple):
    Rwb: jax.Array
    pwb: jax.Array
    vel: jax.Array
    bg: jax.Array
    ba: jax.Array
    inlier: jax.Array
    n_inliers: jax.Array
    H: jax.Array          # (15,15) GN Hessian at the solution — becomes
                          # the next frame's marginal prior
                          # (ConstraintPoseImu, include/G2oTypes.h:737;
                          # recovery at Optimizer.cc:7960-7998)


@functools.partial(jax.jit, static_argnames=("model", "rounds", "iters"))
def optimize_pose_vi(
    Rwb0, pwb0, vel0, bg0, ba0,         # frame state init
    kf_Rwb, kf_pwb, kf_vel,             # last-keyframe state (fixed)
    preint: pre.PreintState,            # KF -> frame preintegration
    X_w, uv, inv_sigma2, valid,         # visual matches
    cam_params, Rcb, tcb, gravity,
    walk_info,                          # (6,)
    model: str = "pinhole",
    rounds: int = 3,
    iters: int = 4,
    chi2_th: float = CHI2_MONO,
    damping: float = 1e-5,
    ur: Optional[jax.Array] = None,  # (N,) right-image u; <0 = mono
    bf: float = 0.0,
    chi2_th_stereo: float = CHI2_STEREO,
    uvr: Optional[jax.Array] = None,  # (N,2) fisheye right-cam pixel
    cam_params_r=None,
    R_rl=None,
    t_rl=None,
    chi2_th_rcam: float = CHI2_RCAM,
) -> PoseVIResult:
    """Ref: PoseInertialOptimizationLastKeyFrame (Optimizer.cc:7608):
    frame 15-dof state vs fixed last-keyframe state; visual reprojection
    (+ the stereo row for observations with ur > 0 —
    EdgeStereoOnlyPose, Optimizer.cc:7790; or right-camera rows through
    the rig for fisheye observations with uvr >= 0) + one inertial edge
    + bias random walk; chi2-gated rounds."""
    dtype = Rwb0.dtype
    has_stereo = ur is not None
    has_rcam = uvr is not None
    if has_stereo:
        st = (ur > 0) & valid
        stf = st.astype(dtype)
        th = jnp.where(st, chi2_th_stereo, chi2_th)
    elif has_rcam:
        rc = (uvr[:, 0] >= 0) & valid
        rcf = rc.astype(dtype)
        th = jnp.where(rc, chi2_th_rcam, chi2_th)
    else:
        th = chi2_th

    def vis_chi2(Rwb, pwb):
        R_cw, t_cw = _cam_from_body(Rwb, pwb, Rcb, tcb)
        Xc = jnp.einsum("ij,nj->ni", R_cw, X_w) + t_cw
        pred = cameras.project(Xc, cam_params, model)
        r = pred - uv
        c2 = jnp.sum(r * r, axis=-1)
        r3 = None
        rr = None
        if has_stereo:
            z = jnp.maximum(Xc[..., 2], 1e-6)
            r3 = (pred[..., 0] - bf / z - ur) * stf
            c2 = c2 + r3 * r3
        if has_rcam:
            Xr = Xc @ R_rl.T + t_rl
            pred_r = cameras.project(Xr, cam_params_r, model)
            rr = (pred_r - uvr) * rcf[:, None]
            c2 = c2 + jnp.sum(rr * rr, axis=-1)
        return r, (r3, rr), Xc, R_cw, c2 * inv_sigma2

    def build_Hb(Rwb, pwb, vel, bg, ba, inlier, use_huber):
        r, (r3, rr), Xc, R_cw, chi2 = vis_chi2(Rwb, pwb)
        w = inv_sigma2 * inlier.astype(dtype)
        # Depth-positivity gate (see local_ba.lm_step).
        w = w * (Xc[..., 2] > 1e-2).astype(dtype)
        if use_huber:
            w = w * factors.huber_weight(chi2, th)

        Jproj = cameras.project_jac(Xc, cam_params, model)    # (N,2,3)
        y = jnp.einsum("ji,nj->ni", Rwb, X_w - pwb)
        Jth = jnp.einsum("ij,njl->nil", Rcb, lie.hat(y))
        Jp = -jnp.broadcast_to(R_cw, (X_w.shape[0], 3, 3))
        JXc = jnp.concatenate([Jth, Jp], axis=-1)             # (N,3,6)
        Jv = jnp.einsum("nri,nij->nrj", Jproj, JXc)           # (N,2,6)

        H = jnp.zeros((DOF, DOF), dtype)
        b = jnp.zeros((DOF,), dtype)
        H = H.at[:6, :6].add(jnp.einsum("nri,n,nrj->ij", Jv, w, Jv))
        b = b.at[:6].add(-jnp.einsum("nri,n,nr->i", Jv, w, r))
        if has_stereo:
            # d(u - bf/z)/d(tangent) = row_u + (bf/z^2) * dz/d(tangent),
            # with dz/dXc = e3 so dz/d(tangent) = JXc[:, 2, :].
            z = jnp.maximum(Xc[..., 2], 1e-6)
            J3 = Jv[:, 0, :] + (bf / (z * z))[:, None] * JXc[:, 2, :]
            w3 = w * stf
            H = H.at[:6, :6].add(jnp.einsum("ni,n,nj->ij", J3, w3, J3))
            b = b.at[:6].add(-jnp.einsum("ni,n,n->i", J3, w3, r3))
        if has_rcam:
            # Right-camera rows: J_proj(X_r) @ R_rl @ JXc.
            Xr = Xc @ R_rl.T + t_rl
            Jr = cameras.project_jac(Xr, cam_params_r, model)  # (N,2,3)
            Jr = jnp.einsum("nri,ij->nrj", Jr, R_rl)
            Jvr = jnp.einsum("nri,nij->nrj", Jr, JXc)          # (N,2,6)
            wrr = w * rcf * (Xr[..., 2] > 1e-2).astype(dtype)
            H = H.at[:6, :6].add(
                jnp.einsum("nri,n,nrj->ij", Jvr, wrr, Jvr))
            b = b.at[:6].add(-jnp.einsum("nri,n,nr->i", Jvr, wrr, rr))

        # Inertial edge (KF fixed): AD wrt the frame tangent.
        def f(d):
            R2, p2, v2, bg2, ba2 = _apply_delta(Rwb, pwb, vel, bg, ba, d)
            return _inertial_residual_white(
                preint, kf_Rwb, kf_pwb, kf_vel, bg2, ba2,
                R2, p2, v2, gravity)

        z = jnp.zeros(DOF, dtype)
        r_in = f(z)
        J_in = jax.jacfwd(f)(z)                              # (9,15)
        H = H + J_in.T @ J_in
        b = b - J_in.T @ r_in

        # Bias random walk to the KF's bias estimate (bg0/ba0 as anchor).
        r_rw = jnp.concatenate([bg - bg0, ba - ba0]) * walk_info
        J_rw = jnp.zeros((6, DOF), dtype).at[:, 9:15].set(
            jnp.diag(walk_info.astype(dtype)))
        H = H + J_rw.T @ J_rw
        b = b - J_rw.T @ r_rw
        return H, b

    def gn_iter(carry, use_huber):
        Rwb, pwb, vel, bg, ba, inlier = carry
        H, b = build_Hb(Rwb, pwb, vel, bg, ba, inlier, use_huber)
        H = H + damping * jnp.eye(DOF, dtype=dtype) * (
            1.0 + jnp.trace(H) / DOF)
        d = jnp.linalg.solve(H, b)
        Rwb, pwb, vel, bg, ba = _apply_delta(Rwb, pwb, vel, bg, ba, d)
        return (Rwb, pwb, vel, bg, ba, inlier)

    state = (Rwb0, pwb0, vel0, bg0, ba0, valid)
    for rnd_i in range(rounds):
        use_huber = rnd_i < rounds - 1
        state = jax.lax.fori_loop(
            0, iters, lambda i, c: gn_iter(c, use_huber), state)
        Rwb, pwb, vel, bg, ba, _ = state
        _, _, _, _, chi2 = vis_chi2(Rwb, pwb)
        inlier = valid & (chi2 <= th)
        state = (Rwb, pwb, vel, bg, ba, inlier)

    Rwb, pwb, vel, bg, ba, inlier = state
    # Hessian at the solution (undamped, kernel off) — the marginal
    # information the reference recovers into ConstraintPoseImu
    # (Optimizer.cc:7960-7998).
    H_out, _ = build_Hb(Rwb, pwb, vel, bg, ba, inlier, False)
    return PoseVIResult(Rwb=Rwb, pwb=pwb, vel=vel, bg=bg, ba=ba,
                        inlier=inlier,
                        n_inliers=jnp.sum(inlier).astype(jnp.int32),
                        H=H_out)


class PoseVIPriorResult(NamedTuple):
    Rwb: jax.Array
    pwb: jax.Array
    vel: jax.Array
    bg: jax.Array
    ba: jax.Array
    inlier: jax.Array
    n_inliers: jax.Array
    H_marg: jax.Array     # (15,15) prior information for the NEXT frame
                          # (Schur marginalization of the previous frame,
                          # Optimizer.cc:8508-8515 + Marginalize :5223)


@functools.partial(jax.jit, static_argnames=("model", "rounds", "iters"))
def optimize_pose_vi_prior(
    # Previous-frame state (free, held by its marginal prior).
    pRwb, ppwb, pvel, pbg, pba,
    H_prior,                            # (15,15) prior info at prev state
    # Current-frame init.
    Rwb0, pwb0, vel0, bg0, ba0,
    preint: pre.PreintState,            # prev-frame -> frame
    X_w, uv, inv_sigma2, valid,         # current frame's visual matches
    cam_params, Rcb, tcb, gravity,
    walk_info,                          # (6,)
    model: str = "pinhole",
    rounds: int = 3,
    iters: int = 4,
    chi2_th: float = CHI2_MONO,
    damping: float = 1e-5,
    ur: Optional[jax.Array] = None,  # (N,) right-image u; <0 = mono
    bf: float = 0.0,
    chi2_th_stereo: float = CHI2_STEREO,
    uvr: Optional[jax.Array] = None,  # (N,2) fisheye right-cam pixel
    cam_params_r=None,
    R_rl=None,
    t_rl=None,
    chi2_th_rcam: float = CHI2_RCAM,
) -> PoseVIPriorResult:
    """Ref: PoseInertialOptimizationLastFrame (Optimizer.cc:8009): joint
    30-dof problem over (previous frame, current frame) — visual
    reprojection on the current pose (stereo row for ur > 0), one
    inertial edge, bias random walk, and the previous frame's 15x15
    marginal prior (EdgePriorPoseImu, include/G2oTypes.h:798). After
    convergence the previous frame is Schur-marginalized; the reduced
    15x15 information becomes the next frame's prior — frame-to-frame
    VIO stays O(1) in trajectory length."""
    dtype = Rwb0.dtype
    D2 = 2 * DOF
    has_stereo = ur is not None
    has_rcam = uvr is not None
    if has_stereo:
        st = (ur > 0) & valid
        stf = st.astype(dtype)
        th = jnp.where(st, chi2_th_stereo, chi2_th)
    elif has_rcam:
        rc = (uvr[:, 0] >= 0) & valid
        rcf = rc.astype(dtype)
        th = jnp.where(rc, chi2_th_rcam, chi2_th)
    else:
        th = chi2_th
    # Prior linearization anchor = incoming previous state.
    aRwb, apwb, avel, abg, aba = pRwb, ppwb, pvel, pbg, pba

    def vis_chi2(Rwb, pwb):
        R_cw, t_cw = _cam_from_body(Rwb, pwb, Rcb, tcb)
        Xc = jnp.einsum("ij,nj->ni", R_cw, X_w) + t_cw
        pred = cameras.project(Xc, cam_params, model)
        r = pred - uv
        c2 = jnp.sum(r * r, axis=-1)
        r3 = None
        rr = None
        if has_stereo:
            z = jnp.maximum(Xc[..., 2], 1e-6)
            r3 = (pred[..., 0] - bf / z - ur) * stf
            c2 = c2 + r3 * r3
        if has_rcam:
            Xr = Xc @ R_rl.T + t_rl
            pred_r = cameras.project(Xr, cam_params_r, model)
            rr = (pred_r - uvr) * rcf[:, None]
            c2 = c2 + jnp.sum(rr * rr, axis=-1)
        return r, (r3, rr), Xc, R_cw, c2 * inv_sigma2

    def prior_tangent(Rwb, pwb, vel, bg, ba):
        """Tangent of the prev state wrt the prior anchor (matches
        _apply_delta's parameterization)."""
        return jnp.concatenate([
            lie.so3_log(jnp.swapaxes(aRwb, -1, -2) @ Rwb),
            pwb - apwb, vel - avel, bg - abg, ba - aba])

    def build_Hb(state, inlier, use_huber):
        (pR, pp, pv, pg, pa, Rwb, pwb, vel, bg, ba) = state
        H = jnp.zeros((D2, D2), dtype)
        b = jnp.zeros((D2,), dtype)

        # Visual terms on the current pose (rows 15:21 of the tangent).
        r, (r3, rr), Xc, R_cw, chi2 = vis_chi2(Rwb, pwb)
        w = inv_sigma2 * inlier.astype(dtype)
        # Depth-positivity gate (see local_ba.lm_step).
        w = w * (Xc[..., 2] > 1e-2).astype(dtype)
        if use_huber:
            w = w * factors.huber_weight(chi2, th)
        Jproj = cameras.project_jac(Xc, cam_params, model)
        y = jnp.einsum("ji,nj->ni", Rwb, X_w - pwb)
        Jth = jnp.einsum("ij,njl->nil", Rcb, lie.hat(y))
        Jp = -jnp.broadcast_to(R_cw, (X_w.shape[0], 3, 3))
        JXc = jnp.concatenate([Jth, Jp], axis=-1)
        Jv = jnp.einsum("nri,nij->nrj", Jproj, JXc)          # (N,2,6)
        H = H.at[DOF:DOF + 6, DOF:DOF + 6].add(
            jnp.einsum("nri,n,nrj->ij", Jv, w, Jv))
        b = b.at[DOF:DOF + 6].add(-jnp.einsum("nri,n,nr->i", Jv, w, r))
        if has_stereo:
            z = jnp.maximum(Xc[..., 2], 1e-6)
            J3 = Jv[:, 0, :] + (bf / (z * z))[:, None] * JXc[:, 2, :]
            w3 = w * stf
            H = H.at[DOF:DOF + 6, DOF:DOF + 6].add(
                jnp.einsum("ni,n,nj->ij", J3, w3, J3))
            b = b.at[DOF:DOF + 6].add(
                -jnp.einsum("ni,n,n->i", J3, w3, r3))
        if has_rcam:
            Xr = Xc @ R_rl.T + t_rl
            Jr = cameras.project_jac(Xr, cam_params_r, model)
            Jr = jnp.einsum("nri,ij->nrj", Jr, R_rl)
            Jvr = jnp.einsum("nri,nij->nrj", Jr, JXc)
            wrr = w * rcf * (Xr[..., 2] > 1e-2).astype(dtype)
            H = H.at[DOF:DOF + 6, DOF:DOF + 6].add(
                jnp.einsum("nri,n,nrj->ij", Jvr, wrr, Jvr))
            b = b.at[DOF:DOF + 6].add(
                -jnp.einsum("nri,n,nr->i", Jvr, wrr, rr))

        # Inertial edge between the two frames (AD over both tangents).
        def f(dp, dc):
            pR2, pp2, pv2, pg2, pa2 = _apply_delta(pR, pp, pv, pg, pa, dp)
            R2, p2, v2, _, _ = _apply_delta(Rwb, pwb, vel, bg, ba, dc)
            return _inertial_residual_white(
                preint, pR2, pp2, pv2, pg2, pa2, R2, p2, v2, gravity)

        z = jnp.zeros(DOF, dtype)
        r_in = f(z, z)
        Jp_in = jax.jacfwd(f, 0)(z, z)
        Jc_in = jax.jacfwd(f, 1)(z, z)
        J_in = jnp.concatenate([Jp_in, Jc_in], axis=1)       # (9,30)
        H = H + J_in.T @ J_in
        b = b - J_in.T @ r_in

        # Bias random walk prev -> cur.
        r_rw = jnp.concatenate([bg - pg, ba - pa]) * walk_info
        Jrw = jnp.zeros((6, D2), dtype)
        Jrw = Jrw.at[:, DOF + 9:DOF + 15].set(jnp.diag(walk_info))
        Jrw = Jrw.at[:, 9:15].set(-jnp.diag(walk_info))
        H = H + Jrw.T @ Jrw
        b = b - Jrw.T @ r_rw

        # Marginal prior on the previous frame. Residual in the prior's
        # tangent; Jacobian wrt the prev tangent ~= identity near the
        # anchor (first-order, standard marginal-prior practice).
        r_pr = prior_tangent(pR, pp, pv, pg, pa)
        H = H.at[:DOF, :DOF].add(H_prior)
        b = b.at[:DOF].add(-H_prior @ r_pr)
        return H, b

    def gn_iter(carry, use_huber):
        state, inlier = carry[:-1], carry[-1]
        H, b = build_Hb(state, inlier, use_huber)
        H = H + damping * jnp.eye(D2, dtype=dtype) * (
            1.0 + jnp.trace(H) / D2)
        d = jnp.linalg.solve(H, b)
        (pR, pp, pv, pg, pa, Rwb, pwb, vel, bg, ba) = state
        pR, pp, pv, pg, pa = _apply_delta(pR, pp, pv, pg, pa, d[:DOF])
        Rwb, pwb, vel, bg, ba = _apply_delta(Rwb, pwb, vel, bg, ba,
                                             d[DOF:])
        return (pR, pp, pv, pg, pa, Rwb, pwb, vel, bg, ba, inlier)

    carry = (pRwb, ppwb, pvel, pbg, pba, Rwb0, pwb0, vel0, bg0, ba0, valid)
    for rnd_i in range(rounds):
        use_huber = rnd_i < rounds - 1
        carry = jax.lax.fori_loop(
            0, iters, lambda i, c: gn_iter(c, use_huber), carry)
        Rwb, pwb = carry[5], carry[6]
        _, _, _, _, chi2 = vis_chi2(Rwb, pwb)
        inlier = valid & (chi2 <= th)
        carry = carry[:-1] + (inlier,)

    state, inlier = carry[:-1], carry[-1]
    (pR, pp, pv, pg, pa, Rwb, pwb, vel, bg, ba) = state
    # Schur-marginalize the previous frame out of the final Hessian:
    # H_marg = Hcc - Hcp Hpp^-1 Hpc (Optimizer.cc:8511, Marginalize :5223).
    H, _ = build_Hb(state, inlier, False)
    Hpp = H[:DOF, :DOF] + 1e-6 * jnp.eye(DOF, dtype=dtype)
    Hcp = H[DOF:, :DOF]
    H_marg = H[DOF:, DOF:] - Hcp @ jnp.linalg.solve(Hpp, Hcp.T)
    H_marg = 0.5 * (H_marg + H_marg.T)
    return PoseVIPriorResult(
        Rwb=Rwb, pwb=pwb, vel=vel, bg=bg, ba=ba, inlier=inlier,
        n_inliers=jnp.sum(inlier).astype(jnp.int32), H_marg=H_marg)
