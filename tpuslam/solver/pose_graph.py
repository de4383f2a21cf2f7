"""Essential-graph (pose-graph) optimization over Sim(3) keyframe states.

Replaces `Optimizer::OptimizeEssentialGraph` (7-DoF,
/root/reference/src/Optimizer.cc:2385; BlockSolver_7_3, loop +
spanning-tree + covisibility edges) and the 4-DoF inertial variant
(:8520). States are S_iw = (s_i, R_i, t_i) mapping world -> keyframe i;
edges carry measured relative transforms S_ij = S_iw o S_jw^-1.

The residual uses the decoupled log [so3_log(R_err), t_err, log(s_err)]
(first-order equivalent to the full sim3 log; standard in pose-graph
practice). Per-edge Jacobians come from AD at the zero tangent; the
dense (7K,7K) Hessian is assembled by scatter-add and Cholesky-solved —
for K<=512 keyframes this is a trivial dense problem for the MXU,
replacing g2o's sparse machinery.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.geometry import lie

DOF7 = 7


class PoseGraphResult(NamedTuple):
    s: jax.Array   # (K,)
    R: jax.Array   # (K,3,3)
    t: jax.Array   # (K,3)
    cost: jax.Array


def _apply(s, R, t, th):
    """Left-multiplicative sim3 update by tangent [omega, v, log_ds]."""
    dR, dt = lie.se3_exp(th[..., :6])
    ds = jnp.exp(th[..., 6])
    return (
        s * ds,
        dR @ R,
        ds[..., None] * jnp.einsum("...ij,...j->...i", dR, t) + dt,
    )


def _rel_residual(si, Ri, ti, sj, Rj, tj, s_m, R_m, t_m):
    """Residual of edge (i,j) with measurement S_ij: log(S_m^-1 Si Sj^-1)."""
    # S_i o S_j^-1
    s_ij, R_ij, t_ij = lie.sim3_compose(
        si, Ri, ti, *lie.sim3_inverse(sj, Rj, tj))
    # S_m^-1 o (S_i S_j^-1)
    s_e, R_e, t_e = lie.sim3_compose(
        *lie.sim3_inverse(s_m, R_m, t_m), s_ij, R_ij, t_ij)
    return jnp.concatenate([
        lie.so3_log(R_e), t_e, jnp.log(s_e)[None]])


@functools.partial(jax.jit,
                   static_argnames=("iters", "fix_scale", "yaw_only"))
def optimize_pose_graph(
    s, R, t,             # (K,), (K,3,3), (K,3) current Sim3 states S_iw
    valid,               # (K,)
    fixed,               # (K,) gauge anchors (the loop KF in the reference)
    edges_i, edges_j,    # (E,) keyframe indices per edge
    edge_s, edge_R, edge_t,  # (E,...) measured relative S_ij
    edge_valid,          # (E,)
    edge_weight,         # (E,) information scale (loop edges > covis edges)
    iters: int = 12,
    fix_scale: bool = False,
    yaw_only: bool = False,
    gravity_w=None,      # (3,) world gravity direction (yaw_only mode)
) -> PoseGraphResult:
    """`yaw_only=True` is the OptimizeEssentialGraph4DoF analog
    (/root/reference/src/Optimizer.cc:8520, VertexPose4DoF/Edge4DoF):
    for IMU-initialized maps pitch/roll are observable from gravity and
    must NOT be bent by the pose graph — each state's rotation update is
    projected onto the single world-gravity axis (expressed in the state
    frame: a_i = R_i g_w, since a left tangent omega equals world axis
    R_i^T omega), leaving yaw + translation (+pinned scale) free."""
    K = s.shape[0]
    dtype = t.dtype
    n = DOF7 * K
    free = (valid & ~fixed).astype(dtype)

    if yaw_only:
        g_unit = gravity_w / jnp.maximum(jnp.linalg.norm(gravity_w), 1e-12)

    def tangent_projector(R_cur):
        """Per-state 7x7 tangent projector M_k: rotation block a a^T
        restricted to the gravity axis a_k = R_k g_w, translation
        identity, scale handled by fix_scale's own masking."""
        a = jnp.einsum("kij,j->ki", R_cur, g_unit)
        M = jnp.zeros((K, DOF7, DOF7), dtype)
        M = M.at[:, :3, :3].set(jnp.einsum("ki,kj->kij", a, a))
        idx = jnp.arange(3, DOF7)
        return M.at[:, idx, idx].set(1.0)

    def edge_res_jac(si, Ri, ti, sj, Rj, tj, sm, Rm, tm):
        def f(di, dj):
            s1, R1, t1 = _apply(si, Ri, ti, di)
            s2, R2, t2 = _apply(sj, Rj, tj, dj)
            return _rel_residual(s1, R1, t1, s2, R2, t2, sm, Rm, tm)

        z = jnp.zeros(DOF7, dtype)
        r = f(z, z)
        Ji = jax.jacfwd(f, 0)(z, z)
        Jj = jax.jacfwd(f, 1)(z, z)
        return r, Ji, Jj

    def gn_step(carry, _):
        s, R, t = carry
        r, Ji, Jj = jax.vmap(
            lambda i, j, sm, Rm, tm: edge_res_jac(
                s[i], R[i], t[i], s[j], R[j], t[j], sm, Rm, tm)
        )(edges_i, edges_j, edge_s, edge_R, edge_t)
        w = (edge_valid.astype(dtype) * edge_weight)[:, None, None]
        Ji = Ji * jnp.sqrt(w)
        Jj = Jj * jnp.sqrt(w)
        rw = r * jnp.sqrt(edge_valid.astype(dtype) * edge_weight)[:, None]
        if fix_scale:
            Ji = Ji.at[:, :, 6].set(0.0)
            Jj = Jj.at[:, :, 6].set(0.0)

        H = jnp.zeros((K, DOF7, K, DOF7), dtype)
        H = H.at[edges_i, :, edges_i, :].add(
            jnp.einsum("eri,erj->eij", Ji, Ji))
        H = H.at[edges_j, :, edges_j, :].add(
            jnp.einsum("eri,erj->eij", Jj, Jj))
        H = H.at[edges_i, :, edges_j, :].add(
            jnp.einsum("eri,erj->eij", Ji, Jj))
        H = H.at[edges_j, :, edges_i, :].add(
            jnp.einsum("eri,erj->eij", Jj, Ji))
        b = jnp.zeros((K, DOF7), dtype)
        b = b.at[edges_i].add(-jnp.einsum("eri,er->ei", Ji, rw))
        b = b.at[edges_j].add(-jnp.einsum("eri,er->ei", Jj, rw))

        if yaw_only:
            # Project each state's update subspace onto yaw+translation:
            # H <- M H M (+ I - M to pin the complement), b <- M b.
            # M is block-diagonal symmetric idempotent, so the solve in
            # the projected metric directly yields d in the subspace.
            M = tangent_projector(R)                       # (K,7,7)
            H4 = H.reshape(K, DOF7, K, DOF7)
            H4 = jnp.einsum("kab,kbqc,qcd->kaqd", M, H4, M)
            eyeM = jnp.eye(DOF7, dtype=dtype)[None] - M
            H4 = H4.at[jnp.arange(K), :, jnp.arange(K), :].add(eyeM)
            H = H4.reshape(n, n)
            b = jnp.einsum("kab,kb->ka", M, b)

        H = H.reshape(n, n)
        fmask = jnp.repeat(free, DOF7)
        H = H * fmask[:, None] * fmask[None, :] + jnp.diag(1.0 - fmask)
        H = H + 1e-6 * jnp.eye(n, dtype=dtype)
        d = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(H, lower=True),
            b.reshape(-1) * fmask,
        ).reshape(K, DOF7)
        if fix_scale:
            d = d.at[:, 6].set(0.0)
        if yaw_only:
            d = jnp.einsum("kab,kb->ka", M, d)
        s, R, t = jax.vmap(_apply)(s, R, t, d)
        R = lie.normalize_rotation(R)
        return (s, R, t), jnp.sum(rw * rw)

    (s, R, t), costs = jax.lax.scan(gn_step, (s, R, t), None, length=iters)
    return PoseGraphResult(s=s, R=R, t=t, cost=costs[-1])
