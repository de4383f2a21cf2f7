"""Stage-cumulative BA profiling inside one jit (scan-amortized)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.solver import local_ba, factors
from tpuslam.geometry import cameras

K, M = 24, 4096
rng = np.random.default_rng(0)
cam = jnp.asarray([458.0, 458.0, 376.0, 240.0], jnp.float32)

pts = rng.uniform([-8, -8, 4], [8, 8, 12], (M, 3)).astype(np.float32)
kf_R = np.stack([np.eye(3, dtype=np.float32)] * K)
kf_t = rng.normal(0, 0.1, (K, 3)).astype(np.float32)
Xc0 = np.einsum("kij,mj->kmi", kf_R, pts) + kf_t[:, None]
uv = np.array(cameras.project(jnp.asarray(Xc0), cam, "pinhole"))
uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)

prob = local_ba.BAProblem(
    kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(kf_t),
    kf_fixed=jnp.asarray(np.arange(K) >= 16),
    points=jnp.asarray(pts), pt_valid=jnp.ones((M,), bool),
    obs_uv=jnp.asarray(uv), obs_mask=jnp.ones((K, M), bool),
    obs_inv_sigma2=jnp.ones((K, M), jnp.float32),
)
mask = np.ones((K, M), bool)
maskf = jnp.asarray(mask, jnp.float32)
w0 = prob.obs_inv_sigma2 * maskf
REPS = 30


def scan_time(name, body):
    """body: (pts_perturbed) -> scalar-reducible pytree"""
    xs = jnp.stack([prob.points + 1e-5 * i for i in range(REPS)])

    @jax.jit
    def run(xs):
        def f(c, x):
            out = body(x)
            return c + jnp.sum(jax.tree_util.tree_leaves(out)[0][..., 0]).astype(jnp.float32), 0.0
        c, _ = jax.lax.scan(f, jnp.float32(0), xs)
        return c

    float(run(xs))
    t0 = time.perf_counter()
    float(run(xs))
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:45s} {ms:8.3f} ms")
    return ms


def stage_resid(points):
    r, Xc, chi2 = local_ba._residuals(prob, prob.kf_R, prob.kf_t, points, cam, "pinhole")
    return chi2[..., None]


def stage_jac(points):
    r, Xc, chi2 = local_ba._residuals(prob, prob.kf_R, prob.kf_t, points, cam, "pinhole")
    Jp, Jx = factors.reproj_jacobians(Xc, prob.kf_R[:, None], cam, "pinhole")
    return Jp


def stage_hess(points):
    r, Xc, chi2 = local_ba._residuals(prob, prob.kf_R, prob.kf_t, points, cam, "pinhole")
    w = w0 * factors.huber_weight(chi2, 5.991)
    Jp, Jx = factors.reproj_jacobians(Xc, prob.kf_R[:, None], cam, "pinhole")
    U = jnp.einsum("kmri,km,kmrj->kij", Jp, w, Jp)
    V = jnp.einsum("kmri,km,kmrj->mij", Jx, w, Jx)
    Wb = jnp.einsum("kmri,km,kmrj->kmij", Jp, w, Jx)
    bc = -jnp.einsum("kmri,km,kmr->ki", Jp, w, r)
    bp = -jnp.einsum("kmri,km,kmr->mi", Jx, w, r)
    return (U, V, Wb, bc, bp)


def stage_schur(points):
    U, V, Wb, bc, bp = stage_hess(points)
    lam = 1e-4
    U = U + lam * jnp.eye(6)[None]
    V = V + lam * jnp.eye(3)[None]
    Vinv = jnp.linalg.inv(V)
    WVinv = jnp.einsum("kmij,mjl->kmil", Wb, Vinv)
    S_off = jnp.einsum("kmil,qmjl->kiqj", WVinv, Wb)
    S = -S_off
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(U)
    S = S.reshape(6 * K, 6 * K)
    bred = (bc - jnp.einsum("kmil,ml->ki", WVinv, bp)).reshape(-1)
    return (S, bred, Wb, V, bp)


def stage_solve(points):
    S, bred, Wb, V, bp = stage_schur(points)
    L, low = jax.scipy.linalg.cho_factor(S + 1e-8 * jnp.eye(6 * K), lower=True)
    dc = jax.scipy.linalg.cho_solve((L, low), bred).reshape(K, 6)
    Vinv = jnp.linalg.inv(V)
    dp = jnp.einsum("mij,mj->mi", Vinv, bp - jnp.einsum("kmij,ki->mj", Wb, dc))
    return (dc, dp)


def stage_full(points):
    p = prob._replace(points=points)
    return local_ba.optimize(p, cam, iters=1).points[..., None]


scan_time("residuals+chi2", stage_resid)
scan_time("+ jacobians", stage_jac)
scan_time("+ hessian blocks", stage_hess)
scan_time("+ schur reduce", stage_schur)
scan_time("+ solve + backsub", stage_solve)
scan_time("full optimize(iters=1)", stage_full)


# ---------------- M-last prototype ----------------
def inv3x3_mlast(V):
    """Closed-form inverse of (3,3,M) batched over the last axis."""
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
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / det
    return jnp.stack([
        jnp.stack([A, B, C]), jnp.stack([D, E, F]), jnp.stack([G, H, I])
    ]) * inv_det


def stage_full_mlast(points):
    kf_R, kf_t = prob.kf_R, prob.kf_t
    lam = 1e-4
    Xw = points.T                                   # (3,M)
    Xc = jnp.einsum("kij,jm->kim", kf_R, Xw) + kf_t[:, :, None]  # (K,3,M)
    fx, fy, cx, cy = cam
    z = jnp.maximum(Xc[:, 2], 1e-6)
    zi = 1.0 / z
    u = fx * Xc[:, 0] * zi + cx
    v = fy * Xc[:, 1] * zi + cy
    robs = jnp.stack([u, v], 1) - prob.obs_uv.transpose(0, 2, 1)  # (K,2,M)
    chi2 = jnp.sum(robs * robs, 1) * prob.obs_inv_sigma2          # (K,M)
    w = w0 * factors.huber_weight(chi2, 5.991)

    # Jproj (K,2,3,M)
    zi2 = zi * zi
    zeros = jnp.zeros_like(z)
    Jproj = jnp.stack([
        jnp.stack([fx * zi, zeros, -fx * Xc[:, 0] * zi2], 1),
        jnp.stack([zeros, fy * zi, -fy * Xc[:, 1] * zi2], 1),
    ], 1)
    # dXc/dpose (K,3,6,M): [-hat(Xc) | I]
    x_, y_, z_ = Xc[:, 0], Xc[:, 1], Xc[:, 2]
    one = jnp.ones_like(z_)
    JXc = jnp.stack([
        jnp.stack([zeros, z_, -y_, one, zeros, zeros], 1),
        jnp.stack([-z_, zeros, x_, zeros, one, zeros], 1),
        jnp.stack([y_, -x_, zeros, zeros, zeros, one], 1),
    ], 1)
    Jp = jnp.einsum("krjm,kjim->krim", Jproj, JXc)     # (K,2,6,M)
    Jx = jnp.einsum("krjm,kji->krim", Jproj, kf_R)     # (K,2,3,M)

    U = jnp.einsum("krim,km,krjm->kij", Jp, w, Jp)
    V = jnp.einsum("krim,km,krjm->ijm", Jx, w, Jx)     # (3,3,M)
    Wb = jnp.einsum("krim,km,krjm->kijm", Jp, w, Jx)   # (K,6,3,M)
    bc = -jnp.einsum("krim,km,krm->ki", Jp, w, robs)
    bp = -jnp.einsum("krim,km,krm->im", Jx, w, robs)   # (3,M)

    U = U + lam * jnp.eye(6)[None]
    V = V + lam * jnp.eye(3)[:, :, None]
    Vinv = inv3x3_mlast(V)
    WVinv = jnp.einsum("kijm,jlm->kilm", Wb, Vinv)
    S_off = jnp.einsum("kilm,qjlm->kiqj", WVinv, Wb)
    S = -S_off
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(U)
    S = S.reshape(6 * K, 6 * K)
    bred = (bc - jnp.einsum("kilm,lm->ki", WVinv, bp)).reshape(-1)
    L, low = jax.scipy.linalg.cho_factor(S + 1e-8 * jnp.eye(6 * K), lower=True)
    dc = jax.scipy.linalg.cho_solve((L, low), bred).reshape(K, 6)
    tmp = bp - jnp.einsum("kijm,ki->jm", Wb, dc)
    dp = jnp.einsum("jlm,lm->jm", Vinv, tmp)
    return (dc, dp)


scan_time("M-last full LM step", stage_full_mlast)


def _mlast_parts(points, upto):
    kf_R, kf_t = prob.kf_R, prob.kf_t
    lam = 1e-4
    Xw = points.T
    Xc = jnp.einsum("kij,jm->kim", kf_R, Xw) + kf_t[:, :, None]
    fx, fy, cx, cy = cam
    z = jnp.maximum(Xc[:, 2], 1e-6)
    zi = 1.0 / z
    u = fx * Xc[:, 0] * zi + cx
    v = fy * Xc[:, 1] * zi + cy
    robs = jnp.stack([u, v], 1) - prob.obs_uv.transpose(0, 2, 1)
    chi2 = jnp.sum(robs * robs, 1) * prob.obs_inv_sigma2
    w = w0 * factors.huber_weight(chi2, 5.991)
    if upto == "resid":
        return (w, robs)
    zi2 = zi * zi
    zeros = jnp.zeros_like(z)
    Jproj = jnp.stack([
        jnp.stack([fx * zi, zeros, -fx * Xc[:, 0] * zi2], 1),
        jnp.stack([zeros, fy * zi, -fy * Xc[:, 1] * zi2], 1),
    ], 1)
    x_, y_, z_ = Xc[:, 0], Xc[:, 1], Xc[:, 2]
    one = jnp.ones_like(z_)
    JXc = jnp.stack([
        jnp.stack([zeros, z_, -y_, one, zeros, zeros], 1),
        jnp.stack([-z_, zeros, x_, zeros, one, zeros], 1),
        jnp.stack([y_, -x_, zeros, zeros, zeros, one], 1),
    ], 1)
    Jp = jnp.einsum("krjm,kjim->krim", Jproj, JXc)
    Jx = jnp.einsum("krjm,kji->krim", Jproj, kf_R)
    if upto == "jac":
        return (Jp, Jx)
    U = jnp.einsum("krim,km,krjm->kij", Jp, w, Jp)
    V = jnp.einsum("krim,km,krjm->ijm", Jx, w, Jx)
    Wb = jnp.einsum("krim,km,krjm->kijm", Jp, w, Jx)
    bc = -jnp.einsum("krim,km,krm->ki", Jp, w, robs)
    bp = -jnp.einsum("krim,km,krm->im", Jx, w, robs)
    if upto == "hess":
        return (U, V, Wb, bc, bp)
    U = U + lam * jnp.eye(6)[None]
    V = V + lam * jnp.eye(3)[:, :, None]
    Vinv = inv3x3_mlast(V)
    WVinv = jnp.einsum("kijm,jlm->kilm", Wb, Vinv)
    S_off = jnp.einsum("kilm,qjlm->kiqj", WVinv, Wb)
    if upto == "soff":
        return (S_off, bc)
    S = -S_off
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(U)
    S = S.reshape(6 * K, 6 * K)
    bred = (bc - jnp.einsum("kilm,lm->ki", WVinv, bp)).reshape(-1)
    L, low = jax.scipy.linalg.cho_factor(S + 1e-8 * jnp.eye(6 * K), lower=True)
    dc = jax.scipy.linalg.cho_solve((L, low), bred).reshape(K, 6)
    if upto == "solve":
        return (dc,)
    tmp = bp - jnp.einsum("kijm,ki->jm", Wb, dc)
    dp = jnp.einsum("jlm,lm->jm", Vinv, tmp)
    return (dc, dp)


scan_time("mlast: resid", lambda p: _mlast_parts(p, "resid"))
scan_time("mlast: +jac", lambda p: _mlast_parts(p, "jac"))
scan_time("mlast: +hess", lambda p: _mlast_parts(p, "hess"))
scan_time("mlast: +S_off", lambda p: _mlast_parts(p, "soff"))
scan_time("mlast: +solve", lambda p: _mlast_parts(p, "solve"))
scan_time("mlast: full", lambda p: _mlast_parts(p, "all"))


scan_time("noop (scan-step overhead)", lambda p: (p[:, :1] * 2.0,))
scan_time("chol144 only", lambda p: (
    jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(
            jnp.eye(144) * (2.0 + p[0, 0]) + jnp.ones((144, 144)) * 1e-3,
            lower=True),
        jnp.ones((144,)) * p[0, 0]),))


def stage_v2(points, upto="all"):
    kf_R, kf_t = prob.kf_R, prob.kf_t
    lam = 1e-4
    Xw = points.T
    Xc = jnp.einsum("kij,jm->kim", kf_R, Xw) + kf_t[:, :, None]  # (K,3,M)
    fx, fy, cx, cy = cam
    x, y = Xc[:, 0], Xc[:, 1]
    z = jnp.maximum(Xc[:, 2], 1e-6)
    zi = 1.0 / z
    ru = fx * x * zi + cx - prob.obs_uv[:, :, 0]
    rv = fy * y * zi + cy - prob.obs_uv[:, :, 1]
    chi2 = (ru * ru + rv * rv) * prob.obs_inv_sigma2
    w = w0 * factors.huber_weight(chi2, 5.991)
    if upto == "resid":
        return (w, ru)
    a = fx * zi
    b = -a * x * zi
    c = fy * zi
    d = -c * y * zi
    # J_pose planes (2 rows x 6 cols), each (K,M)
    zero = jnp.zeros_like(a)
    Jp_u = [b * y, a * z - b * x, -a * y, a, zero, b]
    Jp_v = [-c * z + d * y, -d * x, c * x, zero, c, d]
    # J_point rows: u = a*R0j + b*R2j ; v = c*R1j + d*R2j
    R0 = kf_R[:, 0][..., None]  # (K,3,1) -> broadcast (K,3,M) per j? index per j
    Jx_u = [a * kf_R[:, 0, j][:, None] + b * kf_R[:, 2, j][:, None]
            for j in range(3)]
    Jx_v = [c * kf_R[:, 1, j][:, None] + d * kf_R[:, 2, j][:, None]
            for j in range(3)]
    # Fold r into lanes: (K, 6, 2M), (K, 3, 2M), (K, 2M)
    J6 = jnp.stack([jnp.concatenate([u_, v_], -1)
                    for u_, v_ in zip(Jp_u, Jp_v)], 1)
    J3 = jnp.stack([jnp.concatenate([u_, v_], -1)
                    for u_, v_ in zip(Jx_u, Jx_v)], 1)
    w2 = jnp.concatenate([w, w], -1)
    r2 = jnp.concatenate([ru, rv], -1)
    if upto == "jac":
        return (J6, J3)
    J6w = J6 * w2[:, None, :]
    U = jnp.einsum("kim,kjm->kij", J6w, J6)           # (K,6,6) batched matmul
    bc = -jnp.einsum("kim,km->ki", J6w, r2)
    J3w = J3 * w2[:, None, :]
    # V (3,3,M): sum over k and r-halves
    Vh = J3w[..., :M] * 1.0
    V = jnp.einsum("kim,kjm->ijm", J3w[..., :M], J3[..., :M]) \
        + jnp.einsum("kim,kjm->ijm", J3w[..., M:], J3[..., M:])
    bp = -(jnp.einsum("kim,km->im", J3w[..., :M], r2[..., :M])
           + jnp.einsum("kim,km->im", J3w[..., M:], r2[..., M:]))
    # Wb (K,6,3,M)
    Wb = (J6w[:, :, None, :M] * J3[:, None, :, :M]
          + J6w[:, :, None, M:] * J3[:, None, :, M:])
    if upto == "hess":
        return (U, V, Wb, bc, bp)
    U = U + lam * jnp.eye(6)[None]
    V = V + lam * jnp.eye(3)[:, :, None]
    Vinv = inv3x3_mlast(V)
    WVinv = sum(Wb[:, :, j, None, :] * Vinv[j][None, None] for j in range(3))
    A = WVinv.reshape(K * 6, 3 * M)
    B = Wb.reshape(K * 6, 3 * M)
    S = -(A @ B.T)
    S = S.reshape(K, 6, K, 6)
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(U)
    S = S.reshape(6 * K, 6 * K)
    bred = (bc - jnp.einsum("kilm,lm->ki", WVinv, bp)).reshape(-1)
    if upto == "soff":
        return (S, bred)
    L, low = jax.scipy.linalg.cho_factor(S + 1e-8 * jnp.eye(6 * K), lower=True)
    dc = jax.scipy.linalg.cho_solve((L, low), bred).reshape(K, 6)
    if upto == "solve":
        return (dc,)
    tmp = bp - jnp.einsum("kijm,ki->jm", Wb, dc)
    dp = jnp.einsum("jlm,lm->jm", Vinv, tmp)
    return (dc, dp)


scan_time("v2: resid", lambda p: stage_v2(p, "resid"))
scan_time("v2: +jac", lambda p: stage_v2(p, "jac"))
scan_time("v2: +hess", lambda p: stage_v2(p, "hess"))
scan_time("v2: +schur", lambda p: stage_v2(p, "soff"))
scan_time("v2: +solve", lambda p: stage_v2(p, "solve"))
scan_time("v2: full", lambda p: stage_v2(p, "all"))
