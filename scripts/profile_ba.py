"""Dissect local-BA device time on the TPU: which op dominates?"""
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
Xc = np.einsum("kij,mj->kmi", kf_R, pts) + kf_t[:, None]
uv = np.array(cameras.project(jnp.asarray(Xc), cam, "pinhole"))
uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)

prob = local_ba.BAProblem(
    kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(kf_t),
    kf_fixed=jnp.asarray(np.arange(K) >= 16),
    points=jnp.asarray(pts), pt_valid=jnp.ones((M,), bool),
    obs_uv=jnp.asarray(uv), obs_mask=jnp.ones((K, M), bool),
    obs_inv_sigma2=jnp.ones((K, M), jnp.float32),
)


def timeit(name, fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:40s} {dt:8.3f} ms")
    return out


timeit("full optimize iters=10", lambda p: local_ba.optimize(p, cam, iters=10), prob, reps=5)
timeit("full optimize iters=1", lambda p: local_ba.optimize(p, cam, iters=1), prob, reps=5)

# Individual pieces, jitted separately
mask = prob.obs_mask & prob.pt_valid[None, :]
maskf = mask.astype(jnp.float32)


@jax.jit
def resid(p):
    r, Xc, chi2 = local_ba._residuals(p, p.kf_R, p.kf_t, p.points, cam, "pinhole")
    return chi2


timeit("residuals+chi2", resid, prob)


@jax.jit
def jacs(p):
    r, Xc, chi2 = local_ba._residuals(p, p.kf_R, p.kf_t, p.points, cam, "pinhole")
    return factors.reproj_jacobians(Xc, p.kf_R[:, None], cam, "pinhole")


J_pose, J_point = timeit("residuals+jacobians", jacs, prob)
w = prob.obs_inv_sigma2 * maskf
r_, Xc_, chi2_ = local_ba._residuals(prob, prob.kf_R, prob.kf_t, prob.points, cam, "pinhole")


@jax.jit
def hessians(J_pose, J_point, w, r):
    U = jnp.einsum("kmri,km,kmrj->kij", J_pose, w, J_pose)
    V = jnp.einsum("kmri,km,kmrj->mij", J_point, w, J_point)
    Wb = jnp.einsum("kmri,km,kmrj->kmij", J_pose, w, J_point)
    bc = -jnp.einsum("kmri,km,kmr->ki", J_pose, w, r)
    bp = -jnp.einsum("kmri,km,kmr->mi", J_point, w, r)
    return U, V, Wb, bc, bp


U, V, Wb, bc, bp = timeit("hessian blocks (U,V,W,bc,bp)", hessians, J_pose, J_point, w, r_)


@jax.jit
def schur(U, V, Wb, bc, bp):
    Vinv = jnp.linalg.inv(V + 1e-4 * jnp.eye(3)[None])
    WVinv = jnp.einsum("kmij,mjl->kmil", Wb, Vinv)
    S_off = jnp.einsum("kmil,qmjl->kiqj", WVinv, Wb)
    S = -S_off
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(U + 1e-4 * jnp.eye(6)[None])
    S = S.reshape(6 * K, 6 * K)
    bred = (bc - jnp.einsum("kmil,ml->ki", WVinv, bp)).reshape(-1)
    return S, bred


S, bred = timeit("schur reduce (Vinv,WVinv,S)", schur, U, V, Wb, bc, bp)


@jax.jit
def solve(S, bred):
    L, low = jax.scipy.linalg.cho_factor(S + 1e-8 * jnp.eye(6 * K), lower=True)
    return jax.scipy.linalg.cho_solve((L, low), bred)


timeit("cholesky solve 144x144", solve, S, bred)


@jax.jit
def backsub(Wb, V, bp, dc):
    Vinv = jnp.linalg.inv(V + 1e-4 * jnp.eye(3)[None])
    dp = jnp.einsum("mij,mj->mi", Vinv, bp - jnp.einsum("kmij,ki->mj", Wb, dc))
    return dp


dc = solve(S, bred).reshape(K, 6)
timeit("point back-substitution", backsub, Wb, V, bp, dc)


@jax.jit
def pose_update(kf_R, kf_t, dc):
    return factors.apply_pose_update(kf_R, kf_t, dc)


timeit("pose update (exp)", pose_update, prob.kf_R, prob.kf_t, dc)
