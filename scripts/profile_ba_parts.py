"""Bisect the cost of one LM iteration of the rewritten local BA."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.solver import local_ba
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
mask = rng.uniform(size=(K, M)) < 0.10

prob = local_ba.BAProblem(
    kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(kf_t),
    kf_fixed=jnp.asarray(np.arange(K) >= 16),
    points=jnp.asarray(pts), pt_valid=jnp.ones((M,), bool),
    obs_uv=jnp.asarray(uv), obs_mask=jnp.asarray(mask),
    obs_inv_sigma2=jnp.ones((K, M), jnp.float32),
)
REPS = 30
dtype = jnp.float32
maskf = (np.asarray(prob.obs_mask) & np.ones(M, bool)).astype(np.float32)
maskf = jnp.asarray(maskf)
obs_u = prob.obs_uv[..., 0]
obs_v = prob.obs_uv[..., 1]


def stage(points, upto):
    kf_R, kf_t = prob.kf_R, prob.kf_t
    u, v, ur, _uvr, rows, Xc = local_ba._proj_rows(
        kf_R, kf_t, points, cam, "pinhole", 0.0, False)
    ru, rv = u - obs_u, v - obs_v
    chi2 = (ru * ru + rv * rv) * prob.obs_inv_sigma2
    if upto == "proj":
        return (ru,)
    from tpuslam.solver import factors
    w = prob.obs_inv_sigma2 * maskf * factors.huber_weight(chi2, 5.991)
    J6_rows, J3_rows = [], []
    for row in rows:
        j6, j3 = local_ba._row_jacobian_planes(row, Xc, kf_R)
        J6_rows.append(j6)
        J3_rows.append(j3)
    n_rows = 2
    J6 = jnp.stack([jnp.concatenate([J6_rows[r][i] for r in range(n_rows)],
                                    -1) for i in range(6)], 1)
    J3 = jnp.stack([jnp.concatenate([J3_rows[r][i] for r in range(n_rows)],
                                    -1) for i in range(3)], 1)
    wlanes = jnp.concatenate([w, w], -1)
    rlanes = jnp.concatenate([ru, rv], -1)
    if upto == "jac":
        return (J6[..., 0],)
    J6w = J6 * wlanes[:, None, :]
    U = jnp.einsum("kim,kjm->kij", J6w, J6)
    bc = -jnp.einsum("kim,km->ki", J6w, rlanes)
    J3w = J3 * wlanes[:, None, :]
    V = sum(jnp.einsum("kim,kjm->ijm", J3w[..., r * M:(r + 1) * M],
                       J3[..., r * M:(r + 1) * M]) for r in range(n_rows))
    bp = -sum(jnp.einsum("kim,km->im", J3w[..., r * M:(r + 1) * M],
                         rlanes[..., r * M:(r + 1) * M])
              for r in range(n_rows))
    Wb = sum(J6w[:, :, None, r * M:(r + 1) * M]
             * J3[:, None, :, r * M:(r + 1) * M] for r in range(n_rows))
    if upto == "blocks":
        return (U[..., 0] + V[0, 0, :1] + Wb[0, 0, 0, :1] + bp[0, :1]
                + bc[:, :1],)
    V = V + 1e-4 * jnp.eye(3, dtype=dtype)[:, :, None]
    Vinv = local_ba._inv3x3_planes(V)
    WVinv = sum(Wb[:, :, j, None, :] * Vinv[j][None, None]
                for j in range(3))
    A = WVinv.reshape(K * 6, 3 * M)
    B = Wb.reshape(K * 6, 3 * M)
    S = -(A @ B.T)
    S = S.reshape(K, 6, K, 6)
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(
        U + 1e-4 * jnp.eye(6, dtype=dtype)[None])
    S = S.reshape(6 * K, 6 * K)
    bred = (bc - jnp.einsum("kilm,lm->ki", WVinv, bp)).reshape(-1)
    if upto == "schur":
        return (S[:, :1] + bred[:1],)
    free = (~prob.kf_fixed).astype(dtype)
    fmask = jnp.repeat(free, 6)
    S = S * fmask[:, None] * fmask[None, :] + jnp.diag(1.0 - fmask)
    bred = bred * fmask
    L, low = jax.scipy.linalg.cho_factor(S + 1e-8 * jnp.eye(6 * K), lower=True)
    dc = jax.scipy.linalg.cho_solve((L, low), bred).reshape(K, 6)
    if upto == "chol":
        return (dc[..., :1],)
    tmp = bp - jnp.einsum("kijm,ki->jm", Wb, dc)
    dp = jnp.einsum("jlm,lm->jm", Vinv, tmp)
    return (dp[0][:, None] + dc[0, 0],)


def scan_time(name, body):
    xs = jnp.stack([prob.points + 1e-5 * i for i in range(REPS)])

    @jax.jit
    def run(xs):
        def f(c, x):
            out = body(x)
            return c + jnp.sum(out[0][..., 0]).astype(jnp.float32), 0.0
        c, _ = jax.lax.scan(f, jnp.float32(0), xs)
        return c

    float(run(xs))
    t0 = time.perf_counter()
    float(run(xs))
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:45s} {ms:8.3f} ms", flush=True)
    return ms


for upto in ["proj", "jac", "blocks", "schur", "chol", "all"]:
    scan_time(f"upto {upto}", lambda p, u=upto: stage(p, u))
