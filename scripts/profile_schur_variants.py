"""Micro-time isolated pieces/formulations of the Schur reduction."""
import time

import jax
import jax.numpy as jnp
import numpy as np

K, M = 24, 4096
rng = np.random.default_rng(0)
f32 = jnp.float32

Wb = jnp.asarray(rng.normal(size=(K, 6, 3, M)).astype(np.float32))
Vinv = jnp.asarray(rng.normal(size=(3, 3, M)).astype(np.float32))
J6 = jnp.asarray(rng.normal(size=(K, 6, 2 * M)).astype(np.float32))
J3 = jnp.asarray(rng.normal(size=(K, 3, 2 * M)).astype(np.float32))
w = jnp.asarray(rng.normal(size=(K, 2 * M)).astype(np.float32))
REPS = 50


def t(name, fn, *args):
    """Scan-amortized timing: REPS invocations inside ONE jitted scan,
    perturbing the first arg so XLA cannot hoist the body."""
    @jax.jit
    def run(args):
        def body(c, eps):
            out = fn(args[0] + eps, *args[1:])
            return c + jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1]
                               ).astype(f32), 0.0
        c, _ = jax.lax.scan(body, f32(0),
                            1e-6 * jnp.arange(REPS, dtype=f32))
        return c

    float(run(args))
    t0 = time.perf_counter()
    float(run(args))
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:50s} {ms:8.3f} ms", flush=True)


# 1. Wb construction (broadcast product, 2 rows)
t("Wb = sum_r J6w x J3 (K,6,3,M)",
  lambda J6, J3, w: sum((J6 * w[:, None])[:, :, None, r * M:(r + 1) * M]
                        * J3[:, None, :, r * M:(r + 1) * M]
                        for r in range(2)), J6, J3, w)

# 2. WVinv
t("WVinv = sum_j Wb*Vinv (K,6,3,M)",
  lambda Wb, Vinv: sum(Wb[:, :, j, None, :] * Vinv[j][None, None]
                       for j in range(3)), Wb, Vinv)

# 3. reshape + matmul
def s_matmul(Wb, Vinv):
    WVinv = sum(Wb[:, :, j, None, :] * Vinv[j][None, None] for j in range(3))
    A = WVinv.reshape(K * 6, 3 * M)
    B = Wb.reshape(K * 6, 3 * M)
    return A @ B.T
t("S via reshape+matmul", s_matmul, Wb, Vinv)

# 4. S via einsum (no reshape)
def s_einsum(Wb, Vinv):
    WVinv = jnp.einsum("kijm,jlm->kilm", Wb, Vinv)
    return jnp.einsum("kilm,qjlm->kiqj", WVinv, Wb)
t("S via einsum kilm,qjlm->kiqj", s_einsum, Wb, Vinv)

# 5. S via M-last-to-M-first relayout then matmul over (M3) folded first
def s_mfirst(Wb, Vinv):
    Wt = jnp.moveaxis(Wb.reshape(K * 6, 3, M), 0, 2)   # (3, M, K6)? no
    return Wt
# skip

# 6. U einsum (batched matmul)
t("U = kim,kjm->kij", lambda J6, w: jnp.einsum(
    "kim,kjm->kij", J6 * w[:, None], J6), J6, w)

# 7. V blocks
t("V = sum_r kim,kjm->ijm", lambda J3, w: sum(jnp.einsum(
    "kim,kjm->ijm", (J3 * w[:, None])[..., r * M:(r + 1) * M],
    J3[..., r * M:(r + 1) * M]) for r in range(2)), J3, w)

# 8. 2.4x bigger matmul as MXU sanity: (144, 12288) @ (12288, 144)
A = jnp.asarray(rng.normal(size=(144, 3 * M)).astype(np.float32))
t("plain (144,12288)@(12288,144)", lambda A: A @ A.T, A)

# 9. S via dot_general with 2 contracting dims, no pre-reshape
def s_dg(Wb, Vinv):
    WVinv = sum(Wb[:, :, j, None, :] * Vinv[j][None, None] for j in range(3))
    return jax.lax.dot_general(
        WVinv, Wb, (((2, 3), (2, 3)), ((), ())))  # (K,6,K,6)
t("S via dot_general contract (l,m)", s_dg, Wb, Vinv)

# 10. fold 3 into M by transpose first: (K,6,M,3) -> (K,6,M*3)
def s_m3(Wb, Vinv):
    WVinv = sum(Wb[:, :, j, None, :] * Vinv[j][None, None] for j in range(3))
    A = jnp.moveaxis(WVinv, 2, 3).reshape(K * 6, M * 3)
    B = jnp.moveaxis(Wb, 2, 3).reshape(K * 6, M * 3)
    return A @ B.T
t("S via (K,6,M,3) fold", s_m3, Wb, Vinv)
