"""HBM bandwidth + U/S formulation variants at the free-first sizes."""
import time

import jax
import jax.numpy as jnp
import numpy as np

f32 = jnp.float32
REPS = 30
rng = np.random.default_rng(0)
K, F, M = 24, 16, 4096
RM = 2 * M


def t(name, fn, *args, gb=0.0, flops=0):
    @jax.jit
    def run(args):
        def body(c, eps):
            out = fn(args[0] + eps, *args[1:])
            return c + jnp.sum(out).astype(f32), 0.0
        c, _ = jax.lax.scan(body, f32(0),
                            1e-6 * jnp.arange(REPS, dtype=f32))
        return c

    float(run(args))
    t0 = time.perf_counter()
    float(run(args))
    ms = (time.perf_counter() - t0) / REPS * 1e3
    extra = ""
    if gb:
        extra = f"{gb / (ms * 1e-3):7.1f} GB/s"
    if flops:
        extra += f"{flops / (ms * 1e-3) / 1e12:7.2f} TF/s"
    print(f"{name:48s} {ms:8.3f} ms {extra}", flush=True)


# HBM bandwidth: copy 64 MB
A = jnp.asarray(rng.normal(size=(16, 1024, 1024)).astype(np.float32))
t("copy 64MB (x+1)", lambda A: A + 1.0, A, gb=2 * A.nbytes / 1e9)
t("reduce 64MB sum(-1)", lambda A: A.sum(-1), A, gb=A.nbytes / 1e9)

J6 = jnp.asarray(rng.normal(size=(F, 6, RM)).astype(np.float32))
w = jnp.asarray(rng.normal(size=(F, RM)).astype(np.float32))

t("U batched einsum kim,kjm->kij (F=16)",
  lambda J6, w: jnp.einsum("kim,kjm->kij", J6 * w[:, None], J6), J6, w,
  flops=2 * F * 36 * RM)
t("U elementwise+sum (F,6,6,RM)",
  lambda J6, w: ((J6 * w[:, None])[:, :, None, :]
                 * J6[:, None, :, :]).sum(-1), J6, w,
  gb=F * 36 * RM * 4 / 1e9)

Wb = jnp.asarray(rng.normal(size=(F, 6, 3, M)).astype(np.float32))
Vinv = jnp.asarray(rng.normal(size=(3, 3, M)).astype(np.float32))


def s_matmul(Wb, Vinv):
    WVinv = sum(Wb[:, :, j, None, :] * Vinv[j][None, None] for j in range(3))
    A = WVinv.reshape(F * 6, 3 * M)
    B = Wb.reshape(F * 6, 3 * M)
    return A @ B.T


t("S f32 (96,12288)@(12288,96)", s_matmul, Wb, Vinv,
  flops=2 * 96 * 96 * 3 * M)


def s_bf16(Wb, Vinv):
    WVinv = sum(Wb[:, :, j, None, :] * Vinv[j][None, None] for j in range(3))
    A = WVinv.reshape(F * 6, 3 * M).astype(jnp.bfloat16)
    B = Wb.reshape(F * 6, 3 * M).astype(jnp.bfloat16)
    return (A @ B.T).astype(f32)


t("S bf16 cast", s_bf16, Wb, Vinv, flops=2 * 96 * 96 * 3 * M)


def s_f32_prec(Wb, Vinv):
    WVinv = sum(Wb[:, :, j, None, :] * Vinv[j][None, None] for j in range(3))
    A = WVinv.reshape(F * 6, 3 * M)
    B = Wb.reshape(F * 6, 3 * M)
    return jnp.matmul(A, B.T, precision=jax.lax.Precision.HIGHEST)


t("S f32 HIGHEST", s_f32_prec, Wb, Vinv, flops=2 * 96 * 96 * 3 * M * 6)

# Elementwise S: (96,96) out via (96,96,3M) product -> 113 GB materialized
# -> skip. Instead: does splitting the contraction help? (96, 3M) in
# chunks with accumulate
def s_chunked(Wb, Vinv):
    WVinv = sum(Wb[:, :, j, None, :] * Vinv[j][None, None] for j in range(3))
    A = WVinv.reshape(F * 6, 3, M)
    B = Wb.reshape(F * 6, 3, M)
    return jax.lax.dot_general(A, B, (((1, 2), (1, 2)), ((), ())))


t("S dot_general 2-contract", s_chunked, Wb, Vinv,
  flops=2 * 96 * 96 * 3 * M)

# Cholesky cost at 96 vs 144
for n in (96, 144):
    S = jnp.asarray(np.eye(n, dtype=np.float32) * 10.0
                    + rng.normal(size=(n, n)).astype(np.float32) * 0.01)
    S = S @ S.T
    b = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    t(f"cho_factor+solve n={n}",
      lambda S, b: jax.scipy.linalg.cho_solve(
          jax.scipy.linalg.cho_factor(S, lower=True), b), S, b)
    t(f"linalg.solve n={n}", lambda S, b: jnp.linalg.solve(S, b), S, b)
