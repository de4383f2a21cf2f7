"""Calibrate MXU throughput vs matmul shape on the axon TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

f32 = jnp.float32
REPS = 30
rng = np.random.default_rng(0)


def t(name, fn, *args, flops=0):
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
    tf = flops / (ms * 1e-3) / 1e12 if flops else 0
    print(f"{name:50s} {ms:8.3f} ms  {tf:7.2f} TF/s", flush=True)


for (m, k, n) in [(2048, 2048, 2048), (144, 12288, 144),
                  (256, 12288, 256), (1024, 12288, 1024),
                  (144, 1536, 144), (512, 512, 512)]:
    A = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    B = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
    t(f"f32 ({m},{k})@({k},{n})", lambda A, B: A @ B, A, B,
      flops=2 * m * k * n)

A = jnp.asarray(rng.normal(size=(144, 12288)).astype(np.float32))
t("f32->bf16 cast matmul (144,12288)^2",
  lambda A: (A.astype(jnp.bfloat16) @ A.astype(jnp.bfloat16).T
             ).astype(f32), A, flops=2 * 144 * 12288 * 144)

# batched: (24, 6, 12288) @ (24, 12288, 6)
A = jnp.asarray(rng.normal(size=(24, 6, 12288)).astype(np.float32))
t("batched (24,6,12288)@(24,12288,6)",
  lambda A: jnp.einsum("kim,kjm->kij", A, A), A,
  flops=2 * 24 * 6 * 6 * 12288)

# same contraction but fat output to confirm MXU utilization scaling
A = jnp.asarray(rng.normal(size=(1536, 12288)).astype(np.float32))
t("f32 (1536,12288)@(12288,1536)", lambda A: A @ A.T, A,
  flops=2 * 1536 * 12288 * 1536)
