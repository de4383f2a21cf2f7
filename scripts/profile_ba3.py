"""Time the rewritten local_ba.optimize on the real TPU (scan-amortized)."""
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
# realistic sparsity: ~10% of grid entries observed
mask = rng.uniform(size=(K, M)) < 0.10

prob = local_ba.BAProblem(
    kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(kf_t),
    kf_fixed=jnp.asarray(np.arange(K) >= 16),
    points=jnp.asarray(pts), pt_valid=jnp.ones((M,), bool),
    obs_uv=jnp.asarray(uv), obs_mask=jnp.asarray(mask),
    obs_inv_sigma2=jnp.ones((K, M), jnp.float32),
)
REPS = 30


def scan_time(name, body):
    xs = jnp.stack([prob.points + 1e-5 * i for i in range(REPS)])

    @jax.jit
    def run(xs):
        def f(c, x):
            out = body(x)
            return c + jnp.sum(
                jax.tree_util.tree_leaves(out)[0][..., 0]
            ).astype(jnp.float32), 0.0
        c, _ = jax.lax.scan(f, jnp.float32(0), xs)
        return c

    float(run(xs))
    t0 = time.perf_counter()
    float(run(xs))
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:45s} {ms:8.3f} ms", flush=True)
    return ms


scan_time("noop (scan-step overhead)",
          lambda p: (p[:, :1] * 2.0,))
scan_time("optimize iters=1",
          lambda p: local_ba.optimize(prob._replace(points=p), cam,
                                      iters=1).points[..., None])
scan_time("optimize iters=10",
          lambda p: local_ba.optimize(prob._replace(points=p), cam,
                                      iters=10).points[..., None])
ur = jnp.asarray(uv[..., 0] - 40.0 / np.maximum(Xc0[..., 2], 1e-6))
scan_time("optimize stereo iters=10",
          lambda p: local_ba.optimize(
              prob._replace(points=p, obs_ur=ur), cam, iters=10,
              bf=40.0).points[..., None])
scan_time("optimize kb8 iters=10",
          lambda p: local_ba.optimize(
              prob._replace(points=p),
              jnp.asarray([458.0, 458.0, 376.0, 240.0, 0.01, -0.01,
                           0.005, -0.002], jnp.float32),
              model="kb8", iters=10).points[..., None])
