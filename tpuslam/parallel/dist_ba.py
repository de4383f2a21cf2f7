"""Distributed bundle adjustment + data-parallel front-end over a device mesh.

The reference has NO distributed execution (SURVEY.md section 2.4/5.8:
four pthreads + mutex queues). This module supplies the TPU-native
scale-out path the new framework is designed around:

- **Landmark-sharded BA**: the BAProblem's landmark dimension M is
  sharded over a mesh axis. Each device assembles the Hessian
  contributions of its landmark block; the reduced camera system
  (pose-block Hessian U, Schur matrix S, reduced gradient) is summed
  with `psum` over ICI and solved replicated; landmark back-substitution
  (V^-1, point updates) is purely shard-local. This is the classic
  distributed Schur layout (SURVEY.md section 5.7: "landmark Schur per
  shard, psum-reduced camera system").
- **Data-parallel feature extraction**: frames are independent, so the
  ORB front-end batches over a frame axis sharded across devices —
  the batched-frame data parallelism of SURVEY.md section 2.4.

Implementation: `solver.local_ba.optimize(axis_name=...)` already
expresses the partial-sum + psum algebra; this module wraps it in
`jax.shard_map` with the right PartitionSpecs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuslam.frontend import extractor
from tpuslam.solver import local_ba
from tpuslam.solver.local_ba import BAProblem, BAResult

AXIS = "mp"


def problem_specs(axis=AXIS, has_stereo: bool = False,
                  has_rcam: bool = False) -> BAProblem:
    """PartitionSpecs: landmark-indexed arrays sharded, pose arrays
    replicated. `axis` may be a tuple of mesh axes — the landmark
    dimension then shards over their product (the 2-host layout:
    ("dcn", "mp") splits landmarks across hosts over DCN and across
    each host's chips over ICI; the psum-reduced camera system rides
    the hierarchical all-reduce XLA emits for multi-axis psum).
    `has_stereo` adds the (K,M) right-image observation plane, sharded
    along the landmark axis like every other observation grid."""
    return BAProblem(
        kf_R=P(), kf_t=P(), kf_fixed=P(),
        points=P(axis), pt_valid=P(axis),
        obs_uv=P(None, axis), obs_mask=P(None, axis),
        obs_inv_sigma2=P(None, axis),
        obs_ur=P(None, axis) if has_stereo else None,
        obs_uvr=P(None, axis, None) if has_rcam else None,
    )


def result_specs(axis=AXIS) -> BAResult:
    return BAResult(
        kf_R=P(), kf_t=P(), points=P(axis),
        chi2=P(None, axis), inlier=P(None, axis), total_chi2=P(),
    )


def distributed_optimize(
    prob: BAProblem,
    cam_params,
    mesh: Mesh,
    axis=AXIS,
    model: str = "pinhole",
    iters: int = 10,
    **kw,
) -> BAResult:
    """Landmark-sharded BA over `mesh[axis]` (axis may be a tuple for
    multi-axis / multi-host sharding). The axis sizes must divide M."""

    def _opt(p, cam):
        return local_ba.optimize(p, cam, model=model, iters=iters,
                                 axis_name=axis, **kw)

    f = jax.shard_map(
        _opt,
        mesh=mesh,
        in_specs=(problem_specs(axis, has_stereo=prob.obs_ur is not None,
                                has_rcam=prob.obs_uvr is not None),
                  P()),
        out_specs=result_specs(axis),
        check_vma=False,
    )
    return f(prob, jnp.asarray(cam_params))


def vi_window_specs(win, axis=AXIS):
    """PartitionSpecs for a solver.vi_ba.VIWindow: landmark-indexed
    arrays sharded over `axis`, keyframe states + the preintegration
    chain replicated (the inertial factors touch every device
    identically; only the visual planes scale with M)."""
    from tpuslam.solver.vi_ba import VIWindow

    preint_spec = jax.tree_util.tree_map(lambda _: P(), win.preint)
    return VIWindow(
        Rwb=P(), pwb=P(), vel=P(), bg=P(), ba=P(), fixed=P(),
        points=P(axis), pt_valid=P(axis),
        obs_uv=P(None, axis), obs_mask=P(None, axis),
        obs_inv_sigma2=P(None, axis),
        preint=preint_spec, edge_valid=P(),
        Rcb=P(), tcb=P(),
        obs_ur=P(None, axis) if win.obs_ur is not None else None,
        obs_uvr=(P(None, axis, None) if win.obs_uvr is not None
                 else None),
    )


def distributed_optimize_vi(
    win,
    cam_params,
    gravity,
    walk_info,
    mesh: Mesh,
    axis=AXIS,
    model: str = "pinhole",
    iters: int = 8,
    **kw,
):
    """Landmark-sharded visual-inertial BA over `mesh[axis]` — the
    distributed FullInertialBA/LocalInertialBA engine (SURVEY.md
    section 5.7: the all-keyframe inertial problems are the true
    long-context workloads; ref /root/reference/src/Optimizer.cc:420).
    The axis sizes must divide the window's landmark capacity M."""
    from tpuslam.solver import vi_ba
    from tpuslam.solver.vi_ba import VIResult

    def _opt(w, cam, g, wi):
        return vi_ba.optimize_vi(w, cam, g, wi, model=model,
                                 iters=iters, axis_name=axis, **kw)

    out_specs = VIResult(
        Rwb=P(), pwb=P(), vel=P(), bg=P(), ba=P(),
        points=P(axis), chi2=P(None, axis), inlier=P(None, axis),
        total_chi2=P(),
    )
    f = jax.shard_map(
        _opt,
        mesh=mesh,
        in_specs=(vi_window_specs(win, axis), P(), P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    return f(win, jnp.asarray(cam_params), jnp.asarray(gravity),
             jnp.asarray(walk_info))


def make_batched_extractor(mesh: Mesh, orb_cfg, axis: str = AXIS):
    """jit-compiled frame-sharded batch ORB extraction: (B,H,W) -> batched
    FrameFeatures, B sharded over `mesh[axis]`."""

    @functools.partial(
        jax.jit,
        in_shardings=NamedSharding(mesh, P(axis, None, None)),
    )
    def run(imgs):
        return jax.vmap(lambda im: extractor.extract(im, orb_cfg))(imgs)

    return run
