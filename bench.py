"""Benchmark: amortized monocular SLAM throughput on the TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference's real-time budget is the dataset rate — EuRoC 20 fps,
50 ms/frame on a desktop CPU (/root/reference/Examples/Monocular/
mono_euroc.cc:124-132, BASELINE.md). vs_baseline = achieved fps / 20,
so 5.0 == the BASELINE.json north-star of 5x real time on one chip.

Headline metric: AMORTIZED frames/s of the full pipeline — the fused
per-frame tracking step plus the keyframe superstep (triangulation,
fuse, local BA, hygiene, culling) amortized at the measured keyframe
cadence. All timings are DEVICE time: the per-frame step runs as one
jitted lax.scan over pre-staged frames; superstep kernels are timed
with varied inputs + scalar fetch, with the measured per-dispatch
tunnel overhead subtracted (this container reaches the chip through a
stdio tunnel with ~30 ms/dispatch that no co-located production host
pays; `detail.dispatch_overhead_ms` records what was subtracted).

Also reported (BASELINE.md requirements): local-BA ms per keyframe,
matching-kernel roofline utilization, compile time.
"""

from __future__ import annotations

import argparse
import json
import time


def _build_map(world, poses, cfg, n_kf, n_feat, n_mp):
    """Synthetic but realistically-shaped MapState: keyframes on the
    orbit observing projected world points (shapes and sparsity match a
    live map; only timing uses this)."""
    import jax.numpy as jnp
    import numpy as np

    from tpuslam.datasets import synthetic
    from tpuslam.mapping import mapstate

    rng = np.random.default_rng(0)
    ms = mapstate.empty(cfg.map.max_keyframes, cfg.map.max_points, n_feat)
    P = min(n_mp, world.points.shape[0])
    mp_pos = np.zeros((cfg.map.max_points, 3), np.float32)
    mp_pos[:P] = world.points[:P]
    desc = rng.integers(0, 2**32, size=(cfg.map.max_points, 8),
                        dtype=np.uint64).astype(np.uint32)
    ms = ms._replace(
        mp_pos=jnp.asarray(mp_pos),
        mp_valid=jnp.asarray(np.arange(cfg.map.max_points) < P),
        mp_desc=jnp.asarray(desc),
        mp_dist_max=jnp.full((cfg.map.max_points,), 12.0, jnp.float32),
        mp_dist_min=jnp.full((cfg.map.max_points,), 2.0, jnp.float32),
    )
    step = max(1, len(poses) // n_kf)
    for k in range(n_kf):
        R, t = poses[(k * step) % len(poses)]
        uv, z, ok = synthetic.project(world, R, t)
        ok = ok[:P] if P <= ok.shape[0] else ok
        kp = np.zeros((n_feat, 2), np.float32)
        lvl = np.zeros((n_feat,), np.int32)
        obs = np.full((n_feat,), -1, np.int32)
        idx = np.nonzero(ok)[0][:n_feat]
        kp[: len(idx)] = uv[idx] + rng.normal(0, 0.5, (len(idx), 2))
        obs[: len(idx)] = idx
        valid = np.arange(n_feat) < len(idx)
        ms = ms._replace(
            kf_R=ms.kf_R.at[k].set(jnp.asarray(R.astype(np.float32))),
            kf_t=ms.kf_t.at[k].set(jnp.asarray(t.astype(np.float32))),
            kf_valid=ms.kf_valid.at[k].set(True),
            kf_uv=ms.kf_uv.at[k].set(jnp.asarray(kp)),
            kf_level=ms.kf_level.at[k].set(jnp.asarray(lvl)),
            kf_desc=ms.kf_desc.at[k].set(ms.mp_desc[jnp.asarray(
                np.where(obs >= 0, obs, 0))]),
            kf_kp_valid=ms.kf_kp_valid.at[k].set(jnp.asarray(valid)),
            kf_obs_mp=ms.kf_obs_mp.at[k].set(jnp.asarray(obs)),
        )
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=16,
                   help="distinct staged frames (cycled)")
    p.add_argument("--reps", type=int, default=4, help="timed scan passes")
    p.add_argument("--features", type=int, default=1024)
    p.add_argument("--kf-every", type=float, default=3.2,
                   help="frames per keyframe (measured cadence of the "
                        "ratio-gated policy on synthetic orbit runs)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--e2e-frames", type=int, default=600,
                   help="frames of the end-to-end ring-circuit loop "
                        "(2.25pi arc; >=64 warmup + the rest timed, "
                        "with a loop closure inside the timed window; "
                        "0 disables)")
    args = p.parse_args()

    import os
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache: the second bench run (and any
    # production restart) skips the ~100 s of XLA compiles.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from tpuslam.config import CameraConfig, ORBConfig, SLAMConfig
    from tpuslam.datasets import synthetic
    from tpuslam.tracking import step as trackstep

    t_bench0 = time.perf_counter()
    h, w = 480, 752  # EuRoC frame size
    world = synthetic.make_world(n_points=6000, h=h, w=w, fx=458.0, seed=0,
                                 extent=(16.0, 16.0, 8.0))
    cfg = SLAMConfig(
        camera=CameraConfig(width=w, height=h, fx=458.0, fy=458.0,
                            cx=w / 2.0, cy=h / 2.0),
        orb=ORBConfig(n_features=args.features),
    )

    # ---- per-dispatch overhead (tunnel round-trip on a no-op) ----
    probes = [jnp.full((8,), float(i)) for i in range(11)]
    jax.block_until_ready(probes)
    float(jnp.sum(probes[0]))  # warm the tiny-sum executable
    t0 = time.perf_counter()
    for pr in probes[1:]:
        float(jnp.sum(pr))
    dispatch_ms = 1e3 * (time.perf_counter() - t0) / 10

    def scan_timed(body_fn, variants, min_total_ms=300.0):
        """Honest device ms/call: lax.scan over pre-staged input
        variants inside ONE jitted program; the final scalar fetch is
        the only host round trip (the tunnel's block_until_ready can
        return early on queued work — a reduced scalar cannot).

        The variant list is TILED until one scan is expected to run
        >= min_total_ms, so the single ~30 ms dispatch subtraction can
        never floor a sub-dispatch kernel to 0 (the r02 roofline bug:
        0.0 ms Hamming -> "10900x roofline")."""
        def run_once(n_tile):
            stacked = jnp.stack(variants * n_tile)

            @jax.jit
            def run(stacked):
                def body(c, x):
                    out = body_fn(x)
                    leaf = jax.tree_util.tree_leaves(out)[0]
                    return c + jnp.sum(leaf).astype(jnp.float32), 0.0
                c, _ = jax.lax.scan(body, jnp.float32(0.0), stacked)
                return c
            float(run(stacked))  # compile + warm
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                float(run(stacked))
                best = min(best, 1e3 * (time.perf_counter() - t0))
            return best, len(variants) * n_tile

        total_ms, n = run_once(1)
        if total_ms < min_total_ms:
            tile = max(2, int(min_total_ms / max(total_ms, 1e-3)) + 1)
            total_ms, n = run_once(tile)
        return max(total_ms - dispatch_ms, total_ms * 0.5) / n

    # ---- 1) fused tracking step over staged frames (in-jit scan) ----
    poses = synthetic.orbit_trajectory(args.frames, radius=12.0)
    imgs = jnp.asarray(np.stack(
        [synthetic.render(world, R, t) for R, t in poses]), jnp.float32)
    step = trackstep.make_tracking_step(cfg)
    ex = trackstep.example_args(cfg, n_map_points=2048)
    _, R0, t0p, mp_ids, mp_pos, mp_desc, mp_level, mp_ok = ex

    @jax.jit
    def scan_frames(imgs, R0, t0p):
        def body(carry, img):
            R, t = carry
            out = step(img, R, t, mp_ids, mp_pos, mp_desc, mp_level, mp_ok)
            return (out.R, out.t), out.n_inliers
        (_, _), ninl = jax.lax.scan(body, (R0, t0p), imgs)
        return ninl

    t0c = time.perf_counter()
    jax.block_until_ready(scan_frames(imgs, R0, t0p))
    compile_track_s = time.perf_counter() - t0c
    times = []
    for _ in range(args.reps):
        t0t = time.perf_counter()
        jax.block_until_ready(scan_frames(imgs, R0, t0p))
        times.append(time.perf_counter() - t0t)
    track_ms = 1e3 * min(times) / args.frames
    step_fps = 1e3 / track_ms

    # ---- 2) keyframe-superstep kernels on a realistic map ----
    from tpuslam.mapping import mapstate
    from tpuslam.tracking import tracker as trk

    n_feat = args.features
    W = cfg.map.local_window + cfg.map.local_fixed
    ms_map = _build_map(world, poses, cfg, n_kf=W + 2, n_feat=n_feat,
                        n_mp=6000)
    sf = np.asarray(jnp.asarray(
        [cfg.orb.scale_factor ** i for i in range(cfg.orb.n_levels)]))
    scale_lut = jnp.asarray(sf, jnp.float32)
    sigma2_lut = scale_lut * scale_lut
    inv_sigma2 = 1.0 / sigma2_lut
    cam_params = jnp.asarray(cfg.camera.params, jnp.float32)
    img_wh = jnp.asarray([w, h], jnp.float32)
    kf_ids = jnp.asarray(np.arange(W, dtype=np.int32))
    fixed = jnp.asarray(np.arange(W) >= cfg.map.local_window)

    t0c = time.perf_counter()
    # Landmark-axis bucket, exactly as MonoTracker._window picks it.
    occupancy = int(mapstate.count_window_points(ms_map, kf_ids))
    cap = 512
    while cap < min(occupancy, cfg.map.ba_point_cap):
        cap *= 2
    cap = min(cap, cfg.map.ba_point_cap)
    mp_ids_w, local = mapstate.local_point_ids(ms_map, kf_ids, cap=cap)
    kf_t_vars = [ms_map.kf_t + 1e-4 * i for i in range(1, 4)]
    jax.block_until_ready(kf_t_vars)

    ba_ms = scan_timed(
        lambda kt: trk._run_local_ba(
            ms_map._replace(kf_t=kt), kf_ids, fixed, mp_ids_w, local,
            inv_sigma2, cam_params, iters=cfg.solver.ba_warm_iters,
            n_free=cfg.map.local_window,
            trust_region=cfg.solver.ba_warm_trust_region),
        kf_t_vars)

    tri_ms = scan_timed(
        lambda kt: trk._triangulate_between(
            ms_map._replace(kf_t=kt), jnp.int32(W - 2), jnp.int32(W - 1),
            jnp.int32(6000), cam_params, sigma2_lut,
            ms_map.mp_pos[:cfg.map.ba_point_cap],
            ms_map.mp_valid[:cfg.map.ba_point_cap],
            focal=float(cfg.camera.fx))[0].mp_pos,
        kf_t_vars)

    fuse_ms = scan_timed(
        lambda kt: trk._fuse_into_kf(
            ms_map._replace(kf_t=kt), jnp.int32(W - 1), mp_ids_w,
            cam_params, scale_lut, inv_sigma2, img_wh).kf_obs_mp,
        kf_t_vars)

    hyg_ms = scan_timed(
        lambda kt: mapstate.refresh_point_hygiene(
            ms_map._replace(kf_t=kt), kf_ids, mp_ids_w, local,
            scale_lut).mp_normal,
        kf_t_vars)

    vis_vars = [ms_map.mp_visible + i for i in range(1, 4)]
    cull_ms = scan_timed(
        lambda mv: mapstate.cull_points(
            ms_map._replace(mp_visible=mv), cfg.map.cull_found_ratio,
            min_visible=8).mp_valid,
        vis_vars)
    compile_kf_s = max(
        time.perf_counter() - t0c
        - 6e-3 * (ba_ms + tri_ms + fuse_ms + hyg_ms + cull_ms), 0.0)

    # ---- 2b) loop-detection budget at FULL pool occupancy (512 KFs) ----
    # detect_loop's device work per keyframe: chunked scoring against
    # the pre-unpacked retrieval cache + the query's covisibility
    # weights (the dense covis matrix only runs behind the score
    # pre-gate). The db is staged in host numpy (bit unpack via
    # np.unpackbits) and uploaded once.
    from tpuslam.mapping import retrieval as retr
    Kmax = cfg.map.max_keyframes
    S = retr.DB_DESC
    rngl = np.random.default_rng(7)
    desc512 = rngl.integers(0, 2**32, (Kmax, S, 8),
                            dtype=np.uint64).astype(np.uint32)
    bits512 = np.unpackbits(
        desc512.view(np.uint8), axis=-1, bitorder="little"
    ).reshape(Kmax, S, 256).astype(np.float32)
    db512 = retr.RetrievalDB(
        kf_valid=jnp.ones((Kmax,), bool),
        bits=jnp.asarray(bits512, jnp.bfloat16),
        nbits=jnp.asarray(bits512.sum(-1), jnp.float32),
        valid=jnp.ones((Kmax, S), bool),
    )
    ms512 = mapstate.empty(Kmax, cfg.map.max_points, n_feat)
    obs512 = rngl.integers(0, 16384, (Kmax, n_feat)).astype(np.int32)
    ms512 = ms512._replace(
        kf_obs_mp=jnp.asarray(obs512),
        kf_valid=jnp.ones((Kmax,), bool),
        kf_kp_valid=jnp.ones((Kmax, n_feat), bool),
        mp_valid=jnp.asarray(np.arange(cfg.map.max_points) < 16384))
    q_desc = jnp.asarray(rngl.integers(
        0, 2**32, (n_feat, 8), dtype=np.uint64).astype(np.uint32))
    resp_q = jnp.asarray(rngl.uniform(21.0, 80.0, n_feat), jnp.float32)
    q_vars = [jnp.roll(q_desc, i, axis=0) for i in range(1, 4)]
    jax.block_until_ready(q_vars)
    score_ms = scan_timed(
        lambda q: retr.score_db(db512, q, jnp.ones((n_feat,), bool),
                                resp_q, match_th=25),
        q_vars)
    covw_ms = scan_timed(
        lambda s: mapstate.covisibility_weights(ms512, s),
        [jnp.int32(i) for i in range(3)])
    loop_detect_ms = score_ms + covw_ms

    kf_ms = ba_ms + 2 * tri_ms + fuse_ms + hyg_ms + cull_ms \
        + loop_detect_ms
    amort_ms = track_ms + kf_ms / args.kf_every
    amort_fps = 1e3 / amort_ms

    # ---- 3) kernel rooflines ----
    # Device ceilings measured IN THIS RUN (the tunnel-attached chip
    # delivers a fraction of v5e spec; an honest roofline compares
    # against what the device actually sustains, and reports both).
    # HBM bandwidth: stream an array FAR bigger than any cache
    # (256 MB; read+write per pass) inside one jitted scan — the r03
    # probe used 8 MB and measured latency, not bandwidth, which made
    # ba_roofline_frac_vs_device_bw come out at an impossible 2.96.
    bw_probe = jnp.ones((64 * 1024 * 1024,), jnp.float32)  # 256 MB

    @jax.jit
    def _bw(x):
        def body(c, _):
            return c * 1.000001 + 1e-9, 0.0
        c, _ = jax.lax.scan(body, x, None, length=64)
        return jnp.sum(c)
    jax.block_until_ready(bw_probe)
    float(_bw(bw_probe))
    best_bw = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(_bw(bw_probe))
        best_bw = min(best_bw, time.perf_counter() - t0)
    # 64 passes x (read+write) x 0.25 GB, with the single dispatch's
    # tunnel round trip subtracted (it dominated the r03 8 MB probe).
    best_bw = max(best_bw - dispatch_ms * 1e-3, best_bw * 0.2)
    copy_gbs = 64 * 2 * 0.25 / best_bw

    # MXU ceiling: LARGE bf16 matmul with f32 accumulation (the dtype
    # and shape every hot kernel here targets) — the r03 probe was one
    # 1024^3 f32 matmul (latency-bound, wrong dtype; 7.3 "sustained"
    # TFLOPs made matching look 5.5x above the device ceiling).
    MM = 4096
    mm_a = jnp.asarray(np.random.default_rng(2).normal(
        size=(MM, MM)).astype(np.float32)).astype(jnp.bfloat16)
    mm_b = jnp.asarray(np.random.default_rng(3).normal(
        size=(MM, MM)).astype(np.float32)).astype(jnp.bfloat16)

    def _mm(a):
        # Return the FULL product: scan_timed's body sums the output, so
        # no slice-based dead-code elimination can shrink the matmul
        # (the r03 probe returned out[:8,:8] and XLA computed only 8
        # rows — "sustained 7.3 TFLOPs" was 8/1024 of the work; the
        # first r04 probe returned a slice of a 4096^3 product and
        # measured an impossible 439 TFLOPs the same way).
        return jax.lax.dot_general(
            a, mm_b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    mm_ms = scan_timed(_mm, [mm_a + jnp.bfloat16(i) for i in range(3)])
    mm_tflops = 2 * MM ** 3 / (mm_ms * 1e-3) / 1e12

    # Matching kernel: bit-matmul Hamming (1024 query x 4096 db).
    from tpuslam.frontend import matching
    da = jnp.asarray(np.random.default_rng(0).integers(
        0, 2**32, size=(1024, 8), dtype=np.uint64).astype(np.uint32))
    db = jnp.asarray(np.random.default_rng(1).integers(
        0, 2**32, size=(4096, 8), dtype=np.uint64).astype(np.uint32))

    ham_vars = [jnp.roll(da, i, axis=0) for i in range(1, 21)]
    jax.block_until_ready(ham_vars)
    ham_ms = scan_timed(lambda a: matching.hamming_matrix(a, db), ham_vars)
    # one (1024,256)x(256,4096) MAC pass over unpacked bits
    ham_flops = 2.0 * 1024 * 4096 * 256
    ham_tflops = ham_flops / (ham_ms * 1e-3) / 1e12
    peak_tflops = 197.0 if not args.cpu else float("nan")  # v5e bf16 spec

    # Local-BA roofline: the LM iteration is HBM-bound. Ideal traffic
    # model (write+read once, unpadded f32): projection/residual planes
    # (~8 K*Mb), J3 (3 K*R*Mb), J6 (6 F*R*Mb), W/WVinv (2*18 F*Mb),
    # Schur matmul re-reads (12 F*Mb), V/bp/cost (~8 K*Mb).
    F = cfg.map.local_window
    R_rows = 2
    it = cfg.solver.ba_warm_iters
    ba_bytes = 4.0 * cap * it * (
        16 * W + 3 * W * R_rows + 6 * F * R_rows + 36 * F + 12 * F)
    ba_gbs = ba_bytes / (ba_ms * 1e-3) / 1e9
    ba_gflops = it * (6 * (6 * F) ** 2 * cap + 2 * F * 36 * R_rows * cap
                      + 150 * W * cap) / 1e9

    # ---- 4) END-TO-END wall-clock: the REAL tracker loop on device ----
    # Full MonoTracker.process over a ring-world closed circuit at
    # EuRoC frame size — the loop-closure integration fixture
    # (tests/test_loop_e2e.py) at bench scale: keyframe supersteps at
    # the live cadence, >=1 loop closure (Sim3 verify + essential-graph
    # correction + seam fuse) inside the timed window, and the
    # background GBA chunks it schedules. Wall time includes every
    # host sync. Reported latency: mean + p50/p95/max per-frame ms
    # (the reference's constraint is PER-FRAME latency at the 20 fps
    # dataset rate — 50 ms budget, Examples/Monocular/mono_euroc.cc:
    # 124-132).
    #
    # Sync accounting: a "sync" is one host-BLOCKING fetch event — a
    # jax.device_get call or a direct array coercion (np.asarray/int/
    # float/bool) OUTSIDE device_get. Leaf coercions INSIDE device_get
    # are part of the same event (the r04 counter double-counted
    # them). The time actually spent blocked is measured, and the
    # co-located estimate subtracts (blocked - 0.2 ms/event): the
    # pipelined tracker prefetches its one fetch per frame with
    # copy_to_host_async, so most "syncs" cost ~0.25 ms even through
    # the tunnel.
    e2e_wall_fps = None
    e2e_detail = {}
    if args.e2e_frames:
        from tpuslam.system import System

        n_e2e = args.e2e_frames
        world_ring = synthetic.make_world(
            n_points=1400, h=h, w=w, fx=458.0, seed=0,
            extent=(36.0, 36.0, 10.0))
        poses_e = synthetic.ring_trajectory(n_e2e, arc=2.25 * np.pi)
        frames_np = [synthetic.render(world_ring, R, t) for R, t in poses_e]
        sysm = System(cfg)
        # Pre-trace every bucket variant of the fused frame/superstep
        # programs (tracker.prewarm docstring): jaxpr tracing is
        # per-process and otherwise lands 2-8 s spikes inside frame
        # budgets; XLA binaries come from the persistent cache.
        t_pw = time.perf_counter()
        sysm.tracker.prewarm()
        prewarm_s = time.perf_counter() - t_pw

        import threading
        main_tid = threading.get_ident()
        counter = {"n": 0, "blocked": 0.0, "in_dg": False}
        orig_dg = jax.device_get

        def counting_dg(x):
            # Fetches issued by the tracker's fetch-pool workers block
            # a WORKER thread, not the frame loop — only main-thread
            # events are frame-path syncs (the retire wait on the
            # worker's future is measured separately by the tracker).
            if counter["in_dg"] or threading.get_ident() != main_tid:
                return orig_dg(x)
            counter["in_dg"] = True
            t0 = time.perf_counter()
            try:
                return orig_dg(x)
            finally:
                counter["in_dg"] = False
                counter["n"] += 1
                counter["blocked"] += time.perf_counter() - t0

        jax.device_get = counting_dg
        patched = []
        try:
            from jax._src.array import ArrayImpl
            for name in ("__array__", "__int__", "__float__", "__bool__",
                         "__index__"):
                if hasattr(ArrayImpl, name):
                    orig = getattr(ArrayImpl, name)

                    def wrap(orig):
                        def f(self, *a, **k):
                            if (counter["in_dg"]
                                    or threading.get_ident() != main_tid):
                                return orig(self, *a, **k)
                            t0 = time.perf_counter()
                            try:
                                return orig(self, *a, **k)
                            finally:
                                counter["n"] += 1
                                counter["blocked"] += \
                                    time.perf_counter() - t0
                        return f
                    setattr(ArrayImpl, name, wrap(orig))
                    patched.append((name, orig))
        except Exception:
            ArrayImpl = None
        per_ms = []
        try:
            warm = min(64, n_e2e // 4)
            for i in range(warm):
                sysm.track_monocular(frames_np[i], timestamp=i / 20.0)
            counter["n"] = 0
            counter["blocked"] = 0.0
            n_rw_warm = len(sysm.tracker.retire_wait_ms)
            t0e = time.perf_counter()
            for i in range(warm, n_e2e):
                t0f = time.perf_counter()
                sysm.track_monocular(frames_np[i], timestamp=i / 20.0)
                per_ms.append(1e3 * (time.perf_counter() - t0f))
            e2e_wall = time.perf_counter() - t0e
        finally:
            jax.device_get = orig_dg
            if patched:
                for name, orig in patched:
                    setattr(ArrayImpl, name, orig)
        rw = np.asarray(
            sysm.tracker.retire_wait_ms[n_rw_warm:], np.float64)
        sysm.shutdown()
        n_timed = n_e2e - warm
        pm = np.asarray(per_ms)
        e2e_ms = 1e3 * e2e_wall / n_timed
        # Main-thread blocking per frame = direct fetch/coercion events
        # + the retire wait on the fetch-worker's future. A "sync" is a
        # blocking event that actually waited (>1 ms).
        rw_ms = float(rw.sum()) / n_timed if rw.size else 0.0
        syncs = (counter["n"]
                 + int((rw > 1.0).sum())) / n_timed
        blocked_ms = 1e3 * counter["blocked"] / n_timed + rw_ms
        e2e_wall_fps = 1e3 / e2e_ms
        # Co-located estimate: keep everything but the tunnel's share
        # of the measured blocked time (a PCIe-attached host pays
        # ~0.2 ms per fetch event). A MODELED number, labeled as such.
        adj_ms = max(e2e_ms - max(blocked_ms - 0.2 * syncs, 0.0),
                     e2e_ms * 0.05)
        st = sysm.tracker.stats
        e2e_detail = {
            "e2e_wall_fps": round(e2e_wall_fps, 2),
            "e2e_wall_ms_per_frame": round(e2e_ms, 2),
            "e2e_p50_ms": round(float(np.percentile(pm, 50)), 2),
            "e2e_p95_ms": round(float(np.percentile(pm, 95)), 2),
            "e2e_max_ms": round(float(pm.max()), 2),
            "e2e_syncs_per_frame": round(syncs, 2),
            "e2e_blocked_ms_per_frame": round(blocked_ms, 2),
            "e2e_retire_wait_ms": round(rw_ms, 2),
            "e2e_prewarm_s": round(prewarm_s, 1),
            "e2e_frames": n_timed,
            "e2e_ok": sysm.tracking_state(),
            "e2e_kf": sysm.map_stats()["keyframes"],
            "e2e_loops_closed": st.get("loops", 0),
            "e2e_wall_fps_colocated_est": round(1e3 / adj_ms, 2),
        }

    print(json.dumps({
        "metric": "mono_amortized_fps",
        "value": round(amort_fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(amort_fps / 20.0, 3),
        "detail": {
            "tracking_step_ms": round(track_ms, 3),
            "tracking_step_fps": round(step_fps, 2),
            "kf_superstep_ms": round(kf_ms, 2),
            "kf_every_frames": args.kf_every,
            "local_ba_ms_per_kf": round(ba_ms, 2),
            "triangulate_ms": round(tri_ms, 2),
            "fuse_ms": round(fuse_ms, 2),
            "hygiene_ms": round(hyg_ms, 2),
            "cull_ms": round(cull_ms, 2),
            "loop_detect_ms": round(loop_detect_ms, 2),
            "loop_detect_at_kf": Kmax,
            **e2e_detail,
            "ba_window": f"{cfg.map.local_window}+{cfg.map.local_fixed}kf"
                         f"/{cap}pt(bucket, occ={occupancy})",
            "ba_iters": cfg.solver.ba_warm_iters,
            "ba_achieved_gbs": round(ba_gbs, 2),
            "ba_roofline_frac_vs_device_bw": round(ba_gbs / copy_gbs, 3),
            "ba_gflop": round(ba_gflops, 2),
            "hamming_1024x4096_ms": round(ham_ms, 3),
            "matching_tflops": round(ham_tflops, 4),
            "matching_roofline_frac_vs_spec": (
                round(ham_tflops / peak_tflops, 6)
                if peak_tflops == peak_tflops else None),
            "matching_roofline_frac_vs_device_mxu": round(
                ham_tflops / mm_tflops, 3),
            "device_sustained_copy_gbs": round(copy_gbs, 2),
            "device_sustained_matmul_tflops": round(mm_tflops, 4),
            "dispatch_overhead_ms": round(dispatch_ms, 2),
            "compile_s": round(compile_track_s + max(compile_kf_s, 0.0), 1),
            "bench_wall_s": round(time.perf_counter() - t_bench0, 1),
            "features": args.features,
            "frame": f"{w}x{h}",
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
