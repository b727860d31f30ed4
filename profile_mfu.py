"""On-chip kernel efficiency accounting (MFU / roofline) — MFU_r05.

Measures the top hot kernels of the engine on the real TPU chip:
  extract  — full ORB front end (pyramid, FAST, select, IC angle, BRIEF)
  match    — local-map guided matching (the (C,K) Hamming + window core)
  ba       — one local-BA pass (window assembly + Schur GN iterations)
  bamatvec — the global-BA implicit-Schur PCG matvec at 10k-KF scale

For each: warm wall time, FLOPs and bytes from XLA's compiled cost
analysis, achieved GFLOP/s and GB/s, and utilization vs the v5e peaks
(197 TFLOP/s bf16 / ~49 TFLOP/s f32-highest, 819 GB/s HBM). Kernels
dominated by integer/elementwise work (FAST, Hamming popcount) are
bandwidth-bound by design; for those the roofline column (achieved GB/s
vs 819) is the meaningful number, not MFU.

Writes MFU_r05.json and prints a markdown table for the README.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

PEAK_BF16 = 197e12
PEAK_F32 = 49e12  # v5e MXU f32 (HIGHEST = 6-pass bf16)
PEAK_HBM = 819e9


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def bench(fn, args, feedback, n=20):
    """Chained-in-one-jit device time: n calls of `fn` run inside ONE
    compiled fori_loop, each iteration's input perturbed by the previous
    output through `feedback(args, out) -> args` (forces sequential
    execution; XLA cannot elide or overlap the copies). A dispatch-loop
    with a host fetch overstates small kernels by the per-dispatch relay
    overhead — r4's "2.5 ms" matcher measures 0.29 ms chained; the r4
    harness priced the remote tunnel, not the kernel.

    FLOPs/bytes come from the SINGLE-call compile's cost analysis."""
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    fl, by = cost(compiled)

    @jax.jit
    def chained(args):
        def body(_, a):
            return feedback(a, fn(*a))

        return jax.lax.fori_loop(0, n, body, args)

    out = chained(args)
    # block_until_ready does not reliably synchronize through the
    # remote-TPU relay (bench.py finding); a host fetch does.
    np.asarray(jax.numpy.ravel(jax.tree.leaves(out)[0])[0])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = chained(args)
        np.asarray(jax.numpy.ravel(jax.tree.leaves(out)[0])[0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best, fl, by


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp

    from orb_slam2_ssd_semantic_tpu.config import SlamConfig
    from orb_slam2_ssd_semantic_tpu.frontend.extractor import extract
    from orb_slam2_ssd_semantic_tpu.ops import match as match_ops

    cfg = SlamConfig()
    rng = np.random.default_rng(0)
    rows = {}

    # ---- ORB front end ----------------------------------------------------
    img = jnp.asarray(rng.uniform(0, 255, (480, 640)).astype(np.float32))
    def fb_extract(args, out):
        return (args[0] + (out[0, 0] % 2).astype(jnp.float32) * 1e-6,)

    wall, fl, by = bench(lambda g: extract(g, cfg.orb).desc, (img,),
                         fb_extract, n=20)
    rows["extract"] = (wall, fl, by)

    # ---- local-map matcher (C=1536 candidates x K=1024 keypoints) --------
    C, K = 1536, 1024
    dq = jnp.asarray(rng.integers(0, 2**32, (C, 8), dtype=np.uint64)
                     .astype(np.uint32))
    dt = jnp.asarray(rng.integers(0, 2**32, (K, 8), dtype=np.uint64)
                     .astype(np.uint32))
    cq = jnp.asarray(rng.uniform(0, 640, (C, 2)).astype(np.float32))
    ct = jnp.asarray(rng.uniform(0, 640, (K, 2)).astype(np.float32))
    vq = jnp.ones((C,), bool)
    vt = jnp.ones((K,), bool)
    rad = jnp.full((C,), 8.0, jnp.float32)

    def match(dq, dt, cq, ct, vq, vt, rad):
        return match_ops.match_by_window(dq, dt, cq, ct, vq, vt, rad,
                                         max_dist=match_ops.TH_HIGH).idx

    def fb_match(args, out):
        dq, dt, cq, ct, vq, vt, rad = args
        cq = cq + (out[0] % 2).astype(jnp.float32) * 1e-6
        return (dq, dt, cq, ct, vq, vt, rad)

    wall, fl, by = bench(match, (dq, dt, cq, ct, vq, vt, rad), fb_match,
                         n=50)
    rows["match"] = (wall, fl, by)

    # ---- one local-BA pass on a live-sized window ------------------------
    from orb_slam2_ssd_semantic_tpu.mapping.ba import (
        BAProblem,
        local_bundle_adjust,
    )

    # A GEOMETRICALLY CONSISTENT window (projections + 0.5 px noise from
    # a perturbed seed), not random observations: a live window
    # converges in 2-4 GN iterations and the gain-based early exit
    # (OptimizerConfig.local_ba_min_rel_decrease) engages exactly as in
    # the engine — random data never plateaus and prices the worst-case
    # schedule instead of the shipped workload.
    W, A, N = cfg.map.local_ba_window, cfg.map.local_ba_fixed_anchors, 4096
    R = W + A
    cam = cfg.camera
    T_gt = np.tile(np.eye(4, dtype=np.float32), (R, 1, 1))
    T_gt[:, :3, 3] = rng.uniform(-0.3, 0.3, (R, 3))
    pts = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    pts[:, 2] += 5.0
    slot = rng.permuted(
        np.tile(np.arange(N), (R, 1)), axis=1)[:, :K].astype(np.int32)
    pc = (np.einsum("rij,rkj->rki", T_gt[:, :3, :3], pts[slot])
          + T_gt[:, None, :3, 3])
    z = np.maximum(pc[..., 2], 0.3)
    u = cam.fx * pc[..., 0] / z + cam.cx + rng.normal(0, 0.5, (R, K))
    v = cam.fy * pc[..., 1] / z + cam.cy + rng.normal(0, 0.5, (R, K))
    ur = u - cam.depth_bf / z
    T0 = T_gt.copy()
    T0[:W, :3, 3] += rng.normal(0, 0.02, (W, 3)).astype(np.float32)
    prob = BAProblem(
        T_cw=jnp.asarray(T0),
        fixed=jnp.zeros((R,), bool).at[W:].set(True),
        points=jnp.asarray(pts + rng.normal(0, 0.01, pts.shape)
                           .astype(np.float32)),
        point_valid=jnp.ones((N,), bool),
        point_slot=jnp.asarray(slot),
        obs_uvr=jnp.asarray(np.stack([u, v, ur], -1).astype(np.float32)),
        inv_sigma2=jnp.ones((R, K), jnp.float32),
        is_stereo=jnp.ones((R, K), bool),
    )
    # Feedback restores the PERTURBED seed (plus a negligible out-dependent
    # term to serialize the chain) — chaining the SOLVED poses would hand
    # iterations 2..n an already-converged window.
    T0j = jnp.asarray(T0)
    wall, fl, by = bench(
        lambda p: local_bundle_adjust(p, cfg.camera, cfg.optimizer).T_cw,
        (prob,),
        lambda args, out: (args[0]._replace(T_cw=T0j + 1e-30 * out),), n=5)
    rows["local_ba"] = (wall, fl, by)

    # ---- global-BA PCG matvec at the 10k-KF operating point --------------
    from orb_slam2_ssd_semantic_tpu.mapping.global_ba import (
        GlobalBAProblem,
        global_ba_core,
    )

    F10, K10, P10 = 2048, 256, 65536  # scaled-down (full 10k in bench_ba)
    M10 = F10 * K10
    prob10 = GlobalBAProblem(
        T_cw=jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (F10, 1, 1))),
        fixed=jnp.zeros(F10, bool).at[0].set(True),
        points=jnp.asarray(rng.uniform(-4, 4, (P10, 3)).astype(np.float32)),
        point_valid=jnp.ones(P10, bool),
        obs_kf=jnp.repeat(jnp.arange(F10, dtype=jnp.int32), K10),
        obs_pt=jnp.asarray(rng.integers(0, P10, M10).astype(np.int32)),
        obs_uvr=jnp.asarray(rng.uniform(0, 640, (M10, 3)).astype(np.float32)),
        inv_sigma2=jnp.ones(M10, jnp.float32),
        is_stereo=jnp.ones(M10, bool),
        obs_valid=jnp.ones(M10, bool),
    )
    wall, fl, by = bench(
        lambda p: global_ba_core(p, cfg.camera, cfg.optimizer, 20,
                                 obs_per_kf=K10).T_cw,
        (prob10,), lambda args, out: (args[0]._replace(T_cw=out),), n=3)
    rows["global_ba"] = (wall, fl, by)

    out = {}
    print("| kernel | wall (ms) | GFLOP | achieved TFLOP/s | MFU(f32) | "
          "GB touched | achieved GB/s | % HBM peak |")
    print("|---|---|---|---|---|---|---|---|")
    for name, (wall, fl, by) in rows.items():
        tf = fl / wall / 1e12
        gbs = by / wall / 1e9
        print(f"| {name} | {wall*1e3:.2f} | {fl/1e9:.2f} | {tf:.2f} | "
              f"{100*tf*1e12/PEAK_F32:.1f}% | {by/1e9:.3f} | {gbs:.0f} | "
              f"{100*gbs*1e9/PEAK_HBM:.1f}% |")
        out[name] = dict(wall_ms=wall * 1e3, gflop=fl / 1e9,
                         achieved_tflops=tf,
                         mfu_f32_pct=100 * tf * 1e12 / PEAK_F32,
                         gb=by / 1e9, achieved_gbps=gbs,
                         hbm_pct=100 * gbs * 1e9 / PEAK_HBM)
    with open("MFU_r05.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
