"""Multi-chip scaling measurement on a virtual CPU mesh (SCALING_r04).

No multi-chip TPU hardware exists in this environment (one v5e chip via
a tunnel), so this measures the STRUCTURAL scaling of the sharded
kernels on an 8-virtual-device CPU mesh:

  * per-device FLOPs from XLA's compiled cost analysis — the honest
    "does the work actually divide by N" number, independent of host
    core oversubscription (this box has 2 cores; wall time over 8
    virtual devices measures the host scheduler, not the sharding), and
  * collective-communication bytes per device program — what would ride
    ICI on real hardware,
  * wall time, reported but explicitly labeled a 2-core proxy.

Parallel efficiency (structural) for N devices:
    eff_flops(N) = flops_per_dev(1) / (N * flops_per_dev(N))
100% = the sharding divides compute perfectly with no redundant work;
the deficit is exactly the replicated (redundant) portion + any
communication compute. Workloads:

  gba   — sharded full-map bundle adjustment (parallel/dist_ba.py),
          F=256 keyframes x K=512 obs slots (131k observations)
  bow   — sharded BoW loop-candidate query (parallel/dist_bow.py),
          F=8192-entry database
  occ   — spatially sharded occupancy insertion (dist_occupancy.py)
  extract — keyframe-batched ORB extraction sharded over the kf axis

Writes SCALING_r04.json.
"""

import json
import os
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_cpu")

import jax  # noqa: E402

# The ambient sitecustomize pins the remote-TPU plugin; jax.config wins
# the race before any backend initializes (same trick as tests/conftest).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import numpy as np


def device_flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def comm_bytes(compiled) -> float:
    """Bytes moved by collective ops, from the optimized HLO text."""
    import re

    hlo = compiled.as_text()
    total = 0
    for m in re.finditer(
        r"(all-reduce|all-gather|reduce-scatter|collective-permute)"
        r"[^=]*=\s*\(?([a-z0-9]+)\[([0-9,]*)\]", hlo):
        dtype, dims = m.group(2), m.group(3)
        size = np.prod([int(d) for d in dims.split(",") if d]) if dims else 1
        bytes_per = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f64": 8,
                     "pred": 1, "s8": 1, "u8": 1}.get(dtype, 4)
        total += int(size) * bytes_per
    return float(total)


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from orb_slam2_ssd_semantic_tpu.config import SlamConfig
    from orb_slam2_ssd_semantic_tpu.parallel import dist_ba, dist_bow
    from orb_slam2_ssd_semantic_tpu.parallel.mesh import KF_AXIS, PT_AXIS

    cfg = SlamConfig()
    all_devs = jax.devices()
    sizes = [1, 2, 4, 8]
    results = {}

    # ---- workload builders ------------------------------------------------
    F, K = 256, 512
    M = F * K
    rng = np.random.default_rng(0)

    def gba_problem():
        from orb_slam2_ssd_semantic_tpu.mapping.global_ba import (
            GlobalBAProblem,
        )

        Pn = 8192
        pts = rng.uniform(-4, 4, (Pn, 3)).astype(np.float32)
        T = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
        T[:, 0, 3] = rng.uniform(-1, 1, F)
        obs_kf = np.repeat(np.arange(F, dtype=np.int32), K)
        obs_pt = rng.integers(0, Pn, M).astype(np.int32)
        uv = rng.uniform(0, 640, (M, 2)).astype(np.float32)
        ur = uv[:, 0] - 1.0
        return GlobalBAProblem(
            T_cw=jnp.asarray(T), fixed=jnp.zeros(F, bool).at[0].set(True),
            points=jnp.asarray(pts), point_valid=jnp.ones(Pn, bool),
            obs_kf=jnp.asarray(obs_kf), obs_pt=jnp.asarray(obs_pt),
            obs_uvr=jnp.asarray(np.concatenate([uv, ur[:, None]], -1)),
            inv_sigma2=jnp.ones(M, jnp.float32),
            is_stereo=jnp.ones(M, bool),
            obs_valid=jnp.ones(M, bool),
        )

    prob = gba_problem()

    Fdb, V = 8192, 1000
    db = rng.random((Fdb, V)).astype(np.float32)
    q = rng.random((V,)).astype(np.float32)

    from orb_slam2_ssd_semantic_tpu.frontend.extractor import extract
    imgs = rng.uniform(0, 255, (8, 240, 320)).astype(np.float32)

    for n in sizes:
        mesh = Mesh(np.array(all_devs[:n]).reshape(1, n), (KF_AXIS, PT_AXIS))
        kf_mesh = Mesh(np.array(all_devs[:n]).reshape(n, 1),
                       (KF_AXIS, PT_AXIS))
        row = {}

        # --- sharded GBA --------------------------------------------------
        run = dist_ba.make_distributed_global_ba(
            mesh, cfg.camera, cfg.optimizer, cg_iters=8)
        sh = NamedSharding(mesh, P(PT_AXIS))
        prob_sh = prob._replace(
            obs_kf=jax.device_put(prob.obs_kf, sh),
            obs_pt=jax.device_put(prob.obs_pt, sh),
            obs_uvr=jax.device_put(prob.obs_uvr, sh),
            inv_sigma2=jax.device_put(prob.inv_sigma2, sh),
            is_stereo=jax.device_put(prob.is_stereo, sh),
            obs_valid=jax.device_put(prob.obs_valid, sh),
        )
        lowered = run.lower(prob_sh)
        compiled = lowered.compile()
        out = compiled(prob_sh)
        jax.block_until_ready(out.T_cw)
        t0 = time.perf_counter()
        for _ in range(3):
            out = compiled(prob_sh)
            jax.block_until_ready(out.T_cw)
        row["gba"] = dict(
            wall_s=(time.perf_counter() - t0) / 3,
            flops_per_dev=device_flops(compiled),
            comm_bytes=comm_bytes(compiled),
        )

        # --- sharded BoW query (kf-axis mesh) ----------------------------
        detect = dist_bow.make_sharded_detect(kf_mesh, max_candidates=4)
        shF = NamedSharding(kf_mesh, P(KF_AXIS))
        db_sh = jax.device_put(jnp.asarray(db), shF)
        valid = jax.device_put(jnp.ones(Fdb, bool), shF)
        excl = jax.device_put(jnp.zeros(Fdb, bool), shF)
        args = (jnp.asarray(q), db_sh, valid, excl, jnp.float32(0.0))
        lowered = jax.jit(detect).lower(*args)
        compiled = lowered.compile()
        out = compiled(*args)
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        for _ in range(10):
            out = compiled(*args)
            jax.block_until_ready(out[0])
        row["bow"] = dict(
            wall_s=(time.perf_counter() - t0) / 10,
            flops_per_dev=device_flops(compiled),
            comm_bytes=comm_bytes(compiled),
        )

        # --- kf-sharded batched extraction -------------------------------
        sh_kf = NamedSharding(kf_mesh, P(KF_AXIS))
        imgs_sh = jax.device_put(jnp.asarray(imgs), sh_kf)

        def batch_extract(x):
            return jax.vmap(lambda g: extract(g, cfg.orb).desc)(x)

        je = jax.jit(batch_extract,
                     out_shardings=NamedSharding(kf_mesh, P(KF_AXIS)))
        lowered = je.lower(imgs_sh)
        compiled = lowered.compile()
        out = compiled(imgs_sh)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(compiled(imgs_sh))
        row["extract"] = dict(
            wall_s=(time.perf_counter() - t0) / 3,
            flops_per_dev=device_flops(compiled),
            comm_bytes=comm_bytes(compiled),
        )

        results[n] = row
        print(f"# mesh={n}: " + " ".join(
            f"{k}: {v['wall_s']*1e3:.0f}ms {v['flops_per_dev']/1e9:.2f}GF/dev"
            f" comm {v['comm_bytes']/1e6:.2f}MB"
            for k, v in row.items()))

    # ---- efficiency table -------------------------------------------------
    out = {"note": (
        "Structural scaling on an 8-virtual-device CPU mesh (this host has "
        "2 physical cores, so wall times measure the host scheduler and are "
        "reported only for completeness; flops_per_dev comes from XLA's "
        "compiled cost analysis and measures how the sharding actually "
        "divides the compute; eff_flops = flops/dev(1) / (N*flops/dev(N)), "
        "100% = perfect division with zero redundant work)."),
        "mesh_sizes": sizes, "workloads": {}}
    for wname in ("gba", "bow", "extract"):
        w = {}
        f1 = results[1][wname]["flops_per_dev"]
        for n in sizes:
            r = results[n][wname]
            w[str(n)] = {
                "wall_s": round(r["wall_s"], 5),
                "flops_per_dev": r["flops_per_dev"],
                "comm_bytes_per_dev": r["comm_bytes"],
                "eff_flops_pct": round(
                    100.0 * f1 / (n * r["flops_per_dev"]), 1)
                if r["flops_per_dev"] else None,
            }
        out["workloads"][wname] = w
    with open("SCALING_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: {n: v["eff_flops_pct"] for n, v in w.items()}
                      for k, w in out["workloads"].items()}))


if __name__ == "__main__":
    main()
