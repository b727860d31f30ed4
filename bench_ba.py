"""Secondary benchmark: full-map bundle adjustment at 10k keyframes.

Prints ONE JSON line:
  {"metric": "gba_ms_per_iter_10k_kf", "value": N, "unit": "ms", "vs_baseline": null}

BASELINE.md tracks "BA ms/iter at 10k keyframes" as a scale metric. The
reference has no comparable number (its g2o global BA is single-threaded
CPU and the README notes the system slows as the map grows,
reference README.md:170), so vs_baseline is null.

Method: build a synthetic loop trajectory of F=10,000 keyframes
observing P=200,000 landmarks (M=2.56M observation slots, the same
F*K slot layout `problem_from_state` produces), perturb poses and
points, and time `global_bundle_adjust` — robust Gauss-Newton with an
implicit-Schur PCG solve per iteration (mapping/global_ba.py). Reported
value is wall ms per GN iteration on the real chip.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

F = int(os.environ.get("BENCH_BA_KFS", "10000"))
P = int(os.environ.get("BENCH_BA_POINTS", "200000"))
# 128 tracked observations per keyframe (the reference's local maps carry
# ~100-300 tracked points per frame). M = F*128 = 1.28M observations fits
# one chip; beyond ~2M observations the single-chip program faults at
# runtime — that regime is what the observation-sharded distributed BA
# (parallel/dist_ba.py) is for.
OBS_PER_KF = int(os.environ.get("BENCH_BA_OBS_PER_KF", "128"))
CG_ITERS = int(os.environ.get("BENCH_BA_CG_ITERS", "20"))


def build_problem(np, cam):
    """Loop trajectory with local landmark visibility (covis-like)."""
    rng = np.random.default_rng(0)

    # Keyframe poses on a circle, looking inward.
    theta = np.linspace(0, 2 * np.pi, F, endpoint=False)
    radius = 20.0
    centers = np.stack(
        [radius * np.cos(theta), np.zeros(F), radius * np.sin(theta)], -1
    ).astype(np.float32)
    # Camera z-axis points toward the circle center (world origin).
    z_ax = -centers / np.linalg.norm(centers, axis=-1, keepdims=True)
    up = np.tile(np.asarray([0.0, 1.0, 0.0], np.float32), (F, 1))
    x_ax = np.cross(up, z_ax)
    x_ax /= np.linalg.norm(x_ax, axis=-1, keepdims=True)
    y_ax = np.cross(z_ax, x_ax)
    R_wc = np.stack([x_ax, y_ax, z_ax], axis=-1)  # columns = camera axes
    R_cw = np.transpose(R_wc, (0, 2, 1))
    t_cw = -np.einsum("fij,fj->fi", R_cw, centers)
    T_cw = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    T_cw[:, :3, :3] = R_cw
    T_cw[:, :3, 3] = t_cw

    # Landmarks in an annulus inside the circle; keyframe f sees a
    # contiguous window of points (loop covisibility).
    pts = rng.uniform(-6, 6, (P, 3)).astype(np.float32)
    pts[:, 1] = rng.uniform(-2, 2, P).astype(np.float32)

    kf_idx = np.repeat(np.arange(F, dtype=np.int32), OBS_PER_KF)
    base = (np.arange(F, dtype=np.int64) * P) // F
    offs = rng.integers(0, max(P // F * 40, OBS_PER_KF * 4), (F, OBS_PER_KF))
    pt_idx = ((base[:, None] + offs) % P).astype(np.int32).reshape(-1)

    Xc = np.einsum("mij,mj->mi", T_cw[kf_idx, :3, :3], pts[pt_idx]) + T_cw[
        kf_idx, :3, 3
    ]
    z = Xc[:, 2]
    ok = z > 0.5
    u = cam.fx * Xc[:, 0] / np.maximum(z, 0.5) + cam.cx
    v = cam.fy * Xc[:, 1] / np.maximum(z, 0.5) + cam.cy
    ur = u - cam.depth_bf / np.maximum(z, 0.5)
    obs_uvr = np.stack([u, v, ur], -1).astype(np.float32)
    obs_uvr += rng.normal(0, 0.5, obs_uvr.shape).astype(np.float32)

    # Perturb the initial estimate.
    T0 = T_cw.copy()
    T0[:, :3, 3] += rng.normal(0, 0.05, (F, 3)).astype(np.float32)
    pts0 = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    return T_cw, T0, pts0, kf_idx, pt_idx, obs_uvr, ok


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from orb_slam2_ssd_semantic_tpu.config import CameraConfig, OptimizerConfig
    from orb_slam2_ssd_semantic_tpu.mapping.global_ba import (
        GlobalBAProblem,
        global_bundle_adjust,
    )

    cam = CameraConfig()
    opt = OptimizerConfig()
    T_gt, T0, pts0, kf_idx, pt_idx, obs_uvr, ok = build_problem(np, cam)
    M = kf_idx.shape[0]

    prob = GlobalBAProblem(
        T_cw=jnp.asarray(T0),
        fixed=jnp.arange(F) == 0,
        points=jnp.asarray(pts0),
        point_valid=jnp.ones((P,), bool),
        obs_kf=jnp.asarray(kf_idx),
        obs_pt=jnp.asarray(pt_idx),
        obs_uvr=jnp.asarray(obs_uvr),
        inv_sigma2=jnp.ones((M,), jnp.float32),
        is_stereo=jnp.ones((M,), bool),
        obs_valid=jnp.asarray(ok),
    )

    def run():
        res = global_bundle_adjust(
            prob, cam, opt, cg_iters=CG_ITERS, obs_per_kf=OBS_PER_KF
        )
        # block_until_ready is a no-op through the remote-TPU relay;
        # a (tiny) host fetch is what actually drains the execution.
        np.asarray(res.T_cw[0])
        return res

    res = run()  # compile + warm
    # Remote-attached TPU: time several synced runs, keep the median.
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = run()
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]
    ms_per_iter = dt * 1000.0 / opt.global_ba_iters

    err_t = np.linalg.norm(
        np.asarray(res.T_cw)[:, :3, 3] - T_gt[:, :3, 3], axis=-1
    )
    print(
        f"# F={F} P={P} M={M} valid_obs={int(ok.sum())} "
        f"iters={opt.global_ba_iters} cg={CG_ITERS}: {dt:.2f}s total; "
        f"median |t err| {np.median(err_t)*100:.2f} cm "
        f"(init perturbation 5 cm); inliers {int(np.asarray(res.inlier).sum())}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "gba_ms_per_iter_10k_kf",
                "value": round(ms_per_iter, 1),
                "unit": "ms",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
