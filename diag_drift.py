"""Drift diagnosis on the bench circuit: per-frame relative-pose error
decomposition (yaw / translation bias) against exact ground truth.

Runs the same scan-tracker path as bench.py [track config] and prints:
  - per-frame RPE rotation (deg) and translation (cm): mean/std/bias
  - cumulative yaw error over the circuit
  - per-phase breakdown (which wall the camera faces)
  - keyframe pose errors after local BA

Usage: python diag_drift.py [n_frames] [laps]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import dataclasses

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from orb_slam2_ssd_semantic_tpu.config import SlamConfig
    from orb_slam2_ssd_semantic_tpu.eval.ate import evaluate_ate_xyz
    from orb_slam2_ssd_semantic_tpu.io.device_render import render_frames
    from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence
    from orb_slam2_ssd_semantic_tpu.mapping.map_state import empty_state
    from orb_slam2_ssd_semantic_tpu.tracking import scan_tracker

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 191
    laps = float(sys.argv[2]) if len(sys.argv) > 2 else 1.3

    base = SlamConfig()
    env = os.environ
    cfg = dataclasses.replace(
        base,
        camera=dataclasses.replace(
            base.camera, th_depth=80.0,
            depth_bf=float(env.get("D_DEPTH_BF", base.camera.depth_bf)),
        ),
        map=dataclasses.replace(
            base.map, max_keyframes=128, max_map_points=16384,
            local_ba_window=int(env.get("D_BA_WINDOW",
                                        base.map.local_ba_window)),
            triangulate_new_points=env.get("D_TRIANGULATE", "1") == "1",
            fuse_neighbors=int(env.get("D_FUSE", base.map.fuse_neighbors)),
            kf_redundancy_ratio=float(env.get("D_CULL_RATIO",
                                              base.map.kf_redundancy_ratio)),
        ),
        tracking=dataclasses.replace(
            base.tracking, local_map_candidates=1536,
            subpixel_depth=env.get("D_SUBPIX", "1") == "1",
            max_new_points_per_kf=int(env.get("D_FAR_SPAWN", "100")),
            kf_min_inliers=int(env.get("D_KF_FLOOR", "250")),
            kf_ref_ratio=float(env.get("D_KF_RATIO", "0.75")),
        ),
    )
    print(f"# cfg: subpix={cfg.tracking.subpixel_depth} "
          f"far={cfg.tracking.max_new_points_per_kf} "
          f"floor={cfg.tracking.kf_min_inliers} "
          f"ratio={cfg.tracking.kf_ref_ratio} "
          f"depth_bf={cfg.camera.depth_bf} "
          f"ba_window={cfg.map.local_ba_window}")
    seq = SyntheticSequence(n_frames=n_frames, trajectory="loop",
                            loop_laps=laps)
    poses = jnp.asarray(np.stack(seq.poses_wc).astype(np.float32))
    g_dev, d_dev = render_frames(
        poses, cfg.camera, size=seq.room.size,
        boxes=tuple(tuple(map(tuple, b)) for b in seq.room.boxes),
        seed=seq.seed,
    )
    np.asarray(g_dev[0][0, 0])
    print(f"# rendered {n_frames} frames, laps={laps}")

    t0 = time.perf_counter()
    carry = scan_tracker.init_scan(empty_state(cfg), g_dev[0], d_dev[0], cfg)
    carry, T_all, stats = scan_tracker.track_sequence_scan(
        carry, g_dev[1:], d_dev[1:], cfg)
    T_host = np.asarray(T_all)
    stats_host = np.asarray(stats)
    print(f"# scan done in {time.perf_counter() - t0:.1f}s")

    T_est = np.concatenate([np.eye(4, dtype=np.float32)[None], T_host])  # T_cw
    gt_wc = np.stack(seq.poses_wc).astype(np.float64)
    # GT in the est gauge: both start at identity? est frame0 = I (cam0 frame
    # = world). GT cam0 != I. Express everything relative to frame 0.
    T_gt_cw = np.stack([np.linalg.inv(g) for g in gt_wc])

    def rel(T, i):
        return T[i] @ np.linalg.inv(T[i - 1])

    def rot_angle(R):
        c = (np.trace(R) - 1) / 2
        return np.degrees(np.arccos(np.clip(c, -1, 1)))

    def yaw_of(R):
        # camera yaw about world y from R_cw: forward dir in world
        fwd = R.T @ np.array([0, 0, 1.0])
        return np.degrees(np.arctan2(fwd[0], fwd[2]))

    rpe_rot, rpe_tr = [], []
    yaw_err = []
    E_rots = []
    for i in range(1, n_frames):
        Er = rel(T_est, i) @ np.linalg.inv(rel(T_gt_cw, i))
        rpe_rot.append(rot_angle(Er[:3, :3]))
        rpe_tr.append(np.linalg.norm(Er[:3, 3]) * 100)
        E_rots.append(Er[:3, :3])
        # cumulative yaw error: est yaw (rel to frame0) vs gt yaw
        yaw_e = yaw_of(T_est[i][:3, :3] @ T_gt_cw[0][:3, :3].T @ T_gt_cw[0][:3, :3])
        # simpler: compare relative-to-start rotations
        R_est0 = T_est[i][:3, :3]  # frame0 cam = world for est
        R_gt0 = T_gt_cw[i][:3, :3] @ np.linalg.inv(T_gt_cw[0][:3, :3])
        E0 = R_est0 @ np.linalg.inv(R_gt0)
        yaw_err.append(rot_angle(E0))

    rpe_rot = np.array(rpe_rot)
    rpe_tr = np.array(rpe_tr)
    yaw_err = np.array(yaw_err)

    # Per-frame rotation-error axis decomposition: mean log map
    from scipy.spatial.transform import Rotation as SR
    logs = SR.from_matrix(np.stack(E_rots)).as_rotvec()
    print(f"# RPE rot/frame: mean {rpe_rot.mean():.4f} deg, "
          f"median {np.median(rpe_rot):.4f}, max {rpe_rot.max():.4f}")
    print(f"# RPE rot BIAS (mean rotvec, deg): "
          f"{np.degrees(logs.mean(0))} (per-axis)")
    print(f"#   -> accumulated bias over {n_frames} frames: "
          f"{np.degrees(np.linalg.norm(logs.mean(0))) * n_frames:.2f} deg")
    print(f"# RPE trans/frame: mean {rpe_tr.mean():.3f} cm, "
          f"median {np.median(rpe_tr):.3f}, max {rpe_tr.max():.3f}")
    print(f"# cumulative rot error vs start: "
          f"25%={np.percentile(yaw_err, 25):.2f} 50%={np.median(yaw_err):.2f} "
          f"final={yaw_err[-1]:.2f} deg, max={yaw_err.max():.2f}")

    # Positions + ATE
    est_pos = np.stack([-T[:3, :3].T @ T[:3, 3] for T in T_est])
    res = evaluate_ate_xyz(est_pos, seq.gt_positions())
    print(f"# ATE RMSE {res.rmse:.4f} m  (mean {res.mean:.4f})")

    # per-quarter breakdown of the circuit
    q = n_frames // 4
    for k in range(4):
        s = slice(k * q, min((k + 1) * q, n_frames - 1))
        print(f"# quarter {k}: RPE rot mean {rpe_rot[s].mean():.4f} deg, "
              f"trans mean {rpe_tr[s].mean():.3f} cm, "
              f"rotvec bias deg {np.degrees(logs[s].mean(0))}")

    # status / inliers
    st = stats_host[:, 0]
    print(f"# status: ok={int((st==0).sum())} pre-only={int((st==1).sum())} "
          f"lost={int((st==2).sum())}; inliers mean "
          f"{stats_host[:, 1].mean():.0f} min {stats_host[:, 1].min()}")
    print(f"# kfs final: {int(stats_host[-1, 2])}")

    np.save("/tmp/diag_T_est.npy", T_est)
    np.save("/tmp/diag_T_gt.npy", T_gt_cw)
    np.save("/tmp/diag_stats.npy", stats_host)


if __name__ == "__main__":
    main()
