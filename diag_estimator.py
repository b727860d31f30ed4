"""Isolated single-frame estimator bias/gain measurement.

For sampled frames k along the bench circuit:
  - build a PERFECT map: frame k's keypoints backprojected with the GT
    pose and rendered depth;
  - track frame k+1 with track_local_map from (a) the exact GT pose,
    (b) GT perturbed by a calibrated offset;
  - report per-frame translation/rotation error and the error GAIN
    |err_out| / |err_seed|.

Gain < 1: tracking contracts seed errors (drift-stable).
Gain >= 1: tracking amplifies them (drift accumulates by design).
"""

import dataclasses
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from orb_slam2_ssd_semantic_tpu.config import SlamConfig
    from orb_slam2_ssd_semantic_tpu.geometry import camera as cam_ops
    from orb_slam2_ssd_semantic_tpu.geometry import se3
    from orb_slam2_ssd_semantic_tpu.io.device_render import render_frames
    from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence
    from orb_slam2_ssd_semantic_tpu.mapping.map_state import empty_state
    from orb_slam2_ssd_semantic_tpu.tracking import tracker as tk

    n_frames = 337
    env = os.environ
    base = SlamConfig()
    cfg = dataclasses.replace(
        base,
        camera=dataclasses.replace(
            base.camera, th_depth=80.0,
            depth_bf=float(env.get("D_DEPTH_BF", base.camera.depth_bf))),
        map=dataclasses.replace(base.map, max_keyframes=128,
                                max_map_points=16384),
        tracking=dataclasses.replace(
            base.tracking, local_map_candidates=1536,
            subpixel_depth=env.get("D_SUBPIX", "1") == "1"),
        matcher=dataclasses.replace(
            base.matcher,
            lm_search_radius=float(env.get("D_LM_RADIUS",
                                           base.matcher.lm_search_radius))),
    )
    seq = SyntheticSequence(n_frames=n_frames, trajectory="loop",
                            loop_laps=2.3)
    poses = jnp.asarray(np.stack(seq.poses_wc).astype(np.float32))
    g_dev, d_dev = render_frames(
        poses, cfg.camera, size=seq.room.size,
        boxes=tuple(tuple(map(tuple, b)) for b in seq.room.boxes),
        seed=seq.seed,
    )
    np.asarray(g_dev[0][0, 0])

    T_gt_cw = np.stack([np.linalg.inv(p) for p in seq.poses_wc]).astype(
        np.float32)

    def perfect_state(k):
        """Map = frame k's keypoints backprojected at GT."""
        state = empty_state(cfg)
        frame = tk.build_frame(g_dev[k], d_dev[k], cfg)
        kp_point = jnp.full((frame.feats.capacity,), -1, jnp.int32)
        state, _ = tk.insert_keyframe(
            state, frame, jnp.asarray(T_gt_cw[k]), kp_point, 0, 0.0, cfg,
            spawn_all=True)
        return state

    def rot_deg(R):
        return np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)))

    rows = []
    ks = list(range(0, n_frames - 1, 16))
    for k in ks:
        state = perfect_state(k)
        frame = tk.build_frame(g_dev[k + 1], d_dev[k + 1], cfg)
        T_true = T_gt_cw[k + 1]
        # Zero-baseline control: track frame k against its own map.
        frame_self = tk.build_frame(g_dev[k], d_dev[k], cfg)
        _, res_self = tk.track_local_map(
            state, frame_self, jnp.asarray(T_gt_cw[k]), cfg)
        T_s = np.asarray(res_self.T_cw)
        e_self = np.linalg.norm(
            (-T_s[:3, :3].T @ T_s[:3, 3])
            - (-T_gt_cw[k][:3, :3].T @ T_gt_cw[k][:3, 3]))
        rows.append((k, "self", 0.0, float(e_self),
                     rot_deg(T_s[:3, :3] @ T_gt_cw[k][:3, :3].T),
                     int(res_self.n_inliers)))

        for tag, seed in (
            ("exact", T_true),
            ("pert2cm", _perturb(T_true, 0.02, 0.0)),
            ("pert5cm", _perturb(T_true, 0.05, 0.003)),
            ("pred", None),  # damped-velocity-style prediction
            ("pred2rnd", None),  # prediction + second refine round
        ):
            two_round = tag == "pred2rnd"
            if seed is None:
                rel = T_gt_cw[k + 1] @ np.linalg.inv(T_gt_cw[k])
                lg = np.asarray(se3.se3_log(jnp.asarray(rel)))
                seed = np.asarray(
                    se3.se3_exp(jnp.asarray(0.85 * lg))) @ T_gt_cw[k]
            _, res = tk.track_local_map(
                state, frame, jnp.asarray(seed.astype(np.float32)), cfg)
            if two_round:
                _, res = tk.track_local_map(state, frame, res.T_cw, cfg)
            T_est = np.asarray(res.T_cw)
            e_t = np.linalg.norm(
                (-T_est[:3, :3].T @ T_est[:3, 3])
                - (-T_true[:3, :3].T @ T_true[:3, 3]))
            e_r = rot_deg(T_est[:3, :3] @ T_true[:3, :3].T)
            seed_t = np.linalg.norm(
                (-seed[:3, :3].T @ seed[:3, 3])
                - (-T_true[:3, :3].T @ T_true[:3, 3]))
            rows.append((k, tag, float(seed_t), float(e_t), float(e_r),
                         int(res.n_inliers)))

    print("#  k   seed      seed_t(cm)  err_t(cm)  err_r(deg)  inl   gain")
    for k, tag, st_, et, er, ni in rows:
        g = et / st_ if st_ > 1e-9 else float("nan")
        print(f"# {k:4d} {tag:8s} {st_*100:9.2f} {et*100:9.2f} {er:9.3f} "
              f"{ni:5d} {g:6.2f}")
    import collections
    agg = collections.defaultdict(list)
    for k, tag, st_, et, er, ni in rows:
        agg[tag].append((et, er, ni, et / st_ if st_ > 1e-9 else np.nan))
    print("# tag: err_t cm (med/p90), err_r deg med, inl med, gain med")
    for tag, v in agg.items():
        a = np.array(v)
        print(f"# {tag:8s} {np.median(a[:,0])*100:6.2f}/"
              f"{np.percentile(a[:,0],90)*100:6.2f} "
              f"{np.median(a[:,1]):7.3f} {np.median(a[:,2]):5.0f} "
              f"{np.nanmedian(a[:,3]):6.2f}")


def _perturb(T, dt, dr):
    rng = np.random.default_rng(int(T[0, 3] * 1000) & 0xFFFF)
    d = rng.normal(size=3)
    d = d / np.linalg.norm(d) * dt
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * dr
    from scipy.spatial.transform import Rotation as SR
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = SR.from_rotvec(w).as_matrix().astype(np.float32)
    P[:3, 3] = d
    return (P @ T).astype(np.float32)


if __name__ == "__main__":
    main()
