"""Trace a single keyframe event: track one more frame on a live map,
insert the KF, then run each local-mapping sub-stage, counting the new
keyframe's observations and its sharing with the previous KF."""

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
    from orb_slam2_ssd_semantic_tpu.io.device_render import render_frames
    from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence
    from orb_slam2_ssd_semantic_tpu.mapping.local_mapping import (
        _ba_and_maintain,
        create_new_map_points,
        cull_keyframes,
        cull_points,
        fuse_map_points,
    )
    from orb_slam2_ssd_semantic_tpu.mapping.map_state import empty_state
    from orb_slam2_ssd_semantic_tpu.tracking import scan_tracker
    from orb_slam2_ssd_semantic_tpu.tracking import tracker as tk

    n_frames = 121
    base = SlamConfig()
    cfg = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, th_depth=80.0),
        map=dataclasses.replace(base.map, max_keyframes=128,
                                max_map_points=16384),
        tracking=dataclasses.replace(
            base.tracking, local_map_candidates=1536,
            kf_min_inliers=0, kf_ref_ratio=0.15),
    )
    seq = SyntheticSequence(n_frames=n_frames, trajectory="loop",
                            loop_laps=2.3 * n_frames / 337)
    poses = jnp.asarray(np.stack(seq.poses_wc).astype(np.float32))
    g_dev, d_dev = render_frames(
        poses, cfg.camera, size=seq.room.size,
        boxes=tuple(tuple(map(tuple, b)) for b in seq.room.boxes),
        seed=seq.seed,
    )
    np.asarray(g_dev[0][0, 0])

    carry = scan_tracker.init_scan(empty_state(cfg), g_dev[0], d_dev[0], cfg)
    carry, T_seg, stats_seg = scan_tracker.track_sequence_scan(
        carry, g_dev[1:120], d_dev[1:120], cfg)
    np.asarray(T_seg)
    state = carry.state

    def row_report(tag, st, slot):
        kp = np.asarray(st.kfs.kp_point)
        kv = np.asarray(st.kfs.kp_valid)
        valid = np.asarray(st.kfs.valid)
        uidF = np.asarray(st.kfs.uid)
        mine = set(kp[slot][(kp[slot] >= 0) & kv[slot]].tolist())
        live = np.nonzero(valid)[0]
        live = live[np.argsort(-uidF[live])]
        prev = [f for f in live if f != slot][:2]
        shares = []
        for f in prev:
            o = set(kp[f][(kp[f] >= 0) & kv[f]].tolist())
            shares.append(f"uid{uidF[f]}:{len(o & mine)}/{len(o)}")
        pv = np.asarray(st.points.valid)
        alive = sum(1 for p in mine if pv[p])
        print(f"# {tag}: new-KF obs={len(mine)} (alive pts {alive}) "
              f"share {' '.join(shares)}")

    # Track frame 120 and insert a keyframe manually.
    frame = tk.build_frame(g_dev[120], d_dev[120], cfg)
    T_pred = carry.velocity @ carry.last_T_cw
    T_mm, _, n_mm = tk.track_motion_model(
        frame, carry.last_frame, carry.last_T_cw, T_pred, cfg,
        map_pos=state.points.pos, map_valid=state.points.valid,
        last_kp_point=carry.last_kp_point)
    state, res = tk.track_local_map(state, frame, T_mm, cfg)
    print(f"# track: mm {int(n_mm)} local {int(res.n_inliers)} "
          f"assoc {int(np.asarray((res.kp_point >= 0).sum()))}")
    state, kp_point = tk.insert_keyframe(
        state, frame, res.T_cw, res.kp_point, jnp.int32(120), 120.0, cfg)
    slot = int(np.asarray(state.last_kf))
    row_report("post-insert", state, slot)
    st = create_new_map_points(state, cfg)
    row_report("post-triangulate", st, slot)
    st = fuse_map_points(st, cfg)
    row_report("post-fuse", st, slot)
    st2 = _ba_and_maintain(
        st, dataclasses.replace(
            cfg, map=dataclasses.replace(cfg.map, prune_ba_outliers=True)))
    row_report("post-BA+cull", st2, slot)
    # decompose: BA without cull is not separable here; measure cull alone
    st3 = cull_points(st, cfg)
    row_report("post-cull-only", st3, slot)


if __name__ == "__main__":
    main()
