"""Dissect the loop-correction pipeline: run the multi-lap sequence up
to the first verified loop, then apply pose-graph / carry / fuse / GBA
stepwise, measuring observation & point survival at each stage."""

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
    from orb_slam2_ssd_semantic_tpu.io import vocabulary as voc
    from orb_slam2_ssd_semantic_tpu.io.artifacts import find_checkpoint
    from orb_slam2_ssd_semantic_tpu.io.device_render import render_frames
    from orb_slam2_ssd_semantic_tpu.io.synthetic import SyntheticSequence
    from orb_slam2_ssd_semantic_tpu.mapping.loop_closing import LoopCloser
    from orb_slam2_ssd_semantic_tpu.mapping.map_state import empty_state
    from orb_slam2_ssd_semantic_tpu.tracking import scan_tracker

    n_frames, laps = 337, 2.3
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
                            loop_laps=laps)
    poses = jnp.asarray(np.stack(seq.poses_wc).astype(np.float32))
    g_dev, d_dev = render_frames(
        poses, cfg.camera, size=seq.room.size,
        boxes=tuple(tuple(map(tuple, b)) for b in seq.room.boxes),
        seed=seq.seed,
    )
    np.asarray(g_dev[0][0, 0])

    vocab = voc.load_binary(find_checkpoint("orbvoc_synth.npz"))
    va = scan_tracker.VocabArrays.from_vocabulary(vocab)
    kw = dict(vocab=va, voc_k=vocab.k, voc_depth=vocab.depth,
              voc_words=vocab.n_words)

    carry = scan_tracker.init_scan(empty_state(cfg), g_dev[0], d_dev[0],
                                   cfg, vocab=va, voc_k=vocab.k,
                                   voc_depth=vocab.depth)
    # Track to frame 240 (the correction fired at 231 in diag_loop).
    carry, T_seg, stats_seg = scan_tracker.track_sequence_scan(
        carry, g_dev[1:241], d_dev[1:241], cfg, **kw)
    stats = np.asarray(stats_seg)
    state = carry.state

    def report(tag, st):
        v = np.asarray(st.points.valid)
        kp = np.asarray(st.kfs.kp_point)
        kv = np.asarray(st.kfs.kp_valid) & np.asarray(st.kfs.valid)[:, None]
        obs = (kp >= 0) & kv
        nob = np.asarray(st.points.n_obs)
        print(f"# {tag}: points={v.sum()} obs={obs.sum()} "
              f"n_obs>=3={((nob >= 3) & v).sum()} "
              f"pose_finite={np.isfinite(np.asarray(st.kfs.T_cw)[np.asarray(st.kfs.valid)]).all()}")

    report("pre-correction", state)

    def reproj_report(tag, st):
        from orb_slam2_ssd_semantic_tpu.geometry import camera as cam_ops
        from orb_slam2_ssd_semantic_tpu.geometry import se3
        from orb_slam2_ssd_semantic_tpu.mapping.global_ba import (
            problem_from_state)
        prob = problem_from_state(st, cfg)
        ov = np.asarray(prob.obs_valid)
        pc = jax.vmap(lambda Tk, X: se3.transform_points(Tk, X[None])[0])(
            st.kfs.T_cw[prob.obs_kf], st.points.pos[prob.obs_pt])
        uvp, zp = cam_ops.project(pc, cfg.camera)
        err = np.asarray(jnp.linalg.norm(uvp - prob.obs_uvr[:, :2], axis=-1))
        e = err[ov]
        print(f"# {tag} reproj err px: med {np.median(e):.2f} "
              f"p90 {np.percentile(e, 90):.1f} max {e.max():.1f} "
              f">2.8px: {(e > 2.8).mean() * 100:.1f}%")

    reproj_report("pre-correction", state)
    # Observation count distribution per keyframe
    kp = np.asarray(state.kfs.kp_point)
    kv = np.asarray(state.kfs.kp_valid) & np.asarray(state.kfs.valid)[:, None]
    per_kf = ((kp >= 0) & kv).sum(1)
    live = np.asarray(state.kfs.valid)
    print(f"# obs per KF (live): {per_kf[live]}")

    events = np.nonzero(stats[:, 3] >= 0)[0]
    print(f"# events at frames {events + 1}")
    valid = np.asarray(state.kfs.valid)
    fid = np.asarray(state.kfs.frame_id)
    lc = LoopCloser(cfg)
    done = False
    for i in events[::-1]:
        cand = int(stats[i, 3])
        slots = np.nonzero(valid & (fid == i + 1))[0]
        if not len(slots) or not valid[cand]:
            continue
        kf = int(slots[0])
        ok, T_ji, n_inl = lc._estimate_loop_transform(state, kf, cand)
        print(f"# event frame {i+1}: kf {kf} cand {cand} ok={ok} inl={n_inl}")
        if not ok:
            continue
        # ---- stepwise _correct ----------------------------------------
        from orb_slam2_ssd_semantic_tpu.mapping.map_state import covisibility
        from orb_slam2_ssd_semantic_tpu.mapping.pose_graph import (
            build_graph_arrays, optimize_pose_graph)
        from orb_slam2_ssd_semantic_tpu.mapping.local_mapping import fuse_pair
        from orb_slam2_ssd_semantic_tpu.mapping.global_ba import (
            global_ba_step_state, problem_from_state, global_bundle_adjust)

        F = state.kfs.valid.shape[0]
        covis = covisibility(state.kfs.kp_point, state.kfs.valid,
                             state.points.pos.shape[0])
        T_before = state.kfs.T_cw
        graph = build_graph_arrays(
            covis, state.kfs.valid, threshold=100, max_edges=4 * F,
            T_cw=T_before, extra_edges=[(cand, kf, 500.0, np.asarray(T_ji))],
            uid=state.kfs.uid)
        uid_np = np.asarray(state.kfs.uid)
        valid_np = np.asarray(state.kfs.valid)
        origin = int(np.argmin(np.where(valid_np & (uid_np >= 0), uid_np,
                                        2**30)))
        T_after = optimize_pose_graph(T_before, state.kfs.valid, graph,
                                      fixed=jnp.arange(F) == origin)
        dT = np.asarray(T_after) - np.asarray(T_before)
        print(f"# pose graph: max |dT| {np.abs(dT[valid_np]).max():.3f}")

        # rigid carry
        ref = jnp.clip(state.points.ref_kf, 0, F - 1)
        # how far is each point's ref kf pose moved?
        from orb_slam2_ssd_semantic_tpu.geometry import se3
        T_old = T_before[ref]
        T_new = T_after[ref]
        p = state.points.pos
        p_cam = jnp.einsum("pij,pj->pi", T_old[:, :3, :3], p) + T_old[:, :3, 3]
        Rn = jnp.swapaxes(T_new[:, :3, :3], -1, -2)
        p_new = jnp.einsum("pij,pj->pi", Rn, p_cam - T_new[:, :3, 3])
        pts = state.points._replace(
            pos=jnp.where(state.points.valid[:, None], p_new, p))
        st1 = state._replace(points=pts, kfs=state.kfs._replace(T_cw=T_after))
        report("after pose-graph+carry", st1)

        # residual stats before GBA
        prob = problem_from_state(st1, cfg)
        from orb_slam2_ssd_semantic_tpu.geometry import camera as cam_ops
        ov = np.asarray(prob.obs_valid)
        pc = jax.vmap(lambda Tk, X: se3.transform_points(Tk, X[None])[0])(
            st1.kfs.T_cw[prob.obs_kf], st1.points.pos[prob.obs_pt])
        uvp, zp = cam_ops.project(pc, cfg.camera)
        err = np.asarray(jnp.linalg.norm(uvp - prob.obs_uvr[:, :2], axis=-1))
        e = err[ov]
        print(f"# pre-GBA reproj err px: med {np.median(e):.2f} "
              f"p90 {np.percentile(e, 90):.1f} max {e.max():.1f} "
              f">2.8px: {(e > 2.8).mean() * 100:.1f}%")

        # error by obs KF and ref-kf uid gap
        obs_kf_np = np.asarray(prob.obs_kf)
        obs_pt_np = np.asarray(prob.obs_pt)
        ref_np = np.asarray(state.points.ref_kf)
        uid_arr = np.asarray(state.kfs.uid)
        for f in np.nonzero(valid_np)[0]:
            sel = ov & (obs_kf_np == f)
            if sel.sum() == 0:
                continue
            gaps = uid_arr[np.clip(ref_np[obs_pt_np[sel]], 0, F - 1)]
            print(f"#   kf slot {f} uid {uid_arr[f]}: n={sel.sum()} "
                  f"err med {np.median(err[sel]):.1f} px; "
                  f"ref uids {np.unique(gaps)[:8]}")
        # chain relative-pose change
        order2 = np.argsort(np.where(valid_np, uid_arr, 2**30))[:valid_np.sum()]
        TB, TA = np.asarray(T_before), np.asarray(T_after)
        rels = []
        for a, b in zip(order2[:-1], order2[1:]):
            rb = TB[b] @ np.linalg.inv(TB[a])
            ra = TA[b] @ np.linalg.inv(TA[a])
            rels.append(np.abs(ra - rb).max())
        print(f"# chain rel-pose change: med {np.median(rels):.3f} "
              f"max {np.max(rels):.3f}")

        st2 = fuse_pair(st1, cand, kf, cfg)
        report("after fuse_pair", st2)
        st3 = global_ba_step_state(st2, cfg)
        report("after GBA", st3)
        # which obs were pruned?
        done = True
        break
    if not done:
        print("# no verifiable event found")


if __name__ == "__main__":
    main()
