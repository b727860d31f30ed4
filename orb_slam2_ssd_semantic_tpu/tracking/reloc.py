"""Relocalization: recover the camera pose after tracking loss.

Equivalent of Tracking::Relocalization (perfect/src/Tracking.cc:
2714-2889): retrieve candidate keyframes by appearance
(DetectRelocalizationCandidates), match descriptors against each
candidate, solve the pose robustly, refine with motion-only BA, accept
at >= min_inliers_reloc (50).

Where the reference runs EPnP inside per-candidate RANSAC loops
(PnPsolver.cc), an RGB-D frame carries depth for its keypoints, so the
2D-3D problem becomes 3D-3D rigid alignment — solved by the batched
Horn RANSAC (geometry/ransac3d.py) with every hypothesis scored at
once — followed by the standard pose_optimize refinement on the
reprojection residuals. Monocular frames carry no keypoint depth, so
they take the true 2D-3D path: batched EPnP RANSAC (geometry/epnp.py)
against the candidate keyframe's map points, exactly the reference's
PnPsolver::iterate role (Tracking.cc:2760-2790).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.frontend.extractor import scale_factors
from orb_slam2_ssd_semantic_tpu.geometry import camera as cam_ops
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.geometry.epnp import ransac_epnp
from orb_slam2_ssd_semantic_tpu.geometry.ransac3d import ransac_rigid
from orb_slam2_ssd_semantic_tpu.mapping import place_recognition as pr
from orb_slam2_ssd_semantic_tpu.mapping.map_state import SlamState
from orb_slam2_ssd_semantic_tpu.ops import match as match_ops
from orb_slam2_ssd_semantic_tpu.tracking.pose_opt import pose_optimize


def relocalize(
    state: SlamState,
    frame,  # tracking.tracker.Frame
    bow_db,  # (F, VOCAB_SIZE) flat-codebook db, or a LoopCloser
    cfg: SlamConfig,
    max_candidates: int = 3,
):
    """Try to relocalize `frame` against the keyframe database
    (DetectRelocalizationCandidates + PnP/rigid RANSAC + pose refine,
    Tracking.cc:2714, KeyFrameDatabase.cc:199).

    Returns (success, T_cw, n_inliers)."""
    cam = cfg.camera
    if hasattr(bow_db, "frame_scores"):  # LoopCloser (either backend)
        scores = bow_db.frame_scores(frame.feats.desc, frame.feats.valid)
        s = np.where(np.asarray(state.kfs.valid), scores, -1.0)
        ids = np.argsort(-s)[:max_candidates]
        ok_np = s[ids] > 0.0
    else:
        vec = pr.bow_vector(frame.feats.desc, frame.feats.valid)
        F = bow_db.shape[0]
        ids, scores, ok = pr.detect_candidates(
            vec, bow_db, state.kfs.valid, jnp.zeros((F,), bool), jnp.float32(0.0),
            max_candidates=max_candidates,
        )
        ids = np.asarray(ids)
        ok_np = np.asarray(ok)

    pf = cam_ops.backproject(frame.feats.uv, frame.kp_depth, cam)
    vf = frame.feats.valid & frame.is_stereo
    sf = scale_factors(cfg.orb)
    # Monocular frames have no keypoint depth: 3D-3D alignment is
    # impossible, so fall back to true 2D-3D EPnP against map points.
    use_epnp = int(np.sum(np.asarray(vf))) < 3 * cfg.loop.sim3_min_inliers

    best = (False, jnp.eye(4, dtype=jnp.float32), 0)
    for c in range(len(ids)):
        if not ok_np[c]:
            continue
        kf = int(ids[c])
        dk = state.kfs.desc[kf]
        dist = match_ops.hamming_matrix(frame.feats.desc, dk)
        if use_epnp:
            pid = state.kfs.kp_point[kf]
            vk = state.kfs.kp_valid[kf] & (pid >= 0)
            m = match_ops.masked_best_match(
                dist, frame.feats.valid[:, None] & vk[None, :],
                max_dist=match_ops.TH_LOW, ratio=0.75, mutual=True,
            )
            tgt = jnp.clip(m.idx, 0, pid.shape[0] - 1)
            pk_world = state.points.pos[
                jnp.clip(pid, 0, state.points.pos.shape[0] - 1)][tgt]
            R, t, inl, n_inl = ransac_epnp(
                pk_world, frame.feats.uv, m.valid, jax.random.PRNGKey(kf), cam,
            )
        else:
            vk = state.kfs.kp_valid[kf] & (state.kfs.depth[kf] > 0)
            m = match_ops.masked_best_match(
                dist, vf[:, None] & vk[None, :], max_dist=match_ops.TH_LOW,
                ratio=0.75, mutual=True,
            )
            # Frame keypoints' 3D (frame camera) vs matched KF keypoints'
            # 3D (world, via the KF pose and depth).
            pk_cam = cam_ops.backproject(state.kfs.uv[kf], state.kfs.depth[kf], cam)
            T_wk = se3.se3_inverse(state.kfs.T_cw[kf])
            pk_world_all = se3.transform_points(T_wk, pk_cam)
            tgt = jnp.clip(m.idx, 0, pk_world_all.shape[0] - 1)
            pk_world = pk_world_all[tgt]
            # dst = frame-camera points, src = world points -> T_cw estimate.
            s, R, t, inl, n_inl = ransac_rigid(
                pk_world, pf, m.valid, jax.random.PRNGKey(kf),
                threshold=0.10, with_scale=False,
            )
        if int(n_inl) < cfg.loop.sim3_min_inliers:
            continue
        T0 = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(R).at[:3, 3].set(t)

        # Reprojection refinement on the matched pairs.
        inv_sigma2 = 1.0 / (sf[jnp.clip(frame.feats.level, 0, sf.shape[0] - 1)] ** 2)
        res = pose_optimize(
            T0, pk_world, frame.obs_uvr, inv_sigma2,
            frame.is_stereo, m.valid & inl, cam, cfg.optimizer,
        )
        n = int(res.num_inliers)
        if n >= cfg.tracking.min_inliers_reloc and n > best[2]:
            best = (True, res.T_cw, n)
    return best
