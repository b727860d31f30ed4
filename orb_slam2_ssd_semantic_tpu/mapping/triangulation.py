"""Two-view triangulation of new map points.

Equivalent of LocalMapping::CreateNewMapPoints + ORBmatcher::
SearchForTriangulation (perfect/src/LocalMapping.cc:349-649,
ORBmatcher.cc:827-1030): between a new keyframe and a covisible
neighbor, match unassociated keypoints under the epipolar constraint
(CheckDistEpipolarLine, ORBmatcher.cc:175-197), triangulate by the
two-view DLT (SVD of the 4x4 system, LocalMapping.cc:478-495), and keep
points that pass the cheirality, parallax, reprojection and scale-
consistency checks (LocalMapping.cc:497-620). For RGB-D this is how
landmarks BEYOND the depth range enter the map (close ones spawn
directly from depth).

Everything is one batched (K, K) masked problem per keyframe pair.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import CameraConfig, OrbConfig
from orb_slam2_ssd_semantic_tpu.frontend.extractor import scale_factors
from orb_slam2_ssd_semantic_tpu.geometry import camera as cam_ops
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.ops import match as match_ops
from orb_slam2_ssd_semantic_tpu.ops.linalg import inv3x3


class TriangulationResult(NamedTuple):
    pts_w: jnp.ndarray  # (K, 3) new world points (indexed by kf1 keypoint)
    idx2: jnp.ndarray  # (K,) matched keypoint in kf2 (-1 invalid)
    valid: jnp.ndarray  # (K,)


def fundamental_from_poses(T1_cw, T2_cw, cam: CameraConfig):
    """F12 such that x2^T F12 x1 = 0 (pixel coords)."""
    K = jnp.asarray(
        [[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], jnp.float32
    )
    T12 = T1_cw @ se3.se3_inverse(T2_cw)  # maps cam2 -> cam1
    T21 = se3.se3_inverse(T12)
    R21, t21 = T21[:3, :3], T21[:3, 3]
    E = se3.hat(t21) @ R21  # x2c^T E x1c = 0
    K_inv = jnp.linalg.inv(K)
    return K_inv.T @ E @ K_inv


@functools.partial(jax.jit, static_argnames=("cam", "orb"))
def triangulate_pair(
    uv1, desc1, level1, valid1,  # keyframe 1 (the new KF) keypoints
    uv2, desc2, level2, valid2,  # keyframe 2 (neighbor)
    T1_cw, T2_cw,
    cam: CameraConfig,
    orb: OrbConfig,
    max_reproj_chi2: float = 5.991,
):
    """Match under the epipolar constraint and triangulate."""
    sf = scale_factors(orb)
    F12 = fundamental_from_poses(T1_cw, T2_cw, cam)

    # Epipolar distance of every candidate pair: line l2 = F12 @ x1.
    ones1 = jnp.ones((uv1.shape[0], 1), jnp.float32)
    x1h = jnp.concatenate([uv1, ones1], axis=-1)  # (K, 3)
    l2 = x1h @ F12.T  # (K, 3) line in image 2
    num = jnp.abs(
        l2[:, None, 0] * uv2[None, :, 0]
        + l2[:, None, 1] * uv2[None, :, 1]
        + l2[:, None, 2]
    )
    den = jnp.sqrt(l2[:, 0] ** 2 + l2[:, 1] ** 2)[:, None] + 1e-9
    ep_dist = num / den  # (K1, K2)
    sigma2 = sf[jnp.clip(level2, 0, orb.n_levels - 1)] ** 2
    # 3.84 sigma gate (CheckDistEpipolarLine, ORBmatcher.cc:195).
    ep_ok = ep_dist * ep_dist < 3.84 * sigma2[None, :]

    dist = match_ops.hamming_matrix(desc1, desc2)
    mask = ep_ok & valid1[:, None] & valid2[None, :]
    m = match_ops.masked_best_match(dist, mask, max_dist=match_ops.TH_LOW, ratio=0.9)
    m = match_ops.resolve_duplicate_targets(m, uv2.shape[0])
    j = jnp.clip(m.idx, 0, uv2.shape[0] - 1)

    # Two-view DLT: rows from x cross (P X) = 0 for both views.
    K = jnp.asarray([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], jnp.float32)
    P1 = K @ T1_cw[:3, :]
    P2 = K @ T2_cw[:3, :]
    u1, v1 = uv1[:, 0], uv1[:, 1]
    u2, v2 = uv2[j, 0], uv2[j, 1]
    A = jnp.stack(
        [
            u1[:, None] * P1[2] - P1[0],
            v1[:, None] * P1[2] - P1[1],
            u2[:, None] * P2[2] - P2[0],
            v2[:, None] * P2[2] - P2[1],
        ],
        axis=1,
    )  # (K, 4, 4)
    # Inhomogeneous DLT: solve A[:, :3] X = -A[:, 3] by 3x3 normal
    # equations (closed-form inverse — batched eigh of the homogeneous
    # system is iterative and ~10x slower on TPU; finite points are
    # equivalent and the cheirality/reprojection gates below reject the
    # near-infinity cases both formulations struggle with).
    A3 = A[..., :3]  # (K, 4, 3)
    b3 = -A[..., 3]  # (K, 4)
    M = jnp.einsum("kij,kil->kjl", A3, A3) + 1e-9 * jnp.eye(3, dtype=A.dtype)
    rhs3 = jnp.einsum("kij,ki->kj", A3, b3)
    X = jnp.einsum("kij,kj->ki", inv3x3(M), rhs3)  # (K, 3) world points

    # Checks (LocalMapping.cc:497-620).
    p1 = se3.transform_points(T1_cw, X)
    p2 = se3.transform_points(T2_cw, X)
    cheir = (p1[:, 2] > 0.05) & (p2[:, 2] > 0.05)

    c1 = se3.se3_inverse(T1_cw)[:3, 3]
    c2 = se3.se3_inverse(T2_cw)[:3, 3]
    r1 = X - c1[None]
    r2 = X - c2[None]
    cos_par = jnp.sum(r1 * r2, axis=-1) / (
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1) + 1e-9
    )
    parallax_ok = cos_par < 0.9998  # ~1 degree minimum

    uvp1, z1 = cam_ops.project(p1, cam)
    uvp2, z2 = cam_ops.project(p2, cam)
    s1 = sf[jnp.clip(level1, 0, orb.n_levels - 1)] ** 2
    s2 = sf[jnp.clip(level2[j], 0, orb.n_levels - 1)] ** 2
    e1 = jnp.sum((uvp1 - uv1) ** 2, axis=-1) / s1
    e2 = jnp.sum((uvp2 - uv2[j]) ** 2, axis=-1) / s2
    reproj_ok = (e1 < max_reproj_chi2) & (e2 < max_reproj_chi2)

    # Scale consistency (LocalMapping.cc:595-618): distance ratio within
    # the pyramid ratio band.
    d1 = jnp.linalg.norm(r1, axis=-1)
    d2 = jnp.linalg.norm(r2, axis=-1)
    ratio = d1 / jnp.maximum(d2, 1e-9)
    octave_ratio = sf[jnp.clip(level1, 0, orb.n_levels - 1)] / sf[
        jnp.clip(level2[j], 0, orb.n_levels - 1)
    ]
    scale_ok = (ratio < octave_ratio * 1.5 * orb.scale_factor) & (
        ratio > octave_ratio / (1.5 * orb.scale_factor)
    )

    ok = m.valid & cheir & parallax_ok & reproj_ok & scale_ok
    return TriangulationResult(
        pts_w=jnp.where(ok[:, None], X, 0.0),
        idx2=jnp.where(ok, m.idx, -1),
        valid=ok,
    )
