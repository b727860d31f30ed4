"""Two-view triangulation: epipolar matching + DLT + acceptance checks."""

import jax.numpy as jnp
import numpy as np

from orb_slam2_ssd_semantic_tpu.config import CameraConfig, OrbConfig
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.mapping.triangulation import (
    fundamental_from_poses,
    triangulate_pair,
)

CAM = CameraConfig()
ORB = OrbConfig()


def two_view_scene(rng, n=256, baseline=0.3):
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 8, n)], -1
    ).astype(np.float32)
    T1 = np.eye(4, dtype=np.float32)
    xi = np.array([baseline, 0.02, 0.0, 0.0, 0.05, 0.0], np.float32)
    T2 = np.asarray(se3.se3_exp(jnp.asarray(xi)))

    def proj(T, X):
        p = X @ T[:3, :3].T + T[:3, 3]
        return np.stack(
            [CAM.fx * p[:, 0] / p[:, 2] + CAM.cx, CAM.fy * p[:, 1] / p[:, 2] + CAM.cy], -1
        ), p[:, 2]

    uv1, z1 = proj(T1, pts)
    uv2, z2 = proj(T2, pts)
    inside = (
        (uv1 > 10).all(1) & (uv1 < [630, 470]).all(1)
        & (uv2 > 10).all(1) & (uv2 < [630, 470]).all(1)
    )
    return pts, T1, T2, uv1, uv2, inside


def test_fundamental_epipolar_identity(rng):
    pts, T1, T2, uv1, uv2, inside = two_view_scene(rng)
    F12 = np.asarray(fundamental_from_poses(jnp.asarray(T1), jnp.asarray(T2), CAM))
    x1 = np.concatenate([uv1, np.ones((len(uv1), 1))], -1)
    x2 = np.concatenate([uv2, np.ones((len(uv2), 1))], -1)
    resid = np.abs(np.sum(x2 * (x1 @ F12.T), axis=-1))
    lines = x1 @ F12.T
    d = resid / np.linalg.norm(lines[:, :2], axis=-1)
    assert np.median(d[inside]) < 0.1  # pixel-level epipolar consistency


def test_triangulate_pair_recovers_points(rng):
    pts, T1, T2, uv1, uv2, inside = two_view_scene(rng)
    n = len(pts)
    desc = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    level = rng.integers(0, 4, n).astype(np.int32)
    res = triangulate_pair(
        jnp.asarray(uv1), jnp.asarray(desc), jnp.asarray(level), jnp.asarray(inside),
        jnp.asarray(uv2), jnp.asarray(desc), jnp.asarray(level), jnp.asarray(inside),
        jnp.asarray(T1), jnp.asarray(T2), CAM, ORB,
    )
    v = np.asarray(res.valid)
    assert v.sum() > 0.7 * inside.sum()
    err = np.linalg.norm(np.asarray(res.pts_w)[v] - pts[v], axis=-1)
    assert np.median(err) < 0.05
    # Matches must be the identity mapping (same descriptors).
    assert np.all(np.asarray(res.idx2)[v] == np.nonzero(np.ones(n))[0][v])


def test_triangulate_rejects_wrong_matches(rng):
    pts, T1, T2, uv1, uv2, inside = two_view_scene(rng)
    n = len(pts)
    desc1 = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    desc2 = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)  # unrelated
    level = np.zeros(n, np.int32)
    res = triangulate_pair(
        jnp.asarray(uv1), jnp.asarray(desc1), jnp.asarray(level), jnp.asarray(inside),
        jnp.asarray(uv2), jnp.asarray(desc2), jnp.asarray(level), jnp.asarray(inside),
        jnp.asarray(T1), jnp.asarray(T2), CAM, ORB,
    )
    # Random descriptors rarely fall under TH_LOW; near-zero survivors.
    assert int(np.asarray(res.valid).sum()) < 0.05 * n


def test_triangulate_rejects_zero_baseline(rng):
    pts, T1, _, uv1, _, inside = two_view_scene(rng)
    n = len(pts)
    desc = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    level = np.zeros(n, np.int32)
    res = triangulate_pair(
        jnp.asarray(uv1), jnp.asarray(desc), jnp.asarray(level), jnp.asarray(inside),
        jnp.asarray(uv1), jnp.asarray(desc), jnp.asarray(level), jnp.asarray(inside),
        jnp.asarray(T1), jnp.asarray(T1), CAM, ORB,
    )
    # No parallax -> everything rejected.
    assert int(np.asarray(res.valid).sum()) == 0
