"""Matching and pose optimization unit tests on synthetic problems."""

import jax.numpy as jnp
import numpy as np

from orb_slam2_ssd_semantic_tpu.config import CameraConfig, OptimizerConfig
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.ops import match as match_ops
from orb_slam2_ssd_semantic_tpu.tracking.pose_opt import pose_optimize

CAM = CameraConfig()


def rand_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def test_hamming_matrix_basic(rng):
    a = rand_desc(rng, 16)
    d = np.asarray(match_ops.hamming_matrix(jnp.asarray(a), jnp.asarray(a)))
    assert np.all(np.diag(d) == 0)
    # Flip exactly 3 bits of a[0].
    b = a[0].copy()
    b[0] ^= 0b1011
    d2 = np.asarray(match_ops.hamming_matrix(jnp.asarray(a[:1]), jnp.asarray(b[None])))
    assert d2[0, 0] == 3


def test_masked_best_match_ratio_and_mutual(rng):
    a = rand_desc(rng, 8)
    t = np.concatenate([a, a], axis=0)  # every query has two perfect targets
    dist = match_ops.hamming_matrix(jnp.asarray(a), jnp.asarray(t))
    mask = jnp.ones_like(dist, dtype=bool)
    m = match_ops.masked_best_match(dist, mask, max_dist=50, ratio=0.9)
    # best == second == 0 -> ratio test kills everything.
    assert not bool(jnp.any(m.valid))
    m2 = match_ops.masked_best_match(dist, mask, max_dist=50)
    assert bool(jnp.all(m2.valid)) and np.all(np.asarray(m2.dist) == 0)


def test_window_mask_restricts_candidates(rng):
    q_desc = rand_desc(rng, 4)
    t_desc = np.concatenate([q_desc, rand_desc(rng, 4)], axis=0)
    centers = jnp.asarray([[10.0, 10.0], [50.0, 50.0], [90.0, 90.0], [130.0, 130.0]])
    uv_t = jnp.asarray(
        [[11.0, 9.0], [49.0, 52.0], [200.0, 200.0], [131.0, 129.0],
         [10.0, 10.0], [50.0, 50.0], [90.0, 90.0], [130.0, 130.0]]
    )
    vq = jnp.ones(4, bool)
    vt = jnp.ones(8, bool)
    m = match_ops.match_by_window(
        jnp.asarray(q_desc), jnp.asarray(t_desc), centers, uv_t, vq, vt, 5.0, max_dist=30
    )
    got = np.asarray(m.idx)
    # Query 2's identical twin (index 2) is out of window; its same-position
    # impostor (index 6) has a random descriptor -> should fail max_dist.
    assert got[0] == 0 and got[1] == 1 and got[3] == 3
    assert got[2] == -1


def test_duplicate_target_resolution():
    idx = jnp.asarray([2, 2, 3])
    dist = jnp.asarray([10, 5, 7])
    valid = jnp.asarray([True, True, True])
    m = match_ops.resolve_duplicate_targets(match_ops.MatchResult(idx, dist, valid), 4)
    assert np.asarray(m.valid).tolist() == [False, True, True]


def test_rotation_consistency(rng):
    n = 100
    angle_q = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    # 90 consistent matches at delta=0.3, 10 outliers at random deltas.
    delta = np.full(n, 0.3, dtype=np.float32)
    delta[:10] = rng.uniform(-np.pi, np.pi, 10)
    angle_t = (angle_q - delta).astype(np.float32)
    m = match_ops.MatchResult(
        idx=jnp.arange(n, dtype=jnp.int32),
        dist=jnp.zeros(n, jnp.int32),
        valid=jnp.ones(n, bool),
    )
    keep = np.asarray(
        match_ops.rotation_consistency_mask(jnp.asarray(angle_q), jnp.asarray(angle_t), m)
    )
    assert keep[10:].mean() > 0.95
    assert keep[:10].mean() < 0.5


def make_pnp_problem(rng, n=200, noise=0.3, outlier_frac=0.0):
    pts = np.stack(
        [
            rng.uniform(-2, 2, n),
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(1.5, 6.0, n),
        ],
        axis=-1,
    ).astype(np.float32)
    xi = np.array([0.1, -0.05, 0.08, 0.02, -0.03, 0.01], dtype=np.float32)
    T_true = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    p = pts @ T_true[:3, :3].T + T_true[:3, 3]
    u = CAM.fx * p[:, 0] / p[:, 2] + CAM.cx
    v = CAM.fy * p[:, 1] / p[:, 2] + CAM.cy
    ur = u - CAM.depth_bf / p[:, 2]
    obs = np.stack([u, v, ur], axis=-1)
    obs[:, :2] += rng.normal(0, noise, (n, 2))
    n_out = int(outlier_frac * n)
    if n_out:
        obs[:n_out, :2] += rng.uniform(20, 60, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return pts, obs.astype(np.float32), T_true


def test_pose_optimize_converges(rng):
    pts, obs, T_true = make_pnp_problem(rng, noise=0.2)
    n = pts.shape[0]
    res = pose_optimize(
        jnp.eye(4, dtype=jnp.float32),
        jnp.asarray(pts),
        jnp.asarray(obs),
        jnp.ones(n, jnp.float32),
        jnp.ones(n, bool),
        jnp.ones(n, bool),
        CAM,
    )
    err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T_true)) @ res.T_cw))
    assert np.linalg.norm(err) < 5e-3
    assert int(res.num_inliers) > 0.95 * n


def test_pose_optimize_rejects_outliers(rng):
    pts, obs, T_true = make_pnp_problem(rng, noise=0.2, outlier_frac=0.3)
    n = pts.shape[0]
    res = pose_optimize(
        jnp.eye(4, dtype=jnp.float32),
        jnp.asarray(pts),
        jnp.asarray(obs),
        jnp.ones(n, jnp.float32),
        jnp.ones(n, bool),
        jnp.ones(n, bool),
        CAM,
    )
    err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T_true)) @ res.T_cw))
    assert np.linalg.norm(err) < 1e-2
    inl = np.asarray(res.inliers)
    assert inl[:60].mean() < 0.1  # outliers gated
    assert inl[60:].mean() > 0.9


def test_pose_optimize_mono_only(rng):
    pts, obs, T_true = make_pnp_problem(rng, noise=0.2)
    n = pts.shape[0]
    res = pose_optimize(
        jnp.eye(4, dtype=jnp.float32),
        jnp.asarray(pts),
        jnp.asarray(obs),
        jnp.ones(n, jnp.float32),
        jnp.zeros(n, bool),  # all mono: uR ignored
        jnp.ones(n, bool),
        CAM,
    )
    err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T_true)) @ res.T_cw))
    assert np.linalg.norm(err) < 5e-3
