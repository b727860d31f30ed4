"""Dense occupancy mapping: log-odds updates, raycast carving, ground
split, persistence."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_ssd_semantic_tpu.config import CameraConfig, DenseMapConfig
from orb_slam2_ssd_semantic_tpu.dense.occupancy import (
    VoxelGrid,
    empty_grid,
    insert_scan,
    load_grid,
    occupancy_prob,
    occupied_centers,
    occupied_mask,
    save_grid,
)
from orb_slam2_ssd_semantic_tpu.dense.pointcloud import keyframe_cloud, split_ground


CFG = DenseMapConfig()


def small_grid():
    return empty_grid(extent=(4.0, 4.0, 4.0), resolution=0.05, origin=(-2.0, -2.0, -2.0))


def test_insert_scan_marks_endpoint_occupied():
    grid = small_grid()
    origin = jnp.zeros(3)
    pts = jnp.asarray([[0.0, 0.0, 1.5]] * 8, jnp.float32)
    valid = jnp.ones(8, bool)
    for _ in range(3):
        grid = insert_scan(grid, origin, pts, valid, cfg=CFG)
    p = np.asarray(occupancy_prob(grid))
    vx = tuple(int(v) for v in np.floor((np.array([0, 0, 1.5]) + 2.0) / 0.05))
    assert p[vx] > 0.8
    # Free space along the ray is carved down.
    mid = tuple(int(v) for v in np.floor((np.array([0, 0, 0.75]) + 2.0) / 0.05))
    assert p[mid] < 0.3


def test_insert_scan_clamping():
    grid = small_grid()
    origin = jnp.zeros(3)
    pts = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    valid = jnp.ones(1, bool)
    for _ in range(50):
        grid = insert_scan(grid, origin, pts, valid, cfg=CFG)
    p = np.asarray(occupancy_prob(grid))
    assert p.max() <= CFG.clamp_max + 1e-5
    assert p.min() >= CFG.clamp_min - 1e-5


def test_carve_only_rays_do_not_occupy():
    grid = small_grid()
    origin = jnp.zeros(3)
    pts = jnp.asarray([[0.0, 0.0, 1.5]], jnp.float32)
    valid = jnp.ones(1, bool)
    carve = jnp.ones(1, bool)
    for _ in range(5):
        grid = insert_scan(grid, origin, pts, valid, carve_only=carve, cfg=CFG)
    assert not bool(occupied_mask(grid, CFG).any())


def test_dynamic_object_decays():
    """A voxel hit in early scans then seen-through later loses occupancy —
    the probabilistic-map behavior the reference relies on to erase
    walked-through people (octomap miss updates)."""
    grid = small_grid()
    origin = jnp.zeros(3)
    obj = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    wall = jnp.asarray([[0.0, 0.0, 1.9]], jnp.float32)
    v = jnp.ones(1, bool)
    for _ in range(3):
        grid = insert_scan(grid, origin, obj, v, cfg=CFG)
    vx = tuple(int(c) for c in np.floor((np.array([0, 0, 1.0]) + 2.0) / 0.05))
    assert np.asarray(occupancy_prob(grid))[vx] > 0.8
    for _ in range(8):
        grid = insert_scan(grid, origin, wall, v, cfg=CFG)
    assert np.asarray(occupancy_prob(grid))[vx] < 0.5


def test_color_accumulation():
    grid = small_grid()
    origin = jnp.zeros(3)
    pts = jnp.asarray([[0.5, 0.5, 1.0]], jnp.float32)
    colors = jnp.asarray([[200.0, 100.0, 50.0]])
    for _ in range(4):
        grid = insert_scan(grid, origin, pts, jnp.ones(1, bool), colors=colors, cfg=CFG)
    centers, cols = occupied_centers(grid, CFG)
    assert len(centers) == 1
    np.testing.assert_allclose(cols[0], [200, 100, 50], atol=1e-3)
    np.testing.assert_allclose(centers[0], [0.525, 0.525, 1.025], atol=0.051)


def test_save_load_roundtrip(tmp_path):
    grid = small_grid()
    grid = insert_scan(
        grid, jnp.zeros(3), jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
        jnp.ones(1, bool), cfg=CFG,
    )
    path = str(tmp_path / "map.npz")
    save_grid(path, grid, CFG)
    g2 = load_grid(path)
    np.testing.assert_allclose(np.asarray(grid.log_odds), np.asarray(g2.log_odds))


def test_keyframe_cloud_gates():
    cam = CameraConfig()
    depth = np.full((480, 640), 2.0, np.float32)
    depth[:10, :] = 0.1  # too close
    depth[-10:, :] = 6.0  # too far
    pts, valid = keyframe_cloud(jnp.asarray(depth), jnp.eye(4), cam, CFG)
    v = np.asarray(valid)
    p = np.asarray(pts)[v]
    assert v.sum() > 1000
    assert np.all(np.linalg.norm(p, axis=1) < 5.0)
    zs = p[:, 2]
    assert np.all((zs > CFG.cloud_min_depth) & (zs < CFG.cloud_max_depth))


def test_split_ground():
    rng = np.random.default_rng(0)
    # Floor at y=1.5 plus scattered objects above it.
    floor = np.stack(
        [rng.uniform(-2, 2, 3000), np.full(3000, 1.5), rng.uniform(0, 4, 3000)], -1
    )
    objects = np.stack(
        [rng.uniform(-2, 2, 800), rng.uniform(-0.5, 1.2, 800), rng.uniform(0, 4, 800)], -1
    )
    pts = jnp.asarray(np.concatenate([floor, objects]).astype(np.float32))
    valid = jnp.ones(3800, bool)
    is_ground, plane = split_ground(pts, valid, jax.random.PRNGKey(0), 1, CFG)
    g = np.asarray(is_ground)
    assert g[:3000].mean() > 0.95
    assert g[3000:].mean() < 0.1
    assert abs(float(plane[3]) + 1.5) < 0.05
