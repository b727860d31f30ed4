"""Distributed BA over the virtual 8-device CPU mesh.

Validates the scale-out path of SURVEY.md §2.6 P12 / §7 stage 5: the
observation-sharded implicit-Schur global BA must reproduce the
single-device solution bit-for-nearly (same math, psum-reduced), and
the motion-only distributed GN step must hold a perfect seed fixed.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from orb_slam2_ssd_semantic_tpu.config import CameraConfig, OptimizerConfig
from orb_slam2_ssd_semantic_tpu.mapping.global_ba import global_bundle_adjust
from orb_slam2_ssd_semantic_tpu.parallel.dist_ba import (
    make_distributed_global_ba,
    make_distributed_pose_step,
)
from orb_slam2_ssd_semantic_tpu.parallel.mesh import PT_AXIS, make_mesh

from tests.test_global_ba import CAM, build_problem, pose_errors


def _pad_to(prob, multiple):
    M = prob.obs_kf.shape[0]
    pad = (-M) % multiple
    if pad == 0:
        return prob
    z = lambda a, fill=0: jnp.concatenate(
        [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)]
    )
    return prob._replace(
        obs_kf=z(prob.obs_kf),
        obs_pt=z(prob.obs_pt),
        obs_uvr=z(prob.obs_uvr),
        inv_sigma2=z(prob.inv_sigma2, 1),
        is_stereo=z(prob.is_stereo),
        obs_valid=z(prob.obs_valid),
    )


def test_distributed_global_ba_matches_single_device(rng):
    n_dev = len(jax.devices())
    assert n_dev >= 8
    prob, T_gt, pts_gt = build_problem(rng, F=10, P=256)
    prob = _pad_to(prob, n_dev)
    cfg = OptimizerConfig()

    ref = global_bundle_adjust(prob, CAM, cfg, cg_iters=25)

    mesh = make_mesh(n_kf=1, n_pt=n_dev)
    sh = NamedSharding(mesh, P(PT_AXIS))
    rep = NamedSharding(mesh, P())
    prob_sharded = prob._replace(
        T_cw=jax.device_put(prob.T_cw, rep),
        fixed=jax.device_put(prob.fixed, rep),
        points=jax.device_put(prob.points, rep),
        point_valid=jax.device_put(prob.point_valid, rep),
        obs_kf=jax.device_put(prob.obs_kf, sh),
        obs_pt=jax.device_put(prob.obs_pt, sh),
        obs_uvr=jax.device_put(prob.obs_uvr, sh),
        inv_sigma2=jax.device_put(prob.inv_sigma2, sh),
        is_stereo=jax.device_put(prob.is_stereo, sh),
        obs_valid=jax.device_put(prob.obs_valid, sh),
    )
    run = make_distributed_global_ba(mesh, CAM, cfg, cg_iters=25)
    out = run(prob_sharded)

    # Both converge to ground truth ...
    assert pose_errors(out.T_cw, T_gt).max() < 0.01
    # ... and to each other (identical math, summation order aside).
    dT = np.abs(np.asarray(out.T_cw) - np.asarray(ref.T_cw)).max()
    assert dT < 5e-3, f"distributed vs single-device pose drift {dT}"
    agree = (np.asarray(out.inlier) == np.asarray(ref.inlier)).mean()
    assert agree > 0.999


def test_distributed_pose_step_fixed_point(rng):
    n_dev = len(jax.devices())
    mesh = make_mesh(n_kf=1, n_pt=n_dev)
    n = 64 * n_dev
    pts = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(2, 5, n)], -1
    ).astype(np.float32)
    u = CAM.fx * pts[:, 0] / pts[:, 2] + CAM.cx
    v = CAM.fy * pts[:, 1] / pts[:, 2] + CAM.cy
    ur = u - CAM.depth_bf / pts[:, 2]
    obs = np.stack([u, v, ur], -1).astype(np.float32)
    sh = NamedSharding(mesh, P(PT_AXIS))
    step = make_distributed_pose_step(mesh, CAM)
    T = step(
        jnp.eye(4, dtype=jnp.float32),
        jax.device_put(jnp.asarray(pts), sh),
        jax.device_put(jnp.asarray(obs), sh),
        jax.device_put(jnp.ones((n,), jnp.float32), sh),
    )
    assert float(jnp.abs(T - jnp.eye(4)).max()) < 1e-3


def test_sharded_occupancy_matches_single_device(rng):
    """X-slab-sharded occupancy insertion (parallel/dist_occupancy.py)
    must equal the single-device grid voxel-for-voxel: each shard sees
    every (replicated) ray and rasterizes its own slab, so slab-crossing
    rays need no halo exchange (VERDICT r2 #5)."""
    from orb_slam2_ssd_semantic_tpu.config import DenseMapConfig
    from orb_slam2_ssd_semantic_tpu.dense.occupancy import empty_grid, insert_scan
    from orb_slam2_ssd_semantic_tpu.parallel.dist_occupancy import (
        make_sharded_grid,
        make_sharded_insert,
    )

    n_dev = min(8, len(jax.devices()))
    mesh = make_mesh(n_kf=1, n_pt=n_dev)
    cfg = DenseMapConfig(resolution=0.1, max_ray_steps=64)
    dims = (64, 32, 32)  # 6.4 x 3.2 x 3.2 m at 0.1 m
    origin = (0.0, 0.0, 0.0)

    lo, meta = make_sharded_grid(mesh, dims, cfg.resolution, origin)
    insert = make_sharded_insert(mesh, cfg, dims, origin)

    ref = empty_grid(extent=(6.4, 3.2, 3.2), resolution=0.1, origin=origin)

    N = 256
    for scan in range(3):
        o = np.asarray([0.4 + 2.2 * scan, 1.6, 1.6], np.float32)
        pts = np.stack([
            rng.uniform(0.2, 6.2, N), rng.uniform(0.2, 3.0, N),
            rng.uniform(0.2, 3.0, N),
        ], -1).astype(np.float32)
        valid = rng.uniform(size=N) > 0.1
        carve = rng.uniform(size=N) > 0.8
        lo = insert(lo, jnp.asarray(o), jnp.asarray(pts),
                    jnp.asarray(valid), jnp.asarray(carve))
        ref = insert_scan(ref, jnp.asarray(o), jnp.asarray(pts),
                          jnp.asarray(valid), carve_only=jnp.asarray(carve),
                          cfg=cfg)

    np.testing.assert_allclose(
        np.asarray(lo), np.asarray(ref.log_odds), atol=1e-5
    )
    assert float(np.abs(np.asarray(lo)).sum()) > 0  # something was mapped


def test_distributed_ba_communicates_only_reduced_system(rng):
    """Structural scaling proof (VERDICT r2 #5): the compiled HLO of the
    distributed GBA must contain collectives ONLY at reduced-system
    sizes (pose/point aggregate blocks and CG scalars) — never at the
    per-observation size M. If a refactor accidentally all-gathered the
    observation arrays, scaling would die silently; this pins it at the
    compiler-output level."""
    import re

    from orb_slam2_ssd_semantic_tpu.parallel.dist_ba import (
        make_distributed_global_ba,
    )

    n_dev = len(jax.devices())
    assert n_dev >= 8
    prob, T_gt, pts_gt = build_problem(rng, F=10, P=256)
    prob = _pad_to(prob, n_dev)
    M = int(prob.obs_kf.shape[0])

    mesh = make_mesh(n_kf=1, n_pt=n_dev)
    sh = NamedSharding(mesh, P(PT_AXIS))
    rep = NamedSharding(mesh, P())
    prob_sharded = prob._replace(
        T_cw=jax.device_put(prob.T_cw, rep),
        fixed=jax.device_put(prob.fixed, rep),
        points=jax.device_put(prob.points, rep),
        point_valid=jax.device_put(prob.point_valid, rep),
        obs_kf=jax.device_put(prob.obs_kf, sh),
        obs_pt=jax.device_put(prob.obs_pt, sh),
        obs_uvr=jax.device_put(prob.obs_uvr, sh),
        inv_sigma2=jax.device_put(prob.inv_sigma2, sh),
        is_stereo=jax.device_put(prob.is_stereo, sh),
        obs_valid=jax.device_put(prob.obs_valid, sh),
    )
    run = make_distributed_global_ba(mesh, CAM, OptimizerConfig(), cg_iters=5)
    hlo = run.lower(prob_sharded).compile().as_text()

    # Every all-reduce operand must be far smaller than the observation
    # count (the reduced system: (F,6,6)=360, (P,3,3)=2304, scalars).
    sizes = []
    for m in re.finditer(r"all-reduce[^=]*=\s*\(?([a-z0-9_]+)\[([0-9,]*)\]", hlo):
        dims = m.group(2)
        n = 1
        for d in dims.split(",") if dims else []:
            if d:
                n *= int(d)
        sizes.append(n)
    assert sizes, "no collectives found — is the reduction still sharded?"
    per_shard_M = M // n_dev
    assert max(sizes) < per_shard_M, (
        f"collective of {max(sizes)} elements >= per-shard obs count "
        f"{per_shard_M}: observation-sized communication detected"
    )


def test_sharded_bow_detect_matches_single_device(rng):
    """kf-sharded loop-candidate retrieval (parallel/dist_bow.py) must
    return the same candidates as place_recognition.detect_candidates:
    shard-local top-k + a C-per-device gather is exact because the
    global top-C is contained in the union of local top-Cs."""
    from orb_slam2_ssd_semantic_tpu.mapping import place_recognition as pr
    from orb_slam2_ssd_semantic_tpu.parallel.dist_bow import (
        make_sharded_bow_vectors,
        make_sharded_detect,
    )
    from orb_slam2_ssd_semantic_tpu.parallel.mesh import kf_sharding

    n_dev = min(8, len(jax.devices()))
    mesh = make_mesh(n_kf=n_dev, n_pt=1)
    F, N = 4 * n_dev, 64

    desc = jnp.asarray(
        rng.integers(0, 2**32, (F, N, 8), dtype=np.uint32), jnp.uint32
    )
    valid = jnp.asarray(rng.uniform(size=(F, N)) > 0.2)
    build = make_sharded_bow_vectors(mesh, pr.bow_vector)
    sh = kf_sharding(mesh)
    db = build(jax.device_put(desc, sh), jax.device_put(valid, sh))
    db_ref = jax.vmap(pr.bow_vector)(desc, valid)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref), atol=1e-5)

    query = db_ref[3] * 0.9 + db_ref[7] * 0.1
    query = query / jnp.linalg.norm(query)
    db_valid = jnp.asarray(rng.uniform(size=F) > 0.1)
    exclude = jnp.zeros((F,), bool).at[3].set(True)
    min_score = jnp.float32(0.05)

    ids_r, s_r, ok_r = pr.detect_candidates(
        query, db_ref, db_valid, exclude, min_score, max_candidates=4
    )
    detect = make_sharded_detect(mesh, max_candidates=4)
    ids_d, s_d, ok_d = detect(
        query, jax.device_put(db, sh), jax.device_put(db_valid, sh),
        jax.device_put(exclude, sh), min_score,
    )
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(s_r), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids_d), np.asarray(ids_r))
    np.testing.assert_array_equal(np.asarray(ok_d), np.asarray(ok_r))
