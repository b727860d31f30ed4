"""Distributed bundle-adjustment reductions over the device mesh.

The reference's bundle adjustment is single-threaded g2o
(perfect/src/Optimizer.cc); its only scale answer is bounded local
windows. Here the normal-equation assembly — the part that is O(num
observations) — is sharded: observations live partitioned over the
``pt`` mesh axis, every shard computes its partial Hessian/gradient
blocks, and one ``psum`` over ICI produces the global reduced system
(the camera-block reduction of the Schur complement; SURVEY.md §2.6
P12). Frame-parallel work (extraction over pending keyframes) shards
over the ``kf`` axis.

This module provides the single-pose case (motion-only BA — the 30 Hz
hot path) as the first distributed kernel; the multi-pose local-BA
Schur solver builds on the same reduction pattern (mapping/ba.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from orb_slam2_ssd_semantic_tpu.config import CameraConfig
from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.ops.linalg import cholesky_solve_small
from orb_slam2_ssd_semantic_tpu.parallel.mesh import PT_AXIS
from orb_slam2_ssd_semantic_tpu.tracking.pose_opt import _residual_jacobian


def pose_hessian_local(T_cw, pts_w, obs, weights, cam: CameraConfig):
    """Partial (6,6) Hessian + (6,) gradient from a shard of observations."""
    e, J, behind = _residual_jacobian(T_cw, pts_w, obs, cam)
    w = (weights * (~behind))[:, None]
    H = jnp.einsum("nki,nk,nkj->ij", J, w * jnp.ones_like(e), J)
    b = -jnp.einsum("nki,nk->i", J, w * e)
    return H, b


def make_distributed_pose_step(mesh, cam: CameraConfig):
    """Jitted one-GN-step update with observation sharding over `pt`.

    Inputs: T_cw replicated; pts_w/obs/weights sharded on dim 0.
    Each shard reduces its partial normal equations; psum over ICI; the
    tiny 6x6 solve is computed redundantly on every device (cheaper than
    gathering); output pose is replicated.
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(PT_AXIS), P(PT_AXIS), P(PT_AXIS)),
        out_specs=P(),
    )
    def step(T_cw, pts_w, obs, weights):
        H, b = pose_hessian_local(T_cw, pts_w, obs, weights, cam)
        H = jax.lax.psum(H, PT_AXIS)
        b = jax.lax.psum(b, PT_AXIS)
        H = H + 1e-6 * jnp.eye(6, dtype=H.dtype)
        dx = cholesky_solve_small(H, b)
        return se3.se3_exp(dx) @ T_cw

    return jax.jit(step)


def make_distributed_global_ba(mesh, cam: CameraConfig, cfg, cg_iters: int = 20):
    """Distributed full-map bundle adjustment: the implicit-Schur PCG of
    mapping/global_ba.py with the M observation slots sharded over the
    ``pt`` mesh axis.

    Poses/points/validity are replicated (they are small: F*16 + P*3
    floats); the per-observation Jacobian blocks — the O(M) memory and
    FLOPs — stay shard-local, and each segment-sum into the (F,6,6) /
    (P,3,3) / (F,6) / (P,3) aggregates becomes a local scatter + one
    psum over ICI. Every device then runs the identical small PCG
    redundantly (cheaper than gathering). This is the 'distributed BA
    via Schur complement, camera-block reduction with psum' design of
    SURVEY.md §2.6 P12 / §7 stage 5.

    The returned function takes a GlobalBAProblem whose obs_* arrays are
    device_put with PartitionSpec(PT_AXIS) on dim 0 (pad M to a multiple
    of the mesh size) and returns a GlobalBAResult with replicated
    poses/points and sharded per-observation inlier/chi2.
    """
    from orb_slam2_ssd_semantic_tpu.mapping.global_ba import (
        GlobalBAProblem,
        global_ba_core,
    )

    obs_spec = GlobalBAProblem(
        T_cw=P(), fixed=P(), points=P(), point_valid=P(),
        obs_kf=P(PT_AXIS), obs_pt=P(PT_AXIS), obs_uvr=P(PT_AXIS),
        inv_sigma2=P(PT_AXIS), is_stereo=P(PT_AXIS), obs_valid=P(PT_AXIS),
    )
    from orb_slam2_ssd_semantic_tpu.mapping.global_ba import GlobalBAResult

    out_spec = GlobalBAResult(T_cw=P(), points=P(), inlier=P(PT_AXIS), chi2=P(PT_AXIS))

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(obs_spec,), out_specs=out_spec,
    )
    def run(prob):
        return global_ba_core(prob, cam, cfg, cg_iters, axis_name=PT_AXIS)

    return jax.jit(run)
