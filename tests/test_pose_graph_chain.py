"""Chain-preconditioned essential-graph solver (pose_graph.py PCR path).

The reference distributes a loop correction over the whole keyframe
graph with g2o's sparse solver (perfect/src/Optimizer.cc:995-1308). Our
matrix-free PCG needs a preconditioner that moves information farther
than one hop per CG step to converge on long chains; these tests pin

1. parity of the PCR-preconditioned PCG against the dense solve on a
   drifted loop (the VERDICT r2 #3 parity criterion, now with the chain
   preconditioner and a non-trivial chain_perm), and
2. convergence on a diameter-1024 chain with per-node jitter at a CG
   depth (12) where a block-Jacobi preconditioner cannot possibly
   converge (information travels <= cg hops/iteration), i.e. the exact
   failure mode recorded in BENCH_BA_r03.json for the 10k-KF regime.
"""

import jax.numpy as jnp
import numpy as np

from orb_slam2_ssd_semantic_tpu.geometry import se3
from orb_slam2_ssd_semantic_tpu.mapping.pose_graph import (
    PoseGraph,
    optimize_pose_graph,
    optimize_pose_graph_pcg,
)


def _circle_poses(F, radius=3.0):
    T = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    for f in range(F):
        a = 2 * np.pi * f / F
        xi = np.asarray(
            [radius * np.cos(a), radius * np.sin(a), 0.0, 0.0, 0.0, a],
            np.float32,
        )
        T[f] = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    return T


def _chain_graph(T_gt, skip=5, loop_w=500.0):
    F = T_gt.shape[0]
    ei = np.concatenate(
        [np.arange(F - 1), np.arange(F - skip), np.asarray([0])]
    ).astype(np.int32)
    ej = np.concatenate(
        [np.arange(1, F), np.arange(skip, F), np.asarray([F - 1])]
    ).astype(np.int32)
    Tji = np.einsum(
        "eij,ejk->eik", T_gt[ej], np.linalg.inv(T_gt[ei])
    ).astype(np.float32)
    w = np.concatenate(
        [np.full(F - 1, 100.0), np.full(F - skip, 30.0), np.asarray([loop_w])]
    ).astype(np.float32)
    return PoseGraph(
        jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(Tji),
        jnp.asarray(w), jnp.ones((len(ei),), bool),
    )


def test_pcr_pcg_matches_dense_with_permuted_chain():
    rng = np.random.default_rng(3)
    F = 48
    T_gt = _circle_poses(F)
    graph = _chain_graph(T_gt)
    # Accumulating drift seed.
    T0 = T_gt.copy()
    drift = np.eye(4, dtype=np.float32)
    for f in range(1, F):
        step = np.asarray(
            se3.se3_exp(jnp.asarray(rng.normal(0, 0.01, 6).astype(np.float32)))
        )
        drift = step @ drift
        T0[f] = drift @ T_gt[f]

    valid = jnp.ones((F,), bool)
    T_dense = np.asarray(optimize_pose_graph(jnp.asarray(T0), valid, graph))
    # chain_perm = arange here (slots inserted in order), but exercise the
    # permutation plumbing explicitly.
    T_pcg = np.asarray(
        optimize_pose_graph_pcg(
            jnp.asarray(T0), valid, graph, cg_iters=25,
            chain_perm=jnp.arange(F, dtype=jnp.int32),
        )
    )
    dt = np.linalg.norm(T_pcg[:, :3, 3] - T_dense[:, :3, 3], axis=-1)
    assert dt.max() < 1e-3, dt.max()
    np.testing.assert_allclose(T_pcg[0], T0[0], atol=1e-5)


def test_pcr_pcg_converges_on_long_chain_at_shallow_cg():
    rng = np.random.default_rng(7)
    F = 1024
    T_gt = _circle_poses(F, radius=6.0)
    graph = _chain_graph(T_gt)
    # Per-node independent jitter — the hard case for one-hop
    # preconditioners: correcting node k needs information from the
    # gauge anchor a full diameter away.
    T0 = T_gt.copy()
    for f in range(1, F):
        xi = rng.normal(0, 0.05, 6).astype(np.float32)
        xi[3:] *= 0.2
        T0[f] = np.asarray(se3.se3_exp(jnp.asarray(xi))) @ T_gt[f]

    valid = jnp.ones((F,), bool)
    T_opt = np.asarray(
        optimize_pose_graph_pcg(
            jnp.asarray(T0), valid, graph, iters=10, cg_iters=12
        )
    )
    err0 = np.linalg.norm(T0[:, :3, 3] - T_gt[:, :3, 3], axis=-1)
    err1 = np.linalg.norm(T_opt[:, :3, 3] - T_gt[:, :3, 3], axis=-1)
    # Median error must collapse (12 CG hops cover ~1% of the diameter;
    # only the chain solve in the preconditioner can do this).
    assert np.median(err1) < 0.1 * np.median(err0), (
        np.median(err0), np.median(err1)
    )
    assert err1.max() < 0.5 * err0.max()


def test_pcr_pcg_scrambled_slot_order():
    """Slots permuted (as after slot reuse): the chain_perm argument must
    recover the same solution as the identity layout."""
    rng = np.random.default_rng(11)
    F = 64
    T_gt = _circle_poses(F)
    graph = _chain_graph(T_gt)
    T0 = T_gt.copy()
    for f in range(1, F):
        T0[f] = (
            np.asarray(
                se3.se3_exp(jnp.asarray(rng.normal(0, 0.03, 6).astype(np.float32)))
            )
            @ T_gt[f]
        )
    perm = rng.permutation(F).astype(np.int32)  # slot = perm[rank]
    # Re-index everything into scrambled slot space.
    ei_s = perm[np.asarray(graph.edge_i)]
    ej_s = perm[np.asarray(graph.edge_j)]
    graph_s = PoseGraph(
        jnp.asarray(ei_s), jnp.asarray(ej_s), graph.T_ji, graph.weight,
        graph.valid,
    )
    T0_s = np.empty_like(T0)
    T0_s[perm] = T0  # slot perm[k] holds chain rank k
    fixed = jnp.arange(F) == int(perm[0])
    T_s = np.asarray(
        optimize_pose_graph_pcg(
            jnp.asarray(T0_s), jnp.ones((F,), bool), graph_s, fixed=fixed,
            cg_iters=25, chain_perm=jnp.asarray(perm),
        )
    )
    T_ref = np.asarray(
        optimize_pose_graph_pcg(
            jnp.asarray(T0), jnp.ones((F,), bool), graph, cg_iters=25,
        )
    )
    dt = np.linalg.norm(T_s[perm][:, :3, 3] - T_ref[:, :3, 3], axis=-1)
    assert dt.max() < 1e-3, dt.max()


def test_pcg_lowers_with_true_f32_contractions():
    """On TPU the default f32 dot multiplies in bf16 (~8 cm of error on
    20 m translations — enough to diverge the 10k-node solve on-chip
    while CPU tests pass bit-identical). Pin at the StableHLO level that
    the large-graph solver's contractions carry HIGHEST operand
    precision so the regression can't silently return."""
    import re

    import jax

    F = 16
    T_gt = _circle_poses(F)
    graph = _chain_graph(T_gt)
    lowered = jax.jit(
        lambda T: optimize_pose_graph_pcg(
            T, jnp.ones((F,), bool), graph, iters=2, cg_iters=3
        )
    ).lower(jnp.asarray(T_gt))
    txt = lowered.as_text()
    dots = re.findall(r"stablehlo\.dot_general.*", txt)
    assert dots, "expected dot_general ops in the lowered solver"
    weak = [d for d in dots if "HIGHEST" not in d]
    assert not weak, (
        f"{len(weak)}/{len(dots)} contractions lowered at default "
        f"precision, e.g.:\n{weak[0][:200]}"
    )
