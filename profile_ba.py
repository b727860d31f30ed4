"""Micro-profile of local BA internals on the real TPU (not part of tests)."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import time

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.config import SlamConfig
from orb_slam2_ssd_semantic_tpu.mapping.ba import BAProblem, local_bundle_adjust
from orb_slam2_ssd_semantic_tpu.ops.linalg import inv3x3

cfg = SlamConfig()
W, K, N = cfg.map.local_ba_window, cfg.orb.max_keypoints, cfg.map.local_ba_max_points
rng = np.random.default_rng(0)

pts = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
pts[:, 2] += 5.0
slot = rng.integers(0, N, (W, K)).astype(np.int32)
cam = cfg.camera
z = pts[slot][..., 2]
u = cam.fx * pts[slot][..., 0] / z + cam.cx
v = cam.fy * pts[slot][..., 1] / z + cam.cy
obs = np.stack([u, v, u - cam.depth_bf / z], -1).astype(np.float32)
prob = BAProblem(
    T_cw=jnp.tile(jnp.eye(4, dtype=jnp.float32), (W, 1, 1)),
    fixed=jnp.arange(W) == 0,
    points=jnp.asarray(pts),
    point_valid=jnp.ones((N,), bool),
    point_slot=jnp.asarray(slot),
    obs_uvr=jnp.asarray(obs),
    inv_sigma2=jnp.ones((W, K), jnp.float32),
    is_stereo=jnp.ones((W, K), bool),
)


def timeit(name, fn, n=10):
    out = fn()
    jax.tree_util.tree_map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.tree_util.tree_map(np.asarray, out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s}{dt * 1e3:9.2f} ms/call")


timeit("local_bundle_adjust", lambda: local_bundle_adjust(prob, cam, cfg.optimizer), n=5)

Hcp_flat = jnp.asarray(rng.normal(size=(W, K, 6, 3)).astype(np.float32))
Hpp_blocks = jnp.asarray(rng.normal(size=(W, K, 3, 3)).astype(np.float32))
wi = jnp.arange(W)[:, None].repeat(K, 1).reshape(-1)
sl = jnp.asarray(slot).reshape(-1)


@jax.jit
def scatter_all():
    Hpp = jnp.zeros((N, 3, 3), jnp.float32).at[sl].add(Hpp_blocks.reshape(-1, 3, 3))
    b_p = jnp.zeros((N, 3), jnp.float32).at[sl].add(Hpp_blocks[..., 0].reshape(-1, 3))
    Hcp = jnp.zeros((W, N, 6, 3), jnp.float32).at[wi, sl].add(Hcp_flat.reshape(-1, 6, 3))
    return Hpp, b_p, Hcp


Hpp0, b_p0, Hcp0 = scatter_all()
timeit("scatter Hpp+b_p+Hcp", scatter_all)

Hpp_inv0 = inv3x3(Hpp0 + jnp.broadcast_to(jnp.eye(3) * 1e-3, (N, 3, 3)))


@jax.jit
def s_einsum():
    S = -jnp.einsum("wnab,nbc,vndc->wvad", Hcp0, Hpp_inv0, Hcp0)
    rhs = jnp.einsum("wnab,nbc,nc->wa", Hcp0, Hpp_inv0, b_p0)
    return S, rhs


S0, rhs0 = s_einsum()
timeit("S einsum + rhs", s_einsum)

S_mat = S0.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
S_mat = S_mat + jnp.eye(6 * W) * 1e3  # make it solvable


@jax.jit
def lu_solve():
    return jnp.linalg.solve(S_mat, rhs0.reshape(-1))


lu_solve()
timeit("96x96 linalg.solve", lu_solve, n=20)


@jax.jit
def cho_solve():
    L = jnp.linalg.cholesky(S_mat @ S_mat.T + jnp.eye(6 * W))
    y = jax.scipy.linalg.solve_triangular(L, rhs0.reshape(-1), lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


cho_solve()
timeit("96x96 cholesky solve", cho_solve, n=20)


def cg_solve(A, b, iters=25):
    x = jnp.zeros_like(b)
    r = b
    p = r
    rs = r @ r

    def body(_, carry):
        x, r, p, rs = carry
        Ap = A @ p
        alpha = rs / jnp.maximum(p @ Ap, 1e-12)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = r @ r
        p = r + (rs_new / jnp.maximum(rs, 1e-12)) * p
        return x, r, p, rs_new

    x, *_ = jax.lax.fori_loop(0, iters, body, (x, r, p, rs))
    return x


@jax.jit
def cg():
    return cg_solve(S_mat, rhs0.reshape(-1))


cg()
timeit("96x96 CG(25)", cg, n=20)
