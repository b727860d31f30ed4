"""Ablate the global-BA CG matvec cost on the TPU (not a test)."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time

import numpy as np
import jax
import jax.numpy as jnp

M, P, F, K = 1_280_000, 200_000, 10_000, 128
rng = np.random.default_rng(0)
pt_slot = jnp.asarray(rng.integers(0, P, M).astype(np.int32))
perm = jnp.asarray(np.argsort(np.asarray(pt_slot)).astype(np.int32))
pt_sorted = pt_slot[perm]
kf_sorted = jnp.asarray((np.asarray(perm) // K).astype(np.int32))
B = jnp.asarray(rng.normal(size=(18, M)).astype(np.float32))
Hpp_inv = jnp.asarray(rng.normal(size=(3, 3, P)).astype(np.float32))
Hcc = jnp.asarray(rng.normal(size=(F, 6, 6)).astype(np.float32))
N_IT = 20


def bench(name, body):
    @jax.jit
    def run(x0):
        def step(x, _):
            out = body(x)
            return out, None
        x, _ = jax.lax.scan(step, x0, None, length=N_IT)
        return x

    x0 = jnp.asarray(rng.normal(size=(6, F)).astype(np.float32))
    np.asarray(run(x0))[:1]
    t0 = time.perf_counter()
    np.asarray(run(x0))[:1]
    dt = (time.perf_counter() - t0) / N_IT
    print(f"{name:36s}{dt * 1e3:9.2f} ms/matvec")


def full(x):
    xg = [x[i][kf_sorted] for i in range(6)]
    t_j = [sum(B[i * 3 + j] * xg[i] for i in range(6)) for j in range(3)]
    t_p = jax.ops.segment_sum(
        jnp.stack(t_j).T, pt_sorted, P, indices_are_sorted=True).T
    y_p = jnp.einsum("ijp,jp->ip", Hpp_inv, t_p)
    yg = [y_p[j][pt_slot] for j in range(3)]
    u_i = [sum(B[i * 3 + j] * yg[j] for j in range(3)) for i in range(6)]
    u = jnp.stack(u_i).reshape(6, F, K).sum(-1)
    return jnp.einsum("fij,jf->if", Hcc, x) - u


def no_segsum(x):
    xg = [x[i][kf_sorted] for i in range(6)]
    t_j = [sum(B[i * 3 + j] * xg[i] for i in range(6)) for j in range(3)]
    t_p = jnp.stack(t_j)[:, : P * (M // P)].reshape(3, P, M // P).sum(-1)  # fake reduce
    y_p = jnp.einsum("ijp,jp->ip", Hpp_inv, t_p)
    yg = [y_p[j][pt_slot] for j in range(3)]
    u_i = [sum(B[i * 3 + j] * yg[j] for j in range(3)) for i in range(6)]
    u = jnp.stack(u_i).reshape(6, F, K).sum(-1)
    return jnp.einsum("fij,jf->if", Hcc, x) - u


def no_gathers(x):
    xg = [jnp.broadcast_to(x[i][:1], (M,)) + 0.0 for i in range(6)]
    t_j = [sum(B[i * 3 + j] * xg[i] for i in range(6)) for j in range(3)]
    t_p = jax.ops.segment_sum(
        jnp.stack(t_j).T, pt_sorted, P, indices_are_sorted=True).T
    y_p = jnp.einsum("ijp,jp->ip", Hpp_inv, t_p)
    yg = [jnp.broadcast_to(y_p[j][:1], (M,)) + 0.0 for j in range(3)]
    u_i = [sum(B[i * 3 + j] * yg[j] for j in range(3)) for i in range(6)]
    u = jnp.stack(u_i).reshape(6, F, K).sum(-1)
    return jnp.einsum("fij,jf->if", Hcc, x) - u


def muls_only(x):
    xg = [jnp.broadcast_to(x[i][:1], (M,)) + 0.0 for i in range(6)]
    t_j = [sum(B[i * 3 + j] * xg[i] for i in range(6)) for j in range(3)]
    u_i = [sum(B[i * 3 + j] * t_j[j] for j in range(3)) for i in range(6)]
    u = jnp.stack(u_i).reshape(6, F, K).sum(-1)
    return jnp.einsum("fij,jf->if", Hcc, x) - u


def hcc_only(x):
    return jnp.einsum("fij,jf->if", Hcc, x)


bench("full matvec", full)
bench("no segsum (fake reduce)", no_segsum)
bench("no gathers", no_gathers)
bench("muls only", muls_only)
bench("Hcc apply only", hcc_only)
