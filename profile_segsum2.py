"""In-program (scan-loop) segment-sum costs on the TPU (not a test)."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time

import numpy as np
import jax
import jax.numpy as jnp

M, P, F, K = 1_280_000, 200_000, 10_000, 128
rng = np.random.default_rng(0)
pt_sorted = jnp.asarray(np.sort(rng.integers(0, P, M)).astype(np.int32))
pt_rand = jnp.asarray(rng.integers(0, P, M).astype(np.int32))
v3 = jnp.asarray(rng.normal(size=(3, M)).astype(np.float32))
N_IT = 20


def bench(name, body):
    @jax.jit
    def run(v):
        def step(c, _):
            out = body(v * (1.0 + 1e-6 * c))
            return c + out.ravel()[0], None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=N_IT)
        return c

    np.asarray(run(v3))
    t0 = time.perf_counter()
    np.asarray(run(v3))
    dt = (time.perf_counter() - t0) / N_IT
    print(f"{name:32s}{dt * 1e3:9.2f} ms/iter")


bench("scatter (3,P) rand idx", lambda v: jnp.zeros((3, P)).at[:, pt_rand].add(v))
bench("scatter (3,P) sorted idx", lambda v: jnp.zeros((3, P)).at[:, pt_sorted].add(v))
bench("segsum sorted hint", lambda v: jax.ops.segment_sum(
    v.T, pt_sorted, P, indices_are_sorted=True))
bench("kf reshape-sum", lambda v: v.reshape(3, F, K).sum(-1))
bench("gather (3,M) from (3,P)", lambda v: (
    jnp.zeros((3, P)).at[:, :1].add(v[:, :1]))[:, pt_rand])
