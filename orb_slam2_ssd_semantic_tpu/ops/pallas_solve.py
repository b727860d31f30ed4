"""Fused small dense SPD solve as one Pallas TPU kernel.

The local BA's reduced camera system is a damped SPD matrix of ~6W <=
~128 unknowns (mapping/ba.py). `jnp.linalg.solve` lowers to an LU
factorization of ~n sequential XLA steps — 0.57 ms for n=108 on v5e,
~65% of every Gauss-Newton iteration (MFU_r05 finding; VERDICT r4 next
#7). This kernel runs Gauss-Jordan elimination entirely inside one
Pallas program: n in-VMEM rank-1 updates with zero kernel-launch
overhead, ~30 us for the same system.

No pivoting: the input must be symmetric positive definite (the BA
system carries relative diagonal damping, ba.py:310-316), where
elimination pivots are Schur-complement diagonals — strictly positive,
no row exchanges needed (the same argument that makes Cholesky
pivot-free).

Padding: the system is padded to 128 with identity diagonal; padded
rows solve to b=0 harmlessly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 128


def use_pallas() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _gj_kernel(a_ref, b_ref, x_ref, *, n: int):
    # Roll-systolic Gauss-Jordan: the pivot always sits at (0, 0), so
    # every step uses STATIC row/column slices (Mosaic has no
    # dynamic_slice on loop-carried values, and masked-reduction row
    # extraction costs ~4 full-matrix reductions per step — measured
    # 0.51 ms, no better than LU). After each elimination the matrix
    # rolls up-left by one (b rolls up), so after exactly PAD steps
    # every row/column returns to its original position with A ~ I and
    # b = x. The padded identity diagonal supplies harmless pivots for
    # the wraparound steps beyond n.
    del n  # always PAD steps: the wraparound restores row order
    is_row0 = jax.lax.broadcasted_iota(jnp.int32, (PAD, PAD), 0) == 0
    is_row0_1 = jax.lax.broadcasted_iota(jnp.int32, (PAD, 1), 0) == 0

    def body(_, carry):
        a, b = carry
        # All (1, 1)-shaped, never scalar: a scalar extraction forces a
        # vector->scalar-unit round trip that stalls every iteration.
        inv_p = 1.0 / a[0:1, 0:1]  # (1, 1)
        row0 = a[0:1, :] * inv_p  # (1, PAD)
        col0 = a[:, 0:1]  # (PAD, 1)
        b0 = b[0:1, 0:1] * inv_p  # (1, 1)
        a = jnp.where(is_row0, jnp.broadcast_to(row0, (PAD, PAD)),
                      a - col0 * row0)
        b = jnp.where(is_row0_1, jnp.broadcast_to(b0, (PAD, 1)),
                      b - col0 * b0)
        # Roll up-left by one = roll by PAD-1 (pltpu.roll requires a
        # non-negative shift).
        a = pltpu.roll(pltpu.roll(a, PAD - 1, axis=0), PAD - 1, axis=1)
        b = pltpu.roll(b, PAD - 1, axis=0)
        return a, b

    a0 = a_ref[:]
    b0 = b_ref[:]
    _, x = jax.lax.fori_loop(0, PAD, body, (a0, b0))
    x_ref[:] = x


@functools.partial(jax.jit, static_argnames=("interpret",))
def spd_solve(A: jnp.ndarray, b: jnp.ndarray, interpret: bool = False):
    """Solve A x = b for SPD A (n, n), b (n,), n <= 128. Returns x (n,).

    Gauss-Jordan in one fused kernel; see module docstring for why this
    beats the LU path on TPU at this size."""
    n = A.shape[0]
    assert A.shape == (n, n) and b.shape == (n,) and n <= PAD, (A.shape,
                                                                b.shape)
    a_pad = jnp.zeros((PAD, PAD), jnp.float32)
    a_pad = a_pad.at[:n, :n].set(A.astype(jnp.float32))
    # Identity on the padded diagonal keeps the elimination well-posed.
    diag = jnp.arange(PAD) >= n
    a_pad = a_pad + jnp.diag(diag.astype(jnp.float32))
    b_pad = jnp.zeros((PAD, 1), jnp.float32).at[:n, 0].set(
        b.astype(jnp.float32))

    x = pl.pallas_call(
        functools.partial(_gj_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((PAD, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a_pad, b_pad)
    return x[:n, 0]
