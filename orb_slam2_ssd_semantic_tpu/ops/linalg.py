"""Small fixed-size linear algebra as unrolled elementwise graphs.

XLA's generic LU/triangular-solve paths are catastrophically slow for
tiny systems on TPU (a 6x6 jnp.linalg.solve costs ~hundreds of
microseconds of sequential kernel launches; the pose optimizer runs 40
of them per frame). For static sizes the Cholesky factorization unrolls
into a few dozen scalar fused ops — effectively free. These helpers are
used by the GN/LM solvers (pose_opt, ba, dist_ba).
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_solve_small(H: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Solve H x = b for SPD H of small static size n (fully unrolled).

    H: (..., n, n), b: (..., n). Returns (..., n)."""
    n = H.shape[-1]
    # Unrolled Cholesky H = L L^T.
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, eps))
            else:
                L[i][j] = s / L[j][j]
    # Forward substitution L y = b.
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # Back substitution L^T x = y.
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def pcg_solve(A: jnp.ndarray, b: jnp.ndarray, iters: int = 32) -> jnp.ndarray:
    """Jacobi-preconditioned conjugate gradients for one SPD system.

    For mid-size dense SPD systems (e.g. the 6Wx6W reduced camera system
    in local BA) XLA's LU/Cholesky are long sequential dependency chains
    on TPU; CG is `iters` tiny matvecs instead, and Gauss-Newton steps
    tolerate the inexact step. Fixed iteration count keeps it jittable.

    The matvec runs at HIGHEST precision: TPU's default f32 matmul uses
    bf16 multiplies, whose absolute error on the ~1e6-scale normal
    systems exceeds their weak eigenvalues — CG then "converges" to
    noise along those modes (r3 debugging: a 7 mm exact GN step came out
    as 0.55 m). The matvec is tiny; HIGHEST costs nothing here.
    """
    import jax

    prec = jax.lax.Precision.HIGHEST
    dinv = 1.0 / jnp.maximum(jnp.abs(jnp.diagonal(A)), 1e-12)
    x = jnp.zeros_like(b)
    r = b
    z = dinv * r
    p = z
    rz = r @ z

    def body(_, carry):
        x, r, p, rz = carry
        Ap = jnp.matmul(A, p, precision=prec)
        curv = p @ Ap
        # Negative-curvature guard: numerically the Schur complement can
        # come out slightly indefinite (cancellation); clamping curv to a
        # tiny POSITIVE floor would make alpha ~ rz/1e-20 and catapult
        # the iterate to inf (the NaN poses r3 debugging traced to this).
        # CG practice on detecting curv <= 0 is to stop at the current
        # iterate; alpha = 0 freezes x while the recurrences stay finite.
        ok = curv > 1e-12 * jnp.maximum(p @ p, 1e-20)
        alpha = jnp.where(ok, rz / jnp.maximum(curv, 1e-20), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = dinv * r
        rz_new = r @ z
        p = z + (rz_new / jnp.maximum(rz, 1e-20)) * p
        return x, r, p, rz_new

    x, *_ = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
    return x


def inv3x3_cols(A: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Closed-form 3x3 inverse for batch-LAST layout (3, 3, N) -> (3, 3, N).

    The (..., 3, 3) layout of `inv3x3` tiles to (8, 128) on TPU — a 28x
    padding blowup for large N; keeping N minor avoids it entirely."""
    a, b, c = A[0, 0], A[0, 1], A[0, 2]
    d, e, f = A[1, 0], A[1, 1], A[1, 2]
    g, h, i = A[2, 0], A[2, 1], A[2, 2]
    co_a = e * i - f * h
    co_b = c * h - b * i
    co_c = b * f - c * e
    co_d = f * g - d * i
    co_e = a * i - c * g
    co_f = c * d - a * f
    co_g = d * h - e * g
    co_h = b * g - a * h
    co_i = a * e - b * d
    det = a * co_a + b * co_d + c * co_g
    det = jnp.where(jnp.abs(det) < eps, jnp.where(det < 0, -eps, eps), det)
    rows = [[co_a, co_b, co_c], [co_d, co_e, co_f], [co_g, co_h, co_i]]
    inv = jnp.stack([jnp.stack(r, axis=0) for r in rows], axis=0)
    return inv / det[None, None]


def inv3x3(A: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse via the adjugate (avoids XLA's
    generic batched-LU path for (N, 3, 3) stacks)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co_a = e * i - f * h
    co_b = c * h - b * i
    co_c = b * f - c * e
    co_d = f * g - d * i
    co_e = a * i - c * g
    co_f = c * d - a * f
    co_g = d * h - e * g
    co_h = b * g - a * h
    co_i = a * e - b * d
    det = a * co_a + b * co_d + c * co_g
    det = jnp.where(jnp.abs(det) < eps, jnp.where(det < 0, -eps, eps), det)
    inv = jnp.stack(
        [
            jnp.stack([co_a, co_b, co_c], axis=-1),
            jnp.stack([co_d, co_e, co_f], axis=-1),
            jnp.stack([co_g, co_h, co_i], axis=-1),
        ],
        axis=-2,
    )
    return inv / det[..., None, None]
