"""Fused Pallas SPD solve vs jnp.linalg.solve (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from orb_slam2_ssd_semantic_tpu.ops.pallas_solve import spd_solve


def _spd(rng, n, damp=1e-3):
    A = rng.normal(0, 1, (n, n)).astype(np.float32)
    A = A @ A.T
    # The BA system's relative diagonal damping (ba.py:310-316).
    A = A + np.diag(1e-3 * np.abs(np.diag(A)) + damp)
    return A


def test_spd_solve_matches_lu():
    rng = np.random.default_rng(0)
    for n in (6, 59, 108, 128):
        A = _spd(rng, n)
        b = rng.normal(0, 1, (n,)).astype(np.float32)
        x = np.asarray(spd_solve(jnp.asarray(A), jnp.asarray(b),
                                 interpret=True))
        ref = np.linalg.solve(A.astype(np.float64), b.astype(np.float64))
        # f32 elimination vs f64 reference: residual-relative gate.
        resid = np.linalg.norm(A @ x - b) / max(np.linalg.norm(b), 1e-9)
        assert resid < 1e-3, (n, resid)
        np.testing.assert_allclose(x, ref, rtol=2e-2, atol=2e-3)


def test_spd_solve_ill_conditioned_damped():
    """A near-singular system with BA-style damping still solves to a
    small residual (the Schur complement's weak modes regime)."""
    rng = np.random.default_rng(1)
    n = 108
    U = np.linalg.qr(rng.normal(0, 1, (n, n)))[0].astype(np.float32)
    s = np.geomspace(1e4, 1e-2, n).astype(np.float32)
    A = (U * s) @ U.T
    A = A + np.diag(1e-3 * np.abs(np.diag(A)) + 1e-5)
    b = rng.normal(0, 1, (n,)).astype(np.float32)
    x = np.asarray(spd_solve(jnp.asarray(A), jnp.asarray(b), interpret=True))
    resid = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    assert resid < 5e-2, resid
