"""True-f32 matmul precision, scoped to the engine's entry points.

TPU matmul/einsum DEFAULT precision multiplies f32 operands in bfloat16
(one MXU pass): ~0.4% relative error — ~2 cm absolute on 5 m world
coordinates. Geometry cannot survive that: the r4 bench circuit's
entire translation drift (~1.3 cm/frame pose bias with a PERFECT map)
traced to bf16 point/pose transforms. SLAM is a geometry engine, so
every engine entry point runs under `jax.default_matmul_precision
('highest')`.

Scoped HERE rather than as an import-time global config mutation
(ADVICE r4): a host application importing this library keeps ITS OWN
matmul default (and any explicit setting it made) for its own code;
only computations dispatched through the engine's entry points — and
everything they trace — get the true-f32 contraction default. The
deliberately-bf16 compute paths are unaffected either way: the BRIEF
one-hot GEMMs (ops/orb_descriptor.py) and the SSD conv stack cast
their operands to bfloat16 explicitly, Hamming matching is integer
popcount, and the Pallas kernels manage their own dtypes. The hottest
numeric cores (geometry/se3.py, mapping/ba.py, mapping/pose_graph.py,
tracking/pose_opt.py, ops/linalg.py) additionally pin
Precision.HIGHEST per call, so they are safe even when invoked
directly outside any entry point.
"""

from __future__ import annotations

import functools

import jax


def highest_precision():
    """Context manager: true-f32 matmul/einsum contraction."""
    return jax.default_matmul_precision("highest")


def scoped(fn):
    """Decorator: run `fn` — and any tracing its call triggers — under
    true-f32 matmul precision. Applied to the engine's public entry
    points (Tracker.process, SlamSystem.track_*, the scan/segmented
    runners, the global-BA steps)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
