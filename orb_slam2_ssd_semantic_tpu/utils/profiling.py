"""JAX profiler integration.

SURVEY.md §5 calls for "JAX profiler + per-stage timing" to replace the
reference's ad-hoc chrono prints. utils.metrics supplies host-side stage
timing; this module wraps the device-level profiler: XLA traces viewable
in TensorBoard/Perfetto, plus annotation helpers that label engine
stages inside the trace timeline.
"""

from __future__ import annotations

import contextlib
import os


def start_trace(log_dir: str = "/tmp/slam_trace") -> str:
    """Begin a profiler trace (XLA + host events). View with
    `tensorboard --logdir <dir>` or upload the .perfetto-trace."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    return log_dir


def stop_trace() -> None:
    import jax

    jax.profiler.stop_trace()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/slam_trace"):
    """`with profiling.trace(): run_frames()` — one bounded trace."""
    start_trace(log_dir)
    try:
        yield log_dir
    finally:
        stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Label a host-side region in the device trace timeline
    (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def device_memory_stats() -> dict:
    """Per-device live/peak HBM usage, when the backend reports it."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
    return out
