"""Default trained-artifact resolution.

The reference always boots its trained models: the ORB vocabulary at
construction (perfect/src/System.cc:120-136) and the hardcoded ncnn SSD
weights (perfect/src/Detector.cc:22-23). The engine equivalents live in
`checkpoints/` at the repo root (orbvoc_synth.npz trained by
apps/train_vocabulary.py; ssdlite_synthetic.npz by apps/train_ssdlite.py)
and are auto-loaded by default; components fall back to their untrained
substitutes WITH A WARNING when an artifact is missing (e.g. an
installed package without the checkpoints directory).
"""

from __future__ import annotations

import os
import warnings
from pathlib import Path


def find_checkpoint(name: str) -> str | None:
    """Absolute path of `checkpoints/<name>` resolved relative to the
    package (repo-root layout), or $ORB_SLAM2_TPU_CHECKPOINTS/<name>;
    None if absent."""
    env = os.environ.get("ORB_SLAM2_TPU_CHECKPOINTS")
    candidates = []
    if env:
        candidates.append(Path(env) / name)
    candidates.append(Path(__file__).resolve().parents[2] / "checkpoints" / name)
    for c in candidates:
        if c.exists():
            return str(c)
    return None


def warn_missing(name: str, fallback: str) -> None:
    warnings.warn(
        f"trained artifact '{name}' not found (looked in the repo "
        f"checkpoints/ directory and $ORB_SLAM2_TPU_CHECKPOINTS); "
        f"falling back to {fallback}",
        stacklevel=3,
    )
