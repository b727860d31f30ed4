"""Device-mesh construction and canonical shardings.

The reference has no distributed backend (SURVEY.md §2.6 P12); this
module defines the TPU-native scale-out axes:

- ``kf``  — keyframe/frame parallelism: batched per-keyframe work
  (extraction, detection, point-cloud generation, BoW scoring) is
  data-parallel over keyframes.
- ``pt``  — observation/point parallelism: bundle-adjustment residual
  and Hessian-block reductions are sharded over observations and
  reduced with psum over ICI (distributed Schur complement).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

KF_AXIS = "kf"
PT_AXIS = "pt"


def make_mesh(n_kf: int | None = None, n_pt: int = 1, devices=None) -> Mesh:
    """Build a (kf, pt) mesh. Defaults to all devices on the kf axis."""
    if devices is None:
        devices = jax.devices()
    if n_kf is None:
        n_kf = len(devices) // n_pt
    dev = np.asarray(devices[: n_kf * n_pt]).reshape(n_kf, n_pt)
    return Mesh(dev, (KF_AXIS, PT_AXIS))


def kf_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (keyframe/batch) dim over the kf axis."""
    return NamedSharding(mesh, P(KF_AXIS))


def pt_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (point/observation) dim over the pt axis."""
    return NamedSharding(mesh, P(PT_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
