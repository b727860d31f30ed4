"""TPU-native semantic RGB-D SLAM engine.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
Ewenwan/ORB_SLAM2_SSD_Semantic (see SURVEY.md): ORB feature extraction,
batched Hamming matching, motion-model/PnP tracking, dynamic-point
rejection (optical flow + multi-view geometry), SSD-lite semantic
detection fused into a 3D object database, local/global bundle
adjustment, Sim3 loop closing, and probabilistic occupancy mapping —
re-architected as functional pipeline stages over fixed-capacity
device-resident state rather than the reference's thread/mutex design.
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmul/einsum DEFAULT precision multiplies f32 operands in
# bfloat16 (one MXU pass): ~0.4% relative error — ~2 cm absolute on
# 5 m world coordinates. Geometry cannot survive that: the r4 bench
# circuit's entire translation drift (~1.3 cm/frame pose bias with a
# PERFECT map, exact seed and zero-residual associations) traced to
# bf16 point/pose transforms. SLAM is a geometry engine, so true-f32
# contraction is the correct global default. The deliberately-bf16
# compute paths are unaffected: the BRIEF one-hot GEMMs
# (ops/orb_descriptor.py) and the SSD conv stack cast their operands
# to bfloat16 explicitly, Hamming matching is integer popcount, and
# the Pallas kernels manage their own dtypes.
_jax.config.update("jax_default_matmul_precision", "highest")

from orb_slam2_ssd_semantic_tpu.config import SlamConfig  # noqa: F401
