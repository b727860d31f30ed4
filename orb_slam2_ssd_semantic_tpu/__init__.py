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

# NOTE on matmul precision: TPU's default f32 matmul multiplies in
# bfloat16, which is fatal for SLAM geometry (~2 cm error at 5 m range
# — the r4 drift root cause). The engine runs its entry points under
# `jax.default_matmul_precision('highest')` via utils/precision.scoped
# instead of mutating the process-global JAX config at import time
# (ADVICE r4): host applications keep their own default for their own
# code. If you call inner jitted kernels directly on TPU, wrap the
# first (tracing) call in `utils.precision.highest_precision()`.

from orb_slam2_ssd_semantic_tpu.config import SlamConfig  # noqa: F401
