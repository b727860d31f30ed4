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

from orb_slam2_ssd_semantic_tpu.config import SlamConfig  # noqa: F401
