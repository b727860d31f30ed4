from orb_slam2_ssd_semantic_tpu.geometry import se3  # noqa: F401
from orb_slam2_ssd_semantic_tpu.geometry import camera  # noqa: F401
