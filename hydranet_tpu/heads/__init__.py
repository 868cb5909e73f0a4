from hydranet_tpu.heads.segmentation import SegmentHead  # noqa: F401
from hydranet_tpu.heads.detection import DetectionHead  # noqa: F401
