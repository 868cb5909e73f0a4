from hydranet_tpu.metrics.seg_metrics import IntersectionOverUnion  # noqa: F401
from hydranet_tpu.metrics.lane_metric import LaneMetric  # noqa: F401
from hydranet_tpu.metrics.coco_eval import COCOMeanAP  # noqa: F401
