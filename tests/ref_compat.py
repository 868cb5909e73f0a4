"""Golden-parity bridge: import the reference PyTorch implementation
(read-only at /root/reference/model) so tests can compare our JAX modules
numerically against it with identical weights.

The reference imports torchvision (absent in this image), so a minimal
pure-torch stub implementing torchvision's documented NMS semantics is
installed first. The stub exists only for tests.
"""

import sys
import types

REF = "/root/reference/model"


def _torch_nms(boxes, scores, iou_threshold):
    """Greedy NMS with torchvision semantics: boxes (x1,y1,x2,y2), descending
    score order (stable), suppress IoU > threshold."""
    import torch

    order = torch.argsort(scores, descending=True, stable=True)
    keep = []
    suppressed = torch.zeros(boxes.shape[0], dtype=torch.bool)
    areas = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * \
            (boxes[:, 3] - boxes[:, 1]).clamp(min=0)
    for idx in order.tolist():
        if suppressed[idx]:
            continue
        keep.append(idx)
        x1 = torch.maximum(boxes[idx, 0], boxes[:, 0])
        y1 = torch.maximum(boxes[idx, 1], boxes[:, 1])
        x2 = torch.minimum(boxes[idx, 2], boxes[:, 2])
        y2 = torch.minimum(boxes[idx, 3], boxes[:, 3])
        inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
        iou = inter / (areas[idx] + areas - inter).clamp(min=1e-12)
        suppressed |= iou > iou_threshold
    return torch.tensor(keep, dtype=torch.long)


def _torch_batched_nms(boxes, scores, idxs, iou_threshold):
    import torch

    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.long)
    max_coord = boxes.max()
    offsets = idxs.to(boxes) * (max_coord + torch.tensor(1.0).to(boxes))
    boxes_for_nms = boxes + offsets[:, None]
    return _torch_nms(boxes_for_nms, scores, iou_threshold)


def install():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        boxes_mod = types.ModuleType("torchvision.ops.boxes")
        boxes_mod.nms = _torch_nms
        boxes_mod.batched_nms = _torch_batched_nms
        ops.boxes = boxes_mod
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
        sys.modules["torchvision.ops.boxes"] = boxes_mod
    if REF not in sys.path:
        sys.path.insert(0, REF)
