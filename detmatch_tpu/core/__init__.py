from . import geometry, iou, nms, transforms  # noqa: F401
