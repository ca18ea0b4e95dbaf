"""Pure, jittable core ops: boxes, NMS, netout decode, target encoding,
heatmaps, darknet weight ingestion, on-device image transforms."""

from object_tracking_tpu.ops.boxes import (  # noqa: F401
    iou_center, iou_corner, pairwise_iou_center, cxcywh_to_xyxy,
    xyxy_to_cxcywh, interval_overlap,
)
from object_tracking_tpu.ops.heatmap import (  # noqa: F401
    heatmap_encode, heatmap_decode_rect,
)
from object_tracking_tpu.ops.nms import greedy_nms_scores  # noqa: F401
from object_tracking_tpu.ops.decode import (  # noqa: F401
    decode_netout, decode_and_nms,
)
from object_tracking_tpu.ops.targets import encode_targets  # noqa: F401
from object_tracking_tpu.ops.weights import (  # noqa: F401
    DarknetWeightReader, load_yolov2_weights,
)
