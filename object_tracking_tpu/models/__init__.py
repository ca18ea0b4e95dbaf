"""Model zoo: YOLOv2 detector, single-object trackers, joint detect+track."""

from object_tracking_tpu.models.darknet19 import Darknet19  # noqa: F401
from object_tracking_tpu.models.losses import (  # noqa: F401
    yolo_loss, binary_crossentropy, heatmap_accuracy,
)
from object_tracking_tpu.models.tiny_tracker import TinyTracker  # noqa: F401
from object_tracking_tpu.models.multi_obj_det_tracker import (  # noqa: F401
    MultiObjDetTracker,
)
from object_tracking_tpu.models.yolov2 import YOLOv2Detector  # noqa: F401
from object_tracking_tpu.models.darknet_cfg import (  # noqa: F401
    CfgDetector, DarknetCfgNet, build_from_cfg, head_specs,
    load_weights_for_cfg, parse_darknet_cfg,
)
from object_tracking_tpu.models.fake_detector import FakeDetector  # noqa: F401
from object_tracking_tpu.models.moe_head import MoEGridHead  # noqa: F401
from object_tracking_tpu.models.vgg16 import (  # noqa: F401
    VGG16, VGG16PriorSource,
)
