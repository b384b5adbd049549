from ros_gpu_depthmap_fusion_tpu.slam import (  # noqa: F401
    ate,
    ba,
    features,
    lie,
    pose_estimation,
    pose_graph,
)
from ros_gpu_depthmap_fusion_tpu.slam.frontend import (  # noqa: F401
    OdometryResult,
    RgbdOdometry,
)
