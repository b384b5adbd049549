from ros_gpu_depthmap_fusion_tpu.mapping import (  # noqa: F401
    filters,
    geometry,
    objects,
    segmentation,
    tracking,
)
from ros_gpu_depthmap_fusion_tpu.mapping.pipeline import (  # noqa: F401
    MappingPipeline,
    MappingResult,
)
