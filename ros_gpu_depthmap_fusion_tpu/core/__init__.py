from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
from ros_gpu_depthmap_fusion_tpu.core import transforms
from ros_gpu_depthmap_fusion_tpu.core import timeutil

__all__ = [
    "FusionConfig",
    "VoxelGrid",
    "PinholeIntrinsics",
    "transforms",
    "timeutil",
]
