from ros_gpu_depthmap_fusion_tpu.utils import png, profiling, viz  # noqa: F401
