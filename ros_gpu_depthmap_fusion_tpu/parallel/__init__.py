from ros_gpu_depthmap_fusion_tpu.parallel.mesh import (  # noqa: F401
    SPACE_AXIS,
    STREAM_AXIS,
    make_mesh,
)
from ros_gpu_depthmap_fusion_tpu.parallel.sharded import (  # noqa: F401
    ShardedFrameOutputs,
    build_sharded_fusion_step,
    input_shardings,
    sharded_initial_state,
    state_shardings,
)
