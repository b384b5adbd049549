from ros_gpu_depthmap_fusion_tpu.pipeline.engine import (  # noqa: F401
    EngineState,
    FrameInputs,
    FrameOutputs,
    FusionEngine,
    SequenceBatch,
    build_fusion_step,
    fusion_step,
    initial_state,
)
