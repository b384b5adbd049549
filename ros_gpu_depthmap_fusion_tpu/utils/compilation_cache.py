"""Persistent XLA compilation cache setup.

The fused frame program contains several large ``lax.sort`` instances whose
XLA:TPU compiles cost 30-60 s EACH (runtime is fine — it is purely a
compile-cost problem). JAX's persistent compilation cache amortizes that to
once per machine instead of once per process; measured on this platform a
cold fused-step compile of ~116 s drops to a few seconds of cache loads.

Called automatically by :class:`pipeline.engine.FusionEngine`; safe to call
any time before the first compilation.
"""

from __future__ import annotations

import os
import tempfile

_enabled = False


def enable_persistent_compilation_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax
    path = (path
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.join(tempfile.gettempdir(),
                            "ros_gpu_depthmap_fusion_tpu-xla-cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _enabled = True
    except Exception:
        pass  # older jax or read-only fs: compile-per-process still works
