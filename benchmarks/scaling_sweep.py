"""Multi-device scaling sweep (BASELINE config #5 harness).

Runs the sharded fusion step over meshes of 1/2/4/8 devices (virtual CPU
devices anywhere; real chips on a pod slice) with the total camera count
scaled with the mesh — measuring weak-scaling efficiency of the
streams-DP x grid-space-partitioned design. On the virtual-CPU mesh the
numbers validate the mechanics, not real ICI bandwidth.

Run: PYTHONPATH=.:$PYTHONPATH \
     JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python benchmarks/scaling_sweep.py
"""

import time

import numpy as np


def main():
    import os
    import jax
    from ros_gpu_depthmap_fusion_tpu.utils.profiling import hard_sync
    # this image's sitecustomize overwrites JAX_PLATFORMS at interpreter
    # start; jax.config.update still wins if no backend has initialized.
    # A single real chip can't sweep, so default to the virtual-CPU mesh
    # unless a real multi-chip platform is present.
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    if len(jax.devices()) < 2:
        raise SystemExit("need >= 2 devices for a scaling sweep")
    import jax.numpy as jnp
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
    from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
    from ros_gpu_depthmap_fusion_tpu.parallel import make_mesh
    from ros_gpu_depthmap_fusion_tpu.parallel.engine import (
        ShardedFusionEngine)

    H, W = 120, 160
    intr = PinholeIntrinsics.default_for(W, H)
    rng = np.random.default_rng(0)
    depth = rng.integers(500, 8000, size=(H, W), dtype=np.uint16)
    eye = np.eye(4, dtype=np.float32)

    n_avail = len(jax.devices())
    configs = []
    n = 1
    while n <= n_avail:
        configs.append(n)
        n *= 2

    results = {}
    for n_dev in configs:
        n_space = 2 if n_dev >= 2 else 1
        n_stream = n_dev // n_space
        cams = n_stream  # weak scaling: one camera per stream shard
        cfg = FusionConfig(
            num_depth_streams=cams, depth_height=H, depth_width=W,
            crop_min=(-10, -10, 0), crop_max=(10, 10, 2.5),
            voxel_min=(-10, -10, 0), voxel_max=(10, 10, 2.5),
            voxel_size=(0.1, 0.1, 0.1), voxel_occupancy_lifetime=10,
            rollbuffer_point_capacity=256, max_points_per_sequence=64)
        mesh = make_mesh(num_stream=n_stream, num_space=n_space,
                         devices=jax.devices()[:n_dev])
        eng = ShardedFusionEngine(cfg, mesh)
        # warmup
        for i in range(cams):
            eng.add_depthmap(i, depth, intr, eye, eye)
        out = eng.process(1.0)
        hard_sync(out.occupancy_u8)
        iters = 20
        t0 = time.perf_counter()
        for f in range(iters):
            for i in range(cams):
                eng.add_depthmap(i, depth, intr, eye, eye)
            out = eng.process(1.0 + f / 30.0)
        hard_sync(out.occupancy_u8)
        dt = (time.perf_counter() - t0) / iters
        results[n_dev] = (cams, dt)
        print(f"devices={n_dev:2d} mesh=({n_stream}x{n_space}) cams={cams} "
              f"-> {dt*1e3:8.2f} ms/frame "
              f"({cams/dt:8.1f} cam-frames/s)")

    base_cams, base_dt = results[configs[0]]
    base_rate = base_cams / base_dt
    for n_dev in configs[1:]:
        cams, dt = results[n_dev]
        eff = (cams / dt) / (base_rate * n_dev / configs[0])
        print(f"weak-scaling efficiency @ {n_dev} devices: {eff*100:.0f}%")
    if jax.default_backend() == "cpu":
        print("NOTE: virtual CPU devices share physical cores — these "
              "numbers validate the sharded program's mechanics, not real "
              "ICI scaling; run on a pod slice for true efficiency.")


if __name__ == "__main__":
    main()
