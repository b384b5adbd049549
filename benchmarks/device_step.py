"""Pure device-step timing (no link): flying-pixel variants, voxelize
exact vs packed, and the full fused step on a pre-staged device packet.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/device_step.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ros_gpu_depthmap_fusion_tpu.utils.profiling import hard_sync
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
    from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
    from ros_gpu_depthmap_fusion_tpu.ops.unproject import unproject_depthmaps
    from ros_gpu_depthmap_fusion_tpu.ops import stencil
    from ros_gpu_depthmap_fusion_tpu.ops.pallas.flying_pixels import (
        filter_flying_pixels_pallas)
    from ros_gpu_depthmap_fusion_tpu.ops.voxelize import (
        voxelize_average, voxelize_average_packed)
    from ros_gpu_depthmap_fusion_tpu.pipeline.engine import FusionEngine

    H, W, C = 480, 848, 8
    cfg = FusionConfig(
        num_depth_streams=C, depth_height=H, depth_width=W,
        num_point_sequences=1,
        crop_min=(-20, -20, 0), crop_max=(20, 20, 2.5),
        voxel_min=(-20, -20, 0), voxel_max=(20, 20, 2.5),
        voxel_size=(0.1, 0.1, 0.12), voxel_occupancy_lifetime=10,
        rollbuffer_point_capacity=131072, max_points_per_sequence=4096,
        emit_raw_points=False)
    grid = VoxelGrid.from_config(cfg)
    rng = np.random.default_rng(0)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    base = 2500 + 200 * np.sin(u / 150.0) + 150 * np.cos(v / 120.0)
    depth = np.stack([(base + rng.standard_normal((H, W)))
                      .astype(np.uint16)] * C)
    intr = jnp.asarray(np.tile(
        PinholeIntrinsics.default_for(W, H).as_array(), (C, 1)))
    eye = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (C, 1, 1)))

    def t(name, fn, *args, iters=10):
        f = jax.jit(fn) if not hasattr(fn, "lower") else fn
        t0 = time.perf_counter()
        hard_sync(f(*args))
        ct = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        hard_sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:40s} {dt*1e3:9.2f} ms  (compile {ct:5.1f}s)")
        return dt

    pc, pw, pcr, m = jax.jit(lambda d: unproject_depthmaps(
        d, intr, eye, eye, 0.001))(jnp.asarray(depth))

    t("flying XLA (size1+rot45)",
      lambda p, mm: stencil.filter_flying_pixels(p, mm, H, W, 1, 0.5,
                                                 True, 10.0), pc, m)
    t("flying Pallas (size1+rot45)",
      lambda p, mm: filter_flying_pixels_pallas(p, mm, H, W, 1, 0.5,
                                                True, 10.0), pc, m)
    t("flying XLA (size2+rot45)",
      lambda p, mm: stencil.filter_flying_pixels(p, mm, H, W, 2, 0.5,
                                                 True, 10.0), pc, m)
    t("flying Pallas (size2+rot45)",
      lambda p, mm: filter_flying_pixels_pallas(p, mm, H, W, 2, 0.5,
                                                True, 10.0), pc, m)

    n = C * H * W
    pts = pw.reshape(n, 4)
    ids = jax.jit(lambda p: grid.cell_index_clamped(p[:, :3]))(pts)
    mask = m.reshape(n)
    cap = 262144
    t("voxelize exact (4-op sort)",
      lambda p, i, mm: voxelize_average(p, i, mm, grid, cap,
                                        return_occupancy=True),
      pts, ids, mask, iters=5)
    t("voxelize packed (2-op sort)",
      lambda p, i, mm: voxelize_average_packed(p, i, mm, grid, cap,
                                               return_occupancy=True),
      pts, ids, mask, iters=5)

    # full fused step on a device-resident packet (no per-frame link)
    eng = FusionEngine(cfg)
    ip = PinholeIntrinsics.default_for(W, H)
    for i in range(C):
        eng.add_depthmap(i, depth[i], ip, np.eye(4, dtype=np.float32),
                         np.eye(4, dtype=np.float32))
    out = eng.process(10.0)
    hard_sync(out.fused_count)
    # rebuild a packet and keep it on device
    for i in range(C):
        eng.add_depthmap(i, depth[i], ip, np.eye(4, dtype=np.float32),
                         np.eye(4, dtype=np.float32))
    from ros_gpu_depthmap_fusion_tpu.utils import native
    from ros_gpu_depthmap_fusion_tpu.ops.depth_codec import B_BUCKETS
    pkt = eng._pkt
    enc, bits = native.depth_encode(
        eng._depth_host, cfg.depth_codec_max_exceptions,
        allowed_bits=B_BUCKETS,
        out=dict(words=pkt.tail, row_first=pkt.row_first,
                 exc_idx=pkt.exc_idx, exc_zz=pkt.exc_zz))
    pkt.set_scalars(int(enc["exc_count"]), 10, 0, 9, 0, 0, 0, 0.5, 10.0, 0.5)
    dev_pkt = jax.device_put(pkt.view(bits))
    hard_sync(dev_pkt)

    def step_only():
        eng.state, o = eng.step(eng.state, dev_pkt, depth_bits=bits)
        return o.fused_count
    step_only()
    hard_sync(eng.state.frame_index)
    t0 = time.perf_counter()
    for _ in range(20):
        r = step_only()
    hard_sync(r)
    dt = (time.perf_counter() - t0) / 20
    print(f"{'FULL fused step, device-resident':40s} {dt*1e3:9.2f} ms "
          f"-> {1/dt:.1f} fps device-side")


if __name__ == "__main__":
    main()
