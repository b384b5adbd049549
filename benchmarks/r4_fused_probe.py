"""A/B the fused unproject->crop->quantize->L1 kernel against the XLA
chain at the bench operating point (same process, drift-immune)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from ros_gpu_depthmap_fusion_tpu.utils.profiling import hard_sync
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
    from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
    from ros_gpu_depthmap_fusion_tpu.core import transforms
    from ros_gpu_depthmap_fusion_tpu.ops.unproject import unproject_depthmaps
    from ros_gpu_depthmap_fusion_tpu.ops.mask_ops import crop_points
    from ros_gpu_depthmap_fusion_tpu.ops.voxelize import (
        _quantize_cell_relative)
    from ros_gpu_depthmap_fusion_tpu.ops.pallas.segreduce import (
        rle_reduce_pallas)
    from ros_gpu_depthmap_fusion_tpu.ops.pallas.fused_unproject_rle import (
        unproject_voxelize_l1)

    H, W, C = 480, 848, 8
    cfg = FusionConfig(
        num_depth_streams=C, depth_height=H, depth_width=W,
        crop_min=(-20, -20, 0), crop_max=(20, 20, 2.5),
        voxel_min=(-20, -20, 0), voxel_max=(20, 20, 2.5),
        voxel_size=(0.1, 0.1, 0.12))
    grid = VoxelGrid.from_config(cfg)
    print(f"platform={jax.devices()[0].platform}", flush=True)

    rng = np.random.default_rng(0)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    base = 2500 + 200 * np.sin(u / 150.0) + 150 * np.cos(v / 120.0)
    d0 = (base + rng.standard_normal((H, W))).astype(np.uint16)
    d0[rng.random((H, W)) < 0.01] = 0
    depth = np.stack([d0] * C)
    cams = []
    for i in range(C):
        ang = i * 2 * np.pi / C
        pos = np.array([8 * np.cos(ang), 8 * np.sin(ang), 2.0])
        cams.append(transforms.make_se3(
            transforms.rot_z(ang + np.pi) @ transforms.rot_x(-np.pi / 2 - .3),
            pos))
    tf = jnp.asarray(np.stack(cams))
    intr = jnp.asarray(np.tile(
        PinholeIntrinsics.default_for(W, H).as_array(), (C, 1)))
    dj = jnp.asarray(depth)
    n = C * H * W
    CAP = 512 * 1024

    def chain(d):
        _, pw, pc, mask = unproject_depthmaps(d, intr, tf, tf, 0.001)
        pts = pw.reshape(n, 4)
        m = crop_points(pc.reshape(n, 4), mask.reshape(n),
                        cfg.crop_min, cfg.crop_max)
        ids = grid.cell_index_clamped(pts[:, :3])
        key = jnp.where(m, ids, jnp.int32(grid.num_cells))
        q, _ = _quantize_cell_relative(pts, ids, grid)
        vals = jnp.concatenate(
            [jnp.where(m[:, None], q, 0.0),
             m.astype(jnp.float32)[:, None]], axis=-1)
        return rle_reduce_pallas(key, vals, CAP, grid.num_cells, bn=4096,
                                 force_break=128)[3]

    dm = jnp.asarray(depth.astype(np.float32) * 0.001)

    def fused(d):
        return unproject_voxelize_l1(d, intr, tf, tf, grid, cfg.crop_min,
                                     cfg.crop_max, CAP)[3]

    def t(name, fn, *args, iters=10):
        f = jax.jit(fn)
        hard_sync(f(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        hard_sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:50s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    for rep in range(3):
        t(f"rep{rep} XLA chain (unproj+crop+quant+L1)", chain, dj)
        t(f"rep{rep} FUSED kernel", fused, dm)
    # sanity: run counts comparable
    print("chain true runs:", int(jax.jit(chain)(dj)),
          "| fused true runs:", int(jax.jit(fused)(dm)), flush=True)


if __name__ == "__main__":
    main()
