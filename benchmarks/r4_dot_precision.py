"""A/B the emission-dot precision in the RLE kernel: if DEFAULT (1 bf16
MXU pass) is much faster than HIGHEST (multi-pass), operand restreaming
dominates the kernel and a hi/lo bf16 split is worth building.
DEFAULT results are WRONG (payloads need > 8 mantissa bits) — this probe
times only.
"""
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
    from ros_gpu_depthmap_fusion_tpu.ops.voxelize import (
        _quantize_cell_relative)
    from ros_gpu_depthmap_fusion_tpu.ops.pallas import compact as C
    from ros_gpu_depthmap_fusion_tpu.ops.pallas import segreduce as S

    H, W, Cn = 480, 848, 8
    cfg = FusionConfig(
        num_depth_streams=Cn, depth_height=H, depth_width=W,
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
    depth = np.stack([d0] * Cn)
    cams = []
    for i in range(Cn):
        ang = i * 2 * np.pi / Cn
        pos = np.array([8 * np.cos(ang), 8 * np.sin(ang), 2.0])
        cams.append(transforms.make_se3(
            transforms.rot_z(ang + np.pi) @ transforms.rot_x(-np.pi / 2 - .3),
            pos))
    tf = jnp.asarray(np.stack(cams))
    intr = jnp.asarray(np.tile(
        PinholeIntrinsics.default_for(W, H).as_array(), (Cn, 1)))
    dj = jnp.asarray(depth)
    _, pw, _, m = jax.jit(
        lambda d: unproject_depthmaps(d, intr, tf, tf, 0.001))(dj)
    n = Cn * H * W
    pts = pw.reshape(n, 4)
    mask = m.reshape(n)
    ids = jax.jit(lambda p: grid.cell_index_clamped(p[:, :3]))(pts)
    sentinel = grid.num_cells
    key = jax.jit(lambda mm, i: jnp.where(
        mm, i.astype(jnp.int32), jnp.int32(sentinel)))(mask, ids)
    q, _ = jax.jit(lambda p, i: _quantize_cell_relative(p, i, grid))(pts, ids)
    vals = jax.jit(lambda qq, mm: jnp.concatenate(
        [jnp.where(mm[:, None], qq, 0.0),
         mm.astype(jnp.float32)[:, None]], axis=-1))(q, mask)

    def t(name, fn, *args, iters=10):
        f = jax.jit(fn)
        hard_sync(f(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        hard_sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:46s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    CAP = 512 * 1024
    for prec in ("HIGHEST", "DEFAULT"):
        C._DOT_PRECISION = getattr(jax.lax.Precision, prec)
        for bn in (4096, 8192):
            # distinct static arg to defeat the jit cache across variants
            t(f"level-1 bn={bn} precision={prec}",
              lambda k, vv, b=bn: S.rle_reduce_pallas(
                  k, vv, CAP + (0 if prec == "HIGHEST" else 128),
                  sentinel, bn=b)[2], key, vals)


if __name__ == "__main__":
    main()
