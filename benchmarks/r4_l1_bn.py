"""Sweep the level-1 RLE kernel block width (bn) and emission variants on
the bench scene: is the kernel per-block-overhead bound (time ~ n_blocks)
or VPU/MXU bound (time ~ work)?  Also times the level-2 call (sorted
input) at its operating size.

Run: bash scripts/tpu_run.sh 1500 benchmarks/r4_l1_bn.py
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
    from ros_gpu_depthmap_fusion_tpu.ops.pallas.segreduce import (
        rle_reduce_pallas)

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
    _, pw, _, m = jax.jit(
        lambda d: unproject_depthmaps(d, intr, tf, tf, 0.001))(dj)
    n = C * H * W
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
    for bn in (2048, 4096, 8192):
        try:
            t(f"level-1 rle bn={bn} ({-(-n // bn)} blocks)",
              lambda k, vv, b=bn: rle_reduce_pallas(
                  k, vv, CAP, sentinel, bn=b)[2], key, vals)
        except Exception as e:  # noqa: BLE001
            print(f"bn={bn} failed: {str(e)[:200]}", flush=True)

    # level-2 shape: the REAL bench partials (sorted), padded to 512k+96k
    pk, ps, cnt, _ = rle_reduce_pallas(key, vals, CAP, sentinel)
    n2 = CAP + 98304
    pad = n2 - CAP
    kk = np.concatenate([np.asarray(pk), np.full(pad, sentinel, np.int32)])
    vv2 = np.concatenate([np.asarray(ps),
                          np.zeros((pad, 4), np.float32)], axis=0)
    order = np.argsort(kk, kind="stable")
    kkj = jnp.asarray(kk[order])
    vvj = jnp.asarray(vv2[order])
    print(f"real L2 rows: {int(cnt)} partials sorted into {n2}")
    for bn in (1024, 2048, 4096, 8192):
        try:
            t(f"level-2 rle bn={bn} ({-(-n2 // bn)} blocks, sorted)",
              lambda k, s, b=bn: rle_reduce_pallas(
                  k, s, 262144, sentinel, bn=b)[2], kkj, vvj)
        except Exception as e:  # noqa: BLE001
            print(f"L2 bn={bn} failed: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
