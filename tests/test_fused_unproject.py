"""Fused unproject->crop->quantize->L1 kernel parity vs the XLA chain."""
import numpy as np
import jax.numpy as jnp

from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
from ros_gpu_depthmap_fusion_tpu.core import transforms
from ros_gpu_depthmap_fusion_tpu.ops.pallas.fused_unproject_rle import (
    unproject_voxelize_l1)
from ros_gpu_depthmap_fusion_tpu.ops.mask_ops import crop_points
from ros_gpu_depthmap_fusion_tpu.ops.unproject import unproject_depthmaps


def _l2_aggregate(pk, ps):
    """cell -> (qx, qy, qz, n) totals from partial rows (numpy oracle)."""
    agg = {}
    for k, row in zip(np.asarray(pk), np.asarray(ps)):
        if row[3] > 0:
            agg.setdefault(int(k), np.zeros(4))
            agg[int(k)] += row
    return agg


def test_fused_unproject_l1_matches_chain():
    C, H, W = 2, 32, 48
    cfg = FusionConfig(
        num_depth_streams=C, depth_height=H, depth_width=W,
        crop_min=(-4.0, -4.0, 0.0), crop_max=(4.0, 4.0, 2.5),
        voxel_min=(-4.0, -4.0, 0.0), voxel_max=(4.0, 4.0, 2.5),
        voxel_size=(0.25, 0.25, 0.25))
    grid = VoxelGrid.from_config(cfg)
    rng = np.random.default_rng(0)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    d0 = (1200 + 300 * np.sin(u / 7.0) + 200 * np.cos(v / 5.0)
          + rng.integers(0, 5, (H, W))).astype(np.uint16)
    d0[rng.random((H, W)) < 0.07] = 0
    depth = np.stack([d0, (d0 * 1.3).astype(np.uint16)])
    intr = jnp.asarray(np.tile(
        PinholeIntrinsics.default_for(W, H).as_array(), (C, 1)))
    tfs = np.stack([
        transforms.make_se3(transforms.rot_z(0.3),
                            np.array([0.5, -0.4, 0.3])),
        transforms.make_se3(transforms.rot_x(-0.7),
                            np.array([-1.0, 0.8, 0.5]))]).astype(np.float32)
    tfc = np.stack([
        transforms.make_se3(transforms.rot_y(0.2),
                            np.array([0.1, 0.2, 0.0])),
        np.eye(4, dtype=np.float32)])
    scale = 0.001

    # reference chain
    _, pw, pc, mask = unproject_depthmaps(
        jnp.asarray(depth), intr, jnp.asarray(tfs), jnp.asarray(tfc),
        scale)
    n = C * H * W
    pts = pw.reshape(n, 4)
    m = crop_points(pc.reshape(n, 4), mask.reshape(n),
                    cfg.crop_min, cfg.crop_max)
    ids = grid.cell_index_clamped(pts[:, :3])
    from ros_gpu_depthmap_fusion_tpu.ops.pallas.segreduce import (
        rle_reduce_pallas)
    from ros_gpu_depthmap_fusion_tpu.ops.voxelize import (
        _quantize_cell_relative)
    key = jnp.where(m, ids, jnp.int32(grid.num_cells))
    q, _ = _quantize_cell_relative(pts, ids, grid)
    vals = jnp.concatenate(
        [jnp.where(m[:, None], q, 0.0), m.astype(jnp.float32)[:, None]],
        axis=-1)
    rk, rs, rc, _ = rle_reduce_pallas(key, vals, n, grid.num_cells,
                                      interpret=True, force_break=128)

    # fused kernel
    depth_m = (depth.astype(np.float32) * scale
               * np.asarray(mask).reshape(C, H, W))
    fk, fs, fc, ft, fvalid = unproject_voxelize_l1(
        jnp.asarray(depth_m), intr, jnp.asarray(tfs), jnp.asarray(tfc),
        grid, cfg.crop_min, cfg.crop_max, n, interpret=True)

    assert int(fvalid) == int(np.asarray(m).sum())
    ref = _l2_aggregate(rk[:int(rc)], rs[:int(rc)])
    got = _l2_aggregate(fk[:int(fc)], fs[:int(fc)])
    assert set(got) == set(ref), (
        f"cell sets differ: +{set(got) - set(ref)} -{set(ref) - set(got)}")
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=1.0,
                                   err_msg=f"cell {k}")
    # counts must match EXACTLY per cell (membership identical unless a
    # point sits on an exact cell boundary, which this scene avoids)
    for k in ref:
        assert got[k][3] == ref[k][3], (k, got[k], ref[k])
