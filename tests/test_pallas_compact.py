"""Interpret-mode tests for the MXU compaction + RLE segment-reduce
kernels (compiled-path numbers live in benchmarks/; the verify recipe pins
them on real TPU)."""

import numpy as np
import jax.numpy as jnp

from ros_gpu_depthmap_fusion_tpu.ops.pallas.compact import compact_rows_pallas
from ros_gpu_depthmap_fusion_tpu.ops.pallas.segreduce import rle_reduce_pallas


def _rle_oracle(keys, vals, sentinel):
    rows, i, n = [], 0, len(keys)
    while i < n:
        j = i
        while j + 1 < n and keys[j + 1] == keys[i]:
            j += 1
        if keys[i] != sentinel:
            rows.append((keys[i], vals[i:j + 1].sum(axis=0)))
        i = j + 1
    return rows


def test_compact_rows_matches_boolean_indexing():
    rng = np.random.default_rng(1)
    for n, cap, p in [(5000, 4096, 0.3), (2048, 2048, 1.0), (300, 512, 0.0),
                      (10000, 1024, 0.5), (6144, 8192, 0.07)]:
        vals = rng.standard_normal((n, 4)).astype(np.float32)
        mask = rng.random(n) < p
        out, cnt = compact_rows_pallas(
            jnp.asarray(vals), jnp.asarray(mask), cap, interpret=True)
        out, cnt = np.asarray(out), int(cnt)
        exp = vals[mask][:cap]
        assert cnt == min(mask.sum(), cap)
        np.testing.assert_array_equal(out[:cnt], exp)
        assert not out[cnt:].any()


def test_rle_reduce_matches_oracle():
    rng = np.random.default_rng(2)
    sent = 1 << 22
    for n, cap in [(5000, 4096), (2048, 512), (9000, 8192), (100, 256)]:
        keys = []
        while len(keys) < n:
            ln = 1 + rng.geometric(0.08)
            k = sent if rng.random() < 0.15 else int(rng.integers(0, 1000))
            keys += [k] * ln
        keys = np.array(keys[:n], np.int32)
        vals = rng.integers(0, 100, (n, 4)).astype(np.float32)
        exp = _rle_oracle(keys, vals, sent)
        ko, so, cnt, true_cnt = rle_reduce_pallas(
            jnp.asarray(keys), jnp.asarray(vals), cap, sent, interpret=True)
        assert int(true_cnt) == len(exp)
        ko, so, cnt = np.asarray(ko), np.asarray(so), int(cnt)
        m = min(len(exp), cap)
        assert cnt == m
        for j in range(m):
            assert ko[j] == exp[j][0]
            np.testing.assert_array_equal(so[j], exp[j][1])
        assert (ko[m:] == sent).all() and not so[m:].any()


def test_rle_reduce_overflow_clamps():
    keys = np.repeat(np.arange(100, dtype=np.int32), 3)
    vals = np.ones((300, 1), np.float32)
    ko, so, cnt, true_cnt = rle_reduce_pallas(
        jnp.asarray(keys), jnp.asarray(vals), 16, 1 << 20, interpret=True)
    assert int(cnt) == 16
    assert int(true_cnt) == 100  # overflow observable: true count unclamped
    np.testing.assert_array_equal(np.asarray(ko), np.arange(16))
    np.testing.assert_array_equal(np.asarray(so)[:, 0], np.full(16, 3.0))


def test_voxelize_rle_bitexact_vs_packed():
    import jax
    from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    from ros_gpu_depthmap_fusion_tpu.ops.voxelize import (
        voxelize_average_packed, voxelize_average_rle)
    cfg = FusionConfig(voxel_min=(-2, -2, 0), voxel_max=(2, 2, 1),
                       voxel_size=(0.1, 0.1, 0.12))
    grid = VoxelGrid.from_config(cfg)
    rng = np.random.default_rng(3)
    n = 20000
    pts = np.clip(np.cumsum(rng.standard_normal((n, 3)) * 0.01, axis=0)
                  * 0.5, [-1.9, -1.9, 0.01], [1.9, 1.9, 0.95])
    pts4 = jnp.asarray(np.concatenate([pts, np.ones((n, 1))], -1),
                       jnp.float32)
    mask = jnp.asarray(rng.random(n) < 0.9)
    cells = grid.cell_index_clamped(pts4[:, :3])
    cap = 4096
    p = voxelize_average_packed(pts4, cells, mask, grid, cap,
                                return_occupancy=True)
    r = voxelize_average_rle(pts4, cells, mask, grid, cap,
                             return_occupancy=True, interpret=True)
    assert int(p[1]) == int(r[1])
    np.testing.assert_array_equal(np.asarray(p[0]), np.asarray(r[0]))
    np.testing.assert_array_equal(np.asarray(p[2]), np.asarray(r[2]))


def test_voxelize_rle_extra_rows_match_concat():
    """Domain split: feeding raster-incoherent rows via extra_* (the
    engine's lidar selection) is bit-identical to concatenating them into
    the level-1 input (integer partial sums commute)."""
    from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    from ros_gpu_depthmap_fusion_tpu.ops.voxelize import (
        voxelize_average_rle)
    cfg = FusionConfig(voxel_min=(-2, -2, 0), voxel_max=(2, 2, 1),
                       voxel_size=(0.1, 0.1, 0.12))
    grid = VoxelGrid.from_config(cfg)
    rng = np.random.default_rng(5)
    n, m = 8000, 700
    pts = np.clip(np.cumsum(rng.standard_normal((n, 3)) * 0.01, axis=0)
                  * 0.5, [-1.9, -1.9, 0.01], [1.9, 1.9, 0.95])
    extra = rng.uniform([-1.9, -1.9, 0.01], [1.9, 1.9, 0.95], (m, 3))
    p4 = jnp.asarray(np.concatenate([pts, np.ones((n, 1))], -1),
                     jnp.float32)
    e4 = jnp.asarray(np.concatenate([extra, np.ones((m, 1))], -1),
                     jnp.float32)
    pm = jnp.asarray(rng.random(n) < 0.9)
    em = jnp.asarray(rng.random(m) < 0.8)
    pc = grid.cell_index_clamped(p4[:, :3])
    ec = grid.cell_index_clamped(e4[:, :3])
    cap = 4096
    ref = voxelize_average_rle(
        jnp.concatenate([p4, e4]), jnp.concatenate([pc, ec]),
        jnp.concatenate([pm, em]), grid, cap, return_occupancy=True,
        interpret=True)
    got = voxelize_average_rle(
        p4, pc, pm, grid, cap, return_occupancy=True, interpret=True,
        extra_points=e4, extra_cell_indices=ec, extra_mask=em)
    assert int(ref[1]) == int(got[1])
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(got[2]))
