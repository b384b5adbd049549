"""Heterogeneous streams: per-stream resolution + depth_scale.

Reference parity: ``addDepthmap`` takes per-map cols/rows/depthScale
(``gpu_depthmap_fusion.cpp:798-816``) and dispatches per-map shapes
(``:1612-1642``) — a mixed D435+D455 rig. Oracle: a smaller stream
embedded top-left in a zero-padded buffer of the larger shape produces
the SAME unprojected points (zero depth = hole; pixel coords are
absolute), so a padded homogeneous engine is an exact reference for the
heterogeneous engine (integer partial sums commute, so section ordering
cannot change voxelized results).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
from ros_gpu_depthmap_fusion_tpu.pipeline.engine import FusionEngine
from ros_gpu_depthmap_fusion_tpu.utils import native


H0, W0 = 48, 64
H1, W1 = 32, 40

BOX = dict(crop_min=(-3.0, -3.0, 0.0), crop_max=(3.0, 3.0, 2.5),
           voxel_min=(-3.0, -3.0, 0.0), voxel_max=(3.0, 3.0, 2.5),
           voxel_size=(0.1, 0.1, 0.1))


def _scene(rng):
    # smooth fields (uniform-random depth would trip the flying-pixel
    # filter everywhere) + holes
    u0, v0 = np.meshgrid(np.arange(W0), np.arange(H0))
    d0 = (1500 + 300 * np.sin(u0 / 9.0) + 200 * np.cos(v0 / 7.0)
          + rng.integers(0, 3, (H0, W0))).astype(np.uint16)
    d0[rng.random((H0, W0)) < 0.05] = 0
    u1, v1 = np.meshgrid(np.arange(W1), np.arange(H1))
    d1 = (2400 + 500 * np.cos(u1 / 8.0) + 300 * np.sin(v1 / 6.0)
          + rng.integers(0, 3, (H1, W1))).astype(np.uint16)
    d1[rng.random((H1, W1)) < 0.05] = 0
    tf0 = np.eye(4, dtype=np.float32)
    tf0[:3, 3] = [0.0, 0.0, 0.3]
    tf1 = np.eye(4, dtype=np.float32)
    tf1[:3, 3] = [0.5, -0.2, 0.4]
    return d0, d1, tf0, tf1


def _point_set(out):
    pts = np.asarray(out.fused_points)[: int(out.fused_count)]
    return set(map(tuple, np.round(pts, 5).tolist()))


def _run(eng, d0, d1, tf0, tf1, pad=False, frames=3):
    i0 = PinholeIntrinsics.default_for(W0, H0)
    i1 = PinholeIntrinsics.default_for(W1, H1)
    out = None
    for f in range(frames):
        if pad:
            d1p = np.zeros((H0, W0), np.uint16)
            d1p[:H1, :W1] = d1
            eng.add_depthmap(0, d0, i0, tf0, tf0)
            eng.add_depthmap(1, d1p, i1, tf1, tf1)
        else:
            eng.add_depthmap(0, d0, i0, tf0, tf0)
            eng.add_depthmap(1, d1, i1, tf1, tf1)
        out = eng.process(10.0 + f / 30.0)
    return out


def _cfg_hetero(**kw):
    return FusionConfig(
        num_depth_streams=2,
        stream_shapes=((H0, W0), (H1, W1)),
        depth_scales=(0.001, 0.0005),
        depth_height=H0, depth_width=W0,
        voxel_occupancy_lifetime=3, **BOX, **kw)


def _cfg_padded(**kw):
    return FusionConfig(
        num_depth_streams=2,
        depth_height=H0, depth_width=W0,
        depth_scales=(0.001, 0.0005),
        voxel_occupancy_lifetime=3, **BOX, **kw)


def test_config_groups():
    cfg = _cfg_hetero()
    assert cfg.is_heterogeneous
    assert cfg.stream_groups == (((0,), H0, W0), ((1,), H1, W1))
    assert cfg.depthmaps_total_elements == H0 * W0 + H1 * W1
    same = FusionConfig(num_depth_streams=3,
                        stream_shapes=((H0, W0),) * 3)
    assert not same.is_heterogeneous
    assert same.stream_groups == (((0, 1, 2), H0, W0),)


@pytest.mark.parametrize("codec", ["none", "dpcm"])
def test_hetero_engine_matches_padded_oracle(codec):
    if codec == "dpcm" and not native.available():
        pytest.skip("native lib missing")
    rng = np.random.default_rng(3)
    d0, d1, tf0, tf1 = _scene(rng)

    het = FusionEngine(_cfg_hetero(depth_link_codec=codec))
    ref = FusionEngine(_cfg_padded(depth_link_codec="none"))
    out_h = _run(het, d0, d1, tf0, tf1, pad=False)
    out_r = _run(ref, d0, d1, tf0, tf1, pad=True)

    assert int(out_h.raw_count) == int(out_r.raw_count)
    np.testing.assert_array_equal(np.asarray(out_h.occupancy_u8),
                                  np.asarray(out_r.occupancy_u8))
    assert _point_set(out_h) == _point_set(out_r)
    assert int(out_h.fused_count) > 0


def test_per_stream_depth_scale_homogeneous():
    """depth_scales on a homogeneous rig: stream 1 at half scale must land
    at half the depth of an identical stream 0."""
    rng = np.random.default_rng(5)
    d = np.full((H0, W0), 1000, np.uint16)
    i0 = PinholeIntrinsics.default_for(W0, H0)
    tf = np.eye(4, dtype=np.float32)
    cfg = FusionConfig(num_depth_streams=2, depth_height=H0, depth_width=W0,
                       depth_scales=(0.001, 0.0005), depth_link_codec="none",
                       enable_voxel_filter=False,
                       enable_flyingpixels_filter=False, **BOX)
    eng = FusionEngine(cfg)
    eng.add_depthmap(0, d, i0, tf, tf)
    eng.add_depthmap(1, d, i0, tf, tf)
    out = eng.process(10.0)
    pts = np.asarray(out.raw_points)[: int(out.raw_count)]
    zs = np.unique(np.round(pts[:, 2], 6))
    assert set(zs) == {0.5, 1.0}, zs


def test_voxelize_domains_matches_concat():
    """Splitting the input into domains is bit-identical to one domain
    (interpret-mode kernel; integer partial sums commute)."""
    from ros_gpu_depthmap_fusion_tpu.ops.voxelize import (
        voxelize_average_rle, voxelize_average_rle_domains)
    cfg = FusionConfig(num_depth_streams=1, **BOX)
    grid = VoxelGrid.from_config(cfg)
    rng = np.random.default_rng(11)
    n1, n2 = 3000, 1700
    pts = np.concatenate([
        rng.uniform(-3, 3, (n1 + n2, 2)),
        rng.uniform(0, 2.5, (n1 + n2, 1)),
        np.ones((n1 + n2, 1))], axis=1).astype(np.float32)
    mask = rng.random(n1 + n2) > 0.1
    ids = np.asarray(grid.cell_index_clamped(jnp.asarray(pts[:, :3])))
    one = voxelize_average_rle(
        jnp.asarray(pts), jnp.asarray(ids), jnp.asarray(mask), grid, 4096,
        return_occupancy=True, interpret=True, return_partials_count=True)
    two = voxelize_average_rle_domains(
        [(jnp.asarray(pts[:n1]), jnp.asarray(ids[:n1]),
          jnp.asarray(mask[:n1])),
         (jnp.asarray(pts[n1:]), jnp.asarray(ids[n1:]),
          jnp.asarray(mask[n1:]))],
        grid, 4096, return_occupancy=True, interpret=True,
        return_partials_count=True)
    assert int(one[1]) == int(two[1])
    np.testing.assert_array_equal(np.asarray(one[0]), np.asarray(two[0]))
    np.testing.assert_array_equal(np.asarray(one[2]), np.asarray(two[2]))


def test_voxelize_domains_skewed_overflow_observable():
    """A domain that overflows its own capacity SHARE must report above
    ``partials_capacity`` even when the summed true run count stays below
    it (round-4 advisor finding: the summed count silently masked
    per-domain drops)."""
    from ros_gpu_depthmap_fusion_tpu.ops.voxelize import (
        voxelize_average_rle_domains)
    cfg = FusionConfig(num_depth_streams=1, **BOX)
    grid = VoxelGrid.from_config(cfg)
    rng = np.random.default_rng(3)
    # domain A: 5000 points in mostly-distinct cells -> ~5000 level-1
    # runs, but its pixel-proportional share of capacity is only
    # max(4096, 8192*5000/50000) = 4096 -> A overflows its share
    n_a, n_b = 5000, 45000
    pts_a = np.concatenate([
        rng.uniform(-3, 3, (n_a, 2)), rng.uniform(0, 2.5, (n_a, 1)),
        np.ones((n_a, 1))], axis=1).astype(np.float32)
    # domain B: one dense spot -> few runs (force_break=128 splits it
    # into ~n_b/128 rows, well inside B's share)
    pts_b = np.tile(np.array([[0.05, 0.05, 1.0, 1.0]], np.float32),
                    (n_b, 1))
    ids_a = np.asarray(grid.cell_index_clamped(jnp.asarray(pts_a[:, :3])))
    ids_b = np.asarray(grid.cell_index_clamped(jnp.asarray(pts_b[:, :3])))
    cap = 8192
    res = voxelize_average_rle_domains(
        [(jnp.asarray(pts_a), jnp.asarray(ids_a),
          jnp.ones(n_a, bool)),
         (jnp.asarray(pts_b), jnp.asarray(ids_b),
          jnp.ones(n_b, bool))],
        grid, 4096, partials_capacity=cap, interpret=True,
        return_partials_count=True)
    reported = int(res[-1])
    # summed true counts stay under the capacity (the old observable
    # would NOT fire) but the scaled per-domain report must
    assert reported > cap, reported


def test_hetero_pipelined_matches_sync():
    """Heterogeneous engine with pipeline_depth=1 (per-group encode on
    the worker thread, bits tuple through the packet) must match the
    synchronous hetero engine bit-for-bit."""
    rng = np.random.default_rng(9)
    d0, d1, tf0, tf1 = _scene(rng)
    sync = FusionEngine(_cfg_hetero(depth_link_codec="dpcm"))
    pipe = FusionEngine(_cfg_hetero(depth_link_codec="dpcm"),
                        pipeline_depth=1)
    out_s = _run(sync, d0, d1, tf0, tf1, frames=4)
    outs_p = []
    i0 = PinholeIntrinsics.default_for(W0, H0)
    i1 = PinholeIntrinsics.default_for(W1, H1)
    for f in range(4):
        pipe.add_depthmap(0, d0, i0, tf0, tf0)
        pipe.add_depthmap(1, d1, i1, tf1, tf1)
        o = pipe.process(10.0 + f / 30.0)
        if o is not None:
            outs_p.append(o)
    tail = pipe.flush()
    assert tail is not None
    outs_p.append(tail)
    out_p = outs_p[-1]
    np.testing.assert_array_equal(np.asarray(out_s.occupancy_u8),
                                  np.asarray(out_p.occupancy_u8))
    assert _point_set(out_s) == _point_set(out_p)
