"""ShardedFusionEngine orchestrator tests."""

import numpy as np
import jax

from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
from ros_gpu_depthmap_fusion_tpu.pipeline import FusionEngine
from ros_gpu_depthmap_fusion_tpu.parallel import make_mesh
from ros_gpu_depthmap_fusion_tpu.parallel.engine import ShardedFusionEngine


def _cfg():
    return FusionConfig(
        num_depth_streams=4, depth_height=16, depth_width=24,
        crop_min=(-6, -6, -6), crop_max=(6, 6, 6),
        voxel_min=(-6, -6, -6), voxel_max=(6, 6, 6),
        voxel_size=(0.5, 0.5, 0.5), voxel_occupancy_lifetime=3,
        rollbuffer_point_capacity=64, rollbuffer_seq_capacity=8,
        max_points_per_sequence=32,
        # the sharded step reduces packed 10/10/12-quantized partial sums
        # (integer sums commute across shards), so it is BIT-IDENTICAL to
        # the single-chip packed path
        voxel_mean_mode="packed")


def test_sharded_engine_matches_single():
    cfg = _cfg()
    mesh = make_mesh(num_stream=4, num_space=2)
    sh = ShardedFusionEngine(cfg, mesh)
    single = FusionEngine(cfg)
    intr = PinholeIntrinsics.default_for(24, 16)
    eye = np.eye(4, dtype=np.float32)
    rng = np.random.default_rng(0)
    depth = rng.integers(500, 4000,
                         size=(4, 16, 24), dtype=np.uint16)
    for f in range(2):
        for i in range(4):
            sh.add_depthmap(i, depth[i], intr, eye, eye)
            single.add_depthmap(i, depth[i], intr, eye, eye)
        out_s = sh.process(1.0 + f * 0.1)
        out_1 = single.process(1.0 + f * 0.1)

    np.testing.assert_array_equal(
        sh.occupancy_host(out_s), np.asarray(out_1.occupancy_u8))

    raw_s = sh.raw_points_host(out_s)
    raw_1 = np.asarray(out_1.raw_points)[: int(out_1.raw_count)]
    assert raw_s.shape == raw_1.shape
    np.testing.assert_allclose(
        raw_s[np.lexsort(raw_s.T)], raw_1[np.lexsort(raw_1.T)], atol=1e-5)

    fused_s = sh.fused_points_host(out_s)
    fused_1 = np.asarray(out_1.fused_points)[: int(out_1.fused_count)]
    assert fused_s.shape == fused_1.shape
    np.testing.assert_allclose(
        fused_s[np.lexsort(fused_s.T)], fused_1[np.lexsort(fused_1.T)],
        atol=1e-4)
