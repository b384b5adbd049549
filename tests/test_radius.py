import numpy as np
import jax.numpy as jnp

from ros_gpu_depthmap_fusion_tpu.core import transforms
from ros_gpu_depthmap_fusion_tpu.ops.radius import filter_radius_outliers
from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
from ros_gpu_depthmap_fusion_tpu.pipeline import FusionEngine


def test_radius_filter_removes_isolated_points():
    rng = np.random.default_rng(0)
    cluster = rng.normal(0, 0.02, size=(50, 3)) + [1.0, 1.0, 1.0]
    isolated = np.array([[3.0, -3.0, 2.0], [-2.5, 2.5, 0.5]])
    pts = transforms.to_homogeneous(
        np.concatenate([cluster, isolated]).astype(np.float32))
    mask = np.ones(len(pts), bool)
    out = filter_radius_outliers(
        jnp.asarray(pts), jnp.asarray(mask),
        (-4, -4, -4), (4, 4, 4), radius=0.2, min_neighbors=3)
    out = np.asarray(out)
    assert out[:50].all()          # dense cluster survives
    assert not out[50:].any()      # isolated points rejected


def test_radius_filter_respects_input_mask():
    pts = transforms.to_homogeneous(
        np.zeros((10, 3), np.float32))  # all in one cell
    mask = np.zeros(10, bool)
    mask[:2] = True
    out = np.asarray(filter_radius_outliers(
        jnp.asarray(pts), jnp.asarray(mask),
        (-1, -1, -1), (1, 1, 1), radius=0.5, min_neighbors=3))
    # only 2 valid points in the cell -> below min_neighbors
    assert not out.any()


def test_engine_with_radius_filter():
    cfg = FusionConfig(
        num_depth_streams=1, depth_height=16, depth_width=24,
        crop_min=(-6, -6, -6), crop_max=(6, 6, 6),
        voxel_min=(-6, -6, -6), voxel_max=(6, 6, 6),
        voxel_size=(0.5, 0.5, 0.5),
        enable_radius_filter=True,
        radius_min=(-6, -6, -6), radius_max=(6, 6, 6),
        radius_filter_radius=0.3,
        rollbuffer_point_capacity=64, rollbuffer_seq_capacity=8,
        max_points_per_sequence=32)
    eng = FusionEngine(cfg)
    intr = PinholeIntrinsics.default_for(24, 16)
    eye = np.eye(4, dtype=np.float32)
    depth = np.full((16, 24), 2000, np.uint16)
    eng.add_depthmap(0, depth, intr, eye, eye)
    out = eng.process(1.0)
    # a dense wall passes the density gate
    assert int(out.raw_count) > 100
