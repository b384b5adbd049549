"""Checkpoint/resume tests."""

import numpy as np
import jax.numpy as jnp

from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
from ros_gpu_depthmap_fusion_tpu.pipeline import FusionEngine
from ros_gpu_depthmap_fusion_tpu.utils import checkpoint


def _cfg():
    return FusionConfig(
        num_depth_streams=1, depth_height=16, depth_width=24,
        crop_min=(-6, -6, -6), crop_max=(6, 6, 6),
        voxel_min=(-6, -6, -6), voxel_max=(6, 6, 6),
        voxel_size=(0.5, 0.5, 0.5), voxel_occupancy_lifetime=5,
        rollbuffer_point_capacity=64, rollbuffer_seq_capacity=8,
        max_points_per_sequence=32)


def test_engine_state_roundtrip(tmp_path):
    cfg = _cfg()
    eng = FusionEngine(cfg)
    intr = PinholeIntrinsics.default_for(24, 16)
    eye = np.eye(4, dtype=np.float32)
    eng.add_depthmap(0, np.full((16, 24), 2000, np.uint16), intr, eye, eye)
    out = eng.process(1.0)
    occ = np.asarray(out.occupancy_u8)

    checkpoint.save_engine_state(str(tmp_path / "ckpt"), eng.state)

    # fresh engine restores the decayed-history state and continues
    eng2 = FusionEngine(cfg)
    eng2.state = checkpoint.restore_engine_state(
        str(tmp_path / "ckpt"), eng2.state)
    np.testing.assert_array_equal(
        np.asarray(eng2.state.historic_occupancy),
        np.asarray(eng.state.historic_occupancy))
    assert int(eng2.state.frame_index) == 1
    # an empty frame decays from the restored history, not from scratch
    out2 = eng2.process(1.1)
    assert int((np.asarray(out2.occupancy_u8) > 0).sum()) == \
        int((occ > 0).sum())


def test_slam_session_roundtrip(tmp_path):
    from ros_gpu_depthmap_fusion_tpu.slam.frontend import RgbdOdometry
    from ros_gpu_depthmap_fusion_tpu.pipeline.datasets import (
        SyntheticRigDataset, Sphere)
    from ros_gpu_depthmap_fusion_tpu.core import transforms
    intr = PinholeIntrinsics.default_for(96, 72)
    rng = np.random.default_rng(0)
    ds = SyntheticRigDataset(
        intr, spheres=[Sphere(rng.uniform(-1, 1, 3) + [0, 0, 3], 0.4)
                       for _ in range(4)], ground_z=None)
    odo = RgbdOdometry(intr, max_keypoints=128, min_inliers=6)
    for f in range(3):
        pose = transforms.make_se3(translation=np.array([0.05 * f, 0, 0]))
        d, i = ds.render(pose)
        odo.process(f / 30.0, i, d * 0.001)
    checkpoint.save_slam_session(str(tmp_path / "slam"), odo)

    odo2 = RgbdOdometry(intr)
    checkpoint.restore_slam_session(str(tmp_path / "slam"), odo2)
    assert len(odo2.trajectory) == len(odo.trajectory)
    np.testing.assert_allclose(odo2.pose, odo.pose)
    assert odo2.landmarks.keys() == odo.landmarks.keys()
    assert len(odo2.observations) == len(odo.observations)
