"""Component layer, sync policy, datasets, PNG codec, viz, profiling."""

import os

import numpy as np
import jax.numpy as jnp

from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
from ros_gpu_depthmap_fusion_tpu.core import transforms
from ros_gpu_depthmap_fusion_tpu.pipeline.sync import (
    ApproximateTimeSynchronizer, SlotConfig)
from ros_gpu_depthmap_fusion_tpu.pipeline.component import FusionComponent
from ros_gpu_depthmap_fusion_tpu.pipeline.datasets import (
    SyntheticRigDataset, Sphere, Box, TumRgbdDataset, TUM_DEPTH_SCALE,
    quat_to_rot, rot_to_quat)
from ros_gpu_depthmap_fusion_tpu.utils.png import (
    read_png_gray, write_png_gray)
from ros_gpu_depthmap_fusion_tpu.utils.profiling import (
    MeasureTime, StageTimer)


def test_png_roundtrip_16bit(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 65535, size=(33, 47), dtype=np.uint16)
    p = str(tmp_path / "d.png")
    write_png_gray(p, img)
    back = read_png_gray(p)
    np.testing.assert_array_equal(back, img)


def test_png_roundtrip_8bit(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(9, 14), dtype=np.uint8)
    p = str(tmp_path / "d8.png")
    write_png_gray(p, img)
    np.testing.assert_array_equal(read_png_gray(p), img)


def test_quat_roundtrip():
    rng = np.random.default_rng(2)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    r = quat_to_rot(*q)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    q2 = np.asarray(rot_to_quat(r))
    if np.dot(q, q2) < 0:
        q2 = -q2
    np.testing.assert_allclose(q2, q, atol=1e-6)


def test_sync_trigger_and_optional():
    sync = ApproximateTimeSynchronizer(
        [SlotConfig(trigger=True), SlotConfig(trigger=False, optional=True)],
        slop=0.02)
    assert sync.push(1, 1.00, "b0") is None      # optional alone: no emit
    tup = sync.push(0, 1.001, "a0")
    assert tup is not None
    assert tup[0].data == "a0" and tup[1].data == "b0"
    # trigger alone emits with optional missing
    tup = sync.push(0, 2.0, "a1")
    assert tup is not None
    assert tup[0].data == "a1" and tup[1] is None


def test_sync_two_triggers_wait_for_both():
    sync = ApproximateTimeSynchronizer(
        [SlotConfig(trigger=True), SlotConfig(trigger=True)], slop=0.02)
    assert sync.push(0, 1.0, "a") is None
    tup = sync.push(1, 1.01, "b")
    assert tup is not None and tup[0].data == "a" and tup[1].data == "b"


def test_synthetic_rig_render():
    intr = PinholeIntrinsics.default_for(64, 48)
    ds = SyntheticRigDataset(
        intr, spheres=[Sphere(np.array([0.0, 0, 2.0]), 0.5)],
        ground_z=None, depth_scale=0.001)
    cam = np.eye(4, dtype=np.float32)  # looking along +z
    d = ds.render_depth(cam)
    assert d.shape == (48, 64)
    center = d[24, 31] * 0.001
    assert abs(center - 1.5) < 0.01    # sphere front face at z = 1.5
    assert d[0, 0] == 0                # miss -> invalid


def test_synthetic_rig_ground_and_box():
    intr = PinholeIntrinsics.default_for(64, 48)
    ds = SyntheticRigDataset(
        intr, boxes=[Box(np.array([-0.4, -0.4, 1.6]),
                         np.array([0.4, 0.4, 2.4]))],
        ground_z=0.0, depth_scale=0.001)
    # camera above ground looking straight down: ground at 3 m
    cam = transforms.make_se3(transforms.rot_x(np.pi),  # z now points down
                              np.array([3.0, 0, 3.0]))
    d = ds.render_depth(cam)
    assert abs(d[24, 31] * 0.001 - 3.0) < 0.01
    # camera at origin looking +z hits the box front at 1.6
    d2 = ds.render_depth(np.eye(4, dtype=np.float32))
    assert abs(d2[24, 31] * 0.001 - 1.6) < 0.01


def test_tum_dataset_loader(tmp_path):
    # build a tiny synthetic TUM-format sequence
    root = tmp_path / "rgbd_dataset_freiburg1_tiny"
    (root / "depth").mkdir(parents=True)
    rng = np.random.default_rng(0)
    stamps = [1305031102.1758, 1305031102.2100]
    with open(root / "depth.txt", "w") as f:
        f.write("# depth maps\n# file: x\n# timestamp filename\n")
        for i, s in enumerate(stamps):
            img = rng.integers(0, 30000, size=(48, 64), dtype=np.uint16)
            write_png_gray(str(root / "depth" / f"{s:.4f}.png"), img)
            f.write(f"{s:.4f} depth/{s:.4f}.png\n")
    with open(root / "groundtruth.txt", "w") as f:
        f.write("# ground truth\n")
        f.write(f"{stamps[0]:.4f} 1.0 2.0 1.5 0 0 0 1\n")
        f.write(f"{stamps[1]:.4f} 1.1 2.0 1.5 0 0 0 1\n")
    ds = TumRgbdDataset(str(root))
    assert len(ds) == 2
    frames = list(ds)
    assert frames[0].depth_u16.shape == (48, 64)
    assert frames[0].depth_scale == TUM_DEPTH_SCALE
    np.testing.assert_allclose(frames[0].tf_world_cam[:3, 3], [1.0, 2.0, 1.5])
    assert ds.intrinsics.fx == 517.3  # freiburg1 intrinsics picked


def test_component_streaming_with_resample():
    cfg = FusionConfig(
        num_depth_streams=2, depth_height=16, depth_width=24,
        resample_rate=30.0,
        crop_min=(-6, -6, -6), crop_max=(6, 6, 6),
        voxel_min=(-6, -6, -6), voxel_max=(6, 6, 6),
        voxel_size=(0.5, 0.5, 0.5),
        rollbuffer_point_capacity=64, rollbuffer_seq_capacity=8,
        max_points_per_sequence=32)
    outs = []
    comp = FusionComponent(cfg, on_points=outs.append)
    intr = PinholeIntrinsics.default_for(24, 16)
    eye = np.eye(4, dtype=np.float32)
    depth = np.full((16, 24), 2000, np.uint16)

    # depth arrives on both slots: stashed, not yet processed (resampling)
    assert comp.callback_depthmap(0, 1.00, depth, intr, eye) is None
    assert comp.callback_depthmap(1, 1.001, depth, intr, eye) is None
    assert not outs
    out = comp.tick_resample(1.02)
    assert out is not None and len(outs) == 1
    assert int(out.raw_count) > 0
    # no new input: tick is a no-op (decoupled rates)
    assert comp.tick_resample(1.05) is None
    assert comp.frames_processed == 1


def test_component_immediate_mode_and_lidar():
    cfg = FusionConfig(
        num_depth_streams=1, depth_height=16, depth_width=24,
        num_point_sequences=1, resample_rate=0.0,
        crop_min=(-6, -6, -6), crop_max=(6, 6, 6),
        voxel_min=(-6, -6, -6), voxel_max=(6, 6, 6),
        voxel_size=(0.5, 0.5, 0.5),
        point_sequence_filter_threshold=0.0,
        rollbuffer_point_capacity=64, rollbuffer_seq_capacity=8,
        max_points_per_sequence=32)
    comp = FusionComponent(cfg)
    intr = PinholeIntrinsics.default_for(24, 16)
    eye = np.eye(4, dtype=np.float32)
    t = np.linspace(0, 1, 10)
    comp.callback_point_sequence(
        0.99, np.stack([3 * np.cos(t), 3 * np.sin(t), 0 * t + 1], -1))
    out = comp.callback_depthmap(0, 1.0, np.full((16, 24), 2000, np.uint16),
                                 intr, eye)
    assert out is not None
    assert int(out.seq_selected_count) == 10


def test_component_live_reconfig_preserves_state():
    cfg = FusionConfig(
        num_depth_streams=1, depth_height=16, depth_width=24,
        resample_rate=0.0,
        crop_min=(-6, -6, -6), crop_max=(6, 6, 6),
        voxel_min=(-6, -6, -6), voxel_max=(6, 6, 6),
        voxel_size=(0.5, 0.5, 0.5), voxel_occupancy_lifetime=5,
        rollbuffer_point_capacity=64, rollbuffer_seq_capacity=8,
        max_points_per_sequence=32)
    comp = FusionComponent(cfg)
    intr = PinholeIntrinsics.default_for(24, 16)
    eye = np.eye(4, dtype=np.float32)
    out = comp.callback_depthmap(0, 1.0, np.full((16, 24), 2000, np.uint16),
                                 intr, eye)
    occ_before = int((np.asarray(out.occupancy_u8) > 0).sum())
    comp.set_flying_pixel_config(threshold=0.1, size=2, rot45=False)
    assert comp.cfg.flyingpixels_filter_threshold == 0.1
    # historic occupancy carried across the re-jit
    out2 = comp.callback_depthmap(0, 1.1, np.zeros((16, 24), np.uint16),
                                  intr, eye)
    assert int((np.asarray(out2.occupancy_u8) > 0).sum()) == occ_before


def test_profiling_timers():
    mt = MeasureTime(gain=0.5)
    mt.begin_frame()
    with mt.section("stage_a"):
        pass
    mt.end_frame()
    assert "stage_a" in mt.smoothed
    st = StageTimer()
    with st.stage("convert"):
        pass
    assert "convert" in st.summary_us()
    assert "flying_pixel" in st.stages  # reference schema present


def test_viz_wireframes():
    from ros_gpu_depthmap_fusion_tpu.mapping.tracking import CCObjectTrack
    from ros_gpu_depthmap_fusion_tpu.utils.viz import track_wireframes
    from ros_gpu_depthmap_fusion_tpu.mapping.filters import RotatedRectFilter
    from ros_gpu_depthmap_fusion_tpu.mapping.geometry import RotatedRect
    t = CCObjectTrack.__new__(CCObjectTrack)
    t.rrect_filter = RotatedRectFilter(RotatedRect((1, 2), (2, 1), 15))
    from ros_gpu_depthmap_fusion_tpu.mapping.filters import (
        ObservePredictFilter)
    t.score_filter = ObservePredictFilter(0.25, 0.1, 0.9, 0.1)
    t.score_filter.correct(1.0, [0.9])
    t.age = 1.0
    t.track_id = 7
    markers = track_wireframes([t])
    assert len(markers) == 1
    assert markers[0].track_id == 7  # persistent id, not list index
    assert markers[0].points.shape == (12, 2, 3)
    t.score_filter.correct(1.0, [0.0])
    t.score_filter.correct(1.0, [0.0])
    assert len(track_wireframes([t])) == 0  # below display gate


def test_component_skips_frames_without_intrinsics():
    """Reference guard parity (_component.cpp:118): depth images arriving
    before the slot's CameraInfo are dropped, and processed once it's
    known (via callback_camera_info)."""
    cfg = FusionConfig(
        num_depth_streams=1, depth_height=16, depth_width=24,
        resample_rate=0.0,
        crop_min=(-6, -6, -6), crop_max=(6, 6, 6),
        voxel_min=(-6, -6, -6), voxel_max=(6, 6, 6),
        voxel_size=(0.5, 0.5, 0.5),
        rollbuffer_point_capacity=64, rollbuffer_seq_capacity=8,
        max_points_per_sequence=32)
    comp = FusionComponent(cfg)
    eye = np.eye(4, dtype=np.float32)
    depth = np.full((16, 24), 2000, np.uint16)
    # no intrinsics from any source -> skipped, not processed
    assert comp.callback_depthmap(0, 1.0, depth, None, eye) is None
    assert comp.frames_skipped_no_intrinsics == 1
    assert comp.frames_processed == 0
    # CameraInfo arrives -> subsequent images process
    comp.callback_camera_info(0, PinholeIntrinsics.default_for(24, 16))
    out = comp.callback_depthmap(0, 1.1, depth, None, eye)
    assert out is not None and comp.frames_processed == 1
    assert comp.frames_skipped_no_intrinsics == 1


def test_viz_optional_payloads():
    """The four disabled viz blocks (_component.cpp:528-762) as
    renderer-agnostic builders."""
    from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
    from ros_gpu_depthmap_fusion_tpu.mapping.pipeline import MappingPipeline
    from ros_gpu_depthmap_fusion_tpu.utils import viz
    cfg = FusionConfig(
        num_depth_streams=1, depth_height=8, depth_width=8,
        crop_min=(0, 0, 0), crop_max=(8, 8, 2),
        voxel_min=(0, 0, 0), voxel_max=(8, 8, 2),
        voxel_size=(1.0, 1.0, 1.0), segmentation_backend="device")
    grid = VoxelGrid.from_config(cfg)
    occ = np.zeros(grid.num_cells, np.uint8)
    z, y, x = grid.shape_zyx
    g = occ.reshape(z, y, x)
    g[0, 1:4, 1:4] = 1   # one object spanning two layers
    g[1, 2:4, 2:4] = 1
    g[0, 6:8, 6:8] = 1   # a second single-layer object
    pipe = MappingPipeline(cfg, grid)
    res = pipe.process(jnp.asarray(occ))
    objs = res.objects
    assert len(objs) >= 3  # background + 2
    pts = viz.layer_centroid_points(objs, grid)
    assert pts.ndim == 2 and pts.shape[1] == 3 and len(pts) >= 3
    conn = viz.layer_connection_lines(objs, grid)
    assert conn.points.shape[1:] == (2, 3) and len(conn.points) >= 1
    texts = viz.object_id_texts(objs)
    assert len(texts) == len(objs) - 1
    aabbs = viz.object_aabb_wireframes(objs)
    assert all(m.points.shape == (12, 2, 3) for m in aabbs)
    minboxes = viz.object_min_box_wireframes(objs)
    assert len(minboxes) == len(objs) - 1
    assert all(m.points.shape == (12, 2, 3) for m in minboxes)
