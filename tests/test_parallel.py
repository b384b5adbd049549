"""Multi-device sharding tests on the 8-virtual-CPU-device mesh: the sharded
step must reproduce the single-chip step bit-for-bit."""

import numpy as np
import jax
import jax.numpy as jnp

from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
from ros_gpu_depthmap_fusion_tpu.core import transforms
from ros_gpu_depthmap_fusion_tpu.pipeline import FusionEngine
from ros_gpu_depthmap_fusion_tpu.pipeline.engine import (
    FrameInputs, SequenceBatch)
from ros_gpu_depthmap_fusion_tpu.parallel import (
    make_mesh, build_sharded_fusion_step, sharded_initial_state,
    input_shardings)


def _cfg(num_cams=4):
    return FusionConfig(
        num_depth_streams=num_cams, depth_height=16, depth_width=24,
        num_point_sequences=1,
        crop_min=(-6, -6, -6), crop_max=(6, 6, 6),
        voxel_min=(-6, -6, -6), voxel_max=(6, 6, 6),
        voxel_size=(0.5, 0.5, 0.5),
        rollbuffer_point_capacity=128, rollbuffer_seq_capacity=8,
        max_points_per_sequence=64,
        voxel_occupancy_lifetime=3,
        # the sharded step reduces packed 10/10/12-quantized partial sums
        # (integer sums commute across shards), so it is BIT-IDENTICAL to
        # the single-chip packed path
        voxel_mean_mode="packed",
    )


def _frame_inputs(cfg, seed=0, with_lidar=True):
    rng = np.random.default_rng(seed)
    c = cfg.num_depth_streams
    depth = rng.integers(
        800, 4000, size=(c, cfg.depth_height, cfg.depth_width),
        dtype=np.uint16)
    depth[rng.random(depth.shape) < 0.1] = 0
    intr = np.tile(PinholeIntrinsics.default_for(
        cfg.depth_width, cfg.depth_height).as_array(), (c, 1))
    tfw = np.stack([
        transforms.make_se3(transforms.rot_z(i * 0.7),
                            np.array([i, -i, 0.5 * i]))
        for i in range(c)])

    s_cap = max(1, cfg.num_point_sequences * 4)
    pts = np.zeros((cfg.max_points_per_sequence, 4), np.float32)
    sidx = np.zeros((cfg.max_points_per_sequence,), np.int32)
    n_lidar = 20 if with_lidar else 0
    if with_lidar:
        t = np.linspace(0, 1, n_lidar)
        pts[:n_lidar, 0] = 3 * np.cos(t)
        pts[:n_lidar, 1] = 3 * np.sin(t)
        pts[:n_lidar, 2] = 1.0
        pts[:n_lidar, 3] = 1.0
    sec = np.zeros(s_cap, np.int32)
    nsec = np.zeros(s_cap, np.int32)
    cnt = np.zeros(s_cap, np.int32)
    sec[0] = 5
    cnt[0] = n_lidar
    batch = SequenceBatch(
        points=jnp.asarray(pts), seq_idx=jnp.asarray(sidx),
        seq_sec=jnp.asarray(sec), seq_nsec=jnp.asarray(nsec),
        seq_count=jnp.asarray(cnt),
        seq_tf_move=jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (s_cap, 1, 1))),
        num_points=jnp.int32(n_lidar),
        num_seqs=jnp.int32(1 if with_lidar else 0))
    return FrameInputs(
        depth=jnp.asarray(depth), intrinsics=jnp.asarray(intr, jnp.float32),
        tf_world=jnp.asarray(tfw), tf_crop=jnp.asarray(tfw),
        seq_batch=batch,
        tf_world_move=jnp.eye(4), tf_crop_move=jnp.eye(4),
        now_sec=jnp.int32(5), now_nsec=jnp.int32(0),
        roll_min_sec=jnp.int32(4), roll_min_nsec=jnp.int32(900_000_000))


def _run_single(cfg, grid, inputs_list):
    from ros_gpu_depthmap_fusion_tpu.pipeline.engine import (
        build_fusion_step, initial_state)
    step = build_fusion_step(cfg, grid, donate=False)
    st = initial_state(cfg, grid)
    outs = []
    for inp in inputs_list:
        st, out = step(st, inp)
        outs.append(out)
    return st, outs


def _occupied_cells(occ_u8):
    return set(np.flatnonzero(np.asarray(occ_u8) > 0).tolist())


def test_sharded_matches_single_chip():
    assert len(jax.devices()) == 8
    cfg = _cfg(num_cams=4)
    grid = VoxelGrid.from_config(cfg)
    mesh = make_mesh(num_stream=4, num_space=2)

    inputs = [_frame_inputs(cfg, seed=s) for s in range(3)]
    _, single_outs = _run_single(cfg, grid, inputs)

    step = build_sharded_fusion_step(cfg, grid, mesh)
    st = sharded_initial_state(cfg, grid, mesh)
    inp_sh = input_shardings(mesh)
    for k, inp in enumerate(inputs):
        st, out = step(st, jax.device_put(inp, inp_sh))

    # occupancy must match exactly (sharded grid is padded; trim)
    ref_occ = np.asarray(single_outs[-1].occupancy_u8)
    got_occ = np.asarray(out.occupancy_u8)[: grid.num_cells]
    np.testing.assert_array_equal(got_occ, ref_occ)

    # raw points: same multiset (ordering differs by stream shard)
    ref_raw = np.asarray(single_outs[-1].raw_points)[
        : int(single_outs[-1].raw_count)]
    local_cap = (cfg.depth_pixels_per_stream * 1
                 + cfg.rollbuffer_point_capacity // 4)
    raw = np.asarray(out.raw_points).reshape(4, local_cap, 4)
    counts = np.asarray(out.raw_counts)
    got_raw = np.concatenate([raw[i, : counts[i]] for i in range(4)])
    assert got_raw.shape == ref_raw.shape
    ref_sorted = ref_raw[np.lexsort(ref_raw.T)]
    got_sorted = got_raw[np.lexsort(got_raw.T)]
    np.testing.assert_allclose(got_sorted, ref_sorted, atol=1e-5)

    # fused (average-mode) points: same set of cell means
    ref_f = np.asarray(single_outs[-1].fused_points)[
        : int(single_outs[-1].fused_count)]
    fcnt = np.asarray(out.fused_counts)
    blocks = np.asarray(out.fused_points).reshape(len(fcnt), -1, 4)
    got_f = np.concatenate(
        [blocks[j, : fcnt[j]] for j in range(len(fcnt))])
    assert got_f.shape == ref_f.shape
    ref_fs = ref_f[np.lexsort(ref_f.T)]
    got_fs = got_f[np.lexsort(got_f.T)]
    np.testing.assert_array_equal(got_fs, ref_fs)


def test_sharded_occupied_mode_and_decay():
    cfg = _cfg(num_cams=2).replace(voxel_enable_average=False)
    grid = VoxelGrid.from_config(cfg)
    mesh = make_mesh(num_stream=2, num_space=4)
    step = build_sharded_fusion_step(cfg, grid, mesh)
    st = sharded_initial_state(cfg, grid, mesh)
    inp_sh = input_shardings(mesh)
    inp = _frame_inputs(cfg, seed=7)
    st, out = step(st, jax.device_put(inp, inp_sh))
    occupied0 = _occupied_cells(out.occupancy_u8)
    assert occupied0
    # fused points are cell corners of occupied cells
    blocks = np.asarray(out.fused_points)
    total = int(np.asarray(out.fused_counts).sum())
    assert total == len(occupied0)

    # feed empty frames until full decay
    empty = _frame_inputs(cfg, seed=8, with_lidar=False)._replace(
        depth=jnp.zeros_like(inp.depth),
        now_sec=jnp.int32(50), roll_min_sec=jnp.int32(49))
    for _ in range(cfg.voxel_occupancy_lifetime):
        st, out = step(st, jax.device_put(empty, inp_sh))
    assert not _occupied_cells(out.occupancy_u8)


def test_mesh_shapes():
    mesh = make_mesh(num_space=2)
    assert mesh.shape["stream"] == 4 and mesh.shape["space"] == 2
    mesh1 = make_mesh(num_stream=8, num_space=1)
    assert mesh1.shape["stream"] == 8
