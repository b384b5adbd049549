"""Multi-device fusion engine: host orchestrator over the sharded step.

The multi-chip counterpart of :class:`pipeline.engine.FusionEngine` — same
ingestion API, but the frame step runs over a ``(stream, space)`` mesh
(cameras data-parallel, voxel grid block-partitioned). Inputs are placed
with their shardings so per-device camera shards transfer independently;
outputs come back as stream-/space-concatenated blocks with helpers to
assemble host views.

Multi-host: build the mesh from ``jax.devices()`` after
``jax.distributed.initialize()``; the same code runs — collectives ride
ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
from ros_gpu_depthmap_fusion_tpu.core import timeutil
from ros_gpu_depthmap_fusion_tpu.pipeline.engine import (
    FrameInputs, FusionEngine, SequenceBatch)
from ros_gpu_depthmap_fusion_tpu.parallel.mesh import (
    SPACE_AXIS, STREAM_AXIS)
from ros_gpu_depthmap_fusion_tpu.parallel.sharded import (
    ShardedFrameOutputs, build_sharded_fusion_step, input_shardings,
    sharded_initial_state)


class ShardedFusionEngine(FusionEngine):
    """FusionEngine whose device step is the sharded multi-chip program."""

    def __init__(self, cfg: FusionConfig, mesh,
                 grid: Optional[VoxelGrid] = None):
        self.mesh = mesh
        self.cfg = cfg
        self.grid = grid or VoxelGrid.from_config(cfg)
        self.n_stream = mesh.shape[STREAM_AXIS]
        self.n_space = mesh.shape[SPACE_AXIS]
        assert cfg.num_depth_streams % self.n_stream == 0
        self.step = build_sharded_fusion_step(cfg, self.grid, mesh)
        self.state = sharded_initial_state(cfg, self.grid, mesh)
        self._inp_shardings = input_shardings(mesh)
        self.enable_mapping = False
        self.mapping = None
        self._stage_cap = cfg.max_points_per_sequence
        self._seq_stage_cap = max(1, cfg.num_point_sequences * 4)
        self.clear()

    def clear(self):
        # plain-array staging (the sharded device_put in process()
        # distributes camera shards directly to their devices, so the
        # single-chip packet transfer does not apply here)
        c = self.cfg.num_depth_streams
        h, w = self.cfg.depth_height, self.cfg.depth_width
        if not hasattr(self, "_depth_np"):
            self._depth_np = np.zeros((c, h, w), np.uint16)
            self._seq_points = np.zeros((self._stage_cap, 4), np.float32)
            self._seq_idx = np.zeros((self._stage_cap,), np.int32)
        self._depth_np.fill(0)
        self._intr = np.zeros((c, 4), np.float32)
        self._tf_world = np.tile(np.eye(4, dtype=np.float32), (c, 1, 1))
        self._tf_crop = np.tile(np.eye(4, dtype=np.float32), (c, 1, 1))
        self._seq_meta = []          # (sec, nsec, count, tf_move)
        self._seq_fill = 0

    def add_depthmap(self, slot: int, depth_u16: np.ndarray,
                     intrinsics, tf_world: np.ndarray,
                     tf_crop: np.ndarray):
        self._depth_np[slot] = depth_u16
        self._intr[slot] = np.asarray(
            intrinsics.as_array() if hasattr(intrinsics, "as_array")
            else intrinsics, np.float32)
        self._tf_world[slot] = tf_world
        self._tf_crop[slot] = tf_crop

    def add_point_sequence(self, points_xyz: np.ndarray, sec: int, nsec: int,
                           tf_move: np.ndarray):
        from ros_gpu_depthmap_fusion_tpu.utils import native
        n = min(len(points_xyz), self._stage_cap - self._seq_fill)
        if n <= 0 or len(self._seq_meta) >= self._seq_stage_cap:
            return
        sl = slice(self._seq_fill, self._seq_fill + n)
        native.stage_points_xyz(np.asarray(points_xyz[:n], np.float32),
                                self._seq_points[sl])
        self._seq_idx[sl] = len(self._seq_meta)
        self._seq_meta.append((sec, nsec, n, np.asarray(tf_move, np.float32)))
        self._seq_fill += n

    def _make_seq_batch_np(self) -> SequenceBatch:
        s_cap = self._seq_stage_cap
        sec = np.zeros(s_cap, np.int32)
        nsec = np.zeros(s_cap, np.int32)
        cnt = np.zeros(s_cap, np.int32)
        tfs = np.tile(np.eye(4, dtype=np.float32), (s_cap, 1, 1))
        for i, (s, ns, n, tf) in enumerate(self._seq_meta):
            sec[i], nsec[i], cnt[i] = s, ns, n
            tfs[i] = tf
        return SequenceBatch(
            points=self._seq_points, seq_idx=self._seq_idx,
            seq_sec=sec, seq_nsec=nsec, seq_count=cnt, seq_tf_move=tfs,
            num_points=np.int32(self._seq_fill),
            num_seqs=np.int32(len(self._seq_meta)))

    def process(self, now_seconds: float,
                tf_world_move: Optional[np.ndarray] = None,
                tf_crop_move: Optional[np.ndarray] = None
                ) -> ShardedFrameOutputs:
        now_ns = timeutil.from_seconds(now_seconds)
        now_sec, now_nsec = timeutil.decode(now_ns)
        min_ns = now_ns - timeutil.from_seconds(
            self.cfg.point_sequence_aggregation_timespan)
        min_sec, min_nsec = timeutil.decode(max(min_ns, 0))
        eye = np.eye(4, dtype=np.float32)
        inp = FrameInputs(
            depth=self._depth_np,
            intrinsics=self._intr,
            tf_world=self._tf_world,
            tf_crop=self._tf_crop,
            seq_batch=self._make_seq_batch_np(),
            tf_world_move=np.asarray(
                eye if tf_world_move is None else tf_world_move, np.float32),
            tf_crop_move=np.asarray(
                eye if tf_crop_move is None else tf_crop_move, np.float32),
            now_sec=np.int32(now_sec), now_nsec=np.int32(now_nsec),
            roll_min_sec=np.int32(min_sec),
            roll_min_nsec=np.int32(min_nsec),
            fp_threshold=np.float32(
                self.cfg.flyingpixels_filter_threshold),
            fp_max_distance=np.float32(self.cfg.flyingpixels_max_distance),
            ps_threshold=np.float32(
                self.cfg.point_sequence_filter_threshold))
        # snapshot reused staging buffers (depth/intr/tf/seq) before the
        # put: device_put may zero-copy numpy (CPU backend) or read during
        # an async transfer while the next frame restages them
        inp = jax.tree.map(np.array, inp)
        inp = jax.device_put(inp, self._inp_shardings)
        self.state, out = self.step(self.state, inp)
        self.clear()
        return out

    # --- host-side assembly of sharded outputs ---
    def raw_points_host(self, out: ShardedFrameOutputs) -> np.ndarray:
        """Concatenate per-stream-shard compacted points into [N, 4]."""
        local_cap = (self.cfg.depth_pixels_per_stream
                     * (self.cfg.num_depth_streams // self.n_stream)
                     + self.cfg.rollbuffer_point_capacity)
        raw = np.asarray(out.raw_points).reshape(self.n_stream, local_cap, 4)
        counts = np.asarray(out.raw_counts)
        return np.concatenate(
            [raw[i, : counts[i]] for i in range(self.n_stream)])

    def fused_points_host(self, out: ShardedFrameOutputs) -> np.ndarray:
        blocks = np.asarray(out.fused_points).reshape(self.n_space, -1, 4)
        counts = np.asarray(out.fused_counts)
        return np.concatenate(
            [blocks[j, : counts[j]] for j in range(self.n_space)])

    def occupancy_host(self, out: ShardedFrameOutputs) -> np.ndarray:
        return np.asarray(out.occupancy_u8)[: self.grid.num_cells]
