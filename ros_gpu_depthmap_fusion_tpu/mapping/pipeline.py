"""Mapping pipeline: occupancy grid -> segmented objects -> tracks.

Drives the device segmentation program (:mod:`.segmentation`, one jitted
call per frame) and the small-N host stages (object assembly, tracking),
mirroring the reference's objectSegmentation() + objectTracking() tail
(``gpu_depthmap_fusion.cpp:2552-2944``; SURVEY.md §3.4).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
from ros_gpu_depthmap_fusion_tpu.mapping.segmentation import segment
from ros_gpu_depthmap_fusion_tpu.mapping.objects import (
    CCObject, build_objects)
from ros_gpu_depthmap_fusion_tpu.mapping.tracking import (
    CCObjectTrack, TrackingStats, track_objects)


class MappingResult(NamedTuple):
    objects: List[CCObject]
    tracks: List[CCObjectTrack]
    stats: TrackingStats
    num_merged: int


class MappingPipeline:
    """Stateful (tracks persist across frames) mapping driver."""

    def __init__(self, cfg: FusionConfig, grid: VoxelGrid):
        self.cfg = cfg
        self.grid = grid
        self.tracks: List[CCObjectTrack] = []
        self._segment = jax.jit(functools.partial(
            segment,
            max_labels=cfg.cc_max_labels_per_layer,
            max_objects=cfg.max_objects))

    def process(self, occupancy_u8: jnp.ndarray,
                dt: float | None = None,
                with_contours: bool = True) -> MappingResult:
        """One mapping step on a flat ``[num_cells]`` (or padded) occupancy
        vector."""
        dt = self.cfg.tracking_dt if dt is None else dt
        z, y, x = self.grid.shape_zyx
        occ = occupancy_u8[: self.grid.num_cells].reshape(z, y, x)
        seg = self._segment(occ)
        objects = build_objects(
            labels=np.asarray(seg.labels),
            num_labels=np.asarray(seg.num_labels),
            merged_of_label=np.asarray(seg.merged_of_label),
            num_merged=int(seg.num_merged),
            voxel_count=np.asarray(seg.voxel_count),
            centroid=np.asarray(seg.centroid),
            vmin=np.asarray(seg.vmin),
            vmax=np.asarray(seg.vmax),
            grid=self.grid,
            with_contours=with_contours)
        stats = track_objects(objects, self.tracks,
                              self.cfg.object_min_area, dt)
        return MappingResult(objects=objects, tracks=self.tracks,
                             stats=stats, num_merged=int(seg.num_merged))
