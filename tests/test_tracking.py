"""Object assembly + tracking tests (reference tracker behavior,
gpu_depthmap_fusion.cpp:2579-2944)."""

import numpy as np
import jax.numpy as jnp

from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
from ros_gpu_depthmap_fusion_tpu.mapping import MappingPipeline
from ros_gpu_depthmap_fusion_tpu.mapping.geometry import RotatedRect
from ros_gpu_depthmap_fusion_tpu.mapping.tracking import (
    CCObjectTrack, TrackComparison, rolled_rrect, track_objects)
from ros_gpu_depthmap_fusion_tpu.mapping.objects import build_objects
from ros_gpu_depthmap_fusion_tpu.mapping.segmentation import segment

GRID = VoxelGrid(lower=(0, 0, 0), upper=(16, 16, 3), cell_size=(1, 1, 1))
CFG = FusionConfig(voxel_min=(0, 0, 0), voxel_max=(16, 16, 3),
                   voxel_size=(1, 1, 1), cc_max_labels_per_layer=32,
                   max_objects=16, object_min_area=0.5)


def make_occ(boxes):
    """boxes: list of (x0, x1, y0, y1, z0, z1)."""
    z, y, x = GRID.shape_zyx
    occ = np.zeros((z, y, x), np.uint8)
    for (x0, x1, y0, y1, z0, z1) in boxes:
        occ[z0:z1, y0:y1, x0:x1] = 1
    return occ


def segment_objects(occ):
    seg = segment(jnp.asarray(occ), max_labels=32, max_objects=16)
    return build_objects(
        labels=np.asarray(seg.labels), num_labels=np.asarray(seg.num_labels),
        merged_of_label=np.asarray(seg.merged_of_label),
        num_merged=int(seg.num_merged),
        voxel_count=np.asarray(seg.voxel_count),
        centroid=np.asarray(seg.centroid),
        vmin=np.asarray(seg.vmin), vmax=np.asarray(seg.vmax), grid=GRID)


def test_build_objects_shapes():
    objs = segment_objects(make_occ([(2, 6, 3, 8, 0, 2)]))
    assert len(objs) == 2  # background + box
    o = objs[1]
    assert o.num_layers == 2
    assert o.topview is not None
    # topview world box: cells x in [2,5], y in [3,7] (lower corners)
    box = o.topview.shapes.world.box
    assert abs(box.area() - 3 * 4) < 1e-6  # corner-point extent (5-2)x(7-3)
    np.testing.assert_allclose(box.center, [3.5, 5.0], atol=1e-6)
    np.testing.assert_array_equal(o.min_coord_voxel, [2, 3, 0])
    np.testing.assert_array_equal(o.max_coord_voxel, [5, 7, 1])
    assert o.num_components == 2  # one per layer
    # contour of each component is the border of the rectangle
    c = o.components[0]
    assert len(c.contour2d_voxel) > 0


def test_rolled_rrect():
    r = RotatedRect((1, 1), (4, 2), 10.0)
    r1 = rolled_rrect(r, 1)
    assert r1.size == (2, 4) and r1.angle == 100.0
    r2 = rolled_rrect(r, 2)
    assert r2.size == (4, 2) and r2.angle == 190.0


def test_comparison_roll_alignment():
    t = CCObjectTrack.__new__(CCObjectTrack)
    from ros_gpu_depthmap_fusion_tpu.mapping.filters import (
        RotatedRectFilter, ObservePredictFilter)
    t.rrect_filter = RotatedRectFilter(RotatedRect((0, 0), (4, 2), 0.0))
    t.score_filter = ObservePredictFilter(0.25, 0.1, 0.9, 0.1)
    t.age = 0.0
    objs = segment_objects(make_occ([(2, 6, 3, 8, 0, 2)]))
    comp = TrackComparison(t, objs[1])
    assert 0 <= comp.best_roll < 4
    assert comp.mean_box_point_dist < 20


def test_track_lifecycle():
    occ1 = make_occ([(2, 6, 3, 8, 0, 2)])
    objs1 = segment_objects(occ1)
    tracks = []
    stats = track_objects(objs1, tracks, min_area=0.5)
    assert stats.num_new_tracks == 1
    assert len(tracks) == 1
    t = tracks[0]
    score0 = t.score

    # same object seen again: track updated, score rises
    stats = track_objects(objs1, tracks, min_area=0.5)
    assert stats.num_updated_tracks == 1 and stats.num_new_tracks == 0
    assert len(tracks) == 1
    assert tracks[0].score > score0

    # object moves slightly: still matched
    objs2 = segment_objects(make_occ([(3, 7, 3, 8, 0, 2)]))
    stats = track_objects(objs2, tracks, min_area=0.5)
    assert stats.num_updated_tracks == 1

    # object disappears: track decays and eventually dies
    objs_empty = segment_objects(make_occ([]))
    for _ in range(200):
        stats = track_objects(objs_empty, tracks, min_area=0.5)
        if not tracks:
            break
    assert not tracks


def test_track_two_objects_compete():
    # two distinct far-apart objects produce two tracks
    objs = segment_objects(make_occ([(1, 4, 1, 4, 0, 1),
                                     (10, 14, 10, 14, 0, 1)]))
    tracks = []
    stats = track_objects(objs, tracks, min_area=0.5)
    assert stats.num_new_tracks == 2

    # both seen again: both updated (not stolen by one track)
    stats = track_objects(objs, tracks, min_area=0.5)
    assert stats.num_updated_tracks == 2


def test_min_area_gate():
    objs = segment_objects(make_occ([(2, 3, 2, 3, 0, 1)]))  # single voxel
    tracks = []
    stats = track_objects(objs, tracks, min_area=0.5)
    assert stats.num_new_tracks == 0  # degenerate area below gate


def test_mapping_pipeline_end_to_end():
    mp = MappingPipeline(CFG, GRID)
    occ = make_occ([(2, 6, 3, 8, 0, 2)]).reshape(-1)
    res = mp.process(jnp.asarray(occ))
    assert res.num_merged == 2
    assert len(res.objects) == 2
    assert res.stats.num_new_tracks == 1
    res2 = mp.process(jnp.asarray(occ))
    assert res2.stats.num_updated_tracks == 1
    assert len(res2.tracks) == 1
