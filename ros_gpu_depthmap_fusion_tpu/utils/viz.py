"""Visualization payload builders.

Replaces the reference's RViz publishing (``_component.cpp:518-967``) with
renderer-agnostic structures: wireframe line lists for tracked-object boxes
(score-alpha coloring, score >= 0.65 display gate as at cpp:928) and the
centroid debug cloud (``out/VizPcl``, cpp:333-384).
"""

from __future__ import annotations

import dataclasses
from typing import TYPE_CHECKING, List, Sequence

import numpy as np

if TYPE_CHECKING:  # avoid a circular import at runtime (tracking -> objects
    from ros_gpu_depthmap_fusion_tpu.mapping.tracking import CCObjectTrack

SCORE_DISPLAY_THRESHOLD = 0.65  # _component.cpp:928


@dataclasses.dataclass
class WireframeMarker:
    """One tracked box as a line list (pairs of endpoints)."""
    track_id: int
    points: np.ndarray      # [K, 2, 3] line segments in world coords
    color_rgba: np.ndarray  # [4], alpha = track score
    score: float
    age: float


def track_wireframes(tracks: Sequence[CCObjectTrack],
                     z_range=(0.0, 2.0),
                     score_threshold: float = SCORE_DISPLAY_THRESHOLD
                     ) -> List[WireframeMarker]:
    """Box wireframes (12 edges) for tracks above the score gate."""
    out: List[WireframeMarker] = []
    z0, z1 = z_range
    for t in tracks:
        if t.score < score_threshold:
            continue
        corners2d = t.rrect_filter.rrect.points()         # [4, 2]
        bottom = np.concatenate(
            [corners2d, np.full((4, 1), z0)], axis=-1)
        top = np.concatenate(
            [corners2d, np.full((4, 1), z1)], axis=-1)
        segs = []
        for k in range(4):
            segs.append([bottom[k], bottom[(k + 1) % 4]])
            segs.append([top[k], top[(k + 1) % 4]])
            segs.append([bottom[k], top[k]])
        out.append(WireframeMarker(
            track_id=t.track_id, points=np.asarray(segs),
            color_rgba=np.array([0.1, 0.9, 0.2, min(1.0, t.score)]),
            score=t.score, age=t.age))
    return out


def centroid_cloud(objects) -> np.ndarray:
    """[N, 3] world centroids of segmented objects (skipping background)."""
    pts = []
    for o in objects[1:]:
        pts.append(o.center_coord_world)
    return np.asarray(pts, np.float32).reshape(-1, 3)
