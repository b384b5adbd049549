"""Mask predicates and deterministic stream compaction.

- :func:`crop_points` — ``shader/crop_points.glsl:47-66``: AABB test in the
  crop frame, ANDed into the validity mask.
- :func:`compact` — replaces ``shader/apply_point_mask.glsl``'s atomic-counter
  compaction (glsl:50-54, output order nondeterministic) with the
  deterministic, *stable* TPU idiom: ``mask -> exclusive cumsum -> scatter``.
  Valid points keep their input order; the valid count replaces the
  reference's scratchpad readback (gpu_depthmap_fusion.cpp:1675-1677) and
  stays on device.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def crop_points(points: jnp.ndarray,
                mask: jnp.ndarray,
                lower: Tuple[float, float, float],
                upper: Tuple[float, float, float]) -> jnp.ndarray:
    """AND an axis-aligned-box containment test into the mask.

    Args:
        points: ``[..., 4]`` points in the crop frame.
        mask:   ``[...]`` bool.
    """
    lo = jnp.asarray(lower, dtype=points.dtype)
    hi = jnp.asarray(upper, dtype=points.dtype)
    xyz = points[..., :3]
    inside = jnp.all((xyz >= lo) & (xyz <= hi), axis=-1)
    return mask & inside


def compact(values: jnp.ndarray,
            mask: jnp.ndarray,
            capacity: int,
            fill_value=0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stable stream compaction of ``values`` rows where ``mask`` is true.

    Args:
        values:   ``[N, ...]`` input rows.
        mask:     ``[N]`` bool.
        capacity: static output length (rows beyond it are dropped; callers
            size it to N for lossless compaction).
        fill_value: value for unused output rows.

    Returns:
        (out ``[capacity, ...]``, count scalar int32). Rows ``[0, count)``
        hold the valid inputs in their original order.
    """
    n = values.shape[0]
    mask_i = mask.astype(jnp.int32)
    # exclusive prefix sum = output slot per valid element
    slots = jnp.cumsum(mask_i) - mask_i
    count = jnp.minimum(jnp.sum(mask_i), capacity)
    # invalid elements are routed out of bounds and dropped by the scatter
    target = jnp.where(mask, slots, capacity)
    out_shape = (capacity,) + values.shape[1:]
    out = jnp.full(out_shape, fill_value, dtype=values.dtype)
    out = out.at[target].set(values, mode="drop")
    return out, count


def compact_multi(arrays, mask: jnp.ndarray, capacity: int):
    """Compact several parallel arrays with one shared mask/slot computation.

    Returns (tuple of compacted arrays, count).
    """
    n = mask.shape[0]
    mask_i = mask.astype(jnp.int32)
    slots = jnp.cumsum(mask_i) - mask_i
    count = jnp.minimum(jnp.sum(mask_i), capacity)
    target = jnp.where(mask, slots, capacity)
    outs = []
    for a in arrays:
        out = jnp.zeros((capacity,) + a.shape[1:], dtype=a.dtype)
        outs.append(out.at[target].set(a, mode="drop"))
    return tuple(outs), count
