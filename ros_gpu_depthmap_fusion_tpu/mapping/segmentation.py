"""On-device 2.5-D object segmentation.

The reference's per-frame segmentation downloads the occupancy grid, runs
OpenCV ``connectedComponentsWithStats`` per z-layer on the CPU (OMP), then
uploads labels for a GPU layer-connection kernel and merges labels back on
the CPU with two passes (``gpu_depthmap_fusion.cpp:1872-2361``). Here the
whole labeled pipeline stays on device as one jitted program:

- :func:`label_layers` — per-layer 8-connected components by iterated
  min-label propagation + pointer jumping (``lax.while_loop`` to fixpoint),
  with labels densely renumbered in raster order of each component's first
  pixel — the same label numbering ``cv::connectedComponents`` produces.
- :func:`layer_connections` — the ``layers_connections`` kernel semantics
  (shader/layers_connections.glsl:70-114; CPU spec cpp:2153-2189): mark
  label pairs that share an (x, y) column between adjacent layers.
- :func:`merge_labels` — cross-layer label merging iterated to full
  convergence. The reference's single bottom-up + top-down sweep
  (cpp:2286-2342) is an approximate union-find that can leave tall zig-zag
  objects split; running to fixpoint strictly refines it (documented
  improvement). The background rule is preserved: label 0 only merges with
  label 0 (cpp:2303, 2332). Merged ids are densely renumbered in ascending
  order of their smallest global label (cpp:2344-2360), so background is
  merged id 0.
- :func:`segment` — full pass returning labels, merged map and per-object
  voxel statistics (count / centroid / AABB) via segment reductions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_NEIGHBORS8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1),
               (0, 1), (1, -1), (1, 0), (1, 1)]


def _shift_with_fill(a: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """Shift a [Y, X] array so position (y, x) sees value from
    (y+dy, x+dx); out-of-range positions get ``fill``."""
    out = jnp.roll(a, shift=(-dy, -dx), axis=(0, 1))
    y, x = a.shape
    yy = jnp.arange(y)[:, None]
    xx = jnp.arange(x)[None, :]
    valid = ((yy + dy >= 0) & (yy + dy < y) &
             (xx + dx >= 0) & (xx + dx < x))
    return jnp.where(valid, out, fill)


def _shift_along(a: jnp.ndarray, s: int, axis: int, fill) -> jnp.ndarray:
    """Shift so position i sees value from i+s (s may be negative);
    vacated positions get ``fill``."""
    out = jnp.roll(a, -s, axis=axis)
    n = a.shape[axis]
    pos = jnp.arange(n)
    valid = (pos + s >= 0) & (pos + s < n)
    shape = [1] * a.ndim
    shape[axis] = n
    return jnp.where(valid.reshape(shape), out, fill)


def _segmented_min_scan(lab: jnp.ndarray, occ: jnp.ndarray, big,
                        axis: int) -> jnp.ndarray:
    """Min of ``lab`` over each maximal run of consecutive occupied pixels
    along ``axis``. Implemented as unrolled doubling (log2(n) rounds of
    shift+min, no gathers, no scan primitives — compiles fast and lowers
    to fused elementwise passes): after round k, ``m_i`` holds the min over
    the run cells in [i, i+2^k) clipped at the first gap, and ``c_i`` says
    whether [i, i+2^k) is gap-free. Forward + backward = whole-run min.
    Lets a label cross an entire straight run in ONE propagation step."""
    n = lab.shape[axis]
    val = jnp.where(occ, lab, big)

    def one_direction(sign):
        m, c = val, occ
        s = 1
        while s < n:
            ms = _shift_along(m, sign * s, axis, big)
            cs = _shift_along(c, sign * s, axis, False)
            m = jnp.minimum(m, jnp.where(c, ms, big))
            c = c & cs
            s *= 2
        return m

    return jnp.minimum(one_direction(1), one_direction(-1))


def _cc_label_one_layer(occ: jnp.ndarray) -> jnp.ndarray:
    """8-connected components of a [Y, X] bool mask. Returns per-pixel root
    flat index (int32) for occupied pixels, and N (=Y*X) for background.

    Per iteration: segmented min-scans along rows and columns (whole runs
    converge at once), one 8-neighborhood min (diagonal/corner hops), and
    two pointer jumps (chain collapse). Real-world layers converge in a
    handful of iterations; the ``while_loop`` guards arbitrary shapes."""
    y, x = occ.shape
    n = y * x
    idx = jnp.arange(n, dtype=jnp.int32).reshape(y, x)
    lab0 = jnp.where(occ, idx, n)
    big = jnp.int32(n)

    def propagate(lab):
        best = jnp.minimum(lab, _segmented_min_scan(lab, occ, big, axis=1))
        best = jnp.minimum(best, _segmented_min_scan(best, occ, big, axis=0))
        best = jnp.where(occ, best, n)
        for dy, dx in _NEIGHBORS8:
            sh = _shift_with_fill(best, dy, dx, n)
            # mask destinations: labels only ever live on occupied cells,
            # so chained shifts cannot bridge across background
            best = jnp.where(occ, jnp.minimum(best, sh), n)
        # pointer jumping: follow the candidate root's own label twice
        flat = best.ravel()
        for _ in range(2):
            flat = jnp.where(flat < n,
                             jnp.take(flat, jnp.minimum(flat, n - 1)), n)
        return flat.reshape(y, x)

    def cond(state):
        lab, changed = state
        return changed

    def body(state):
        lab, _ = state
        new = propagate(lab)
        return new, jnp.any(new != lab)

    lab, _ = jax.lax.while_loop(cond, body, (lab0, jnp.bool_(True)))
    return lab


def label_layers(occ_layers: jnp.ndarray, max_labels: int):
    """Label every [Y, X] layer of a [Z, Y, X] bool stack.

    Returns (labels [Z, Y, X] int32 — dense per-layer ids, 0 = background;
    num_labels [Z] int32 — including background, cv semantics).
    Components beyond ``max_labels - 1`` per layer fold into the last id
    (explicit static cap; size ``max_labels`` generously).
    """
    z, y, x = occ_layers.shape
    n = y * x
    roots = jax.vmap(_cc_label_one_layer)(occ_layers)  # [Z, Y, X] flat roots

    def densify(root_img, occ):
        flat_roots = jnp.where(occ, root_img, n).ravel()
        present = jnp.zeros((n + 1,), jnp.int32).at[flat_roots].set(
            1, mode="drop")
        present = present[:n]
        rank = jnp.cumsum(present)  # 1-based dense id at each root index
        dense = jnp.where(occ, jnp.take(rank, jnp.minimum(root_img, n - 1)),
                          0)
        dense = jnp.minimum(dense, max_labels - 1)
        num = jnp.minimum(jnp.sum(present) + 1, max_labels)
        return dense.astype(jnp.int32), num.astype(jnp.int32)

    labels, num_labels = jax.vmap(densify)(roots, occ_layers)
    return labels, num_labels


def layer_connections(labels: jnp.ndarray, max_labels: int) -> jnp.ndarray:
    """[Z-1, L, L] bool: conn[z, a, b] = some (x, y) column has label a in
    layer z and label b in layer z+1 (cpp:2180-2188)."""
    z = labels.shape[0]
    l = max_labels
    a = labels[:-1].reshape(z - 1, -1)  # [Z-1, YX]
    b = labels[1:].reshape(z - 1, -1)
    zz = jnp.arange(z - 1, dtype=jnp.int32)[:, None]
    flat = (zz * (l * l) + a * l + b).ravel()
    conn = jnp.zeros(((z - 1) * l * l,), jnp.int32).at[flat].max(
        1, mode="drop")
    return conn.reshape(z - 1, l, l).astype(bool)


class MergeResult(NamedTuple):
    merged_of_label: jnp.ndarray  # [Z, L] int32 dense merged id (0 = bg)
    num_merged: jnp.ndarray       # scalar int32 (including background)


def merge_labels(conn: jnp.ndarray, num_labels: jnp.ndarray,
                 max_labels: int) -> MergeResult:
    """Merge per-layer labels across layers to a global object id."""
    zm1, l, _ = conn.shape
    z = zm1 + 1
    t = z * l
    lab_ids = jnp.arange(l, dtype=jnp.int32)
    valid = lab_ids[None, :] < num_labels[:, None]          # [Z, L]
    glob0 = jnp.where(valid, jnp.arange(t, dtype=jnp.int32).reshape(z, l), t)

    # background only merges with background (exactly-one-zero pairs barred)
    a_is_bg = (lab_ids == 0)[None, :, None]
    b_is_bg = (lab_ids == 0)[None, None, :]
    allowed = conn & ~(a_is_bg ^ b_is_bg)

    big = jnp.int32(t)

    def propagate(glob):
        ga = glob[:-1][:, :, None]                          # [Z-1, L, 1]
        gb = glob[1:][:, None, :]                           # [Z-1, 1, L]
        pair_min = jnp.where(allowed, jnp.minimum(ga, gb), big)
        upd_a = jnp.min(pair_min, axis=2)                   # [Z-1, L]
        upd_b = jnp.min(pair_min, axis=1)                   # [Z-1, L]
        ng = glob
        ng = ng.at[:-1].min(upd_a)
        ng = ng.at[1:].min(upd_b)
        # pointer jump through the flat table
        flat = ng.ravel()
        flat = jnp.where(flat < t, jnp.take(flat, jnp.minimum(flat, t - 1)),
                         t)
        return flat.reshape(z, l)

    def cond(state):
        return state[1]

    def body(state):
        glob, _ = state
        new = propagate(glob)
        return new, jnp.any(new != glob)

    glob, _ = jax.lax.while_loop(cond, body, (glob0, jnp.bool_(True)))

    # dense renumber in ascending root order
    flat = glob.ravel()
    is_root = valid.ravel() & (flat == jnp.arange(t, dtype=jnp.int32))
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1        # dense id at root
    merged = jnp.where(valid.ravel(),
                       jnp.take(rank, jnp.minimum(flat, t - 1)), 0)
    return MergeResult(merged.reshape(z, l).astype(jnp.int32),
                       jnp.sum(is_root.astype(jnp.int32)))


class SegmentationResult(NamedTuple):
    labels: jnp.ndarray           # [Z, Y, X] per-layer dense labels
    num_labels: jnp.ndarray       # [Z]
    merged_of_label: jnp.ndarray  # [Z, L]
    merged_map: jnp.ndarray       # [Z, Y, X] merged object id per voxel
    num_merged: jnp.ndarray       # scalar (incl. background id 0)
    # per-object voxel statistics, index = merged id (0 = background):
    voxel_count: jnp.ndarray      # [M]
    centroid: jnp.ndarray         # [M, 3] mean voxel coordinate (x, y, z)
    vmin: jnp.ndarray             # [M, 3] min voxel coordinate
    vmax: jnp.ndarray             # [M, 3] max voxel coordinate


def segment(occ_layers: jnp.ndarray, max_labels: int,
            max_objects: int) -> SegmentationResult:
    """Full segmentation of a [Z, Y, X] occupancy stack (bool or uint)."""
    occ = occ_layers > 0
    z, y, x = occ.shape
    labels, num_labels = label_layers(occ, max_labels)
    conn = layer_connections(labels, max_labels)
    mr = merge_labels(conn, num_labels, max_labels)

    l = max_labels
    flat_lab = (jnp.arange(z, dtype=jnp.int32)[:, None, None] * l + labels)
    merged_map = jnp.take(mr.merged_of_label.ravel(),
                          flat_lab.ravel()).reshape(z, y, x)

    m = max_objects
    # stats over occupied voxels only (background id 0 accumulates the rest)
    ids = jnp.where(occ, jnp.minimum(merged_map, m - 1), m).ravel()
    xs = jnp.broadcast_to(jnp.arange(x, dtype=jnp.float32)[None, None, :],
                          (z, y, x)).ravel()
    ys = jnp.broadcast_to(jnp.arange(y, dtype=jnp.float32)[None, :, None],
                          (z, y, x)).ravel()
    zs = jnp.broadcast_to(jnp.arange(z, dtype=jnp.float32)[:, None, None],
                          (z, y, x)).ravel()
    coords = jnp.stack([xs, ys, zs], axis=-1)

    count = jnp.zeros((m,), jnp.int32).at[ids].add(1, mode="drop")
    sums = jnp.zeros((m, 3), jnp.float32).at[ids].add(coords, mode="drop")
    centroid = sums / jnp.maximum(count[:, None], 1)
    vmin = jnp.full((m, 3), jnp.float32(jnp.inf)).at[ids].min(
        coords, mode="drop")
    vmax = jnp.full((m, 3), -jnp.float32(jnp.inf)).at[ids].max(
        coords, mode="drop")
    vmin = jnp.where(count[:, None] > 0, vmin, 0.0)
    vmax = jnp.where(count[:, None] > 0, vmax, -1.0)

    return SegmentationResult(
        labels=labels, num_labels=num_labels,
        merged_of_label=mr.merged_of_label, merged_map=merged_map,
        num_merged=mr.num_merged,
        voxel_count=count, centroid=centroid,
        vmin=vmin.astype(jnp.int32), vmax=vmax.astype(jnp.int32))
