"""ctypes bindings for the native host runtime (``native/libfusionhost.so``).

The library covers the reference's host-side C++ roles (SURVEY.md §2.4):
depth-pair packing, OpenMP LSD radix sort + grouping, connected-component
labeling with stats, Moore contour tracing, and point staging. Every entry
point has a pure-numpy fallback so the framework works without a compiled
library; ``available()`` reports which path is active. The library is built
on demand with ``make`` (gcc in-image; no external deps).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfusionhost.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    i32 = ctypes.c_int32

    lib.fh_pack_depth_pairs.argtypes = [u16p, u32p, i64]
    lib.fh_unpack_depth_pairs.argtypes = [u32p, u16p, i64]
    lib.fh_radix_sort_u32.argtypes = [u32p, u32p, u32p, i64]
    lib.fh_group_sorted_u32.argtypes = [u32p, i64, i64p, i64p, u32p, i64]
    lib.fh_group_sorted_u32.restype = i64
    lib.fh_cc_label_u8.argtypes = [u8p, u16p, i32, i32, i32p, f64p, i32]
    lib.fh_cc_label_u8.restype = i32
    lib.fh_trace_contour.argtypes = [u8p, i32, i32, i32, i32, i32p, i64]
    lib.fh_trace_contour.restype = i64
    lib.fh_stage_points_xyz.argtypes = [f32p, i64, i64, f32p, i64]
    lib.fh_stage_points_xyz.restype = i64
    f64 = ctypes.c_double
    lib.fh_assemble_count.argtypes = [u16p, i32, i32, i32, i32p, i32, i32,
                                      i64p]
    lib.fh_assemble_objects.argtypes = [
        u16p, i32, i32, i32, i32p, i32, i32, f64, f64, f64, f64,
        i64p, i32p,          # group_start, pts_xy
        i64p, i32p, f64p,    # hull_start, hull_xy, layer_shapes
        i64p, i32p,          # tv_start, tv_xy
        i64p, i32p, f64p,    # tv_hull_start, tv_hull_xy, tv_shapes
        i32p, i64p, i32p, i64, f64p]  # comps, contours, cap, comp_shapes
    lib.fh_assemble_objects.restype = i32
    lib.fh_depth_encode2.argtypes = [u16p, i32, i32, i32, i64, i32p, i32,
                                     i32, i32, u32p, u32p, u16p, u32p,
                                     u32p, i64p]
    lib.fh_depth_encode2.restype = i32
    lib.fh_depth_encode_temporal.argtypes = [
        u16p, u16p, i32, i32, i32, i64, i32p, i32, i32, i32, u32p, u32p,
        u16p, u32p, u32p, i64p]
    lib.fh_depth_encode_temporal.restype = i32
    lib.fh_depth_encode_p4.argtypes = [
        u16p, u16p, i32, i32, i32, i32, i32, i32, i64, u32p, u8p,
        u16p, u32p, u32p, i64p]
    lib.fh_depth_encode_p4.restype = i32
    lib.fh_segment_grid.argtypes = [u8p, i32, i32, i32, i32, i32, u16p,
                                    i32p, i32p, i64p, f64p, i32p, i32p]
    lib.fh_segment_grid.restype = i32
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
def pack_depth_pairs(depth_u16: np.ndarray) -> np.ndarray:
    d = np.ascontiguousarray(depth_u16.reshape(-1), np.uint16)
    n = d.size // 2
    lib = _load()
    out = np.empty(n, np.uint32)
    if lib is not None:
        lib.fh_pack_depth_pairs(d, out, n)
        return out
    dd = d.astype(np.uint32).reshape(-1, 2)
    return dd[:, 0] | (dd[:, 1] << 16)


def unpack_depth_pairs(pairs_u32: np.ndarray) -> np.ndarray:
    p = np.ascontiguousarray(pairs_u32, np.uint32)
    lib = _load()
    out = np.empty(p.size * 2, np.uint16)
    if lib is not None:
        lib.fh_unpack_depth_pairs(p, out, p.size)
        return out
    out[0::2] = (p & 0xFFFF).astype(np.uint16)
    out[1::2] = (p >> 16).astype(np.uint16)
    return out


def radix_sort_u32(keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Stable ascending sort; returns (sorted_keys, original_indices)."""
    k = np.ascontiguousarray(keys, np.uint32)
    lib = _load()
    if lib is not None:
        out_k = np.empty_like(k)
        out_i = np.empty(k.size, np.uint32)
        lib.fh_radix_sort_u32(k, out_k, out_i, k.size)
        return out_k, out_i
    order = np.argsort(k, kind="stable").astype(np.uint32)
    return k[order], order


def group_sorted_u32(sorted_keys: np.ndarray, cap: Optional[int] = None):
    """(starts, sizes, values, num_groups) over a sorted key array."""
    k = np.ascontiguousarray(sorted_keys, np.uint32)
    cap = cap or k.size
    lib = _load()
    starts = np.zeros(cap, np.int64)
    sizes = np.zeros(cap, np.int64)
    values = np.zeros(cap, np.uint32)
    if lib is not None and k.size:
        n = int(lib.fh_group_sorted_u32(k, k.size, starts, sizes, values,
                                        cap))
        return starts, sizes, values, n
    if k.size == 0:
        return starts, sizes, values, 0
    is_start = np.empty(k.size, bool)
    is_start[0] = True
    is_start[1:] = k[1:] != k[:-1]
    st = np.flatnonzero(is_start)
    n = min(len(st), cap)
    starts[:n] = st[:n]
    ends = np.concatenate([st[1:], [k.size]])
    sizes[:n] = (ends - st)[:n]
    values[:n] = k[st[:n]]
    return starts, sizes, values, n


def cc_label(img: np.ndarray, max_labels: int = 65535
             ) -> Tuple[np.ndarray, int, np.ndarray, np.ndarray]:
    """8-connected labeling of a [H, W] binary image. Returns
    (labels u16, num_labels incl background, stats [num, 5] (x, y, w, h,
    area), centroids [num, 2])."""
    m = np.ascontiguousarray((np.asarray(img) != 0).astype(np.uint8))
    h, w = m.shape
    labels = np.zeros((h, w), np.uint16)
    lib = _load()
    if lib is not None:
        cap = min(max_labels, h * w + 1)
        stats = np.zeros((cap, 5), np.int32)
        cents = np.zeros((cap, 2), np.float64)
        num = int(lib.fh_cc_label_u8(m, labels.reshape(-1), h, w,
                                     stats.reshape(-1), cents.reshape(-1),
                                     cap))
        return labels, num, stats[:num], cents[:num]
    # numpy fallback: BFS labeling (test-scale)
    from ros_gpu_depthmap_fusion_tpu.mapping.geometry import _label8
    lab = _label8(m.astype(bool)).astype(np.uint16)
    num = int(lab.max()) + 1
    stats = np.zeros((num, 5), np.int32)
    cents = np.zeros((num, 2), np.float64)
    for l in range(num):
        ys, xs = np.nonzero(lab == l) if l else np.nonzero(lab == 0)
        if len(xs) == 0:
            continue
        stats[l] = [xs.min(), ys.min(), xs.max() - xs.min() + 1,
                    ys.max() - ys.min() + 1, len(xs)]
        cents[l] = [xs.mean(), ys.mean()]
    return lab, num, stats, cents


def trace_contour(mask: np.ndarray, sy: int, sx: int) -> np.ndarray:
    """Moore contour from the component's first raster pixel; [K, 2] (x, y)."""
    lib = _load()
    m = np.ascontiguousarray((np.asarray(mask) != 0).astype(np.uint8))
    h, w = m.shape
    if lib is not None:
        cap = 4 * (h + w) + 8 * max(h, w)
        out = np.zeros(2 * cap, np.int32)
        n = int(lib.fh_trace_contour(m, h, w, sy, sx, out, cap))
        if n < cap:
            return out[:2 * n].reshape(-1, 2)
        # retry with the worst-case bound
        cap = 4 * h * w + 4
        out = np.zeros(2 * cap, np.int32)
        n = int(lib.fh_trace_contour(m, h, w, sy, sx, out, cap))
        return out[:2 * n].reshape(-1, 2)
    from ros_gpu_depthmap_fusion_tpu.mapping.geometry import _trace_from
    return _trace_from(m.astype(bool), sy, sx)


def assemble_objects(labels: np.ndarray, merged_of_label: np.ndarray,
                     num_merged: int, cell_size_xy, lower_xy):
    """Native per-frame object assembly (fh_assemble_objects): groups the
    segmentation's labeled voxels by (merged object, layer), computes convex
    hulls, min-area rects and min enclosing circles in voxel AND world xy
    coordinates, per-object topviews, and per-component Moore contours.

    Returns a dict of flat arrays (see keys below), or ``None`` when the
    native library is unavailable (caller falls back to the Python path).
    """
    lib = _load()
    if lib is None:
        return None
    lab = np.ascontiguousarray(labels, np.uint16)
    z, h, w = lab.shape
    lut = np.ascontiguousarray(merged_of_label, np.int32)
    L = lut.shape[1]
    M = int(num_merged)
    if M <= 0:
        M = 1
    sizes = np.zeros(2, np.int64)
    lib.fh_assemble_count(lab.reshape(-1), z, h, w, lut.reshape(-1), L, M,
                          sizes)
    fg, ncomp = int(sizes[0]), int(sizes[1])
    ng = M * z
    group_start = np.zeros(ng + 1, np.int64)
    pts_xy = np.zeros(max(2 * fg, 2), np.int32)
    hull_start = np.zeros(ng + 1, np.int64)
    hull_xy = np.zeros(max(2 * fg, 2), np.int32)
    layer_shapes = np.zeros(16 * ng, np.float64)
    tv_start = np.zeros(M + 1, np.int64)
    tv_xy = np.zeros(max(2 * fg, 2), np.int32)
    tv_hull_start = np.zeros(M + 1, np.int64)
    tv_hull_xy = np.zeros(max(2 * fg, 2), np.int32)
    tv_shapes = np.zeros(16 * M, np.float64)
    comp_zlm = np.zeros(max(3 * ncomp, 3), np.int32)
    contour_start = np.zeros(ncomp + 1, np.int64)
    contour_cap = 4 * fg + 16 * ncomp + 64
    contour_xy = np.zeros(2 * contour_cap, np.int32)
    comp_shapes = np.zeros(max(16 * ncomp, 16), np.float64)
    nc = int(lib.fh_assemble_objects(
        lab.reshape(-1), z, h, w, lut.reshape(-1), L, M,
        float(cell_size_xy[0]), float(cell_size_xy[1]),
        float(lower_xy[0]), float(lower_xy[1]),
        group_start, pts_xy, hull_start, hull_xy, layer_shapes,
        tv_start, tv_xy, tv_hull_start, tv_hull_xy, tv_shapes,
        comp_zlm, contour_start, contour_xy, contour_cap, comp_shapes))
    if nc < 0:
        return None
    return dict(
        num_merged=M, num_layers=z,
        group_start=group_start, pts_xy=pts_xy.reshape(-1, 2),
        hull_start=hull_start, hull_xy=hull_xy.reshape(-1, 2),
        layer_shapes=layer_shapes.reshape(ng, 16),
        tv_start=tv_start, tv_xy=tv_xy.reshape(-1, 2),
        tv_hull_start=tv_hull_start, tv_hull_xy=tv_hull_xy.reshape(-1, 2),
        tv_shapes=tv_shapes.reshape(M, 16),
        comp_zlm=comp_zlm.reshape(-1, 3)[:nc],
        contour_start=contour_start[:nc + 1],
        contour_xy=contour_xy.reshape(-1, 2),
        comp_shapes=comp_shapes.reshape(-1, 16)[:nc])


def segment_grid(occ_zyx: np.ndarray, max_labels: int, max_objects: int):
    """Host segmentation backend (fh_segment_grid): per-layer 8-connected
    CC + cross-layer merge to fixpoint + per-object voxel stats, matching
    the device program in mapping/segmentation.py bit-for-bit on labels and
    merge ids. Returns a dict or None without the native library."""
    lib = _load()
    if lib is None:
        return None
    occ = np.ascontiguousarray((np.asarray(occ_zyx) != 0).astype(np.uint8))
    z, h, w = occ.shape
    labels = np.zeros((z, h, w), np.uint16)
    num_labels = np.zeros(z, np.int32)
    merged = np.zeros((z, max_labels), np.int32)
    count = np.zeros(max_objects, np.int64)
    cen = np.zeros((max_objects, 3), np.float64)
    vmin = np.zeros((max_objects, 3), np.int32)
    vmax = np.zeros((max_objects, 3), np.int32)
    nm = int(lib.fh_segment_grid(
        occ.reshape(-1), z, h, w, max_labels, max_objects,
        labels.reshape(-1), num_labels, merged.reshape(-1), count,
        cen.reshape(-1), vmin.reshape(-1), vmax.reshape(-1)))
    return dict(labels=labels, num_labels=num_labels, merged_of_label=merged,
                num_merged=nm, voxel_count=count, centroid=cen,
                vmin=vmin, vmax=vmax)


def depth_encode(depth_u16: np.ndarray, max_exceptions: int = 8192,
                 allowed_bits=None, out=None, guess_bits: int = -1,
                 quant_shift: int = 0):
    """Compress a ``[C, H, W]`` u16 depth block with the native escape-zero
    row-DPCM encoder (see ops/depth_codec.py for format + decoder).

    ``quant_shift`` > 0 quantizes nonzero depths to multiples of
    ``2**quant_shift`` before the DPCM (bounded loss: error <=
    ``2**(quant_shift-1)`` depth units; holes exact) — the decoder must be
    called with the same shift.

    ``out`` optionally provides preallocated C-contiguous destinations
    ``dict(words u32[rows*wpr_max], row_first u16[rows],
    exc_idx u32[cap], exc_zz u32[cap])`` (e.g. views into the frame
    packet) so the encoder writes in place.

    Returns ``(dict(words, row_first, exc_idx, exc_zz, exc_count), bits)``
    or ``None`` when the native library is missing or every allowed width
    overflows the exception budget (caller ships raw depth instead).
    """
    from ros_gpu_depthmap_fusion_tpu.ops.depth_codec import B_BUCKETS
    lib = _load()
    if lib is None:
        return None
    d = np.ascontiguousarray(depth_u16, np.uint16)
    c, h, w = d.shape
    rows = c * h
    allowed = np.asarray(sorted(B_BUCKETS if allowed_bits is None
                                else allowed_bits), np.int32)
    wpr_max = (w * int(allowed[-1]) + 31) // 32
    global _enc_scratch
    if _enc_scratch is None or _enc_scratch.size < rows * w:
        _enc_scratch = np.empty(rows * w, np.uint32)
    zz_tmp = _enc_scratch[: rows * w]
    if out is None:
        out = dict(words=np.zeros(rows * wpr_max, np.uint32),
                   row_first=np.zeros(rows, np.uint16),
                   exc_idx=np.zeros(max_exceptions, np.uint32),
                   exc_zz=np.zeros(max_exceptions, np.uint32))
    meta = np.zeros(2, np.int64)
    bits = int(lib.fh_depth_encode2(
        d.reshape(-1), c, h, w, max_exceptions, allowed, len(allowed),
        int(guess_bits), int(quant_shift), zz_tmp, out["words"],
        out["row_first"], out["exc_idx"], out["exc_zz"], meta))
    if bits < 0:
        return None
    wpr = max(1, int(meta[1]))
    return dict(
        words=out["words"][: rows * wpr].reshape(c, h, wpr),
        row_first=out["row_first"].reshape(c, h),
        exc_idx=out["exc_idx"], exc_zz=out["exc_zz"],
        exc_count=np.int32(meta[0])), bits


_enc_scratch = None


def depth_encode_temporal(depth_u16: np.ndarray, prev_q: np.ndarray,
                          max_exceptions: int = 8192, allowed_bits=None,
                          out=None, guess_bits: int = -1,
                          quant_shift: int = 0, curr_q_out=None):
    """P-frame encoder (``fh_depth_encode_temporal``): per-pixel
    ``zigzag(curr_q - prev_q)`` with escape-zero holes. ``prev_q`` is the
    previous frame's quantized series (same shape, holes = 0).

    Returns ``(dict(words, row_first(zeros-view), exc_idx, exc_zz,
    exc_count), bits, curr_q)`` or ``None`` when the native library is
    missing or every allowed width overflows the exception budget (the
    caller falls back to an I-frame).
    """
    from ros_gpu_depthmap_fusion_tpu.ops.depth_codec import B_BUCKETS
    lib = _load()
    if lib is None:
        return None
    d = np.ascontiguousarray(depth_u16, np.uint16)
    p = np.ascontiguousarray(prev_q, np.uint16)
    c, h, w = d.shape
    rows = c * h
    allowed = np.asarray(sorted(B_BUCKETS if allowed_bits is None
                                else allowed_bits), np.int32)
    wpr_max = (w * int(allowed[-1]) + 31) // 32
    global _enc_scratch
    if _enc_scratch is None or _enc_scratch.size < rows * w:
        _enc_scratch = np.empty(rows * w, np.uint32)
    zz_tmp = _enc_scratch[: rows * w]
    if out is None:
        out = dict(words=np.zeros(rows * wpr_max, np.uint32),
                   row_first=np.zeros(rows, np.uint16),
                   exc_idx=np.zeros(max_exceptions, np.uint32),
                   exc_zz=np.zeros(max_exceptions, np.uint32))
    curr_q = (curr_q_out if curr_q_out is not None
              else np.empty((c, h, w), np.uint16))
    meta = np.zeros(2, np.int64)
    bits = int(lib.fh_depth_encode_temporal(
        d.reshape(-1), p.reshape(-1), c, h, w, max_exceptions, allowed,
        len(allowed), int(guess_bits), int(quant_shift), zz_tmp,
        out["words"], curr_q.reshape(-1), out["exc_idx"], out["exc_zz"],
        meta))
    if bits < 0:
        return None
    wpr = max(1, int(meta[1]))
    out["row_first"][:] = 0  # P-frames carry no row bases
    return dict(
        words=out["words"][: rows * wpr].reshape(c, h, wpr),
        row_first=out["row_first"].reshape(c, h),
        exc_idx=out["exc_idx"], exc_zz=out["exc_zz"],
        exc_count=np.int32(meta[0])), bits, curr_q


def depth_encode_p4(depth_u16: np.ndarray, prev_q: np.ndarray,
                    budget: int, max_exceptions: int = 8192,
                    out=None, quant_shift: int = 0, hysteresis: int = 0,
                    curr_q_out=None):
    """p4 P-frame encoder (``fh_depth_encode_p4``): 4-pixel-group flags +
    per-row byte-budgeted literals with hysteresis quantization (format:
    ops/depth_codec.py). ``out`` optionally provides C-contiguous
    ``dict(flags u32[rows*fw], lits u8[rows*budget], exc_idx u32[cap],
    exc_zz u32[cap])`` destinations (e.g. packet views).

    Returns ``(dict(flags, lits, exc_idx, exc_zz, exc_count, lit_total,
    spilled), curr_q)`` or ``None`` (native lib missing / exception
    overflow — caller falls back to an I-frame)."""
    lib = _load()
    if lib is None:
        return None
    d = np.ascontiguousarray(depth_u16, np.uint16)
    p = np.ascontiguousarray(prev_q, np.uint16)
    c, h, w = d.shape
    rows = c * h
    gw = -(-w // 4)
    fw = -(-gw // 32)
    if out is None:
        out = dict(flags=np.zeros(rows * fw, np.uint32),
                   lits=np.zeros(rows * budget, np.uint8),
                   exc_idx=np.zeros(max_exceptions, np.uint32),
                   exc_zz=np.zeros(max_exceptions, np.uint32))
    curr_q = (curr_q_out if curr_q_out is not None
              else np.empty((c, h, w), np.uint16))
    meta = np.zeros(3, np.int64)
    rc = int(lib.fh_depth_encode_p4(
        d.reshape(-1), p.reshape(-1), c, h, w, int(quant_shift),
        int(hysteresis), int(budget), max_exceptions, out["flags"],
        out["lits"], curr_q.reshape(-1), out["exc_idx"], out["exc_zz"],
        meta))
    if rc < 0:
        return None
    return dict(
        flags=out["flags"][: rows * fw].reshape(rows, fw),
        lits=out["lits"][: rows * budget],
        exc_idx=out["exc_idx"], exc_zz=out["exc_zz"],
        exc_count=np.int32(meta[0]), lit_total=int(meta[1]),
        spilled=int(meta[2])), curr_q


def stage_points_xyz(xyz: np.ndarray, out: np.ndarray) -> int:
    """Copy [N, >=3] float32 points into an [cap, 4] staging buffer with
    w = 1; returns the number staged."""
    src = np.ascontiguousarray(xyz, np.float32)
    lib = _load()
    cap = out.shape[0]
    if lib is not None and out.flags["C_CONTIGUOUS"]:
        return int(lib.fh_stage_points_xyz(
            src.reshape(src.shape[0], -1), src.shape[0], src.shape[1]
            if src.ndim > 1 else 3, out.reshape(-1), cap))
    n = min(len(src), cap)
    out[:n, :3] = src[:n, :3]
    out[:n, 3] = 1.0
    return n
