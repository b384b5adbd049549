"""Depth-link codec: on-device decoders + reference encoders.

The fusion engine's bottleneck at multi-camera scale is the host->device
link (the reference never faced this: its depth maps arrive in GPU-visible
host memory over PCIe; here 8 cameras move 6.5 MB/frame across a ~40 MB/s
tunnel). The codec moves ~4x fewer bytes, losslessly:

- encoder (``native/fusionhost.cpp fh_depth_encode2``, OpenMP): escape-zero
  row-DPCM — each pixel is a ``B``-bit code; codes ``0..2^B-2`` are
  zigzag(d - previous valid pixel), the top code ``ESC = 2^B-1`` marks a
  hole (depth 0) so no separate mask plane is shipped; each row's first
  valid pixel travels raw (``row_first``); oversized deltas go to a small
  (index, value) exception list.
- decoder (:func:`decode_depth`, pure jnp, static shapes per ``B``):
  bit-unpack via vectorized shift/mask math (no gathers), scatter the few
  exceptions, zigzag-undo, one cumsum along the row, add the row base,
  zero the ESC pixels. Runs inside the fused frame step.

``B`` is bucketed (:data:`B_BUCKETS`) so the jit cache holds a handful of
decoder variants, not one per frame.

Temporal mode (P-frames): when the engine keeps the previous frame's
quantized depth on device, a frame can instead code
``zigzag(curr_q - prev_q)`` per pixel — no row DPCM, no cumsum; decode is
``prev_q + delta`` pointwise (:func:`decode_depth_temporal`). Pixels whose
previous value was a hole carry the full magnitude and ride the exception
list; the encoder picks I vs P per frame by measured payload bytes
(stable real camera streams code 1-2 bits narrower temporally; scenes
with fast content change or hole churn fall back to spatial I-frames).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

# frame bit widths are rounded up to one of these (keeps jit variants few).
# B=17 never overflows: max zigzag(+-65535) = 2^17-2 = ESC-1.
B_BUCKETS = (2, 3, 4, 6, 8, 12, 17)


def bucket_bits(b: int) -> int:
    for cand in B_BUCKETS:
        if b <= cand:
            return cand
    return 17


def words_per_row(width: int, bits: int) -> int:
    return max(1, (width * bits + 31) // 32)


class EncodedDepth(NamedTuple):
    """One frame of compressed depth (all arrays host or device)."""
    words: jnp.ndarray        # [C, H, words_per_row(W, B)] uint32
    row_first: jnp.ndarray    # [C, H] uint16 (first valid pixel per row)
    exc_idx: jnp.ndarray      # [cap] int32 flat pixel index
    exc_zz: jnp.ndarray       # [cap] int32 true zigzag delta
    exc_count: jnp.ndarray    # scalar int32


def _extract_zz(enc: EncodedDepth, width: int, bits: int):
    """Shared decoder front half: per-pixel codes -> (zigzag values with
    exceptions scattered in, hole mask)."""
    c, h, wpr = enc.words.shape
    n = c * h * width
    esc = (1 << bits) - 1
    codes = _extract_codes(enc.words, width, bits)
    is_hole = codes == esc
    zz_stream = jnp.where(is_hole, 0, codes)
    flat = zz_stream.reshape(-1)
    target = jnp.where(
        jnp.arange(enc.exc_idx.shape[0], dtype=jnp.int32) < enc.exc_count,
        enc.exc_idx.astype(jnp.int32), jnp.int32(n))
    flat = flat.at[target].set(enc.exc_zz.astype(jnp.int32), mode="drop")
    return flat.reshape(c, h, width), is_hole


def decode_depth_temporal(enc: EncodedDepth, prev_q: jnp.ndarray,
                          height: int, width: int, bits: int,
                          quant_shift: int = 0):
    """Decode a P-frame: per-pixel ``curr_q = prev_q + unzigzag(code)``
    (no cumsum — cheaper than the spatial decode). ``prev_q`` is the
    previous frame's ``[C, H, W]`` u16 QUANTIZED series (holes = 0),
    exactly as returned by either decoder's second output.

    Returns ``(depth_u16, curr_q)``.
    """
    zz, is_hole = _extract_zz(enc, width, bits)
    delta = (zz >> 1) ^ -(zz & 1)
    curr_q = jnp.where(is_hole, 0, prev_q.astype(jnp.int32) + delta)
    depth = curr_q << quant_shift if quant_shift else curr_q
    return depth.astype(jnp.uint16), curr_q.astype(jnp.uint16)


def _extract_codes(words: jnp.ndarray, width: int, bits: int):
    """Per-pixel ``bits``-wide codes from the packed word stream."""
    c, h, wpr = words.shape
    if 32 % bits == 0:
        # aligned fast path (B in {2, 4, 8} of B_BUCKETS): every field
        # lives inside one word — one shift+mask per pixel. The shifted
        # PLANES are built in [c, h*wpr] layout (large minor dim, full
        # 128-lane vreg utilization) and interleaved by one stack+reshape;
        # shifting in a [.., wpr, ppw] shape instead leaves a ppw-wide
        # minor dim at 1/8 lane utilization (4.6 -> 2.7 ms measured,
        # benchmarks/r4_extract_probe.py)
        ppw = 32 // bits
        flat = words.reshape(c, h * wpr)
        planes = jnp.stack(
            [(flat >> jnp.uint32(k * bits)) & jnp.uint32((1 << bits) - 1)
             for k in range(ppw)], axis=-1)       # [c, h*wpr, ppw]
        return planes.reshape(c, h, wpr * ppw)[..., :width] \
            .astype(jnp.int32)
    # gather-free bit unpack: explode words to a bit tensor (pure
    # shifts + reshapes, so XLA lowers to fused vector ops), then
    # recombine each pixel's `bits`-wide field with a weighted sum
    bit_lanes = (words[..., None]
                 >> jnp.arange(32, dtype=jnp.uint32)) & jnp.uint32(1)
    bit_stream = bit_lanes.reshape(c, h, wpr * 32)[..., :width * bits]
    fields = bit_stream.reshape(c, h, width, bits).astype(jnp.int32)
    weights = jnp.asarray(1 << np.arange(bits, dtype=np.int64),
                          jnp.int32)
    return jnp.sum(fields * weights, axis=-1)


def _row_cumsum(delta: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the row axis. On TPU the XLA cumsum
    lowering costs ~3.4 ms at [3840, 848] (benchmarks/r4_decode_probe.py)
    while one MXU matmul against an upper-triangular ones matrix does the
    same sums in ~0.1 ms — EXACTLY: HIGHEST-precision f32 splits each
    exact-integer operand into bf16 limbs losslessly (|delta| <= 2^17)
    and the f32 accumulation of a row's <= W terms stays below 2^24."""
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        return jnp.cumsum(delta, axis=-1)
    w = delta.shape[-1]
    tri = jnp.triu(jnp.ones((w, w), jnp.float32))   # U[i, j] = 1, i <= j
    flat = delta.astype(jnp.float32).reshape(-1, w)
    out = jax.lax.dot_general(
        flat, tri, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return out.reshape(delta.shape).astype(jnp.int32)


def decode_depth(enc: EncodedDepth, height: int, width: int,
                 bits: int, quant_shift: int = 0,
                 return_series: bool = False):
    """Decode an I-frame to ``[C, H, W]`` uint16. ``bits`` is static (jit
    per bucket).

    ``quant_shift`` must match the encoder's: the DPCM series is in units
    of ``2**quant_shift`` and is scaled back here (holes stay exact 0).
    With ``return_series`` also returns the quantized series (holes = 0)
    — the ``prev_q`` state for a following P-frame.
    """
    zz, is_hole = _extract_zz(enc, width, bits)
    # zigzag undo -> row prefix sum -> add row base -> zero the holes
    delta = (zz >> 1) ^ -(zz & 1)
    series = enc.row_first.astype(jnp.int32)[..., None] + _row_cumsum(
        delta)
    series = jnp.where(is_hole, 0, series)
    depth = series << quant_shift if quant_shift else series
    if return_series:
        return depth.astype(jnp.uint16), series.astype(jnp.uint16)
    return depth.astype(jnp.uint16)


# ---------------------------------------------------------------------------
# Pure-python reference encoder (oracle for the native encoder; slow)
# ---------------------------------------------------------------------------

def encode_depth_reference(depth: np.ndarray, max_exceptions: int = 8192,
                           allowed_bits=B_BUCKETS,
                           quant_shift: int = 0) -> Tuple[dict, int]:
    """Reference implementation of ``fh_depth_encode2`` semantics (pixel
    loops; use only at test scale). Returns exception arrays at their
    actual length (the native binding pads them to the static cap)."""
    c, h, w = depth.shape
    rows = depth.reshape(c * h, w).astype(np.int64)
    if quant_shift:
        nz = rows != 0
        q = np.clip((rows + (1 << (quant_shift - 1))) >> quant_shift,
                    1, 65535 >> quant_shift)
        rows = np.where(nz, q, 0)
    zz = np.zeros((c * h, w), np.int64)
    hole = np.zeros((c * h, w), bool)
    row_first = np.zeros(c * h, np.uint16)
    for r in range(c * h):
        prev = -1
        for x in range(w):
            d = int(rows[r, x])
            if d == 0:
                hole[r, x] = True
                continue
            if prev < 0:
                row_first[r] = d
            else:
                delta = d - prev
                zz[r, x] = (delta << 1) ^ (delta >> 63)
            prev = d
    valid_zz = zz[~hole]
    bits = None
    for b in sorted(allowed_bits):
        if 1 <= b <= 17 and int((valid_zz >= (1 << b) - 1).sum()) \
                <= max_exceptions:
            bits = b
            break
    if bits is None:
        raise ValueError("exception budget exceeded at every allowed width")
    esc = (1 << bits) - 1
    over = (zz >= esc) & ~hole
    exc = np.flatnonzero(over.reshape(-1))
    exc_zz = zz.reshape(-1)[exc].copy()
    codes = zz.copy()
    codes[over] = 0
    codes[hole] = esc
    wpr = words_per_row(w, bits)
    words = np.zeros((c * h, wpr), np.uint32)
    for r in range(c * h):
        for x in range(w):
            z = int(codes[r, x])
            bitpos = x * bits
            wi, sh = bitpos // 32, bitpos % 32
            words[r, wi] |= (z << sh) & 0xFFFFFFFF
            if sh + bits > 32:
                words[r, wi + 1] |= z >> (32 - sh)
    return dict(words=words.reshape(c, h, wpr),
                row_first=row_first.reshape(c, h),
                exc_idx=exc.astype(np.uint32),
                exc_zz=exc_zz.astype(np.uint32)), bits


def quantize_reference(depth: np.ndarray, quant_shift: int) -> np.ndarray:
    """The encoders' quantization: nonzero depth -> clamped multiples of
    2**shift in quantized units (holes stay 0)."""
    d = np.asarray(depth).astype(np.int64)
    if not quant_shift:
        return d.astype(np.uint16)
    nz = d != 0
    q = np.clip((d + (1 << (quant_shift - 1))) >> quant_shift,
                1, 65535 >> quant_shift)
    return np.where(nz, q, 0).astype(np.uint16)


def encode_depth_temporal_reference(depth: np.ndarray,
                                    prev_q: np.ndarray,
                                    max_exceptions: int = 8192,
                                    allowed_bits=B_BUCKETS,
                                    quant_shift: int = 0):
    """Reference P-frame encoder: per-pixel ``zigzag(curr_q - prev_q)``
    with escape-zero holes; pixels whose previous value was a hole carry
    full magnitude and land in the exception list.

    Returns ``(enc dict, bits, curr_q)`` or ``None`` when no allowed
    width fits the exception budget (caller falls back to an I-frame).
    ``row_first`` is all zeros (P-frames carry no row bases).
    """
    c, h, w = depth.shape
    curr_q = quantize_reference(depth, quant_shift)
    cq = curr_q.reshape(c * h, w).astype(np.int64)
    pq = np.asarray(prev_q).reshape(c * h, w).astype(np.int64)
    hole = cq == 0
    delta = cq - pq
    zz = np.where(delta >= 0, delta << 1, ((-delta) << 1) - 1)
    zz[hole] = 0
    bits = None
    for b in sorted(allowed_bits):
        if 1 <= b <= 17 and int(((zz >= (1 << b) - 1) & ~hole).sum()) \
                <= max_exceptions:
            bits = b
            break
    if bits is None:
        return None
    esc = (1 << bits) - 1
    over = (zz >= esc) & ~hole
    exc = np.flatnonzero(over.reshape(-1))
    exc_zz = zz.reshape(-1)[exc].copy()
    codes = zz.copy()
    codes[over] = 0
    codes[hole] = esc
    wpr = words_per_row(w, bits)
    words = np.zeros((c * h, wpr), np.uint32)
    for r in range(c * h):
        for x in range(w):
            z = int(codes[r, x])
            bitpos = x * bits
            wi, sh = bitpos // 32, bitpos % 32
            words[r, wi] |= (z << sh) & 0xFFFFFFFF
            if sh + bits > 32:
                words[r, wi + 1] |= z >> (32 - sh)
    return dict(words=words.reshape(c, h, wpr),
                row_first=np.zeros((c, h), np.uint16),
                exc_idx=exc.astype(np.uint32),
                exc_zz=exc_zz.astype(np.uint32)), bits, curr_q
