"""Depth-link codec: on-device decoder + reference encoder.

The fusion engine's bottleneck at multi-camera scale is the host->device
link (the reference never faced this: its depth maps arrive in GPU-visible
host memory over PCIe; here 8 cameras move 6.5 MB/frame across a ~65 MB/s
tunnel). The codec moves ~3-5x fewer bytes, losslessly:

- encoder (``native/fusionhost.cpp fh_depth_encode``, OpenMP): masked
  row-DPCM — holes (0) to a 1-bit mask plane, each row's first valid pixel
  raw, remaining valid pixels zigzag(d - prev_valid) packed at a
  frame-constant bit width ``B``; oversized deltas go to a small
  (index, value) exception list.
- decoder (:func:`decode_depth`, pure jnp, static shapes per ``B``):
  bit-unpack via vectorized shift/mask math (no gathers), scatter the few
  exceptions, zigzag-undo, one cumsum along the row, add the row base,
  apply the mask. Runs inside the fused frame step.

``B`` is bucketed (:data:`B_BUCKETS`) so the jit cache holds a handful of
decoder variants, not one per frame.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

# frame bit widths are rounded up to one of these (keeps jit variants few)
B_BUCKETS = (2, 4, 6, 8, 12, 17)


def bucket_bits(b: int) -> int:
    for cand in B_BUCKETS:
        if b <= cand:
            return cand
    return 17


def words_per_row(width: int, bits: int) -> int:
    return max(1, (width * bits + 31) // 32)


def mask_words_per_row(width: int) -> int:
    return (width + 31) // 32


class EncodedDepth(NamedTuple):
    """One frame of compressed depth (all arrays host or device)."""
    words: jnp.ndarray        # [C, H, words_per_row(W, B)] uint32
    mask_words: jnp.ndarray   # [C, H, ceil(W/32)] uint32
    row_first: jnp.ndarray    # [C, H] uint16 (first valid pixel per row)
    exc_idx: jnp.ndarray      # [cap] int32 flat pixel index
    exc_zz: jnp.ndarray       # [cap] int32 true zigzag delta
    exc_count: jnp.ndarray    # scalar int32


def decode_depth(enc: EncodedDepth, height: int, width: int,
                 bits: int) -> jnp.ndarray:
    """Decode to ``[C, H, W]`` uint16. ``bits`` is static (jit per bucket)."""
    c, h, wpr = enc.words.shape
    n = c * h * width

    if bits == 0:
        deltas = jnp.zeros((c, h, width), jnp.int32)
    else:
        # gather-free bit unpack: explode words to a bit tensor (pure
        # shifts + reshapes, so XLA lowers to fused vector ops), then
        # recombine each pixel's `bits`-wide field with a weighted sum
        bit_lanes = (enc.words[..., None]
                     >> jnp.arange(32, dtype=jnp.uint32)) & jnp.uint32(1)
        bit_stream = bit_lanes.reshape(c, h, wpr * 32)[..., :width * bits]
        fields = bit_stream.reshape(c, h, width, bits).astype(jnp.int32)
        weights = jnp.asarray(1 << np.arange(bits, dtype=np.int64),
                              jnp.int32)
        deltas = jnp.sum(fields * weights, axis=-1)

    # exceptions: scatter the true zigzag values over the zeros
    flat = deltas.reshape(-1)
    target = jnp.where(
        jnp.arange(enc.exc_idx.shape[0], dtype=jnp.int32) < enc.exc_count,
        enc.exc_idx.astype(jnp.int32), jnp.int32(n))
    flat = flat.at[target].set(enc.exc_zz.astype(jnp.int32), mode="drop")
    zz = flat.reshape(c, h, width)

    # zigzag undo -> row prefix sum -> add row base -> mask
    delta = (zz >> 1) ^ -(zz & 1)
    series = enc.row_first.astype(jnp.int32)[..., None] + jnp.cumsum(
        delta, axis=-1)

    mask_lanes = (enc.mask_words[..., None]
                  >> jnp.arange(32, dtype=jnp.uint32)) & jnp.uint32(1)
    mwpr = enc.mask_words.shape[-1]
    mask_bit = mask_lanes.reshape(c, h, mwpr * 32)[..., :width]
    return jnp.where(mask_bit > 0, series, 0).astype(jnp.uint16)


# ---------------------------------------------------------------------------
# Pure-python reference encoder (oracle for the native encoder; slow)
# ---------------------------------------------------------------------------

def encode_depth_reference(depth: np.ndarray, max_exceptions: int = 8192
                           ) -> Tuple[dict, int]:
    """Reference implementation of ``fh_depth_encode`` semantics (pixel
    loops; use only at test scale)."""
    c, h, w = depth.shape
    rows = depth.reshape(c * h, w).astype(np.int64)
    zz = np.zeros((c * h, w), np.uint32)
    row_first = np.zeros(c * h, np.uint16)
    for r in range(c * h):
        prev = -1
        for x in range(w):
            d = int(rows[r, x])
            z = 0
            if d != 0:
                if prev < 0:
                    row_first[r] = d
                else:
                    delta = d - prev
                    z = (delta << 1) ^ (delta >> 63)
                prev = d
            zz[r, x] = z & 0xFFFFFFFF
    need = np.zeros(zz.shape, np.int32)
    nz = zz > 0
    need[nz] = np.floor(np.log2(zz[nz])).astype(np.int32) + 1
    bits = 17
    for b in range(17, -1, -1):
        if int((need > b).sum()) <= max_exceptions:
            bits = b
        else:
            break
    lim = (1 << bits) - 1 if bits else 0
    exc = np.flatnonzero(zz.reshape(-1) > lim)
    exc_zz = zz.reshape(-1)[exc].copy()
    zz_stream = zz.copy().reshape(-1)
    zz_stream[exc] = 0
    zz_stream = zz_stream.reshape(c * h, w)
    wpr = words_per_row(w, bits)
    words = np.zeros((c * h, wpr), np.uint32)
    for r in range(c * h):
        for x in range(w):
            z = int(zz_stream[r, x])
            bitpos = x * bits
            wi, sh = bitpos // 32, bitpos % 32
            words[r, wi] |= (z << sh) & 0xFFFFFFFF
            if sh + bits > 32:
                words[r, wi + 1] |= z >> (32 - sh)
    mwpr = mask_words_per_row(w)
    mask_words = np.zeros((c * h, mwpr), np.uint32)
    ys, xs = np.nonzero(depth.reshape(c * h, w))
    np.bitwise_or.at(mask_words, (ys, xs // 32),
                     (np.uint32(1) << (xs % 32).astype(np.uint32)))
    return dict(words=words.reshape(c, h, wpr),
                mask_words=mask_words.reshape(c, h, mwpr),
                row_first=row_first.reshape(c, h),
                exc_idx=exc.astype(np.uint32),
                exc_zz=exc_zz.astype(np.uint32)), bits
