"""Pallas TPU kernel: run-length segmented reduction with compacted output.

One sequential pass over a key/value stream emits, for every run of
CONSECUTIVE equal keys, one compacted output row ``(key, sum(vals))`` —
runs in stream order, rows with ``key == sentinel`` ignored.

This single kernel replaces, for the voxelize stage, both the
log-doubling segmented-sum (22 full-HBM passes over ``[N, 4]`` at the
engine's 3.4M-point operating point) and the run-end extraction (a
5-operand full-capacity ``lax.sort``), moving each byte once. It is the
device-side re-expression of the reference's CPU radix grouper +
``averageGridCells`` accumulation loop (``radix_grouper.h:35-64``,
``voxelize.h:9-48``).

Because it only requires runs to be *consecutive* (not globally sorted),
it doubles as a raster-order pre-reducer: depth images are spatially
coherent, so neighbouring pixels mostly share a voxel cell and one pass
over the unsorted raster stream collapses ~3.4M points into a few hundred
thousand (cell, partial-sum) rows — shrinking the domain of the remaining
sort by an order of magnitude (``ops.voxelize.voxelize_average_rle``).

Mechanics per ``BN``-lane block (grid steps run sequentially on the core,
carrying state across steps):

1. segment starts ``st[i] = key[i] != key[i-1]`` (lane 0 compares against
   the carried key of the previous block's open run).
2. segmented inclusive prefix sums of the value planes via log-stride
   roll+add steps gated by a "boundary seen within the last s lanes"
   accumulator (Hillis-Steele segmented scan, all VPU, element-on-lanes
   layout — no transposes).
3. run ends ``en[i] = key[i] != key[i+1]`` (the block's last lane never
   ends — its open run carries; on the final block it ends iff valid).
   If the block starts a new run while a non-sentinel run is carried, the
   carried ``(key, sums)`` row is emitted first (injected into the
   256-lane residue buffer).
4. end rows are selected with one-hot MXU matmuls and emitted through the
   same aligned residue/slab machinery as :mod:`.compact`.

Keys and integer-valued payloads ride as exact f32 (< 2^24).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ros_gpu_depthmap_fusion_tpu.ops.pallas.compact import (
    BN, DP, SLAB, _emit_slabs, _prefix_incl)


def _kernel(planes_ref, out_ref, cnt_ref,
            residue, slab_scr, run_carry, carry, sems, *,
            n_blocks, cap_pad, sentinel, bn):
    b = pl.program_id(0)
    sent = jnp.float32(sentinel)

    @pl.when(b == 0)
    def _init():
        carry[0] = 0   # res: rows pending in the residue buffer
        carry[1] = 0   # slabs emitted so far
        residue[...] = jnp.zeros_like(residue)
        rr = jax.lax.broadcasted_iota(jnp.int32, run_carry.shape, 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, run_carry.shape, 1)
        run_carry[...] = jnp.where((rr == 0) & (cc == 0), sent, 0.0)

    res = carry[0]
    base_slabs = carry[1]

    planes = planes_ref[0]              # [DP, bn]: row 0 keys, 1.. vals
    keys = planes[0:1]                  # [1, bn] f32
    vals = planes[1:]                   # [DP-1, bn]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, bn), 1)

    carry_key = run_carry[0, 0]
    carry_sums = run_carry[1:, 0:1]     # [DP-1, 1]

    # 1. segment starts (lane 0 vs carried key). Vector masks ride as f32
    #    (Mosaic's 1-bit vectors are avoided, as in the flying-pixel kernel)
    prev_key = jnp.roll(keys, 1, axis=1)
    st = jnp.where(lane == 0,
                   (keys != carry_key).astype(jnp.float32),
                   (keys != prev_key).astype(jnp.float32))
    st0 = st[0, 0]

    # carried row folds into lane 0 when the run continues...
    acc = vals + jnp.where(lane == 0, carry_sums * (1.0 - st0), 0.0)
    # ...or is emitted as the first pending row when a new run starts
    pre = jnp.where((st0 > 0.0) & (carry_key != sent), 1, 0)

    # 2. segmented inclusive prefix sums (gate: no boundary in (i-s, i])
    g = st
    shift = 1
    while shift < bn:
        live_l = lane >= shift
        gate = jnp.where(live_l, 1.0 - g, 0.0)    # f32 0/1
        acc = acc + gate * jnp.roll(acc, shift, axis=1)
        g = jnp.maximum(g, jnp.where(live_l, jnp.roll(g, shift, axis=1),
                                     0.0))
        shift *= 2

    # 3. run ends (last lane carries unless this is the final block)
    is_last = b == n_blocks - 1
    next_key = jnp.roll(keys, -1, axis=1)
    valid = (keys != sent).astype(jnp.float32)
    brk = (keys != next_key).astype(jnp.float32)
    last_f = jnp.where(is_last, 1.0, 0.0)
    en = valid * jnp.where(lane == bn - 1, last_f, brk)

    # inject the emitted carry row into the residue buffer at position res
    @pl.when(pre > 0)
    def _inject():
        slab_lane = jax.lax.broadcasted_iota(jnp.int32, (1, SLAB), 1)
        row = jnp.concatenate(
            [carry_key.reshape(1, 1), carry_sums], axis=0)   # [DP, 1]
        residue[...] = residue[...] + jnp.where(slab_lane == res, row, 0.0)

    # 4. ranks + slab emission of end rows
    incl = _prefix_incl(en, bn)
    k_en = incl[0, bn - 1].astype(jnp.int32)
    excl = incl - en
    tgt = jnp.where(en > 0.0, excl + (res + pre).astype(jnp.float32), -1.0)
    total = res + pre + k_en
    emit_planes = jnp.concatenate([keys, acc], axis=0)       # [DP, BN]
    _emit_slabs(emit_planes, tgt, total, base_slabs, is_last,
                residue, slab_scr, out_ref, sems, cap_pad)

    # 5. carry the open run (the block's last lane)
    run_carry[:, 0:1] = jnp.concatenate(
        [keys[:, bn - 1:], acc[:, bn - 1:]], axis=0)

    carry[0] = total % SLAB
    carry[1] = base_slabs + total // SLAB

    @pl.when(is_last)
    def _fin():
        cnt_ref[0, 0] = base_slabs * SLAB + total


@functools.partial(jax.jit,
                   static_argnames=("capacity", "sentinel", "interpret",
                                    "bn"))
def _rle_pallas(planes: jnp.ndarray, capacity: int, sentinel: int,
                interpret: bool = False, bn: int = BN):
    dp, n = planes.shape
    assert dp == DP, dp
    n_blocks = -(-n // bn)
    n_pad = n_blocks * bn
    cap_pad = -(-capacity // SLAB) * SLAB + SLAB
    # pad the key plane with the sentinel so padding never forms runs;
    # per-block-contiguous layout [NB, DP, BN] (one DMA per grid step —
    # the transpose fuses into the producer's elementwise chain under jit)
    pad = jnp.full((dp, n_pad - n), 0.0, planes.dtype).at[0].set(
        float(sentinel))
    planes_p = jnp.concatenate([planes, pad], axis=1).reshape(
        dp, n_blocks, bn).transpose(1, 0, 2)

    kernel = functools.partial(_kernel, n_blocks=n_blocks, cap_pad=cap_pad,
                               sentinel=float(sentinel), bn=bn)
    out, cnt = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((DP, cap_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, DP, bn), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[
            pltpu.VMEM((DP, SLAB), jnp.float32),              # residue
            pltpu.VMEM((2, DP, SLAB), jnp.float32),           # slab sources
            pltpu.VMEM((DP, 128), jnp.float32),               # open-run carry
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(planes_p)
    return out, cnt[0, 0]


def rle_reduce_pallas(keys: jnp.ndarray, vals: jnp.ndarray, capacity: int,
                      sentinel: int, interpret: bool = False, bn: int = BN):
    """Reduce runs of consecutive equal keys to (key, sum) rows.

    Args:
        keys: ``[N]`` int32 in [0, sentinel]; ``sentinel`` rows are ignored
            (and break runs). Must satisfy sentinel < 2^24.
        vals: ``[N, D]`` float32, D <= 7 (finite; sentinel rows may hold
            anything finite — they are never accumulated into emitted runs).
        capacity: static max emitted runs; overflow rows are dropped (the
            count still reports the true number of runs, clamped here).

    Returns:
        (out_keys ``[capacity]`` int32 — ``sentinel`` beyond the count,
         out_sums ``[capacity, D]`` — zeros beyond the count,
         count scalar int32 clamped to capacity,
         true_count scalar int32 — the UNclamped run total, so callers can
         detect capacity overflow: ``true_count > capacity`` means rows
         were dropped).
    """
    n, d = vals.shape
    assert d <= DP - 1, d
    planes = jnp.concatenate(
        [keys.astype(jnp.float32)[None, :], vals.T.astype(jnp.float32),
         jnp.zeros((DP - 1 - d, n), jnp.float32)], axis=0)
    out, true_cnt = _rle_pallas(planes, capacity, int(sentinel),
                                interpret=interpret, bn=bn)
    cnt = jnp.minimum(true_cnt, jnp.int32(capacity))
    live = jnp.arange(capacity, dtype=jnp.int32) < cnt
    out_keys = jnp.where(live, out[0, :capacity].astype(jnp.int32),
                         jnp.int32(sentinel))
    out_sums = jnp.where(live[:, None], out[1:1 + d, :capacity].T, 0.0)
    return out_keys, out_sums, cnt, true_cnt
