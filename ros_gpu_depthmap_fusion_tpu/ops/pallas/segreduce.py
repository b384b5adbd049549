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
2. ONE single-plane inclusive prefix scan assigns each lane its valid-run
   ordinal ``rid_v`` (Hillis-Steele over the start flags — [1, BN] only).
   The value planes are NOT scanned at all: the run summation happens on
   the MXU in step 4.
3. every lane of a run that ENDS inside the block (i.e. lanes before the
   block's last segment start; on the final block, all valid lanes) gets
   the run's output slot ``t = res + rid_v - 1 + carried``; lanes of the
   open trailing run are reduced into the [DP-1, 1] run carry instead.
   If a carried non-sentinel run completes (a new run starts at lane 0,
   or the continuation ends mid-block), its carried sums are injected
   into the residue buffer at slot ``res`` — where the continuation
   members' MXU sums land too, so the halves combine exactly.
4. MEMBERSHIP one-hot MXU matmuls: ``M[i, j] = (t[i] mod SLAB == j)``
   holds a 1 for EVERY member lane of an emitted run, so the slab matmul
   ``slab[d, j] = sum_i vals[d, i] * M[i, j]`` computes the per-run sums
   directly (exact: integer-valued f32 products and sums < 2^24). The key
   plane is gated to each run's END lane only, so keys are emitted once,
   not summed. Emission uses the same aligned residue/slab machinery as
   :mod:`.compact`.

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


def rle_body(keys, vals, b, out_ref, cnt_ref,
             residue, slab_scr, run_carry, carry, sems, *,
             n_blocks, cap_pad, sentinel, bn, force_break):
    """One grid step of the run-length reduction over an in-register
    ``keys [1, bn]`` / ``vals [DP-1, bn]`` block (shared by the plain
    stream kernel below and the fused unproject kernel, which computes
    keys/vals from depth in-register before reducing)."""
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
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, bn), 1)
    lane_f = lane.astype(jnp.float32)

    carry_key = run_carry[0, 0]
    carry_sums = run_carry[1:, 0:1]     # [DP-1, 1]

    # 1. segment starts (lane 0 vs carried key). Vector masks ride as f32
    #    (Mosaic's 1-bit vectors are avoided, as in the flying-pixel kernel)
    prev_key = jnp.roll(keys, 1, axis=1)
    st = jnp.where(lane == 0,
                   (keys != carry_key).astype(jnp.float32),
                   (keys != prev_key).astype(jnp.float32))
    if force_break:
        # bound run length (callers use it to bound run SUMS so partial
        # rows pack into fewer sort operands); splitting a run only adds
        # partial rows — level-2 merges them exactly
        st = jnp.maximum(st, (lane % force_break == 0)
                         .astype(jnp.float32))
    st0 = st[0, 0]
    valid = (keys != sent).astype(jnp.float32)
    is_last = b == n_blocks - 1
    cont_any = carry_key != sent        # a non-sentinel run is carried

    # 2. the ONLY scan: valid-run ordinal per lane (continuation run = 0)
    rid_v = _prefix_incl(st * valid, bn)          # [1, bn]

    # lanes at/after the block's LAST segment start belong to the open
    # trailing run (no start at all -> -1 -> the whole block continues
    # the carried run); everything before it is emitted this block
    last_start = jnp.max(jnp.where(st > 0.0, lane_f, -1.0))   # scalar
    ends = jnp.where(is_last, 1.0, (lane_f < last_start)
                     .astype(jnp.float32))
    emit_m = valid * ends               # member lanes of emitted runs

    # 3. output slot per emitted-run member. The carried row (when it
    #    completes) occupies slot ``res``: either as a full injected row
    #    (a new run starts at lane 0) or merged with its continuation
    #    members' MXU sums (same slot, exact integer adds)
    cont_f = jnp.where(cont_any, 1.0, 0.0)
    t = res.astype(jnp.float32) + rid_v - 1.0 + cont_f
    tgt = jnp.where(emit_m > 0.0, t, -1.0)

    # run-end lanes: emit each run's key exactly once + count the runs.
    # A segment ends where the NEXT lane starts one — derived from st so
    # forced breaks end their fragment too (key-compare alone would miss
    # the equal-key boundary and corrupt slot accounting)
    brk = jnp.where(lane == bn - 1, 1.0, jnp.roll(st, -1, axis=1))
    en = emit_m * brk
    k_en = jnp.sum(en).astype(jnp.int32)

    # complete carried row pending BEFORE this block's runs (st0 == 1);
    # a continuation that ends mid-block is counted by k_en instead
    pre = jnp.where(cont_any & (st0 > 0.0), 1, 0)
    inject = cont_any & ((last_start >= 0.0) | is_last)

    @pl.when(inject)
    def _inject():
        slab_lane = jax.lax.broadcasted_iota(jnp.int32, (1, SLAB), 1)
        # continuation (st0 == 0): only the SUMS are injected — the run's
        # key arrives via its end lane in the membership matmul; injecting
        # it here too would double it. Complete carried row (st0 == 1):
        # no member lanes exist, inject the key as well. (Row built by
        # masking the carry column in place — Mosaic rejects [1,1]+[D,1]
        # concats with mismatched sublane offsets.)
        rr = jax.lax.broadcasted_iota(jnp.int32, (DP, 1), 0)
        row = jnp.where((rr == 0) & (st0 <= 0.0), 0.0, run_carry[:, 0:1])
        residue[...] = residue[...] + jnp.where(slab_lane == res, row, 0.0)

    # 4. membership-matmul emission: vals of every member lane sum into
    #    the run's slot on the MXU; keys ride only on end lanes
    total = res + pre + k_en
    emit_planes = jnp.concatenate([keys * en, vals * emit_m], axis=0)
    # int_split: every plane is a non-negative integer-valued f32 < 2^24
    # (keys, quantized-coordinate sums, counts) — the exact bf16 path
    _emit_slabs(emit_planes, tgt, total, base_slabs, is_last,
                residue, slab_scr, out_ref, sems, cap_pad, int_split=True)

    # 5. reduce the open trailing run into the carry (accumulating when
    #    the whole block continued the carried run)
    open_m = (lane_f >= last_start).astype(jnp.float32)
    open_sums = jnp.sum(vals * open_m, axis=1, keepdims=True)
    accum_prev = cont_any & (last_start < 0.0)
    new_carry = open_sums + jnp.where(accum_prev, carry_sums, 0.0)
    run_carry[0:1, 0:1] = keys[:, bn - 1:]
    run_carry[1:, 0:1] = new_carry

    carry[0] = total % SLAB
    carry[1] = base_slabs + total // SLAB

    @pl.when(is_last)
    def _fin():
        cnt_ref[0, 0] = base_slabs * SLAB + total


def _kernel(planes_ref, out_ref, cnt_ref,
            residue, slab_scr, run_carry, carry, sems, *,
            n_blocks, cap_pad, sentinel, bn, force_break):
    planes = planes_ref[0]              # [DP, bn]: row 0 keys, 1.. vals
    rle_body(planes[0:1], planes[1:], pl.program_id(0), out_ref, cnt_ref,
             residue, slab_scr, run_carry, carry, sems,
             n_blocks=n_blocks, cap_pad=cap_pad, sentinel=sentinel,
             bn=bn, force_break=force_break)


@functools.partial(jax.jit,
                   static_argnames=("capacity", "sentinel", "interpret",
                                    "bn", "force_break"))
def _rle_pallas(planes: jnp.ndarray, capacity: int, sentinel: int,
                interpret: bool = False, bn: int = BN,
                force_break: int = 0):
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
                               sentinel=float(sentinel), bn=bn,
                               force_break=force_break)
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
                      sentinel: int, interpret: bool = False, bn: int = BN,
                      force_break: int = 0):
    """Reduce runs of consecutive equal keys to (key, sum) rows.

    Args:
        keys: ``[N]`` int32 in [0, sentinel]; ``sentinel`` rows are ignored
            (and break runs). Must satisfy sentinel < 2^24.
        vals: ``[N, D]`` float32, D <= 7. REQUIRED: NON-NEGATIVE
            INTEGER-VALUED, with every emitted run sum < 2^24 — the
            emission path splits each value into three base-256 bf16
            digits (exact single-MXU-pass form, ops/pallas/compact.py),
            which silently corrupts negative or fractional payloads.
            Sentinel rows may hold anything in-range — they are never
            accumulated into emitted runs. (All current callers comply:
            the voxelize levels carry cell-relative quantized coords and
            0/1 counts.)
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
                                interpret=interpret, bn=bn,
                                force_break=force_break)
    cnt = jnp.minimum(true_cnt, jnp.int32(capacity))
    live = jnp.arange(capacity, dtype=jnp.int32) < cnt
    out_keys = jnp.where(live, out[0, :capacity].astype(jnp.int32),
                         jnp.int32(sentinel))
    out_sums = jnp.where(live[:, None], out[1:1 + d, :capacity].T, 0.0)
    return out_keys, out_sums, cnt, true_cnt
