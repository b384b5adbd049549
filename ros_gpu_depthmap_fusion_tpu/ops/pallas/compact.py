"""Pallas TPU kernel for deterministic stream compaction (masked take).

Replaces the sort-based compaction idiom (``ops.mask_ops._sort_compact``:
one stable ``lax.sort`` on ``!mask`` carrying every payload column) for the
hot full-capacity extractions. The bitonic sort moves every payload operand
through every comparator stage (~log^2 N passes); this kernel moves each
payload byte exactly once.

It is the TPU-native re-expression of the reference's atomic-counter
compaction (``shader/apply_point_mask.glsl:50-54``) — deterministic and
stable where the reference's output order was nondeterministic.

Algorithm (one sequential pass over ``BN``-element blocks; the TPU grid
executes in order on the single core, so scalar state carries across
steps in SMEM):

1. block ranks: exclusive prefix sum of the flags along the BN lanes via
   log-stride roll+add steps (VPU only, data stays in element-on-lanes
   layout end to end — no relayouts/transposes anywhere).
2. slab emission: output rows are produced in lane-aligned 256-row slabs.
   Slab ``s`` is selected by the one-hot matrix
   ``P[j, i] = (rank[i] - s*256 == j)`` and materialized with ONE MXU
   matmul contracting the element dim of both operands
   ``slab[d, j] = sum_i vals[d, i] * P[j, i]`` (precision=HIGHEST, so the
   one-hot selection is bit-exact for f32 payloads). Rows that do not
   fill a complete slab stay in a VMEM residue buffer and combine with
   the next block's rows — every HBM write is a full 256-lane-aligned
   slab, keeping the output DMAs legal (minor dims must be 128-aligned)
   and overlap-free. The slabs run in a ``fori_loop`` whose trip count is
   the number of slabs actually pending — a mostly-empty block costs a
   handful of scalar ops, not 30 predicated regions (measured: the
   per-block cost is branch-dominated, not compute-dominated).
3. lanes past the true count hold garbage and are blanked by the XLA-side
   wrapper.

Data travels in PLANES layout ``[8, N]`` (payload columns on sublanes,
elements on lanes — the same layout rule as the flying-pixel kernel: a
trailing small dim would be padded to the 128-lane vector width).

Payload values must be finite (0 * inf/nan would pollute the one-hot
row sums); integer payloads ride as exact f32 (|v| < 2^24 — cell ids and
point indices in this engine are < 2^22).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN = 8192          # elements per block (lanes of the flag vector)
# one-hot emission dot precision — HIGHEST is required for exactness of
# integer-valued f32 payloads (< 2^24); module-level so probes can A/B
# the MXU pass count (benchmarks/r4_l1_bn.py)
_DOT_PRECISION = jax.lax.Precision.HIGHEST
SLAB = 128         # output rows per emitted slab (lane-aligned granule;
                   # the [SLAB, BN] one-hot + iota must fit VMEM)
DP = 8             # payload planes (padded; sublane-aligned)


def _prefix_incl(x, bn):
    """Inclusive prefix sum along the lane axis of ``[1, bn]`` via
    log-stride roll+add (f32; exact for counts < 2^24)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, bn), 1)
    shift = 1
    while shift < bn:
        x = x + jnp.where(lane >= shift, jnp.roll(x, shift, axis=1), 0.0)
        shift *= 2
    return x


def _emit_slabs(vals, tgt, total, base_slabs, is_last,
                residue, slab_scr, out_ref, sems, cap_pad,
                int_split: bool = False):
    """Shared slab-emission machinery: select pending output rows with
    one-hot MXU matmuls and stream full 256-aligned slabs to the output.

    ``vals``: [DP, BN] planes; ``tgt``: [1, BN] f32 slab-relative target of
    each emitted element (-1 for non-emitted); ``total``: rows pending
    (residue + new). Residue handling: slab 0 adds the residue buffer; a
    trailing partial slab is written back to it (and also flushed to HBM
    on the last block). All DMAs issued here are waited before return, so
    no cross-block hazards exist.

    The slab-s one-hot ``(tgt - s*SLAB == col)`` is factored as
    ``onehot(tgt mod SLAB) * (tgt div SLAB == s)``: the [SLAB, BN] one-hot
    is built ONCE per block and the per-slab part is a [1, BN] lane gate
    folded into ``vals`` — per-slab VPU work drops from SLAB*BN to ~BN
    (measured: the unfactored compare dominated the whole kernel).
    """
    bn = vals.shape[1]
    q = jnp.floor(tgt * (1.0 / SLAB))          # slab index of each element
    r = tgt - q * SLAB
    # Build the one-hot DIRECTLY in the [BN, SLAB] layout the dot below
    # contracts (rhs contraction on sublanes, the MXU-native position):
    # only the [1, BN] residue vector is relayouted to [BN, 1] (32 KB),
    # not a full [SLAB, BN] matrix (4 MB). Earlier versions built
    # [SLAB, BN] and transposed once per block — hoisting that transpose
    # out of the trip loop took the level-1 RLE kernel 13.1 -> 9.6 ms;
    # building transposed kills the remaining 4 MB relayout per block.
    r_t = jnp.transpose(r, (1, 0))              # [BN, 1]
    col_t = jax.lax.broadcasted_iota(jnp.int32, (bn, SLAB), 1).astype(
        jnp.float32)
    onehot_t = (r_t == col_t).astype(jnp.float32)   # [BN, SLAB]
    n_full = total // SLAB
    # trip count: full slabs, + the partial one on the last block
    trips = n_full + jnp.where(is_last & (total % SLAB > 0), 1, 0)
    trips = jnp.minimum(trips, jnp.maximum(
        cap_pad // SLAB - base_slabs, 0))

    if int_split:
        # EXACT single-pass bf16 emission for NON-NEGATIVE INTEGER-valued
        # f32 payloads < 2^24 (the RLE kernel's keys/sums): split each
        # value into three base-256 digits — each digit <= 255 is exact in
        # bf16, the one-hot is 0/1, the MXU accumulates in f32, and the
        # recombination terms are themselves bounded by the < 2^24 total,
        # so every step is exact. One DEFAULT-precision bf16 pass replaces
        # the multi-pass f32 HIGHEST dot (measured 8.3 -> 6.0 ms on the
        # level-1 kernel, benchmarks/r4_dot_precision.py).
        dp = vals.shape[0]
        hi = jnp.floor(vals * (1.0 / 65536.0))
        rem = vals - hi * 65536.0
        mid = jnp.floor(rem * (1.0 / 256.0))
        lo = rem - mid * 256.0
        lhs = jnp.concatenate([hi, mid, lo], axis=0).astype(jnp.bfloat16)
        rhs_b = onehot_t.astype(jnp.bfloat16)

        def slab_select(s):
            gate = (q == s.astype(jnp.float32)).astype(jnp.bfloat16)
            out3 = jax.lax.dot_general(
                lhs * gate, rhs_b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [3*DP, SLAB]
            return (out3[:dp] * 65536.0 + out3[dp:2 * dp] * 256.0
                    + out3[2 * dp:])
    else:
        def slab_select(s):
            gate = (q == s.astype(jnp.float32)).astype(jnp.float32)
            return jax.lax.dot_general(
                vals * gate, onehot_t, (((1,), (0,)), ((), ())),
                precision=_DOT_PRECISION,
                preferred_element_type=jnp.float32)      # [DP, SLAB]

    def body(s, _):
        slab = slab_select(s) + jnp.where(s == 0, residue[...], 0.0)
        slot = s % 2

        @pl.when(s >= 2)
        def _reuse():
            pltpu.make_async_copy(
                slab_scr.at[slot], out_ref.at[:, pl.ds(0, SLAB)],
                sems.at[slot]).wait()

        slab_scr[pl.ds(slot, 1)] = slab[None]
        pltpu.make_async_copy(
            slab_scr.at[slot],
            out_ref.at[:, pl.ds((base_slabs + s) * SLAB, SLAB)],
            sems.at[slot]).start()
        return 0

    jax.lax.fori_loop(0, trips, body, 0, unroll=False)

    # update the residue: the trailing partial slab's contents (cheap —
    # one gated matmul, only when a partial exists)
    rem = total % SLAB

    @pl.when(rem > 0)
    def _keep_partial():
        part = slab_select(n_full)
        residue[...] = part + jnp.where(n_full == 0, residue[...], 0.0)

    @pl.when(rem == 0)
    def _clear_res():
        residue[...] = jnp.zeros_like(residue)

    # drain this block's DMAs (at most 2 outstanding)
    @pl.when(trips >= 1)
    def _w0():
        pltpu.make_async_copy(
            slab_scr.at[(trips - 1) % 2], out_ref.at[:, pl.ds(0, SLAB)],
            sems.at[(trips - 1) % 2]).wait()

    @pl.when(trips >= 2)
    def _w1():
        pltpu.make_async_copy(
            slab_scr.at[trips % 2], out_ref.at[:, pl.ds(0, SLAB)],
            sems.at[trips % 2]).wait()


def _kernel(flags_ref, vals_ref, out_ref, cnt_ref,
            residue, slab_scr, carry, sems, *, n_blocks, cap_pad):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        carry[0] = 0   # res: rows pending in the residue buffer
        carry[1] = 0   # slabs emitted so far (output base / SLAB)
        residue[...] = jnp.zeros_like(residue)

    res = carry[0]
    base_slabs = carry[1]

    f = flags_ref[0]                    # [1, BN] f32 (0/1)
    incl = _prefix_incl(f, BN)
    k_blk = incl[0, BN - 1].astype(jnp.int32)
    excl = incl - f

    # global slab-relative target row of each flagged element
    tgt = jnp.where(f > 0.0, excl + res.astype(jnp.float32), -1.0)

    total = res + k_blk                 # rows pending after this block
    is_last = b == n_blocks - 1
    _emit_slabs(vals_ref[0], tgt, total, base_slabs, is_last,
                residue, slab_scr, out_ref, sems, cap_pad)

    carry[0] = total % SLAB
    carry[1] = base_slabs + total // SLAB

    @pl.when(is_last)
    def _fin():
        cnt_ref[0, 0] = base_slabs * SLAB + total


@functools.partial(jax.jit, static_argnames=("capacity", "interpret"))
def _compact_pallas(planes: jnp.ndarray, flags: jnp.ndarray, capacity: int,
                    interpret: bool = False):
    """planes [DP, N] f32, flags [N] f32 0/1 -> (out [DP, cap_pad], count)."""
    dp, n = planes.shape
    assert dp == DP, dp
    n_blocks = -(-n // BN)
    n_pad = n_blocks * BN
    cap_pad = -(-capacity // SLAB) * SLAB + SLAB
    flags_p = jnp.pad(flags, (0, n_pad - n)).reshape(n_blocks, 1, BN)
    # per-block-contiguous layout [NB, DP, BN]: each grid step's input is
    # ONE contiguous DMA instead of DP strided row slices (the transpose
    # fuses into the producer's elementwise chain under jit)
    planes_p = jnp.pad(planes, ((0, 0), (0, n_pad - n))).reshape(
        DP, n_blocks, BN).transpose(1, 0, 2)

    kernel = functools.partial(_kernel, n_blocks=n_blocks, cap_pad=cap_pad)
    out, cnt = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((DP, cap_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, BN), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DP, BN), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[
            pltpu.VMEM((DP, SLAB), jnp.float32),          # residue
            pltpu.VMEM((2, DP, SLAB), jnp.float32),       # slab sources
            pltpu.SMEM((2,), jnp.int32),                  # res / base
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(flags_p, planes_p)
    return out, cnt[0, 0]


def compact_rows_pallas(vals2d: jnp.ndarray, mask: jnp.ndarray,
                        capacity: int, interpret: bool = False):
    """Stable masked row extraction on TPU.

    Args:
        vals2d: ``[N, D]`` float32 payload rows, D <= 8 (finite values;
            exact-int payloads must satisfy |v| < 2^24).
        mask:   ``[N]`` bool.
        capacity: static output row count.

    Returns:
        (out ``[capacity, D]`` — rows [0, count) are the flagged inputs in
        order, the rest zero; count scalar int32 clamped to capacity).
    """
    n, d = vals2d.shape
    assert d <= DP, d
    planes = jnp.pad(vals2d.T.astype(jnp.float32), ((0, DP - d), (0, 0)))
    out, cnt = _compact_pallas(planes, mask.astype(jnp.float32), capacity,
                               interpret=interpret)
    cnt = jnp.minimum(cnt, jnp.int32(capacity))
    rows = jnp.arange(capacity, dtype=jnp.int32) < cnt
    return jnp.where(rows[:, None], out[:d, :capacity].T, 0.0), cnt
