"""Fused unproject -> crop -> voxel-quantize -> level-1 RLE (one pass).

The raster front of the fusion step reads the same depth image five
times in the XLA formulation: unprojection materializes camera/world/
crop-frame point clouds (3 x 52 MB at the 8-cam operating point), the
crop test reads the crop cloud, cell indexing + cell-relative
quantization read the world cloud, and the level-1 RLE kernel reads a
freshly transposed 104 MB plane stack. This kernel computes ALL of it
in-register per 7168-lane block: depth (metres, already masked) comes in
once, per-camera intrinsics + world/crop transforms live in SMEM, and
the block hands its (cell, quantized-sum) runs straight to the shared
RLE machinery (:func:`..pallas.segreduce.rle_body`).

Layout trick: rows are padded to a 128-multiple width and the [C*H, Wp]
image is reshaped (contiguously, outside the kernel) to
``[C*H/RB, RB*Wp]`` — each grid step consumes RB rows as ONE lane
vector; pixel (row, col) coordinates are recovered from the lane index
with an exact f32 division (Wp is a multiple of 128, so forced breaks at
lane%128 include every row start and padding lanes ride as sentinels).

Parity: replicates ``crop_points`` -> ``grid.cell_index_clamped`` ->
``_quantize_cell_relative`` semantics (ops/mask_ops.py, core/grid.py,
ops/voxelize.py). The world/crop transform applies as scalar mul-adds
instead of the XLA path's MXU einsum, so results can differ in the last
float ulp for points on exact cell boundaries — the engine-level
equivalence test bounds the effect (tests/test_fused_unproject.py).

Reference analog: one dispatch covering convert_depthmap_to_points +
cropPoints + computeVoxelCoords (+ the voxelize pre-pass) —
shader/convert_depthmap_to_points.glsl, crop_points.glsl,
compute_voxel_coords.glsl.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ros_gpu_depthmap_fusion_tpu.ops.pallas.compact import DP, SLAB
from ros_gpu_depthmap_fusion_tpu.ops.pallas.segreduce import rle_body

ROWS_PER_BLOCK = 8


def _kernel(depth_ref, params_ref, out_ref, cnt_ref,
            residue, slab_scr, run_carry, carry, vcnt, sems, *,
            n_blocks, cap_pad, sentinel, bn, force_break,
            wp, rb, blocks_per_cam, glo, gcs, gs, crop_lo, crop_hi):
    b = pl.program_id(0)
    d = depth_ref[0]                       # [1, bn] f32 metres, 0=invalid
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (1, bn), 1).astype(jnp.float32)
    wp_f = jnp.float32(wp)
    rloc = jnp.floor(lane / wp_f)          # row within block (exact)
    col = lane - rloc * wp_f               # pixel column (exact)
    cam = b // blocks_per_cam
    row0 = ((b % blocks_per_cam) * rb).astype(jnp.float32)
    vpix = row0 + rloc

    fx = params_ref[cam, 0]
    fy = params_ref[cam, 1]
    cx = params_ref[cam, 2]
    cy = params_ref[cam, 3]
    x = (col - cx) / fx * d
    y = (vpix - cy) / fy * d

    def apply_tf(base):
        ox = (params_ref[cam, base + 0] * x + params_ref[cam, base + 1] * y
              + params_ref[cam, base + 2] * d + params_ref[cam, base + 3])
        oy = (params_ref[cam, base + 4] * x + params_ref[cam, base + 5] * y
              + params_ref[cam, base + 6] * d + params_ref[cam, base + 7])
        oz = (params_ref[cam, base + 8] * x + params_ref[cam, base + 9] * y
              + params_ref[cam, base + 10] * d
              + params_ref[cam, base + 11])
        return ox, oy, oz

    wx, wy, wz = apply_tf(4)               # world frame
    px, py, pz = apply_tf(16)              # crop frame

    inside = ((px >= crop_lo[0]) & (px <= crop_hi[0])
              & (py >= crop_lo[1]) & (py <= crop_hi[1])
              & (pz >= crop_lo[2]) & (pz <= crop_hi[2]))
    m = ((d > 0.0) & inside).astype(jnp.float32)

    # production clamped cell semantics (compute_voxel_coords.glsl:44-53)
    gx = jnp.floor(jnp.clip((wx - glo[0]) / gcs[0], 0.0, gs[0] - 1.0))
    gy = jnp.floor(jnp.clip((wy - glo[1]) / gcs[1], 0.0, gs[1] - 1.0))
    gz = jnp.floor(jnp.clip((wz - glo[2]) / gcs[2], 0.0, gs[2] - 1.0))
    cell = gx + gy * gs[0] + gz * (gs[0] * gs[1])   # exact f32 < 2^24
    key = jnp.where(m > 0.0, cell, jnp.float32(sentinel))

    # cell-relative 10/10/12-bit quantization (ops/voxelize.py)
    qx = jnp.clip(jnp.floor((wx - (glo[0] + gx * gcs[0]))
                            / gcs[0] * 1024.0), 0.0, 1023.0)
    qy = jnp.clip(jnp.floor((wy - (glo[1] + gy * gcs[1]))
                            / gcs[1] * 1024.0), 0.0, 1023.0)
    qz = jnp.clip(jnp.floor((wz - (glo[2] + gz * gcs[2]))
                            / gcs[2] * 4096.0), 0.0, 4095.0)
    zero = jnp.zeros_like(m)
    vals = jnp.concatenate(
        [qx * m, qy * m, qz * m, m, zero, zero, zero], axis=0)  # [7, bn]

    @pl.when(b == 0)
    def _vinit():
        vcnt[0] = 0

    vcnt[0] = vcnt[0] + jnp.sum(m).astype(jnp.int32)

    rle_body(key, vals, b, out_ref, cnt_ref,
             residue, slab_scr, run_carry, carry, sems,
             n_blocks=n_blocks, cap_pad=cap_pad, sentinel=sentinel,
             bn=bn, force_break=force_break)

    @pl.when(b == n_blocks - 1)
    def _vfin():
        cnt_ref[0, 1] = vcnt[0]


@functools.partial(
    jax.jit,
    static_argnames=("grid", "crop_min", "crop_max", "capacity",
                     "force_break", "interpret"))
def unproject_voxelize_l1(depth_m: jnp.ndarray,
                          intr: jnp.ndarray,
                          tf_world: jnp.ndarray,
                          tf_crop: jnp.ndarray,
                          grid, crop_min, crop_max,
                          capacity: int,
                          force_break: int = 128,
                          interpret: bool = False):
    """Level-1 raster partials straight from masked metric depth.

    Args:
        depth_m: ``[C, H, W]`` f32 depth in METRES with 0 for every
            invalid pixel (holes + flying-pixel-filtered).
        intr: ``[C, 4]`` (fx, fy, cx, cy).
        tf_world / tf_crop: ``[C, 4, 4]`` world<-cam / crop<-cam.
        grid: static :class:`~core.grid.VoxelGrid`.
        crop_min / crop_max: static crop box (crop frame).
        capacity: static max partial rows (overflow rows dropped).

    Returns:
        (keys ``[capacity]`` i32 — sentinel beyond count,
         sums ``[capacity, 4]`` f32 (qx, qy, qz, count),
         count, true_count, valid_points) — identical reduction semantics
        to ``rle_reduce_pallas`` over the crop/cell/quantize chain.
    """
    c, h, w = depth_m.shape
    rb = ROWS_PER_BLOCK
    assert h % rb == 0, (h, rb)
    wp = -(-w // 128) * 128
    bn = rb * wp
    n_blocks = (c * h) // rb
    blocks_per_cam = h // rb
    sentinel = grid.num_cells
    cap_pad = -(-capacity // SLAB) * SLAB + SLAB

    dpad = jnp.pad(depth_m.astype(jnp.float32),
                   ((0, 0), (0, 0), (0, wp - w)))
    dflat = dpad.reshape(n_blocks, 1, bn)

    params = jnp.concatenate([
        intr.astype(jnp.float32),                        # [C, 4]
        tf_world[:, :3, :].reshape(c, 12).astype(jnp.float32),
        tf_crop[:, :3, :].reshape(c, 12).astype(jnp.float32),
        jnp.zeros((c, 4), jnp.float32)], axis=1)         # pad -> [C, 32]

    kernel = functools.partial(
        _kernel, n_blocks=n_blocks, cap_pad=cap_pad,
        sentinel=float(sentinel), bn=bn, force_break=force_break,
        wp=wp, rb=rb, blocks_per_cam=blocks_per_cam,
        glo=tuple(float(v) for v in grid.lower),
        gcs=tuple(float(v) for v in grid.cell_size),
        gs=tuple(float(v) for v in grid.grid_size),
        crop_lo=tuple(float(v) for v in crop_min),
        crop_hi=tuple(float(v) for v in crop_max))
    out, cnt = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((DP, cap_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, 2), jnp.int32)),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, bn), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[
            pltpu.VMEM((DP, SLAB), jnp.float32),              # residue
            pltpu.VMEM((2, DP, SLAB), jnp.float32),           # slab sources
            pltpu.VMEM((DP, 128), jnp.float32),               # open-run carry
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),                      # valid count
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(dflat, params)
    true_cnt = cnt[0, 0]
    valid_cnt = cnt[0, 1]
    n_clamped = jnp.minimum(true_cnt, jnp.int32(capacity))
    live = jnp.arange(capacity, dtype=jnp.int32) < n_clamped
    out_keys = jnp.where(live, out[0, :capacity].astype(jnp.int32),
                         jnp.int32(sentinel))
    out_sums = jnp.where(live[:, None], out[1:5, :capacity].T, 0.0)
    return out_keys, out_sums, n_clamped, true_cnt, valid_cnt
