"""Pallas TPU kernel for the flying-pixel filter.

The jnp version (:func:`ops.stencil.filter_flying_pixels`) expresses the
ring stencil as ~5 shifted-array reads per ring pass; XLA materializes
intermediate [C, H, W] tensors in HBM between fusions. This kernel
processes each camera image in row bands: inputs stay in HBM
(``memory_space=ANY``) and every grid step DMAs its band plus a
``filter_size`` halo into VMEM scratch, runs all ring/rot45 passes
on-chip, and writes only the band's final mask — the stencil never
round-trips intermediates through HBM.

Layout notes (load-bearing on TPU): point coordinates travel channel-first
as ``[C, 3, H, W]`` planes. A trailing xyz dimension of 3 would be padded
to the 128-lane vector width (a 42x VMEM blow-up); with planes, the lane
dimension is W. Masks are int32/f32 — Mosaic's 1-bit vectors are avoided.

Measured on TPU v5e with hard-synced timing (8 cams, 480x848,
filter_size=2 + rot45): this kernel runs ~14.3 ms vs ~19.7 ms for XLA's
fusion of the jnp formulation, and compiles in ~5 s vs ~70 s, so
:func:`filter_flying_pixels_auto` defaults to it on TPU. (The jnp path
remains the oracle and the CPU/testing implementation.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ros_gpu_depthmap_fusion_tpu.ops import stencil as _stencil

BAND_ROWS = 64
HALO_ROWS = 8  # DMA slices must stay sublane(8)-aligned; covers filter_size <= 8


def _shift2d(a, dy, dx):
    # per-axis rolls, skipping zero shifts (Mosaic rejects 0-size slices)
    if dy:
        a = jnp.roll(a, -dy, axis=0)
    if dx:
        a = jnp.roll(a, -dx, axis=1)
    return a


def _kernel(scl_ref, points_hbm, mask_hbm, out_ref, pts_scr, msk_scr,
            sems, *, height, width, halo, w_pad, filter_size,
            enable_rot45):
    # runtime filter scalars (live-reconfigurable, no re-jit)
    threshold = scl_ref[0, 0]
    max_distance = scl_ref[0, 1]
    c = pl.program_id(0)
    b = pl.program_id(1)
    band = BAND_ROWS
    rows = band + 2 * halo
    row0 = b * band  # start row in the padded input (= global row - halo)

    cp = pltpu.make_async_copy(
        points_hbm.at[c, :, pl.ds(row0, rows), :], pts_scr, sems.at[0])
    cm = pltpu.make_async_copy(
        mask_hbm.at[c, pl.ds(row0, rows), :], msk_scr, sems.at[1])
    cp.start()
    cm.start()
    cp.wait()
    cm.wait()

    px = pts_scr[0]
    py = pts_scr[1]
    pz = pts_scr[2]
    m = msk_scr[:].astype(jnp.float32)

    dist2 = px * px + py * py + pz * pz
    out = m * (dist2 <= max_distance * max_distance).astype(jnp.float32)

    # global (unpadded) pixel coordinates of each band row
    yy = (jax.lax.broadcasted_iota(jnp.int32, (rows, w_pad), 0)
          + row0 - halo)
    xx = jax.lax.broadcasted_iota(jnp.int32, (rows, w_pad), 1)

    inv_norm = jax.lax.rsqrt(jnp.maximum(dist2, 1e-30))
    vx = -px * inv_norm
    vy = -py * inv_norm
    vz = -pz * inv_norm

    def ring_check(du, dv, rot45):
        if not rot45:
            offs = {"up": (-dv, 0), "down": (dv, 0),
                    "left": (0, -du), "right": (0, du)}
        else:
            offs = {"up": (-dv, -du), "down": (dv, du),
                    "left": (dv, -du), "right": (-dv, du)}
        in_b = ((xx - du >= 0) & (xx + du <= width - 1) &
                (yy - dv >= 0) & (yy + dv <= height - 1)
                ).astype(jnp.float32)
        ok = in_b * m
        sh = {}
        for name, (dy, dx) in offs.items():
            ok = ok * _shift2d(m, dy, dx)
            sh[name] = tuple(_shift2d(p, dy, dx) for p in (px, py, pz))
        dxx = sh["right"][0] - sh["left"][0]
        dxy = sh["right"][1] - sh["left"][1]
        dxz = sh["right"][2] - sh["left"][2]
        dyx = sh["down"][0] - sh["up"][0]
        dyy = sh["down"][1] - sh["up"][1]
        dyz = sh["down"][2] - sh["up"][2]
        # normal = cross(dy_vec, dx_vec)
        nx = dyy * dxz - dyz * dxy
        ny = dyz * dxx - dyx * dxz
        nz = dyx * dxy - dyy * dxx
        n_inv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                          1e-30))
        cos_view = (nx * vx + ny * vy + nz * vz) * n_inv
        return ok * (cos_view >= threshold).astype(jnp.float32)

    for i in range(filter_size):
        d = i + 1
        out = out * ring_check(d, d, rot45=False)
        if enable_rot45:
            out = out * ring_check(d, d, rot45=True)

    out_ref[0] = out[halo:halo + band].astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "filter_size", "enable_rot45",
                     "interpret"))
def filter_flying_pixels_pallas(points_cam: jnp.ndarray,
                                mask: jnp.ndarray,
                                height: int,
                                width: int,
                                filter_size: int,
                                threshold: float,
                                enable_rot45: bool,
                                max_distance: float = 10.0,
                                interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for stencil.filter_flying_pixels on TPU."""
    c = points_cam.shape[0]
    assert filter_size <= HALO_ROWS, filter_size
    halo = HALO_ROWS
    n_bands = -(-height // BAND_ROWS)
    h_pad = n_bands * BAND_ROWS
    w_pad = ((width + 127) // 128) * 128  # DMA slices must be lane-aligned

    planes = points_cam.reshape(c, height, width, 4)[..., :3]
    planes = jnp.moveaxis(planes, -1, 1)       # [C, 3, H, W]
    planes = jnp.pad(planes,
                     ((0, 0), (0, 0), (halo, h_pad - height + halo),
                      (0, w_pad - width)))
    m = mask.reshape(c, height, width).astype(jnp.int32)
    m = jnp.pad(m, ((0, 0), (halo, h_pad - height + halo),
                    (0, w_pad - width)))

    rows = BAND_ROWS + 2 * halo
    kernel = functools.partial(
        _kernel, height=height, width=width, halo=halo, w_pad=w_pad,
        filter_size=filter_size, enable_rot45=enable_rot45)
    scl = jnp.stack([jnp.asarray(threshold, jnp.float32),
                     jnp.asarray(max_distance, jnp.float32)]).reshape(1, 2)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, h_pad, w_pad), jnp.int32),
        grid=(c, n_bands),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, BAND_ROWS, w_pad),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, rows, w_pad), jnp.float32),
            pltpu.VMEM((rows, w_pad), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(scl, planes, m)
    return (out[:, :height, :width] != 0).reshape(c, height * width)


def filter_flying_pixels_auto(points_cam, mask, height, width, filter_size,
                              threshold, enable_rot45, max_distance=10.0,
                              prefer_pallas: bool = True):
    """Dispatch between the XLA and Pallas implementations. Hard-synced
    benchmarks on v5e (8 cams, 480x848): the Pallas kernel runs ~14.3 ms
    vs ~19.7 ms for the XLA fusion of the jnp formulation AND compiles in
    5 s vs 70 s, so it is the TPU default. (An earlier measurement through
    the platform's unreliable block_until_ready concluded the opposite —
    see the measurement-discipline note in CLAUDE.md.)"""
    if prefer_pallas and jax.default_backend() in ("tpu", "axon"):
        return filter_flying_pixels_pallas(
            points_cam, mask, height, width, filter_size, threshold,
            enable_rot45, max_distance)
    return _stencil.filter_flying_pixels(
        points_cam, mask, height, width, filter_size, threshold,
        enable_rot45, max_distance)
