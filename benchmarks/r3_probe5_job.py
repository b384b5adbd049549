"""Worker job: 'swap' emission — out_t[slab, DP] = onehot_r[slab, bn] @
(emitv*gate)^T[bn, DP]. Both operands contract in MXU-native positions
(LHS lanes, RHS sublanes), so no 4 MB one-hot transpose; the per-trip
transpose is the small [DP, bn] A-matrix. Tiny-size correctness first,
then full-size timing.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ros_gpu_depthmap_fusion_tpu.utils.profiling import hard_sync
from ros_gpu_depthmap_fusion_tpu.ops.pallas.segreduce import (
    rle_reduce_pallas)

DP = 8
BN = 8192
SLAB = 128


def _prefix_incl(x, bn):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, bn), 1)
    shift = 1
    while shift < bn:
        x = x + jnp.where(lane >= shift, jnp.roll(x, shift, axis=1), 0.0)
        shift *= 2
    return x


def make_kernel(bn, slab, n_blocks, cap_pad, sentinel, swap):
    def kernel(planes_ref, out_ref, cnt_ref, residue, slab_scr, run_carry,
               carry, sems):
        b = pl.program_id(0)
        sent = jnp.float32(sentinel)

        @pl.when(b == 0)
        def _init():
            carry[0] = 0
            carry[1] = 0
            residue[...] = jnp.zeros_like(residue)
            rr = jax.lax.broadcasted_iota(jnp.int32, run_carry.shape, 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, run_carry.shape, 1)
            run_carry[...] = jnp.where((rr == 0) & (cc == 0), sent, 0.0)

        res = carry[0]
        base_slabs = carry[1]
        planes = planes_ref[0]
        keys = planes[0:1]
        vals = planes[1:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, bn), 1)
        carry_key = run_carry[0, 0]
        carry_sums = run_carry[1:, 0:1]
        prev_key = jnp.roll(keys, 1, axis=1)
        st = jnp.where(lane == 0,
                       (keys != carry_key).astype(jnp.float32),
                       (keys != prev_key).astype(jnp.float32))
        st0 = st[0, 0]
        acc = vals + jnp.where(lane == 0, carry_sums * (1.0 - st0), 0.0)
        pre = jnp.where((st0 > 0.0) & (carry_key != sent), 1, 0)
        g = st
        shift = 1
        while shift < bn:
            live_l = lane >= shift
            gate = jnp.where(live_l, 1.0 - g, 0.0)
            acc = acc + gate * jnp.roll(acc, shift, axis=1)
            g = jnp.maximum(g, jnp.where(live_l,
                                         jnp.roll(g, shift, axis=1), 0.0))
            shift *= 2
        is_last = b == n_blocks - 1
        next_key = jnp.roll(keys, -1, axis=1)
        valid = (keys != sent).astype(jnp.float32)
        brk = (keys != next_key).astype(jnp.float32)
        last_f = jnp.where(is_last, 1.0, 0.0)
        en = valid * jnp.where(lane == bn - 1, last_f, brk)

        @pl.when(pre > 0)
        def _inject():
            slab_lane = jax.lax.broadcasted_iota(jnp.int32, (1, slab), 1)
            row = jnp.concatenate(
                [carry_key.reshape(1, 1), carry_sums], axis=0)
            residue[...] = residue[...] + jnp.where(slab_lane == res, row,
                                                    0.0)

        incl = _prefix_incl(en, bn)
        k_en = incl[0, bn - 1].astype(jnp.int32)
        excl = incl - en
        tgt = jnp.where(en > 0.0, excl + (res + pre).astype(jnp.float32),
                        -1.0)
        total = res + pre + k_en
        emitv = jnp.concatenate([keys, acc], axis=0)
        qd = jnp.floor(tgt * (1.0 / slab))
        r = tgt - qd * slab
        col = jax.lax.broadcasted_iota(jnp.int32, (slab, bn), 0).astype(
            jnp.float32)
        onehot_r = (r == col).astype(jnp.float32)       # [slab, bn]
        n_full = total // slab
        trips = n_full + jnp.where(is_last & (total % slab > 0), 1, 0)
        trips = jnp.minimum(trips, jnp.maximum(
            cap_pad // slab - base_slabs, 0))

        if swap == "hoist":
            # transpose the one-hot ONCE per block, outside the trip loop
            # (inside the loop Mosaic appears to re-lay it out per dot)
            onehot_t = jnp.transpose(onehot_r, (1, 0))       # [bn, slab]

            def slab_select(s):
                gate2 = (qd == s.astype(jnp.float32)).astype(jnp.float32)
                return jax.lax.dot_general(
                    emitv * gate2, onehot_t, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)      # [DP, slab]
        elif swap:
            def slab_select(s):
                gate2 = (qd == s.astype(jnp.float32)).astype(jnp.float32)
                a_t = jnp.transpose(emitv * gate2, (1, 0))   # [bn, DP]
                out_t = jax.lax.dot_general(
                    onehot_r, a_t, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)      # [slab, DP]
                return jnp.transpose(out_t, (1, 0))          # [DP, slab]
        else:
            def slab_select(s):
                gate2 = (qd == s.astype(jnp.float32)).astype(jnp.float32)
                return jax.lax.dot_general(
                    emitv * gate2, onehot_r, (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)

        def body(s, _):
            sl = slab_select(s) + jnp.where(s == 0, residue[...], 0.0)
            slot = s % 2

            @pl.when(s >= 2)
            def _reuse():
                pltpu.make_async_copy(
                    slab_scr.at[slot], out_ref.at[:, pl.ds(0, slab)],
                    sems.at[slot]).wait()

            slab_scr[pl.ds(slot, 1)] = sl[None]
            pltpu.make_async_copy(
                slab_scr.at[slot],
                out_ref.at[:, pl.ds((base_slabs + s) * slab, slab)],
                sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, trips, body, 0, unroll=False)
        rem = total % slab

        @pl.when(rem > 0)
        def _keep_partial():
            part = slab_select(n_full)
            residue[...] = part + jnp.where(n_full == 0, residue[...], 0.0)

        @pl.when(rem == 0)
        def _clear_res():
            residue[...] = jnp.zeros_like(residue)

        @pl.when(trips >= 1)
        def _w0():
            pltpu.make_async_copy(
                slab_scr.at[(trips - 1) % 2], out_ref.at[:, pl.ds(0, slab)],
                sems.at[(trips - 1) % 2]).wait()

        @pl.when(trips >= 2)
        def _w1():
            pltpu.make_async_copy(
                slab_scr.at[trips % 2], out_ref.at[:, pl.ds(0, slab)],
                sems.at[trips % 2]).wait()

        run_carry[:, 0:1] = jnp.concatenate(
            [keys[:, bn - 1:], acc[:, bn - 1:]], axis=0)
        carry[0] = total % slab
        carry[1] = base_slabs + total // slab

        @pl.when(is_last)
        def _fin():
            cnt_ref[0, 0] = base_slabs * slab + total

    return kernel


def build(planes_n, cap, sentinel, swap):
    n = planes_n.shape[1]
    n_blocks = -(-n // BN)
    n_pad = n_blocks * BN
    cap_pad = -(-cap // SLAB) * SLAB + SLAB
    pad = jnp.full((DP, n_pad - n), 0.0, jnp.float32).at[0].set(
        float(sentinel))

    @jax.jit
    def f(pl_in):
        planes_p = jnp.concatenate([pl_in, pad], axis=1).reshape(
            DP, n_blocks, BN).transpose(1, 0, 2)
        kernel = make_kernel(BN, SLAB, n_blocks, cap_pad, float(sentinel),
                             swap)
        out, cnt = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((DP, cap_pad), jnp.float32),
                       jax.ShapeDtypeStruct((1, 1), jnp.int32)),
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec((1, DP, BN), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            scratch_shapes=[
                pltpu.VMEM((DP, SLAB), jnp.float32),
                pltpu.VMEM((2, DP, SLAB), jnp.float32),
                pltpu.VMEM((DP, 128), jnp.float32),
                pltpu.SMEM((2,), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(planes_p)
        return out, cnt[0, 0]

    return f


# ---- tiny correctness first ----
rng = np.random.default_rng(1)
n_small = 3 * BN
keys_s = np.sort(rng.integers(0, 4000, n_small)).astype(np.int32)
vals_s = rng.integers(0, 100, (n_small, 4)).astype(np.float32)
planes_s = jnp.concatenate(
    [jnp.asarray(keys_s, jnp.float32)[None, :],
     jnp.asarray(vals_s).T, jnp.zeros((3, n_small), jnp.float32)], axis=0)
cap_s = 8192
f_swap = build(planes_s, cap_s, 1 << 22, swap="hoist")
o_s, c_s = f_swap(planes_s)
hard_sync(c_s)
pk, ps, cnt, _ = rle_reduce_pallas(jnp.asarray(keys_s),
                                   jnp.asarray(vals_s), cap_s, 1 << 22)
hard_sync(cnt)
k = int(cnt)
ok_k = bool(jnp.all(o_s[0, :k].astype(jnp.int32) == pk[:k]))
ok_s = bool(jnp.all(o_s[1:5, :k].T == ps[:k]))
print(f"tiny swap: count={int(c_s)} vs {k}; keys={ok_k} sums={ok_s}",
      flush=True)
assert int(c_s) == k and ok_k and ok_s, "swap variant wrong — stop"

# ---- full-size timing (bench depth domain) ----
from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
from ros_gpu_depthmap_fusion_tpu.core import transforms
from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
from ros_gpu_depthmap_fusion_tpu.ops.unproject import unproject_depthmaps
from ros_gpu_depthmap_fusion_tpu.ops.voxelize import _quantize_cell_relative

H, W, C = 480, 848, 8
rng = np.random.default_rng(0)
u, v = np.meshgrid(np.arange(W), np.arange(H))
base = 2500 + 200 * np.sin(u / 150.0) + 150 * np.cos(v / 120.0)
blob = 900 * np.exp(-(((u - W * .5) / 90.) ** 2 + ((v - H * .5) / 70.) ** 2))
d0 = (base - blob + rng.standard_normal((H, W))).astype(np.uint16)
d0[rng.random((H, W)) < 0.01] = 0
cfg = FusionConfig(
    num_depth_streams=C, depth_height=H, depth_width=W,
    crop_min=(-20, -20, 0), crop_max=(20, 20, 2.5),
    voxel_min=(-20, -20, 0), voxel_max=(20, 20, 2.5),
    voxel_size=(0.1, 0.1, 0.12))
grid = VoxelGrid.from_config(cfg)
cams = []
for i in range(C):
    ang = i * 2 * np.pi / C
    cams.append(transforms.make_se3(
        transforms.rot_z(ang + np.pi) @ transforms.rot_x(-np.pi / 2 - .3),
        np.array([8 * np.cos(ang), 8 * np.sin(ang), 2.0])))
tf = jnp.asarray(np.stack(cams))
intr_j = jnp.asarray(np.tile(
    PinholeIntrinsics.default_for(W, H).as_array(), (C, 1)))
dj = jnp.asarray(np.stack([d0] * C))
pc, pw, pcr, m = jax.jit(lambda d: unproject_depthmaps(
    d, intr_j, tf, tf, 0.001))(dj)
n = C * H * W
pts = pw.reshape(n, 4)
mask = m.reshape(n)
ids = jax.jit(lambda p: grid.cell_index_clamped(p[:, :3]))(pts)
sentinel = grid.num_cells
key = jnp.where(mask, ids.astype(jnp.int32), jnp.int32(sentinel))
q, _ = _quantize_cell_relative(pts, ids, grid)
vals = jnp.concatenate(
    [jnp.where(mask[:, None], q, 0.0),
     mask.astype(jnp.float32)[:, None]], axis=-1)
planes = jnp.concatenate(
    [key.astype(jnp.float32)[None, :], vals.T,
     jnp.zeros((DP - 1 - 4, n), jnp.float32)], axis=0)
cap = 512 * 1024
for swap, tag in (("hoist", "hoistT"), (False, "baseline")):
    fb = build(planes, cap, sentinel, swap)
    o, c = fb(planes)
    hard_sync(c)
    t0 = time.perf_counter()
    for _ in range(10):
        o, c = fb(planes)
    hard_sync(c)
    print(f"level-1 {tag}: {(time.perf_counter() - t0) / 10 * 1e3:7.2f} ms "
          f"(count={int(c)})", flush=True)
