"""Round-3 probe 2: (1) partials-capacity sweep of the SPLIT fused step
(interleaved repeats — the tunnel's speed drifts between runs, so
same-process interleaving is the only fair comparison), (2) RLE level-1
kernel component isolation via probe-local kernel variants (scan-only /
emit-only), to find where its ~13.5 ms go.

Run: bash scripts/tpu_run.sh 1800 benchmarks/r3_probe2.py
"""

import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ros_gpu_depthmap_fusion_tpu.utils.profiling import hard_sync
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
    from ros_gpu_depthmap_fusion_tpu.core import transforms
    from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
    from ros_gpu_depthmap_fusion_tpu.pipeline.engine import FusionEngine
    from ros_gpu_depthmap_fusion_tpu.ops.pallas.compact import (
        BN, DP, SLAB, _emit_slabs, _prefix_incl)
    from ros_gpu_depthmap_fusion_tpu.ops.pallas import segreduce as sr

    H, W, C = 480, 848, 8
    rng = np.random.default_rng(0)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    base = 2500 + 200 * np.sin(u / 150.0) + 150 * np.cos(v / 120.0)
    blob = 900 * np.exp(-(((u - W * .5) / 90.) ** 2 + ((v - H * .5) / 70.) ** 2))
    d0 = (base - blob + rng.standard_normal((H, W))).astype(np.uint16)
    d0[rng.random((H, W)) < 0.01] = 0
    intr = PinholeIntrinsics.default_for(W, H)
    cams = []
    for i in range(C):
        ang = i * 2 * np.pi / C
        pos = np.array([8 * np.cos(ang), 8 * np.sin(ang), 2.0])
        cams.append(transforms.make_se3(
            transforms.rot_z(ang + np.pi) @ transforms.rot_x(-np.pi / 2 - .3),
            pos))
    t_l = np.linspace(0, np.pi, 8192)
    arcs = [np.stack([6 * np.cos(t_l), 6 * np.sin(t_l),
                      1 + .3 * np.sin(5 * t_l)], -1).astype(np.float32),
            np.stack([12 * np.cos(-.7 * t_l), 12 * np.sin(-.7 * t_l),
                      1.5 + 0 * t_l], -1).astype(np.float32)]

    def make_engine(partials):
        cfg = FusionConfig(
            num_depth_streams=C, depth_height=H, depth_width=W,
            num_point_sequences=2,
            crop_min=(-20, -20, 0), crop_max=(20, 20, 2.5),
            voxel_min=(-20, -20, 0), voxel_max=(20, 20, 2.5),
            voxel_size=(0.1, 0.1, 0.12), voxel_occupancy_lifetime=10,
            rollbuffer_point_capacity=98304,
            max_points_per_sequence=16384,
            depth_codec_quant_shift=3, depth_codec_max_exceptions=12288,
            lidar_link_quant_step=0.002,
            voxelize_partials_capacity=partials,
            emit_raw_points=False)
        eng = FusionEngine(cfg, pipeline_depth=0)
        for i in range(C):
            eng.add_depthmap(i, d0, intr, cams[i], cams[i])
        for arc in arcs:
            eng.add_point_sequence(arc, 10, 0, np.eye(4, dtype=np.float32))
        out = eng.process(10.0)
        hard_sync(out.fused_count)
        for i in range(C):
            eng.add_depthmap(i, d0, intr, cams[i], cams[i])
        for arc in arcs:
            eng.add_point_sequence(arc, 10, 0, np.eye(4, dtype=np.float32))
        pktv = np.array(eng._pkt.view(eng._last_bits))
        return eng, jax.device_put(pktv), eng._last_bits

    caps = (384 * 1024, 416 * 1024, 512 * 1024)
    engines = {}
    for c in caps:
        print(f"[probe2] building engine partials={c // 1024}k "
              f"(cold compile can take minutes)...", flush=True)
        engines[c] = make_engine(c)
    states = {c: engines[c][0].state for c in caps}
    for rnd in range(3):
        for c in caps:
            eng, inp, bits = engines[c]
            st = states[c]  # carry forward — the step donates its input
            t0 = time.perf_counter()
            for _ in range(10):
                st, o = eng.step(st, inp, depth_bits=bits)
            hard_sync(o.fused_count)
            states[c] = st
            print(f"r{rnd} split step partials={c // 1024}k: "
                  f"{(time.perf_counter() - t0) / 10 * 1e3:7.2f} ms",
                  flush=True)
    del engines

    # ------ RLE level-1 kernel isolation (probe-local variants) ------
    from ros_gpu_depthmap_fusion_tpu.ops.unproject import unproject_depthmaps
    from ros_gpu_depthmap_fusion_tpu.ops.voxelize import (
        _quantize_cell_relative)
    cfg = FusionConfig(
        num_depth_streams=C, depth_height=H, depth_width=W,
        crop_min=(-20, -20, 0), crop_max=(20, 20, 2.5),
        voxel_min=(-20, -20, 0), voxel_max=(20, 20, 2.5),
        voxel_size=(0.1, 0.1, 0.12))
    grid = VoxelGrid.from_config(cfg)
    tf = jnp.asarray(np.stack(cams))
    intr_j = jnp.asarray(np.tile(intr.as_array(), (C, 1)))
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

    cap = 384 * 1024

    def variant_kernel(planes_ref, out_ref, cnt_ref, residue, slab_scr,
                       run_carry, carry, sems, *, n_blocks, cap_pad,
                       sentinel, do_scan, do_emit):
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
        planes_b = planes_ref[0]
        keys = planes_b[0:1]
        vals_b = planes_b[1:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, BN), 1)
        carry_key = run_carry[0, 0]
        carry_sums = run_carry[1:, 0:1]
        prev_key = jnp.roll(keys, 1, axis=1)
        st = jnp.where(lane == 0,
                       (keys != carry_key).astype(jnp.float32),
                       (keys != prev_key).astype(jnp.float32))
        st0 = st[0, 0]
        acc = vals_b + jnp.where(lane == 0, carry_sums * (1.0 - st0), 0.0)
        pre = jnp.where((st0 > 0.0) & (carry_key != sent), 1, 0)
        if do_scan:
            g = st
            shift = 1
            while shift < BN:
                live_l = lane >= shift
                gate = jnp.where(live_l, 1.0 - g, 0.0)
                acc = acc + gate * jnp.roll(acc, shift, axis=1)
                g = jnp.maximum(g, jnp.where(live_l,
                                             jnp.roll(g, shift, axis=1),
                                             0.0))
                shift *= 2
        is_last = b == n_blocks - 1
        next_key = jnp.roll(keys, -1, axis=1)
        valid = (keys != sent).astype(jnp.float32)
        brk = (keys != next_key).astype(jnp.float32)
        last_f = jnp.where(is_last, 1.0, 0.0)
        en = valid * jnp.where(lane == BN - 1, last_f, brk)

        @pl.when(pre > 0)
        def _inject():
            slab_lane = jax.lax.broadcasted_iota(jnp.int32, (1, SLAB), 1)
            row = jnp.concatenate(
                [carry_key.reshape(1, 1), carry_sums], axis=0)
            residue[...] = residue[...] + jnp.where(slab_lane == res, row,
                                                    0.0)

        incl = _prefix_incl(en, BN)
        k_en = incl[0, BN - 1].astype(jnp.int32)
        excl = incl - en
        tgt = jnp.where(en > 0.0, excl + (res + pre).astype(jnp.float32),
                        -1.0)
        total = res + pre + k_en
        emit_planes = jnp.concatenate([keys, acc], axis=0)
        if do_emit:
            _emit_slabs(emit_planes, tgt, total, base_slabs, is_last,
                        residue, slab_scr, out_ref, sems, cap_pad)
        else:
            # keep the scan + tgt live without touching the ANY-space
            # output: fold a data-dependent value into the SMEM count
            @pl.when(is_last)
            def _keep():
                cnt_ref[0, 0] = (emit_planes[1, BN - 1]
                                 + tgt[0, BN - 1]).astype(jnp.int32)
        run_carry[:, 0:1] = jnp.concatenate(
            [keys[:, BN - 1:], acc[:, BN - 1:]], axis=0)
        carry[0] = total % SLAB
        carry[1] = base_slabs + total // SLAB

        @pl.when(is_last)
        def _fin():
            cnt_ref[0, 0] = base_slabs * SLAB + total

    def run_variant(name, do_scan, do_emit):
        n_blocks = -(-n // BN)
        n_pad = n_blocks * BN
        cap_pad = -(-cap // SLAB) * SLAB + SLAB
        pad = jnp.full((DP, n_pad - n), 0.0, jnp.float32).at[0].set(
            float(sentinel))

        @jax.jit
        def f(pl_in):
            planes_p = jnp.concatenate([pl_in, pad], axis=1).reshape(
                DP, n_blocks, BN).transpose(1, 0, 2)
            kernel = functools.partial(
                variant_kernel, n_blocks=n_blocks, cap_pad=cap_pad,
                sentinel=float(sentinel), do_scan=do_scan, do_emit=do_emit)
            out, cnt = pl.pallas_call(
                kernel,
                out_shape=(jax.ShapeDtypeStruct((DP, cap_pad),
                                                jnp.float32),
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
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
            )(planes_p)
            return cnt[0, 0]

        hard_sync(f(planes))
        t0 = time.perf_counter()
        for _ in range(10):
            o = f(planes)
        hard_sync(o)
        print(f"level-1 {name:22s} {(time.perf_counter() - t0) / 10 * 1e3:7.2f} ms",
              flush=True)

    run_variant("full (scan+emit)", True, True)
    run_variant("scan only", True, False)
    run_variant("emit only", False, True)
    run_variant("neither", False, False)

    # input DMA floor: same blocking, kernel just touches the block
    def floor_kernel(planes_ref, out_ref, *, n_blocks):
        b = pl.program_id(0)
        out_ref[0, 0] = jnp.sum(planes_ref[0][:, 0:128])

    n_blocks = -(-n // BN)
    n_pad = n_blocks * BN
    pad0 = jnp.zeros((DP, n_pad - n), jnp.float32)

    @jax.jit
    def floor_f(pl_in):
        planes_p = jnp.concatenate([pl_in, pad0], axis=1).reshape(
            DP, n_blocks, BN).transpose(1, 0, 2)
        return pl.pallas_call(
            functools.partial(floor_kernel, n_blocks=n_blocks),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec((1, DP, BN), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(planes_p)

    hard_sync(floor_f(planes))
    t0 = time.perf_counter()
    for _ in range(10):
        o = floor_f(planes)
    hard_sync(o)
    print(f"level-1 {'DMA floor':22s} {(time.perf_counter() - t0) / 10 * 1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
