"""Round-3 device-step attribution at the bench operating point.

Times each sub-stage of the fused step in isolation (decode, unproject,
flying-pixel, crop, RLE level-1, partials sort at several domain sizes,
level-2 reduce, occupancy update) and reports the TRUE level-1 run count
for the bench scene, so ``voxelize_partials_capacity`` can be sized to
measurement instead of worst case (VERDICT r2 item 1a).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/step_attrib_r3.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ros_gpu_depthmap_fusion_tpu.utils.profiling import hard_sync
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
    from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
    from ros_gpu_depthmap_fusion_tpu.core import transforms
    from ros_gpu_depthmap_fusion_tpu.ops.unproject import unproject_depthmaps
    from ros_gpu_depthmap_fusion_tpu.ops.pallas.flying_pixels import (
        filter_flying_pixels_pallas)
    from ros_gpu_depthmap_fusion_tpu.ops.mask_ops import crop_points
    from ros_gpu_depthmap_fusion_tpu.ops.voxel import (
        scatter_occupancy, update_historic_occupancy, occupancy_to_u8)
    from ros_gpu_depthmap_fusion_tpu.ops.voxelize import (
        _quantize_cell_relative, voxelize_average_rle)
    from ros_gpu_depthmap_fusion_tpu.ops.pallas.segreduce import (
        rle_reduce_pallas)
    from ros_gpu_depthmap_fusion_tpu.ops.depth_codec import decode_depth
    from ros_gpu_depthmap_fusion_tpu.ops import depth_codec
    from ros_gpu_depthmap_fusion_tpu.utils import native

    H, W, C = 480, 848, 8
    cfg = FusionConfig(
        num_depth_streams=C, depth_height=H, depth_width=W,
        num_point_sequences=1,
        crop_min=(-20, -20, 0), crop_max=(20, 20, 2.5),
        voxel_min=(-20, -20, 0), voxel_max=(20, 20, 2.5),
        voxel_size=(0.1, 0.1, 0.12), voxel_occupancy_lifetime=10,
        rollbuffer_point_capacity=131072, max_points_per_sequence=4096,
        emit_raw_points=False)
    grid = VoxelGrid.from_config(cfg)
    print(f"platform={jax.devices()[0].platform}")

    def t(name, fn, *args, iters=10):
        f = jax.jit(fn)
        hard_sync(f(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        hard_sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:44s} {dt * 1e3:8.2f} ms")
        return dt

    # bench scene (8 distinct cams around a ring, same depth content)
    rng = np.random.default_rng(0)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    base = 2500 + 200 * np.sin(u / 150.0) + 150 * np.cos(v / 120.0)
    d0 = (base + rng.standard_normal((H, W))).astype(np.uint16)
    d0[rng.random((H, W)) < 0.01] = 0
    depth = np.stack([d0] * C)
    cams = []
    for i in range(C):
        ang = i * 2 * np.pi / C
        pos = np.array([8 * np.cos(ang), 8 * np.sin(ang), 2.0])
        cams.append(transforms.make_se3(
            transforms.rot_z(ang + np.pi) @ transforms.rot_x(-np.pi / 2 - .3),
            pos))
    tf = jnp.asarray(np.stack(cams))
    intr = jnp.asarray(np.tile(
        PinholeIntrinsics.default_for(W, H).as_array(), (C, 1)))

    # --- encoded payload for the decoder ---
    enc, bits = native.depth_encode(depth, cfg.depth_codec_max_exceptions,
                                    allowed_bits=depth_codec.B_BUCKETS)
    enc_dev = jax.device_put({k: np.asarray(val) for k, val in enc.items()})
    from ros_gpu_depthmap_fusion_tpu.ops.depth_codec import EncodedDepth
    ed = EncodedDepth(words=enc_dev["words"], row_first=enc_dev["row_first"],
                      exc_idx=enc_dev["exc_idx"].astype(np.int32),
                      exc_zz=enc_dev["exc_zz"].astype(np.int32),
                      exc_count=jnp.int32(len(enc["exc_idx"])))
    t(f"decode_depth ({bits}b)", lambda e: decode_depth(e, H, W, bits), ed)

    dj = jnp.asarray(depth)
    t("unproject (3 frames)",
      lambda d: unproject_depthmaps(d, intr, tf, tf, 0.001), dj)
    pc, pw, pcr, m = jax.jit(
        lambda d: unproject_depthmaps(d, intr, tf, tf, 0.001))(dj)
    t("flying pallas size1 rot45",
      lambda p, mm: filter_flying_pixels_pallas(p, mm, H, W, 1, 0.5, True,
                                                10.0), pc, m)

    n_depth = C * H * W
    t("crop (depth only)",
      lambda p, mm: crop_points(p.reshape(-1, 4), mm.reshape(-1),
                                cfg.crop_min, cfg.crop_max), pcr, m)

    # --- RLE voxelize internals, depth-domain only ---
    pts = pw.reshape(n_depth, 4)
    mask = m.reshape(n_depth)
    ids = jax.jit(lambda p: grid.cell_index_clamped(p[:, :3]))(pts)
    sentinel = grid.num_cells

    def level1(p, i, mm, cap):
        key = jnp.where(mm, i.astype(jnp.int32), jnp.int32(sentinel))
        q, _ = _quantize_cell_relative(p, i, grid)
        vals = jnp.concatenate(
            [jnp.where(mm[:, None], q, 0.0),
             mm.astype(p.dtype)[:, None]], axis=-1)
        return rle_reduce_pallas(key, vals, cap, sentinel)

    pk, ps, cnt, _ = jax.jit(lambda p, i, mm: level1(p, i, mm, n_depth // 4))(
        pts, ids, mask)
    true_runs = int(cnt)
    print(f"TRUE level-1 run count (depth, bench scene): {true_runs} "
          f"({n_depth / max(true_runs, 1):.1f}x reduction of {n_depth})")

    for cap in (n_depth // 4, 1 << 19, 384 * 1024, 1 << 18):
        t(f"rle level-1 (cap={cap})",
          lambda p, i, mm, c=cap: level1(p, i, mm, c)[2], pts, ids, mask)

    # --- sort cost vs domain size (5-operand f32) ---
    for cap in (n_depth // 4, 1 << 19, 384 * 1024, 1 << 18, 1 << 17):
        kk = jnp.asarray(
            rng.integers(0, sentinel, size=cap, dtype=np.int32))
        vv = jnp.asarray(rng.random((cap, 4), np.float32))
        t(f"sort 5-op ({cap} rows)",
          lambda k, s: jax.lax.sort(
              (k, s[:, 0], s[:, 1], s[:, 2], s[:, 3]), num_keys=1)[0],
          kk, vv, iters=5)
        t(f"  + level-2 rle ({cap} rows)",
          lambda k, s: rle_reduce_pallas(
              jax.lax.sort((k,), num_keys=1)[0], s, 262144, sentinel)[2],
          kk, vv, iters=5)

    # --- full voxelize_average_rle at candidate partials caps ---
    for cap in (0, 1 << 19, 384 * 1024, 1 << 18):
        t(f"voxelize_average_rle (partials={cap or 'N//4'})",
          lambda p, i, mm, c=cap: voxelize_average_rle(
              p, i, mm, grid, 262144, return_occupancy=True,
              partials_capacity=c)[1], pts, ids, mask, iters=5)

    # --- occupancy update chain ---
    occ = jnp.zeros((grid.num_cells,), jnp.int32)
    fr = jax.jit(lambda i, mm: scatter_occupancy(i, mm, grid.num_cells))(
        ids[:262144], mask[:262144])
    t("historic update + u8 pack",
      lambda h, f: occupancy_to_u8(update_historic_occupancy(h, f, 10)),
      occ, fr)

    # --- THE FULL FUSED PACKET STEP at the bench operating point ---
    from ros_gpu_depthmap_fusion_tpu.pipeline.engine import (
        FusionEngine, initial_state)
    from ros_gpu_depthmap_fusion_tpu.core import transforms as T

    def fused_step_ms(name, cfg2, lidar=True, iters=10):
        eng = FusionEngine(cfg2, pipeline_depth=0)
        intr2 = PinholeIntrinsics.default_for(cfg2.depth_width,
                                              cfg2.depth_height)
        d8 = np.broadcast_to(
            depth[0, :cfg2.depth_height, :cfg2.depth_width],
            (cfg2.num_depth_streams, cfg2.depth_height, cfg2.depth_width))
        for i in range(cfg2.num_depth_streams):
            eng.add_depthmap(i, d8[i], intr2, np.asarray(cams[i]),
                             np.asarray(cams[i]))
        if lidar and cfg2.num_point_sequences:
            tl = np.linspace(0, np.pi, 8192)
            for s in range(cfg2.num_point_sequences):
                arc = np.stack([6 * np.cos(tl), 6 * np.sin(tl),
                                1 + 0.3 * np.sin(5 * tl)],
                               axis=-1).astype(np.float32)
                eng.add_point_sequence(arc, sec=10, nsec=0,
                                       tf_move=np.eye(4, dtype=np.float32))
        out = eng.process(10.0)
        hard_sync(out.fused_count)
        # re-stage and time the pure device step on a fixed device packet
        for i in range(cfg2.num_depth_streams):
            eng.add_depthmap(i, d8[i], intr2, np.asarray(cams[i]),
                             np.asarray(cams[i]))
        import jax as _jax
        pktv = np.array(eng._pkt.view(eng._last_bits))
        inp = _jax.device_put(pktv)
        st = eng.state
        t0 = time.perf_counter()
        for _ in range(iters):
            st, out = eng.step(st, inp, depth_bits=eng._last_bits)
        hard_sync(out.fused_count)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:44s} {dt * 1e3:8.2f} ms")
        return dt

    base_kw = dict(
        num_depth_streams=C, depth_height=H, depth_width=W,
        num_point_sequences=2,
        crop_min=(-20, -20, 0), crop_max=(20, 20, 2.5),
        voxel_min=(-20, -20, 0), voxel_max=(20, 20, 2.5),
        voxel_size=(0.1, 0.1, 0.12), voxel_occupancy_lifetime=10,
        rollbuffer_point_capacity=98304, max_points_per_sequence=16384,
        depth_codec_quant_shift=2, voxelize_partials_capacity=512 * 1024,
        emit_raw_points=False)
    fused_step_ms("FULL step (bench operating point)", FusionConfig(**base_kw))
    fused_step_ms("FULL step (partials 384k)",
                  FusionConfig(**{**base_kw,
                                  "voxelize_partials_capacity": 384 * 1024}))
    fused_step_ms("FULL step (no lidar, rb 4k)",
                  FusionConfig(**{**base_kw, "num_point_sequences": 0,
                                  "rollbuffer_point_capacity": 4096,
                                  "max_points_per_sequence": 1024}),
                  lidar=False)


if __name__ == "__main__":
    main()
