"""Round-3 consolidated probe: host-loop phases at the EXACT bench
operating point, the split fused step, and an RLE block-size sweep —
all in one process (the tunnel wedges most often at process startup, so
fewer processes = fewer 15-minute retry cycles).

Run: bash scripts/tpu_run.sh 1800 benchmarks/r3_probe.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ros_gpu_depthmap_fusion_tpu.utils.profiling import hard_sync
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
    from ros_gpu_depthmap_fusion_tpu.core import transforms
    from ros_gpu_depthmap_fusion_tpu.pipeline.engine import FusionEngine
    from ros_gpu_depthmap_fusion_tpu.ops.depth_codec import B_BUCKETS
    from ros_gpu_depthmap_fusion_tpu.utils import native

    H, W, C = 480, 848, 8
    N_LIDAR_STREAMS, LIDAR_PTS = 2, 8192
    cfg = FusionConfig(
        num_depth_streams=C, depth_height=H, depth_width=W,
        num_point_sequences=N_LIDAR_STREAMS,
        crop_min=(-20, -20, 0), crop_max=(20, 20, 2.5),
        voxel_min=(-20, -20, 0), voxel_max=(20, 20, 2.5),
        voxel_size=(0.1, 0.1, 0.12), voxel_occupancy_lifetime=10,
        rollbuffer_point_capacity=98304,
        max_points_per_sequence=N_LIDAR_STREAMS * LIDAR_PTS,
        depth_codec_quant_shift=3, depth_codec_max_exceptions=12288,
        lidar_link_quant_step=0.002,
        voxelize_partials_capacity=384 * 1024,
        emit_raw_points=False)

    # --- bench scene (same generator as bench.py) ---
    rng = np.random.default_rng(0)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    N_STAGED = 8
    depths = []
    for k in range(N_STAGED):
        ph = 2 * np.pi * k / N_STAGED
        base = (2500 + 200 * np.sin(u / 150.0 + ph)
                + 150 * np.cos(v / 120.0 - 0.7 * ph))
        cx, cy = W * (0.3 + 0.4 * k / N_STAGED), H * 0.5
        blob = 900 * np.exp(-(((u - cx) / 90.0) ** 2
                             + ((v - cy) / 70.0) ** 2))
        d = (base - blob + rng.standard_normal((H, W))).astype(np.uint16)
        d[rng.random((H, W)) < 0.01] = 0
        depths.append(d)
    intr = PinholeIntrinsics.default_for(W, H)
    cams = []
    for i in range(C):
        ang = i * 2 * np.pi / C
        pos = np.array([8 * np.cos(ang), 8 * np.sin(ang), 2.0])
        cams.append(transforms.make_se3(
            transforms.rot_z(ang + np.pi) @ transforms.rot_x(-np.pi / 2 - .3),
            pos))
    t_l = np.linspace(0, np.pi, LIDAR_PTS)
    arcs = [np.stack([6 * np.cos(t_l), 6 * np.sin(t_l),
                      1 + 0.3 * np.sin(5 * t_l)], -1).astype(np.float32),
            np.stack([12 * np.cos(-t_l * 0.7), 12 * np.sin(-t_l * 0.7),
                      1.5 + 0 * t_l], -1).astype(np.float32)]

    eng = FusionEngine(cfg, pipeline_depth=0)

    def stage(f):
        for i in range(C):
            eng.add_depthmap(i, depths[f % N_STAGED], intr, cams[i],
                             cams[i])
        for arc in arcs:
            eng.add_point_sequence(arc, sec=10 + f // 30,
                                   nsec=int((f % 30) * 33e6),
                                   tf_move=np.eye(4, dtype=np.float32))

    for f in range(N_STAGED):
        stage(f)
        out = eng.process(10.0 + f / 30.0)
    hard_sync(out.fused_count)
    print(f"codec bits={eng._last_bits} "
          f"packet={4 * eng.layout.total_words(eng._last_bits) / 1e6:.2f} MB "
          f"partials_true={int(np.asarray(out.vox_partials_count))}",
          flush=True)

    N = 20

    # --- host phases ---
    t0 = time.perf_counter()
    for f in range(N):
        stage(f)
        eng.clear()
    print(f"stage (8 cams + 2 arcs):      "
          f"{(time.perf_counter() - t0) / N * 1e3:8.2f} ms", flush=True)

    stage(0)
    pkt = eng._pkt
    t0 = time.perf_counter()
    for f in range(N):
        enc, bits = native.depth_encode(
            eng._depth_host, cfg.depth_codec_max_exceptions,
            allowed_bits=B_BUCKETS,
            out=dict(words=pkt.tail, row_first=pkt.row_first,
                     exc_idx=pkt.exc_idx, exc_zz=pkt.exc_zz),
            guess_bits=eng._last_bits,
            quant_shift=cfg.depth_codec_quant_shift)
    t_enc = (time.perf_counter() - t0) / N
    pkt.set_scalars(int(enc["exc_count"]), 10, 0, 9, 0, 0, 0, .5, 10., .5)
    view = pkt.view(bits)
    print(f"encode ({bits}b -> {view.nbytes / 1e6:.2f} MB):   "
          f"{t_enc * 1e3:8.2f} ms", flush=True)

    hard_sync(jax.device_put(np.array(view)))
    t0 = time.perf_counter()
    for _ in range(N):
        o = jax.device_put(np.array(view))
    hard_sync(o)
    t_put = (time.perf_counter() - t0) / N
    print(f"device_put drained:           {t_put * 1e3:8.2f} ms "
          f"({view.nbytes / 1e6 / t_put:.1f} MB/s)", flush=True)

    dev_pkt = jax.device_put(np.array(view))
    hard_sync(dev_pkt)
    t0 = time.perf_counter()
    for _ in range(N):
        eng.state, o = eng.step(eng.state, dev_pkt, depth_bits=bits)
    hard_sync(o.fused_count)
    t_step = (time.perf_counter() - t0) / N
    print(f"SPLIT step drained:           {t_step * 1e3:8.2f} ms", flush=True)

    # put+step interleaved (does h2d overlap compute on this tunnel?)
    t0 = time.perf_counter()
    for _ in range(N):
        dp = jax.device_put(np.array(view))
        eng.state, o = eng.step(eng.state, dp, depth_bits=bits)
    hard_sync(o.fused_count)
    t_ps = (time.perf_counter() - t0) / N
    print(f"put+step same thread:         {t_ps * 1e3:8.2f} ms "
          f"(serial would be {1e3 * (t_put + t_step):.1f})", flush=True)

    # threaded overlap: transfer thread issues put for frame k while the
    # main thread steps frame k-1 (the engine's pipeline_depth=1 schedule)
    import concurrent.futures
    xfer = concurrent.futures.ThreadPoolExecutor(1)
    fut = xfer.submit(lambda: jax.device_put(np.array(view)))
    t0 = time.perf_counter()
    for _ in range(N):
        dp = fut.result()
        fut = xfer.submit(lambda: jax.device_put(np.array(view)))
        eng.state, o = eng.step(eng.state, dp, depth_bits=bits)
    hard_sync(o.fused_count)
    t_ov = (time.perf_counter() - t0) / N
    print(f"put(thread)+step overlapped:  {t_ov * 1e3:8.2f} ms", flush=True)
    xfer.shutdown()

    # full pipelined engine loop (pipeline_depth=1), moving scene
    eng2 = FusionEngine(cfg, pipeline_depth=1)
    for f in range(N_STAGED + 2):
        stage2 = [eng2.add_depthmap(i, depths[f % N_STAGED], intr, cams[i],
                                    cams[i]) for i in range(C)]
        for arc in arcs:
            eng2.add_point_sequence(arc, sec=10 + f // 30,
                                    nsec=int((f % 30) * 33e6),
                                    tf_move=np.eye(4, dtype=np.float32))
        out = eng2.process(10.0 + f / 30.0)
    _ = int(np.asarray(out.fused_count))
    t0 = time.perf_counter()
    for f in range(30):
        for i in range(C):
            eng2.add_depthmap(i, depths[f % N_STAGED], intr, cams[i],
                              cams[i])
        for arc in arcs:
            eng2.add_point_sequence(arc, sec=11 + f // 30,
                                    nsec=int((f % 30) * 33e6),
                                    tf_move=np.eye(4, dtype=np.float32))
        out = eng2.process(11.0 + f / 30.0)
    _ = int(np.asarray(out.fused_count))
    t_full = (time.perf_counter() - t0) / 30
    print(f"FULL pipelined loop:          {t_full * 1e3:8.2f} ms "
          f"-> {1 / t_full:.1f} fps", flush=True)

    # --- RLE level-1 block-size sweep on the real depth-domain stream ---
    from ros_gpu_depthmap_fusion_tpu.ops.unproject import unproject_depthmaps
    from ros_gpu_depthmap_fusion_tpu.ops.voxelize import (
        _quantize_cell_relative)
    from ros_gpu_depthmap_fusion_tpu.ops.pallas.segreduce import (
        rle_reduce_pallas)
    from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
    grid = VoxelGrid.from_config(cfg)
    tf = jnp.asarray(np.stack(cams))
    intr_j = jnp.asarray(np.tile(intr.as_array(), (C, 1)))
    dj = jnp.asarray(np.stack([depths[0]] * 1).repeat(C, 0)
                     if False else np.stack([depths[0]] * C))
    pc, pw, pcr, m = jax.jit(lambda d: unproject_depthmaps(
        d, intr_j, tf, tf, 0.001))(dj)
    n_depth = C * H * W
    pts = pw.reshape(n_depth, 4)
    mask = m.reshape(n_depth)
    ids = jax.jit(lambda p: grid.cell_index_clamped(p[:, :3]))(pts)
    sentinel = grid.num_cells

    def level1(bn):
        def f(p, i, mm):
            key = jnp.where(mm, i.astype(jnp.int32), jnp.int32(sentinel))
            q, _ = _quantize_cell_relative(p, i, grid)
            vals = jnp.concatenate(
                [jnp.where(mm[:, None], q, 0.0),
                 mm.astype(p.dtype)[:, None]], axis=-1)
            return rle_reduce_pallas(key, vals, 384 * 1024, sentinel,
                                     bn=bn)[2]
        return f

    for bn in (8192, 16384, 32768, 65536):
        try:
            fj = jax.jit(level1(bn))
            hard_sync(fj(pts, ids, mask))
            t0 = time.perf_counter()
            for _ in range(10):
                o = fj(pts, ids, mask)
            hard_sync(o)
            print(f"rle level-1 bn={bn:6d}:       "
                  f"{(time.perf_counter() - t0) / 10 * 1e3:8.2f} ms",
                  flush=True)
        except Exception as e:  # VMEM overflow etc.
            print(f"rle level-1 bn={bn}: FAILED {type(e).__name__}",
                  flush=True)


if __name__ == "__main__":
    main()
