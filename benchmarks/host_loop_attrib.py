"""Attribute the end-to-end frame time to host-loop phases.

The device step is measured (device_step.py) at ~28 ms; bench steady state
is ~65 ms/frame. This probe times each host-side phase of the bench loop
in isolation and in combination to find what fails to overlap:

  stage     8x np.copyto into the pinned host packet
  encode    native DPCM encode into the packet
  put       jax.device_put of the packet view (host-blocking portion)
  dispatch  eng.step call (host-blocking portion)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/host_loop_attrib.py
"""

import time

import numpy as np


def main():
    import jax
    from ros_gpu_depthmap_fusion_tpu.utils.profiling import hard_sync
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
    from ros_gpu_depthmap_fusion_tpu.core import transforms
    from ros_gpu_depthmap_fusion_tpu.pipeline.engine import FusionEngine
    from ros_gpu_depthmap_fusion_tpu.ops.depth_codec import B_BUCKETS
    from ros_gpu_depthmap_fusion_tpu.utils import native

    H, W, C = 480, 848, 8
    cfg = FusionConfig(
        num_depth_streams=C, depth_height=H, depth_width=W,
        num_point_sequences=1,
        crop_min=(-20, -20, 0), crop_max=(20, 20, 2.5),
        voxel_min=(-20, -20, 0), voxel_max=(20, 20, 2.5),
        voxel_size=(0.1, 0.1, 0.12),
        voxel_occupancy_lifetime=10,
        rollbuffer_point_capacity=131072,
        max_points_per_sequence=4096,
        emit_raw_points=False,
    )
    eng = FusionEngine(cfg)
    intr = PinholeIntrinsics.default_for(W, H)
    cams = []
    for i in range(C):
        ang = i * 2 * np.pi / C
        pos = np.array([8 * np.cos(ang), 8 * np.sin(ang), 2.0])
        cams.append(transforms.make_se3(
            transforms.rot_z(ang + np.pi) @ transforms.rot_x(-np.pi / 2 - .3),
            pos))
    rng = np.random.default_rng(0)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    base = 2500 + 200 * np.sin(u / 150.0) + 150 * np.cos(v / 120.0)
    depths = []
    for f in range(4):
        d = (base + 30 * np.sin(u / 37.0 + f)
             + rng.standard_normal((H, W))).astype(np.uint16)
        d[rng.random((H, W)) < 0.01] = 0
        depths.append(d)

    def stage(f):
        for i in range(C):
            eng.add_depthmap(i, depths[f % 4], intr, cams[i], cams[i])

    # warm everything
    for f in range(5):
        stage(f)
        out = eng.process(10.0 + f / 30.0)
    _ = int(np.asarray(out.fused_count))

    N = 20

    # stage only
    t0 = time.perf_counter()
    for f in range(N):
        stage(f)
        eng.clear()
    t_stage = (time.perf_counter() - t0) / N
    print(f"stage (8x copyto):            {t_stage*1e3:8.2f} ms")

    # encode only (into the live packet, like process() does)
    stage(0)
    pkt = eng._pkt
    t0 = time.perf_counter()
    for f in range(N):
        enc, bits = native.depth_encode(
            eng._depth_host, cfg.depth_codec_max_exceptions,
            allowed_bits=B_BUCKETS,
            out=dict(words=pkt.tail, row_first=pkt.row_first,
                     exc_idx=pkt.exc_idx, exc_zz=pkt.exc_zz))
    t_enc = (time.perf_counter() - t0) / N
    pkt.set_scalars(int(enc["exc_count"]), 10, 0, 9, 0, 0, 0, .5, 10., .5)
    view = pkt.view(bits)
    print(f"encode ({bits}b -> {view.nbytes/1e6:.2f} MB):  {t_enc*1e3:8.2f} ms")

    # device_put host-blocking time (no compute queued)
    hard_sync(jax.device_put(view))
    t0 = time.perf_counter()
    outs = [jax.device_put(view) for _ in range(N)]
    t_put_async = (time.perf_counter() - t0) / N
    hard_sync(outs[-1])
    t0 = time.perf_counter()
    for _ in range(N):
        o = jax.device_put(view)
    hard_sync(o)
    t_put_sync = (time.perf_counter() - t0) / N
    print(f"device_put async/host-block:  {t_put_async*1e3:8.2f} ms")
    print(f"device_put drained:           {t_put_sync*1e3:8.2f} ms "
          f"({view.nbytes/1e6/t_put_sync:.1f} MB/s)")

    # dispatch host-blocking time (inputs device-resident)
    dev_pkt = jax.device_put(view)
    hard_sync(dev_pkt)
    t0 = time.perf_counter()
    for _ in range(N):
        eng.state, o = eng.step(eng.state, dev_pkt, depth_bits=bits)
    t_disp = (time.perf_counter() - t0) / N
    hard_sync(o.fused_count)
    print(f"step dispatch (host-block):   {t_disp*1e3:8.2f} ms")

    # put+step interleaved, drain at end (does transfer overlap compute?)
    t0 = time.perf_counter()
    for _ in range(N):
        dp = jax.device_put(view)
        eng.state, o = eng.step(eng.state, dp, depth_bits=bits)
    hard_sync(o.fused_count)
    t_ps = (time.perf_counter() - t0) / N
    print(f"put+step pipelined:           {t_ps*1e3:8.2f} ms "
          f"-> {1/t_ps:.1f} fps")

    # full loop (stage+encode+put+step), drain at end
    t0 = time.perf_counter()
    for f in range(N):
        stage(f)
        out = eng.process(20.0 + f / 30.0)
    hard_sync(out.fused_count)
    t_full = (time.perf_counter() - t0) / N
    print(f"full loop pipelined:          {t_full*1e3:8.2f} ms "
          f"-> {1/t_full:.1f} fps")


if __name__ == "__main__":
    main()
