"""Why does put->step serialize when the step consumes the put?

Variants over the REAL fused step at the bench operating point:
  v0: put(k); step(k)                      (engine's current order)
  v1: put(k+1) issued BEFORE step(k)       (one-frame transfer lookahead)
  v2: v1 with two alternating host buffers
  v3: put on worker thread, one-frame lookahead

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/link_overlap_probe2.py
"""

import concurrent.futures
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
    cam = transforms.make_se3(
        transforms.rot_x(-np.pi / 2 - .3), np.array([8.0, 0, 2]))
    rng = np.random.default_rng(0)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    base = 2500 + 200 * np.sin(u / 150.0) + 150 * np.cos(v / 120.0)
    depth = (base + rng.standard_normal((H, W))).astype(np.uint16)
    for i in range(C):
        eng.add_depthmap(i, depth, intr, cam, cam)
    pkt = eng._pkt
    enc, bits = native.depth_encode(
        eng._depth_host, cfg.depth_codec_max_exceptions,
        allowed_bits=B_BUCKETS,
        out=dict(words=pkt.tail, row_first=pkt.row_first,
                 exc_idx=pkt.exc_idx, exc_zz=pkt.exc_zz))
    pkt.set_scalars(int(enc["exc_count"]), 10, 0, 9, 0, 0, 0, .5, 10., .5)
    view = pkt.view(bits).copy()
    view2 = view.copy()
    print(f"payload {view.nbytes/1e6:.2f} MB bits={bits}")

    def step(dp):
        eng.state, o = eng.step(eng.state, dp, depth_bits=bits)
        return o

    o = step(jax.device_put(view))
    hard_sync(o.fused_count)
    N = 20

    # v0
    t0 = time.perf_counter()
    for _ in range(N):
        o = step(jax.device_put(view))
    hard_sync(o.fused_count)
    print(f"v0 put;step:            {(time.perf_counter()-t0)/N*1e3:8.2f} ms")

    # v1 one-frame lookahead, same buffer
    nxt = jax.device_put(view)
    t0 = time.perf_counter()
    for _ in range(N):
        dp, nxt = nxt, jax.device_put(view)
        o = step(dp)
    hard_sync(o.fused_count)
    print(f"v1 lookahead:           {(time.perf_counter()-t0)/N*1e3:8.2f} ms")

    # v2 lookahead + alternating host buffers
    bufs = [view, view2]
    nxt = jax.device_put(bufs[0])
    t0 = time.perf_counter()
    for k in range(N):
        dp, nxt = nxt, jax.device_put(bufs[(k + 1) % 2])
        o = step(dp)
    hard_sync(o.fused_count)
    print(f"v2 lookahead+2buf:      {(time.perf_counter()-t0)/N*1e3:8.2f} ms")

    # v3 worker-thread put with lookahead
    ex = concurrent.futures.ThreadPoolExecutor(1)
    fut = ex.submit(jax.device_put, bufs[0])
    t0 = time.perf_counter()
    for k in range(N):
        dp = fut.result()
        fut = ex.submit(jax.device_put, bufs[(k + 1) % 2])
        o = step(dp)
    hard_sync(o.fused_count)
    print(f"v3 thread+lookahead:    {(time.perf_counter()-t0)/N*1e3:8.2f} ms")
    ex.shutdown()

    # v4 two-frame lookahead
    q = [jax.device_put(bufs[0]), jax.device_put(bufs[1])]
    t0 = time.perf_counter()
    for k in range(N):
        dp = q.pop(0)
        q.append(jax.device_put(bufs[k % 2]))
        o = step(dp)
    hard_sync(o.fused_count)
    print(f"v4 2-frame lookahead:   {(time.perf_counter()-t0)/N*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
