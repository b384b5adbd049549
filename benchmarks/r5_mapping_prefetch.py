"""r5: does prefetching the occupancy bitmap at enqueue collapse the
mapping cycle's d2h phase (r4 driver: 105 ms of a 145 ms cycle)?

A/B IN ONE PROCESS (tunnel phases drift): the same paced mapping-on loop
runs twice — once submitting cold device arrays (worker pays the fetch),
once with copy_to_host_async prefetch at enqueue — and reports
cycles/s + the worker's measured phase budget for each.
"""
import os
import sys
import time
from collections import deque

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
    from ros_gpu_depthmap_fusion_tpu.core import transforms
    from ros_gpu_depthmap_fusion_tpu.pipeline import FusionEngine
    from ros_gpu_depthmap_fusion_tpu.mapping.pipeline import (
        AsyncMappingWorker, MappingPipeline)

    print(f"backend={jax.default_backend()}", flush=True)
    H, W, C = 480, 848, 8
    cfg = FusionConfig(
        num_depth_streams=C, depth_height=H, depth_width=W,
        num_point_sequences=2,
        crop_min=(-20, -20, 0), crop_max=(20, 20, 2.5),
        voxel_min=(-20, -20, 0), voxel_max=(20, 20, 2.5),
        voxel_size=(0.1, 0.1, 0.12), voxel_occupancy_lifetime=10,
        rollbuffer_point_capacity=98304,
        max_points_per_sequence=2 * 8192,
        depth_codec_quant_shift=3, depth_codec_max_exceptions=12288,
        lidar_link_quant_step=0.002,
        voxelize_partials_capacity=512 * 1024,
        voxelize_output_capacity=65536,
        emit_raw_points=False,
        occupancy_sparse_capacity=16384)
    eng = FusionEngine(cfg, pipeline_depth=1)
    intr = PinholeIntrinsics.default_for(W, H)
    rng = np.random.default_rng(0)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    depths = []
    for k in range(4):
        ph = 2 * np.pi * k / 4
        base = (2500 + 200 * np.sin(u / 150.0 + ph)
                + 150 * np.cos(v / 120.0 - 0.7 * ph))
        cx = W * (0.3 + 0.4 * k / 4)
        blob = 900 * np.exp(-(((u - cx) / 90.0) ** 2
                             + ((v - H * 0.5) / 70.0) ** 2))
        d = (base - blob + rng.standard_normal((H, W))).astype(np.uint16)
        d[rng.random((H, W)) < 0.01] = 0
        depths.append(d)
    cams = []
    for i in range(C):
        ang = i * 2 * np.pi / C
        pos = np.array([8 * np.cos(ang), 8 * np.sin(ang), 2.0])
        cams.append(transforms.make_se3(
            transforms.rot_z(ang + np.pi)
            @ transforms.rot_x(-np.pi / 2 - 0.3), pos))
    t_l = np.linspace(0, np.pi, 8192)
    arcs = [np.stack([6 * np.cos(t_l), 6 * np.sin(t_l),
                      1 + 0.3 * np.sin(5 * t_l)], -1).astype(np.float32),
            np.stack([12 * np.cos(-t_l * 0.7), 12 * np.sin(-t_l * 0.7),
                      1.5 + 0 * t_l], -1).astype(np.float32)]
    clock = [0]

    def run_frame():
        f = clock[0]
        clock[0] += 1
        d = depths[f % 4]
        for i in range(C):
            eng.add_depthmap(i, d, intr, cams[i], cams[i])
        for arc in arcs:
            eng.add_point_sequence(arc, sec=10 + f // 30,
                                   nsec=int((f % 30) * 33e6),
                                   tf_move=np.eye(4, dtype=np.float32))
        return eng.process(10.0 + f / 30.0)

    t0 = time.time()
    for _ in range(8):
        out = run_frame()
        if out is not None:
            _ = int(np.asarray(out.fused_count))
    print(f"warm {time.time() - t0:.1f}s", flush=True)

    mapping = MappingPipeline(cfg.replace(mapping_detail_min_area=-1.0),
                              eng.grid)
    out = run_frame()
    res = mapping.process_packed(out.occupancy_bits)
    print(f"mapping warm ({len(res.objects)} objects) "
          f"phase_ms={tuple(round(p, 1) for p in mapping.last_phase_ms)} "
          f"sparse_true={int(np.asarray(out.occupancy_sparse_true))} "
          f"cap=16384", flush=True)

    def sparse_of(o):
        return (o.occupancy_sparse_idx, o.occupancy_sparse_words,
                o.occupancy_sparse_count, o.occupancy_sparse_true,
                o.occupancy_bits)
    res = mapping.process_sparse(sparse_of(out))
    print(f"sparse warm ({len(res.objects)} objects) "
          f"phase_ms={tuple(round(p, 1) for p in mapping.last_phase_ms)}",
          flush=True)

    def paced_loop(mode: str, iters=120):
        worker = AsyncMappingWorker(mapping, packed=True)
        lagq = deque()
        phases = []
        orig_p = mapping.process_packed
        orig_s = mapping.process_sparse

        def wrap(fn):
            def wrapped(occ, dt=None, with_contours=True):
                r = fn(occ, dt=dt, with_contours=with_contours)
                phases.append(mapping.last_phase_ms)
                return r
            return wrapped
        mapping.process_packed = wrap(orig_p)
        mapping.process_sparse = wrap(orig_s)
        t0 = time.time()
        for f in range(1, iters + 1):
            out = run_frame()
            if hasattr(out.fused_count, "copy_to_host_async"):
                out.fused_count.copy_to_host_async()
                if mode == "dense":
                    out.occupancy_bits.copy_to_host_async()
                elif mode == "sparse":
                    for a in sparse_of(out)[:4]:
                        a.copy_to_host_async()
            lagq.append(out)
            if len(lagq) > 4:
                dr = lagq.popleft()
                _ = int(np.asarray(dr.fused_count))
                if mode == "dense":
                    worker.submit(dr.occupancy_bits)
                elif mode == "sparse":
                    worker.submit(sparse_of(dr))
                else:
                    # bypass the worker-side prefetch too (cold leg)
                    try:
                        worker._q.put_nowait(dr.occupancy_bits)
                    except Exception:
                        pass
            lag = t0 + f / 30.0 - time.time()
            if lag > 0:
                time.sleep(lag)
        _ = int(np.asarray(out.fused_count))
        dt = time.time() - t0
        cyc = worker.cycles
        worker.close()
        mapping.process_packed = orig_p
        mapping.process_sparse = orig_s
        ph = (np.asarray(phases[-min(len(phases), 10):]).mean(axis=0)
              if phases else np.full(3, float("nan")))
        return iters / dt, cyc / dt, ph

    for name in ("dense", "sparse", "dense2", "sparse2"):
        fps, cps, ph = paced_loop(name.rstrip("2"))
        print(f"{name:10s}: {fps:5.2f} fused fps, {cps:5.2f} cycles/s, "
              f"phase_ms(d2h/seg/rest)="
              f"({ph[0]:.1f}, {ph[1]:.1f}, {ph[2]:.1f})", flush=True)


if __name__ == "__main__":
    main()
