"""Probe: is the cross-window fps collapse caused by unbounded device
queue depth (our process) or by tunnel phase drift (external)?

Alternates A/B windows over one engine instance so tunnel drift affects
both arms equally:
  A = unpaced dispatch, drain only at window end (bench.py behavior)
  B = bounded queue: after dispatching frame k, hard-drain frame k-LAG
      via a lagged output deque (the drained output is LAG frames old, so
      its step has long finished — the sync costs one tunnel round trip,
      amortized by draining every DRAIN_EVERY frames)

If B stays flat while A collapses, the collapse is self-inflicted queue
depth; if both drift together, it is the tunnel.
"""
import collections
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
from ros_gpu_depthmap_fusion_tpu.core import transforms


def log(m):
    print(f"[probe] {m}", flush=True)


def main():
    import jax
    from ros_gpu_depthmap_fusion_tpu.pipeline import FusionEngine

    H, W, C = 480, 848, 8
    N_LIDAR_STREAMS, LIDAR_PTS = 2, 8192
    cfg = FusionConfig(
        num_depth_streams=C, depth_height=H, depth_width=W,
        num_point_sequences=N_LIDAR_STREAMS,
        crop_min=(-20, -20, 0), crop_max=(20, 20, 2.5),
        voxel_min=(-20, -20, 0), voxel_max=(20, 20, 2.5),
        voxel_size=(0.1, 0.1, 0.12),
        voxel_occupancy_lifetime=10,
        rollbuffer_point_capacity=98304,
        max_points_per_sequence=N_LIDAR_STREAMS * LIDAR_PTS,
        depth_codec_quant_shift=3,
        depth_codec_max_exceptions=12288,
        lidar_link_quant_step=0.002,
        voxelize_partials_capacity=512 * 1024,
        emit_raw_points=False,
    )
    eng = FusionEngine(cfg, pipeline_depth=1)
    intr = PinholeIntrinsics.default_for(W, H)
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

    def cams_at(f):
        yaw0 = 0.02 * np.sin(2 * np.pi * f / 60.0)
        out = []
        for i in range(C):
            ang = i * 2 * np.pi / C + yaw0
            pos = np.array([8 * np.cos(ang), 8 * np.sin(ang), 2.0])
            out.append(transforms.make_se3(
                transforms.rot_z(ang + np.pi)
                @ transforms.rot_x(-np.pi / 2 - 0.3), pos))
        return out

    t_l = np.linspace(0, np.pi, LIDAR_PTS)
    arcs = []
    for k in range(N_STAGED):
        rot = 2 * np.pi * k / N_STAGED
        arcs.append([
            np.stack([6 * np.cos(t_l + rot), 6 * np.sin(t_l + rot),
                      1 + 0.3 * np.sin(5 * t_l)], axis=-1).astype(np.float32),
            np.stack([12 * np.cos(-t_l * 0.7 + rot),
                      12 * np.sin(-t_l * 0.7 + rot),
                      1.5 + 0 * t_l], axis=-1).astype(np.float32),
        ])

    fc = [0]
    proc_ms = []

    def run_frame():
        f = fc[0]
        fc[0] += 1
        d = depths[f % N_STAGED]
        cams = cams_at(f)
        for i in range(C):
            eng.add_depthmap(i, d, intr, cams[i], cams[i])
        for arc in arcs[f % N_STAGED]:
            eng.add_point_sequence(arc, sec=10 + (f // 30),
                                   nsec=int((f % 30) * 33e6),
                                   tf_move=np.eye(4, dtype=np.float32))
        t = time.perf_counter()
        out = eng.process(10.0 + f / 30.0)
        proc_ms.append((time.perf_counter() - t) * 1e3)
        return out

    t0 = time.time()
    for _ in range(N_STAGED + 4):
        out = run_frame()
        if out is not None:
            _ = int(np.asarray(out.fused_count))
    log(f"warmup {time.time() - t0:.1f}s")

    # does the async d2h API exist on this backend?
    has_async = hasattr(out.fused_count, "copy_to_host_async")
    log(f"copy_to_host_async available: {has_async}")

    ITERS, LAG, DRAIN_EVERY = 45, 6, 4

    def window_A():
        del proc_ms[:]
        t0 = time.time()
        for _ in range(ITERS):
            out = run_frame()
        _ = int(np.asarray(out.fused_count))
        dt = time.time() - t0
        return ITERS / dt, float(np.median(proc_ms))

    def window_B():
        del proc_ms[:]
        lagq = collections.deque()
        t0 = time.time()
        for i in range(ITERS):
            out = run_frame()
            lagq.append(out.fused_count)
            if has_async:
                out.fused_count.copy_to_host_async()
            if len(lagq) > LAG and i % DRAIN_EVERY == 0:
                while len(lagq) > LAG:
                    _ = int(np.asarray(lagq.popleft()))
        while lagq:
            _ = int(np.asarray(lagq.popleft()))
        dt = time.time() - t0
        return ITERS / dt, float(np.median(proc_ms))

    for rep in range(6):
        fps_a, pm_a = window_A()
        log(f"rep {rep} A(unpaced):   {fps_a:6.2f} fps | process() median "
            f"{pm_a:5.1f} ms")
        fps_b, pm_b = window_B()
        log(f"rep {rep} B(lag-drain): {fps_b:6.2f} fps | process() median "
            f"{pm_b:5.1f} ms")
    log("done")


if __name__ == "__main__":
    main()
