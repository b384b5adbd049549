"""Trace the bench loop per frame: host-blocking time of each phase.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_trace.py
"""

import time

import numpy as np


def main():
    import jax
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
    from ros_gpu_depthmap_fusion_tpu.core import transforms
    from ros_gpu_depthmap_fusion_tpu.pipeline import FusionEngine

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
    eng = FusionEngine(cfg, pipeline_depth=1)
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
    for k in range(4):
        d = (base + 30 * np.sin(u / 37.0 + k)
             + rng.standard_normal((H, W))).astype(np.uint16)
        d[rng.random((H, W)) < 0.01] = 0
        depths.append(d)
    t_l = np.linspace(0, np.pi, 2048)
    arc = np.stack([6 * np.cos(t_l), 6 * np.sin(t_l), 1 + 0 * t_l], axis=-1)

    def run_frame(f, rec=None):
        t0 = time.perf_counter()
        d = depths[f % len(depths)]
        for i in range(C):
            eng.add_depthmap(i, d, intr, cams[i], cams[i])
        eng.add_point_sequence(arc, sec=10, nsec=int((f % 30) * 33e6),
                               tf_move=np.eye(4, dtype=np.float32))
        t1 = time.perf_counter()
        out = eng.process(10.0 + f / 30.0)
        t2 = time.perf_counter()
        if rec is not None:
            rec.append((t1 - t0, t2 - t1))
        return out

    for f in range(6):
        out = run_frame(f)
        if out is not None:
            _ = int(np.asarray(out.fused_count))

    # 3 windows of 60 frames, per-frame host phases
    for w in range(3):
        rec = []
        t0 = time.time()
        for f in range(60):
            out = run_frame(f, rec)
        _ = int(np.asarray(out.fused_count))
        dt = time.time() - t0
        stage = np.array([r[0] for r in rec]) * 1e3
        proc = np.array([r[1] for r in rec]) * 1e3
        print(f"window {w}: {60 / dt:6.2f} fps | stage "
              f"med {np.median(stage):5.2f} p90 {np.percentile(stage, 90):5.2f} "
              f"| process med {np.median(proc):5.2f} "
              f"p90 {np.percentile(proc, 90):6.2f} max {proc.max():6.2f} ms")


if __name__ == "__main__":
    main()
