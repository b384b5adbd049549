"""Why does the pipelined loop degrade across windows?

Variants: (a) 6 free-running windows (plateau?), (b) throttle by hard-
syncing every K frames, (c) device-step-only rate re-measured after the
long run.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_trace2.py
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

    def run_frame(f):
        d = depths[f % len(depths)]
        for i in range(C):
            eng.add_depthmap(i, d, intr, cams[i], cams[i])
        return eng.process(10.0 + f / 30.0)

    for f in range(6):
        out = run_frame(f)
        if out is not None:
            _ = int(np.asarray(out.fused_count))

    # (a) free running
    for w in range(6):
        t0 = time.time()
        for f in range(40):
            out = run_frame(f)
        _ = int(np.asarray(out.fused_count))
        print(f"free    w{w}: {40 / (time.time() - t0):6.2f} fps")

    # (b) throttled: sync every 4 frames
    for w in range(3):
        t0 = time.time()
        for f in range(40):
            out = run_frame(f)
            if f % 4 == 3:
                _ = int(np.asarray(out.fused_count))
        _ = int(np.asarray(out.fused_count))
        print(f"sync4   w{w}: {40 / (time.time() - t0):6.2f} fps")

    # (c) sync every frame
    for w in range(2):
        t0 = time.time()
        for f in range(30):
            out = run_frame(f)
            _ = int(np.asarray(out.fused_count))
        print(f"sync1   w{w}: {30 / (time.time() - t0):6.2f} fps")

    # (a2) free again after the syncs
    for w in range(2):
        t0 = time.time()
        for f in range(40):
            out = run_frame(f)
        _ = int(np.asarray(out.fused_count))
        print(f"free2   w{w}: {40 / (time.time() - t0):6.2f} fps")


if __name__ == "__main__":
    main()
