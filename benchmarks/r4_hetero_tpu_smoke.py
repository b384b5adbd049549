"""Heterogeneous engine smoke on REAL TPU: the per-group split path
(decode + unproject + fp + crop + per-group Pallas L1 joined at the
partials sort) compiles and runs at mixed D435+D455-class shapes, and
agrees with the packed (sort-based) mode on the same inputs."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
    from ros_gpu_depthmap_fusion_tpu.pipeline.engine import FusionEngine

    print(f"platform={jax.devices()[0].platform}", flush=True)
    shapes = ((480, 848), (480, 848), (240, 424))   # 2x D455-ish + D435-ish
    base_kw = dict(
        num_depth_streams=3,
        stream_shapes=shapes,
        depth_scales=(0.001, 0.001, 0.0005),
        depth_height=480, depth_width=848,
        crop_min=(-20, -20, 0), crop_max=(20, 20, 2.5),
        voxel_min=(-20, -20, 0), voxel_max=(20, 20, 2.5),
        voxel_size=(0.1, 0.1, 0.12), voxel_occupancy_lifetime=10,
        depth_codec_quant_shift=3, voxelize_output_capacity=65536)
    rng = np.random.default_rng(0)
    tfs = [np.eye(4, dtype=np.float32) for _ in range(3)]
    tfs[1][:3, 3] = [1.0, 0.5, 0.2]
    tfs[2][:3, 3] = [-1.0, -0.5, 0.4]
    depths = []
    for h, w in shapes:
        u, v = np.meshgrid(np.arange(w), np.arange(h))
        d = (2500 + 200 * np.sin(u / 100.0) + 150 * np.cos(v / 80.0)
             + rng.standard_normal((h, w))).astype(np.uint16)
        d[rng.random((h, w)) < 0.01] = 0
        depths.append(d)

    outs = {}
    for mode in ("rle", "packed"):
        eng = FusionEngine(FusionConfig(voxel_mean_mode=mode, **base_kw))
        t0 = time.time()
        for f in range(4):
            for i, (h, w) in enumerate(shapes):
                eng.add_depthmap(i, depths[i],
                                 PinholeIntrinsics.default_for(w, h),
                                 tfs[i], tfs[i])
            out = eng.process(10.0 + f / 30.0)
        n = int(np.asarray(out.fused_count))
        occ = int((np.asarray(out.occupancy_u8) > 0).sum())
        print(f"mode={mode}: fused={n} occupied={occ} "
              f"bits={eng.last_frame_bits} "
              f"({time.time() - t0:.1f}s incl. compile)", flush=True)
        pts = np.asarray(out.fused_points)[:n]
        outs[mode] = (n, occ, set(map(tuple, np.round(pts, 5).tolist())))
    assert outs["rle"][0] == outs["packed"][0], (outs["rle"][0],
                                                 outs["packed"][0])
    assert outs["rle"][1] == outs["packed"][1]
    assert outs["rle"][2] == outs["packed"][2]
    print("HETERO TPU SMOKE OK (rle == packed)", flush=True)


if __name__ == "__main__":
    main()
