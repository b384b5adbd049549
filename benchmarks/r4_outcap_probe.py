"""Same-process A/B of voxelize_output_capacity on the full fused step
(the scatter-max + compaction scale with the cap, not the live count)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from ros_gpu_depthmap_fusion_tpu.utils.profiling import hard_sync
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
    from ros_gpu_depthmap_fusion_tpu.core import transforms
    from ros_gpu_depthmap_fusion_tpu.pipeline.engine import FusionEngine

    H, W, C = 480, 848, 8
    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    base = 2500 + 200 * np.sin(u / 150.0) + 150 * np.cos(v / 120.0)
    d0 = (base + rng.standard_normal((H, W))).astype(np.uint16)
    d0[rng.random((H, W)) < 0.01] = 0
    cams = []
    for i in range(C):
        ang = i * 2 * np.pi / C
        pos = np.array([8 * np.cos(ang), 8 * np.sin(ang), 2.0])
        cams.append(transforms.make_se3(
            transforms.rot_z(ang + np.pi) @ transforms.rot_x(-np.pi / 2 - .3),
            pos).astype(np.float32))
    intr = PinholeIntrinsics.default_for(W, H)

    engines = {}
    for cap in (262144, 163840, 65536, 32768):
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
            voxelize_partials_capacity=512 * 1024,
            voxelize_output_capacity=cap, emit_raw_points=False)
        engines[cap] = FusionEngine(cfg, pipeline_depth=0)

    t_l = np.linspace(0, np.pi, 8192)
    arc = np.stack([6 * np.cos(t_l), 6 * np.sin(t_l),
                    1 + 0.3 * np.sin(5 * t_l)], -1).astype(np.float32)

    def step_ms(eng, iters=12):
        for f in range(3):   # warm + fill rollbuffer
            for i in range(C):
                eng.add_depthmap(i, d0, intr, cams[i], cams[i])
            for _ in range(2):
                eng.add_point_sequence(arc, sec=10, nsec=int(f * 33e6),
                                       tf_move=np.eye(4, dtype=np.float32))
            out = eng.process(10.0 + f / 30.0)
        hard_sync(out.fused_count)
        import jax as _j
        pktv = np.array(eng._pkt.view(eng._last_bits))
        for i in range(C):
            eng.add_depthmap(i, d0, intr, cams[i], cams[i])
        inp = _j.device_put(pktv)
        st = eng.state
        t0 = time.perf_counter()
        for _ in range(iters):
            st, out = eng.step(st, inp, depth_bits=eng._last_bits)
        hard_sync(out.fused_count)
        eng.state = st   # the step donates; leave the engine reusable
        return (time.perf_counter() - t0) / iters * 1e3

    for rep in range(3):
        for cap, eng in engines.items():
            print(f"rep{rep} cap={cap:7d}: {step_ms(eng):7.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
