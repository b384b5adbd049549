"""r5: device-step budget at the CURRENT operating point (p4 codec,
sparse occupancy, 512k partials) — all variants A/B in ONE process.

Measures, hard-synced via chained steps (one sync per rep block):
  - full p4 step vs full I-keyframe step (decode delta)
  - occupancy_sparse on vs off (cost of the 105k-word compact)
  - emit_occupancy_u8 on vs off
  - partials capacity 512k vs 448k
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
    from ros_gpu_depthmap_fusion_tpu.core import transforms
    from ros_gpu_depthmap_fusion_tpu.pipeline import FusionEngine

    print(f"backend={jax.default_backend()}", flush=True)
    H, W, C = 480, 848, 8

    def make_cfg(**kw):
        base = dict(
            num_depth_streams=C, depth_height=H, depth_width=W,
            num_point_sequences=2,
            crop_min=(-20, -20, 0), crop_max=(20, 20, 2.5),
            voxel_min=(-20, -20, 0), voxel_max=(20, 20, 2.5),
            voxel_size=(0.1, 0.1, 0.12), voxel_occupancy_lifetime=10,
            rollbuffer_point_capacity=98304,
            max_points_per_sequence=2 * 8192,
            depth_link_codec="dpcm_temporal", depth_codec_p4_budget=48,
            depth_codec_hysteresis=2, depth_codec_keyframe_interval=60,
            depth_codec_quant_shift=4, depth_codec_max_exceptions=8192,
            lidar_link_quant_step=0.002,
            voxelize_partials_capacity=512 * 1024,
            voxelize_output_capacity=32768,
            emit_raw_points=False, emit_occupancy_u8=False,
            occupancy_sparse_capacity=16384)
        base.update(kw)
        return FusionConfig(**base)

    rng = np.random.default_rng(0)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    base = 2500 + 200 * np.sin(u / 150.0) + 150 * np.cos(v / 120.0)
    pattern = [rng.normal(0.0, 6.0, (H, W)) for _ in range(C)]
    holes_fix = [rng.random((H, W)) < 0.01 for _ in range(C)]
    churn = [[rng.random((H, W)) < 0.001 for _ in range(C)]
             for _ in range(8)]
    depths = []
    for k in range(8):
        ang = 2 * np.pi * k / 8
        cx = W * 0.5 + 6.0 * np.cos(ang)
        cy = H * 0.5 + 6.0 * np.sin(ang)
        blob = 400 * np.exp(-(((u - cx) / 25.0) ** 2
                             + ((v - cy) / 20.0) ** 2))
        depths.append([
            np.where(holes_fix[i] | churn[k][i], 0,
                     (base - blob + pattern[i]
                      + rng.standard_normal((H, W)))).astype(np.uint16)
            for i in range(C)])
    cams_tf = []
    for i in range(C):
        ang = i * 2 * np.pi / C
        pos = np.array([8 * np.cos(ang), 8 * np.sin(ang), 2.0])
        cams_tf.append(transforms.make_se3(
            transforms.rot_z(ang + np.pi)
            @ transforms.rot_x(-np.pi / 2 - 0.3), pos))
    t_l = np.linspace(0, np.pi, 8192)
    arcs = [np.stack([6 * np.cos(t_l), 6 * np.sin(t_l),
                      1 + 0.3 * np.sin(5 * t_l)], -1).astype(np.float32),
            np.stack([12 * np.cos(-t_l * 0.7), 12 * np.sin(-t_l * 0.7),
                      1.5 + 0 * t_l], -1).astype(np.float32)]
    intr = PinholeIntrinsics.default_for(W, H)

    def bench_cfg(tag, cfg, reps=12):
        eng = FusionEngine(cfg)  # synchronous engine, no pipelining
        out = None
        for f in range(10):
            d = depths[f % 8]
            for i in range(C):
                eng.add_depthmap(i, d[i], intr, cams_tf[i], cams_tf[i])
            for arc in arcs:
                eng.add_point_sequence(arc, sec=10, nsec=f * 33000000,
                                       tf_move=np.eye(4, dtype=np.float32))
            out = eng.process(10.0 + f / 30.0)
        _ = int(np.asarray(out.fused_count))
        # one packet per kind: p4 (typical) and forced I
        scalars = (10, 0, 9, 900000000, 0, 0, eng.fp_threshold,
                   eng.fp_max_distance, eng.ps_threshold)
        view_p, bits_p = eng._encode(eng._pkt, eng._depth_host, scalars)
        dev_p = jax.device_put(np.array(view_p))
        eng._frames_since_key = 10 ** 9
        eng.clear()
        d = depths[0]
        for i in range(C):
            eng.add_depthmap(i, d[i], intr, cams_tf[i], cams_tf[i])
        view_i, bits_i = eng._encode(eng._pkt, eng._depth_host, scalars)
        dev_i = jax.device_put(np.array(view_i))
        for name, dv, bt in (("p4", dev_p, bits_p), ("I", dev_i, bits_i)):
            if name == "p4" and bits_p == "p4":
                pass
            st = eng.state
            st, o = eng.step(st, dv, depth_bits=bt)
            _ = int(np.asarray(o.fused_count))
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(reps):
                    st, o = eng.step(st, dv, depth_bits=bt)
                _ = int(np.asarray(o.fused_count))
                best = min(best,
                           (time.perf_counter() - t0) / reps * 1e3)
            eng.state = st
            print(f"{tag:28s} [{name}-frame step]: {best:6.2f} ms",
                  flush=True)

    bench_cfg("baseline (bench cfg)", make_cfg())
    bench_cfg("no sparse occupancy", make_cfg(occupancy_sparse_capacity=0))
    bench_cfg("emit_occupancy_u8 on", make_cfg(emit_occupancy_u8=True))
    bench_cfg("partials 448k", make_cfg(
        voxelize_partials_capacity=448 * 1024))
    bench_cfg("outcap 16k", make_cfg(voxelize_output_capacity=16384))


if __name__ == "__main__":
    main()
