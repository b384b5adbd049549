"""r5: the realistic-statistics bench scene produced 624 mapping objects
(vs ~20 on the old scene) and a ~103 ms assembly phase. Where do the
specks come from (size histogram), and what does detail-drop do to the
cycle?"""
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
    from ros_gpu_depthmap_fusion_tpu.mapping.pipeline import MappingPipeline

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
        depth_link_codec="dpcm_temporal", depth_codec_p4_budget=48,
        depth_codec_hysteresis=2, depth_codec_keyframe_interval=60,
        depth_codec_quant_shift=4, depth_codec_max_exceptions=12288,
        lidar_link_quant_step=0.002,
        voxelize_partials_capacity=768 * 1024,
        voxelize_output_capacity=65536,
        emit_raw_points=False, emit_occupancy_u8=False,
        occupancy_sparse_capacity=16384)
    eng = FusionEngine(cfg, pipeline_depth=1)
    intr = PinholeIntrinsics.default_for(W, H)
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
        cams = []
        for i in range(C):
            d = (base - blob + pattern[i]
                 + rng.standard_normal((H, W))).astype(np.uint16)
            d[holes_fix[i] | churn[k][i]] = 0
            cams.append(d)
        depths.append(cams)
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
    out = None
    for f in range(14):
        d = depths[f % 8]
        for i in range(C):
            eng.add_depthmap(i, d[i], intr, cams_tf[i], cams_tf[i])
        for arc in arcs:
            eng.add_point_sequence(arc, sec=10 + f // 30,
                                   nsec=int((f % 30) * 33e6),
                                   tf_move=np.eye(4, dtype=np.float32))
        o = eng.process(10.0 + f / 30.0)
        if o is not None:
            out = o
            _ = int(np.asarray(out.fused_count))
    print("warm done", flush=True)

    mp = MappingPipeline(cfg.replace(mapping_detail_min_area=-1.0),
                         eng.grid)
    packed = np.asarray(out.occupancy_bits)
    occ = np.unpackbits(packed, bitorder="little",
                        count=eng.grid.num_cells).reshape(
        *eng.grid.shape_zyx)
    res = mp._segment_host(occ)
    vc = np.asarray(res["voxel_count"])[: res["num_merged"]]
    print(f"components={res['num_merged']} occupied={occ.sum()}")
    hist, edges = np.histogram(vc, bins=[1, 2, 3, 5, 9, 17, 33, 10**9])
    print("voxel-count histogram", dict(zip(
        ["1", "2", "3-4", "5-8", "9-16", "17-32", "33+"], hist.tolist())))
    # where are the single-voxel specks? check z distribution
    # time the full cycle both ways
    for tag, c2 in (("detail-pruned", cfg.replace(
            mapping_detail_min_area=-1.0)),):
        mp2 = MappingPipeline(c2, eng.grid)
        sp = (out.occupancy_sparse_idx, out.occupancy_sparse_words,
              out.occupancy_sparse_count, out.occupancy_sparse_true,
              out.occupancy_bits)
        r = mp2.process_sparse(sp)
        t0 = time.perf_counter()
        for _ in range(5):
            r = mp2.process_sparse(sp)
        dt = (time.perf_counter() - t0) / 5 * 1e3
        print(f"{tag}: {dt:.1f} ms/cycle, {len(r.objects)} objects, "
              f"phase={tuple(round(p, 1) for p in mp2.last_phase_ms)}")


if __name__ == "__main__":
    main()
