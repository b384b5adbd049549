"""Attribute the mapping cycle (~0.55 s in BENCH_r02) to its phases:

    pack     device bitmap pack program (dispatch + sync)
    d2h      np.asarray of the packed bitmap (420 KB)
    unpack   np.unpackbits + reshape
    segment  native fh_segment_grid (per-layer CC + union-find + stats)
    assemble build_objects (native contours/hulls/shapes + dataclasses)
    track    track_objects greedy association

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/mapping_attrib.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
    from ros_gpu_depthmap_fusion_tpu.mapping.pipeline import MappingPipeline
    from ros_gpu_depthmap_fusion_tpu.mapping.objects import build_objects
    from ros_gpu_depthmap_fusion_tpu.mapping.tracking import track_objects

    cfg = FusionConfig(
        num_depth_streams=8,
        crop_min=(-20, -20, 0), crop_max=(20, 20, 2.5),
        voxel_min=(-20, -20, 0), voxel_max=(20, 20, 2.5),
        voxel_size=(0.1, 0.1, 0.12), voxel_occupancy_lifetime=10)
    grid = VoxelGrid.from_config(cfg)
    z, y, x = grid.shape_zyx
    print(f"platform={jax.devices()[0].platform} grid={x}x{y}x{z} "
          f"({grid.num_cells} cells)")

    # a scene-like occupancy: some blobs + scattered noise, ~2% fill
    rng = np.random.default_rng(0)
    occ = np.zeros((z, y, x), np.uint8)
    for _ in range(12):
        cx, cy = rng.integers(30, x - 30), rng.integers(30, y - 30)
        r = rng.integers(4, 14)
        zz0, zz1 = rng.integers(0, z // 2), rng.integers(z // 2, z)
        yy, xx = np.ogrid[:y, :x]
        blob = (xx - cx) ** 2 + (yy - cy) ** 2 <= r * r
        occ[zz0:zz1, blob] = 1
    occ[rng.random((z, y, x)) < 0.002] = 1
    print(f"occupied: {int(occ.sum())} cells ({occ.mean() * 100:.1f}%)")

    pipe = MappingPipeline(cfg, grid)
    occ_flat = jnp.asarray(occ.reshape(-1).astype(np.uint8))

    def t(name, fn, iters=5):
        fn()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:34s} {dt * 1e3:8.1f} ms")
        return out

    packed = t("pack+sync (device)",
               lambda: np.asarray(pipe._pack_bits(occ_flat)))
    occ_host = t("unpack (host)",
                 lambda: np.unpackbits(packed, bitorder="little",
                                       count=grid.num_cells).reshape(z, y, x))
    t("fetch_occupancy (pack+d2h+unpack)",
      lambda: pipe.fetch_occupancy(occ_flat))
    res = t("segment (native CC+merge+stats)",
            lambda: pipe._segment_host(occ_host))
    objs = t("assemble (contours+hulls+shapes)",
             lambda: build_objects(
                 labels=res["labels"], num_labels=res["num_labels"],
                 merged_of_label=res["merged_of_label"],
                 num_merged=int(res["num_merged"]),
                 voxel_count=res["voxel_count"], centroid=res["centroid"],
                 vmin=res["vmin"], vmax=res["vmax"], grid=grid,
                 with_contours=True))
    t("assemble (no contours)",
      lambda: build_objects(
          labels=res["labels"], num_labels=res["num_labels"],
          merged_of_label=res["merged_of_label"],
          num_merged=int(res["num_merged"]),
          voxel_count=res["voxel_count"], centroid=res["centroid"],
          vmin=res["vmin"], vmax=res["vmax"], grid=grid,
          with_contours=False))
    tracks = []
    t("track", lambda: track_objects(objs, tracks, cfg.object_min_area,
                                     1 / 30.0, max_tracks=cfg.max_tracks))
    t("FULL pipeline.process",
      lambda: pipe.process(occ_flat))
    print(f"objects={len(objs)} backend={pipe.backend}")


if __name__ == "__main__":
    main()
