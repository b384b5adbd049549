"""Native host-runtime tests: the C++ library vs numpy fallbacks/oracles."""

import numpy as np
import pytest

from ros_gpu_depthmap_fusion_tpu.utils import native


requires_native = pytest.mark.skipif(not native.available(),
                                     reason="native library not built")


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    d = rng.integers(0, 65536, size=2048, dtype=np.uint16)
    pairs = native.pack_depth_pairs(d)
    np.testing.assert_array_equal(native.unpack_depth_pairs(pairs), d)
    # parity with the device op
    import jax.numpy as jnp
    from ros_gpu_depthmap_fusion_tpu.ops import pack as dpack
    np.testing.assert_array_equal(
        pairs, np.asarray(dpack.pack_depth_pairs(jnp.asarray(d))))


def test_radix_sort_stable():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 2 ** 32, size=20000, dtype=np.uint32)
    sk, si = native.radix_sort_u32(keys)
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(sk, keys[order])
    np.testing.assert_array_equal(si, order.astype(np.uint32))
    # stability on heavy duplicates
    keys2 = rng.integers(0, 8, size=5000, dtype=np.uint32)
    sk2, si2 = native.radix_sort_u32(keys2)
    order2 = np.argsort(keys2, kind="stable")
    np.testing.assert_array_equal(si2, order2.astype(np.uint32))


def test_group_sorted():
    keys = np.array([3, 3, 5, 5, 5, 9], np.uint32)
    starts, sizes, values, n = native.group_sorted_u32(keys)
    assert n == 3
    np.testing.assert_array_equal(starts[:3], [0, 2, 5])
    np.testing.assert_array_equal(sizes[:3], [2, 3, 1])
    np.testing.assert_array_equal(values[:3], [3, 5, 9])


@requires_native
def test_cc_label_matches_bfs():
    from ros_gpu_depthmap_fusion_tpu.mapping.geometry import _label8
    rng = np.random.default_rng(2)
    img = (rng.random((40, 50)) < 0.35)
    labels, num, stats, cents = native.cc_label(img)
    oracle = _label8(img)
    assert num == oracle.max() + 1
    # same partition + raster numbering
    mapping = {}
    for y in range(40):
        for x in range(50):
            a, b = oracle[y, x], labels[y, x]
            assert (a == 0) == (b == 0)
            if a:
                assert mapping.setdefault(a, b) == b
    assert sorted(mapping.values()) == list(range(1, len(mapping) + 1))
    # stats sanity: areas sum to foreground count
    assert stats[1:, 4].sum() == img.sum()


@requires_native
def test_cc_stats_and_centroids():
    img = np.zeros((10, 12), np.uint8)
    img[2:5, 3:7] = 1
    labels, num, stats, cents = native.cc_label(img)
    assert num == 2
    np.testing.assert_array_equal(stats[1], [3, 2, 4, 3, 12])
    np.testing.assert_allclose(cents[1], [4.5, 3.0])


@requires_native
def test_trace_contour_matches_python():
    from ros_gpu_depthmap_fusion_tpu.mapping.geometry import _trace_from
    rng = np.random.default_rng(3)
    img = np.zeros((20, 24), bool)
    img[4:12, 5:15] = True
    img[6:8, 8:11] = False  # a hole (external contour unaffected)
    sy, sx = 4, 5
    c_native = native.trace_contour(img, sy, sx)
    c_py = _trace_from(img, sy, sx)
    np.testing.assert_array_equal(c_native, c_py)
    # 1-pixel-wide ring (Jacob's criterion stress)
    ring = np.zeros((15, 15), bool)
    yy, xx = np.mgrid[0:15, 0:15]
    r = np.hypot(yy - 7, xx - 7)
    ring[(r > 4.5) & (r < 5.5)] = True
    ys, xs = np.nonzero(ring)
    c1 = native.trace_contour(ring, ys[0], xs[0])
    c2 = _trace_from(ring, int(ys[0]), int(xs[0]))
    np.testing.assert_array_equal(c1, c2)


def test_stage_points():
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    out = np.zeros((64, 4), np.float32)
    n = native.stage_points_xyz(pts, out)
    assert n == 64
    np.testing.assert_allclose(out[:, :3], pts[:64])
    np.testing.assert_allclose(out[:, 3], 1.0)


def test_native_is_available_in_ci():
    # the library builds in this image; make sure the fast path is active
    assert native.available()


@requires_native
def test_assemble_objects_matches_python_path():
    """The native fh_assemble_objects fast path must reproduce the Python
    assembly (mapping/objects.py) exactly: same grouping, contours, and
    hull-determined shapes (rects/circles up to fp tolerance)."""
    import functools
    import jax
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
    from ros_gpu_depthmap_fusion_tpu.mapping import objects as O
    from ros_gpu_depthmap_fusion_tpu.mapping.segmentation import segment

    rng = np.random.default_rng(7)
    Z, Y, X = 6, 60, 64
    occ = np.zeros((Z, Y, X), bool)
    for _ in range(8):
        x0, y0 = rng.integers(0, X - 14), rng.integers(0, Y - 14)
        w, h = rng.integers(2, 12, 2)
        z0 = rng.integers(0, Z - 2)
        occ[z0:z0 + int(rng.integers(1, 3)), y0:y0 + h, x0:x0 + w] = True
    yy, xx = np.mgrid[-6:7, -6:7]
    occ[2:4, 20:33, 30:43] |= (yy ** 2 / 30 + xx ** 2 / 12) < 1

    seg = jax.jit(functools.partial(segment, max_labels=64,
                                    max_objects=32))(occ.astype(np.uint8))
    cfg = FusionConfig(voxel_min=(-3, -3, 0), voxel_max=(3.4, 3, 1.2),
                       voxel_size=(0.1, 0.1, 0.2))
    grid = VoxelGrid.from_config(cfg)
    args = dict(labels=np.asarray(seg.labels),
                num_labels=np.asarray(seg.num_labels),
                merged_of_label=np.asarray(seg.merged_of_label),
                num_merged=int(seg.num_merged),
                voxel_count=np.asarray(seg.voxel_count),
                centroid=np.asarray(seg.centroid),
                vmin=np.asarray(seg.vmin), vmax=np.asarray(seg.vmax),
                grid=grid)

    native_objs = O.build_objects(**args)
    orig = native.assemble_objects
    native.assemble_objects = lambda *a, **k: None  # force Python path
    try:
        py_objs = O.build_objects(**args)
    finally:
        native.assemble_objects = orig

    assert len(native_objs) == len(py_objs) == int(seg.num_merged)
    for oa, ob in zip(py_objs, native_objs):
        assert oa.num_components == ob.num_components
        assert oa.num_layers == ob.num_layers
        np.testing.assert_array_equal(oa.min_coord_voxel, ob.min_coord_voxel)
        for la, lb in zip(oa.layers, ob.layers):
            assert la.layer == lb.layer
            np.testing.assert_array_equal(
                np.sort(la.points2d_voxel, axis=0),
                np.sort(lb.points2d_voxel, axis=0))
            for fr in ("world", "voxel"):
                sa, sb = getattr(la.shapes, fr), getattr(lb.shapes, fr)
                assert abs(sa.box.area() - sb.box.area()) < 1e-9
                np.testing.assert_allclose(sa.box.center, sb.box.center,
                                           atol=1e-9)
                np.testing.assert_allclose(sa.circle.radius,
                                           sb.circle.radius, atol=1e-7)
        for ca, cb in zip(oa.components, ob.components):
            assert (ca.layer, ca.local_label) == (cb.layer, cb.local_label)
            np.testing.assert_array_equal(ca.contour2d_voxel,
                                          cb.contour2d_voxel)
            np.testing.assert_allclose(ca.contour2d_world,
                                       cb.contour2d_world, atol=1e-12)
            assert abs(ca.shapes.world.box.area()
                       - cb.shapes.world.box.area()) < 1e-9
        if oa.topview is not None:
            assert ob.topview is not None
            np.testing.assert_array_equal(oa.topview.points2d_voxel,
                                          ob.topview.points2d_voxel)
            np.testing.assert_allclose(
                oa.topview.shapes.world.box.center,
                ob.topview.shapes.world.box.center, atol=1e-9)


def test_native_temporal_encoder_matches_reference():
    """fh_depth_encode_temporal == the python reference (words, excs,
    curr_q) at every chosen width."""
    from ros_gpu_depthmap_fusion_tpu.utils import native
    from ros_gpu_depthmap_fusion_tpu.ops.depth_codec import (
        encode_depth_temporal_reference, quantize_reference)
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(17)
    h, w = 24, 37
    prev = (2000 + rng.integers(0, 600, (2, h, w))).astype(np.uint16)
    prev[rng.random((2, h, w)) < 0.05] = 0
    curr = prev.astype(np.int64) + rng.integers(-6, 7, (2, h, w))
    curr = np.clip(curr, 0, 65535).astype(np.uint16)
    curr[rng.random((2, h, w)) < 0.05] = 0
    for qs in (0, 2):
        pq = quantize_reference(prev, qs)
        ref = encode_depth_temporal_reference(curr, pq, quant_shift=qs)
        got = native.depth_encode_temporal(curr, pq, quant_shift=qs)
        assert (ref is None) == (got is None)
        if ref is None:
            continue
        renc, rbits, rq = ref
        genc, gbits, gq = got
        assert rbits == gbits
        np.testing.assert_array_equal(gq, rq)
        np.testing.assert_array_equal(genc["words"], renc["words"])
        ne = int(genc["exc_count"])
        assert ne == len(renc["exc_idx"])
        np.testing.assert_array_equal(genc["exc_idx"][:ne],
                                      renc["exc_idx"])
        np.testing.assert_array_equal(genc["exc_zz"][:ne], renc["exc_zz"])
