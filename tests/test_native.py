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
