"""Depth-pipeline op tests against the NumPy GLSL oracles."""

import numpy as np
import jax.numpy as jnp

from ros_gpu_depthmap_fusion_tpu.core import transforms
from ros_gpu_depthmap_fusion_tpu.ops.unproject import unproject_depthmaps
from ros_gpu_depthmap_fusion_tpu.ops.stencil import (
    filter_flying_pixels, filter_point_sequence)
from ros_gpu_depthmap_fusion_tpu.ops.mask_ops import (
    crop_points, compact, compact_multi)
from ros_gpu_depthmap_fusion_tpu.ops import pack

import oracles


def _synthetic_depth(h, w, seed=0, zero_frac=0.2):
    rng = np.random.default_rng(seed)
    d = rng.integers(300, 5000, size=(h, w), dtype=np.uint16)
    d[rng.random((h, w)) < zero_frac] = 0
    return d


def test_unproject_matches_oracle():
    h, w = 12, 16
    depth = _synthetic_depth(h, w)
    fx, fy, cx, cy = 200.0, 210.0, (w - 1) / 2, (h - 1) / 2
    tf_w = transforms.make_se3(transforms.rot_z(0.4), np.array([1, 2, 3]))
    tf_c = transforms.make_se3(transforms.rot_x(-0.2), np.array([0, 1, 0]))

    pc, pw, pcr, m = unproject_depthmaps(
        jnp.asarray(depth)[None], jnp.array([[fx, fy, cx, cy]]),
        jnp.asarray(tf_w)[None], jnp.asarray(tf_c)[None], 0.001)

    oc, ow, ocr, om = oracles.unproject_oracle(
        depth, fx, fy, cx, cy, 0.001, tf_w, tf_c)
    np.testing.assert_array_equal(np.asarray(m[0]), om)
    np.testing.assert_allclose(np.asarray(pc[0]), oc, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pw[0]), ow, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pcr[0]), ocr, rtol=1e-5, atol=1e-4)


def test_flying_pixels_matches_oracle():
    h, w = 14, 18
    depth = _synthetic_depth(h, w, seed=3, zero_frac=0.1).astype(np.float32)
    # build a smooth surface plus spikes so both accept/reject paths trigger
    depth = 1000 + 20 * np.arange(w)[None, :] + 10 * np.arange(h)[:, None]
    rng = np.random.default_rng(4)
    spikes = rng.random((h, w)) < 0.1
    depth = np.where(spikes, depth * 3, depth).astype(np.uint16)
    fx = fy = 150.0
    cx, cy = (w - 1) / 2, (h - 1) / 2
    eye = np.eye(4, dtype=np.float32)
    pc, _, _, m = unproject_depthmaps(
        jnp.asarray(depth)[None], jnp.array([[fx, fy, cx, cy]]),
        jnp.asarray(eye)[None], jnp.asarray(eye)[None], 0.001)

    for size, rot45 in [(1, False), (1, True), (2, True)]:
        got = filter_flying_pixels(pc, m, h, w, size, 0.35, rot45, 10.0)
        want = oracles.flying_pixels_oracle(
            np.asarray(pc[0]), np.asarray(m[0]), h, w, size, 0.35, rot45)
        np.testing.assert_array_equal(np.asarray(got[0]), want,
                                      err_msg=f"size={size} rot45={rot45}")


def test_flying_pixels_max_distance_gate():
    h = w = 8
    depth = np.full((h, w), 20000, np.uint16)  # 20 m > 10 m gate
    eye = np.eye(4, dtype=np.float32)
    pc, _, _, m = unproject_depthmaps(
        jnp.asarray(depth)[None], jnp.array([[100.0, 100.0, 3.5, 3.5]]),
        jnp.asarray(eye)[None], jnp.asarray(eye)[None], 0.001)
    got = filter_flying_pixels(pc, m, h, w, 1, 0.0, False, 10.0)
    assert not bool(np.asarray(got).any())


def test_sequence_filter_matches_oracle():
    rng = np.random.default_rng(7)
    n, valid = 64, 50
    # smooth arc of points with some outliers dragged along the view ray
    t = np.linspace(0.2, 1.8, n)
    pts = np.stack([np.cos(t) * 3, np.sin(t) * 3, 0.5 + 0 * t], axis=-1)
    drag = rng.random(n) < 0.2
    pts[drag] *= rng.uniform(1.5, 3.0, size=(drag.sum(), 1))
    pts4 = transforms.to_homogeneous(pts.astype(np.float32))
    mask = rng.random(n) < 0.9

    for size in (1, 2, 3):
        got = filter_point_sequence(
            jnp.asarray(pts4), jnp.asarray(mask), jnp.int32(valid),
            size, 0.5)
        want = oracles.sequence_filter_oracle(pts4, mask, valid, size, 0.5)
        np.testing.assert_array_equal(np.asarray(got), want,
                                      err_msg=f"size={size}")


def test_crop_matches_oracle():
    rng = np.random.default_rng(9)
    pts = transforms.to_homogeneous(
        rng.uniform(-2, 2, size=(200, 3)).astype(np.float32))
    mask = rng.random(200) < 0.8
    lo, hi = (-1, -0.5, -1), (1, 0.5, 1)
    got = crop_points(jnp.asarray(pts), jnp.asarray(mask), lo, hi)
    want = oracles.crop_oracle(pts, mask, lo, hi)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_compact_stable_and_counted():
    rng = np.random.default_rng(11)
    vals = rng.normal(size=(100, 4)).astype(np.float32)
    mask = rng.random(100) < 0.4
    out, count = compact(jnp.asarray(vals), jnp.asarray(mask), 100)
    expect = vals[mask]
    assert int(count) == expect.shape[0]
    np.testing.assert_allclose(np.asarray(out)[: int(count)], expect)
    np.testing.assert_array_equal(np.asarray(out)[int(count):], 0)


def test_compact_overflow_drops_tail():
    vals = np.arange(10, dtype=np.float32)[:, None]
    mask = np.ones(10, bool)
    out, count = compact(jnp.asarray(vals), jnp.asarray(mask), 4)
    assert int(count) == 4
    np.testing.assert_allclose(np.asarray(out)[:, 0], [0, 1, 2, 3])


def test_compact_multi_shares_slots():
    vals = np.arange(6, dtype=np.float32)
    ids = np.arange(6, dtype=np.int32) * 10
    mask = np.array([1, 0, 1, 1, 0, 1], bool)
    (a, b), count = compact_multi(
        (jnp.asarray(vals), jnp.asarray(ids)), jnp.asarray(mask), 6)
    assert int(count) == 4
    np.testing.assert_allclose(np.asarray(a)[:4], [0, 2, 3, 5])
    np.testing.assert_array_equal(np.asarray(b)[:4], [0, 20, 30, 50])


def test_pack_roundtrips():
    rng = np.random.default_rng(13)
    d = rng.integers(0, 2 ** 16, size=64, dtype=np.uint16)
    pairs = pack.pack_depth_pairs(jnp.asarray(d))
    np.testing.assert_array_equal(
        np.asarray(pack.unpack_depth_pairs(pairs)), d)

    u = rng.integers(0, 2 ** 32, size=32, dtype=np.uint32)
    np.testing.assert_array_equal(
        np.asarray(pack.chars_to_uints(pack.uints_to_chars(jnp.asarray(u)))), u)
    np.testing.assert_array_equal(
        np.asarray(pack.words_to_uints(pack.uints_to_words(jnp.asarray(u)))), u)

    # bitfieldExtract parity: element i from bits 16*(i%2) of word i//2
    w0 = np.uint32(0xABCD1234)
    got = np.asarray(pack.unpack_depth_pairs(jnp.asarray([w0])))
    assert got[0] == 0x1234 and got[1] == 0xABCD
