import numpy as np
import jax.numpy as jnp

from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
from ros_gpu_depthmap_fusion_tpu.core import transforms, timeutil
from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics


def test_grid_size_matches_reference_formula():
    # deployment preset: 40x40x2.5 m at 0.1/0.1/0.12 -> 400x400x21 (launch:144-159)
    g = VoxelGrid(lower=(-20, -20, 0), upper=(20, 20, 2.5),
                  cell_size=(0.1, 0.1, 0.12))
    assert g.grid_size == (400, 400, 21)
    assert g.num_cells == 400 * 400 * 21
    assert g.steps == (1, 400, 160000)


def test_grid_bounds_normalized():
    g = VoxelGrid(lower=(1, -1, 5), upper=(-1, 1, 0), cell_size=(1, 1, 1))
    assert g.lower == (-1, -1, 0)
    assert g.upper == (1, 1, 5)


def test_grid_roundtrip_index_coord():
    g = VoxelGrid(lower=(0, 0, 0), upper=(4, 3, 2), cell_size=(1, 1, 1))
    idx = jnp.arange(g.num_cells)
    coord = g.grid_coord_of_index(idx)
    back = g.cell_index_of_coord(coord)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))
    world = g.world_coord_of_index(idx)
    assert np.asarray(world).shape == (g.num_cells, 3)
    # lower corner convention (grid_meta.h:94-100)
    np.testing.assert_allclose(np.asarray(world[0]), [0, 0, 0])


def test_grid_clamped_cell_index_border():
    g = VoxelGrid(lower=(0, 0, 0), upper=(2, 2, 2), cell_size=(1, 1, 1))
    pts = jnp.array([[-5.0, -5.0, -5.0], [5.0, 5.0, 5.0], [0.5, 1.5, 0.5]])
    idx = g.cell_index_clamped(pts)
    assert int(idx[0]) == 0
    assert int(idx[1]) == g.num_cells - 1
    assert int(idx[2]) == 0 + 1 * 2 + 0 * 4


def test_transform_points_matches_matmul():
    rng = np.random.default_rng(0)
    pts = transforms.to_homogeneous(rng.normal(size=(17, 3)).astype(np.float32))
    tf = transforms.make_se3(transforms.rot_z(0.3), np.array([1, 2, 3]))
    out = np.asarray(transforms.transform_points(jnp.asarray(pts), jnp.asarray(tf)))
    expect = (tf @ pts.T).T
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_transform_points_indirect():
    rng = np.random.default_rng(1)
    pts = transforms.to_homogeneous(rng.normal(size=(8, 3)).astype(np.float32))
    tfs = np.stack([transforms.make_se3(translation=np.array([i, 0, 0]))
                    for i in range(3)])
    idcs = np.array([0, 1, 2, 0, 1, 2, 0, 1], np.int32)
    mask = np.array([1, 1, 1, 1, 0, 1, 1, 1], bool)
    out = np.asarray(transforms.transform_points_indirect(
        jnp.asarray(pts), jnp.asarray(tfs), jnp.asarray(idcs),
        jnp.asarray(mask)))
    for i in range(8):
        expect = tfs[idcs[i]] @ pts[i] if mask[i] else pts[i]
        np.testing.assert_allclose(out[i], expect, rtol=1e-6)


def test_invert_se3():
    tf = transforms.make_se3(transforms.rot_y(1.1), np.array([0.5, -2, 1]))
    inv = transforms.invert_se3(tf)
    np.testing.assert_allclose(inv @ tf, np.eye(4), atol=1e-6)


def test_time_encode_lexicographic():
    # encode preserves the reference's lexicographic (sec, nsec) order
    pairs = [(0, 0), (0, 999999999), (1, 0), (1, 5), (2, 0)]
    enc = [timeutil.encode(s, ns) for s, ns in pairs]
    assert enc == sorted(enc)
    s, ns = timeutil.decode(enc[3])
    assert (s, ns) == (1, 5)


def test_intrinsics_from_k():
    k = np.array([[600, 0, 320], [0, 601, 240], [0, 0, 1]], np.float32)
    intr = PinholeIntrinsics.from_k_matrix(k, 640, 480)
    assert intr.fx == 600 and intr.fy == 601
    assert intr.cx == 320 and intr.cy == 240
