"""Rollbuffer behavior tests (spec: the reference CPU paths,
gpu_depthmap_fusion.cpp:1098-1217 expiry, :1358-1416 selection)."""

import numpy as np
import jax.numpy as jnp

from ros_gpu_depthmap_fusion_tpu.core import transforms
from ros_gpu_depthmap_fusion_tpu.state import (
    make_rollbuffer, insert_sequences, roll, select_timespan,
    gather_selection)


def _staged(seqs, point_cap=64, seq_cap=8):
    """Build a staging batch from [(sec, nsec, pts [k,3], tf), ...]."""
    total = sum(len(p) for _, _, p, _ in seqs)
    new_points = np.zeros((point_cap, 4), np.float32)
    new_mask = np.zeros((point_cap,), bool)
    new_seq_idx = np.zeros((point_cap,), np.int32)
    sec = np.zeros(seq_cap, np.int32)
    nsec = np.zeros(seq_cap, np.int32)
    cnt = np.zeros(seq_cap, np.int32)
    tfs = np.tile(np.eye(4, dtype=np.float32), (seq_cap, 1, 1))
    off = 0
    for i, (s, ns, pts, tf) in enumerate(seqs):
        k = len(pts)
        new_points[off:off + k] = transforms.to_homogeneous(
            np.asarray(pts, np.float32))
        new_mask[off:off + k] = True
        new_seq_idx[off:off + k] = i
        sec[i], nsec[i], cnt[i] = s, ns, k
        tfs[i] = tf
        off += k
    return (jnp.asarray(new_points), jnp.asarray(new_mask),
            jnp.asarray(new_seq_idx), jnp.asarray(sec), jnp.asarray(nsec),
            jnp.asarray(cnt), jnp.asarray(tfs),
            jnp.int32(total), jnp.int32(len(seqs)))


def _mk(seqs, point_cap=64, seq_cap=8):
    rb = make_rollbuffer(point_cap, seq_cap)
    rb, ov = insert_sequences(rb, *_staged(seqs, point_cap, seq_cap))
    return rb, ov


I = np.eye(4, dtype=np.float32)


def test_insert_layout():
    rb, ov = _mk([(10, 0, [[1, 0, 0]] * 3, I),
                  (11, 5, [[0, 2, 0]] * 2, I)])
    assert not bool(ov)
    assert int(rb.num_points) == 5 and int(rb.num_seqs) == 2
    np.testing.assert_array_equal(np.asarray(rb.seq_start)[:2], [0, 3])
    np.testing.assert_array_equal(np.asarray(rb.seq_count)[:2], [3, 2])
    np.testing.assert_array_equal(np.asarray(rb.seq_idx)[:5],
                                  [0, 0, 0, 1, 1])
    np.testing.assert_array_equal(np.asarray(rb.seq_sec)[:2], [10, 11])


def test_insert_appends_after_existing():
    rb, _ = _mk([(10, 0, [[1, 0, 0]] * 3, I)])
    rb, ov = insert_sequences(rb, *_staged([(12, 0, [[5, 5, 5]] * 2, I)]))
    assert not bool(ov)
    assert int(rb.num_points) == 5 and int(rb.num_seqs) == 2
    np.testing.assert_array_equal(np.asarray(rb.seq_start)[:2], [0, 3])
    np.testing.assert_array_equal(np.asarray(rb.seq_idx)[:5],
                                  [0, 0, 0, 1, 1])
    np.testing.assert_allclose(np.asarray(rb.points)[3, :3], [5, 5, 5])


def test_insert_overflow_drops_whole_sequence():
    rb = make_rollbuffer(point_capacity=5, seq_capacity=8)
    rb, ov = insert_sequences(rb, *_staged(
        [(1, 0, [[0, 0, 0]] * 3, I), (2, 0, [[1, 1, 1]] * 4, I)],
        point_cap=16))
    assert bool(ov)
    # second sequence (4 pts) does not fit in remaining 2 slots -> dropped whole
    assert int(rb.num_points) == 3 and int(rb.num_seqs) == 1


def test_roll_expires_old_sequences():
    rb, _ = _mk([(10, 0, [[1, 0, 0]] * 3, I),
                 (11, 0, [[2, 0, 0]] * 2, I),
                 (12, 0, [[3, 0, 0]] * 4, I)])
    rb2 = roll(rb, jnp.int32(11), jnp.int32(0))  # expire t < 11
    assert int(rb2.num_seqs) == 2 and int(rb2.num_points) == 6
    np.testing.assert_array_equal(np.asarray(rb2.seq_sec)[:2], [11, 12])
    np.testing.assert_array_equal(np.asarray(rb2.seq_start)[:2], [0, 2])
    np.testing.assert_array_equal(np.asarray(rb2.seq_idx)[:6],
                                  [0, 0, 1, 1, 1, 1])
    np.testing.assert_allclose(np.asarray(rb2.points)[0, :3], [2, 0, 0])
    # nsec lexicographic edge: min == (11, 0) keeps the t=(11,0) sequence
    rb3 = roll(rb, jnp.int32(10), jnp.int32(1))  # expire t < (10,1)
    assert int(rb3.num_seqs) == 2


def test_roll_everything_expires():
    rb, _ = _mk([(1, 0, [[1, 0, 0]] * 3, I)])
    rb2 = roll(rb, jnp.int32(100), jnp.int32(0))
    assert int(rb2.num_seqs) == 0 and int(rb2.num_points) == 0
    assert not bool(np.asarray(rb2.mask).any())


def test_select_timespan_inclusive_window():
    rb, _ = _mk([(10, 0, [[1, 0, 0]] * 3, I),
                 (11, 0, [[2, 0, 0]] * 2, I),
                 (12, 0, [[3, 0, 0]] * 4, I),
                 (13, 0, [[4, 0, 0]] * 1, I)])
    sel = select_timespan(rb, 11, 0, 12, 0)
    assert int(sel.seq_start) == 1 and int(sel.seq_count) == 2
    assert int(sel.point_start) == 3 and int(sel.point_count) == 6
    # empty window
    sel0 = select_timespan(rb, 20, 0, 30, 0)
    assert int(sel0.seq_count) == 0 and int(sel0.point_count) == 0


def test_gather_selection_transforms_points():
    tf_a = transforms.make_se3(translation=np.array([1, 0, 0]))
    tf_b = transforms.make_se3(translation=np.array([0, 1, 0]))
    rb, _ = _mk([(10, 0, [[0, 0, 5]] * 2, tf_a),
                 (11, 0, [[0, 0, 7]] * 3, tf_b)])
    sel = select_timespan(rb, 10, 0, 11, 0)
    tf_world_move = transforms.make_se3(translation=np.array([0, 0, 100.0]))
    pw, pc, msk, count = gather_selection(
        rb, sel, jnp.asarray(tf_world_move), jnp.asarray(np.eye(4, dtype=np.float32)),
        capacity=16)
    assert int(count) == 5
    # seq A: world = T_wm @ T_a @ p = [1, 0, 105]
    np.testing.assert_allclose(np.asarray(pw)[0, :3], [1, 0, 105], atol=1e-5)
    # seq B: world = T_wm @ T_b @ p = [0, 1, 107]
    np.testing.assert_allclose(np.asarray(pw)[2, :3], [0, 1, 107], atol=1e-5)
    # crop uses identity move: crop = T_b @ p
    np.testing.assert_allclose(np.asarray(pc)[2, :3], [0, 1, 7], atol=1e-5)
    assert bool(np.asarray(msk)[:5].all())
    assert not bool(np.asarray(msk)[5:].any())


def test_gather_selection_window_offset():
    rb, _ = _mk([(10, 0, [[1, 1, 1]] * 3, I),
                 (11, 0, [[2, 2, 2]] * 2, I)])
    sel = select_timespan(rb, 11, 0, 11, 0)
    pw, _, msk, count = gather_selection(
        rb, sel, jnp.eye(4), jnp.eye(4), capacity=8)
    assert int(count) == 2
    np.testing.assert_allclose(np.asarray(pw)[0, :3], [2, 2, 2], atol=1e-6)


def test_monotone_clamp_on_late_arrival():
    rb, _ = _mk([(10, 0, [[1, 0, 0]], I)])
    # a sequence arriving with an older stamp is clamped forward
    rb, _ = insert_sequences(rb, *_staged([(5, 0, [[2, 0, 0]], I)]))
    assert int(rb.seq_sec[1]) == 10
    assert int(rb.num_seqs) == 2


def test_out_of_order_lidar_stream_stays_consistent():
    """Genuinely out-of-order arrival (VERDICT r1 item 8): stamps are
    clamped to the monotone invariant, so expiry/selection windows stay
    contiguous and no points are lost or double-selected."""
    # arrival order 10, 12, 11, 13 (12 and 11 swapped on the wire)
    rb, _ = _mk([(10, 0, [[1, 0, 0]], I)])
    for s, x in [(12, 2), (11, 3), (13, 4)]:
        rb, _ = insert_sequences(rb, *_staged([(s, 0, [[x, 0, 0]], I)]))
    # the late 11 was clamped to 12: timestamps are monotone
    secs = np.asarray(rb.seq_sec)[: int(rb.num_seqs)]
    assert list(secs) == sorted(list(secs)) == [10, 12, 12, 13]
    assert int(rb.num_points) == 4

    # selection [11, 13] -> the clamped sequence is INSIDE the window and
    # every sequence is selected exactly once (contiguous window)
    sel = select_timespan(rb, 11, 0, 13, 0)
    assert int(sel.seq_count) == 3 and int(sel.point_count) == 3
    pw, _, msk, cnt = gather_selection(rb, sel, jnp.eye(4), jnp.eye(4), 8)
    got = sorted(np.asarray(pw)[np.asarray(msk), 0].tolist())
    assert got == [2.0, 3.0, 4.0]

    # expiry at t=12 drops only the leading run older than 12
    rb2 = roll(rb, 12, 0)
    assert int(rb2.num_seqs) == 3 and int(rb2.num_points) == 3
    secs2 = np.asarray(rb2.seq_sec)[: int(rb2.num_seqs)]
    assert list(secs2) == [12, 12, 13]


def test_rollbuffer_dump_inspector():
    """checkAllPointSequenceBuffers analog (cpp:859-926)."""
    from ros_gpu_depthmap_fusion_tpu.state.rollbuffer import dump
    rb, _ = _mk([(10, 0, [[1, 0, 0], [2, 0, 0]], I),
                 (11, 0, [[3, 0, 0]], I)])
    d = dump(rb)
    assert d["num_points"] == 3 and d["num_seqs"] == 2
    assert d["points"].shape == (3, 4)
    assert list(d["seq_count"]) == [2, 1]
    assert list(d["seq_start"]) == [0, 2]
    assert d["points_raw"].shape[0] == rb.point_capacity
