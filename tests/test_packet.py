"""Frame-packet roundtrip: HostPacket staging -> device unpack_packet must
reproduce every FrameInputs field bit-exactly (single-transfer path)."""

import numpy as np

import jax
import jax.numpy as jnp

from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
from ros_gpu_depthmap_fusion_tpu.ops import depth_codec as DC
from ros_gpu_depthmap_fusion_tpu.pipeline.packet import (
    HostPacket, PacketLayout, unpack_packet)


def _cfg():
    return FusionConfig(
        num_depth_streams=2, depth_height=8, depth_width=40,
        num_point_sequences=1,
        crop_min=(-6, -6, -6), crop_max=(6, 6, 6),
        voxel_min=(-6, -6, -6), voxel_max=(6, 6, 6),
        voxel_size=(0.5, 0.5, 0.5),
        rollbuffer_point_capacity=64, max_points_per_sequence=16,
        depth_codec_max_exceptions=32)


def test_packet_roundtrip_encoded_and_raw():
    cfg = _cfg()
    rng = np.random.default_rng(0)
    layout = PacketLayout.for_config(cfg, seq_cap=4, stage_cap=16)
    pkt = HostPacket(layout)

    depth = (2000 + np.cumsum(rng.integers(-3, 4, (2, 8, 40)), axis=-1)
             ).astype(np.uint16)
    depth[rng.random(depth.shape) < 0.1] = 0

    pkt.intr[:] = rng.standard_normal((2, 4)).astype(np.float32)
    pkt.tf_world[:] = rng.standard_normal((2, 4, 4)).astype(np.float32)
    pkt.tf_crop[:] = rng.standard_normal((2, 4, 4)).astype(np.float32)
    pkt.tf_world_move[:] = rng.standard_normal((4, 4)).astype(np.float32)
    pkt.tf_crop_move[:] = rng.standard_normal((4, 4)).astype(np.float32)
    pkt.seq_points[:] = rng.standard_normal((16, 4)).astype(np.float32)
    pkt.seq_sec[:] = [10, 11, 12, 13]
    pkt.seq_nsec[:] = [1, 2, 3, 4]
    pkt.seq_count[:] = [5, 6, 0, 0]
    pkt.seq_tf[:] = rng.standard_normal((4, 4, 4)).astype(np.float32)

    # encoded tail via the python reference encoder
    enc, bits = DC.encode_depth_reference(depth, max_exceptions=32)
    wpr = enc["words"].shape[-1]
    pkt.tail[: 16 * wpr] = enc["words"].reshape(-1)
    pkt.row_first[:] = enc["row_first"].reshape(-1)
    nexc = len(enc["exc_idx"])
    pkt.exc_idx[:nexc] = enc["exc_idx"]
    pkt.exc_zz[:nexc] = enc["exc_zz"]
    pkt.set_scalars(nexc, 100, 200, 50, 60, 11, 2, 0.7, 8.0, 0.3)

    inp = jax.jit(lambda p: unpack_packet(p, layout, bits))(
        jnp.asarray(pkt.view(bits)))
    dec = np.asarray(DC.decode_depth(inp.depth, 8, 40, bits))
    np.testing.assert_array_equal(dec, depth)
    np.testing.assert_array_equal(np.asarray(inp.intrinsics), pkt.intr)
    np.testing.assert_array_equal(np.asarray(inp.tf_world), pkt.tf_world)
    np.testing.assert_array_equal(np.asarray(inp.tf_crop), pkt.tf_crop)
    np.testing.assert_array_equal(np.asarray(inp.tf_world_move),
                                  pkt.tf_world_move)
    np.testing.assert_array_equal(np.asarray(inp.tf_crop_move),
                                  pkt.tf_crop_move)
    sb = inp.seq_batch
    np.testing.assert_array_equal(np.asarray(sb.points), pkt.seq_points)
    # seq_idx is derived on device from cumulative counts (5, 6, 0, 0)
    want_idx = np.searchsorted(np.cumsum([5, 6, 0, 0]), np.arange(16),
                               side="right")
    np.testing.assert_array_equal(np.asarray(sb.seq_idx), want_idx)
    np.testing.assert_array_equal(np.asarray(sb.seq_sec), pkt.seq_sec)
    np.testing.assert_array_equal(np.asarray(sb.seq_nsec), pkt.seq_nsec)
    np.testing.assert_array_equal(np.asarray(sb.seq_count), pkt.seq_count)
    np.testing.assert_array_equal(np.asarray(sb.seq_tf_move), pkt.seq_tf)
    assert int(sb.num_points) == 11 and int(sb.num_seqs) == 2
    assert (int(inp.now_sec), int(inp.now_nsec)) == (100, 200)
    assert (int(inp.roll_min_sec), int(inp.roll_min_nsec)) == (50, 60)
    # runtime filter scalars round-trip through the f32 header words
    assert float(inp.fp_threshold) == np.float32(0.7)
    assert float(inp.fp_max_distance) == np.float32(8.0)
    assert float(inp.ps_threshold) == np.float32(0.3)

    # raw tail
    flat = depth.reshape(-1)
    pkt.tail[: flat.size // 2] = flat.view(np.uint32)
    inp2 = jax.jit(lambda p: unpack_packet(p, layout, None))(
        jnp.asarray(pkt.view(None)))
    np.testing.assert_array_equal(np.asarray(inp2.depth), depth)


def test_lidar_link_quantization_roundtrip():
    """lidar_link_quant_step: staged sequence points ride as 3 x u16 and
    dequantize within step/2 per axis; the engine path end-to-end matches
    the lossless staging within that bound."""
    import numpy as np
    import jax.numpy as jnp
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    from ros_gpu_depthmap_fusion_tpu.pipeline.engine import FusionEngine
    from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics

    kw = dict(
        num_depth_streams=1, depth_height=8, depth_width=12,
        num_point_sequences=1, point_sequence_filter_threshold=0.0,
        crop_min=(-8, -8, -8), crop_max=(8, 8, 8),
        voxel_min=(-8, -8, -8), voxel_max=(8, 8, 8),
        voxel_size=(0.5, 0.5, 0.5),
        rollbuffer_point_capacity=64, rollbuffer_seq_capacity=8,
        max_points_per_sequence=32, emit_raw_points=True)
    rng = np.random.default_rng(7)
    pts = rng.uniform(-6, 6, size=(20, 3)).astype(np.float32)
    depth = np.zeros((8, 12), np.uint16)
    intr = PinholeIntrinsics.default_for(12, 8)
    eye = np.eye(4, dtype=np.float32)

    outs = {}
    for step in (0.0, 0.002):
        eng = FusionEngine(FusionConfig(**kw, lidar_link_quant_step=step))
        eng.add_depthmap(0, depth, intr, eye, eye)
        eng.add_point_sequence(pts, sec=10, nsec=0, tf_move=eye)
        out = eng.process(10.0)
        n = int(out.raw_count)
        assert n == 20
        outs[step] = np.asarray(out.raw_points)[:n]
    # same point order; each axis within step/2
    d = np.abs(outs[0.0][:, :3] - outs[0.002][:, :3])
    assert d.max() <= 0.001 + 1e-6
    np.testing.assert_array_equal(outs[0.0][:, 3], outs[0.002][:, 3])


def test_lidar_delta_staging_matches_plain():
    """Delta-coded lidar staging (cfg.lidar_link_delta) must be
    BIT-EXACT vs plain u16-quantized staging: both are lossless in the
    quantized series, so engine outputs are identical — including
    sequences with range jumps that ride the exception list."""
    import numpy as np
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
    from ros_gpu_depthmap_fusion_tpu.pipeline import FusionEngine
    kw = dict(
        num_depth_streams=1, depth_height=16, depth_width=24,
        num_point_sequences=2,
        crop_min=(-8, -8, -8), crop_max=(8, 8, 8),
        voxel_min=(-8, -8, -8), voxel_max=(8, 8, 8),
        voxel_size=(0.5, 0.5, 0.5), voxel_occupancy_lifetime=3,
        rollbuffer_point_capacity=512, rollbuffer_seq_capacity=16,
        max_points_per_sequence=256, lidar_link_quant_step=0.002,
        depth_link_codec="none")
    plain = FusionEngine(FusionConfig(**kw))
    delta = FusionEngine(FusionConfig(lidar_link_delta=True, **kw))
    intr = PinholeIntrinsics.default_for(24, 16)
    eye = np.eye(4, dtype=np.float32)
    rng = np.random.default_rng(3)
    # realistically DENSE arc (real scans step millimetres between
    # beams): 0.8 m radius over 240 points = ~10 mm steps, inside the
    # +-7-quanta in-stream range at the 2 mm link step
    t = np.linspace(0, np.pi, 240)
    arc = np.stack([0.8 * np.cos(t), 0.8 * np.sin(t),
                    1 + 0.1 * np.sin(5 * t)], -1).astype(np.float32)
    jumpy = arc.copy()
    jumpy[40:45] += np.array([1.5, -0.8, 0.4], np.float32)  # range jumps
    d = np.full((16, 24), 2000, np.uint16)
    for f in range(3):
        for eng in (plain, delta):
            eng.add_depthmap(0, d, intr, eye, eye)
            eng.add_point_sequence(arc, sec=1, nsec=f * 33000000,
                                   tf_move=eye)
            eng.add_point_sequence(jumpy, sec=1, nsec=f * 33000000 + 1,
                                   tf_move=eye)
        o_p = plain.process(1.0 + f / 30.0)
        o_d = delta.process(1.0 + f / 30.0)
    np.testing.assert_array_equal(np.asarray(o_d.occupancy_u8),
                                  np.asarray(o_p.occupancy_u8))
    assert int(o_d.raw_count) == int(o_p.raw_count) > 0
    rp = np.asarray(o_p.raw_points)[: int(o_p.raw_count)]
    rd = np.asarray(o_d.raw_points)[: int(o_d.raw_count)]
    np.testing.assert_array_equal(rd, rp)
    assert int(o_d.seq_selected_count) == int(o_p.seq_selected_count) > 0
    # the seq_points section shrinks 3x (one u16/point instead of
    # three); at PRODUCTION staging sizes the whole packet shrinks too
    # (the small-config exception section dominates here)
    assert ((delta.layout.off_seq_first - delta.layout.off_seq_points) * 3
            <= (plain.layout.off_row_first
                - plain.layout.off_seq_points) + 2)


def test_lidar_delta_truncates_on_exception_overflow():
    """A pathological sequence (every point a multi-metre jump) must be
    truncated at the exception budget with the drop counted — never
    silently corrupted."""
    import numpy as np
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
    from ros_gpu_depthmap_fusion_tpu.pipeline import FusionEngine
    cfg = FusionConfig(
        num_depth_streams=1, depth_height=16, depth_width=24,
        num_point_sequences=2,
        crop_min=(-8, -8, -8), crop_max=(8, 8, 8),
        voxel_min=(-8, -8, -8), voxel_max=(8, 8, 8),
        voxel_size=(0.5, 0.5, 0.5),
        rollbuffer_point_capacity=8192, rollbuffer_seq_capacity=16,
        max_points_per_sequence=4096, lidar_link_quant_step=0.002,
        lidar_link_delta=True, depth_link_codec="none")
    eng = FusionEngine(cfg)
    intr = PinholeIntrinsics.default_for(24, 16)
    eye = np.eye(4, dtype=np.float32)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-4, 4, (3000, 3)).astype(np.float32)  # all jumps
    eng.add_depthmap(0, np.full((16, 24), 2000, np.uint16), intr, eye,
                     eye)
    eng.add_point_sequence(pts, sec=1, nsec=0, tf_move=eye)
    pkt = eng._pkt
    assert pkt.lidar_dropped > 0
    kept = int(pkt.seq_count[0])
    assert 0 < kept < 3000
    assert pkt.lidar_exc_count <= eng.layout.lidar_exc_cap
    out = eng.process(1.0)
    # the kept prefix reconstructs exactly: compare against a plain
    # engine fed only the kept points
    plain = FusionEngine(FusionConfig(**{**cfg.__dict__,
                                         "lidar_link_delta": False}))
    plain.add_depthmap(0, np.full((16, 24), 2000, np.uint16), intr, eye,
                       eye)
    plain.add_point_sequence(pts[:kept], sec=1, nsec=0, tf_move=eye)
    out_p = plain.process(1.0)
    np.testing.assert_array_equal(np.asarray(out.occupancy_u8),
                                  np.asarray(out_p.occupancy_u8))
    assert int(out.raw_count) == int(out_p.raw_count)
