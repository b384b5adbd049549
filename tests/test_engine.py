"""End-to-end engine tests (single chip, CPU backend)."""

import numpy as np
import jax.numpy as jnp

from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
from ros_gpu_depthmap_fusion_tpu.core.grid import VoxelGrid
from ros_gpu_depthmap_fusion_tpu.core.camera import PinholeIntrinsics
from ros_gpu_depthmap_fusion_tpu.core import transforms
from ros_gpu_depthmap_fusion_tpu.pipeline import FusionEngine


def small_cfg(**kw):
    base = dict(
        num_depth_streams=2, depth_height=24, depth_width=32,
        num_point_sequences=1,
        crop_min=(-5, -5, -5), crop_max=(5, 5, 5),
        voxel_min=(-5, -5, -5), voxel_max=(5, 5, 5),
        voxel_size=(0.5, 0.5, 0.5),
        rollbuffer_point_capacity=256, rollbuffer_seq_capacity=16,
        max_points_per_sequence=64,
        voxel_occupancy_lifetime=3,
        flyingpixels_filter_threshold=0.0,
    )
    base.update(kw)
    return FusionConfig(**base)


def flat_depth(cfg, meters):
    return np.full((cfg.depth_height, cfg.depth_width),
                   int(meters / cfg.depth_scale), np.uint16)


def test_engine_depth_only_frame():
    cfg = small_cfg()
    eng = FusionEngine(cfg)
    intr = PinholeIntrinsics.default_for(cfg.depth_width, cfg.depth_height)
    eye = np.eye(4, dtype=np.float32)
    tf1 = transforms.make_se3(translation=np.array([1.0, 0, 0]))
    eng.add_depthmap(0, flat_depth(cfg, 2.0), intr, eye, eye)
    eng.add_depthmap(1, flat_depth(cfg, 2.0), intr, tf1, tf1)
    out = eng.process(now_seconds=1.0)
    assert int(out.raw_count) > 0
    assert int(out.fused_count) > 0
    raw = np.asarray(out.raw_points)[: int(out.raw_count)]
    # flat wall at z=2 in both cams; cam1 shifted +1 in x
    assert abs(float(np.median(raw[:, 2])) - 2.0) < 0.01
    occ = np.asarray(out.occupancy_u8)
    assert occ.max() == cfg.voxel_occupancy_lifetime


def test_engine_empty_frame_decays():
    cfg = small_cfg()
    eng = FusionEngine(cfg)
    intr = PinholeIntrinsics.default_for(cfg.depth_width, cfg.depth_height)
    eye = np.eye(4, dtype=np.float32)
    eng.add_depthmap(0, flat_depth(cfg, 2.0), intr, eye, eye)
    out = eng.process(1.0)
    occupied0 = int((np.asarray(out.occupancy_u8) > 0).sum())
    assert occupied0 > 0
    for k in range(cfg.voxel_occupancy_lifetime):
        out = eng.process(1.0 + 0.1 * (k + 1))
    assert int((np.asarray(out.occupancy_u8) > 0).sum()) == 0
    assert int(out.raw_count) == 0


def test_engine_crop_excludes():
    cfg = small_cfg(crop_min=(-0.1, -0.1, -0.1), crop_max=(0.1, 0.1, 0.1))
    eng = FusionEngine(cfg)
    intr = PinholeIntrinsics.default_for(cfg.depth_width, cfg.depth_height)
    eye = np.eye(4, dtype=np.float32)
    eng.add_depthmap(0, flat_depth(cfg, 2.0), intr, eye, eye)
    out = eng.process(1.0)  # wall at z=2 is outside the tiny crop box
    assert int(out.raw_count) == 0


def test_engine_point_sequence_aggregation_and_expiry():
    cfg = small_cfg(point_sequence_aggregation_timespan=0.5,
                    point_sequence_filter_size=1,
                    point_sequence_filter_threshold=0.0)
    eng = FusionEngine(cfg)
    eye = np.eye(4, dtype=np.float32)
    # tangential arc of lidar points at radius 3 (survives the seq filter)
    t = np.linspace(0, np.pi / 4, 32)
    arc = np.stack([3 * np.cos(t), 3 * np.sin(t), 0.5 + 0 * t], axis=-1)

    eng.add_point_sequence(arc, sec=1, nsec=0, tf_move=eye)
    out1 = eng.process(1.0)
    assert int(out1.seq_selected_count) == 32
    assert int(out1.raw_count) > 0

    # 0.3s later: still inside the 0.5s window
    eng.add_point_sequence(arc + np.array([0, 0, 1.0]), sec=1,
                           nsec=300_000_000, tf_move=eye)
    out2 = eng.process(1.3)
    assert int(out2.seq_selected_count) == 64

    # at t=1.7 the window is [1.2, 1.7]: first packet (t=1.0) expired,
    # second (t=1.3) still selected
    out3 = eng.process(1.7)
    assert int(out3.seq_selected_count) == 32
    # at t=2.5 everything has expired
    out4 = eng.process(2.5)
    assert int(out4.seq_selected_count) == 0


def test_engine_seq_move_transform():
    cfg = small_cfg(point_sequence_filter_threshold=0.0)
    eng = FusionEngine(cfg)
    eye = np.eye(4, dtype=np.float32)
    tf_move = transforms.make_se3(translation=np.array([10.0, 0, 0]))
    pts = np.array([[3.0, 0.1, 0.5], [3.0, 0.3, 0.5]])
    eng.add_point_sequence(pts, sec=2, nsec=0, tf_move=tf_move)
    tf_world_move = transforms.make_se3(translation=np.array([0, 20.0, 0]))
    cfg_big = cfg  # crop box is +-5 -> move the points back inside via crop tf
    out = eng.process(2.0, tf_world_move=tf_world_move,
                      tf_crop_move=np.asarray(
                          transforms.invert_se3(tf_move), np.float32))
    raw = np.asarray(out.raw_points)[: int(out.raw_count)]
    assert raw.shape[0] == 2
    # world = T_world_move @ T_move @ p = p + (10, 20, 0)
    np.testing.assert_allclose(raw[0, :3], [13.0, 20.1, 0.5], atol=1e-4)


def test_engine_voxel_average_mode():
    cfg = small_cfg(voxel_enable_average=True, voxel_size=(1.0, 1.0, 1.0))
    eng = FusionEngine(cfg)
    intr = PinholeIntrinsics.default_for(cfg.depth_width, cfg.depth_height)
    eye = np.eye(4, dtype=np.float32)
    eng.add_depthmap(0, flat_depth(cfg, 2.0), intr, eye, eye)
    out = eng.process(1.0)
    fused = np.asarray(out.fused_points)[: int(out.fused_count)]
    # averaged points must sit at z ~= 2.0 (true surface), not cell corners
    np.testing.assert_allclose(fused[:, 2], 2.0, atol=1e-3)
    assert int(out.fused_count) < int(out.raw_count)


def test_engine_voxel_occupied_mode():
    cfg = small_cfg(voxel_enable_average=False, voxel_size=(1.0, 1.0, 1.0))
    eng = FusionEngine(cfg)
    intr = PinholeIntrinsics.default_for(cfg.depth_width, cfg.depth_height)
    eye = np.eye(4, dtype=np.float32)
    eng.add_depthmap(0, flat_depth(cfg, 2.0), intr, eye, eye)
    out = eng.process(1.0)
    fused = np.asarray(out.fused_points)[: int(out.fused_count)]
    # occupied mode emits cell lower corners: z = 2 m -> cell floor(7/1)=7
    # with lower bound -5 -> corner z = -5 + 7 = 2.0
    assert set(np.unique(fused[:, 2])) <= {2.0}


def test_engine_deterministic():
    cfg = small_cfg()
    intr = PinholeIntrinsics.default_for(cfg.depth_width, cfg.depth_height)
    eye = np.eye(4, dtype=np.float32)
    rng = np.random.default_rng(0)
    depth = rng.integers(500, 4000, size=(cfg.depth_height, cfg.depth_width),
                         dtype=np.uint16)
    results = []
    for _ in range(2):
        eng = FusionEngine(cfg)
        eng.add_depthmap(0, depth, intr, eye, eye)
        out = eng.process(1.0)
        results.append((np.asarray(out.raw_points), int(out.raw_count),
                        np.asarray(out.occupancy_u8)))
    np.testing.assert_array_equal(results[0][0], results[1][0])
    assert results[0][1] == results[1][1]
    np.testing.assert_array_equal(results[0][2], results[1][2])


def test_engine_runtime_filter_reconfig_no_rejit():
    """Flying-pixel threshold / max_distance are per-frame packet scalars:
    changing them takes effect next frame with the SAME jitted step
    (parity with the reference's live config topics,
    _component.cpp:970-990)."""
    cfg = small_cfg()
    eng = FusionEngine(cfg)
    intr = PinholeIntrinsics.default_for(cfg.depth_width, cfg.depth_height)
    eye = np.eye(4, dtype=np.float32)
    rng = np.random.default_rng(1)
    depth = rng.integers(1500, 2500,
                         size=(cfg.depth_height, cfg.depth_width),
                         dtype=np.uint16)
    step_obj = eng.step

    eng.add_depthmap(0, depth, intr, eye, eye)
    base = int(eng.process(1.0).raw_count)

    # max_distance below the scene range rejects everything
    eng.set_runtime_filters(fp_max_distance=0.5)
    eng.add_depthmap(0, depth, intr, eye, eye)
    gated = int(eng.process(2.0).raw_count)
    assert gated == 0 and base > 0
    assert eng.step is step_obj  # no rebuild, no re-jit

    # restoring brings the points back
    eng.set_runtime_filters(fp_max_distance=10.0)
    eng.add_depthmap(0, depth, intr, eye, eye)
    assert int(eng.process(3.0).raw_count) == base
    assert eng.step is step_obj


def test_engine_pipelined_matches_sync():
    """pipeline_depth=1 returns frame k-1's outputs from process(k) (+
    flush() for the tail) and produces EXACTLY the sync-mode sequence."""
    cfg = small_cfg()
    intr = PinholeIntrinsics.default_for(cfg.depth_width, cfg.depth_height)
    eye = np.eye(4, dtype=np.float32)
    rng = np.random.default_rng(7)
    frames = [rng.integers(1000, 4000,
                           size=(cfg.depth_height, cfg.depth_width),
                           dtype=np.uint16) for _ in range(5)]
    seq = rng.standard_normal((8, 3)).astype(np.float32)

    def run(eng):
        outs = []
        for f, d in enumerate(frames):
            eng.add_depthmap(0, d, intr, eye, eye)
            eng.add_depthmap(1, frames[(f + 2) % 5], intr, eye, eye)
            eng.add_point_sequence(seq, sec=f + 1, nsec=0, tf_move=eye)
            out = eng.process(float(f + 1))
            if out is not None:
                outs.append(out)
        tail = eng.flush() if hasattr(eng, "flush") else None
        if tail is not None:
            outs.append(tail)
        return outs

    sync_outs = run(FusionEngine(cfg))
    pipe_outs = run(FusionEngine(cfg, pipeline_depth=1))
    assert len(sync_outs) == len(pipe_outs) == len(frames)
    for a, b in zip(sync_outs, pipe_outs):
        assert int(a.fused_count) == int(b.fused_count)
        np.testing.assert_array_equal(np.asarray(a.fused_points),
                                      np.asarray(b.fused_points))
        np.testing.assert_array_equal(np.asarray(a.occupancy_u8),
                                      np.asarray(b.occupancy_u8))


def test_frame_inputs_defaults_match_config():
    """FrameInputs NamedTuple defaults must equal the FusionConfig defaults
    (they are duplicated constants; this ties them together — ADVICE r2)."""
    from ros_gpu_depthmap_fusion_tpu.pipeline.engine import FrameInputs
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    cfg = FusionConfig()
    d = FrameInputs._field_defaults
    assert d["fp_threshold"] == cfg.flyingpixels_filter_threshold
    assert d["fp_max_distance"] == cfg.flyingpixels_max_distance
    assert d["ps_threshold"] == cfg.point_sequence_filter_threshold


def test_frame_inputs_defaults_match_config_defaults():
    """ADVICE r2: FrameInputs' runtime-filter NamedTuple defaults must not
    drift from the FusionConfig defaults (callers building FrameInputs
    directly inherit them)."""
    from ros_gpu_depthmap_fusion_tpu.pipeline.engine import FrameInputs
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    cfg = FusionConfig()
    d = FrameInputs._field_defaults
    assert d["fp_threshold"] == cfg.flyingpixels_filter_threshold
    assert d["fp_max_distance"] == cfg.flyingpixels_max_distance
    assert d["ps_threshold"] == cfg.point_sequence_filter_threshold


def test_temporal_link_codec_matches_spatial():
    """dpcm_temporal engine output == dpcm engine output frame by frame
    (P-frames reconstruct the exact same quantized depth), and P-frames
    actually engage on a slowly-changing stream."""
    from ros_gpu_depthmap_fusion_tpu.utils import native
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    kw = dict(
        num_depth_streams=2, depth_height=16, depth_width=24,
        crop_min=(-6, -6, -6), crop_max=(6, 6, 6),
        voxel_min=(-6, -6, -6), voxel_max=(6, 6, 6),
        voxel_size=(0.5, 0.5, 0.5),
        rollbuffer_point_capacity=64, rollbuffer_seq_capacity=8,
        max_points_per_sequence=32, depth_codec_quant_shift=2,
        # tight exception budget so the chosen widths reflect the data
        # (at test scale the default 8192 budget absorbs every overflow
        # and both coders trivially pick B=2)
        depth_codec_max_exceptions=48,
        depth_codec_keyframe_interval=4, emit_raw_points=True)
    rng = np.random.default_rng(5)
    engs = {c: FusionEngine(FusionConfig(**kw, depth_link_codec=c))
            for c in ("dpcm", "dpcm_temporal")}
    intr = PinholeIntrinsics.default_for(24, 16)
    eye = np.eye(4, dtype=np.float32)
    base = (2000 + 50 * rng.standard_normal((16, 24))).astype(np.uint16)
    saw_p = False
    for f in range(6):
        d = (base.astype(np.int64) + 3 * f).astype(np.uint16)
        d[rng.random((16, 24)) < 0.03] = 0
        outs = {}
        for name, eng in engs.items():
            for s in range(2):
                eng.add_depthmap(s, d, intr, eye, eye)
            outs[name] = eng.process(10.0 + f / 30.0)
        if engs["dpcm_temporal"]._last_frame_bits is not None \
                and engs["dpcm_temporal"]._last_frame_bits < 0:
            saw_p = True
        a, b = outs["dpcm"], outs["dpcm_temporal"]
        assert int(a.raw_count) == int(b.raw_count)
        np.testing.assert_array_equal(np.asarray(a.raw_points),
                                      np.asarray(b.raw_points))
        np.testing.assert_array_equal(np.asarray(a.occupancy_u8),
                                      np.asarray(b.occupancy_u8))
    assert saw_p, "no P-frame engaged on a slowly-changing stream"


def test_engine_sparse_occupancy_roundtrip_and_mapping():
    """Sparse occupancy output (occupancy_sparse_capacity > 0): host
    reconstruction from (idx, word) pairs must equal the dense bitmap,
    process_sparse must reproduce process_packed, and capacity overflow
    must fall back to the dense bitmap (round-5: the mapping consumer's
    d2h payload)."""
    from ros_gpu_depthmap_fusion_tpu.mapping.pipeline import MappingPipeline
    cfg = small_cfg(occupancy_sparse_capacity=64, object_min_area=0.0)
    eng = FusionEngine(cfg)
    intr = PinholeIntrinsics.default_for(cfg.depth_width, cfg.depth_height)
    eye = np.eye(4, dtype=np.float32)
    tf1 = transforms.make_se3(translation=np.array([1.0, 0, 0]))
    out = None
    for f in range(2):
        eng.add_depthmap(0, flat_depth(cfg, 2.0), intr, eye, eye)
        eng.add_depthmap(1, flat_depth(cfg, 2.0), intr, tf1, tf1)
        out = eng.process(now_seconds=1.0 + f * 0.1)
    cnt = int(out.occupancy_sparse_count)
    true = int(out.occupancy_sparse_true)
    assert 0 < cnt == true <= 64
    # reconstruct the dense bitmap from the sparse 128-bit blocks
    bits = np.asarray(out.occupancy_bits)
    buf = np.zeros((-(-len(bits) // 16), 4), np.uint32)
    buf[np.asarray(out.occupancy_sparse_idx)[:cnt]] = np.asarray(
        out.occupancy_sparse_words)[:cnt].view(np.uint32)
    np.testing.assert_array_equal(
        buf.reshape(-1).view(np.uint8)[: len(bits)], bits)
    # mapping parity: sparse vs packed input give identical objects
    mp_a = MappingPipeline(cfg, eng.grid)
    mp_b = MappingPipeline(cfg, eng.grid)
    res_a = mp_a.process_sparse(
        (out.occupancy_sparse_idx, out.occupancy_sparse_words,
         out.occupancy_sparse_count, out.occupancy_sparse_true,
         out.occupancy_bits))
    res_b = mp_b.process_packed(out.occupancy_bits)
    assert len(res_a.objects) == len(res_b.objects) > 0
    ca = sorted(tuple(np.round(o.centroid, 6)) for o in res_a.objects)
    cb = sorted(tuple(np.round(o.centroid, 6)) for o in res_b.objects)
    assert ca == cb
    # overflow (cap 1 block) -> dense fallback, same result; the two
    # depth planes sit at different z-layers so the occupied cells span
    # more than one 128-cell block
    eng2 = FusionEngine(cfg.replace(occupancy_sparse_capacity=1))
    for f in range(2):
        eng2.add_depthmap(0, flat_depth(cfg, 2.0), intr, eye, eye)
        eng2.add_depthmap(1, flat_depth(cfg, 4.0), intr, tf1, tf1)
        out2 = eng2.process(now_seconds=1.0 + f * 0.1)
    assert int(out2.occupancy_sparse_true) > 1
    mp_c = MappingPipeline(cfg, eng.grid)
    res_c = mp_c.process_sparse(
        (out2.occupancy_sparse_idx, out2.occupancy_sparse_words,
         out2.occupancy_sparse_count, out2.occupancy_sparse_true,
         out2.occupancy_bits))
    mp_d = MappingPipeline(cfg, eng.grid)
    res_d = mp_d.process_packed(out2.occupancy_bits)
    cc = sorted(tuple(np.round(o.centroid, 6)) for o in res_c.objects)
    cd = sorted(tuple(np.round(o.centroid, 6)) for o in res_d.objects)
    assert cc == cd and len(cc) > 0


def test_engine_bench_config_combination_small():
    """The bench's full link-codec combination at small scale: p4
    temporal depth + hysteresis + delta-coded lidar + sparse occupancy +
    no dense u8 — pipelined engine must match the synchronous plain-link
    engine fed the same reconstructed series (every codec is lossless in
    its quantized series)."""
    from ros_gpu_depthmap_fusion_tpu.core.config import FusionConfig
    kw = dict(
        num_depth_streams=2, depth_height=24, depth_width=32,
        num_point_sequences=1,
        crop_min=(-5, -5, -5), crop_max=(5, 5, 5),
        voxel_min=(-5, -5, -5), voxel_max=(5, 5, 5),
        voxel_size=(0.5, 0.5, 0.5),
        rollbuffer_point_capacity=256, rollbuffer_seq_capacity=16,
        max_points_per_sequence=64, voxel_occupancy_lifetime=3)
    full = FusionConfig(
        depth_link_codec="dpcm_temporal", depth_codec_quant_shift=3,
        depth_codec_hysteresis=2, depth_codec_p4_budget=16,
        depth_codec_keyframe_interval=4, depth_codec_max_exceptions=2048,
        lidar_link_quant_step=0.002, lidar_link_delta=True,
        occupancy_sparse_capacity=64, emit_occupancy_u8=False, **kw)
    eng = FusionEngine(full)  # synchronous: the oracle reads encoder state
    pipe = FusionEngine(full, pipeline_depth=1)
    ref = FusionEngine(FusionConfig(
        depth_link_codec="none", lidar_link_quant_step=0.002, **kw))
    intr = PinholeIntrinsics.default_for(32, 24)
    eye = np.eye(4, dtype=np.float32)
    rng = np.random.default_rng(11)
    u = np.arange(32)[None, :] + np.zeros((24, 1))
    t = np.linspace(0, np.pi, 200)
    arc = np.stack([0.8 * np.cos(t), 0.8 * np.sin(t),
                    1 + 0.1 * np.sin(5 * t)], -1).astype(np.float32)
    outs, refs, pouts = [], [], []
    for f in range(6):
        d = (2000 + 40 * u + 6 * rng.standard_normal((2, 24, 32))) \
            .astype(np.uint16)
        d[rng.random((2, 24, 32)) < 0.01] = 0
        for i in range(2):
            eng.add_depthmap(i, d[i], intr, eye, eye)
            pipe.add_depthmap(i, d[i], intr, eye, eye)
        eng.add_point_sequence(arc, sec=1, nsec=f * 33000000, tf_move=eye)
        pipe.add_point_sequence(arc, sec=1, nsec=f * 33000000,
                                tf_move=eye)
        outs.append(eng.process(1.0 + f / 30.0))
        po = pipe.process(1.0 + f / 30.0)
        if po is not None:
            pouts.append(po)
        # oracle: codec-free engine fed the engine's own reconstructed
        # quantized series (the SYNCHRONOUS engine's encoder state is
        # the ground truth; the pipelined worker's is a frame ahead)
        dq = (eng._host_prev_q.astype(np.uint32) << 3).astype(np.uint16)
        for i in range(2):
            ref.add_depthmap(i, dq[i], intr, eye, eye)
        ref.add_point_sequence(arc, sec=1, nsec=f * 33000000, tf_move=eye)
        refs.append(ref.process(1.0 + f / 30.0))
    tail = pipe.flush()
    assert tail is not None
    pouts.append(tail)
    assert len(outs) == len(refs) == len(pouts)
    for a, b, c in zip(refs, outs, pouts):
        np.testing.assert_array_equal(np.asarray(b.occupancy_bits),
                                      np.asarray(a.occupancy_bits))
        assert int(b.raw_count) == int(a.raw_count)
        assert int(b.seq_selected_count) == int(a.seq_selected_count)
        # pipelined == synchronous, bit for bit
        np.testing.assert_array_equal(np.asarray(c.occupancy_bits),
                                      np.asarray(b.occupancy_bits))
        assert int(c.raw_count) == int(b.raw_count)
    # sparse occupancy reconstructs the final bitmap
    o = outs[-1]
    cnt = int(o.occupancy_sparse_count)
    bits = np.asarray(o.occupancy_bits)
    buf = np.zeros((-(-len(bits) // 16), 4), np.uint32)
    buf[np.asarray(o.occupancy_sparse_idx)[:cnt]] = np.asarray(
        o.occupancy_sparse_words)[:cnt].view(np.uint32)
    np.testing.assert_array_equal(
        buf.reshape(-1).view(np.uint8)[: len(bits)], bits)
