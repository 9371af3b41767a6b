"""H.264 P-frame extension (multimodal/h264.py inter section):
quarter-pel interpolation properties, MV prediction, skip coding, and
the bit-exact GOP round-trip contract."""

import numpy as np
import pytest

from sparkstreaming_spark.multimodal.h264 import (
    CBP_INTER,
    _mc_luma,
    _MotionField,
    _mvp_partition,
    _skip_mv4,
    decode_iframe,
    decode_stream,
    encode_gop,
    encoder_reconstruction,
    gop_reconstruction,
)


def test_cbp_inter_table_is_permutation():
    assert sorted(CBP_INTER) == list(range(48))
    # shortest codes go to the most probable inter CBPs (spec structure)
    assert CBP_INTER[0] == 0 and CBP_INTER[1] == 16 and CBP_INTER[12] == 47


def test_mc_integer_positions_copy_with_clamping():
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 256, (32, 48)).astype(np.int64)
    got = _mc_luma(ref, 0, 16, (8, 4))  # +2 px right, +1 px down
    assert np.array_equal(got, ref[1:17, 18:34])
    # far out-of-picture full-pel reference clamps fully to the corner
    got = _mc_luma(ref, 0, 0, (-256, -256))
    assert (got == ref[0, 0]).all()
    # partial clamp: -4 px left duplicates the first column 4 times
    got = _mc_luma(ref, 0, 0, (-16, 0))
    assert (got[:, :4] == ref[:16, :1]).all()
    assert np.array_equal(got[:, 4:], ref[:16, :12])


def test_mc_constant_reference_constant_everywhere():
    ref = np.full((32, 32), 173, np.int64)
    for fy in range(4):
        for fx in range(4):
            got = _mc_luma(ref, 8, 8, (fx, fy))
            assert (got == 173).all(), (fx, fy)


def test_mc_halfpel_exact_on_linear_ramp():
    # the 6-tap (1,-5,20,20,-5,1)/32 filter reproduces the midpoint of a
    # linear signal exactly: value 8*x -> half-pel = 8*x + 4
    x = np.arange(64, dtype=np.int64)
    ref = np.tile(8 * x, (32, 1))
    got = _mc_luma(ref, 8, 16, (2, 0))  # horizontal half-pel, interior
    exp = ref[8:24, 16:32] + 4
    assert np.array_equal(got, exp)
    refv = np.tile((8 * np.arange(32, dtype=np.int64)).reshape(-1, 1), (1, 64))
    gotv = _mc_luma(refv, 8, 16, (0, 2))
    assert np.array_equal(gotv, refv[8:24, 16:32] + 4)


def test_mc_quarter_is_average_of_neighbours():
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 256, (48, 48)).astype(np.int64)
    g = _mc_luma(ref, 16, 16, (0, 0))
    b = _mc_luma(ref, 16, 16, (2, 0))
    a = _mc_luma(ref, 16, 16, (1, 0))
    assert np.array_equal(a, (g + b + 1) >> 1)
    h = _mc_luma(ref, 16, 16, (0, 2))
    d = _mc_luma(ref, 16, 16, (0, 1))
    assert np.array_equal(d, (g + h + 1) >> 1)


def _mf_fill_mbs(mbs_h, mbs_w, mb_mvs):
    """Helper: a _MotionField with whole MBs filled ({(mby,mbx): mv})."""
    mf = _MotionField(mbs_h, mbs_w)
    for (mby, mbx), mv in mb_mvs.items():
        mf.fill(mby * 4, mbx * 4, 4, 4, mv)
    return mf


def test_mvp_median_and_single_neighbour_rules():
    mf = _mf_fill_mbs(3, 3, {
        (1, 0): (4, 0),    # A for (1,1)
        (0, 1): (8, 4),    # B for (1,1)
        (0, 2): (0, 12),   # C for (1,1)
        (0, 0): (-4, 8),
        (1, 1): (0, 0), (2, 0): (0, 0), (1, 2): (0, 0),
    })
    assert _mvp_partition(mf, 4, 4, 4) == (4, 4)  # component medians
    # row 0, only A available -> copy A
    assert _mvp_partition(mf, 4, 0, 4) == (-4, 8)
    # first MB: nothing available -> zero
    empty = _MotionField(3, 3)
    assert _mvp_partition(empty, 0, 0, 4) == (0, 0)


def test_mvp_directional_rules_for_partitions():
    # 16x8 top takes B, 16x8 bottom takes A, 8x16 left takes A,
    # 8x16 right takes C — §8.4.1.3.2
    mf = _mf_fill_mbs(2, 3, {
        (1, 0): (4, 0),    # A of MB (1,1)
        (0, 1): (8, 4),    # B of MB (1,1)
        (0, 2): (0, 12),   # C of MB (1,1)
        (0, 0): (-4, 8),
    })
    assert _mvp_partition(mf, 4, 4, 4, "16x8_top") == (8, 4)
    assert _mvp_partition(mf, 4, 4, 4, "16x8_bot") == (4, 0)
    assert _mvp_partition(mf, 4, 4, 2, "8x16_left") == (4, 0)
    # right 8x16 half at x4=6: its C (above-right) is block (3, 8),
    # inside the above-right MB
    assert _mvp_partition(mf, 6, 4, 2, "8x16_right") == (0, 12)
    # within-MB neighbors: the lower 16x8's A is the left MB at the
    # partition row; its B is the UPPER partition of the same MB (the
    # directional A rule picks the left MB here)
    mf2 = _MotionField(2, 2)
    mf2.fill(0, 0, 4, 8, (0, 0))       # top MB row
    mf2.fill(4, 0, 4, 4, (4, 4))       # left MB
    mf2.fill(4, 4, 2, 4, (12, -8))     # upper 16x8 of MB (1,1)
    assert _mvp_partition(mf2, 4, 6, 4, "16x8_bot") == (4, 4)
    # and the upper partition's directional B rule sees the top MB
    assert _mvp_partition(mf2, 4, 4, 4, "16x8_top") == (0, 0)


def test_skip_mv_zero_conditions():
    mf = _MotionField(2, 2)
    assert _skip_mv4(mf, 0, 1) == (0, 0)  # left edge
    assert _skip_mv4(mf, 1, 0) == (0, 0)  # top edge
    mf.fill(0, 0, 4, 4, (0, 0))
    mf.fill(0, 4, 4, 4, (0, 0))
    mf.fill(4, 0, 4, 4, (4, 4))
    # zero-MV top neighbour forces zero
    assert _skip_mv4(mf, 1, 1) == (0, 0)
    mf.fill(0, 4, 4, 4, (4, 0))
    assert _skip_mv4(mf, 1, 1) != (0, 0)


def test_gop_roundtrip_bit_exact_across_qp():
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    frames = [base,
              np.roll(base, 3, axis=1),
              np.clip(base.astype(int) + 9, 0, 255).astype(np.uint8),
              np.roll(base, -2, axis=0)]
    for qp in (8, 20, 34, 46):
        out = decode_stream(encode_gop(frames, qp=qp))
        recons, _ = gop_reconstruction(frames, qp=qp)
        assert out["frame_types"] == ["I", "P", "P", "P"]
        for k in range(4):
            assert np.array_equal(out["frames"][k], recons[k]), (qp, k)


def test_static_scene_is_all_skip_and_tiny():
    # flat 128 encodes losslessly intra (DC prediction starts at 128),
    # so the P frames see a zero residual at the zero skip-MV
    base = np.full((32, 32), 128, np.uint8)
    frames = [base, base, base]
    stream = encode_gop(frames, qp=20)
    _, stats = gop_reconstruction(frames, qp=20)
    assert all(s["n_skip"] == 4 and s["n_coded"] == 0 for s in stats)
    out = decode_stream(stream)
    # skipped P frames reproduce the I reconstruction exactly
    assert np.array_equal(out["frames"][1], out["frames"][0])
    assert np.array_equal(out["frames"][2], out["frames"][0])
    # each all-skip slice is just a header + one skip run
    solo = len(encode_gop([base], qp=20))
    assert len(stream) - solo < 20


def test_lossy_static_scene_converges_to_skip():
    # with a lossy I frame the first P codes the recon error once, then
    # the reference reaches a fixpoint and later frames are all skip
    rng = np.random.default_rng(4)
    base = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    _, stats = gop_reconstruction([base, base, base], qp=20)
    assert stats[1]["n_skip"] == 4 and stats[1]["n_coded"] == 0


def test_integer_shift_found_by_search_with_zero_residual():
    # smooth scene shifted by exactly 2 px: after the first coded MB the
    # median predictor locks on and the rest skip with mv=(8,0)
    # textured content makes the best match unique (a plain gradient is
    # ambiguous: every MV along the iso-value line ties on SAD)
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    shifted = np.empty_like(base)
    shifted[:, 2:] = base[:, :-2]
    shifted[:, :2] = base[:, :1]
    frames = [base, shifted]
    out = decode_stream(encode_gop(frames, qp=20))
    recons, stats = gop_reconstruction(frames, qp=20)
    assert np.array_equal(out["frames"][1], recons[1])
    # content moved +2 px right -> the MV points back to the source;
    # interior MBs must all find it (edge-column MBs may clamp)
    found = [(mv[2], mv[3]) for mv in stats[0]["mvs"]]
    assert found.count((-8, 0)) >= 3


def test_halfpel_scene_uses_subpel_motion():
    # frame2 ~ frame1 shifted by half a pixel (average of 0- and 1-px
    # shifts of a smooth ramp): the search must beat full-pel with a
    # frac-2 MV somewhere, and the round-trip stays bit-exact
    j = np.arange(64).reshape(1, -1)
    base = np.tile((4 * j) % 256, (32, 1)).astype(np.uint8)
    half = ((base.astype(int) + np.roll(base, 1, axis=1).astype(int) + 1)
            // 2).astype(np.uint8)
    half[:, 0] = base[:, 0]
    frames = [base, half]
    out = decode_stream(encode_gop(frames, qp=12))
    recons, stats = gop_reconstruction(frames, qp=12)
    assert np.array_equal(out["frames"][1], recons[1])
    assert stats[0]["n_subpel"] > 0


def test_decode_iframe_still_reads_first_frame_of_gop():
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    stream = encode_gop([base, np.roll(base, 1, axis=0)], qp=20)
    out = decode_iframe(stream)
    assert np.array_equal(out["luma"], encoder_reconstruction(base, qp=20))


def test_p_slice_without_idr_raises():
    rng = np.random.default_rng(6)
    base = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    stream = encode_gop([base, base], qp=20)
    # drop the IDR NAL (type 5): split on 4-byte start codes
    parts = stream.split(b"\x00\x00\x00\x01")
    kept = [p for p in parts if p and (p[0] & 0x1F) != 5]
    broken = b"".join(b"\x00\x00\x00\x01" + p for p in kept)
    with pytest.raises(ValueError, match="P slice before"):
        decode_stream(broken)


def test_gop_guards():
    with pytest.raises(ValueError, match="empty"):
        encode_gop([])
    a = np.zeros((16, 16), np.uint8)
    b = np.zeros((32, 16), np.uint8)
    with pytest.raises(ValueError, match="dimensions"):
        encode_gop([a, b])


def test_edge_macroblocks_with_outward_motion_roundtrip():
    # content moving INTO the frame forces edge MBs to reference
    # clamped out-of-picture samples; the contract must still hold
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    frames = [base, np.roll(base, 5, axis=1), np.roll(base, 9, axis=1)]
    out = decode_stream(encode_gop(frames, qp=24, search_range=6))
    recons, _ = gop_reconstruction(frames, qp=24, search_range=6)
    for k in range(3):
        assert np.array_equal(out["frames"][k], recons[k])


def test_non_reference_p_slice_parses_and_does_not_become_ref():
    # ref_idc=0 P slices carry NO dec_ref_pic_marking bit (§7.3.3) and
    # must not replace the prediction reference for later slices
    from sparkstreaming_spark.multimodal.h264 import (
        _build_pps_rbsp,
        _build_sps_rbsp,
        _encode_pslice,
        _encode_slice,
        _nal,
    )

    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    b = np.roll(a, 2, axis=1)
    flat = np.full((16, 16), 128, np.uint8)
    rec_i, i_payload = _encode_slice(a, flat, flat, 20)
    ref = tuple(p.astype(np.int64) for p in rec_i)
    byuv = (b, flat, flat)
    # non-ref P coding frame b, then a ref P coding frame b AGAIN but
    # encoded against rec_i (what a conformant decoder must use as ref)
    rec_p1, p1, _ = _encode_pslice(ref, byuv, 20, 1, ref_slice=False)
    rec_p2, p2, _ = _encode_pslice(ref, byuv, 20, 2)
    stream = (_nal(7, _build_sps_rbsp(32, 32)) + _nal(8, _build_pps_rbsp())
              + _nal(5, i_payload) + _nal(1, p1, ref_idc=0)
              + _nal(1, p2, ref_idc=2))
    out = decode_stream(stream)
    assert out["frame_types"] == ["I", "P", "P"]
    assert np.array_equal(out["frames"][1], rec_p1[0])
    # if the decoder had (wrongly) used the non-ref frame as reference,
    # frame 2 would desync from rec_p2
    assert np.array_equal(out["frames"][2], rec_p2[0])


def test_second_identical_sequence_concatenates():
    rng = np.random.default_rng(10)
    a = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    s1 = encode_gop([a, np.roll(a, 1, axis=0)], qp=20)
    s2 = encode_gop([np.roll(a, 3, axis=1), a], qp=20)
    out = decode_stream(s1 + s2)
    assert out["frame_types"] == ["I", "P", "I", "P"]


def test_second_differing_sps_raises():
    a = np.zeros((32, 32), np.uint8)
    b = np.zeros((16, 48), np.uint8)
    with pytest.raises(NotImplementedError, match="differing SPS"):
        decode_stream(encode_gop([a], qp=20) + encode_gop([b], qp=20))


def test_directional_mode_without_samples_raises_not_silently_dc():
    # craft an I slice whose FIRST 4x4 block (no top/left neighbors)
    # codes an explicit rem=2: with DC predicted, rem 2 decodes to
    # diagonal-down-left (§8.3.1.1), which needs the unavailable top
    # row — the decoder must raise on the malformed stream, never
    # quietly substitute DC
    from sparkstreaming_spark.multimodal.h264 import (
        BitWriter,
        _build_pps_rbsp,
        _build_sps_rbsp,
        _nal,
    )

    w = BitWriter()
    w.ue(0)   # first_mb_in_slice
    w.ue(7)   # slice_type I
    w.ue(0)   # pps id
    w.u(0, 4)  # frame_num
    w.ue(0)   # idr_pic_id
    w.u(0, 2)  # dec_ref_pic_marking
    w.se(20 - 26)
    w.ue(1)   # deblocking off
    w.ue(0)   # mb_type I_4x4
    w.u(0, 1)  # prev_intra4x4_pred_mode_flag = 0 -> explicit
    w.u(2, 3)  # rem_intra4x4_pred_mode = 2 -> mode 3 (DDL, needs top)
    for _ in range(15):
        w.u(1, 1)  # remaining blocks: predicted mode
    w.ue(0)   # intra_chroma_pred_mode DC
    w.ue(3)   # CBP codeNum 3 -> cbp 0 (no residuals follow)
    w.se(0)   # mb_qp_delta
    stream = (_nal(7, _build_sps_rbsp(16, 16)) + _nal(8, _build_pps_rbsp())
              + _nal(5, w.rbsp()))
    with pytest.raises(ValueError, match="unavailable"):
        decode_stream(stream)
    with pytest.raises(ValueError, match="unavailable"):
        decode_iframe(stream)


def test_b_gop_roundtrip_bit_exact_across_qp():
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_b,
        gop_b_reconstruction,
    )

    rng = np.random.default_rng(21)
    base = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    frames = [np.roll(base, k, axis=1) for k in range(6)]
    for qp in (10, 24, 40):
        out = decode_stream(encode_gop_b(frames, qp=qp))
        recons, stats = gop_b_reconstruction(frames, qp=qp)
        assert out["frame_types"] == ["I", "P", "B", "P", "B", "P"]
        for k in range(6):
            assert np.array_equal(out["frames"][k], recons[k]), (qp, k)
        assert any(s["type"] == "B" for s in stats)


def test_b_frame_prefers_l1_when_older_ref_matches():
    # scene: A -> big pan -> back to A. The B frame (index 2) sees
    # refs [P(panned), I(A)]; its content is A, so L1 must win
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_b,
        gop_b_reconstruction,
    )

    rng = np.random.default_rng(22)
    a = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    frames = [a, np.roll(a, 11, axis=0), a, a]
    out = decode_stream(encode_gop_b(frames, qp=20))
    recons, stats = gop_b_reconstruction(frames, qp=20)
    b_stats = next(s for s in stats if s["type"] == "B")
    assert b_stats["n_l1"] > b_stats["n_l0"]
    for k in range(4):
        assert np.array_equal(out["frames"][k], recons[k])


def test_b_frame_uses_bi_for_blended_content():
    # the B frame is the average of its two references SHIFTED by 3
    # columns: single-list prediction can't model the average, and
    # spatial direct can't model the first MB (no neighbors → zero-MV
    # bi, wrong by the shift) — explicit B_Bi with searched MVs must
    # appear. (The unshifted blend is now covered by B_Skip/B_Direct:
    # directZeroPrediction IS zero-MV bi-prediction.)
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_b,
        gop_b_reconstruction,
    )

    rng = np.random.default_rng(23)
    a = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    b = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    blend = ((a.astype(int) + b.astype(int) + 1) // 2).astype(np.uint8)
    frames = [a, b, np.roll(blend, 3, axis=1), b]
    out = decode_stream(encode_gop_b(frames, qp=16))
    recons, stats = gop_b_reconstruction(frames, qp=16)
    b_stats = next(s for s in stats if s["type"] == "B")
    # explicit bi-prediction must appear — as B_Bi_16x16 or (since the
    # round-8 Table 7-14 completion) a Bi two-partition mode
    assert b_stats["n_bi"] + b_stats["n_bi_part"] > 0
    for k in range(4):
        assert np.array_equal(out["frames"][k], recons[k])


def test_p_partitions_fire_on_split_motion_and_roundtrip():
    # top half static / bottom half panning cuts through MB row 1 →
    # P_L0_L0_16x8 must win there; a mid-MB vertical split → 8x16.
    # Both must round-trip bit-exactly (partition MVP rules §8.4.1.3.2
    # + the 4x4-granular neighbor derivation are all load-bearing).
    from sparkstreaming_spark.multimodal.h264 import (
        decode_stream,
        encode_gop,
        gop_reconstruction,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    f2 = base.copy()
    f2[24:, 2:] = base[24:, :-2]   # horizontal split at y=24 (mid-MB)
    f2[24:, :2] = base[24:, :1]
    f3 = f2.copy()
    f3[2:, 40:] = f2[:-2, 40:]     # vertical split at x=40 (mid-MB)
    f3[:2, 40:] = f2[:1, 40:]
    frames = [base, f2, f3]
    out = decode_stream(encode_gop(frames, qp=18))
    recons, stats = gop_reconstruction(frames, qp=18)
    assert stats[0]["n_16x8"] > 0
    assert stats[1]["n_8x16"] > 0
    for k in range(3):
        assert np.array_equal(out["frames"][k], recons[k])


def test_p8x8_fires_on_quadrant_divergent_motion():
    # four 8x8 quadrants of one MB moving in four different directions:
    # no 16x16/16x8/8x16 split can carry that — P_8x8 (sub_mb_type
    # P_L0_8x8 x4) must win, with per-quadrant median MVP, and the
    # stream must round-trip bit-exactly
    from sparkstreaming_spark.multimodal.h264 import (
        decode_stream,
        encode_gop,
        gop_reconstruction,
    )

    rng = np.random.default_rng(13)
    base = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    f2 = base.copy()
    f2[0:8, 0:8] = np.roll(base[0:8, 0:8], 2, axis=1)
    f2[0:8, 8:16] = np.roll(base[0:8, 8:16], -2, axis=1)
    f2[8:16, 0:8] = np.roll(base[8:16, 0:8], 2, axis=0)
    f2[8:16, 8:16] = np.roll(base[8:16, 8:16], -2, axis=0)
    frames = [base, f2]
    out = decode_stream(encode_gop(frames, qp=16))
    recons, stats = gop_reconstruction(frames, qp=16)
    assert stats[0]["n_8x8"] >= 1
    for k in range(2):
        assert np.array_equal(out["frames"][k], recons[k])


def test_b_gop_over_partitioned_references_roundtrips():
    # split-motion P references give the B spatial-direct derivation a
    # NON-uniform colocated motion field — the per-quadrant colZero
    # corners (direct_8x8_inference) and the 4x4-granular DPB records
    # must agree between encoder and decoder bit-exactly.
    from sparkstreaming_spark.multimodal.h264 import (
        decode_stream,
        encode_gop_b,
        gop_b_reconstruction,
    )

    keys = ("n_skip", "n_direct", "n_l0", "n_l1", "n_bi",
            "n_l0_part", "n_l1_part", "n_mixed_part", "n_bi_part",
            "n_b8x8", "n_b8_split")
    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    frames, cur = [base], base
    for _ in range(4):
        nxt = cur.copy()
        nxt[24:, 2:] = cur[24:, :-2]
        nxt[24:, :2] = cur[24:, :1]
        frames.append(nxt)
        cur = nxt
    out = decode_stream(encode_gop_b(frames, qp=18))
    recons, stats = gop_b_reconstruction(frames, qp=18)
    p_stats = [s for s in stats if s["type"] == "P"]
    assert any(s["n_16x8"] > 0 for s in p_stats)  # refs ARE partitioned
    assert out["b_mode_counts"] == [
        {k: s[k] for k in keys} for s in stats if s["type"] == "B"
    ]
    for k in range(len(frames)):
        assert np.array_equal(out["frames"][k], recons[k])


def test_b_single_list_partitions_fire_and_roundtrip():
    # the B frames' content splits mid-MB (rows 8-23 panning, the rest
    # static): a single 16x16 MV can't carry both halves, so the
    # single-list two-partition modes (B_L0_L0_16x8, Table 7-14 type 4)
    # must win somewhere, with the §7.3.5.1 one-list MVD layout and
    # per-partition directional MVP — and stay bit-exact
    from sparkstreaming_spark.multimodal.h264 import (
        decode_stream,
        encode_gop_b,
        gop_b_reconstruction,
    )

    keys = ("n_skip", "n_direct", "n_l0", "n_l1", "n_bi",
            "n_l0_part", "n_l1_part", "n_mixed_part", "n_bi_part",
            "n_b8x8", "n_b8_split")
    rng = np.random.default_rng(21)
    base = rng.integers(0, 256, (32, 32)).astype(np.uint8)

    def shift_split(f, k):
        g = f.copy()
        g[8:24, k:] = f[8:24, :-k]
        g[8:24, :k] = f[8:24, :1]
        return g

    f1 = shift_split(base, 2)
    f2 = shift_split(f1, 2)
    f3 = shift_split(f2, 2)
    frames = [base, f1, f2, f3]
    out = decode_stream(encode_gop_b(frames, qp=16))
    recons, stats = gop_b_reconstruction(frames, qp=16)
    b_tot = {k: sum(s[k] for s in stats if s["type"] == "B") for k in keys}
    assert b_tot["n_l0_part"] + b_tot["n_l1_part"] > 0
    assert out["b_mode_counts"] == [
        {k: s[k] for k in keys} for s in stats if s["type"] == "B"
    ]
    for k in range(len(frames)):
        assert np.array_equal(out["frames"][k], recons[k])


def test_b_skip_and_direct_on_static_and_panning_content():
    # static B content → colZeroFlag zeroes the direct MV → residual-free
    # direct prediction → B_Skip; panning content → neighbors' searched
    # MVs feed the spatial-direct median → B_Direct/B_Skip carry the pan
    # without writing MVDs. Both must round-trip bit-exactly and the
    # decoder's mode histogram must equal the encoder's.
    from sparkstreaming_spark.multimodal.h264 import (
        decode_stream,
        encode_gop_b,
        gop_b_reconstruction,
    )

    keys = ("n_skip", "n_direct", "n_l0", "n_l1", "n_bi",
            "n_l0_part", "n_l1_part", "n_mixed_part", "n_bi_part",
            "n_b8x8", "n_b8_split")
    # static: every frame identical
    rng = np.random.default_rng(31)
    a = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    frames = [a, a, a, a]
    out = decode_stream(encode_gop_b(frames, qp=20))
    recons, stats = gop_b_reconstruction(frames, qp=20)
    b_stats = next(s for s in stats if s["type"] == "B")
    assert b_stats["n_skip"] == 6  # every MB of the 32x48 B frame skips
    assert out["b_mode_counts"] == [
        {k: s[k] for k in keys} for s in stats if s["type"] == "B"
    ]
    for k in range(4):
        assert np.array_equal(out["frames"][k], recons[k])

    # smooth pan: direct inherits the pan MV from the neighbors/median
    i = np.arange(48).reshape(-1, 1)
    j = np.arange(64).reshape(1, -1)
    img = np.minimum(3 * i + 2 * j, 255).astype(np.uint8)
    frames = [np.roll(img, k, axis=1) for k in range(5)]
    out = decode_stream(encode_gop_b(frames, qp=18))
    recons, stats = gop_b_reconstruction(frames, qp=18)
    b_tot = {
        k: sum(s[k] for s in stats if s["type"] == "B") for k in keys
    }
    assert b_tot["n_skip"] + b_tot["n_direct"] > 0
    assert out["b_mode_counts"] == [
        {k: s[k] for k in keys} for s in stats if s["type"] == "B"
    ]
    for k in range(5):
        assert np.array_equal(out["frames"][k], recons[k])


def test_b_slices_never_become_references():
    # decoding must reference around B frames: P at index 3 references
    # P at index 1, not the B between them — a DPB bug desyncs it
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_b,
        gop_b_reconstruction,
    )

    rng = np.random.default_rng(24)
    base = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    frames = [base, np.roll(base, 1, axis=1),
              np.roll(base, 7, axis=0),  # B: very different content
              np.roll(base, 2, axis=1)]
    out = decode_stream(encode_gop_b(frames, qp=20))
    recons, _ = gop_b_reconstruction(frames, qp=20)
    assert np.array_equal(out["frames"][3], recons[3])


def test_b_gop_guards():
    from sparkstreaming_spark.multimodal.h264 import encode_gop_b

    a = np.zeros((16, 16), np.uint8)
    with pytest.raises(ValueError, match="at least 3"):
        encode_gop_b([a, a])
    # B slice before two refs: drop the first P NAL (second type-1 NAL
    # is the B; the first is the P) -> ValueError
    frames = [a, np.roll(a, 1, axis=0), a, a]
    rng = np.random.default_rng(25)
    base = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    frames = [base, np.roll(base, 1, axis=0), base, base]
    stream = encode_gop_b(frames, qp=20)
    parts = stream.split(b"\x00\x00\x00\x01")
    kept, dropped_p = [], False
    for p in parts:
        if p and (p[0] & 0x1F) == 1 and not dropped_p:
            dropped_p = True
            continue
        if p:
            kept.append(p)
    broken = b"".join(b"\x00\x00\x00\x01" + p for p in kept)
    with pytest.raises(ValueError, match="two decoded reference"):
        decode_stream(broken)


def test_b_gop_sps_is_main_profile_with_two_refs():
    from sparkstreaming_spark.multimodal.h264 import encode_gop_b
    from sparkstreaming_spark.multimodal.mediameta import h264_probe

    a = np.zeros((32, 48), np.uint8)
    frames = [a, a, a]
    p = h264_probe(encode_gop_b(frames, qp=20))
    assert p["profile_idc"] == 77
    assert (p["width"], p["height"]) == (48, 32)


# ---------------------------------------------------------------------------
# inter chroma residual (round 8)


def _color_motion_frames(n, h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    return [
        np.stack([
            (xx * 2 + yy + 4 * t) % 256,
            (128 + 50 * np.sin((xx + 2 * t) / 9)
             + 30 * np.cos((yy + t) / 6)).astype(int) % 256,
            (xx + 2 * yy + 6 * t) % 256,
        ], axis=-1).astype(np.uint8)
        for t in range(n)
    ]


def test_p_gop_chroma_roundtrip_bit_exact():
    from sparkstreaming_spark.multimodal.h264 import gop_reconstruction_yuv

    frames = _color_motion_frames(4)
    for qp in (12, 24, 36):
        out = decode_stream(encode_gop(frames, qp=qp))
        recons, _ = gop_reconstruction_yuv(frames, qp=qp)
        for i, (ry, rcb, rcr) in enumerate(recons):
            assert np.array_equal(out["frames"][i], ry), (qp, i)
            assert np.array_equal(out["frames_cb"][i], rcb), (qp, i)
            assert np.array_equal(out["frames_cr"][i], rcr), (qp, i)


def test_b_gop_chroma_roundtrip_bit_exact():
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_b,
        gop_b_reconstruction_yuv,
    )

    frames = _color_motion_frames(6)
    for qp in (14, 26, 38):
        out = decode_stream(encode_gop_b(frames, qp=qp))
        recons, _ = gop_b_reconstruction_yuv(frames, qp=qp)
        assert out["frame_types"] == ["I", "P", "B", "P", "B", "P"]
        for i, (ry, rcb, rcr) in enumerate(recons):
            assert np.array_equal(out["frames"][i], ry), (qp, i)
            assert np.array_equal(out["frames_cb"][i], rcb), (qp, i)
            assert np.array_equal(out["frames_cr"][i], rcr), (qp, i)


def test_pskip_requires_zero_chroma_residual():
    # two frames with IDENTICAL luma but a chroma change: the encoder
    # must not emit P_Skip (which would freeze chroma) — the changed
    # chroma must be coded and reconstructed
    from sparkstreaming_spark.multimodal.h264 import gop_reconstruction_yuv

    h, w = 32, 32
    base = np.full((h, w, 3), 128, np.uint8)
    f2 = base.copy()
    # luma of (r,g,b)=(c,c,c) is c — shift chroma only by moving
    # between two colors with (near-)equal luma: swap red/blue heavy
    # pixels whose luma matches
    f2[:, :, 0] = 180
    f2[:, :, 2] = 21   # luma(180,128,21) ~ luma(128,128,128)=128
    frames = [base, f2]
    out = decode_stream(encode_gop(frames, qp=20))
    recons, stats = gop_reconstruction_yuv(frames, qp=20)
    # chroma actually moved in the reconstruction
    assert abs(int(out["frames_cr"][1][8, 8]) - 128) > 10
    assert np.array_equal(out["frames_cb"][1], recons[1][1])
    assert np.array_equal(out["frames_cr"][1], recons[1][2])


def test_static_scene_still_skips_with_chroma():
    # a truly static color scene must still collapse to P_Skip rows
    from sparkstreaming_spark.multimodal.h264 import gop_reconstruction_yuv

    f = _color_motion_frames(1)[0]
    frames = [f, f.copy(), f.copy()]
    recons, stats = gop_reconstruction_yuv(frames, qp=28)
    assert all(s["n_skip"] == 12 and s["n_coded"] == 0 for s in stats)
    out = decode_stream(encode_gop(frames, qp=28))
    for i in range(3):
        assert np.array_equal(out["frames_cb"][i], recons[i][1])


# ---------------------------------------------------------------------------
# temporal direct + display-reordered GOP (round 8)


def test_dist_scale_factor_matches_spec_cases():
    from sparkstreaming_spark.multimodal.h264 import _dist_scale_factor

    # B halfway between refs: tb=2, td=4 -> tx=4096, DSF=128 (mv/2)
    assert _dist_scale_factor(2, 0, 4) == 128
    # B a quarter of the way: tb=1, td=4 -> DSF=64 (mv/4)
    assert _dist_scale_factor(1, 0, 4) == 64
    # degenerate distance raises
    import pytest as _pytest
    with _pytest.raises(ValueError):
        _dist_scale_factor(2, 0, 0)


def test_poc_lsb_wraparound():
    from sparkstreaming_spark.multimodal.h264 import _poc_from_lsb

    # §8.2.1.1: lsb wrapped past max -> msb steps up
    assert _poc_from_lsb(2, 0, 250, 256) == 258
    # lsb jumped back (reordering) without wrap -> same msb
    assert _poc_from_lsb(250, 0, 252, 256) == 250
    # negative direction wrap
    assert _poc_from_lsb(250, 256, 2, 256) == 250


def test_temporal_gop_roundtrip_and_poc_order():
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_temporal,
        gop_temporal_reconstruction_yuv,
    )

    frames = _color_motion_frames(6)
    for qp in (14, 26, 38):
        out = decode_stream(encode_gop_temporal(frames, qp=qp))
        recons, stats = gop_temporal_reconstruction_yuv(frames, qp=qp)
        # decode order I P B P B P; POCs identify the display order
        assert out["frame_types"] == ["I", "P", "B", "P", "B", "P"]
        assert out["poc"] == [0, 4, 2, 8, 6, 10]
        for i, (ry, rcb, rcr) in enumerate(recons):
            assert np.array_equal(out["frames"][i], ry), (qp, i)
            assert np.array_equal(out["frames_cb"][i], rcb), (qp, i)
            assert np.array_equal(out["frames_cr"][i], rcr), (qp, i)


def test_temporal_direct_mv_scaling_math():
    # per-quadrant mvCol from the colocated CORNER blocks, halved by
    # DSF=128 with the spec rounding, mvL1 = mvL0 - mvCol; intra
    # colocated quadrants contribute zero motion
    from sparkstreaming_spark.multimodal.h264 import _temporal_direct_mb

    mv4 = np.zeros((8, 8, 2), dtype=np.int64)
    intra4 = np.zeros((8, 8), dtype=bool)
    # MB (1, 1): quadrant corners at block coords (4|7, 4|7)
    mv4[4, 4] = (16, 8)    # q00 -> mvL0 (8, 4), mvL1 (-8, -4)
    mv4[4, 7] = (5, -3)    # q01 -> ((128*5+128)>>8, (128*-3+128)>>8)
    mv4[7, 4] = (-16, 2)   # q10
    intra4[7, 7] = True    # q11 intra -> zero
    mv4[7, 7] = (99, 99)   # must be ignored for the intra quadrant
    m0q, m1q = _temporal_direct_mb(mv4, intra4, 1, 1, 128)
    assert m0q[0][0] == (8, 4) and m1q[0][0] == (-8, -4)
    assert m0q[0][1] == ((128 * 5 + 128) >> 8, (128 * -3 + 128) >> 8)
    assert m1q[0][1] == (m0q[0][1][0] - 5, m0q[0][1][1] + 3)
    assert m0q[1][0] == (-8, 1) and m1q[1][0] == (8, -1)
    assert m0q[1][1] == (0, 0) and m1q[1][1] == (0, 0)


def test_temporal_direct_wins_on_constant_pan():
    # a constant 2 px/frame pan: the P's motion (4 px over 2 frames)
    # scaled by DSF=128 lands exactly on the B's true 2 px offset, so
    # temporal direct/skip is used on real MBs (lossy-recon noise may
    # make explicit L0 marginally cheaper on some — direct just has to
    # actually fire, proving the scaled prediction is competitive)
    from sparkstreaming_spark.multimodal.h264 import encode_gop_temporal

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    frames = []
    for t in range(4):
        f = np.empty_like(base)
        s = 2 * t
        f[:, s:] = base[:, : base.shape[1] - s] if s else base
        if s:
            f[:, :s] = base[:, :1]
        frames.append(f)
    out = decode_stream(encode_gop_temporal(frames, qp=24, search_range=6))
    assert out["frame_types"] == ["I", "P", "B", "P"]
    bm = out["b_mode_counts"][0]
    assert bm["n_skip"] + bm["n_direct"] >= 2, bm


def test_temporal_sps_agrees_with_mediameta_parser():
    # the poc_type-0 Main-profile SPS must parse identically in the
    # independent mediameta SPS reader (cross-implementation check)
    from sparkstreaming_spark.multimodal.h264 import encode_gop_temporal
    from sparkstreaming_spark.multimodal.mediameta import h264_probe

    frames = _color_motion_frames(3, h=32, w=48)
    p = h264_probe(bytes(encode_gop_temporal(frames, qp=24)))
    assert (p["width"], p["height"]) == (48, 32)
    assert p["profile_idc"] == 77 and p["n_idr"] == 1


def test_spatial_streams_still_decode_after_poc_plumbing():
    # the low-delay spatial-direct GOP (poc_type 2) must be unaffected
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_b,
        gop_b_reconstruction,
    )

    frames = _color_motion_frames(5)
    out = decode_stream(encode_gop_b(frames, qp=24))
    recons, _ = gop_b_reconstruction(frames, qp=24)
    assert out["poc"] == [None] * 5
    for i in range(5):
        assert np.array_equal(out["frames"][i], recons[i])


# ---------------------------------------------------------------------------
# explicit weighted prediction (round 8)


def _fade_frames(n, h=48, w=64, step=0.12):
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([
        (xx * 2 + yy) % 200 + 30,
        (100 + 40 * np.sin(xx / 9) + 30 * np.cos(yy / 6)).astype(int),
        (xx + 2 * yy) % 180 + 40,
    ], axis=-1).astype(np.uint8)
    return [np.clip(base.astype(np.float64) * (1.0 - step * t),
                    0, 255).astype(np.uint8) for t in range(n)]


def test_weighted_gop_roundtrip_bit_exact():
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_weighted,
        gop_weighted_reconstruction_yuv,
    )

    frames = _fade_frames(4)
    for qp in (16, 28, 40):
        out = decode_stream(encode_gop_weighted(frames, qp=qp))
        recons, stats = gop_weighted_reconstruction_yuv(frames, qp=qp)
        for i, (ry, rcb, rcr) in enumerate(recons):
            assert np.array_equal(out["frames"][i], ry), (qp, i)
            assert np.array_equal(out["frames_cb"][i], rcb), (qp, i)
            assert np.array_equal(out["frames_cr"][i], rcr), (qp, i)
        # the fade model must actually engage (scaled luma weight)
        assert all(s["wp"]["y"][0] != 32 for s in stats)


def test_weighted_prediction_collapses_fades():
    # a pure global fade: with explicit WP the P frames mostly skip
    # and the stream shrinks vs the unweighted encoder; without WP no
    # MB can skip (every prediction is off by the fade factor)
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_weighted,
        gop_weighted_reconstruction_yuv,
    )

    frames = _fade_frames(4)
    _, stats_w = gop_weighted_reconstruction_yuv(frames, qp=28)
    n_skip_w = sum(s["n_skip"] for s in stats_w)
    _, stats_u = gop_reconstruction(frames, qp=28)
    n_skip_u = sum(s["n_skip"] for s in stats_u)
    assert n_skip_u == 0
    assert n_skip_w >= 24, n_skip_w  # 36 measured; 3 frames x 12 MBs
    assert (len(encode_gop_weighted(frames, qp=28))
            < len(encode_gop(frames, qp=28)) * 0.6)


def test_identity_weights_match_unweighted_reconstruction():
    # w = 2^logWD, o = 0 is the exact identity: (p*32+16)>>5 == p, so
    # an identity-weighted P slice must reconstruct exactly like the
    # unweighted encoder given the same motion decisions
    from sparkstreaming_spark.multimodal.h264 import (
        _build_pps_rbsp,
        _build_sps_rbsp,
        _encode_pslice,
        _encode_slice,
        _nal,
    )

    rng = np.random.default_rng(21)
    a = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    flat = np.full((16, 16), 128, np.uint8)
    rec_i, i_payload = _encode_slice(a, flat, flat, 20)
    ref = tuple(p.astype(np.int64) for p in rec_i)
    byuv = (np.roll(a, 2, axis=1), flat, flat)
    ident = {"logwd_y": 5, "logwd_c": 5, "y": (32, 0),
             "cb": (32, 0), "cr": (32, 0)}
    rec_w, pw, _ = _encode_pslice(ref, byuv, 20, 1, wp=ident)
    rec_p, pp, _ = _encode_pslice(ref, byuv, 20, 1)
    assert np.array_equal(rec_w[0], rec_p[0])
    assert np.array_equal(rec_w[1], rec_p[1])
    # and the weighted stream decodes to the same frames
    stream = (_nal(7, _build_sps_rbsp(32, 32))
              + _nal(8, _build_pps_rbsp(weighted_pred=True))
              + _nal(5, i_payload) + _nal(1, pw, ref_idc=2))
    out = decode_stream(stream)
    assert np.array_equal(out["frames"][1], rec_w[0])
    assert np.array_equal(out["frames_cb"][1], rec_w[1])


# ---------------------------------------------------------------------------
# mixed-list / Bi two-partition B modes (Table 7-14 types 8-21, round 8)


def test_mixed_list_b_partitions_roundtrip_and_fire():
    # opposite motion per half: in a reordered GOP the B sits between
    # its references, so the top half tracks one list and the bottom
    # the other -> mixed-list types 8-11 fire; roundtrip stays exact
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_temporal,
        gop_temporal_reconstruction_yuv,
    )

    rng = np.random.default_rng(2)
    h, w = 48, 64
    base = np.stack([rng.integers(0, 256, (h, w)) for _ in range(3)],
                    axis=-1).astype(np.uint8)

    def frame(t):
        f = np.empty_like(base)
        f[: h // 2] = np.roll(base[: h // 2], 2 * t, axis=1)
        f[h // 2 :] = np.roll(base[h // 2 :], -2 * t, axis=1)
        return f

    frames = [frame(t) for t in range(6)]
    out = decode_stream(encode_gop_temporal(frames, qp=20, search_range=6))
    recons, _ = gop_temporal_reconstruction_yuv(frames, qp=20,
                                                search_range=6)
    for i, (ry, rcb, rcr) in enumerate(recons):
        assert np.array_equal(out["frames"][i], ry), i
        assert np.array_equal(out["frames_cb"][i], rcb), i
    total_mixed = sum(c["n_mixed_part"] for c in out["b_mode_counts"])
    assert total_mixed >= 2, out["b_mode_counts"]


def test_bi_partition_fires_on_blended_half():
    # display frame 1's top half is the pixel average of frames 0 and
    # 2, its bottom half tracks frame 0 exactly: the encoder should
    # pick a Bi top / L0 bottom 16x8 split (type 16 family) and the
    # decoder must reproduce it bit-exactly
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_temporal,
        gop_temporal_reconstruction_yuv,
    )

    rng = np.random.default_rng(9)
    h, w = 32, 48
    f0 = rng.integers(0, 256, (h, w)).astype(np.uint8)
    f2 = rng.integers(0, 256, (h, w)).astype(np.uint8)
    f1 = f0.copy()
    f1[: h // 2] = ((f0[: h // 2].astype(int)
                     + f2[: h // 2].astype(int) + 1) // 2)
    frames = [f0, f1, f2]
    out = decode_stream(encode_gop_temporal(frames, qp=16,
                                            search_range=2))
    recons, _ = gop_temporal_reconstruction_yuv(frames, qp=16,
                                                search_range=2)
    assert out["frame_types"] == ["I", "P", "B"]
    for i in range(3):
        assert np.array_equal(out["frames"][i], recons[i][0]), i
    bm = out["b_mode_counts"][0]
    assert bm["n_bi_part"] + bm["n_bi"] >= 1, bm


def test_b_mode_histograms_cover_new_keys():
    from sparkstreaming_spark.multimodal.h264 import _b_mode_key

    assert _b_mode_key(8) == "n_mixed_part"
    assert _b_mode_key(11) == "n_mixed_part"
    assert _b_mode_key(12) == "n_bi_part"
    assert _b_mode_key(21) == "n_bi_part"
    assert _b_mode_key(4) == "n_l0_part"
    assert _b_mode_key(7) == "n_l1_part"


# ---------------------------------------------------------------------------
# P sub-8x8 partitions (Table 7-17 sub_mb_types 1-3, round 8)


def test_p_sub8x8_partitions_fire_and_roundtrip():
    # motion discontinuity INSIDE the 8x8 quadrants (4-row bands
    # alternating +2/-2 px per frame): 8x4 sub-partitions are the only
    # shape that models it, so sub splits must fire, and the decoder
    # must reproduce the encoder loop bit-exactly on all three planes
    from sparkstreaming_spark.multimodal.h264 import gop_reconstruction_yuv

    rng = np.random.default_rng(13)
    h, w = 48, 64
    base = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)

    def frame(t):
        f = base.copy()
        s = 2 * t
        for r0 in range(16, h, 8):
            f[r0 : r0 + 4] = np.roll(base[r0 : r0 + 4], s, axis=1)
            f[r0 + 4 : r0 + 8] = np.roll(base[r0 + 4 : r0 + 8], -s, axis=1)
        return f

    frames = [frame(t) for t in range(4)]
    for qp in (18, 30):
        out = decode_stream(encode_gop(frames, qp=qp, search_range=5))
        recons, stats = gop_reconstruction_yuv(frames, qp=qp,
                                               search_range=5)
        for i, (ry, rcb, rcr) in enumerate(recons):
            assert np.array_equal(out["frames"][i], ry), (qp, i)
            assert np.array_equal(out["frames_cb"][i], rcb), (qp, i)
        assert sum(s["n_sub_split"] for s in stats) >= 12


def test_p_sub_geom_table_is_exhaustive():
    from sparkstreaming_spark.multimodal.h264 import P_SUB_GEOM

    for st, parts in P_SUB_GEOM.items():
        # each sub_mb_type tiles the 8x8 quadrant exactly once
        covered = np.zeros((8, 8), dtype=int)
        for dx, dy, w, h, _suf in parts:
            covered[dy : dy + h, dx : dx + w] += 1
        assert (covered == 1).all(), st
    assert set(P_SUB_GEOM) == {0, 1, 2, 3}


# ---------------------------------------------------------------------------
# B_8x8 (Table 7-18 sub_mb_types 0-3, round 8)


def test_b8x8_fires_on_checkerboard_motion_and_roundtrips():
    # four independent motions inside every MB (8x8 checkerboard
    # shifts): no 16x16 or two-partition mode fits, so B_8x8 with
    # per-quadrant MVs must win; decoder reproduces all three planes
    # bit-exactly and the mode histograms agree
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_b,
        gop_b_reconstruction_yuv,
    )

    rng = np.random.default_rng(4)
    h, w = 48, 64
    base = np.stack([rng.integers(0, 256, (h, w)) for _ in range(3)],
                    axis=-1).astype(np.uint8)

    def frame(t):
        f = base.copy()
        for r0 in range(0, h, 8):
            for c0 in range(0, w, 8):
                s = 2 * t if ((r0 // 8) + (c0 // 8)) % 2 == 0 else -2 * t
                f[r0 : r0 + 8, c0 : c0 + 8] = np.roll(
                    base[r0 : r0 + 8, c0 : c0 + 8], s, axis=1)
        return f

    frames = [frame(t) for t in range(6)]
    out = decode_stream(encode_gop_b(frames, qp=18, search_range=6))
    recons, stats = gop_b_reconstruction_yuv(frames, qp=18,
                                             search_range=6)
    for i, (ry, rcb, rcr) in enumerate(recons):
        assert np.array_equal(out["frames"][i], ry), i
        assert np.array_equal(out["frames_cb"][i], rcb), i
        assert np.array_equal(out["frames_cr"][i], rcr), i
    total = sum(c["n_b8x8"] for c in out["b_mode_counts"])
    assert total >= 12, out["b_mode_counts"]
    enc_bm = [{k: s[k] for k in out["b_mode_counts"][0]}
              for s in stats if s["type"] == "B"]
    assert enc_bm == out["b_mode_counts"]


def test_b8x8_direct_quadrants_in_temporal_gop():
    # a reordered GOP where ONE quadrant region is static (flat 128 —
    # exactly representable) and the rest pans: B_8x8 MBs on the
    # boundary can take Direct_8x8 for the static quadrant; whatever
    # mode mix the encoder picks, the round-trip must stay exact and
    # the B sub-split guard must never fire on our own streams
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_temporal,
        gop_temporal_reconstruction_yuv,
    )

    rng = np.random.default_rng(6)
    h, w = 32, 48
    base = rng.integers(0, 256, (h, w)).astype(np.uint8)
    base[:8] = 128

    def frame(t):
        f = base.copy()
        f[8:] = np.roll(base[8:], 2 * t, axis=1)
        return f

    frames = [frame(t) for t in range(5)]
    out = decode_stream(encode_gop_temporal(frames, qp=24,
                                            search_range=4))
    recons, _ = gop_temporal_reconstruction_yuv(frames, qp=24,
                                                search_range=4)
    for i in range(len(recons)):
        assert np.array_equal(out["frames"][i], recons[i][0]), i


def test_b_sub8x8_84_split_fires_and_roundtrips():
    # rows 4-7 of every 8-row band pan while rows 0-3 stay static: the
    # motion discontinuity sits INSIDE each 8x8 quadrant, so neither a
    # 16x16 MV, a two-partition mode, nor a whole-quadrant B_8x8 mode
    # fits — the Table 7-18 sub-split modes (8x4, types 4/6/8) must
    # win somewhere, with per-sub-partition MVDs in the list-major
    # §7.3.5.1 layout; all three planes round-trip bit-exactly and the
    # encoder/decoder histograms (incl. n_b8_split) agree
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_b,
        gop_b_reconstruction_yuv,
    )

    rng = np.random.default_rng(11)
    h, w = 32, 48
    base = rng.integers(0, 256, (h, w)).astype(np.uint8)

    def frame(t):
        f = base.copy()
        for r0 in range(4, h, 8):
            f[r0 : r0 + 4] = np.roll(base[r0 : r0 + 4], 2 * t, axis=1)
        return f

    frames = [frame(t) for t in range(5)]
    out = decode_stream(encode_gop_b(frames, qp=18, search_range=6))
    recons, stats = gop_b_reconstruction_yuv(frames, qp=18,
                                             search_range=6)
    for i, (ry, rcb, rcr) in enumerate(recons):
        assert np.array_equal(out["frames"][i], ry), i
        assert np.array_equal(out["frames_cb"][i], rcb), i
        assert np.array_equal(out["frames_cr"][i], rcr), i
    total_split = sum(c["n_b8_split"] for c in out["b_mode_counts"])
    assert total_split >= 4, out["b_mode_counts"]
    enc_bm = [{k: s[k] for k in out["b_mode_counts"][0]}
              for s in stats if s["type"] == "B"]
    assert enc_bm == out["b_mode_counts"]


def test_b_sub8x8_44_split_fires_and_roundtrips():
    # 4x4 checkerboard motion (every 4x4 cell shifts opposite its
    # neighbors): only the 4x4 sub-split modes (Table 7-18 types
    # 10-12) tile that; round-trip stays bit-exact and the histograms
    # agree under the deepest MVD nesting (up to 16 MVs per MB/list)
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_b,
        gop_b_reconstruction_yuv,
    )

    rng = np.random.default_rng(13)
    h, w = 32, 32
    base = rng.integers(0, 256, (h, w)).astype(np.uint8)

    def frame(t):
        f = base.copy()
        for r0 in range(0, h, 4):
            for c0 in range(0, w, 4):
                s = t if ((r0 // 4) + (c0 // 4)) % 2 == 0 else -t
                f[r0 : r0 + 4, c0 : c0 + 4] = np.roll(
                    base[r0 : r0 + 4, c0 : c0 + 4], s, axis=1)
        return f

    frames = [frame(t) for t in range(4)]
    out = decode_stream(encode_gop_b(frames, qp=16, search_range=4))
    recons, stats = gop_b_reconstruction_yuv(frames, qp=16,
                                             search_range=4)
    for i, (ry, rcb, rcr) in enumerate(recons):
        assert np.array_equal(out["frames"][i], ry), i
        assert np.array_equal(out["frames_cb"][i], rcb), i
        assert np.array_equal(out["frames_cr"][i], rcr), i
    total_split = sum(c["n_b8_split"] for c in out["b_mode_counts"])
    assert total_split >= 2, out["b_mode_counts"]
    enc_bm = [{k: s[k] for k in out["b_mode_counts"][0]}
              for s in stats if s["type"] == "B"]
    assert enc_bm == out["b_mode_counts"]


def test_b_sub8x8_in_temporal_gop_roundtrips():
    # the same intra-quadrant split content under a display-REORDERED
    # temporal-direct GOP: sub-split decode shares the temporal dq_mv
    # path (direct quadrants keep their scaled motion; split quadrants
    # carry explicit sub-MVs) — three-plane bit-exact round-trip
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_temporal,
        gop_temporal_reconstruction_yuv,
    )

    rng = np.random.default_rng(17)
    h, w = 32, 48
    base = rng.integers(0, 256, (h, w)).astype(np.uint8)

    def frame(t):
        f = base.copy()
        for r0 in range(4, h, 8):
            f[r0 : r0 + 4] = np.roll(base[r0 : r0 + 4], 2 * t, axis=1)
        return f

    frames = [frame(t) for t in range(5)]
    out = decode_stream(encode_gop_temporal(frames, qp=20,
                                            search_range=6))
    recons, _ = gop_temporal_reconstruction_yuv(frames, qp=20,
                                                search_range=6)
    for i in range(len(recons)):
        assert np.array_equal(out["frames"][i], recons[i][0]), i
        assert np.array_equal(out["frames_cb"][i], recons[i][1]), i
        assert np.array_equal(out["frames_cr"][i], recons[i][2]), i


def test_mvp_same_refidx_rules_multiref():
    # §8.4.1.3.1 with mixed references: the one-neighbor selection and
    # the 16x8/8x16 directional overrides key on refIdxLXN == refIdx,
    # while the median still mixes ALL used-this-list neighbor MVs
    mf = _MotionField(3, 3)
    mf.fill(0, 0, 4, 12, (0, 0))              # top MB row, ref 0
    mf.fill(4, 0, 4, 4, (4, 0), ref=0)        # A of MB (1,1): ref 0
    mf.fill(0, 4, 4, 4, (20, 8), ref=1)       # B: ref 1
    mf.fill(0, 8, 4, 4, (-12, 4), ref=1)      # C: ref 1
    # ref 0 partition: A is the only same-ref neighbor -> copy A
    assert _mvp_partition(mf, 4, 4, 4, "16x16", 0) == (4, 0)
    # ref 1 partition: B and C share the ref -> fall through to the
    # median over ALL list-0 neighbor MVs (A included)
    assert _mvp_partition(mf, 4, 4, 4, "16x16", 1) == (4, 4)
    # directional override requires the ref to match: 16x8_top's B is
    # ref 1, so a ref-0 top partition falls through to one-same (A)
    assert _mvp_partition(mf, 4, 4, 4, "16x8_top", 0) == (4, 0)
    # ...and a ref-1 top partition takes B directly
    assert _mvp_partition(mf, 4, 4, 4, "16x8_top", 1) == (20, 8)


def test_skip_mv_zero_condition_requires_ref0():
    # §8.4.1.1: a zero-MV neighbor only forces the zero skip MV when
    # its refIdxL0 is 0 — a zero-MV ref-1 block does not
    mf = _MotionField(2, 2)
    mf.fill(0, 0, 4, 8, (4, 0), ref=0)    # top row moving, ref 0
    mf.fill(4, 0, 4, 4, (0, 0), ref=1)    # A: zero MV but ref 1
    assert _skip_mv4(mf, 1, 1) != (0, 0)
    mf2 = _MotionField(2, 2)
    mf2.fill(0, 0, 4, 8, (4, 0), ref=0)
    mf2.fill(4, 0, 4, 4, (0, 0), ref=0)   # A: zero MV at ref 0
    assert _skip_mv4(mf2, 1, 1) == (0, 0)


def test_multiref_ref1_wins_on_alternating_content():
    # frames alternate a blinking texture region: frame t matches
    # frame t-2 exactly there, so partitions must choose L0[1]
    # (te(v)-coded ref_idx) — and every plane round-trips bit-exactly
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_multiref,
        gop_multiref_reconstruction_yuv,
    )

    rng = np.random.default_rng(23)
    tex_a = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    tex_b = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    frames = []
    for t in range(6):
        f = tex_a.copy()
        if t % 2 == 1:
            f[16:32, 16:48] = tex_b[16:32, 16:48]
        frames.append(f)
    out = decode_stream(encode_gop_multiref(frames, qp=20))
    recons, stats = gop_multiref_reconstruction_yuv(frames, qp=20)
    for i, (ry, rcb, rcr) in enumerate(recons):
        assert np.array_equal(out["frames"][i], ry), i
        assert np.array_equal(out["frames_cb"][i], rcb), i
        assert np.array_equal(out["frames_cr"][i], rcr), i
    assert sum(s["n_ref1"] for s in stats) > 0, stats
    # the unchanged background still collapses to P_Skip
    assert sum(s["n_skip"] for s in stats) > 0


def test_multiref_two_frame_gop_uses_override():
    # an I+P multi-ref GOP: the single P slice must override the
    # PPS's active_l0=2 down to 1 (the DPB holds one frame) and
    # decode identically to the encoder loop
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_multiref,
        gop_multiref_reconstruction_yuv,
    )

    rng = np.random.default_rng(29)
    base = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    frames = [base, np.roll(base, 2, axis=1)]
    out = decode_stream(encode_gop_multiref(frames, qp=18))
    recons, stats = gop_multiref_reconstruction_yuv(frames, qp=18)
    assert all(s["n_ref1"] == 0 for s in stats)
    for i, (ry, rcb, rcr) in enumerate(recons):
        assert np.array_equal(out["frames"][i], ry), i
        assert np.array_equal(out["frames_cb"][i], rcb), i
        assert np.array_equal(out["frames_cr"][i], rcr), i


def test_multiref_partitioned_and_sub_split_mbs_roundtrip():
    # mixed per-partition references: half of each MB blinks (matching
    # t-2), the other half pans (matching t-1) — 16x8 partitions and
    # P_8x8 quadrants carry DIFFERENT ref_idx values in one MB, with
    # the quadrant's sub-partitions sharing its reference
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_multiref,
        gop_multiref_reconstruction_yuv,
    )

    rng = np.random.default_rng(31)
    tex_a = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    tex_b = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    frames = []
    for t in range(6):
        f = np.roll(tex_a, 2 * t, axis=1)       # panning base: ref 0
        if t % 2 == 1:                          # blinking bands: ref 1
            for r0 in range(0, 32, 16):
                f[r0 : r0 + 8] = tex_b[r0 : r0 + 8]
        frames.append(f)
    out = decode_stream(encode_gop_multiref(frames, qp=18,
                                            search_range=6))
    recons, stats = gop_multiref_reconstruction_yuv(frames, qp=18,
                                                    search_range=6)
    for i, (ry, rcb, rcr) in enumerate(recons):
        assert np.array_equal(out["frames"][i], ry), i
        assert np.array_equal(out["frames_cb"][i], rcb), i
        assert np.array_equal(out["frames_cr"][i], rcr), i
    assert sum(s["n_ref1"] for s in stats) > 0
    assert sum(s["n_16x8"] + s["n_8x16"] + s["n_8x8"]
               for s in stats) > 0


def test_decoder_guards_three_active_refs():
    # splice an active_l0=3 PPS into a single-ref stream: the slice's
    # own override flag is 0, so decode must refuse with the exact
    # reason rather than misparse the partition layout
    from sparkstreaming_spark.multimodal.h264 import (
        _build_pps_rbsp,
        _nal,
    )

    rng = np.random.default_rng(37)
    base = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    frames = [base, np.roll(base, 2, axis=1)]
    stream = encode_gop(frames, qp=20)
    good = _nal(8, _build_pps_rbsp())
    bad = _nal(8, _build_pps_rbsp(active_l0=3))
    assert good in stream
    with pytest.raises(NotImplementedError, match="active reference"):
        decode_stream(stream.replace(good, bad))


def test_weighted_bipred_fade_collapses_and_roundtrips():
    # a global fade over a B GOP with explicit weighted bi-prediction:
    # per-list least-squares weights engage (non-identity), every B MB
    # collapses to B_Skip/B_Direct (no fade can skip without WP), and
    # all three planes round-trip bit-exactly through the §8.4.2.3.2
    # weighted uni and bi sample ops
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_b,
        encode_gop_b_weighted,
        gop_b_weighted_reconstruction_yuv,
    )

    i = np.arange(48).reshape(-1, 1, 1)
    j = np.arange(64).reshape(1, -1, 1)
    k = np.arange(3).reshape(1, 1, -1)
    base = ((30 + 2 * i + 2 * j + 25 * k) % 200 + 20).astype(np.uint8)
    frames = [
        np.clip(base.astype(np.float64) * (1.0 - 0.07 * t), 0,
                255).astype(np.uint8)
        for t in range(5)
    ]
    stream = encode_gop_b_weighted(frames, qp=22)
    out = decode_stream(stream)
    recons, stats = gop_b_weighted_reconstruction_yuv(frames, qp=22)
    for m, (ry, rcb, rcr) in enumerate(recons):
        assert np.array_equal(out["frames"][m], ry), m
        assert np.array_equal(out["frames_cb"][m], rcb), m
        assert np.array_equal(out["frames_cr"][m], rcr), m
    bs = [s for s in stats if s["type"] == "B"]
    assert bs
    for s in bs:
        # fade fully absorbed by skip/direct under the weights
        assert s["n_l0"] + s["n_l1"] + s["n_bi"] + s["n_l0_part"] \
            + s["n_l1_part"] + s["n_mixed_part"] + s["n_bi_part"] \
            + s["n_b8x8"] == 0, s
        assert s["n_skip"] + s["n_direct"] == 12
        assert s["bwp"]["y0"][0] != 32  # weights really engaged
    # the weighted stream is smaller than coding the same fade plain
    assert len(stream) < len(encode_gop_b(frames, qp=22))


def test_weighted_bipred_identity_weights_match_plain_averaging():
    # with explicit identity weights (32/0 at logWD 5) the §8.4.2.3.2
    # bi op reduces to ((p0+p1+32)>>6) = default-average rounding at
    # the same precision — panning content must still round-trip
    from sparkstreaming_spark.multimodal.h264 import (
        _encode_bslice,
        _encode_gop_bw_full,
    )

    rng = np.random.default_rng(41)
    base = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    frames = [np.roll(base, 2 * t, axis=1) for t in range(5)]
    recons, stats, stream = _encode_gop_bw_full(frames, 18, 4)
    out = decode_stream(stream)
    for m, (ry, rcb, rcr) in enumerate(recons):
        assert np.array_equal(out["frames"][m], ry), m
        assert np.array_equal(out["frames_cb"][m], rcb), m
        assert np.array_equal(out["frames_cr"][m], rcr), m
    _ = _encode_bslice  # imported for the API surface


def test_weighted_bipred_idc_parse_and_pocless_guard():
    # idc = 1 (explicit) and 2 (implicit) both parse; an idc = 2
    # stream whose B slices lack POC context (poc_type 2) must refuse
    # with the exact reason — implicit weights derive from POCs
    from sparkstreaming_spark.multimodal.h264 import (
        _build_pps_rbsp,
        _nal,
        _parse_pps,
        BitReader,
        encode_gop_b,
        strip_emulation,
    )

    parsed = _parse_pps(BitReader(strip_emulation(
        _build_pps_rbsp(weighted_bipred=True))))
    assert parsed["weighted_bipred"] is True
    assert parsed["weighted_bipred_idc"] == 1
    parsed2 = _parse_pps(BitReader(strip_emulation(
        _build_pps_rbsp(weighted_bipred=2))))
    assert parsed2["weighted_bipred_idc"] == 2
    # splice the idc=2 PPS into a poc_type-2 low-delay B stream
    rng = np.random.default_rng(43)
    base = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    frames = [np.roll(base, 2 * t, axis=1) for t in range(4)]
    stream = encode_gop_b(frames, qp=20)
    good = _nal(8, _build_pps_rbsp())
    bad = _nal(8, _build_pps_rbsp(weighted_bipred=2))
    assert good in stream
    with pytest.raises(NotImplementedError, match="implicit weighted"):
        decode_stream(stream.replace(good, bad))


def test_ibbp_gop_roundtrips_with_asymmetric_direct():
    # two Bs between each reference pair (display I b b P): each B has
    # its own DistScaleFactor (1/3 and 2/3 of the reference gap) for
    # temporal direct, and decode order/POCs interleave correctly
    from sparkstreaming_spark.multimodal.h264 import (
        encode_gop_temporal,
        gop_temporal_reconstruction_yuv,
    )

    rng = np.random.default_rng(47)
    base = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    frames = [np.roll(base, 2 * t, axis=1) for t in range(7)]
    out = decode_stream(encode_gop_temporal(frames, qp=20, n_b=2))
    recons, stats = gop_temporal_reconstruction_yuv(frames, qp=20,
                                                    n_b=2)
    assert out["poc"] == [0, 6, 2, 4, 12, 8, 10]
    dsfs = [s["dsf"] for s in stats if s["type"] == "B"]
    assert len(set(dsfs)) == 2  # 1/3- and 2/3-gap scale factors
    for m, (ry, rcb, rcr) in enumerate(recons):
        assert np.array_equal(out["frames"][m], ry), m
        assert np.array_equal(out["frames_cb"][m], rcb), m
        assert np.array_equal(out["frames_cr"][m], rcr), m
    # every B MB decoded something (mode histogram totals match MBs)
    nmb = (48 // 16) * (64 // 16)
    for c in out["b_mode_counts"]:
        assert sum(c.values()) == nmb


def test_implicit_weights_derive_and_roundtrip():
    # weighted_bipred_idc = 2: the IbbP Bs derive the NON-trivial
    # (43,21)/(22,42) POC-distance weights on both sides with nothing
    # transmitted; bi predictions run the weighted op, uni stay plain,
    # and every plane round-trips bit-exactly. A midpoint B (n_b=1)
    # derives the trivial (32,32).
    from sparkstreaming_spark.multimodal.h264 import (
        _implicit_weights,
        encode_gop_temporal,
        gop_temporal_reconstruction_yuv,
    )

    # spec geometry checks
    assert _implicit_weights(2, 0, 4) == (32, 32)
    assert _implicit_weights(2, 0, 6) == (43, 21)
    assert _implicit_weights(4, 0, 6) == (22, 42)
    assert _implicit_weights(2, 0, 0) == (32, 32)  # same-POC fallback

    rng = np.random.default_rng(53)
    base = rng.integers(0, 256, (48, 48)).astype(np.uint8)
    frames = [np.roll(base, 2 * t, axis=1) for t in range(7)]
    out = decode_stream(encode_gop_temporal(frames, qp=18, n_b=2,
                                            implicit_weights=True))
    recons, stats = gop_temporal_reconstruction_yuv(
        frames, qp=18, n_b=2, implicit_weights=True)
    iws = [s["iw"] for s in stats if s["type"] == "B"]
    assert (43, 21) in iws and (22, 42) in iws
    for m, (ry, rcb, rcr) in enumerate(recons):
        assert np.array_equal(out["frames"][m], ry), m
        assert np.array_equal(out["frames_cb"][m], rcb), m
        assert np.array_equal(out["frames_cr"][m], rcr), m


def test_implicit_midpoint_equals_default_averaging():
    # at the midpoint the implicit pair is (32, 32) and the §8.4.2.3.2
    # bi op reduces to ((32*p0 + 32*p1 + 32) >> 6) = (p0 + p1 + 1) >> 1
    # — the reconstruction must be IDENTICAL to the unweighted stream
    from sparkstreaming_spark.multimodal.h264 import (
        gop_temporal_reconstruction_yuv,
    )

    rng = np.random.default_rng(59)
    base = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    frames = [np.roll(base, 2 * t, axis=1) for t in range(5)]
    plain, _ = gop_temporal_reconstruction_yuv(frames, qp=20)
    impl, _ = gop_temporal_reconstruction_yuv(frames, qp=20,
                                              implicit_weights=True)
    for m in range(len(plain)):
        for pl in range(3):
            assert np.array_equal(plain[m][pl], impl[m][pl]), (m, pl)
