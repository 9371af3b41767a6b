"""Media metadata triage tests (multimodal/mediameta.py): mp3 frame
walk, Ogg page walk, H.264 SPS parse — header-level probes for the
transform-coded formats whose full decode is a documented stub."""

import struct

import pytest

from sparkstreaming_spark.multimodal.mediameta import (
    _BR_V1,
    build_mp3_stream,
    build_ogg_stream,
    build_sps,
    h264_probe,
    mp3_probe,
    ogg_probe,
    parse_mp3_header,
    parse_sps,
)


# ---------------------------------------------------------------- mp3


def test_mp3_cbr_walk():
    p = mp3_probe(build_mp3_stream([9] * 10))
    assert p["n_frames"] == 10 and p["cbr"] is True
    assert p["avg_bitrate"] == 128000 and p["samplerate"] == 44100
    assert p["duration_s"] == round(10 * 1152 / 44100, 6)


def test_mp3_vbr_average():
    codes = [5, 9, 14, 9, 5, 9]
    p = mp3_probe(build_mp3_stream(codes))
    assert p["cbr"] is False
    expect = sum(_BR_V1[3][c] for c in codes) * 1000 // len(codes)
    assert p["avg_bitrate"] == expect


def test_mp3_id3_skip_and_resync():
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"x" * 10
    s = build_mp3_stream([9] * 4)
    dirty = id3 + b"\xff\x00garbage" + s[: len(s) // 2] + s[len(s) // 2 :]
    p = mp3_probe(dirty)
    assert p["n_frames"] == 4


def test_mp3_frame_size_formula():
    h = parse_mp3_header((0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
                         | (9 << 12) | (0 << 10))
    # MPEG1 Layer III 128kbps @ 44100: 144*128000/44100 = 417
    assert h["frame_size"] == 417


def test_mp3_mpeg2_layer3():
    s = build_mp3_stream([5] * 3, sr_code=1, version=2)  # 24 kHz MPEG2
    p = mp3_probe(s)
    assert p["samplerate"] == 24000
    assert p["duration_s"] == round(3 * 576 / 24000, 6)


def test_mp3_rejects_bad_sync():
    assert parse_mp3_header(0x12345678) is None
    assert mp3_probe(b"\x00" * 1000)["n_frames"] == 0


def test_mp3_layer1_padding_slot():
    # Layer I frame size is in 4-byte slots
    word = (0x7FF << 21) | (3 << 19) | (3 << 17) | (1 << 16) | (9 << 12) | (1 << 9)
    h = parse_mp3_header(word)
    assert h["layer"] == 1
    assert h["frame_size"] == (12 * 288000 // 44100 + 1) * 4


# ---------------------------------------------------------------- ogg


def test_ogg_page_walk():
    p = ogg_probe(build_ogg_stream(777, [960, 48000, 96000]))
    assert p == {
        "n_pages": 3,
        "serial": 777,
        "last_granule": 96000,
        "duration_s": 2.0,
        "rate": 48000,
        "eos_seen": True,
        "codec": "unknown",
        "channels": 0,
        "pre_skip": 0,
    }


def test_ogg_opus_ident_header():
    p = ogg_probe(build_ogg_stream(7, [960, 96000], opus_head=(2, 312)))
    assert p["codec"] == "opus" and p["channels"] == 2 and p["pre_skip"] == 312


def test_ogg_vorbis_ident_header():
    import struct as _struct

    blob = bytearray(build_ogg_stream(9, [4800], body_sizes=[30]))
    ident = b"\x01vorbis" + _struct.pack("<I", 0) + bytes([2])
    body_start = len(blob) - 30
    blob[body_start : body_start + len(ident)] = ident
    p = ogg_probe(bytes(blob))
    assert p["codec"] == "vorbis" and p["channels"] == 2


def test_ogg_large_bodies_use_lacing():
    p = ogg_probe(build_ogg_stream(1, [48000], body_sizes=[700]))
    assert p["n_pages"] == 1 and p["duration_s"] == 1.0


def test_ogg_truncated_tail_stops_cleanly():
    blob = build_ogg_stream(5, [960, 1920])
    p = ogg_probe(blob[:-10])
    assert p["n_pages"] == 1 and p["last_granule"] == 960


def test_ogg_skips_garbage_prefix():
    blob = b"junkjunk" + build_ogg_stream(9, [4800])
    assert ogg_probe(blob)["n_pages"] == 1


# ---------------------------------------------------------------- h264


@pytest.mark.parametrize("w,h", [(1920, 1080), (1280, 720), (640, 480),
                                 (354, 288), (16, 16), (3840, 2160)])
def test_sps_resolution_roundtrip(w, h):
    info = h264_probe(build_sps(w, h))
    assert (info["width"], info["height"]) == (w, h)
    assert info["n_sps"] == 1


def test_sps_cropping_needed_for_non_multiple_of_16():
    # 1080 = 68*16 - 2*4 → crop_bottom = 4
    info = parse_sps(build_sps(1920, 1080)[5:])
    assert info["height"] == 1080


def test_h264_nal_counting():
    stream = (build_sps(640, 480)
              + b"\x00\x00\x01\x68\x11"          # PPS
              + b"\x00\x00\x01\x65" + b"\xaa" * 9  # IDR
              + b"\x00\x00\x01\x41" + b"\xbb" * 5)  # non-IDR slice
    p = h264_probe(stream)
    assert p["n_nals"] == 4 and p["n_sps"] == 1 and p["n_idr"] == 1


def test_h264_no_sps_yields_zero_resolution():
    p = h264_probe(b"\x00\x00\x01\x41" + b"\x00" * 10)
    assert p["width"] == 0 and p["height"] == 0


def test_sps_requires_even_dims():
    with pytest.raises(ValueError, match="even"):
        build_sps(641, 480)


def test_emulation_prevention_roundtrip():
    # a resolution whose ue() bits produce 00 00 0x patterns must still
    # roundtrip thanks to emulation-prevention insert + strip
    for w in range(16, 4096, 256):
        info = h264_probe(build_sps(w, 1088))
        assert info["width"] == w, w


def test_ogg_vorbis_native_rate():
    # Vorbis granules are native-rate samples (unlike Opus's fixed
    # 48 kHz): 44100 granules of 44.1 kHz Vorbis = exactly 1 second.
    p = ogg_probe(build_ogg_stream(3, [44100, 88200], vorbis_ident=(2, 44100)))
    assert p["codec"] == "vorbis" and p["rate"] == 44100
    assert p["duration_s"] == 2.0


def test_ogg_opus_rate_stays_48k():
    p = ogg_probe(build_ogg_stream(7, [96000], opus_head=(2, 312)))
    assert p["rate"] == 48000 and p["duration_s"] == 2.0


def _sps_rbsp(profile, chroma, w_mbs, h_mbs, crops, scaling_matrix=False):
    from sparkstreaming_spark.multimodal.mediameta import _ExpGolombWriter

    w = _ExpGolombWriter()
    w.bits(profile, 8)
    w.bits(0, 8)
    w.bits(30, 8)
    w.ue(0)  # sps id
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        w.ue(chroma)
        if chroma == 3:
            w.bit(0)  # separate_colour_plane = 0
        w.ue(0)  # bit_depth_luma_minus8
        w.ue(0)  # bit_depth_chroma_minus8
        w.bit(0)  # qpprime
        w.bit(1 if scaling_matrix else 0)
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # poc type 2
    w.ue(1)  # max_num_ref_frames
    w.bit(0)  # gaps allowed
    w.ue(w_mbs - 1)
    w.ue(h_mbs - 1)
    w.bit(1)  # frame_mbs_only
    w.bit(1)  # direct_8x8
    if any(crops):
        w.bit(1)
        for c in crops:
            w.ue(c)
    else:
        w.bit(0)
    w.bit(0)  # vui absent
    return w.getvalue()


def test_sps_444_crop_units_are_one():
    # 4:4:4 → SubWidthC=SubHeightC=1 → crop offsets subtract 1:1, not 2:1
    info = parse_sps(_sps_rbsp(100, 3, 80, 45, (0, 3, 0, 5)))
    assert (info["width"], info["height"]) == (80 * 16 - 3, 45 * 16 - 5)


def test_sps_422_crop_units():
    # 4:2:2 → SubWidthC=2, SubHeightC=1 → CropUnitX=2, CropUnitY=1
    info = parse_sps(_sps_rbsp(100, 2, 80, 45, (1, 2, 3, 4)))
    assert (info["width"], info["height"]) == (80 * 16 - 2 * 3, 45 * 16 - 7)


def test_sps_monochrome_crop_units():
    # ChromaArrayType 0 → CropUnitX=1, CropUnitY=2-frame_mbs_only=1
    info = parse_sps(_sps_rbsp(100, 0, 10, 10, (2, 2, 2, 2)))
    assert (info["width"], info["height"]) == (160 - 4, 160 - 4)


def test_sps_scaling_matrix_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        parse_sps(_sps_rbsp(100, 1, 10, 10, (0, 0, 0, 0), scaling_matrix=True))


# ------------------------------------------------------------ spark pass

def test_media_meta_probe_spark(spark):
    import pandas as pd

    from sparkstreaming_spark.multimodal.mediameta import media_meta_probe

    rows = [
        (1, build_mp3_stream([9] * 8), "mp3"),
        (2, build_ogg_stream(4, [9600, 48000]), "ogg"),
        (3, build_sps(1280, 720), "h264"),
        (4, b"not media", "mp3"),
        (5, b"???", "weird"),
        # High-profile SPS with scaling matrices: parse raises
        # NotImplementedError — must degrade to ok=false, not fail the batch
        (6, b"\x00\x00\x00\x01\x67"
            + _sps_rbsp(100, 1, 10, 10, (0, 0, 0, 0), scaling_matrix=True),
         "h264"),
        # Vorbis at its native 44.1 kHz: duration divides by 44100
        (7, build_ogg_stream(8, [88200], vorbis_ident=(2, 44100)), "ogg"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "blob", "kind"]))
    out = {r["id"]: r.asDict() for r in media_meta_probe(df, "id", "blob", "kind").collect()}
    assert out[1]["n_units"] == 8 and out[1]["ok"]
    assert out[2]["duration_s"] == 1.0
    assert out[3]["width"] == 1280 and out[3]["height"] == 720
    assert out[4]["ok"] and out[4]["n_units"] == 0  # resync finds nothing
    assert out[5]["ok"] is False
    assert out[6]["ok"] is False
    assert out[7]["ok"] and out[7]["rate"] == 44100
    assert out[7]["duration_s"] == 2.0


# ---------------------------------------------------------------- mp4


def test_mp4_box_walk():
    from sparkstreaming_spark.multimodal.mediameta import build_mp4, mp4_probe

    p = mp4_probe(build_mp4(1920, 1080, 12.345, n_tracks=2))
    assert p["duration_s"] == 12.345
    assert (p["width"], p["height"]) == (1920, 1080)
    assert p["n_tracks"] == 2 and p["brand"] == "isom"


def test_mp4_v1_mvhd_and_largesize():
    import struct

    from sparkstreaming_spark.multimodal.mediameta import build_mp4, mp4_probe

    blob = bytearray(build_mp4(640, 360, 5.0))
    # rewrite the trailing 'free' box with a 64-bit largesize header
    assert blob[-8:] == struct.pack(">I", 8) + b"free"
    blob = blob[:-8] + struct.pack(">I", 1) + b"free" + struct.pack(">Q", 16)
    p = mp4_probe(bytes(blob))
    assert p["duration_s"] == 5.0 and p["width"] == 640


def test_mp4_malformed_box_raises():
    import pytest as _pytest

    from sparkstreaming_spark.multimodal.mediameta import build_mp4, mp4_probe

    blob = bytearray(build_mp4(64, 64, 1.0))
    blob[0] = 0xFF  # ftyp size becomes absurd
    with _pytest.raises(ValueError, match="malformed"):
        mp4_probe(bytes(blob))


# ---------------------------------------------------------------- webp


@pytest.mark.parametrize("variant", ["vp8", "vp8l", "vp8x"])
def test_webp_variants(variant):
    from sparkstreaming_spark.multimodal.mediameta import build_webp, webp_probe

    p = webp_probe(build_webp(1024, 768, variant))
    assert (p["width"], p["height"]) == (1024, 768)
    assert p["format"] == variant


def test_webp_rejects_non_webp():
    import pytest as _pytest

    from sparkstreaming_spark.multimodal.mediameta import webp_probe

    with _pytest.raises(ValueError, match="not a WebP"):
        webp_probe(b"RIFF\x00\x00\x00\x00WAVE")


def test_webp_bad_vp8_start_code():
    import pytest as _pytest

    from sparkstreaming_spark.multimodal.mediameta import build_webp, webp_probe

    blob = bytearray(build_webp(64, 64, "vp8"))
    blob[-7] ^= 0xFF  # corrupt the 9d 01 2a start code
    with _pytest.raises(ValueError, match="start code"):
        webp_probe(bytes(blob))


def test_sniff_mime_detects_media_magics(spark):
    """The ingestion dispatcher recognizes the triage layer's formats,
    including the non-prefix magics (offset-4 ftyp, mp3 sync bits)."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    from sparkstreaming_spark.multimodal.blobs import sniff_mime
    from sparkstreaming_spark.multimodal.mediameta import build_mp4

    rows = [
        (1, build_mp3_stream([9] * 2)),        # raw sync FF Fx
        (2, b"ID3\x04\x00\x00\x00\x00\x00\x00tag"),  # ID3v2 mp3
        (3, build_mp4(64, 64, 1.0)),            # ....ftyp
        (4, b"\xff\x00 not a sync"),            # sync needs 11 bits
        (5, b"OggS junk"),
        (6, b"fLaC junk"),
        (7, b"\x89PNG\r\n\x1a\n rest"),
        (8, b"\xff\xd8\xff\xe0jfif"),
        (9, b"\x00\x00\x00\x01\x67\x42\x00\x1e"),  # Annex-B SPS NAL
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "blob"]))
    out = {r["id"]: r["m"]
           for r in df.select("id", sniff_mime("blob").alias("m")).collect()}
    assert out[1] == out[2] == "audio/mpeg"
    assert out[3] == "video/mp4"
    assert out[4] == "application/octet-stream"
    assert out[5] == "audio/ogg" and out[6] == "audio/flac"
    assert out[7] == "image/png" and out[8] == "image/jpeg"
    assert out[9] == "video/h264"
