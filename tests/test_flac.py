"""FLAC codec roundtrip + format-conformance tests (multimodal/flac.py).

Pure-Python, no Spark session needed: the codec is exercised directly,
the Spark-side plumbing is covered by suite/platform_ops.py::q_flac_probe
via the oracle differential."""

import hashlib

import numpy as np
import pytest

from sparkstreaming_spark.multimodal.flac import (
    _BitReader,
    _BitWriter,
    _crc8,
    _crc16,
    _encode_coded_number,
    _read_coded_number,
    decode_flac,
    encode_flac,
)


def _roundtrip(x: np.ndarray, rate: int = 16000, blocksize: int = 4096) -> np.ndarray:
    dec, got_rate = decode_flac(encode_flac(x, rate, blocksize=blocksize))
    assert got_rate == rate
    return dec


def test_silence_constant_subframe_and_compression():
    x = np.zeros(9000, dtype=np.int16)
    blob = encode_flac(x, 8000)
    assert np.array_equal(decode_flac(blob)[0], x)
    # constant subframes: the whole stream is a few hundred bytes
    assert len(blob) < 200


def test_ramp_fixed_predictor_lossless_and_small():
    x = np.arange(-4000, 4000, dtype=np.int16)  # order-1/2 residuals ~ 0
    blob = encode_flac(x, 44100)
    assert np.array_equal(decode_flac(blob)[0], x)
    assert len(blob) < len(x) * 2 / 4  # >4x smaller than raw PCM


def test_sine_roundtrip_bit_exact():
    n = 10000
    t = np.arange(n)
    x = (3000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    assert np.array_equal(_roundtrip(x), x)


def test_noise_roundtrip_bit_exact():
    rng = np.random.default_rng(7)
    x = rng.integers(-32768, 32767, size=5000).astype(np.int16)
    assert np.array_equal(_roundtrip(x), x)


def test_extreme_values_and_partial_final_frame():
    x = np.array([-32768, 32767, 0, 1, -1] * 7, dtype=np.int16)  # 35 samples
    assert np.array_equal(_roundtrip(x, blocksize=16), x)


def test_empty_stream():
    x = np.zeros(0, dtype=np.int16)
    assert len(_roundtrip(x)) == 0


def test_multi_frame_boundaries():
    rng = np.random.default_rng(11)
    x = rng.integers(-2000, 2000, size=4096 * 3 + 123).astype(np.int16)
    assert np.array_equal(_roundtrip(x), x)


def test_md5_signature_verified():
    x = np.arange(1000, dtype=np.int16)
    blob = bytearray(encode_flac(x, 8000))
    # STREAMINFO md5 lives at bytes 8+18 .. 8+34 of the metadata block
    blob[4 + 4 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(blob))


def test_frame_crc_detects_corruption():
    x = (np.arange(3000) % 251).astype(np.int16) * 31
    blob = bytearray(encode_flac(x, 8000))
    blob[-10] ^= 0x55  # flip a bit inside the last frame body
    with pytest.raises(ValueError, match="CRC|sync|MD5"):
        decode_flac(bytes(blob))


def test_not_flac_raises():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFF1234WAVE")


def test_coded_number_roundtrip():
    for n in [0, 1, 127, 128, 2047, 2048, 65535, 1 << 20, (1 << 31) - 1, (1 << 35)]:
        enc = _encode_coded_number(n)
        br = _BitReader(enc)
        assert _read_coded_number(br) == n, n


def test_crc_vectors():
    # linearity/sanity vectors computed from the defining polynomials
    assert _crc8(b"") == 0
    assert _crc8(b"\x00") == 0
    assert _crc8(b"\x01") == 0x07
    assert _crc16(b"\x01") == 0x8005


def test_bitio_roundtrip():
    bw = _BitWriter()
    vals = [(5, 3), (0x3FFE, 14), (1, 1), (255, 8), (0, 2), (123456, 20)]
    for v, n in vals:
        bw.write(v, n)
    bw.align()
    br = _BitReader(bw.getvalue())
    for v, n in vals:
        assert br.read(n) == v


def test_decoder_handles_lpc_subframe():
    """Hand-build a one-frame stream with an LPC order-1 subframe
    (coef=1, shift=0 → prediction = previous sample) so the decode-only
    LPC path is exercised without an LPC encoder."""
    import struct

    rate, bps = 8000, 16
    samples = np.array([100, 110, 95, 130, 120, 121, 119, 140], dtype=np.int64)
    order, coef, shift = 1, 1, 0
    res = samples[1:] - samples[:-1]

    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(0b100000 | (order - 1), 6)  # LPC, order 1
    bw.write(0, 1)  # no wasted bits
    bw.write(int(samples[0]) & 0xFFFF, bps)  # warmup
    bw.write(4 - 1, 4)  # precision 4 bits
    bw.write(shift & 0x1F, 5)
    bw.write(coef & 0xF, 4)
    bw.write(0, 2)  # rice method 0
    bw.write(0, 4)  # partition order 0
    bw.write(7, 4)  # rice param 7
    for r in res:
        u = int(2 * r if r >= 0 else -2 * r - 1)
        bw.write_unary(u >> 7)
        bw.write(u & 127, 7)
    bw.align()
    body = bw.getvalue()

    head = bytearray()
    head += struct.pack(">H", 0x3FFE << 2)
    head.append((0x7 << 4) | 0x0)
    head.append((0b100 << 1))
    head += _encode_coded_number(0)
    head += struct.pack(">H", len(samples) - 1)
    head.append(_crc8(bytes(head)))
    frame = bytes(head) + body
    frame += struct.pack(">H", _crc16(frame))

    si = struct.pack(">HH", 4096, 4096) + b"\x00" * 6
    packed = (rate << 44) | ((bps - 1) << 36) | len(samples)
    si += packed.to_bytes(8, "big")
    si += hashlib.md5(samples.astype("<i2").tobytes()).digest()
    stream = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si + frame

    dec, got_rate = decode_flac(stream)
    assert got_rate == rate
    assert np.array_equal(dec, samples)


def test_decoder_handles_wasted_bits():
    """All-even samples with a wasted-bits=1 verbatim subframe decode to
    the original values (samples stored >>1, shifted back on decode)."""
    import struct

    rate, bps = 8000, 16
    samples = np.array([2, -4, 8, 100, -32768, 32766], dtype=np.int64)

    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(0b000001, 6)  # VERBATIM
    bw.write(1, 1)  # wasted-bits flag
    bw.write_unary(0)  # unary 0 → wasted = 1
    for s in samples >> 1:
        bw.write(int(s) & 0x7FFF, bps - 1)
    bw.align()
    body = bw.getvalue()

    head = bytearray()
    head += struct.pack(">H", 0x3FFE << 2)
    head.append((0x7 << 4) | 0x0)
    head.append((0b100 << 1))
    head += _encode_coded_number(0)
    head += struct.pack(">H", len(samples) - 1)
    head.append(_crc8(bytes(head)))
    frame = bytes(head) + body
    frame += struct.pack(">H", _crc16(frame))

    si = struct.pack(">HH", 4096, 4096) + b"\x00" * 6
    packed = (rate << 44) | ((bps - 1) << 36) | len(samples)
    si += packed.to_bytes(8, "big")
    si += hashlib.md5(samples.astype("<i2").tobytes()).digest()
    stream = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si + frame

    dec, _ = decode_flac(stream)
    assert np.array_equal(dec, samples)


def test_truncated_stream_raises():
    x = (np.arange(5000) % 997).astype(np.int16) * 13
    blob = encode_flac(x, 8000)
    for cut in (len(blob) - 7, len(blob) // 2, 60):
        with pytest.raises((ValueError, IndexError)):
            decode_flac(blob[:cut])


def test_rice_escape_partition_roundtrip():
    # alternating extremes force residuals past the 4-bit rice cap into
    # the raw-width escape path on every partition
    x = np.tile([32767, -32768], 3000).astype(np.int16)
    dec, _ = decode_flac(encode_flac(x, 8000, blocksize=256))
    assert np.array_equal(dec, x)


def test_single_sample_and_tiny_blocks():
    for n in (1, 2, 3, 5, 17):
        x = (np.arange(n) * 911 % 4099 - 2048).astype(np.int16)
        dec, _ = decode_flac(encode_flac(x, 8000, blocksize=16))
        assert np.array_equal(dec, x), n
