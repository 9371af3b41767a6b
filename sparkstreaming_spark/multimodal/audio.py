"""Audio blob processing: real WAV (RIFF/PCM) decode and linear
resampling over Arrow batches — the audio leg of the multimodal surface
(images: codecs.py; video frame sampling: blobs.py).

WAV/PCM is decoded with the stdlib `wave` module + NumPy frombuffer,
and COMPRESSED audio is covered by REAL pure-Python codecs with zero
external dependencies, all encoder + decoder + roundtrip-tested:
IMA-ADPCM (WAV fmt tag 0x11, 4:1, below), G.711 μ-law/A-law (fmt tags
7/6, below), and lossless FLAC (flac.py — fixed predictors + Rice
coding). Only transform-coded formats (mp3/opus, which need
psychoacoustic-model + MDCT stacks absent from this container) remain
documented stubs. Resampling is deterministic linear interpolation at
fixed float64 precision.

Spark shape: mapInPandas over (id, blob) — Arrow moves the bytes in
batches, one Python worker pass, no row-at-a-time UDF. Feature rows are
fixed-width; partitioning is whatever the upstream source had (decode is
embarrassingly parallel; a 100 TB audio corpus scales by input splits).
"""

from __future__ import annotations

import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono PCM → WAV bytes (test fixture + re-encode path)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float64 mono samples in [-1, 1], sample_rate).
    Supports 8/16/32-bit PCM (stdlib `wave` + NumPy), IMA-ADPCM (fmt
    tag 0x11) and G.711 A-law/μ-law (fmt tags 6/7) compressed WAVs —
    all pure-Python codecs below; multi-channel PCM input is averaged
    to mono."""
    try:
        return _decode_wav_pcm(data)
    except wave.Error:
        # non-PCM container: the stdlib module refuses compressed WAVs
        import struct

        fmt = _parse_riff_chunks(data).get(b"fmt ", b"\x00\x00")
        tag = struct.unpack("<H", fmt[:2])[0]
        if tag in (6, 7):
            return decode_wav_g711(data)
        return decode_wav_ima_adpcm(data)


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Container-sniffing audio decode: FLAC streams (fLaC magic →
    multimodal/flac.py, int samples normalized to [-1, 1]) or any
    supported WAV (PCM / IMA-ADPCM / G.711). The single entry point the
    Arrow feature extractors use, so a mixed 100 TB audio corpus needs
    no per-format routing upstream."""
    if data[:4] == b"fLaC":
        from .flac import decode_flac

        samples, rate = decode_flac(data)
        return samples.astype("float64") / 32768.0, rate
    return decode_wav(data)


def _decode_wav_pcm(data: bytes) -> tuple[np.ndarray, int]:
    with wave.open(io.BytesIO(data), "rb") as w:
        n = w.getnframes()
        rate = w.getframerate()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype("float64") / 32768.0
    elif width == 4:
        arr = np.frombuffer(raw, dtype="<i4").astype("float64") / 2147483648.0
    elif width == 1:  # WAV 8-bit is unsigned
        arr = (np.frombuffer(raw, dtype="u1").astype("float64") - 128.0) / 128.0
    else:
        raise NotImplementedError(f"PCM width {width} not supported")
    if channels > 1:
        arr = arr.reshape(-1, channels).mean(axis=1)
    return arr, rate


def resample_linear(samples: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Deterministic linear-interpolation resample (the np.interp grid is
    index-exact, so output length = round(n * dst/src))."""
    if src_rate == dst_rate or len(samples) == 0:
        return samples
    n_out = int(round(len(samples) * dst_rate / src_rate))
    src_idx = np.arange(len(samples), dtype="float64")
    dst_idx = np.arange(n_out, dtype="float64") * (src_rate / dst_rate)
    return np.interp(dst_idx, src_idx, samples)


def audio_features(
    df: DataFrame,
    id_col: str,
    blob_col: str = "blob",
    target_rate: int = 16_000,
    fake: bool = False,
) -> DataFrame:
    """Per-blob audio profile: (id, sample_rate, n_samples, duration_s,
    rms, peak, n_resampled) — decode + resample-to-target in one Arrow
    pass. `fake=True` treats the raw bytes as unsigned 8-bit samples at
    `target_rate` (deterministic stand-in for non-WAV corpora)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf["__id"], pdf["__blob"]):
                raw = bytes(blob)
                if fake:
                    samples = (
                        np.frombuffer(raw, dtype="u1").astype("float64") - 128.0
                    ) / 128.0
                    rate = target_rate
                else:
                    samples, rate = decode_audio(raw)
                res = resample_linear(samples, rate, target_rate)
                rows.append(
                    {
                        "id": i,
                        "sample_rate": rate,
                        "n_samples": len(samples),
                        "duration_s": round(len(samples) / rate, 6) if rate else 0.0,
                        "rms": round(float(np.sqrt(np.mean(samples**2)))
                                     if len(samples) else 0.0, 6),
                        "peak": round(float(np.max(np.abs(samples)))
                                      if len(samples) else 0.0, 6),
                        "n_resampled": len(res),
                    }
                )
            yield pd.DataFrame(rows)

    narrowed = df.select(
        F.col(id_col).alias("__id"), F.col(blob_col).alias("__blob")
    )
    return narrowed.mapInPandas(
        extract,
        schema=(
            "id bigint, sample_rate int, n_samples bigint, duration_s double,"
            " rms double, peak double, n_resampled bigint"
        ),
    )


def audio_band_energy(
    df: DataFrame,
    id_col: str,
    blob_col: str = "blob",
    n_fft: int = 256,
    n_bands: int = 8,
    target_rate: int = 16_000,
    fake: bool = False,
) -> DataFrame:
    """Per-blob spectral profile: frame the signal into `n_fft`-sample
    windows, rfft each frame, average |X|^2 over frames, then collapse
    the spectrum into `n_bands` contiguous bands reported as
    log10-energy — the canonical "cheap spectrogram" feature for audio
    corpus triage (speech/music/noise separation, silence detection).

    Output: (id, n_frames, band0..band{n_bands-1}).

    Spark shape: identical to audio_features — one Arrow mapInPandas
    pass, NumPy FFT per batch (vectorized over frames), fixed-width
    output. Decode+FFT is embarrassingly parallel; a 100 TB corpus
    scales by input splits with zero shuffle. `fake=True` reads raw
    bytes as u8 samples (deterministic stand-in when the corpus has no
    real WAV column)."""
    n_bins = n_fft // 2 + 1
    edges = [round(i * n_bins / n_bands) for i in range(n_bands + 1)]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf["__id"], pdf["__blob"]):
                raw = bytes(blob)
                if fake:
                    samples = (
                        np.frombuffer(raw, dtype="u1").astype("float64") - 128.0
                    ) / 128.0
                else:
                    samples, _rate = decode_audio(raw)
                n_frames = len(samples) // n_fft
                row = {"id": i, "n_frames": n_frames}
                if n_frames == 0:
                    for b in range(n_bands):
                        row[f"band{b}"] = 0.0
                else:
                    frames = samples[: n_frames * n_fft].reshape(n_frames, n_fft)
                    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
                    mean_spec = spec.mean(axis=0)
                    for b in range(n_bands):
                        e = float(mean_spec[edges[b]:edges[b + 1]].mean())
                        row[f"band{b}"] = round(float(np.log10(e + 1e-12)), 6)
                rows.append(row)
            yield pd.DataFrame(rows)

    narrowed = df.select(
        F.col(id_col).alias("__id"), F.col(blob_col).alias("__blob")
    )
    bands = ", ".join(f"band{b} double" for b in range(n_bands))
    return narrowed.mapInPandas(
        extract, schema=f"id long, n_frames long, {bands}"
    )


# ---------------------------------------------------------------------------
# IMA ADPCM (DVI/IMA, WAV format tag 0x11) — a real COMPRESSED audio codec
# in pure Python/NumPy, closing the compressed-audio slot the way the
# pure-Python PNG decoder closed the image slot. The algorithm is public
# (IMA Digital Audio Focus Group, "Recommended Practices for Enhancing
# Digital Audio Compatibility", 1992; same tables ship in every open
# implementation). 4 bits/sample → 4:1 compression vs int16 PCM, lossy
# (~2 % step quantization), block-independent so decode parallelizes by
# block. mp3/opus remain documented stubs: they need ffmpeg-class
# entropy/transform stacks absent from this container.
# ---------------------------------------------------------------------------

_IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_decode_nibbles(nibbles, predictor: int, index: int):
    """Decode a sequence of 4-bit IMA codes given the block's seed
    predictor/step-index. Inherently sequential (each step depends on the
    previous sample) — but blocks are independent, so corpus decode
    parallelizes at block granularity."""
    out = []
    pred = predictor
    idx = index
    for nib in nibbles:
        step = _IMA_STEP_TABLE[idx]
        delta = step >> 3
        if nib & 1:
            delta += step >> 2
        if nib & 2:
            delta += step >> 1
        if nib & 4:
            delta += step
        if nib & 8:
            pred -= delta
        else:
            pred += delta
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + _IMA_INDEX_TABLE[nib & 7]))
        out.append(pred)
    return out, pred, idx


def _ima_encode_sample(sample: int, pred: int, idx: int):
    """Quantize one sample against the current predictor state; returns
    (nibble, new_pred, new_idx) — the encoder mirrors the decoder's
    reconstruction so the state never drifts."""
    step = _IMA_STEP_TABLE[idx]
    diff = sample - pred
    nib = 0
    if diff < 0:
        nib = 8
        diff = -diff
    if diff >= step:
        nib |= 4
        diff -= step
    if diff >= step >> 1:
        nib |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nib |= 1
    # reconstruct exactly as the decoder will
    delta = step >> 3
    if nib & 1:
        delta += step >> 2
    if nib & 2:
        delta += step >> 1
    if nib & 4:
        delta += step
    pred = pred - delta if nib & 8 else pred + delta
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX_TABLE[nib & 7]))
    return nib, pred, idx


def encode_wav_ima_adpcm(
    samples: np.ndarray, sample_rate: int, block_align: int = 256
) -> bytes:
    """int16 mono samples → WAV bytes with fmt tag 0x11 (IMA ADPCM).
    Block layout (mono): 4-byte header (int16 predictor = first sample,
    u8 step index, reserved) + (block_align-4) nibble bytes, low nibble
    first → samples_per_block = (block_align-4)*2 + 1."""
    import struct

    samples = np.asarray(samples, dtype="int64")
    spb = (block_align - 4) * 2 + 1
    blocks = []
    idx = 0  # step index carries across blocks (re-seeded in each header)
    for start in range(0, len(samples), spb):
        chunk = samples[start : start + spb]
        pred = int(chunk[0])
        blocks.append(struct.pack("<hBB", pred, idx, 0))
        nibbles = []
        for s in chunk[1:]:
            nib, pred, idx = _ima_encode_sample(int(s), pred, idx)
            nibbles.append(nib)
        nibbles += [0] * ((block_align - 4) * 2 - len(nibbles))  # pad tail
        packed = bytes(
            (nibbles[i] & 0xF) | ((nibbles[i + 1] & 0xF) << 4)
            for i in range(0, len(nibbles), 2)
        )
        blocks.append(packed)
    data = b"".join(blocks)
    byte_rate = sample_rate * block_align // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, len(samples))
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _parse_riff_chunks(data: bytes) -> dict[bytes, bytes]:
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    chunks: dict[bytes, bytes] = {}
    off = 12
    while off + 8 <= len(data):
        cid, size = data[off : off + 4], struct.unpack(
            "<I", data[off + 4 : off + 8]
        )[0]
        chunks[cid] = data[off + 8 : off + 8 + size]
        off += 8 + size + (size & 1)  # chunks are word-aligned
    return chunks


def decode_wav_ima_adpcm(data: bytes) -> tuple[np.ndarray, int]:
    """WAV (fmt tag 0x11, mono) → (float64 samples in [-1, 1], rate)."""
    import struct

    chunks = _parse_riff_chunks(data)
    fmt = chunks[b"fmt "]
    tag, channels, rate, _br, block_align = struct.unpack("<HHIIH", fmt[:14])
    if tag != 0x11:
        raise NotImplementedError(f"fmt tag {tag:#x} is not IMA ADPCM")
    if channels != 1:
        raise NotImplementedError("only mono IMA ADPCM supported")
    n_total = None
    if b"fact" in chunks and len(chunks[b"fact"]) >= 4:
        n_total = struct.unpack("<I", chunks[b"fact"][:4])[0]
    raw = chunks[b"data"]
    out: list[int] = []
    for boff in range(0, len(raw) - 3, block_align):
        block = raw[boff : boff + block_align]
        pred, idx, _r = struct.unpack("<hBB", block[:4])
        out.append(pred)
        nibbles = []
        for byte in block[4:]:
            nibbles.append(byte & 0xF)
            nibbles.append(byte >> 4)
        decoded, _p, _i = _ima_decode_nibbles(nibbles, pred, idx)
        out.extend(decoded)
    if n_total is not None:
        out = out[:n_total]
    return np.asarray(out, dtype="float64") / 32768.0, rate


# ---------------------------------------------------------------------------
# G.711 μ-law / A-law (WAV fmt tags 7 / 6) — the telephony codecs.
# Segment-companded 8-bit logarithmic PCM; the encode/decode pair below
# is the canonical CCITT G.711 segment companding, fully vectorized
# (no per-sample Python). Roundtrip property tested in
# tests/test_audio_g711.py: encode(decode(b)) == b for every code byte
# (both laws; μ-law's redundant "negative zero" byte canonicalizes to
# the positive-zero code, as in every real implementation).

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635
# exponent e satisfies biased magnitude in [2^(7+e), 2^(8+e))
_ULAW_EXP_THRESH = np.array([1 << (8 + e) for e in range(7)])
# A-law segment ends in the 13-bit domain (seg e covers mag <= end[e])
_ALAW_SEG_END = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF])


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 samples → μ-law bytes (uint8)."""
    x = np.asarray(samples, dtype=np.int32)
    neg = x < 0
    mag = np.minimum(np.where(neg, -x, x), _ULAW_CLIP) + _ULAW_BIAS
    e = np.searchsorted(_ULAW_EXP_THRESH, mag, side="right")
    m = (mag >> (e + 3)) & 0xF
    raw = np.where(neg, 0x80, 0) | (e << 4) | m
    return (~raw & 0xFF).astype(np.uint8)


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """μ-law bytes → int16 samples."""
    u = (~np.asarray(codes, dtype=np.uint8)).astype(np.int32) & 0xFF
    e = (u >> 4) & 0x7
    m = u & 0xF
    mag = (((m << 3) + _ULAW_BIAS) << e) - _ULAW_BIAS
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 samples → A-law bytes (uint8)."""
    x = np.asarray(samples, dtype=np.int32) >> 3  # 13-bit domain
    neg = x < 0
    mask = np.where(neg, 0x55, 0xD5)
    mag = np.where(neg, -x - 1, x)
    seg = np.searchsorted(_ALAW_SEG_END, mag, side="left")
    m = np.where(seg < 2, (mag >> 1) & 0xF, (mag >> seg) & 0xF)
    return (((seg << 4) | m) ^ mask).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """A-law bytes → int16 samples."""
    a = (np.asarray(codes, dtype=np.uint8) ^ 0x55).astype(np.int32)
    t = (a & 0xF) << 4
    seg = (a >> 4) & 0x7
    t = np.where(
        seg == 0, t + 8,
        np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)),
    )
    # after ^0x55, bit 0x80 set means POSITIVE in A-law
    return np.where(a & 0x80, t, -t).astype(np.int16)


def encode_wav_g711(samples: np.ndarray, sample_rate: int, law: str = "ulaw") -> bytes:
    """int16 mono samples → WAV bytes with fmt tag 7 (μ-law) or 6 (A-law)."""
    import struct

    tag = 7 if law == "ulaw" else 6
    codes = (ulaw_encode if law == "ulaw" else alaw_encode)(samples)
    payload = codes.tobytes()
    fmt = struct.pack("<HHIIHH", tag, 1, sample_rate, sample_rate, 1, 8)
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, len(samples))
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_wav_g711(data: bytes) -> tuple[np.ndarray, int]:
    """WAV (fmt tag 6/7, mono 8-bit) → (float64 samples in [-1,1], rate)."""
    import struct

    chunks = _parse_riff_chunks(data)
    fmt = chunks[b"fmt "]
    tag, channels, rate = struct.unpack("<HHI", fmt[:8])
    if tag not in (6, 7):
        raise NotImplementedError(f"fmt tag {tag:#x} is not G.711")
    if channels != 1:
        raise NotImplementedError("only mono G.711 supported")
    codes = np.frombuffer(chunks[b"data"], dtype=np.uint8)
    if b"fact" in chunks and len(chunks[b"fact"]) >= 4:
        codes = codes[: struct.unpack("<I", chunks[b"fact"][:4])[0]]
    pcm = (ulaw_decode if tag == 7 else alaw_decode)(codes)
    return pcm.astype("float64") / 32768.0, rate
