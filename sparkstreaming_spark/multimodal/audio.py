"""Audio blob processing: real WAV (RIFF/PCM) decode and linear
resampling over Arrow batches — the audio leg of the multimodal surface
(images: codecs.py; video frame sampling: blobs.py).

WAV/PCM is decoded with the stdlib `wave` module + NumPy frombuffer —
a REAL codec with zero external dependencies, so unlike the compressed
audio slot (mp3/opus need ffmpeg-class libs, marked NotImplementedError)
this path is fully exercised in tests. Resampling is deterministic
linear interpolation at fixed float64 precision.

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
    Supports 8/16/32-bit PCM; multi-channel input is averaged to mono."""
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
                    samples, rate = decode_wav(raw)
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
                    samples, _rate = decode_wav(raw)
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
