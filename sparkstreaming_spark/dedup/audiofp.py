"""Acoustic fingerprint (chromaprint-shaped) + Hamming near-dup pairing
— completes the multimodal dedup triad (text: simhash/minhash, image:
phash, audio: this).

Reference parity: north-star multimodal-curation extension (the
reference has no media surface); the pairing leg reuses
dedup/phash.py's generic banding equi-join.

Chromaprint's shape — frame the signal, measure per-band spectral
energy, emit bits from energy comparisons on the (band × time) image —
is kept, but re-derived in PURE 64-bit INTEGER arithmetic so a SQL
oracle replays every bit:

- 2048 samples → 16 non-overlapping frames of 128;
- per frame, 8 band energies via an integer Goertzel: E[f,b] =
  (Σ_n x·C[n,b])² + (Σ_n x·S[n,b])² with fixed-point tables
  C/S[n,b] = round(128·cos/sin(2π·(b+1)·n/128)) computed ONCE here and
  embedded as literals in both engines (no libm drift);
- 64 bits: bit(f,c) = 1 iff E[f,2c] > E[f,2c+1] for c∈[0,4) — the
  adjacent-band comparison filter, position f·4+c.

Overflow audit: |x| ≤ 2¹⁴, |C| ≤ 2⁷, Σ over 128 → |Σ x·C| < 2²⁸;
squared < 2⁵⁶; sum of two < 2⁵⁷ — comfortably inside int64.

Scale shape (100 TB): fingerprinting is one narrow Arrow mapInPandas
pass per audio blob (decode → fingerprint, embarrassingly parallel, no
shuffle); pairing is the 4×16-bit banding equi-join with
pigeonhole-exact recall for Hamming ≤ 3 (phash.phash_near_dup_pairs).
"""

from __future__ import annotations

import math

import numpy as np

AFP_FRAME = 128
AFP_FRAMES = 16
AFP_BANDS = 8
AFP_SCALE = 128
N_SAMPLES = AFP_FRAME * AFP_FRAMES


def _build_tables() -> tuple[list[list[int]], list[list[int]]]:
    cos_t = [
        [
            int(round(AFP_SCALE * math.cos(2 * math.pi * (b + 1) * n / AFP_FRAME)))
            for b in range(AFP_BANDS)
        ]
        for n in range(AFP_FRAME)
    ]
    sin_t = [
        [
            int(round(AFP_SCALE * math.sin(2 * math.pi * (b + 1) * n / AFP_FRAME)))
            for b in range(AFP_BANDS)
        ]
        for n in range(AFP_FRAME)
    ]
    return cos_t, sin_t


AFP_COS, AFP_SIN = _build_tables()
_COS = np.array(AFP_COS, dtype=np.int64)  # (128, 8)
_SIN = np.array(AFP_SIN, dtype=np.int64)


def audio_fingerprint64(samples: np.ndarray) -> int:
    """64-bit acoustic fingerprint of a 2048-sample PCM clip.

    Integer-exact: frames × fixed-point Goertzel band energies ×
    adjacent-band comparison bits. Returns a signed 64-bit int."""
    x = samples.astype(np.int64)
    if x.shape != (N_SAMPLES,):
        raise ValueError(f"expected {N_SAMPLES} samples, got {x.shape}")
    fr = x.reshape(AFP_FRAMES, AFP_FRAME)
    re = fr @ _COS  # (16, 8)
    im = fr @ _SIN
    e = re * re + im * im
    bits = np.uint64(0)
    for f in range(AFP_FRAMES):
        for c in range(AFP_BANDS // 2):
            if e[f, 2 * c] > e[f, 2 * c + 1]:
                bits |= np.uint64(1) << np.uint64(f * 4 + c)
    return int(bits.astype(np.int64))


def afp_table_sql(alias: str = "afp") -> str:
    """The fixed-point cos/sin basis as a SQL VALUES table
    `(n, b, c, s)` — the SAME integers the Spark path uses."""
    rows = ", ".join(
        f"({n}, {b}, {AFP_COS[n][b]}, {AFP_SIN[n][b]})"
        for n in range(AFP_FRAME)
        for b in range(AFP_BANDS)
    )
    return f"(VALUES {rows}) AS {alias}(n, b, c, s)"
