"""Perceptual image hashing (64-bit DCT pHash) + Hamming band-join
near-duplicate pairing — the LAION/DataComp-style image-dedup pass.

Reference parity: north-star multimodal-curation extension (the
reference, Consumer.scala/Producer.scala, has no media surface at all);
this composes the repo's existing pieces — lossless image codecs
(multimodal/gif.py, png in blobs.py) for the decode leg and the
banding-pigeonhole pairing already proven for text in dedup/simhash.py.

Design for oracle exactness: the classic pHash pipeline (resize →
2-D DCT → median threshold) is re-derived in PURE 64-bit INTEGER
arithmetic so a SQL oracle can replay every bit:

- resize 64×64 → 32×32 is an exact 2×2 block mean (sum // 4);
- the DCT basis is a fixed-point table C[x][u] =
  round(2^15 · cos((2x+1)·u·π / 64)) computed ONCE here in Python and
  embedded as integer literals into both the Spark path and the SQL
  oracle, so there is no libm drift between engines;
- coefficient magnitude bound: 255 · 2^15 · 2^15 · 1024 = 255 · 2^40
  ≈ 2.8e14 < 2^63, so the Σ g·C·C accumulation never overflows int64;
- the threshold is the 32nd-smallest of the 64 low-frequency
  coefficients (a tie-order-independent order statistic — NOT a
  float median), and bit b=8u+v is set iff coef[u,v] > threshold.

Scale shape (100 TB): hashing is one narrow Arrow `mapInPandas` pass
per blob — embarrassingly parallel, no shuffle. Pairing splits the
64-bit hash into `bands` equal slices and equi-joins on
(band_id, band_value): by pigeonhole, two hashes within Hamming
distance (bands − 1) must agree on at least one slice, so the default
4×16-bit banding has EXACT recall for Hamming ≤ 3 with zero O(n²)
work — the oracle's brute-force all-pairs comparison doubles as the
recall contract (band-join result == exact result, not ⊆).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DCT_SCALE = 1 << 15
GRID = 32  # downsampled image side
LOWF = 8   # low-frequency block side (8×8 → 64-bit hash)
N_BITS = LOWF * LOWF


def _build_dct_table() -> list[list[int]]:
    """C[x][u] = round(2^15 · cos((2x+1)·u·π / (2·GRID))), x∈[0,32), u∈[0,8)."""
    return [
        [
            int(round(DCT_SCALE * math.cos((2 * x + 1) * u * math.pi / (2 * GRID))))
            for u in range(LOWF)
        ]
        for x in range(GRID)
    ]


DCT_TABLE: list[list[int]] = _build_dct_table()
_DCT_MAT = np.array(DCT_TABLE, dtype=np.int64)  # (32, 8)


def _block_mean32(gray64: np.ndarray) -> np.ndarray:
    """Exact 2×2 block mean (sum // 4): 64×64 uint8 → 32×32 int64."""
    g = gray64.astype(np.int64)
    if g.shape != (64, 64):
        raise ValueError(f"expected 64x64, got {g.shape}")
    return (g[0::2, 0::2] + g[0::2, 1::2] + g[1::2, 0::2] + g[1::2, 1::2]) // 4


def dhash64(gray64: np.ndarray) -> int:
    """64-bit gradient (difference) hash of a 64×64 grayscale image —
    the integer-exact second opinion the composite near-dup detector
    pairs with `phash64`.

    Pipeline (all exact integer, SQL-replayable): 2×2 block mean →
    32×32, then an 8×8 grid of 4×4 block SUMS, then bit r·8+c is set
    iff grid[r][c] > grid[r][(c+1) mod 8] (horizontal gradient sign
    with wraparound, keeping all 64 bits meaningful). Sums stay below
    255·16 — no overflow anywhere.

    Why it complements pHash: pHash thresholds GLOBAL DCT coefficients,
    so a local edit can flip several bits whose coefficients sit near
    the median; dHash bits are LOCAL comparisons, so an edit confined
    to one grid cell can flip at most the two comparisons that touch
    it. Requiring BOTH hashes to be close keeps single-region edits
    (true near-dups) while rejecting globally-similar-but-different
    images that leak through a looser pHash threshold alone.
    """
    m = _block_mean32(gray64)
    gg = m.reshape(8, 4, 8, 4).sum(axis=(1, 3))  # 8×8 block sums
    nxt = np.roll(gg, -1, axis=1)
    setbits = (gg > nxt).reshape(-1)
    bits = np.uint64(0)
    for b in range(N_BITS):
        if setbits[b]:
            bits |= np.uint64(1) << np.uint64(b)
    return int(bits.astype(np.int64))


def phash64(gray64: np.ndarray) -> int:
    """64-bit perceptual hash of a 64×64 grayscale image (values 0..255).

    Exact integer pipeline: 2×2 block mean → 32×32, fixed-point 8×8
    low-frequency DCT, threshold at the 32nd-smallest coefficient.
    Returns a signed 64-bit int (two's complement — bit 63 may be set).
    """
    m = _block_mean32(gray64)
    # coef[u, v] = Σ_x Σ_y m[x, y] · C[x][u] · C[y][v]
    coef = _DCT_MAT.T @ m @ _DCT_MAT  # (8, 8) int64, no overflow (see module doc)
    flat = coef.reshape(-1)
    thr = np.sort(flat)[N_BITS // 2 - 1]  # 32nd smallest, tie-order independent
    bits = np.uint64(0)
    for b in range(N_BITS):
        if flat[b] > thr:
            bits |= np.uint64(1) << np.uint64(b)
    return int(bits.astype(np.int64))


def dct_table_sql(alias: str = "ctab") -> str:
    """The fixed-point DCT basis as a SQL VALUES table `(x, u, c)` —
    the SAME integers the Spark path uses, so the oracle replays the
    transform bit-for-bit."""
    rows = ", ".join(
        f"({x}, {u}, {DCT_TABLE[x][u]})"
        for x in range(GRID)
        for u in range(LOWF)
    )
    return f"(VALUES {rows}) AS {alias}(x, u, c)"


def phash_near_dup_pairs(
    fp: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """(doc_a, doc_b, hamming) for hash pairs within `max_hamming`.

    Banding equi-join (no cross join): each 64-bit hash explodes into
    `bands` (band_id, band_value) slices; candidates share a slice;
    the exact Hamming distance (bit_count of xor — JVM-side, codegen)
    filters to ≤ max_hamming. Pigeonhole guarantees EXACT recall when
    max_hamming ≤ bands − 1. Shuffle payload is `bands` rows per image,
    keyed by 16-bit band values — uniform unless the corpus is
    degenerate (many identical hashes hot-spot one bucket; AQE skew
    handling applies)."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"banding guarantees recall only for hamming <= bands-1 "
            f"({bands - 1}), got max_hamming={max_hamming}"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    # localCheckpoint (lazy): the hash DF feeds both sides of the band
    # self-join — without materialization the (expensive) decode+hash
    # Arrow pass would execute twice. Unlike persist(), the checkpoint
    # blocks are NOT pinned by the CacheManager: they are reclaimed by
    # the ContextCleaner as soon as the frame is garbage-collected, so
    # long multi-query sessions don't accumulate cached hash frames.
    fp = fp.localCheckpoint(eager=False)
    slices = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftrightunsigned(F.col(hash_col), b * width)
                .bitwiseAND(F.lit(mask))
                .alias("band_val"),
            )
            for b in range(bands)
        ]
    )
    banded = fp.select(
        F.col(id_col).alias("doc_id"),
        F.col(hash_col).alias("h"),
        F.explode(slices).alias("s"),
    ).select("doc_id", "h", "s.band_id", "s.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.h").alias("ha"),
            F.col("b.h").alias("hb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def banded_pair_candidates(
    fp: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    max_hamming: int = 6,
    bands: int = 8,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_a, doc_b, hamming [, <c>_a, <c>_b …]) for pairs within
    `max_hamming` — the WIDER-radius sibling of `phash_near_dup_pairs`,
    joined on band PAIRS so the shuffle keys stay wide at scale.

    Single-band pigeonhole needs `bands > max_hamming`, and at Hamming
    ≤ 6 that would mean 8-bit band values — only 256 buckets, so bucket
    population grows O(n/256) and candidate pairs O(n²/256): a scale
    killer. Instead: split into 8 × 8-bit slices, but EQUI-JOIN on all
    C(8,2) = 28 ordered PAIRS of slices (a 16-bit composite key). If
    hamming ≤ bands − 2, at least two slices are untouched, so some
    clean pair matches — recall stays pigeonhole-EXACT for Hamming ≤ 6
    while bucket cardinality returns to 2^16 per key-id. Shuffle payload
    is 28 small rows per item; no O(n²) anywhere.

    `carry` columns (e.g. a secondary hash) ride along the explode and
    come back suffixed `_a` / `_b`, so a composite detector can filter
    candidates without re-joining the corpus.
    """
    if max_hamming > bands - 2:
        raise ValueError(
            f"pair-banding guarantees recall only for hamming <= bands-2 "
            f"({bands - 2}), got max_hamming={max_hamming}"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    # lazy localCheckpoint: both join sides reuse one materialization of
    # the (expensive) upstream hash pass; blocks are GC-reclaimed (see
    # phash_near_dup_pairs)
    fp = fp.localCheckpoint(eager=False)

    def sl(b: int):
        return F.shiftrightunsigned(F.col(hash_col), b * width).bitwiseAND(
            F.lit(mask)
        )

    slices = F.array(
        *[
            F.struct(
                F.lit(b1 * bands + b2).alias("band_id"),
                (sl(b1) * F.lit(mask + 1) + sl(b2)).alias("band_val"),
            )
            for b1 in range(bands)
            for b2 in range(b1 + 1, bands)
        ]
    )
    banded = fp.select(
        F.col(id_col).alias("doc_id"),
        F.col(hash_col).alias("h"),
        *[F.col(c) for c in carry],
        F.explode(slices).alias("s"),
    ).select("doc_id", "h", *carry, "s.band_id", "s.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.h").alias("ha"),
            F.col("b.h").alias("hb"),
            *[F.col(f"a.{c}").alias(f"{c}_a") for c in carry],
            *[F.col(f"b.{c}").alias(f"{c}_b") for c in carry],
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int").alias("hamming"),
        *[f"{c}_a" for c in carry],
        *[f"{c}_b" for c in carry],
    ).filter(F.col("hamming") <= max_hamming)
