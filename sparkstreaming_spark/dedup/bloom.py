"""Distributed Bloom-filter membership gate — the broadcast-bitmap
pattern for screening a huge stream/corpus against a reference set
(decontamination against a benchmark, incremental-crawl "have we seen
this page" gates, blocklist membership) without shuffling the probe
side at all.

Construction: k positions per key via Kirsch-Mitzenmacher double
hashing pos_i = (h1 + i*h2) mod m over two salted md5_64 hashes — md5
so the DuckDB oracle reproduces every bit. The reference set reduces
to its distinct bit positions (≤ m rows — a BOUNDED aggregate
regardless of corpus size), which fold into the probe plan as an
m-bit bitmap literal (32 bits per bigint word, sign-safe); membership
is then an IN-ROW codegen'd bit test — zero shuffle, zero join on the
probe side. This is exactly why real pipelines Bloom-gate at 100 TB:
the reference set costs ONE bounded aggregate + m/8 bytes of
broadcast, and the probe pass is embarrassingly parallel.

False positives are the designed trade: a probe key can hit k set
bits without membership (rate ≈ (1 - e^(-kn/m))^k). The suite query
measures the realized FP count against exact membership — both sides
deterministic, so even the FPs are oracle-checked.

Reference parity: no sketch surface exists in the reference repo
(three KPI jobs); north-star extension alongside CMS/HLL
(textstats/cms.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_64


def bloom_positions(col: Column, m: int, k: int, salt: str) -> list[Column]:
    """k bit positions for a key via double hashing (h1 + i*h2) mod m.
    h1, h2 < 2^60 and i < k keep the sum inside int64."""
    h1 = md5_64(F.concat(F.lit(salt + ":1:"), col))
    h2 = md5_64(F.concat(F.lit(salt + ":2:"), col))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)]


def bloom_build_words(
    corpus: DataFrame, key_col: str, m: int = 4096, k: int = 3,
    salt: str = "bloom",
) -> list[int]:
    """Build the bitmap: → list of m/32 ints (32 bits per word). The
    distinct-position aggregate is bounded by m, so the collect is a
    fixed-size driver transfer no matter the corpus size."""
    if m % 32:
        raise ValueError("m must be a multiple of 32")
    pos = corpus.select(
        F.explode(
            F.array(*bloom_positions(F.col(key_col), m, k, salt))
        ).alias("p")
    ).distinct()
    words = [0] * (m // 32)
    for r in pos.collect():  # <= m rows by construction
        p = int(r["p"])
        words[p // 32] |= 1 << (p % 32)
    return words


def bloom_gate(
    corpus: DataFrame,
    corpus_key: str,
    probe: DataFrame,
    probe_key: str,
    m: int = 4096,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """probe + boolean `bloom_hit`: true iff every one of the key's k
    bit positions is set in the bitmap built from corpus[corpus_key].
    No false negatives; false positives at the designed rate."""
    words = bloom_build_words(corpus, corpus_key, m, k, salt)
    wl = F.array(*[F.lit(w).cast("bigint") for w in words])
    hit = F.lit(True)
    for pos in bloom_positions(F.col(probe_key), m, k, salt):
        word = F.element_at(wl, (pos / 32).cast("int") + 1)
        # variable right-shift via exact power-of-two division (words
        # are 32-bit, well inside double precision; scaling by 2^s is
        # exact, so floor == the shifted value)
        shifted = F.floor(
            word / F.pow(F.lit(2.0), F.pmod(pos, F.lit(32)))
        ).cast("bigint")
        hit = hit & (F.pmod(shifted, F.lit(2)) == 1)
    return probe.withColumn("bloom_hit", hit)


def adaptive_bits(n_keys: int, floor_m: int = 16384) -> int:
    """Corpus-adaptive Bloom size: ~10 bits per key (≈1% FPR at k=3),
    floored at `floor_m` and rounded up to a 32-bit word boundary.
    A FIXED m saturates to all-ones once the corpus outgrows it and the
    filter degenerates to 'drop everything'; this keeps the designed
    FPR at any corpus size while staying byte-identical to the floor
    for small corpora (so differential oracles replay unchanged)."""
    return ((max(floor_m, 10 * n_keys) + 31) // 32) * 32
