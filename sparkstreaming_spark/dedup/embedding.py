"""Embedding-cosine near-duplicate pairs.

Three paths, all computing (id_a, id_b, cosine) for cosine >= threshold:

* ``blocked`` (default) — EXACT distributed blocked GEMM. The corpus is
  hash-split into B blocks; every unordered block pair (i <= j) becomes
  one ``applyInPandas`` group holding just those two blocks, and each
  group runs one BLAS GEMM. Nothing corpus-sized ever reaches the driver
  and nothing corpus-sized is broadcast: peak memory per task is two
  blocks, replication factor is B (each row participates in B block
  pairs). All-pairs compute is inherently O(n^2); this shape spreads it
  across the cluster with bounded per-task memory — the layout a
  1000-executor run needs.

* ``driver`` — the small-corpus shortcut: collect + broadcast the full
  L2-normalized matrix, stream candidates through ``mapInPandas``. One
  shuffle-free pass, fastest below ~10^5 vectors, but driver memory is
  the ceiling (~10^6 64-dim float64 vectors = 0.5 GB). Kept for oracle
  cross-checks and small data; NOT the registry default.

* ``lsh_planes=...`` — approximate: random-hyperplane signatures bucket
  the vectors, pair search becomes a signature equi-join + in-bucket
  exact verify. Sub-quadratic compute; recall < 1 by construction.
  ``max_bucket_size`` caps degenerate buckets (e.g. all-zero vectors)
  whose in-bucket verify would go quadratic.

Exact paths are deterministic: cosine in float64, rounded to 6 dp before
the threshold, matching the DuckDB oracle (BLAS vs sequential summation
differ at ~1e-15, far below the rounding grain).

``mode='auto'`` picks the path from a cheap corpus count: blocked exact
GEMM up to ``auto_exact_ceiling`` vectors (default 10^6 — past that the
O(n^2) FLOPs of ANY exact mode stop being worth it, not just driver
memory), capped-bucket LSH beyond. The count is reused as the blocked
path's block-count input, so auto costs no extra job over 'blocked'.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_ROWS_PER_BLOCK = 8192
# past this corpus size exact all-pairs (O(n^2) FLOPs) is no longer the
# right tool regardless of layout; auto mode escalates to bucketed LSH
AUTO_EXACT_CEILING = 1_000_000
AUTO_LSH_PLANES = 16


def _hyperplane(plane_idx: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from md5 bytes."""
    vals: list[float] = []
    i = 0
    while len(vals) < dim:
        h = hashlib.md5(f"{plane_idx}:{i}".encode()).digest()
        for off in range(0, 16, 2):
            if len(vals) >= dim:
                break
            u = int.from_bytes(h[off : off + 2], "big")
            vals.append(u / 32767.5 - 1.0)
        i += 1
    return vals


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
    lsh_planes: int | None = None,
    mode: str = "auto",
    rows_per_block: int = DEFAULT_ROWS_PER_BLOCK,
    n_blocks: int | None = None,
    max_bucket_size: int = 10_000,
    auto_exact_ceiling: int = AUTO_EXACT_CEILING,
) -> DataFrame:
    """(id_a, id_b, cosine) for pairs with cosine >= threshold, id_a < id_b.

    ``mode='auto'`` (default) counts the corpus and picks exact blocked
    GEMM at or below ``auto_exact_ceiling`` vectors, capped-bucket LSH
    (``AUTO_LSH_PLANES`` hyperplanes) beyond — so callers never have to
    know the corpus size in advance. ``mode='blocked'`` forces the exact
    path; ``mode='driver'`` is the broadcast small-corpus path;
    ``lsh_planes`` switches to the approximate bucketed search
    regardless of ``mode``.
    """
    base = df.select(
        F.col(id_col).cast("bigint").alias("vid"), F.col(vec_col).alias("v")
    )

    if lsh_planes:
        return _lsh_pairs(base, threshold, lsh_planes, max_bucket_size)
    if mode == "auto":
        n = base.count()
        if n > auto_exact_ceiling:
            return _lsh_pairs(base, threshold, AUTO_LSH_PLANES,
                              max_bucket_size)
        if n_blocks is None:
            n_blocks = max(1, -(-n // rows_per_block))
        return _blocked_pairs(base, threshold, rows_per_block, n_blocks)
    if mode == "blocked":
        return _blocked_pairs(base, threshold, rows_per_block, n_blocks)
    if mode == "driver":
        return _driver_broadcast_pairs(base, threshold)
    raise ValueError(
        f"unknown mode {mode!r}; use 'auto', 'blocked' or 'driver'"
    )


def _blocked_pairs(
    base: DataFrame,
    threshold: float,
    rows_per_block: int,
    n_blocks: int | None,
) -> DataFrame:
    """Exact all-pairs via block-pair GEMM groups (no driver collect).

    Row with block b is replicated to every group key (min(b,o), max(b,o))
    for o in 0..B-1, so group (i, j) holds exactly blocks i and j. The
    group task GEMMs block-i rows against block-j rows (the full in-block
    triangle when i == j), so every unordered pair is scored exactly once.
    """
    import numpy as np

    if n_blocks is None:
        n = base.count()
        n_blocks = max(1, -(-n // rows_per_block))
    b_lit = int(n_blocks)

    exploded = base.select(
        "vid",
        "v",
        F.pmod(F.xxhash64("vid"), F.lit(b_lit)).alias("blk"),
        F.explode(F.sequence(F.lit(0), F.lit(b_lit - 1))).alias("o"),
    ).select(
        "vid",
        "v",
        "blk",
        F.least("blk", "o").alias("gi"),
        F.greatest("blk", "o").alias("gj"),
    )
    # off-diagonal groups receive each row twice (o hits the partner block
    # once per side); keep one copy per (group, row)
    exploded = exploded.dropDuplicates(["gi", "gj", "vid"])

    def gemm(pdf: pd.DataFrame) -> pd.DataFrame:
        gi = int(pdf["gi"].iloc[0])
        gj = int(pdf["gj"].iloc[0])
        ids = pdf["vid"].to_numpy(dtype="int64")
        M = np.stack(pdf["v"].to_numpy()).astype("float64")
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        M /= norms
        blk = pdf["blk"].to_numpy()
        if gi == gj:
            sims = np.round(M @ M.T, 6)
            rows_i, cols_j = np.nonzero(
                (sims >= threshold) & (ids[:, None] < ids[None, :])
            )
            return pd.DataFrame(
                {
                    "id_a": ids[rows_i],
                    "id_b": ids[cols_j],
                    "cosine": sims[rows_i, cols_j],
                }
            )
        left = blk == gi
        X, x_ids = M[left], ids[left]
        Y, y_ids = M[~left], ids[~left]
        if len(x_ids) == 0 or len(y_ids) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        sims = np.round(X @ Y.T, 6)
        rows_i, cols_j = np.nonzero(sims >= threshold)
        a, b = x_ids[rows_i], y_ids[cols_j]
        return pd.DataFrame(
            {
                "id_a": np.minimum(a, b),
                "id_b": np.maximum(a, b),
                "cosine": sims[rows_i, cols_j],
            }
        )

    return exploded.groupBy("gi", "gj").applyInPandas(
        gemm, schema="id_a bigint, id_b bigint, cosine double"
    )


def _driver_broadcast_pairs(base: DataFrame, threshold: float) -> DataFrame:
    """Small-corpus path: one driver collect + broadcast GEMM. Ceiling
    ~10^6 vectors (0.5 GB at 64-dim float64) — use 'blocked' beyond that."""
    import numpy as np

    spark = base.sparkSession
    pdf = base.toPandas()
    ids = pdf["vid"].to_numpy(dtype="int64")
    M = np.stack(pdf["v"].to_numpy()).astype("float64")
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, M))

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_m = bc.value
        for chunk in batches:
            x_ids = chunk["vid"].to_numpy(dtype="int64")
            X = np.stack(chunk["v"].to_numpy()).astype("float64")
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            sims = np.round(X @ all_m.T, 6)
            rows_i, cols_j = np.nonzero(
                (sims >= threshold) & (x_ids[:, None] < all_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": x_ids[rows_i],
                    "id_b": all_ids[cols_j],
                    "cosine": sims[rows_i, cols_j],
                }
            )

    many = base.repartition(spark.sparkContext.defaultParallelism)
    return many.mapInPandas(block, schema="id_a bigint, id_b bigint, cosine double")


def _lsh_pairs(
    base: DataFrame, threshold: float, planes: int, max_bucket_size: int = 10_000
) -> DataFrame:
    """Signature-bucketed pair search (approximate): equi-join on the
    hyperplane sign signature, exact cosine verify inside buckets.

    Buckets larger than ``max_bucket_size`` are dropped before the
    self-join: a degenerate bucket (e.g. all-zero vectors all hashing to
    signature 0) would make the in-bucket verify quadratic on that key.
    Dropping is a documented recall trade — at scale, re-bucket hot keys
    with more planes instead of raising the cap.
    """
    from ..functions.vectors import cosine_similarity

    dim = len(base.select("v").first()["v"])
    sig = None
    for j in range(planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(j, dim)])
        d = F.aggregate(
            F.zip_with(F.col("v").cast("array<double>"), plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    banded = base.withColumn("sig", sig.cast("bigint"))
    sizes = banded.groupBy("sig").agg(F.count("*").alias("bucket_n"))
    banded = (
        banded.join(F.broadcast(sizes), "sig")
        .filter(F.col("bucket_n") <= max_bucket_size)
        .drop("bucket_n")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cos = cosine_similarity(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, (F.col("a.sig") == F.col("b.sig")) & (F.col("a.vid") < F.col("b.vid")))
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            "cosine",
        )
    )
