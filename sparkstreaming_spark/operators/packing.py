"""Training-sequence packing and corpus-mixing operators.

The last mile of an LLM data pipeline: curated documents must become
fixed-length training sequences drawn with the right source mixture and
a reproducible order. All three operators here are deterministic,
shuffle-light, and exactly mirrorable in ANSI SQL (so they carry DuckDB
oracles like any relational op).

* ``pack_sequences`` — concat-then-chunk packing (the standard GPT-style
  recipe): within each hash shard, documents are laid end-to-end in a
  deterministic order and the token stream is cut every ``budget``
  tokens. A document spanning a cut belongs to every sequence it
  touches. Shards are independent packing streams — exactly how a
  multi-worker training job shards its data — so the whole operator is
  one window cumsum per shard: no global sort, no driver state, and the
  shard count is the parallelism knob at 100 TB.

* ``mixture_fractions`` — temperature-flattened source mixing
  (p_s ∝ n_s^alpha, alpha<1 upweights low-resource sources), returning
  per-source sampling fractions for a target budget. Pure aggregate
  arithmetic on a source-count table (tiny), then a deterministic
  hash-threshold sample per source — same md5-bucket convention as
  operators/sampling.py, so cross-engine reproducible.

* ``upsample_repeats`` — epoch-repeat upsampling: each document appears
  ceil(target_weight) times with an epoch index (explode over a
  sequence; deterministic, no RNG). The count column mirrors
  generate_series in the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_64


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str | Column,
    budget: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """Assign each document to the training sequences it occupies.

    Output: (shard, doc_id, n_tokens, start_offset, seq_first, seq_last)
    where offsets are token positions within the shard's concatenated
    stream and seq ids are ``offset // budget``. Deterministic: shard =
    md5-hash of id, order within shard = doc_id.
    """
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col).alias("doc_id"),
        toks.cast("bigint").alias("n_tokens"),
        F.pmod(md5_64(F.concat(F.lit("shard"), F.col(id_col).cast("string"))), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    cum = F.sum("n_tokens").over(w)
    # integer `div`, not floor(double/…): token offsets are bigint and a
    # 100 TB stream passes 2^53 where double division silently rounds
    return base.select(
        "shard",
        "doc_id",
        "n_tokens",
        (cum - F.col("n_tokens")).alias("start_offset"),
    ).select(
        "shard",
        "doc_id",
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {int(budget)}").alias("seq_first"),
        F.expr(f"(start_offset + n_tokens - 1) div {int(budget)}").alias("seq_last"),
    )


def pack_sequences_oracle(budget: int = 2048, n_shards: int = 8) -> str:
    """DuckDB twin of pack_sequences over the documents table (token
    proxy: n_chars//4, matching the registry query)."""
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(n_chars // 4 AS BIGINT) AS n_tokens,
         CAST(((CAST(('0x' || substr(md5(concat('shard', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
               % {n_shards}) + {n_shards}) % {n_shards} AS INT) AS shard
  FROM documents
), cums AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
  FROM base
)
SELECT shard, doc_id, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_offset,
       CAST((cum - n_tokens) // {budget} AS BIGINT) AS seq_first,
       CAST((cum - 1) // {budget} AS BIGINT) AS seq_last
FROM cums
"""


def mixture_fractions(
    df: DataFrame,
    source_col: str,
    alpha: float = 0.5,
    target_rows: int = 1000,
) -> DataFrame:
    """Per-source temperature mixture: (source, n_rows, weight, fraction)
    with weight = n^alpha / sum(n^alpha) and fraction the per-row keep
    probability min(1, target*weight/n). The aggregate is tiny
    (|sources| rows) — compute once, broadcast into the sampler."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    # global window over the ALREADY-AGGREGATED counts (|sources| rows):
    # normalizing via a second aggregate would re-scan the source column;
    # this form reads it once and the single-partition exchange moves only
    # the tiny count table
    total_w = F.sum(F.pow(F.col("n_rows").cast("double"), alpha)).over(
        Window.partitionBy()
    )
    w = F.pow(F.col("n_rows").cast("double"), alpha) / total_w
    return counts.select(
        "source",
        "n_rows",
        F.round(w, 9).alias("weight"),
        F.round(
            F.least(F.lit(1.0), target_rows * w / F.col("n_rows")), 9
        ).alias("fraction"),
    )


def upsample_repeats(
    df: DataFrame,
    id_col: str,
    repeats_col: str | Column,
) -> DataFrame:
    """Repeat each row ``repeats`` times with an epoch index 1..repeats —
    deterministic low-resource upsampling (explode over sequence; the
    narrow 1→N map shape, no shuffle)."""
    reps = F.col(repeats_col) if isinstance(repeats_col, str) else repeats_col
    return df.withColumn(
        "epoch", F.explode(F.sequence(F.lit(1), reps.cast("int")))
    )
