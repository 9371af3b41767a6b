"""Count-min sketch frequency estimation (per-group, mergeable).

Complements the frequency toolkit: heavy_hitters.py answers "which items
are frequent" (exact partial-agg or Misra-Gries); this answers "how
frequent is ANY given item" from a fixed-size summary that can be built
once and queried forever — the shape a 100 TB profiling pass wants, since
the full item→count map is too big to keep but an eps-accurate sketch is
a few KB per group.

Spark-first: the sketch is built by the built-in `count_min_sketch`
aggregate — JVM-side, mergeable (partials combine map-side like any
algebraic aggregate), one shuffle whose payload is the sketch bytes per
group, NOT the token stream. Querying uses Spark's public
`org.apache.spark.util.sketch.CountMinSketch.readFrom` via the gateway —
the same class that produced the bytes, so estimates are exact-format
round trips, deterministic for a fixed seed.

Guarantees (standard CMS): estimate >= true count, and
estimate <= true + eps * total with probability >= confidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_token_sketches(
    df: DataFrame,
    group_col: str,
    item_col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """(group, sketch_bytes, n_items) — one CMS per group over items."""
    return df.groupBy(group_col).agg(
        F.expr(
            f"count_min_sketch({item_col}, {eps}d, {confidence}d, {seed})"
        ).alias("sketch"),
        F.count(item_col).alias("n_items"),
    )


def estimate_counts(
    spark, sketches_df: DataFrame, group_col: str, probes: list[str]
) -> DataFrame:
    """Query each group's sketch for the probe items, driver-side.

    The sketches frame is tiny (one row per group) — collecting it is the
    point of the data structure; probing never touches the corpus."""
    jvm = spark.sparkContext._jvm
    rows = []
    for r in sketches_df.collect():
        cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            bytes(r["sketch"])
        )
        for p in probes:
            rows.append(
                (r[group_col], p, int(cms.estimateCount(p)), int(r["n_items"]))
            )
    return spark.createDataFrame(
        rows, f"{group_col} string, item string, est_count bigint, n_items bigint"
    )
