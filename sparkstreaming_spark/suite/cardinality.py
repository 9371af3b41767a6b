"""Cardinality & approximate-query-processing suite: exact distinct via
Roaring-style bitmaps, mergeable HLL sketch rollups, and deterministic
hash-sample estimation with error bars.

These are the three standard answers to "how many distinct / how much,
cheaply?" at 100 TB (none exist in the reference — its analytic surface
is count/sum KPIs, Consumer.scala:127-149):

* exact distinct normally shuffles every distinct (group, id) pair;
  the bitmap two-level aggregate ships fixed-size bitmap partials
  instead — exact answer, sketch-sized shuffle for dense int keys;
* HLL sketches make distinct counts MERGEABLE: pre-aggregate per
  (group, day) once, roll up to any coarser grain without touching the
  fact table again;
* deterministic hash sampling (engine-wide md5 convention,
  operators/sampling.py) gives estimate + stderr from a p% scan, and —
  because the sample predicate is pure hash arithmetic — the DuckDB
  oracle draws the IDENTICAL sample, so even the "approximate" path is
  bit-exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import _BUCKETS as _SAMPLE_BUCKETS
from ..operators.sampling import hash_bucket
from ..sources.batch import read_table
from . import QuerySpec

SAMPLE_SALT = "aqp-v1"
SAMPLE_FRACTION = 0.10


def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event_type via bitmap aggregation
    (bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg —
    the Snowflake/ClickHouse bitmap-index trick as Spark 3.5+ built-ins).

    Plan shape: the first aggregate ORs bit positions into one bitmap
    per (event_type, bucket) with map-side partial merge — the shuffle
    carries ≤ one 4 KB bitmap per group per partition, never user ids;
    the second aggregate sums popcounts. At 100 TB with dense int keys
    this is the exact-distinct plan you want: count_distinct's expand
    shuffles every distinct pair, this shuffles fixed-size bitmaps."""
    ev = read_table(spark, sf_dir, "events")
    bm = ev.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("bkt")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    return bm.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("n_users")
    )


ORACLE_BITMAP_DISTINCT = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


# lgK=14 HLL relative standard error = 1.04 / sqrt(2^14) ≈ 0.81 %
_HLL_RSD_LG14 = 1.04 / (2**14) ** 0.5


def q_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count rollup: one pass builds a Datasketches
    HLL sketch per (event_type, day); the rollup UNIONS sketches per
    event_type without re-reading events — the pre-aggregation pattern
    that makes dashboard distinct counts O(groups), not O(fact table),
    at every grain.

    Oracle contract (the evt_approx_percentiles pattern): the verified
    OUTPUT is the exact distinct count (DuckDB-computable) plus a
    `within_3sigma` boolean derived FROM the sketch union — the sketch
    path stays load-bearing (a broken union/estimate flips the boolean
    and the hash mismatches), while every emitted value is
    deterministic. The exact column doubles as the error denominator;
    at 100 TB you'd drop it and ship the estimate alone."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    approx = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return approx.join(exact, "event_type").select(
        "event_type",
        "n_days",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 3 * _HLL_RSD_LG14 * F.col("exact_users")
        ).alias("within_3sigma"),
    )


ORACLE_HLL_UNION = """
SELECT event_type,
       count(DISTINCT date_trunc('day', ts)) AS n_days,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS within_3sigma
FROM events GROUP BY event_type
"""


def _sample_pred():
    # the engine-wide deterministic-sampling convention, reused —
    # operators/sampling.py::hash_bucket IS the definition
    return hash_bucket("event_id", SAMPLE_SALT) < int(
        SAMPLE_FRACTION * _SAMPLE_BUCKETS
    )


def q_sampled_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregation from a deterministic 10 % hash sample:
    per event_type, sample size, estimated mean value, and the standard
    error (stddev_samp / sqrt(n)) — the AQP pattern for interactive
    estimates over 100 TB where the full scan is the cost ceiling.

    The sample predicate is md5 arithmetic on event_id (engine-wide
    convention), so it pushes to the scan as a codegen'd filter, never
    needs RNG state, is stable under repartitioning/growth — and the
    DuckDB oracle draws the SAME rows, making this "approximate" query
    hash-comparable exactly."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.filter(_sample_pred())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.avg("value"), 6).alias("est_mean"),
            F.round(
                F.stddev_samp("value") / F.sqrt(F.count(F.lit(1))), 6
            ).alias("stderr"),
        )
    )


_SQL_SAMPLE_PRED = (
    f"cast(('0x' || substr(md5('{SAMPLE_SALT}' || CAST(event_id AS VARCHAR)),"
    f" 1, 15)) AS bigint) % {_SAMPLE_BUCKETS}"
    f" < {int(SAMPLE_FRACTION * _SAMPLE_BUCKETS)}"
)

ORACLE_SAMPLED_MEAN = f"""
SELECT event_type,
       count(*) AS n_sampled,
       round(avg(value), 6) AS est_mean,
       round(stddev_samp(value) / sqrt(count(*)), 6) AS stderr
FROM events
WHERE {_SQL_SAMPLE_PRED}
GROUP BY event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "evt_bitmap_distinct": QuerySpec(
        q_bitmap_distinct,
        ORACLE_BITMAP_DISTINCT,
        "exact distinct via two-level bitmap aggregate (sketch-sized shuffle)",
    ),
    "evt_hll_union": QuerySpec(
        q_hll_union,
        ORACLE_HLL_UNION,
        "mergeable HLL rollup: exact count + sketch-derived 3-sigma bound",
    ),
    "evt_sampled_mean": QuerySpec(
        q_sampled_mean,
        ORACLE_SAMPLED_MEAN,
        "AQP: deterministic 10% hash sample, mean + stderr, oracle-exact",
    ),
}


def q_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users over SLIDING windows (1 h window, 15 min
    slide): the overlap means each event belongs to 4 windows — Spark's
    window() generator expands in-row (Expand node, narrow) before ONE
    hash aggregate on (window, distinct user). At 100 TB the expansion
    factor is window/slide (4x here), a constant; the aggregate state is
    bounded by windows x users-per-window, and count_distinct partial
    aggregation dedupes map-side before the shuffle."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count_distinct("user_id").alias("n_users"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_users",
        )
    )


# each event belongs to the 4 slide-grid windows whose start is within
# (ts - 1h, ts]; DuckDB mirrors the in-row expansion with a series join
ORACLE_SLIDING_DISTINCT = """
WITH x AS (
  SELECT user_id,
         time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
           AS wstart
  FROM events, generate_series(0, 3) AS g(k)
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
       count(DISTINCT user_id) AS n_users
FROM x GROUP BY wstart
"""


QUERIES["evt_sliding_distinct"] = QuerySpec(
    q_sliding_distinct,
    ORACLE_SLIDING_DISTINCT,
    "exact distinct over sliding windows (in-row Expand, one aggregate)",
)


BOOT_REPS = 32
# cumulative CDF of Poisson(1): a hash-uniform u maps to the replica
# weight by inverse transform — the standard "Poisson bootstrap" that
# needs no global row numbering and no sampling coordination
_POISSON_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for mean(value) per
    event_type: 32 replicas, each row's per-replica multiplicity drawn
    by inverse-CDF from a deterministic hash (so the whole resampling
    plan is a pure projection — no state, no shuffle beyond the final
    aggregate, reproducible across engines AND partitionings). This is
    the one-pass bootstrap used at warehouse scale: fan-out is a narrow
    in-row explode (x32), replica means are one hash aggregate, and the
    CI is an exact percentile over the 32-value replica distribution."""
    from ..functions.text import md5_64

    ev = read_table(spark, sf_dir, "events")
    reps = ev.select(
        "event_type",
        "value",
        "event_id",
        F.explode(F.expr(f"sequence(0, {BOOT_REPS - 1})")).alias("b"),
    )
    u = (
        md5_64(
            F.concat(
                F.lit("boot:"),
                F.col("event_id").cast("string"),
                F.lit(":"),
                F.col("b").cast("string"),
            )
        )
        % 2147483647
        + 1
    ) / 2147483647.0
    w = F.lit(6)
    for k in range(len(_POISSON_CDF) - 1, -1, -1):
        w = F.when(u < _POISSON_CDF[k], k).otherwise(w)
    rm = (
        reps.select("event_type", "b", F.col("value").alias("v"), w.alias("w"))
        .groupBy("event_type", "b")
        .agg(F.round(F.sum(F.col("w") * F.col("v")) / F.sum("w"), 9).alias("m"))
    )
    return rm.groupBy("event_type").agg(
        F.round(F.avg("m"), 6).alias("boot_mean"),
        F.round(F.percentile("m", F.lit(0.025)), 6).alias("ci_lo"),
        F.round(F.percentile("m", F.lit(0.975)), 6).alias("ci_hi"),
    )


def _oracle_bootstrap() -> str:
    cases = " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(_POISSON_CDF)
    )
    return f"""
WITH reps AS (
  SELECT event_type, value, event_id, k AS b
  FROM events, generate_series(0, {BOOT_REPS - 1}) AS g(k)
),
weighted AS (
  SELECT event_type, b, value AS v,
         (CASE {cases} ELSE 6 END) AS w
  FROM (
    SELECT *,
           (cast(('0x' || substr(md5('boot:' || cast(event_id AS varchar)
                || ':' || cast(b AS varchar)), 1, 15)) AS bigint)
            % 2147483647 + 1) / 2147483647.0 AS u
    FROM reps
  )
),
rm AS (
  SELECT event_type, b, round(sum(w * v) / sum(w), 9) AS m
  FROM weighted GROUP BY 1, 2
)
SELECT event_type,
       round(avg(m), 6) AS boot_mean,
       round(quantile_cont(m, 0.025), 6) AS ci_lo,
       round(quantile_cont(m, 0.975), 6) AS ci_hi
FROM rm GROUP BY event_type
"""


QUERIES["evt_bootstrap_ci"] = QuerySpec(
    q_bootstrap_ci,
    _oracle_bootstrap(),
    "Poisson-bootstrap CI for the mean (deterministic hash weights, one pass)",
)
