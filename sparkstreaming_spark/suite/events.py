"""Event-time queries over the `events` stream table (SURVEY §2.9 T4/T5
extensions + §2.7 JSON functions).

These are the BATCH forms; suite/streaming_suite.py runs the same
aggregations through Structured Streaming (availableNow trigger) and the
batch oracle here doubles as the streaming/batch-equivalence check — the
core Structured Streaming invariant (SURVEY §5.2).

Window starts are emitted as formatted strings so the value-hash compare
is immune to pandas datetime-unit differences between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.batch import read_table
from . import QuerySpec

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 — tumbling 1-hour event-time window: count + rounded value sum
    per (window, event_type)."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


ORACLE_TUMBLING = """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 — sliding window (1 hour, slide 30 min): each event lands in two
    windows. Oracle re-creates the two bucket alignments with UNION ALL."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
            "cnt",
        )
    )


ORACLE_SLIDING = """
WITH buckets AS (
    SELECT time_bucket(INTERVAL '1 hour', ts) AS ws FROM events
    UNION ALL
    SELECT time_bucket(INTERVAL '1 hour', ts - INTERVAL '30 minutes') + INTERVAL '30 minutes'
    FROM events
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, count(*) AS cnt
FROM buckets GROUP BY ws
"""


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 — session windows per user with a 5-minute gap: session count and
    per-session event counts. Oracle derives sessions via lag + cumulative
    gap-flag sum (the standard SQL sessionization idiom)."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), TS_FMT).alias("session_start"),
            "n_events",
        )
    )


ORACLE_SESSION = """
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     > INTERVAL '5 minutes' OR
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
), sessions AS (
    SELECT user_id, ts,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events
FROM sessions GROUP BY user_id, sid
"""


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 JSON surface: extract `k` from the props JSON string, bucket it,
    count per (event_type, bucket)."""
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    # floor() on both sides: DuckDB's double→int cast rounds, Spark's truncates
    return (
        ev.select("event_type", F.floor(k / 10).cast("int").alias("k_bucket"))
        .groupBy("event_type", "k_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


ORACLE_JSON = """
SELECT event_type, cast(floor(cast(json_extract(props, '$.k') AS int) / 10) AS int) AS k_bucket,
       count(*) AS cnt
FROM events GROUP BY event_type, k_bucket
"""


def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4): parse_json → open
    VARIANT column → typed variant_get extraction. At scale VARIANT
    beats get_json_object by parsing once into a binary encoding instead
    of re-parsing the JSON string per extracted path."""
    ev = read_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.variant_get("v", "$.k", "int")
    return (
        parsed.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


ORACLE_VARIANT = """
SELECT event_type, count(*) AS cnt,
       cast(sum(cast(json_extract(props, '$.k') AS int)) AS bigint) AS sum_k,
       cast(min(cast(json_extract(props, '$.k') AS int)) AS int) AS min_k,
       cast(max(cast(json_extract(props, '$.k') AS int)) AS int) AS max_k
FROM events GROUP BY event_type
"""


def q_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (regr_slope/intercept/r2): trend of
    event value over hour-of-day per type — one partial+final aggregate
    pass, no window, no collect. The daily-drift check a monitoring
    layer computes."""
    ev = read_table(spark, sf_dir, "events")
    x = F.hour("ts").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.regr_slope("value", x), 6).alias("slope"),
        F.round(F.regr_intercept("value", x), 6).alias("intercept"),
        F.round(F.regr_r2("value", x), 6).alias("r2"),
        F.count(F.lit(1)).alias("n"),
    )


ORACLE_REGRESSION = """
SELECT event_type,
       round(regr_slope(value, cast(hour(ts) AS double)), 6) AS slope,
       round(regr_intercept(value, cast(hour(ts) AS double)), 6) AS intercept,
       round(regr_r2(value, cast(hour(ts) AS double)), 6) AS r2,
       count(*) AS n
FROM events GROUP BY event_type
"""


def q_running_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analogue of the reference's update-mode running aggregate
    (T2/T3, Consumer.scala:61,129-145): cumulative event count per user
    ordered by event time, tie-broken on event_id."""
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("running_events"),
    )


ORACLE_RUNNING = """
SELECT user_id, event_id,
       count(*) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_events
FROM events
"""


def q_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operator Spark lacks; operators/asof.py composition):
    each event matched to the customer's latest order at-or-before the
    event, bucketed into 30-day ages. Oracle uses DuckDB's native ASOF
    JOIN — a strong cross-engine check of the union+window composition."""
    from ..operators.asof import asof_join

    ev = read_table(spark, sf_dir, "events")
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    joined = asof_join(
        ev, orders, key="user_id", left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderdate"],
    )
    # o_orderdate is TIMESTAMP_NTZ (naive parquet ms); cast to LTZ for
    # unix_micros — identity under the UTC session/container timezone
    months = F.floor(
        (
            F.unix_micros(F.col("ts"))
            - F.unix_micros(F.col("asof_o_orderdate").cast("timestamp"))
        )
        / F.lit(2592000000000)
    )
    return (
        joined.filter(F.col("asof_o_orderdate").isNotNull())
        .select("event_type", months.alias("months_since"))
        .groupBy("event_type", "months_since")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


ORACLE_ASOF = """
SELECT event_type,
       cast(floor((epoch_us(e.ts) - epoch_us(o.o_orderdate)) / 2592000000000) AS bigint)
           AS months_since,
       count(*) AS cnt
FROM events e ASOF JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
GROUP BY 1, 2
"""


def q_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 JSON surface #2: schema-full from_json into a struct column."""
    ev = read_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k int")
    return (
        ev.select("event_type", (parsed["k"] % 2).alias("k_parity"))
        .groupBy("event_type", "k_parity")
        .agg(F.count(F.lit(1)).alias("cnt"), )
    )


ORACLE_FROM_JSON = """
SELECT event_type, cast(json_extract(props, '$.k') AS int) % 2 AS k_parity,
       count(*) AS cnt
FROM events GROUP BY event_type, k_parity
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: pairs of events from the same user within 60 seconds,
    counted per event_type pair. Uses the bucketed range join
    (operators/range_join.py): join key (user_id, time_bucket) instead of
    user_id alone — hot users don't quadratically explode pre-filter
    (66 M → ~10⁴ pre-filter pairs on this data)."""
    from ..operators.range_join import bucketed_range_join

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    pair = bucketed_range_join(
        ev, ev, key="user_id", left_ts="ts", right_ts="ts",
        max_delta_us=60_000_000,
        extra_condition=F.col("a.event_id") < F.col("b.event_id"),
    )
    return pair.groupBy(
        F.col("a.event_type").alias("type_a"), F.col("b.event_type").alias("type_b")
    ).agg(F.count(F.lit(1)).alias("cnt"))


ORACLE_RANGE_JOIN = """
SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS cnt
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND b.ts >= a.ts AND epoch_us(b.ts) - epoch_us(a.ts) <= 60000000
GROUP BY 1, 2
"""


def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with bounded staleness (pandas merge_asof `tolerance`
    semantics): matches older than 60 days are nulled — the freshness
    contract feature-store lookups need. Tolerance rides the same
    union+window plan (zero extra shuffles; operators/asof.py); the
    oracle post-filters DuckDB's native ASOF JOIN the same way."""
    from ..operators.asof import asof_join

    ev = read_table(spark, sf_dir, "events")
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    tol_us = 60 * 86400 * 1_000_000
    joined = asof_join(
        ev, orders, key="user_id", left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderdate"], tolerance_us=tol_us,
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("asof_o_orderdate").alias("n_fresh_matches"),
    )


ORACLE_ASOF_TOLERANCE = """
SELECT event_type, count(*) AS n_events,
       count(CASE WHEN epoch_us(e.ts) - epoch_us(o.o_orderdate)
                       <= CAST(5184000000000 AS BIGINT)
                  THEN o.o_orderdate END) AS n_fresh_matches
FROM events e
ASOF LEFT JOIN (SELECT o_custkey AS user_id, o_orderdate FROM orders) o
  ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
GROUP BY event_type
"""


def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval overlap join: view-activity windows [ts, ts+30m]
    against purchase windows [ts, ts+30m] per user, counted per purchase
    hour. Bucketed explode + single-owner-bucket dedup (see
    operators/range_join.py::interval_overlap_join) — no post-join
    distinct, no per-key quadratic blowup."""
    from ..operators.range_join import interval_overlap_join

    ev = read_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("v_id"),
        F.col("ts").alias("v_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("v_end"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("p_end"),
    )
    pairs = interval_overlap_join(
        views.withColumnRenamed("user_id", "key"),
        purchases.withColumnRenamed("p_user", "key"),
        key="key",
        left_start="v_start", left_end="v_end",
        right_start="p_start", right_end="p_end",
        bucket_us=1_800_000_000,
    )
    return pairs.groupBy(
        F.date_format(F.date_trunc("hour", F.col("b.p_start")), "yyyy-MM-dd HH:mm:ss").alias("purchase_hour")
    ).agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.countDistinct(F.col("a.key")).alias("n_users"),
    )


ORACLE_INTERVAL_OVERLAP = """
WITH v AS (
  SELECT user_id, ts AS v_start, ts + INTERVAL 30 MINUTE AS v_end
  FROM events WHERE event_type = 'view'
), p AS (
  SELECT user_id, ts AS p_start, ts + INTERVAL 30 MINUTE AS p_end
  FROM events WHERE event_type = 'purchase'
)
SELECT strftime(date_trunc('hour', p.p_start), '%Y-%m-%d %H:%M:%S') AS purchase_hour,
       count(*) AS n_overlaps,
       count(DISTINCT v.user_id) AS n_users
FROM v JOIN p ON v.user_id = p.user_id
 AND v.v_start <= p.p_end AND p.p_start <= v.v_end
GROUP BY 1
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation): median and p90 of
    event value per type — F.percentile ≡ DuckDB quantile_cont."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
    )


ORACLE_PERCENTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90
FROM events GROUP BY event_type
"""


def q_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax aggregate: per user, the event_id carrying the max value
    (max_by with event_id tiebreak folded in via struct ordering)."""
    ev = read_table(spark, sf_dir, "events")
    # tiebreak: among equal values take the smallest event_id, both engines
    return ev.groupBy("user_id").agg(
        F.max_by(
            "event_id", F.struct(F.col("value"), (-F.col("event_id")).alias("neg"))
        ).alias("top_event_id"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


ORACLE_ARGMAX = """
SELECT user_id, event_id AS top_event_id, round(mx, 2) AS max_value
FROM (
    SELECT user_id, event_id,
           max(value) OVER (PARTITION BY user_id) AS mx,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY value DESC, event_id ASC) AS rn
    FROM events
) WHERE rn = 1
"""


def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup (continuous-aggregate
    hierarchy: 15 min / 1 h / 6 h) in ONE pass: each row emits its
    (level, bucket) pairs via an inline array + explode, then a single
    groupBy — one shuffle for all resolutions, versus one scan + shuffle
    per level in the naive UNION form. The coarser levels could also be
    derived by re-aggregating the finest (rollup-of-rollup); emitting
    all levels in one pass trades a 3× shuffle-row factor for zero extra
    scans, the right call when the source scan dominates (100 TB)."""
    ev = read_table(spark, sf_dir, "events")
    levels = [("15m", 900_000_000), ("1h", 3_600_000_000), ("6h", 21_600_000_000)]
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("level"),
                (
                    (F.unix_micros(F.col("ts")) / F.lit(us)).cast("bigint") * F.lit(us)
                ).alias("bucket_us"),
            )
            for name, us in levels
        ]
    )
    return (
        ev.select(F.explode(pairs).alias("lb"), "value")
        .select(
            F.col("lb.level").alias("level"),
            F.date_format(
                F.timestamp_micros(F.col("lb.bucket_us")), TS_FMT
            ).alias("bucket_start"),
            "value",
        )
        .groupBy("level", "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


ORACLE_HYPERTABLE = """
WITH lv AS (
    SELECT * FROM (VALUES ('15m', 900000000), ('1h', 3600000000),
                          ('6h', 21600000000)) AS t(level, us)
)
SELECT level,
       strftime(make_timestamp((epoch_us(ts) // us) * us), '%Y-%m-%d %H:%M:%S')
           AS bucket_start,
       count(*) AS cnt, round(sum(value), 2) AS sum_value
FROM events CROSS JOIN lv
GROUP BY level, bucket_start
"""


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel: per user, first-occurrence ordering signup → click →
    purchase. One conditional-min aggregate per stage in a single
    groupBy(user) pass (no per-stage self-joins — the naive funnel shape
    joins the events table once per stage), then a count rollup of how
    far each user got."""
    ev = read_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    stage = (
        F.when(
            F.col("t_signup").isNotNull()
            & F.col("t_click").isNotNull()
            & F.col("t_purchase").isNotNull()
            & (F.col("t_signup") < F.col("t_click"))
            & (F.col("t_click") < F.col("t_purchase")),
            3,
        )
        .when(
            F.col("t_signup").isNotNull()
            & F.col("t_click").isNotNull()
            & (F.col("t_signup") < F.col("t_click")),
            2,
        )
        .when(F.col("t_signup").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        firsts.withColumn("funnel_stage", stage.cast("int"))
        .groupBy("funnel_stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


ORACLE_FUNNEL = """
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT CASE
         WHEN t_signup IS NOT NULL AND t_click IS NOT NULL
              AND t_purchase IS NOT NULL
              AND t_signup < t_click AND t_click < t_purchase THEN 3
         WHEN t_signup IS NOT NULL AND t_click IS NOT NULL
              AND t_signup < t_click THEN 2
         WHEN t_signup IS NOT NULL THEN 1
         ELSE 0 END AS funnel_stage,
       count(*) AS n_users
FROM firsts GROUP BY funnel_stage
"""


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-active day; active-user
    counts per (cohort_day, day_offset). Two aggregates + one join — the
    cohort frame is |users| rows (small relative to events) and joins
    back broadcast."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    cohort = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(F.broadcast(cohort), "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").cast("int").alias("day_offset"),
        )
        .distinct()
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


ORACLE_RETENTION = """
WITH e AS (SELECT user_id, cast(ts AS date) AS day FROM events),
cohort AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
act AS (SELECT DISTINCT e.user_id, c.cohort_day,
               cast(date_diff('day', c.cohort_day, e.day) AS int) AS day_offset
        FROM e JOIN cohort c USING (user_id))
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day, day_offset,
       count(*) AS active_users
FROM act GROUP BY 1, 2
"""


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential smoothing over the hourly rollup: truncated-FIR EWMA
    (operators/timeseries.py::truncated_ewma) — 24 lag taps sharing one
    window sort over the already-shrunk series; no recursion, no
    unbounded state."""
    from ..operators.timeseries import truncated_ewma

    ev = read_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(F.round(F.sum("value"), 2).alias("hourly_total"))
    w = Window.partitionBy("event_type").orderBy("bucket")
    return hourly.select(
        F.date_format("bucket", TS_FMT).alias("bucket_start"),
        "event_type",
        "hourly_total",
        F.round(
            truncated_ewma("hourly_total", w, alpha=0.2, taps=24), 6
        ).alias("ewma"),
    )


def _oracle_ewma() -> str:
    from ..operators.timeseries import ewma_oracle_terms

    num, den = ewma_oracle_terms("hourly_total", alpha=0.2, taps=24)
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket, event_type,
         round(sum(value), 2) AS hourly_total
  FROM events GROUP BY 1, 2
)
SELECT strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
       event_type, hourly_total,
       round(({num}) / ({den}), 6) AS ewma
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
"""


APPROX_PCT_ACCURACY = 10_000_000


def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (approx_percentile, Greenwald-Khanna):
    p50/p90/p99 of value per event_type. GK retains every sample while the
    per-group count stays <= accuracy, so at accuracy 1e7 the sketch is
    EXACT at oracle/bench scale and returns the data element at rank
    ceil(p*n) — the same element DuckDB's quantile_disc picks, making the
    result hash-comparable cross-engine (verified empirically per group).
    True sketch behavior (low accuracy, merge-order-dependent) is pinned
    separately by tests/test_extensions.py's rank-error tolerance test.
    At 100 TB the sketch path is the only option — exact percentile must
    shuffle every value per group; GK ships O(1/eps) mergeable summaries."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_percentile(
            "value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), APPROX_PCT_ACCURACY
        ).alias("p"),
    ).select(
        "event_type",
        F.round(F.col("p")[0], 6).alias("ap50"),
        F.round(F.col("p")[1], 6).alias("ap90"),
        F.round(F.col("p")[2], 6).alias("ap99"),
    )


ORACLE_APPROX_PERCENTILES = """
SELECT event_type,
       round(quantile_disc(value, 0.5), 6) AS ap50,
       round(quantile_disc(value, 0.9), 6) AS ap90,
       round(quantile_disc(value, 0.99), 6) AS ap99
FROM events GROUP BY event_type
"""


def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series smoothing: hourly value averages per event_type with a
    3-bucket trailing moving average (rows frame over the bucketed
    series, not the raw events — the rollup shrinks the data before the
    window sort touches it)."""
    ev = read_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(F.avg("value").alias("avg_value"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-2, 0)
    )
    return hourly.select(
        F.date_format("bucket", TS_FMT).alias("bucket_start"),
        "event_type",
        F.round("avg_value", 6).alias("avg_value"),
        F.round(F.avg("avg_value").over(w), 6).alias("moving_avg_3h"),
    )


ORACLE_MOVING_AVG = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket, event_type, avg(value) AS avg_value
  FROM events GROUP BY 1, 2
)
SELECT strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start, event_type,
       round(avg_value, 6) AS avg_value,
       round(avg(avg_value) OVER (PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg_3h
FROM hourly
"""


QUERIES: dict[str, QuerySpec] = {
    "evt_moving_avg": QuerySpec(
        q_moving_avg, ORACLE_MOVING_AVG, "bucketed trailing moving average"
    ),
    "evt_funnel": QuerySpec(
        q_funnel, ORACLE_FUNNEL, "funnel stages, one conditional-min pass"
    ),
    "evt_retention": QuerySpec(
        q_retention, ORACLE_RETENTION, "cohort retention matrix"
    ),
    "evt_hypertable_rollup": QuerySpec(
        q_hypertable_rollup, ORACLE_HYPERTABLE, "multi-resolution rollup, one pass"
    ),
    "evt_range_join": QuerySpec(q_range_join, ORACLE_RANGE_JOIN, "interval range join"),
    "evt_approx_percentiles": QuerySpec(
        q_approx_percentiles,
        ORACLE_APPROX_PERCENTILES,
        "mergeable GK quantile sketch (exact at accuracy>=n; quantile_disc twin)",
    ),
    "evt_ewma": QuerySpec(
        q_ewma,
        _oracle_ewma(),
        "truncated-FIR EWMA: 24 lag taps, one window sort, no recursion",
    ),
    "evt_asof_tolerance": QuerySpec(
        q_asof_tolerance,
        ORACLE_ASOF_TOLERANCE,
        "as-of join with staleness tolerance (merge_asof semantics)",
    ),
    "evt_interval_overlap": QuerySpec(
        q_interval_overlap,
        ORACLE_INTERVAL_OVERLAP,
        "interval-overlap join, bucketed with single-owner dedup",
    ),
    "evt_percentiles": QuerySpec(q_percentiles, ORACLE_PERCENTILES, "exact quantiles"),
    "evt_argmax": QuerySpec(q_argmax, ORACLE_ARGMAX, "max_by/arg_max aggregate"),
    "evt_asof_orders": QuerySpec(q_asof_orders, ORACLE_ASOF, "as-of join composition"),
    "evt_from_json": QuerySpec(q_from_json, ORACLE_FROM_JSON, "from_json struct parse"),
    "evt_tumbling_window": QuerySpec(q_tumbling_window, ORACLE_TUMBLING, "T5 tumbling window"),
    "evt_sliding_window": QuerySpec(q_sliding_window, ORACLE_SLIDING, "T5 sliding window"),
    "evt_session_window": QuerySpec(q_session_window, ORACLE_SESSION, "T5 session window"),
    "evt_json_props": QuerySpec(q_json_props, ORACLE_JSON, "JSON extraction"),
    "evt_variant_props": QuerySpec(
        q_variant_props, ORACLE_VARIANT, "VARIANT parse_json/variant_get (Spark 4)"
    ),
    "evt_regression": QuerySpec(
        q_regression, ORACLE_REGRESSION, "regr_slope/intercept/r2 trend aggregates"
    ),
    "evt_running_by_user": QuerySpec(q_running_by_user, ORACLE_RUNNING, "T2/T3 running totals"),
}


def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (operators/asof.py direction='forward'):
    each signup event matched to the same user's EARLIEST purchase
    at-or-after it — the time-to-conversion metric — bucketed into
    6-hour latency bands. Same one-shuffle union+window plan as the
    backward join with the sort reversed; the oracle uses DuckDB's
    native forward ASOF (ts <= ts), a strong cross-engine check."""
    from ..operators.asof import asof_join

    ev = read_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    joined = asof_join(
        signups,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="p_ts",
        right_cols=["p_ts"],
        direction="forward",
    )
    bands = F.floor(
        (F.unix_micros(F.col("asof_p_ts").cast("timestamp")) - F.unix_micros("ts"))
        / F.lit(21_600_000_000)
    )
    return (
        joined.filter(F.col("asof_p_ts").isNotNull())
        .select(bands.alias("band_6h"))
        .groupBy("band_6h")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


ORACLE_ASOF_FORWARD = """
SELECT cast(floor((epoch_us(p.ts) - epoch_us(s.ts)) / 21600000000) AS bigint)
         AS band_6h,
       count(*) AS cnt
FROM (SELECT * FROM events WHERE event_type = 'signup') s
ASOF JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
  ON s.user_id = p.user_id AND s.ts <= p.ts
GROUP BY 1
"""


QUERIES["evt_asof_forward"] = QuerySpec(
    q_asof_forward,
    ORACLE_ASOF_FORWARD,
    "forward as-of join: time-to-conversion bands (native ASOF oracle)",
)
