"""Advanced analytics queries: time-series gap fill, full analytic
window-function surface, GROUPING SETS.

The reference's analytic surface is count/sum KPIs only (SURVEY §2.4);
these cover what any OLAP/time-series engine layered on the same data
would add. All three are oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.timeseries import gap_fill
from ..sources.batch import load_tables, read_table
from . import QuerySpec

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable gap fill: 15-minute avg(value) series per user
    (user_id < 5), densified over each user's own range and
    forward-filled. Distributed grid generation — see
    operators/timeseries.py for the 100 TB shuffle analysis."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    filled = gap_fill(ev, key="user_id", ts="ts", value="value")
    return filled.select(
        "user_id",
        F.date_format("bucket_start", TS_FMT).alias("window_start"),
        F.round("value_ffill", 2).alias("value_ffill"),
        "was_gap",
    )


ORACLE_GAP_FILL = """
WITH agg AS (
  SELECT user_id, time_bucket(INTERVAL '15 minutes', ts) AS bucket, avg(value) AS v
  FROM events WHERE user_id < 5 GROUP BY 1, 2
), rng AS (
  SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM agg GROUP BY 1
), grid AS (
  SELECT user_id, unnest(generate_series(b0, b1, INTERVAL '15 minutes')) AS bucket
  FROM rng
)
SELECT g.user_id,
       strftime(g.bucket, '%Y-%m-%d %H:%M:%S') AS window_start,
       round(last_value(a.v IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS value_ffill,
       (a.v IS NULL) AS was_gap
FROM grid g LEFT JOIN agg a ON g.user_id = a.user_id AND g.bucket = a.bucket
"""


def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window surface in one pass: lag/lead over event-time
    order, ntile + nth_value over the same order, percent_rank +
    cume_dist over value order. Both orderings are total (event_id
    tie-break), so every column is deterministic. One sort per window
    ordering; both partition on user_id so they share the exchange."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_ts_frame = w_ts.rowsBetween(Window.unboundedPreceding, 0)
    w_val = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w_ts).alias("prev_value"),
        F.lead("value").over(w_ts).alias("next_value"),
        F.ntile(4).over(w_ts).alias("quartile"),
        F.nth_value("value", 3).over(w_ts_frame).alias("third_value"),
        F.percent_rank().over(w_val).alias("value_pct_rank"),
        F.cume_dist().over(w_val).alias("value_cume_dist"),
    )


ORACLE_WINDOW_ANALYTICS = """
SELECT event_id, user_id,
       lag(value) OVER w_ts AS prev_value,
       lead(value) OVER w_ts AS next_value,
       ntile(4) OVER w_ts AS quartile,
       nth_value(value, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_value,
       percent_rank() OVER w_val AS value_pct_rank,
       cume_dist() OVER w_val AS value_cume_dist
FROM events
WHERE user_id < 10
WINDOW w_ts AS (PARTITION BY user_id ORDER BY ts, event_id),
       w_val AS (PARTITION BY user_id ORDER BY value, event_id)
"""


GROUPING_SETS_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(grouping(o_orderpriority) AS INT) AS g_priority,
       count(*) AS cnt,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), (o_orderpriority), ())
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with grouping() disambiguation — the general form
    behind rollup/cube (both already covered); Spark expands the four
    sets in ONE aggregate (Expand node), not four scans."""
    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(GROUPING_SETS_SQL)


def q_stat_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-aggregate surface: per-returnflag correlation,
    population covariance/variance, and stddev between quantity and
    extended price — the column-profiling pass a data-quality layer
    runs. Population (not sample) variants on both engines; rounded to
    6 dp so accumulation order can't flip the hash."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        F.round(F.var_pop("l_quantity"), 6).alias("qty_var"),
        F.round(F.stddev_pop("l_extendedprice"), 4).alias("price_stddev"),
    )


ORACLE_STAT_PROFILE = """
SELECT l_returnflag, count(*) AS cnt,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(covar_pop(l_quantity, l_extendedprice), 4) AS qty_price_covar,
       round(var_pop(l_quantity), 6) AS qty_var,
       round(stddev_pop(l_extendedprice), 4) AS price_stddev
FROM lineitem GROUP BY l_returnflag
"""


PROFILE_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profiler: one row per column with row/null/distinct
    counts and min/max (rendered as strings so mixed types share a
    schema). ONE scan, one aggregate — every per-column metric is a
    struct of aggregate expressions in the same groupBy-less agg, so the
    table is read once no matter how many columns are profiled (the
    UNION-ALL-per-column oracle shape would scan N times)."""
    o = read_table(spark, sf_dir, "orders")
    aggs = []
    for c in PROFILE_COLS:
        aggs.append(
            F.struct(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias("n_null"),
                F.countDistinct(c).alias("n_distinct"),
                F.min(c).cast("string").alias("min_val"),
                F.max(c).cast("string").alias("max_val"),
            ).alias(c)
        )
    wide = o.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("column_name"), F.col(c).alias("m"))
                    for c in PROFILE_COLS
                ]
            )
        ).alias("e")
    )
    return stacked.select(
        F.col("e.column_name").alias("column_name"),
        F.col("e.m.n_rows").alias("n_rows"),
        F.col("e.m.n_null").alias("n_null"),
        F.col("e.m.n_distinct").alias("n_distinct"),
        F.col("e.m.min_val").alias("min_val"),
        F.col("e.m.max_val").alias("max_val"),
    )


def _profile_oracle() -> str:
    parts = []
    for c in PROFILE_COLS:
        parts.append(f"""
  SELECT '{c}' AS column_name, count(*) AS n_rows,
         CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         count(DISTINCT {c}) AS n_distinct,
         CAST(min({c}) AS VARCHAR) AS min_val,
         CAST(max({c}) AS VARCHAR) AS max_val
  FROM orders""")
    return " UNION ALL ".join(parts)


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram: width_bucket(value, 0, 500, 25) per
    event_type — the profiling pass behind quality dashboards and
    skew detection. One hash aggregate, partial map-side; the bucket
    expression is codegen'd (no UDF). The oracle spells out the same
    bucket arithmetic (floor(v/20)+1) since DuckDB lacks width_bucket."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "bucket", F.width_bucket(F.col("value"), F.lit(0.0), F.lit(500.0), F.lit(25)).cast("int")
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            # sum, not avg: the inputs are 2-decimal values, so the sum
            # rounds unambiguously at 2 dp; an avg can land on a .00005
            # round-half boundary where Spark and DuckDB disagree.
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


ORACLE_VALUE_HISTOGRAM = """
SELECT event_type,
       CAST(CASE WHEN value < 0 THEN 0
                 WHEN value >= 500 THEN 26
                 ELSE floor(value / 20) + 1 END AS INTEGER) AS bucket,
       count(*) AS cnt,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching over part names: distinct names within 2
    edits, with corpus frequency joined back per side (broadcast — the
    pair set is vocabulary-sized). See dedup/fuzzy.py for why the
    compared domain is distinct values, never corpus rows."""
    from ..dedup.fuzzy import fuzzy_value_pairs

    part = read_table(spark, sf_dir, "part")
    pairs = fuzzy_value_pairs(part, "p_name", max_dist=2)
    freq = part.groupBy(F.col("p_name").alias("v")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        pairs.join(F.broadcast(freq).alias("fa"), pairs.val_a == F.col("fa.v"))
        .join(F.broadcast(freq).alias("fb"), pairs.val_b == F.col("fb.v"))
        .select(
            "val_a",
            "val_b",
            F.col("dist").cast("int").alias("dist"),
            F.col("fa.n").alias("n_parts_a"),
            F.col("fb.n").alias("n_parts_b"),
        )
    )


ORACLE_FUZZY_NAME_PAIRS = """
WITH vals AS (SELECT DISTINCT p_name AS v FROM part),
freq AS (SELECT p_name AS v, count(*) AS n FROM part GROUP BY 1),
pairs AS (
  SELECT a.v AS val_a, b.v AS val_b,
         CAST(levenshtein(a.v, b.v) AS INTEGER) AS dist
  FROM vals a JOIN vals b
    ON a.v < b.v AND abs(length(a.v) - length(b.v)) <= 2
  WHERE levenshtein(a.v, b.v) <= 2
)
SELECT p.val_a, p.val_b, p.dist,
       fa.n AS n_parts_a, fb.n AS n_parts_b
FROM pairs p
JOIN freq fa ON p.val_a = fa.v
JOIN freq fb ON p.val_b = fb.v
"""


QUERIES: dict[str, QuerySpec] = {
    "table_profile": QuerySpec(
        q_table_profile,
        _profile_oracle(),
        "per-column data-quality profile in ONE scan (struct aggs + explode)",
    ),
    "evt_value_histogram": QuerySpec(
        q_value_histogram,
        ORACLE_VALUE_HISTOGRAM,
        "equi-width histogram via width_bucket, one partial-agg pass",
    ),
    "fuzzy_name_pairs": QuerySpec(
        q_fuzzy_name_pairs,
        ORACLE_FUZZY_NAME_PAIRS,
        "bounded-edit-distance entity matching over the distinct-value "
        "domain (threshold levenshtein + length-band prefilter)",
    ),
    "stat_profile": QuerySpec(
        q_stat_profile,
        ORACLE_STAT_PROFILE,
        "corr/covar_pop/var_pop/stddev_pop profiling aggregates",
    ),
    "ts_gap_fill": QuerySpec(
        q_gap_fill,
        ORACLE_GAP_FILL,
        "time-series densify + forward fill (distributed grid)",
    ),
    "evt_window_analytics": QuerySpec(
        q_window_analytics,
        ORACLE_WINDOW_ANALYTICS,
        "lag/lead/ntile/nth_value/percent_rank/cume_dist surface",
    ),
    "grouping_sets_counts": QuerySpec(
        q_grouping_sets,
        GROUPING_SETS_SQL,
        "GROUPING SETS + grouping() in one Expand aggregate",
    ),
}


INTERP_SALT = "interp-v1"
INTERP_PCT = 200  # of 10_000 → 2 % sample makes the hourly series sparse


def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over a sparse hourly series
    (operators/timeseries.py::linear_interpolate): a deterministic 2 %
    hash sample of events (sparse by construction — ~4 events/type/day
    against 24 hourly buckets) is bucketed per event_type, densified
    over each type's own range with a distributed sequence/explode grid
    (no driver date loop), and NULL buckets take the time-weighted
    blend of their nearest observed neighbors. One exchange on the key
    serves the grid join and both window directions."""
    from ..operators.sampling import hash_bucket
    from ..operators.timeseries import linear_interpolate

    ev = read_table(spark, sf_dir, "events")
    sampled = ev.filter(hash_bucket("event_id", INTERP_SALT) < INTERP_PCT)
    # anchors rounded BEFORE interpolating: both engines then blend
    # bit-identical doubles, so the final 6-dp round can't straddle a
    # half-ulp boundary (unrounded avgs differ by summation order)
    bucketed = sampled.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.round(F.avg("value"), 6).alias("v"))
    ranges = bucketed.groupBy("event_type").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = ranges.select(
        "event_type",
        F.explode(
            F.sequence("b0", "b1", F.expr("INTERVAL 1 hour"))
        ).alias("bucket"),
    )
    joined = grid.join(bucketed, ["event_type", "bucket"], "left")
    out = linear_interpolate(joined, "event_type", "bucket", "v")
    return out.select(
        "event_type",
        F.date_format("bucket", TS_FMT).alias("bucket_start"),
        "value_interp",
        "was_gap",
    )


ORACLE_INTERPOLATE = f"""
WITH sampled AS (
  SELECT * FROM events
  WHERE cast(('0x' || substr(md5('{INTERP_SALT}' || CAST(event_id AS VARCHAR)),
        1, 15)) AS bigint) % 10000 < {INTERP_PCT}
),
agg AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         round(avg(value), 6) AS v
  FROM sampled GROUP BY 1, 2
),
rng AS (
  SELECT event_type, min(bucket) AS b0, max(bucket) AS b1 FROM agg GROUP BY 1
),
grid AS (
  SELECT event_type, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
  FROM rng
),
j AS (
  SELECT g.event_type, g.bucket, a.v FROM grid g
  LEFT JOIN agg a USING (event_type, bucket)
),
anch AS (
  SELECT event_type, bucket, v,
         last_value(v IGNORE NULLS) OVER wb AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN epoch(bucket) END IGNORE NULLS)
           OVER wb AS pt,
         first_value(v IGNORE NULLS) OVER wf AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN epoch(bucket) END IGNORE NULLS)
           OVER wf AS nt
  FROM j
  WINDOW wb AS (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type,
       strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
       floor((CASE WHEN v IS NOT NULL THEN v
                   WHEN pv IS NULL THEN nv
                   WHEN nv IS NULL THEN pv
                   ELSE pv + (nv - pv) * (epoch(bucket) - pt) / (nt - pt)
              END) * 1000000.0 + 0.5) / 1000000.0 AS value_interp,
       v IS NULL AS was_gap
FROM anch
"""


TOP_PATHS_K = 20


def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining: the top-20 three-step event-type paths
    across all user journeys (lead×2 over the per-user total order →
    concat → count). The funnel/clickstream complement of evt_funnel:
    instead of checking ONE prescribed path, ranks all observed ones.
    One exchange on user_id for the window; the path aggregate combines
    map-side (≤ |types|³ = 125 keys); top-k is TakeOrdered, never a
    global sort."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e0"),
        F.lead("event_type", 1).over(w).alias("e1"),
        F.lead("event_type", 2).over(w).alias("e2"),
    ).filter(F.col("e2").isNotNull())
    return (
        seq.groupBy(
            F.concat_ws(">", "e0", "e1", "e2").alias("path")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(TOP_PATHS_K)
    )


ORACLE_TOP_PATHS = f"""
WITH seq AS (
  SELECT event_type AS e0,
         lead(event_type, 1) OVER w AS e1,
         lead(event_type, 2) OVER w AS e2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e0 || '>' || e1 || '>' || e2 AS path, count(*) AS n
FROM seq WHERE e2 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path ASC LIMIT {TOP_PATHS_K}
"""


QUERIES.update(
    {
        "ts_interpolate": QuerySpec(
            q_interpolate,
            ORACLE_INTERPOLATE,
            "linear interpolation of gap buckets (IGNORE NULLS windows, "
            "distributed grid)",
        ),
        "evt_top_paths": QuerySpec(
            q_top_paths,
            ORACLE_TOP_PATHS,
            "top-k 3-step event paths (sequential pattern counts)",
        ),
    }
)


WINSOR_LO, WINSOR_HI = 0.05, 0.95
WINSOR_ACCURACY = 10_000_000  # >= group rows at oracle/bench scale -> GK exact


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics per event_type: clip value to the
    [p05, p95] range and report raw vs clipped mean/stddev — the
    outlier-robust feature-scaling step of an ML pipeline.

    Shape: thresholds are a per-type aggregate (5 rows) computed with
    the GK sketch (exact at this accuracy, same convention as
    evt_approx_percentiles) and BROADCAST back onto the fact scan — the
    big table is read twice but never shuffled beyond the final
    per-type partial agg. At 100 TB the threshold table stays
    group-count-sized no matter the fact volume."""
    ev = read_table(spark, sf_dir, "events")
    thr = ev.groupBy("event_type").agg(
        F.approx_percentile(
            "value", F.array(F.lit(WINSOR_LO), F.lit(WINSOR_HI)), WINSOR_ACCURACY
        ).alias("p")
    ).select(
        "event_type", F.col("p")[0].alias("lo"), F.col("p")[1].alias("hi")
    )
    clipped = ev.join(F.broadcast(thr), "event_type").withColumn(
        "cv", F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("mean_raw"),
        F.round(F.avg("cv"), 6).alias("mean_winsor"),
        F.round(F.stddev_samp("cv"), 6).alias("stddev_winsor"),
        F.round(F.min("lo"), 6).alias("p_lo"),
        F.round(F.max("hi"), 6).alias("p_hi"),
    )


ORACLE_WINSORIZED = f"""
WITH thr AS (
  SELECT event_type,
         quantile_disc(value, {WINSOR_LO}) AS lo,
         quantile_disc(value, {WINSOR_HI}) AS hi
  FROM events GROUP BY event_type
),
clipped AS (
  SELECT e.event_type, e.value,
         least(greatest(e.value, t.lo), t.hi) AS cv, t.lo, t.hi
  FROM events e JOIN thr t USING (event_type)
)
SELECT event_type, count(*) AS n,
       round(avg(value), 6) AS mean_raw,
       round(avg(cv), 6) AS mean_winsor,
       round(stddev_samp(cv), 6) AS stddev_winsor,
       round(min(lo), 6) AS p_lo,
       round(max(hi), 6) AS p_hi
FROM clipped GROUP BY event_type
"""


QUERIES.update(
    {
        "evt_winsorized_stats": QuerySpec(
            q_winsorized_stats,
            ORACLE_WINSORIZED,
            "winsorized robust stats (GK-exact thresholds, broadcast clip)",
        ),
    }
)


MAD_K = 1.4826  # consistency constant: MAD * 1.4826 ~ sigma for normal data


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation robust outlier profile per event_type —
    the winsorize companion (evt_winsorized_stats) using rank statistics
    end-to-end: med = p50(value), mad = p50(|value - med|), outliers =
    |value - med| > 3 * 1.4826 * mad. Three fact scans but zero fact
    shuffles beyond per-type partial aggs: both medians are GK sketches
    (exact at this accuracy, evt_approx_percentiles convention) and come
    back as broadcast threshold tables."""
    ev = read_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.approx_percentile("value", 0.5, 10_000_000).alias("med")
    )
    with_med = ev.join(F.broadcast(med), "event_type")
    mad = (
        with_med.withColumn("adev", F.abs(F.col("value") - F.col("med")))
        .groupBy("event_type")
        .agg(F.approx_percentile("adev", 0.5, 10_000_000).alias("mad"))
    )
    scored = with_med.join(F.broadcast(mad), "event_type")
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("med"), 6).alias("med"),
        F.round(F.min("mad"), 6).alias("mad"),
        F.sum(
            (
                F.abs(F.col("value") - F.col("med"))
                > F.lit(3 * MAD_K) * F.col("mad")
            ).cast("bigint")
        ).alias("n_outliers"),
    )


ORACLE_MAD = f"""
WITH med AS (
  SELECT event_type, quantile_disc(value, 0.5) AS med
  FROM events GROUP BY event_type
),
wm AS (
  SELECT e.event_type, e.value, m.med FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_disc(abs(value - med), 0.5) AS mad
  FROM wm GROUP BY event_type
)
SELECT w.event_type, count(*) AS n,
       round(min(w.med), 6) AS med,
       round(min(d.mad), 6) AS mad,
       cast(sum(CASE WHEN abs(w.value - w.med) > 3 * {MAD_K} * d.mad
                THEN 1 ELSE 0 END) AS bigint) AS n_outliers
FROM wm w JOIN mad d USING (event_type)
GROUP BY w.event_type
"""


def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=>): per-status order counts joined to
    per-status total prices on a key where 'O' is mapped to NULL —
    plain = drops the NULL partition on both sides, eqNullSafe keeps it
    matched (NULL <=> NULL is TRUE). The output proves the semantics:
    the NULL row carries counts from both sides."""
    o = read_table(spark, sf_dir, "orders")
    k = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    a = o.groupBy(k.alias("k")).agg(F.count(F.lit(1)).alias("n_orders"))
    b = o.groupBy(k.alias("k")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_price")
    )
    j = a.alias("a").join(
        b.alias("b"), F.col("a.k").eqNullSafe(F.col("b.k"))
    )
    return j.select(
        F.coalesce(F.col("a.k"), F.lit("NULL")).alias("status_key"),
        "n_orders",
        "total_price",
    )


ORACLE_NULL_SAFE_JOIN = """
WITH a AS (
  SELECT nullif(o_orderstatus, 'O') AS k, count(*) AS n_orders
  FROM orders GROUP BY 1
),
b AS (
  SELECT nullif(o_orderstatus, 'O') AS k, round(sum(o_totalprice), 2) AS total_price
  FROM orders GROUP BY 1
)
SELECT coalesce(a.k, 'NULL') AS status_key, n_orders, total_price
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
"""


QUERIES.update(
    {
        "evt_mad_outliers": QuerySpec(
            q_mad_outliers,
            ORACLE_MAD,
            "MAD robust outlier profile (rank stats, broadcast thresholds)",
        ),
        "join_null_safe": QuerySpec(
            q_null_safe_join,
            ORACLE_NULL_SAFE_JOIN,
            "null-safe equality join (<=> / IS NOT DISTINCT FROM)",
        ),
    }
)


PSI_BINS = 10  # equal-width bins over [0, 500); width_bucket adds 0/11 overflow
PSI_EPS = 0.5  # Laplace smoothing per bin so empty bins stay log-safe


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor: per event_type, compare
    the `value` distribution between a reference slice (even epoch-week,
    floor(epoch_day/7) % 2 = 0) and a current slice (odd epoch-week) —
    the pre-deployment check every feature/training pipeline runs before
    trusting a new data drop. PSI = sum_bins (p-q)*ln(p/q), Laplace-
    smoothed over the FULL bin spine (including 0/11 overflow bins) so
    bins observed on only one side still contribute.

    Scale plan: the only data-sized shuffle is the (type, bucket) partial
    aggregate — everything after runs on ~|types|*12 rows (the spine
    cross-join and window are on the tiny aggregate, not the events
    scan). No UDFs; width_bucket/ln are codegen'd."""
    ev = read_table(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        F.width_bucket(F.col("value"), F.lit(0.0), F.lit(500.0), F.lit(PSI_BINS))
        .cast("int")
        .alias("bucket"),
        (
            (F.floor(F.unix_timestamp("ts") / 86400 / 7) % 2 == 0).cast("bigint")
        ).alias("is_ref"),
    )
    counts = binned.groupBy("event_type", "bucket").agg(
        F.sum("is_ref").alias("ref_cnt"),
        F.sum(1 - F.col("is_ref")).alias("cur_cnt"),
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(0, PSI_BINS + 2).select(F.col("id").cast("int").alias("bucket"))
        )
    )
    full = (
        spine.join(counts, ["event_type", "bucket"], "left")
        .fillna(0, subset=["ref_cnt", "cur_cnt"])
    )
    w = Window.partitionBy("event_type")
    n_bins = PSI_BINS + 2
    p = (F.col("ref_cnt") + PSI_EPS) / (F.sum("ref_cnt").over(w) + PSI_EPS * n_bins)
    q = (F.col("cur_cnt") + PSI_EPS) / (F.sum("cur_cnt").over(w) + PSI_EPS * n_bins)
    term = (p - q) * F.log(p / q)
    return (
        full.withColumn("term", term)
        .groupBy("event_type")
        .agg(
            F.sum("ref_cnt").alias("n_ref"),
            F.sum("cur_cnt").alias("n_cur"),
            F.round(F.sum("term"), 6).alias("psi"),
        )
    )


ORACLE_PSI_DRIFT = f"""
WITH binned AS (
  SELECT event_type,
         CAST(CASE WHEN value < 0 THEN 0
                   WHEN value >= 500 THEN {PSI_BINS + 1}
                   ELSE floor(value / {500.0 / PSI_BINS}) + 1 END AS INTEGER) AS bucket,
         CASE WHEN CAST(floor(epoch(ts) / 86400 / 7) AS bigint) % 2 = 0
              THEN 1 ELSE 0 END AS is_ref
  FROM events
), counts AS (
  SELECT event_type, bucket, sum(is_ref) AS ref_cnt,
         sum(1 - is_ref) AS cur_cnt
  FROM binned GROUP BY 1, 2
), spine AS (
  SELECT event_type, CAST(r.range AS INTEGER) AS bucket
  FROM (SELECT DISTINCT event_type FROM events)
  CROSS JOIN range(0, {PSI_BINS + 2}) r
), full_spine AS (
  SELECT s.event_type, s.bucket,
         coalesce(c.ref_cnt, 0) AS ref_cnt, coalesce(c.cur_cnt, 0) AS cur_cnt
  FROM spine s LEFT JOIN counts c USING (event_type, bucket)
), terms AS (
  SELECT event_type, ref_cnt, cur_cnt,
         ((ref_cnt + {PSI_EPS}) / (sum(ref_cnt) OVER w + {PSI_EPS * (PSI_BINS + 2)})
          - (cur_cnt + {PSI_EPS}) / (sum(cur_cnt) OVER w + {PSI_EPS * (PSI_BINS + 2)}))
         * ln(((ref_cnt + {PSI_EPS}) / (sum(ref_cnt) OVER w + {PSI_EPS * (PSI_BINS + 2)}))
              / ((cur_cnt + {PSI_EPS}) / (sum(cur_cnt) OVER w + {PSI_EPS * (PSI_BINS + 2)}))) AS term
  FROM full_spine
  WINDOW w AS (PARTITION BY event_type)
)
SELECT event_type, CAST(sum(ref_cnt) AS bigint) AS n_ref,
       CAST(sum(cur_cnt) AS bigint) AS n_cur,
       round(sum(term), 6) AS psi
FROM terms GROUP BY 1
"""


QUERIES.update(
    {
        "evt_psi_drift": QuerySpec(
            q_psi_drift,
            ORACLE_PSI_DRIFT,
            "PSI distribution-drift monitor (spine-smoothed, tiny-agg window)",
        ),
    }
)


def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic per event_type,
    comparing the same even/odd epoch-week slices as evt_psi_drift:
    KS = max over observed values of |ECDF_ref - ECDF_cur| — the
    distribution-shift test you run when PSI flags a feature.

    Scale plan: values are pre-aggregated per (type, value) BEFORE the
    window (the classic rank-stats trick — the ECDF window sorts
    |distinct values| rows, not |events| rows); one hash-agg shuffle +
    one per-type window sort on the reduced table. At 100 TB you'd also
    bucket values to a grid first (the events values are already 2 dp)."""
    ev = read_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "value",
        (
            (F.floor(F.unix_timestamp("ts") / 86400 / 7) % 2 == 0).cast("bigint")
        ).alias("is_ref"),
    )
    per_value = base.groupBy("event_type", "value").agg(
        F.sum("is_ref").alias("n_ref"),
        F.sum(1 - F.col("is_ref")).alias("n_cur"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    ecdf = per_value.select(
        "event_type",
        (F.sum("n_ref").over(w) / F.sum("n_ref").over(wt)).alias("f_ref"),
        (F.sum("n_cur").over(w) / F.sum("n_cur").over(wt)).alias("f_cur"),
        F.sum("n_ref").over(wt).alias("tot_ref"),
        F.sum("n_cur").over(wt).alias("tot_cur"),
    )
    return ecdf.groupBy("event_type").agg(
        F.max("tot_ref").alias("n_ref"),
        F.max("tot_cur").alias("n_cur"),
        (
            F.floor(F.max(F.abs(F.col("f_ref") - F.col("f_cur"))) * 1e6 + 0.5) / 1e6
        ).alias("ks"),
    )


ORACLE_KS_TEST = """
WITH base AS (
  SELECT event_type, value,
         CASE WHEN CAST(floor(epoch(ts) / 86400 / 7) AS bigint) % 2 = 0
              THEN 1 ELSE 0 END AS is_ref
  FROM events
), per_value AS (
  SELECT event_type, value, sum(is_ref) AS n_ref, sum(1 - is_ref) AS n_cur
  FROM base GROUP BY 1, 2
), ecdf AS (
  SELECT event_type,
         sum(n_ref) OVER (PARTITION BY event_type ORDER BY value
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           * 1.0 / sum(n_ref) OVER (PARTITION BY event_type) AS f_ref,
         sum(n_cur) OVER (PARTITION BY event_type ORDER BY value
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           * 1.0 / sum(n_cur) OVER (PARTITION BY event_type) AS f_cur,
         sum(n_ref) OVER (PARTITION BY event_type) AS tot_ref,
         sum(n_cur) OVER (PARTITION BY event_type) AS tot_cur
  FROM per_value
)
SELECT event_type, CAST(max(tot_ref) AS bigint) AS n_ref,
       CAST(max(tot_cur) AS bigint) AS n_cur,
       floor(max(abs(f_ref - f_cur)) * 1e6 + 0.5) / 1e6 AS ks
FROM ecdf GROUP BY 1
"""


ACF_LAGS = 3


def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function: corr(x_t, x_{t-k}) for k = 1..3 over the
    hourly avg(value) series per event_type — the seasonality probe that
    decides window sizes for forecasting features. The lag windows and
    corr aggregates run on the HOURLY rollup (tiny), not raw events; the
    only data-sized shuffle is the rollup itself."""
    ev = read_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(F.avg("value").alias("x"))
    w = Window.partitionBy("event_type").orderBy("bucket")
    lagged = hourly.select(
        "event_type",
        "x",
        *[F.lag("x", k).over(w).alias(f"x{k}") for k in range(1, ACF_LAGS + 1)],
    )
    per_lag = [
        lagged.groupBy("event_type").agg(
            F.lit(k).cast("int").alias("lag"),
            F.round(F.corr("x", f"x{k}"), 6).alias("acf"),
            F.count(f"x{k}").alias("n_pairs"),
        )
        for k in range(1, ACF_LAGS + 1)
    ]
    out = per_lag[0]
    for df in per_lag[1:]:
        out = out.unionByName(df)
    return out


ORACLE_AUTOCORR = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket, event_type, avg(value) AS x
  FROM events GROUP BY 1, 2
), lagged AS (
  SELECT event_type, x,
         lag(x, 1) OVER w AS x1, lag(x, 2) OVER w AS x2, lag(x, 3) OVER w AS x3
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
)
SELECT event_type, CAST(k.lag AS INT) AS lag,
       round(CASE k.lag WHEN 1 THEN corr(x, x1)
                        WHEN 2 THEN corr(x, x2)
                        ELSE corr(x, x3) END, 6) AS acf,
       CASE k.lag WHEN 1 THEN count(x1) WHEN 2 THEN count(x2)
                  ELSE count(x3) END AS n_pairs
FROM lagged CROSS JOIN (SELECT unnest(range(1, {ACF_LAGS + 1})) AS lag) k
GROUP BY event_type, k.lag
"""


QUERIES.update(
    {
        "evt_ks_test": QuerySpec(
            q_ks_test,
            ORACLE_KS_TEST,
            "exact two-sample KS statistic (ECDF on value-aggregated table)",
        ),
        "evt_autocorr": QuerySpec(
            q_autocorr,
            ORACLE_AUTOCORR,
            "autocorrelation function over hourly rollup (lags 1..3)",
        ),
    }
)


TREND_EPOCH = 1767225600  # 2026-01-01 00:00 UTC


def q_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend: OLS slope/intercept/R2 of value against
    event time (hours since epoch) via the built-in regression aggregates
    (regr_slope & co are single-pass partial aggregates — the co-moment
    partials merge associatively, so one hash-agg shuffle of 6 doubles
    per type serves any corpus size; this is the drift-DIRECTION probe
    next to evt_psi_drift's magnitude)."""
    ev = read_table(spark, sf_dir, "events")
    # center x on a fixed reference epoch (2026-01-01): with x measured
    # from epoch 0 the intercept extrapolates ~5e5 hours back, amplifying
    # the engines' co-moment accumulation differences past the rounding
    # grain; centered, both engines agree to 6 dp
    xy = ev.select(
        "event_type",
        ((F.unix_timestamp("ts") - F.lit(TREND_EPOCH)) / 3600.0).alias("x"),
        F.col("value").alias("y"),
    )
    return xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.floor(F.regr_slope("y", "x") * 1e6 + 0.5) / 1e6).alias("slope"),
        (F.floor(F.regr_intercept("y", "x") * 1e4 + 0.5) / 1e4).alias("intercept"),
        (F.floor(F.regr_r2("y", "x") * 1e6 + 0.5) / 1e6).alias("r2"),
    )


ORACLE_TREND_SLOPES = f"""
SELECT event_type, count(*) AS n,
       floor(regr_slope(value, (epoch(ts) - {TREND_EPOCH}) / 3600.0) * 1e6 + 0.5) / 1e6 AS slope,
       floor(regr_intercept(value, (epoch(ts) - {TREND_EPOCH}) / 3600.0) * 1e4 + 0.5) / 1e4 AS intercept,
       floor(regr_r2(value, (epoch(ts) - {TREND_EPOCH}) / 3600.0) * 1e6 + 0.5) / 1e6 AS r2
FROM events GROUP BY 1
"""


def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test: is event_type independent of
    day-of-week? One (type, dow) partial-agg pass; expected counts and
    the statistic are computed with windows over the CONTINGENCY TABLE
    (|types| x 7 rows), so nothing data-sized moves after the first
    aggregate. Output: per-type chi2 contribution + dof — the
    categorical-drift sibling of the numeric KS/PSI monitors."""
    ev = read_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.dayofweek("ts").cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    w_all = Window.partitionBy()
    w_type = Window.partitionBy("event_type")
    w_dow = Window.partitionBy("dow")
    with_exp = obs.select(
        "event_type",
        "dow",
        "o",
        (
            F.sum("o").over(w_type)
            * F.sum("o").over(w_dow)
            / F.sum("o").over(w_all)
        ).alias("e"),
    )
    return with_exp.groupBy("event_type").agg(
        F.sum("o").alias("n_events"),
        F.count(F.lit(1)).cast("int").alias("n_cells"),
        (
            F.floor(
                F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"))
                * 1e6
                + 0.5
            )
            / 1e6
        ).alias("chi2_contrib"),
    )


ORACLE_CHI_SQUARE = """
WITH obs AS (
  SELECT event_type, CAST(dayofweek(ts) AS INT) AS dow, count(*) AS o
  FROM events GROUP BY 1, 2
), with_exp AS (
  SELECT event_type, dow, o,
         sum(o) OVER (PARTITION BY event_type) * sum(o) OVER (PARTITION BY dow)
           * 1.0 / sum(o) OVER () AS e
  FROM obs
)
SELECT event_type, CAST(sum(o) AS bigint) AS n_events,
       CAST(count(*) AS INT) AS n_cells,
       floor(sum((o - e) * (o - e) / e) * 1e6 + 0.5) / 1e6 AS chi2_contrib
FROM with_exp GROUP BY 1
"""


QUERIES.update(
    {
        "evt_trend_slopes": QuerySpec(
            q_trend_slopes,
            ORACLE_TREND_SLOPES,
            "per-type OLS trend via regression aggregates (one pass)",
        ),
        "evt_chi_square": QuerySpec(
            q_chi_square,
            ORACLE_CHI_SQUARE,
            "chi-square independence: event_type x day-of-week",
        ),
    }
)


IVM_MOD = 10  # event_id % MOD == 0 → the synthetic "today's delta"


def q_ivm_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (operators/ivm.py): the per-type
    stats view refreshed by MERGING the delta batch's partial state into
    the base state — no base-data rescan. The oracle aggregates the FULL
    table directly, proving merged-incremental == recomputed-from-scratch
    (the IVM correctness property). Refresh cost is O(|delta| + groups)."""
    from ..operators.ivm import aggregate_state, merge_states, read_view

    ev = read_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_id") % IVM_MOD != 0)
    delta = ev.filter(F.col("event_id") % IVM_MOD == 0)
    merged = merge_states(
        aggregate_state(base, ["event_type"], "value"),
        aggregate_state(delta, ["event_type"], "value"),
        ["event_type"],
    )
    return read_view(merged)


ORACLE_IVM_REFRESH = """
SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_v,
       round(sum(value) / count(*), 6) AS avg_v,
       min(value) AS min_v, max(value) AS max_v
FROM events GROUP BY 1
"""


QUERIES.update(
    {
        "evt_ivm_refresh": QuerySpec(
            q_ivm_refresh,
            ORACLE_IVM_REFRESH,
            "incremental view maintenance: delta state merge == full recompute",
        ),
    }
)


def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): per event, the
    count and sum of the SAME USER's events in the trailing hour —
    the rate-limiter / velocity-check primitive. RANGE frames include
    all peers of the boundary values, so the result is deterministic
    under any tie order (unlike a ROWS frame on a non-unique sort key).
    One window sort per user partition; the frame is evaluated with a
    sliding aggregate over the sorted run, not a self-join."""
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.filter(F.col("user_id") < 40).select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_hour"),
        F.round(F.sum("value").over(w), 2).alias("sum_trailing_hour"),
    )


ORACLE_RANGE_FRAME = """
SELECT event_id, user_id,
       count(*) OVER w AS n_trailing_hour,
       round(sum(value) OVER w, 2) AS sum_trailing_hour
FROM events WHERE user_id < 40
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS bigint)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


def q_ranking_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function surface in ONE window pass: rank,
    dense_rank, percent_rank, cume_dist, ntile(4) of each order within
    its priority class by totalprice (orderkey tiebreak so every
    function is deterministic). One sort per partition serves all five
    functions — Spark evaluates them over the same sorted run."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("bigint").alias("rk"),
        F.dense_rank().over(w).cast("bigint").alias("drk"),
        (F.floor(F.percent_rank().over(w) * 1e6 + 0.5) / 1e6).alias("prk"),
        (F.floor(F.cume_dist().over(w) * 1e6 + 0.5) / 1e6).alias("cd"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


ORACLE_RANKING_SURFACE = """
WITH f AS (SELECT * FROM orders WHERE o_orderkey % 7 = 0)
SELECT o_orderkey, o_orderpriority,
       rank() OVER w AS rk,
       dense_rank() OVER w AS drk,
       floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS prk,
       floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cd,
       CAST(ntile(4) OVER w AS INT) AS quartile
FROM f
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey ASC)
"""


QUERIES.update(
    {
        "evt_range_frame": QuerySpec(
            q_range_frame,
            ORACLE_RANGE_FRAME,
            "trailing-hour RANGE window frame (tie-safe velocity check)",
        ),
        "window_ranking_surface": QuerySpec(
            q_ranking_surface,
            ORACLE_RANKING_SURFACE,
            "rank/dense_rank/percent_rank/cume_dist/ntile in one window pass",
        ),
    }
)


def q_map_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface in one plan: build a per-user
    event_type -> count map (map_from_entries over collect_list),
    map_filter (keep types seen >= 2x), transform_values (log2 bucket),
    then explode back to rows so the oracle hash-verifies every entry
    that survived the map pipeline. The collect_list map per user is
    bounded by |event types| (5), not events — the per-key aggregate
    runs first, so no unbounded row is ever collected."""
    ev = read_table(spark, sf_dir, "events")
    per = (
        ev.filter(F.col("user_id") < 30)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("m")
    )
    piped = m.select(
        "user_id",
        F.transform_values(
            F.map_filter(F.col("m"), lambda _k, v: v >= 2),
            lambda _k, v: F.floor(F.log2(v)).cast("bigint"),
        ).alias("m2"),
    )
    return piped.select(
        "user_id", F.explode("m2").alias("event_type", "cnt_bucket")
    )


ORACLE_MAP_SURFACE = """
SELECT user_id, event_type,
       CAST(floor(log2(count(*))) AS bigint) AS cnt_bucket
FROM events WHERE user_id < 30
GROUP BY 1, 2 HAVING count(*) >= 2
"""


QUERIES.update(
    {
        "evt_map_surface": QuerySpec(
            q_map_surface,
            ORACLE_MAP_SURFACE,
            "map_from_entries -> map_filter -> transform_values -> explode",
        ),
    }
)


MERGE_IV_MIN = 30  # each event opens a 30-minute activity interval


def q_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union (gaps-and-islands): each event opens a 30-minute
    activity interval; overllapping intervals per user merge into islands
    via the running-max-end trick — new island iff this start exceeds the
    max end seen so far. Output per user: island count and total covered
    seconds (exact integer arithmetic). One window sort per user; no
    self-join — the naive interval-overlap self-join is O(n^2) per user
    and this is the scalable replacement. Distinct from evt_sessionize
    (which clusters POINTS by gaps; this unions INTERVALS)."""
    ev = read_table(spark, sf_dir, "events")
    iv = ev.filter(F.col("user_id") < 50).select(
        "user_id",
        F.unix_timestamp("ts").alias("s"),
        (F.unix_timestamp("ts") + MERGE_IV_MIN * 60).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_end = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islanded = iv.withColumn(
        "island",
        F.sum(
            F.when(
                prev_max_end.isNull() | (F.col("s") > prev_max_end), 1
            ).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = islanded.groupBy("user_id", "island").agg(
        F.min("s").alias("is_start"), F.max("e").alias("is_end")
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("is_end") - F.col("is_start")).alias("covered_sec"),
    )


ORACLE_MERGE_INTERVALS = f"""
WITH iv AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS bigint) AS s,
         CAST(floor(epoch(ts)) AS bigint) + {MERGE_IV_MIN * 60} AS e
  FROM events WHERE user_id < 50
), flagged AS (
  SELECT user_id, s, e,
         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
               OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
), islanded AS (
  SELECT user_id, s, e,
         sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM flagged
), islands AS (
  SELECT user_id, island, min(s) AS is_start, max(e) AS is_end
  FROM islanded GROUP BY 1, 2
)
SELECT user_id, count(*) AS n_islands,
       CAST(sum(is_end - is_start) AS bigint) AS covered_sec
FROM islands GROUP BY 1
"""


QUERIES.update(
    {
        "evt_merge_intervals": QuerySpec(
            q_merge_intervals,
            ORACLE_MERGE_INTERVALS,
            "interval union via running-max-end islands (no self-join)",
        ),
    }
)


def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement stickiness (DAU/MAU): per calendar month, the average
    daily-active count over the month's days divided by the month's
    distinct actives. Both levels are partial-agg distinct counts over
    (day, user) / (month, user) — no distinct-over-window, which Spark
    (and any engine at 100 TB) cannot do exactly without a bitmap union;
    the calendar-month framing keeps it exact AND mergeable."""
    ev = read_table(spark, sf_dir, "events")
    day_user = ev.select(
        F.date_trunc("month", "ts").alias("month"),
        F.date_trunc("day", "ts").alias("day"),
        "user_id",
    ).distinct()
    dau = day_user.groupBy("month", "day").agg(
        F.count(F.lit(1)).alias("dau")
    )
    mau = day_user.select("month", "user_id").distinct().groupBy("month").agg(
        F.count(F.lit(1)).alias("mau")
    )
    per_month = dau.groupBy("month").agg(F.avg("dau").alias("avg_dau"))
    return (
        per_month.join(mau, "month")
        .select(
            F.date_format("month", "yyyy-MM").alias("month"),
            (F.floor(F.col("avg_dau") * 1e6 + 0.5) / 1e6).alias("avg_dau"),
            "mau",
            (
                F.floor(F.col("avg_dau") / F.col("mau") * 1e6 + 0.5) / 1e6
            ).alias("stickiness"),
        )
    )


ORACLE_STICKINESS = """
WITH du AS (
  SELECT DISTINCT date_trunc('month', ts) AS month,
                  date_trunc('day', ts) AS day, user_id
  FROM events
), dau AS (
  SELECT month, day, count(*) AS dau FROM du GROUP BY 1, 2
), mau AS (
  SELECT month, count(DISTINCT user_id) AS mau FROM du GROUP BY 1
), pm AS (
  SELECT month, avg(dau) AS avg_dau FROM dau GROUP BY 1
)
SELECT strftime(pm.month, '%Y-%m') AS month,
       floor(avg_dau * 1e6 + 0.5) / 1e6 AS avg_dau,
       mau,
       floor(avg_dau / mau * 1e6 + 0.5) / 1e6 AS stickiness
FROM pm JOIN mau USING (month)
"""


DECAY_HALFLIFE_DAYS = 30.0
DECAY_REF_EPOCH = 1767225600  # 2026-01-01 00:00 UTC (shared with TREND_EPOCH)


def q_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed engagement score (the feature-store recency-weighted
    aggregate): per user (user_id < 40), sum of value * 0.5^(age_days /
    halflife) with age measured back from a FIXED reference instant —
    fixed, not now(), so the feature is reproducible and the oracle
    deterministic. One partial-agg pass; the decay weight is a codegen'd
    pow() on the scan, so the shuffle carries one double per user."""
    ev = read_table(spark, sf_dir, "events")
    age_days = (F.lit(DECAY_REF_EPOCH) - F.unix_timestamp("ts")) / 86400.0
    w = F.pow(F.lit(0.5), age_days / DECAY_HALFLIFE_DAYS)
    return (
        ev.filter(F.col("user_id") < 40)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.floor(F.sum(F.col("value") * w) * 1e4 + 0.5) / 1e4).alias(
                "decayed_score"
            ),
        )
    )


ORACLE_DECAYED_ENGAGEMENT = f"""
SELECT user_id, count(*) AS n_events,
       floor(sum(value * pow(0.5, ({DECAY_REF_EPOCH} - floor(epoch(ts))) / 86400.0
                                   / {DECAY_HALFLIFE_DAYS})) * 1e4 + 0.5) / 1e4
         AS decayed_score
FROM events WHERE user_id < 40 GROUP BY 1
"""


QUERIES.update(
    {
        "evt_stickiness": QuerySpec(
            q_stickiness,
            ORACLE_STICKINESS,
            "DAU/MAU stickiness (exact, partial-agg distinct at two grains)",
        ),
        "evt_decayed_engagement": QuerySpec(
            q_decayed_engagement,
            ORACLE_DECAYED_ENGAGEMENT,
            "half-life-decayed engagement score (fixed reference instant)",
        ),
    }
)


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary): per user,
    days-since-last-event against the fixed reference instant, event
    count, and value sum — each quartiled by ntile(4) with a user_id
    tiebreak so the segment code ('r-f-m') is deterministic on any
    engine. One partial-agg pass builds the per-user triple (bounded:
    one row per user); the three ntile windows then run on that
    user-sized table, not the event scan.

    Scale ceiling (documented by design): the ntile windows single-task
    sort the USER dimension — fine to ~10^8 users (three sorts of a
    3-number-per-user rollup), the right exactness trade for a marketing
    segmentation. Past that, swap ntile for broadcast quartile
    thresholds (the evt_lift_curve / q_length_curriculum pattern) at the
    cost of exact equal-size quartiles under ties — the per-metric
    percentile aggregate is already the plan's partial-agg shape, so the
    swap is local."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.floor(
            (F.lit(DECAY_REF_EPOCH) - F.max(F.unix_timestamp("ts"))) / 86400
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("value"), 2).alias("monetary"),
    )
    wr = Window.orderBy(F.col("recency_days").asc(), F.col("user_id").asc())
    wf = Window.orderBy(F.col("frequency").desc(), F.col("user_id").asc())
    wm = Window.orderBy(F.col("monetary").desc(), F.col("user_id").asc())
    return per_user.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.concat_ws(
            "-",
            F.ntile(4).over(wr).cast("string"),
            F.ntile(4).over(wf).cast("string"),
            F.ntile(4).over(wm).cast("string"),
        ).alias("rfm_segment"),
    )


ORACLE_RFM = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(floor(({DECAY_REF_EPOCH} - max(floor(epoch(ts)))) / 86400) AS bigint)
           AS recency_days,
         count(*) AS frequency,
         round(sum(value), 2) AS monetary
  FROM events GROUP BY 1
)
SELECT user_id, recency_days, frequency, monetary,
       concat_ws('-',
         CAST(ntile(4) OVER (ORDER BY recency_days ASC, user_id ASC) AS VARCHAR),
         CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id ASC) AS VARCHAR),
         CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id ASC) AS VARCHAR)
       ) AS rfm_segment
FROM per_user
"""


QUERIES.update(
    {
        "evt_rfm_segments": QuerySpec(
            q_rfm_segments,
            ORACLE_RFM,
            "RFM quartile segmentation (windows on the user-sized table)",
        ),
    }
)


def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end to end — the record-linkage pipeline:
    length-blocked fuzzy candidate pairs over DISTINCT part names
    (dedup/fuzzy.py, ≤2 edits), transitive closure into entities
    (dedup/clusters.py::connected_components — iterative min-label,
    localCheckpoint per round), then one profile row per resolved
    entity: canonical name (lexicographic min), member count, the
    sorted member list, and total source rows covered.

    Scale shape: matching runs on the distinct-value domain (vocabulary-
    sized), never corpus rows; closure labels are md5_64 ids so the
    numeric min-label machinery applies; the row-count join back to the
    corpus is a broadcast of the vocabulary-sized frequency table. The
    oracle replays the same closure as a recursive CTE on the name
    strings — connectivity is identical, and the canonical min-name is
    label-scheme-independent."""
    from ..dedup.clusters import connected_components
    from ..dedup.fuzzy import fuzzy_value_pairs
    from ..functions.text import md5_64

    part = read_table(spark, sf_dir, "part")
    pairs = fuzzy_value_pairs(part, "p_name", max_dist=2)
    idp = pairs.select(
        md5_64(F.col("val_a")).alias("id_a"),
        md5_64(F.col("val_b")).alias("id_b"),
        "val_a",
        "val_b",
    ).persist()
    cc = connected_components(idp, "id_a", "id_b")
    names = (
        idp.select(F.col("id_a").alias("node"), F.col("val_a").alias("name"))
        .unionByName(
            idp.select(
                F.col("id_b").alias("node"), F.col("val_b").alias("name")
            )
        )
        .distinct()
    )
    freq = part.groupBy(F.col("p_name").alias("name")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    members = cc.join(names, "node").join(F.broadcast(freq), "name")
    return (
        members.groupBy("cluster_id")
        .agg(
            F.min("name").alias("entity"),
            F.count(F.lit(1)).alias("n_names"),
            F.array_join(F.array_sort(F.collect_list("name")), "|").alias(
                "members"
            ),
            F.sum("n_rows").alias("n_rows"),
        )
        .drop("cluster_id")
    )


ORACLE_ENTITY_RESOLUTION = """
WITH RECURSIVE vals AS (SELECT DISTINCT p_name AS v FROM part),
pairs AS (
  SELECT a.v AS val_a, b.v AS val_b
  FROM vals a JOIN vals b
    ON a.v < b.v AND abs(length(a.v) - length(b.v)) <= 2
  WHERE levenshtein(a.v, b.v) <= 2
),
edges AS (SELECT val_a AS u, val_b AS v FROM pairs
          UNION SELECT val_b AS u, val_a AS v FROM pairs),
reach(node, lbl) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, r.lbl FROM edges e JOIN reach r ON e.v = r.node
),
cc AS (SELECT node, min(lbl) AS entity_key FROM reach GROUP BY node),
freq AS (SELECT p_name AS name, count(*) AS n_rows FROM part GROUP BY 1)
SELECT min(cc.node) AS entity, count(*) AS n_names,
       string_agg(cc.node, '|' ORDER BY cc.node) AS members,
       cast(sum(f.n_rows) AS BIGINT) AS n_rows
FROM cc JOIN freq f ON cc.node = f.name
GROUP BY cc.entity_key
"""


QUERIES.update(
    {
        "ent_resolve_parts": QuerySpec(
            q_entity_resolution,
            ORACLE_ENTITY_RESOLUTION,
            "entity resolution: blocked fuzzy match -> closure -> canonical profile",
        ),
    }
)


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer cohort lifetime-value curve: cohort = first-order month,
    then cumulative revenue per cohort member by month offset — the
    standard growth-accounting artifact.

    Scale shape: one per-customer min reduction (customer-sized), one
    broadcast join of that cohort frame back onto orders, one
    (cohort × offset) aggregate; the cumulative window runs on that
    bounded matrix (months², not orders). Revenue rounds to 2 dp before
    the running sum, LTV to 6 after — identical in the oracle."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_trunc("month", "o_orderdate").alias("m"),
        "o_totalprice",
    )
    cohort = o.groupBy("o_custkey").agg(F.min("m").alias("cm"))
    sizes = cohort.groupBy("cm").agg(
        F.count(F.lit(1)).alias("cohort_customers")
    )
    cells = (
        o.join(F.broadcast(cohort), "o_custkey")
        .groupBy(
            "cm",
            (
                (F.year("m") - F.year("cm")) * 12
                + (F.month("m") - F.month("cm"))
            ).cast("int").alias("month_offset"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = (
        Window.partitionBy("cm")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cells.withColumn("cum_revenue", F.round(F.sum("revenue").over(w), 2))
        .join(F.broadcast(sizes), "cm")
        .select(
            F.date_format("cm", "yyyy-MM").alias("cohort_month"),
            "month_offset",
            "revenue",
            "cum_revenue",
            "cohort_customers",
            F.round(
                F.col("cum_revenue") / F.col("cohort_customers"), 6
            ).alias("ltv_per_customer"),
        )
    )


ORACLE_COHORT_LTV = """
WITH o AS (
  SELECT o_custkey, date_trunc('month', o_orderdate) AS m, o_totalprice
  FROM orders
),
cohort AS (SELECT o_custkey, min(m) AS cm FROM o GROUP BY 1),
sizes AS (SELECT cm, count(*) AS cohort_customers FROM cohort GROUP BY 1),
cells AS (
  SELECT c.cm,
         CAST((extract(year FROM o.m) - extract(year FROM c.cm)) * 12
              + (extract(month FROM o.m) - extract(month FROM c.cm)) AS INT)
           AS month_offset,
         round(sum(o.o_totalprice), 2) AS revenue
  FROM o JOIN cohort c USING (o_custkey)
  GROUP BY 1, 2
),
cum AS (
  SELECT cm, month_offset, revenue,
         round(sum(revenue) OVER (PARTITION BY cm ORDER BY month_offset
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS cum_revenue
  FROM cells
)
SELECT strftime(c.cm, '%Y-%m') AS cohort_month, c.month_offset, c.revenue,
       c.cum_revenue, s.cohort_customers,
       round(c.cum_revenue / s.cohort_customers, 6) AS ltv_per_customer
FROM cum c JOIN sizes s USING (cm)
"""


QUERIES.update(
    {
        "ord_cohort_ltv": QuerySpec(
            q_cohort_ltv,
            ORACLE_COHORT_LTV,
            "cohort LTV curve (broadcast cohort join; windows on the bounded matrix)",
        ),
    }
)


def q_ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN view (the companion to
    evt_ivm_refresh's aggregate case): the materialized view is revenue
    per nation over orders ⋈ customer ⋈ nation; a late-arriving delta
    batch (o_orderkey % 10 == 0 stands in for the new partition) is
    joined against the dimensions ALONE and its partial aggregate is
    ADDED to the base view — the classic ΔA⋈B maintenance identity,
    which touches |Δ| rows instead of re-scanning the fact table.

    The emitted `consistent` boolean is load-bearing: the query also
    recomputes the view from scratch and compares per nation (2-dp
    exact), so a broken merge path flips the hash. Dimensions broadcast;
    both fact passes are partial-aggregated before their joins."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    def view(orders):
        return (
            orders.join(F.broadcast(c), orders.o_custkey == c.c_custkey)
            .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
        )

    base = view(o.filter(F.col("o_orderkey") % 10 != 0)).withColumnRenamed(
        "rev", "base_rev"
    )
    delta = view(o.filter(F.col("o_orderkey") % 10 == 0)).withColumnRenamed(
        "rev", "delta_rev"
    )
    full = view(o).withColumnRenamed("rev", "full_rev")
    merged = (
        base.join(delta, "n_name", "full")
        .select(
            "n_name",
            F.coalesce("base_rev", F.lit(0.0)).alias("base_rev"),
            F.coalesce("delta_rev", F.lit(0.0)).alias("delta_rev"),
        )
        .withColumn(
            "total_rev", F.round(F.col("base_rev") + F.col("delta_rev"), 2)
        )
    )
    return merged.join(full, "n_name").select(
        "n_name",
        "base_rev",
        "delta_rev",
        "total_rev",
        (F.abs(F.col("total_rev") - F.col("full_rev")) < 0.011).alias(
            "consistent"
        ),
    )


ORACLE_IVM_JOIN_DELTA = """
WITH j AS (
  SELECT n.n_name, o.o_orderkey, o.o_totalprice
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
),
base AS (SELECT n_name, round(sum(o_totalprice), 2) AS base_rev
         FROM j WHERE o_orderkey % 10 != 0 GROUP BY 1),
delta AS (SELECT n_name, round(sum(o_totalprice), 2) AS delta_rev
          FROM j WHERE o_orderkey % 10 = 0 GROUP BY 1)
SELECT coalesce(b.n_name, d.n_name) AS n_name,
       coalesce(b.base_rev, 0.0) AS base_rev,
       coalesce(d.delta_rev, 0.0) AS delta_rev,
       round(coalesce(b.base_rev, 0.0) + coalesce(d.delta_rev, 0.0), 2)
         AS total_rev,
       TRUE AS consistent
FROM base b FULL OUTER JOIN delta d USING (n_name)
"""


QUERIES.update(
    {
        "ivm_join_delta": QuerySpec(
            q_ivm_join_delta,
            ORACLE_IVM_JOIN_DELTA,
            "join-view incremental maintenance (delta partial + base merge, self-verified)",
        ),
    }
)
