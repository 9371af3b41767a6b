"""Scale-operations queries: the tooling a 100 TB pipeline operator
actually reaches for — deterministic per-group reservoir sampling, hot-key
skew diagnostics, OHLC time-series downsampling, Z-order layout keys, and
bigram-LM quality scoring.

None of these exist in the reference (its analytic surface is count/sum
KPIs — `Consumer.scala:127-149`); they extend the north-star
training-data-pipeline suite (SURVEY §6) and every one carries a DuckDB
oracle. Hash-bearing queries reuse the engine-wide md5_64 convention
(`functions/text.py:81`) so results are bit-exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import md5_64
from ..operators.layout import zorder_value
from ..operators.timeseries import ohlc
from ..sources.batch import read_table
from . import QuerySpec

TS_FMT = "yyyy-MM-dd HH:mm:ss"

RESERVOIR_K = 40
RESERVOIR_SALT = "rsv1"


def q_reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group uniform sample (reservoir-equivalent):
    the K documents per source with the smallest md5(salt || doc_id) —
    the same keys on any re-run, any partitioning, any corpus growth
    order, which is what makes audit samples reproducible.

    Plan: one hash shuffle on source + a per-partition sort for the
    row_number window. The window input is the full corpus, but the sort
    key is a 60-bit int and the filter keeps K rows per group — at
    cluster scale you'd add a per-partition pre-filter (local top-K via
    the same key) if |group| >> K; at any scale there is exactly one
    shuffle and no driver collection."""
    d = read_table(spark, sf_dir, "documents")
    keyed = d.select(
        "source",
        "doc_id",
        md5_64(
            F.concat(F.lit(RESERVOIR_SALT), F.col("doc_id").cast("string"))
        ).alias("__k"),
    )
    w = Window.partitionBy("source").orderBy("__k", "doc_id")
    return (
        keyed.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= RESERVOIR_K)
        .select("source", "doc_id", "sample_rank")
    )


ORACLE_RESERVOIR = f"""
WITH keyed AS (
  SELECT source, doc_id,
         cast(('0x' || substr(md5(concat('{RESERVOIR_SALT}',
              CAST(doc_id AS VARCHAR))), 1, 15)) AS bigint) AS k
  FROM documents
)
SELECT source, doc_id, sample_rank FROM (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY k, doc_id)
           AS sample_rank
  FROM keyed
) WHERE sample_rank <= {RESERVOIR_K}
"""


SKEW_TOP = 10


def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key skew diagnostic: the {SKEW_TOP} heaviest user_ids by event
    count with each key's share of the total — the table you read before
    deciding whether a join needs salting (operators/skew.py) or AQE
    skew-split suffices.

    Scale posture: the per-key counts are a map-side partial aggregate
    (|keys| rows out of the shuffle, not |events|); the top-K is
    orderBy().limit() — Spark's TakeOrdered, a per-partition heap + a
    K-row driver merge, NOT a global sort; the share denominator is a
    1-row aggregate broadcast into a literal-free cross join. The only
    full window runs on the K-row result."""
    ev = read_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__n"))
    top = (
        counts.orderBy(F.desc("cnt"), "user_id")
        .limit(SKEW_TOP)
        .crossJoin(F.broadcast(total))
    )
    w = Window.orderBy(F.desc("cnt"), "user_id")
    return top.select(
        F.row_number().over(w).alias("hot_rank"),
        "user_id",
        "cnt",
        F.round(F.col("cnt") / F.col("__n"), 6).alias("share"),
    )


ORACLE_SKEW = f"""
WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
t AS (SELECT sum(cnt) AS n FROM c),
top AS (
  SELECT user_id, cnt,
         row_number() OVER (ORDER BY cnt DESC, user_id) AS hot_rank
  FROM c ORDER BY cnt DESC, user_id LIMIT {SKEW_TOP}
)
SELECT hot_rank, user_id, cnt, round(cnt / n, 6) AS share FROM top, t
"""


def q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC resample of event values per event_type
    (operators/timeseries.py::ohlc): open/close are first/last in a
    TOTAL event-time order (ts, event_id tie-break), high/low/volume from
    the follow-up hash aggregate. One shuffle, one local sort."""
    ev = read_table(spark, sf_dir, "events")
    out = ohlc(
        ev, ts="ts", value="value", tiebreak="event_id", keys=["event_type"]
    )
    return out.select(
        "event_type",
        F.date_format("bucket", TS_FMT).alias("bucket_start"),
        "open",
        "high",
        "low",
        "close",
        "n_events",
        "volume",
    )


ORACLE_OHLC = """
WITH w AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, value,
         first_value(value) OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS o,
         last_value(value) OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS c
  FROM events
)
SELECT event_type,
       strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
       max(o) AS open, max(value) AS high, min(value) AS low,
       max(c) AS close, count(*) AS n_events,
       round(sum(value), 2) AS volume
FROM w GROUP BY event_type, bucket
"""


# Z-order dimensions for lineitem: (column, lo, hi) domain bounds.
ZORDER_DIMS = [
    ("l_quantity", 1.0, 50.0),
    ("l_extendedprice", 900.0, 105000.0),
]


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key over (l_quantity, l_extendedprice)
    for every lineitem row (operators/layout.py::zorder_value) — the key
    a `repartitionByRange(zval).sortWithinPartitions(zval).write` layout
    job clusters on so BOTH columns' parquet min/max stats become
    selective. Pure codegen'd shift/and/or bit math, no UDF; the oracle
    re-derives the identical interleave in DuckDB integer SQL."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        zorder_value(ZORDER_DIMS).alias("zval"),
    )


def _sql_zorder(dims: list[tuple[str, float, float]]) -> str:
    """DuckDB twin of operators/layout.py::zorder_value: identical
    normalization (IEEE double ops, then truncation — DuckDB's bigint
    cast ROUNDS, so floor() here mirrors Spark's truncating cast) and
    identical round-robin bit interleave."""
    nd = len(dims)
    bits = min(16, 63 // nd)
    hi_val = (1 << bits) - 1
    terms = []
    for d_idx, (col, lo, hi) in enumerate(dims):
        norm = (
            f"cast(floor(least(greatest((cast({col} AS double) - {lo!r}) /"
            f" {hi - lo!r}, 0.0), 1.0) * {hi_val}) AS bigint)"
        )
        for bit in range(bits):
            terms.append(f"((({norm} >> {bit}) & 1) << {bit * nd + d_idx})")
    return " + ".join(terms)


ORACLE_ZORDER = f"""
SELECT l_orderkey, l_linenumber, ({_sql_zorder(ZORDER_DIMS)}) AS zval
FROM lineitem
"""


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality score
    (textstats/analysis.py::add_bigram_logprob): per-doc mean
    log p(w2 | w1) under the corpus's own bigram model — the surprisal
    filter that separates shuffled-token gibberish from natural text."""
    from ..textstats.analysis import add_bigram_logprob

    d = read_table(spark, sf_dir, "documents")
    return add_bigram_logprob(d, "text")


# Tokenization twins of suite/llm.py's SQL_NORM / SQL_TOKS convention.
_SQL_NORM = r"trim(lower(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')))"
_SQL_TOKS = rf"string_split_regex({_SQL_NORM}, '\s+')"

ORACLE_BIGRAM = rf"""
WITH t AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS w,
         unnest(generate_series(1, len({_SQL_TOKS}))) AS pos
  FROM documents WHERE {_SQL_NORM} != ''
),
bg AS (
  SELECT doc_id, w AS w1,
         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM t
),
b AS (SELECT doc_id, w1, w1 || ' ' || w2 AS bigram FROM bg
      WHERE w2 IS NOT NULL),
bm AS (SELECT bigram, count(*) AS cb FROM b GROUP BY bigram),
pm AS (SELECT w1, count(*) AS cp FROM b GROUP BY w1)
SELECT doc_id, count(*) AS n_bigrams,
       round(avg(ln(cb * 1.0 / cp)), 6) AS avg_logprob
FROM b JOIN bm USING (bigram) JOIN pm USING (w1)
GROUP BY doc_id
"""


QUERIES: dict[str, QuerySpec] = {
    "doc_reservoir_sample": QuerySpec(
        q_reservoir_per_source,
        ORACLE_RESERVOIR,
        "deterministic per-source reservoir sample (md5 rank, bit-exact)",
    ),
    "evt_skew_profile": QuerySpec(
        q_skew_profile,
        ORACLE_SKEW,
        "hot-key skew diagnostic: top keys by count + share of total",
    ),
    "ts_ohlc": QuerySpec(
        q_ohlc,
        ORACLE_OHLC,
        "hourly OHLC resample, one window sort + hash aggregate",
    ),
    "layout_zorder_key": QuerySpec(
        q_zorder_key,
        ORACLE_ZORDER,
        "Z-order/Morton layout key, codegen'd bit interleave, SQL twin",
    ),
    "doc_bigram_logprob": QuerySpec(
        q_bigram_logprob,
        ORACLE_BIGRAM,
        "bigram-LM surprisal quality score (MLE conditional, zip_with)",
    ),
}


SESSION_GAP_S = 1800


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (operators/timeseries.py::sessionize): 30-min
    inactivity gap per user, rolled up to one row per session. The batch
    twin of the streaming session_window query (evt_session_window) —
    same gap semantics, lag-flag-cumsum formulation, one shuffle."""
    from ..operators.timeseries import sessionize

    ev = read_table(spark, sf_dir, "events")
    s = sessionize(
        ev, key="user_id", ts="ts", tiebreak="event_id",
        gap_seconds=SESSION_GAP_S,
    )
    return s.groupBy("user_id", "session_num").agg(
        F.date_format(F.min("ts"), TS_FMT).alias("session_start"),
        F.date_format(F.max("ts"), TS_FMT).alias("session_end"),
        (F.max("ts").cast("long") - F.min("ts").cast("long")).alias(
            "duration_s"
        ),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


ORACLE_SESSIONIZE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN cast(floor(epoch(ts)) AS bigint)
                   - lag(cast(floor(epoch(ts)) AS bigint)) OVER w > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts, value,
         cast(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1
              AS int) AS session_num
  FROM flagged
)
SELECT user_id, session_num,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       cast(floor(epoch(max(ts))) AS bigint)
         - cast(floor(epoch(min(ts))) AS bigint) AS duration_s,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM numbered GROUP BY user_id, session_num
"""


def _orders_rendered():
    """Portable string renderings of every orders column (doubles scaled
    to cents — float formatting is not engine-portable)."""
    return [
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
        F.date_format("o_orderdate", TS_FMT),
        F.col("o_orderpriority"),
    ]


# each rendering coalesced to the same NULL sentinel row_fingerprint
# applies (concat_ws skips NULLs, which would collide distinct rows)
_SQL_ORDERS_RENDERED = (
    "coalesce(CAST(o_orderkey AS VARCHAR), '<NULL>'),"
    " coalesce(CAST(o_custkey AS VARCHAR), '<NULL>'),"
    " coalesce(o_orderstatus, '<NULL>'),"
    " coalesce(CAST(CAST(round(o_totalprice * 100) AS bigint) AS VARCHAR), '<NULL>'),"
    " coalesce(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '<NULL>'),"
    " coalesce(o_orderpriority, '<NULL>')"
)


def q_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed anti-entropy fingerprint of orders
    (operators/integrity.py::table_fingerprint): 64 rows of
    (bucket, n_rows, xor-of-row-md5s) that two replicas compare to
    locate divergent key ranges without shipping data."""
    from ..operators.integrity import table_fingerprint

    o = read_table(spark, sf_dir, "orders")
    return table_fingerprint(o, F.col("o_orderkey"), _orders_rendered())


ORACLE_FINGERPRINT = f"""
WITH h AS (
  SELECT cast(cast(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
              AS bigint) % 64 AS int) AS bucket,
         cast(('0x' || substr(md5(concat_ws('|', {_SQL_ORDERS_RENDERED})),
              1, 15)) AS bigint) AS rh
  FROM orders
)
SELECT bucket, count(*) AS n_rows, bit_xor(rh) AS xor_hash
FROM h GROUP BY bucket
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (operators/integrity.py::snapshot_diff): classify
    added / removed / changed keys between two simulated versions of
    orders — v1 drops keys ≡0 (mod 7), v2 drops keys ≡0 (mod 5) and
    reprices keys ≡0 (mod 3). Output is change-volume-sized; unchanged
    rows never leave the join."""
    from ..operators.integrity import row_fingerprint, snapshot_diff

    o = read_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    v1 = o.filter(k % 7 != 0).withColumn(
        "__h", row_fingerprint(_orders_rendered())
    )
    v2_base = o.filter(k % 5 != 0).withColumn(
        "o_totalprice",
        F.when(k % 3 == 0, F.col("o_totalprice") * 2).otherwise(
            F.col("o_totalprice")
        ),
    )
    v2 = v2_base.withColumn("__h", row_fingerprint(_orders_rendered()))
    return snapshot_diff(v1, v2, "o_orderkey")


ORACLE_SNAPSHOT_DIFF = f"""
WITH v1 AS (
  SELECT o_orderkey AS k,
         cast(('0x' || substr(md5(concat_ws('|', {_SQL_ORDERS_RENDERED})),
              1, 15)) AS bigint) AS oh
  FROM orders WHERE o_orderkey % 7 != 0
),
v2src AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
              ELSE o_totalprice END AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 5 != 0
),
v2 AS (
  SELECT o_orderkey AS k,
         cast(('0x' || substr(md5(concat_ws('|', {_SQL_ORDERS_RENDERED})),
              1, 15)) AS bigint) AS nh
  FROM v2src
)
SELECT coalesce(v1.k, v2.k) AS o_orderkey,
       CASE WHEN oh IS NULL THEN 'added'
            WHEN nh IS NULL THEN 'removed'
            WHEN oh != nh THEN 'changed'
            ELSE 'unchanged' END AS change
FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
WHERE (CASE WHEN oh IS NULL THEN 'added'
            WHEN nh IS NULL THEN 'removed'
            WHEN oh != nh THEN 'changed'
            ELSE 'unchanged' END) != 'unchanged'
"""


EQUIDEPTH_TILES = 10


def q_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram of event values per event_type: ntile over a
    TOTAL per-group order (value, event_id) → per-tile lo/hi/count — the
    equal-mass complement of evt_value_histogram's equal-width bins, and
    the structure query optimizers keep as column statistics. Per-group
    window sort = one shuffle, same posture as window_rank."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    t = ev.withColumn("tile", F.ntile(EQUIDEPTH_TILES).over(w))
    return t.groupBy("event_type", "tile").agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )


ORACLE_EQUIDEPTH = f"""
WITH t AS (
  SELECT event_type, value,
         ntile({EQUIDEPTH_TILES}) OVER (
           PARTITION BY event_type ORDER BY value, event_id) AS tile
  FROM events
)
SELECT event_type, tile, min(value) AS lo, max(value) AS hi, count(*) AS n
FROM t GROUP BY event_type, tile
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch (approx_count_distinct, rsd 1%)
    of users per event_type, next to the exact count. Completes the
    mergeable-sketch family (GK quantiles, count-min, HLL): at 100 TB
    the exact count shuffles every distinct (type, user) pair once,
    while HLL ships a fixed ~1.5 KB register block per group per
    partition.

    Oracle contract: the verified output is the exact count (DuckDB
    twin computes it) plus a `within_3sigma` boolean derived FROM the
    sketch — the sketch stays load-bearing (a broken estimate flips the
    boolean → hash mismatch) while every emitted value is deterministic.
    rsd 0.01 → 3σ relative error bound 3 %."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        (
            F.abs(
                F.approx_count_distinct("user_id", 0.01)
                - F.count_distinct("user_id")
            )
            <= 0.03 * F.count_distinct("user_id")
        ).alias("within_3sigma"),
    )


ORACLE_APPROX_DISTINCT = """
SELECT event_type, count(DISTINCT user_id) AS exact_users,
       TRUE AS within_3sigma
FROM events GROUP BY event_type
"""


QUERIES.update(
    {
        "evt_sessionize": QuerySpec(
            q_sessionize,
            ORACLE_SESSIONIZE,
            "gap-based batch sessionization, lag-flag-cumsum, one shuffle",
        ),
        "table_fingerprint_orders": QuerySpec(
            q_table_fingerprint,
            ORACLE_FINGERPRINT,
            "bucketed XOR anti-entropy fingerprint (Merkle-style)",
        ),
        "snapshot_diff_orders": QuerySpec(
            q_snapshot_diff,
            ORACLE_SNAPSHOT_DIFF,
            "added/removed/changed between keyed snapshots, hash compare",
        ),
        "evt_equidepth_hist": QuerySpec(
            q_equidepth_hist,
            ORACLE_EQUIDEPTH,
            "equi-depth histogram per group (ntile, total order)",
        ),
        "evt_approx_distinct": QuerySpec(
            q_approx_distinct,
            ORACLE_APPROX_DISTINCT,
            "HLL distinct sketch: exact count + sketch-derived 3-sigma bound",
        ),
    }
)


def q_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert layout key over the same (l_quantity, l_extendedprice)
    dims as layout_zorder_key (operators/layout.py::hilbert_value) — the
    higher-locality clustering curve. The iterative bit-rotation fold is
    not SQL-expressible in one pass → rows-only here; exactness is pinned
    by the pure-Python xy2d parity test and the file-stats locality test
    (tests/test_scale_patterns.py)."""
    from ..operators.layout import hilbert_value

    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        hilbert_value(ZORDER_DIMS).alias("hval"),
    )


QUERIES["layout_hilbert_key"] = QuerySpec(
    q_hilbert_key,
    None,
    "Hilbert layout key (expression fold; Python-reference parity tested)",
)


def q_kneser_ney_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM self-scoring (textstats/lm.py
    — the KenLM/CCNet perplexity-filter smoothing, D=0.75): per doc the
    bigram count and the integer micro-nat sum of ln P_KN(w2|w1). The
    oracle rebuilds all four KN statistics (bigram counts, prefix
    totals, distinct continuations, distinct left contexts, type total)
    and evaluates the probability in the identical operation order, so
    a marginal-count or interpolation-order bug flips the hash."""
    from ..textstats.lm import add_kneser_ney_logprob

    d = read_table(spark, sf_dir, "documents")
    return add_kneser_ney_logprob(d, "text")


ORACLE_KNESER_NEY = rf"""
WITH t AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS w,
         unnest(generate_series(1, len({_SQL_TOKS}))) AS pos
  FROM documents WHERE {_SQL_NORM} != ''
),
bg AS (
  SELECT doc_id, w AS w1,
         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM t
),
b AS (SELECT doc_id, w1, w2, w1 || ' ' || w2 AS bigram FROM bg
      WHERE w2 IS NOT NULL),
bc AS (SELECT bigram, min(w1) AS w1, min(w2) AS w2, count(*) AS cb
       FROM b GROUP BY bigram),
fwd AS (SELECT w1, sum(cb) AS cp, count(*) AS n1f FROM bc GROUP BY w1),
rev AS (SELECT w2, count(*) AS n1r FROM bc GROUP BY w2),
tt AS (SELECT count(*) AS n_types FROM bc),
model AS (
  SELECT bc.bigram,
         CAST(round(ln(
           (greatest(bc.cb - 0.75, 0)
            + 0.75 * fwd.n1f * rev.n1r / (tt.n_types * 1.0)) / fwd.cp
         ) * 1e6) AS BIGINT) AS lp_micro
  FROM bc JOIN fwd USING (w1) JOIN rev USING (w2), tt
)
SELECT doc_id, count(*) AS n_bigrams,
       CAST(sum(lp_micro) AS BIGINT) AS lp_micro_sum
FROM b JOIN model USING (bigram)
GROUP BY doc_id
"""


QUERIES["doc_kneser_ney_logprob"] = QuerySpec(
    q_kneser_ney_logprob,
    ORACLE_KNESER_NEY,
    "interpolated Kneser-Ney bigram LM, micro-nat exact per-doc scoring",
)


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet perplexity bucketing (textstats/lm.py::
    ccnet_perplexity_buckets): per language, docs ranked by KN-bigram
    perplexity (integer micro-nats per bigram) and split into
    head/middle/tail by the exact per-language 1/3 and 2/3 percentile
    cut points (computed as a tiny aggregate and broadcast back — no
    corpus-sized window; CCNet's own two-pass cut-then-apply shape).
    The oracle rebuilds the full LM + the floor(-lp/n) score + the
    same quantile_cont thresholds, so a smoothing, scoring, or
    cut-point bug flips the hash."""
    from ..textstats.lm import ccnet_perplexity_buckets

    d = read_table(spark, sf_dir, "documents")
    return ccnet_perplexity_buckets(d, "text")


ORACLE_CCNET_BUCKETS = rf"""
WITH t AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS w,
         unnest(generate_series(1, len({_SQL_TOKS}))) AS pos
  FROM documents WHERE {_SQL_NORM} != ''
),
bg AS (
  SELECT doc_id, w AS w1,
         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM t
),
b AS (SELECT doc_id, w1, w2, w1 || ' ' || w2 AS bigram FROM bg
      WHERE w2 IS NOT NULL),
bc AS (SELECT bigram, min(w1) AS w1, min(w2) AS w2, count(*) AS cb
       FROM b GROUP BY bigram),
fwd AS (SELECT w1, sum(cb) AS cp, count(*) AS n1f FROM bc GROUP BY w1),
rev AS (SELECT w2, count(*) AS n1r FROM bc GROUP BY w2),
tt AS (SELECT count(*) AS n_types FROM bc),
model AS (
  SELECT bc.bigram,
         CAST(round(ln(
           (greatest(bc.cb - 0.75, 0)
            + 0.75 * fwd.n1f * rev.n1r / (tt.n_types * 1.0)) / fwd.cp
         ) * 1e6) AS BIGINT) AS lp_micro
  FROM bc JOIN fwd USING (w1) JOIN rev USING (w2), tt
),
scored AS (
  SELECT doc_id, count(*) AS n_bigrams,
         CAST(sum(lp_micro) AS BIGINT) AS lp_micro_sum
  FROM b JOIN model USING (bigram)
  GROUP BY doc_id
),
withppl AS (
  SELECT d.lang,
         CAST(floor(-s.lp_micro_sum / s.n_bigrams) AS BIGINT) AS ppl_micro,
         length(d.text) AS n_chars_txt
  FROM scored s JOIN documents d USING (doc_id)
),
cuts AS (
  SELECT lang,
         round(quantile_cont(CAST(ppl_micro AS DOUBLE), 1.0/3.0), 6) AS c1,
         round(quantile_cont(CAST(ppl_micro AS DOUBLE), 2.0/3.0), 6) AS c2
  FROM withppl GROUP BY lang
),
bucketed AS (
  SELECT w.lang,
         CASE WHEN CAST(w.ppl_micro AS DOUBLE) <= c.c1 THEN 'head'
              WHEN CAST(w.ppl_micro AS DOUBLE) <= c.c2 THEN 'middle'
              ELSE 'tail' END AS bucket,
         w.ppl_micro, w.n_chars_txt
  FROM withppl w JOIN cuts c USING (lang)
)
SELECT lang, bucket, count(*) AS n_docs,
       min(ppl_micro) AS ppl_lo,
       max(ppl_micro) AS ppl_hi,
       CAST(sum(n_chars_txt) AS BIGINT) AS chars
FROM bucketed
GROUP BY lang, bucket
"""


QUERIES["doc_ccnet_buckets"] = QuerySpec(
    q_ccnet_buckets,
    ORACLE_CCNET_BUCKETS,
    "CCNet head/middle/tail perplexity bucketing per language (KN LM)",
)


DOMAIN_CAP = 10


# deterministic pseudo-URL (the corpus has no url column): host =
# lang.sourceN-site.com, path = /docs/<id> — identical expression in
# the oracle, so host/domain extraction is fully cross-checked
def _with_url(d: DataFrame) -> DataFrame:
    return d.withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            F.col("lang"),
            F.lit("."),
            F.col("source"),
            F.lit("-site.com/docs/"),
            F.col("doc_id").cast("string"),
        ),
    )


_SQL_HOST = "lower(lang || '.' || source || '-site.com')"


def q_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document caps (textstats/domains.py::domain_caps —
    RefinedWeb/Dolma's pre-dedup URL filter) over a deterministic
    pseudo-URL: parse_url HOST → registrable domain → hash-rate keep
    (md5(salt‖id) mod n < cap; no per-domain window, see module
    docstring). → per-domain ledger (domain, n_docs, n_kept,
    chars_kept). The oracle replays host parsing, the registrable
    extraction regex, and the exact md5-mod keep set, so a hashing or
    cap-arithmetic bug flips the hash."""
    from ..textstats.domains import domain_caps

    d = _with_url(read_table(spark, sf_dir, "documents"))
    out = domain_caps(d, "url", "doc_id", cap=DOMAIN_CAP)
    return out.groupBy("domain").agg(
        F.max("n_domain_docs").alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.coalesce(F.sum(F.when(F.col("keep"), F.col("n_chars"))), F.lit(0))
        .cast("bigint")
        .alias("chars_kept"),
    )


ORACLE_DOMAIN_CAPS = rf"""
WITH dom AS (
  SELECT doc_id, n_chars,
         regexp_extract({_SQL_HOST}, '([^.]+\.[^.]+)$', 1) AS domain
  FROM documents
),
counts AS (SELECT domain, count(*) AS n FROM dom GROUP BY domain),
flagged AS (
  SELECT dom.domain, dom.n_chars, counts.n,
         (cast(('0x' || substr(md5(concat('domcap1',
              CAST(doc_id AS VARCHAR))), 1, 15)) AS bigint)
          % counts.n) < {DOMAIN_CAP} AS keep
  FROM dom JOIN counts USING (domain)
)
SELECT domain, CAST(max(n) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(COALESCE(sum(CASE WHEN keep THEN n_chars END), 0) AS BIGINT)
         AS chars_kept
FROM flagged GROUP BY domain
"""


QUERIES["doc_domain_caps"] = QuerySpec(
    q_domain_caps,
    ORACLE_DOMAIN_CAPS,
    "per-domain doc caps: parse_url host + hash-rate keep, no window",
)


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-level URL dedup (textstats/domains.py::url_dedup — the
    first dedup of every web pipeline, before any content pass): a
    deterministic messy URL (shared path key doc_id % 7, plus
    query-string / fragment / trailing-slash noise keyed off the id)
    is canonicalized to lower(host) + path-sans-noise, then one doc
    per canonical key survives (min doc_id). The oracle replays the
    URL synthesis, both canonicalization regexes, and the keep rule
    exactly — a canonicalization or tie-break bug flips the hash."""
    from ..textstats.domains import url_dedup

    d = read_table(spark, sf_dir, "documents").withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit("-site.com/page/"),
            (F.col("doc_id") % 7).cast("string"),
            F.when(F.col("doc_id") % 4 == 2, F.lit("/")).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 2 == 1, F.lit("?ref=feed")).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 3 == 1, F.lit("#frag")).otherwise(
                F.lit("")
            ),
        ),
    )
    return url_dedup(d, "url", "doc_id").select(
        "doc_id", "canon_url", "n_url_dups", "keep"
    )


ORACLE_URL_DEDUP = r"""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '-site.com/page/'
           || CAST(doc_id % 7 AS VARCHAR)
           || (CASE WHEN doc_id % 4 = 2 THEN '/' ELSE '' END)
           || (CASE WHEN doc_id % 2 = 1 THEN '?ref=feed' ELSE '' END)
           || (CASE WHEN doc_id % 3 = 1 THEN '#frag' ELSE '' END) AS url
  FROM documents
),
canon AS (
  SELECT doc_id,
         lower(regexp_extract(url, '^[a-zA-Z]+://([^/?#]+)', 1))
           || regexp_replace(
                regexp_extract(url, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1),
                '/+$', '') AS canon_url
  FROM u
),
per AS (
  SELECT canon_url, count(*) AS n_url_dups, min(doc_id) AS keep_id
  FROM canon GROUP BY canon_url
)
SELECT c.doc_id, c.canon_url, per.n_url_dups,
       c.doc_id = per.keep_id AS keep
FROM canon c JOIN per USING (canon_url)
"""


QUERIES["doc_url_dedup"] = QuerySpec(
    q_url_dedup,
    ORACLE_URL_DEDUP,
    "canonical-URL crawl dedup: strip query/fragment/slash, min-id keep",
)


TOKEN_BUDGET = 100_000


def q_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sampling plan (operators/sampling.py::
    token_budget_plan): per-source sqrt-flattened allocation of a
    100k-token budget, milli-epoch repetition factors, and the
    Muennighoff >4-epoch data-constrained flag. Integer-exact: sqrt
    (IEEE-correctly-rounded both engines) quantized to micro-units
    before the order-free bigint total; the oracle replays every
    floor in the identical order."""
    from ..operators.sampling import token_budget_plan

    d = read_table(spark, sf_dir, "documents")
    return token_budget_plan(d, "text", "source", TOKEN_BUDGET)


ORACLE_TOKEN_BUDGET = rf"""
WITH per AS (
  SELECT source,
         CAST(sum(CASE WHEN {_SQL_NORM} = '' THEN 0
                       ELSE len({_SQL_TOKS}) END) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
q AS (
  SELECT source, n_tokens,
         CAST(floor(sqrt(n_tokens) * 1e6) AS BIGINT) AS r_micro
  FROM per
),
tot AS (SELECT sum(r_micro) AS t FROM q),
alloc AS (
  SELECT source, n_tokens, r_micro,
         CAST(floor(r_micro * ({TOKEN_BUDGET}.0 / t)) AS BIGINT)
           AS alloc_tokens
  FROM q, tot
)
SELECT source, n_tokens, r_micro, alloc_tokens,
       CAST(floor(alloc_tokens * 1000 / n_tokens) AS BIGINT)
         AS epochs_milli,
       floor(alloc_tokens * 1000 / n_tokens) > 4000 AS over_epoch_limit
FROM alloc
"""


QUERIES["doc_token_budget_plan"] = QuerySpec(
    q_token_budget_plan,
    ORACLE_TOKEN_BUDGET,
    "token-budget sampling plan: sqrt-flattened alloc + epoch flags",
)


def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix accounting (textstats/domains.py::domain_mix): the
    corpus-composition ledger per registrable domain — doc count, char
    mass, and integer ppm share of the corpus (identical double math
    both engines, floored to bigint)."""
    from ..textstats.domains import domain_mix

    d = _with_url(read_table(spark, sf_dir, "documents"))
    return domain_mix(d, "url", "n_chars")


ORACLE_DOMAIN_MIX = rf"""
WITH dom AS (
  SELECT n_chars,
         regexp_extract({_SQL_HOST}, '([^.]+\.[^.]+)$', 1) AS domain
  FROM documents
),
per AS (
  SELECT domain, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS mass
  FROM dom GROUP BY domain
),
tot AS (SELECT sum(mass) AS t FROM per)
SELECT domain, n_docs, mass,
       CAST(floor(CAST(mass AS DOUBLE) * 1e6 / CAST(t AS DOUBLE)) AS BIGINT)
         AS share_ppm
FROM per, tot
"""


QUERIES["doc_domain_mix"] = QuerySpec(
    q_domain_mix,
    ORACLE_DOMAIN_MIX,
    "per-domain corpus composition ledger with integer ppm shares",
)


def q_kn_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out Kneser-Ney scoring (textstats/lm.py::
    score_kneser_ney_heldout): train the KN bigram LM on the even
    doc_ids, score the odd ones — the actual CCNet deployment shape
    (train on trusted text, score the crawl; cb=0 for unseen bigrams,
    full continuation backoff for unseen contexts, explicit n_oov for
    unscorable pairs). The oracle replays the split, the model build,
    and the three-tier probability CASE with identical integer
    quantization, so a backoff-path or oov-accounting bug flips the
    hash."""
    from ..textstats.lm import score_kneser_ney_heldout

    d = read_table(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 2 == 0)
    score = d.filter(F.col("doc_id") % 2 == 1)
    return score_kneser_ney_heldout(train, score, "text")


ORACLE_KN_HELDOUT = rf"""
WITH tt0 AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS w,
         unnest(generate_series(1, len({_SQL_TOKS}))) AS pos
  FROM documents WHERE {_SQL_NORM} != '' AND doc_id % 2 = 0
),
tbg AS (
  SELECT doc_id, w AS w1,
         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tt0
),
tb AS (SELECT w1, w2, w1 || ' ' || w2 AS bigram FROM tbg
       WHERE w2 IS NOT NULL),
bc AS (SELECT bigram, min(w1) AS w1, min(w2) AS w2, count(*) AS cb
       FROM tb GROUP BY bigram),
fwd AS (SELECT w1, sum(cb) AS cp, count(*) AS n1f FROM bc GROUP BY w1),
rev AS (SELECT w2, count(*) AS n1r FROM bc GROUP BY w2),
tt AS (SELECT count(*) AS n_types FROM bc),
st0 AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS w,
         unnest(generate_series(1, len({_SQL_TOKS}))) AS pos
  FROM documents WHERE {_SQL_NORM} != '' AND doc_id % 2 = 1
),
sbg AS (
  SELECT doc_id, w AS w1,
         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM st0
),
sb AS (SELECT doc_id, w1, w2, w1 || ' ' || w2 AS bigram FROM sbg
       WHERE w2 IS NOT NULL),
j AS (
  SELECT sb.doc_id,
         CASE WHEN rev.n1r IS NOT NULL THEN
           CAST(round(ln(
             CASE WHEN fwd.cp IS NOT NULL THEN
               (greatest(COALESCE(bc.cb, 0) - 0.75, 0)
                + 0.75 * fwd.n1f * rev.n1r / (tt.n_types * 1.0)) / fwd.cp
             ELSE rev.n1r / (tt.n_types * 1.0) END
           ) * 1e6) AS BIGINT)
         END AS lp_micro
  FROM sb
  LEFT JOIN bc ON sb.bigram = bc.bigram
  LEFT JOIN fwd ON sb.w1 = fwd.w1
  LEFT JOIN rev ON sb.w2 = rev.w2, tt
)
SELECT doc_id, count(*) AS n_bigrams,
       CAST(sum(CASE WHEN lp_micro IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       CAST(COALESCE(sum(lp_micro), 0) AS BIGINT) AS lp_micro_sum
FROM j GROUP BY doc_id
"""


QUERIES["doc_kn_heldout"] = QuerySpec(
    q_kn_heldout,
    ORACLE_KN_HELDOUT,
    "held-out KN scoring: train on even ids, score odd (CCNet deploy shape)",
)


def q_ccnet_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete CCNet deployment (textstats/lm.py::
    ccnet_heldout_buckets): KN LM trained on the even ids, odd ids
    scored HELD-OUT (three-tier backoff + n_oov), per-language
    head/middle/tail split by broadcast percentile cut points over the
    held-out perplexities. The oracle replays the split, the model,
    the tiered scoring, the n_scored>=1 quarantine, and the
    quantile_cont thresholds."""
    from ..textstats.lm import ccnet_heldout_buckets

    d = read_table(spark, sf_dir, "documents")
    return ccnet_heldout_buckets(
        d.filter(F.col("doc_id") % 2 == 0),
        d.filter(F.col("doc_id") % 2 == 1),
        "text",
    )


# reuse ORACLE_KN_HELDOUT's CTE chain up to `j`, then score + bucket
_KN_HELDOUT_BODY = ORACLE_KN_HELDOUT.split("SELECT doc_id, count(*)")[0]

ORACLE_CCNET_HELDOUT = rf"""{_KN_HELDOUT_BODY.rstrip()},
scored AS (
  SELECT doc_id, count(*) AS n_bigrams,
         CAST(sum(CASE WHEN lp_micro IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov,
         CAST(COALESCE(sum(lp_micro), 0) AS BIGINT) AS lp_micro_sum
  FROM j GROUP BY doc_id
),
withppl AS (
  SELECT d.lang,
         CAST(floor(-s.lp_micro_sum / (s.n_bigrams - s.n_oov)) AS BIGINT)
           AS ppl_micro
  FROM scored s JOIN documents d USING (doc_id)
  WHERE s.n_bigrams - s.n_oov >= 1
),
cuts AS (
  SELECT lang,
         round(quantile_cont(CAST(ppl_micro AS DOUBLE), 1.0/3.0), 6) AS c1,
         round(quantile_cont(CAST(ppl_micro AS DOUBLE), 2.0/3.0), 6) AS c2
  FROM withppl GROUP BY lang
),
bucketed AS (
  SELECT w.lang,
         CASE WHEN CAST(w.ppl_micro AS DOUBLE) <= c.c1 THEN 'head'
              WHEN CAST(w.ppl_micro AS DOUBLE) <= c.c2 THEN 'middle'
              ELSE 'tail' END AS bucket,
         w.ppl_micro
  FROM withppl w JOIN cuts c USING (lang)
)
SELECT lang, bucket, count(*) AS n_docs,
       min(ppl_micro) AS ppl_lo,
       max(ppl_micro) AS ppl_hi
FROM bucketed GROUP BY lang, bucket
"""


QUERIES["doc_ccnet_heldout"] = QuerySpec(
    q_ccnet_heldout,
    ORACLE_CCNET_HELDOUT,
    "end-to-end CCNet: held-out KN scoring + broadcast percentile buckets",
)


def q_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi domain-mixture reweighting end-to-end (operators/
    sampling.py::doremi_reweight): per-source difficulty = mean
    negative unigram log-prob (micro-nats/token, integer floor-div),
    then 5 exponentiated-gradient rounds against the moving weighted-
    average baseline + uniform smoothing. The oracle replays the
    unigram model, the loss, and all 5 rounds in unrolled CTEs with
    the identical integer quantization, so a baseline, clip, exp-
    quantize, or normalize bug flips the hash."""
    from ..functions.text import tokenize
    from ..operators.sampling import doremi_reweight

    from pyspark.storagelevel import StorageLevel

    d = read_table(spark, sf_dir, "documents")
    # persisted: both the vocab count and the loss join consume it
    # (the lm.py two-consumer convention)
    tok = d.select("source", F.explode(tokenize("text")).alias("w")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    uc = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    tt = uc.agg(F.sum("cnt").alias("T"))
    model = uc.crossJoin(F.broadcast(tt)).select(
        "w",
        F.round(F.log(F.col("cnt") / (F.col("T") * F.lit(1.0))) * 1e6)
        .cast("bigint")
        .alias("lp"),
    )
    s = F.col("s")
    n = F.col("n_tokens")
    dl = (
        tok.join(model, "w")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (-F.sum("lp")).cast("bigint").alias("s"),
        )
        .select(
            "source",
            "n_tokens",
            ((s - F.pmod(s, n)) / n).cast("bigint").alias("loss_micro"),
        )
        # |sources| rows; materialized once so the reweight rounds and
        # the final n_tokens join don't each re-derive the corpus pass
        .localCheckpoint()
    )
    out = doremi_reweight(dl, "source", "loss_micro", iters=5)
    return out.select(
        F.col("domain").alias("source"), "loss_micro", "w_micro"
    ).join(dl.select("source", "n_tokens"), "source")


def _doremi_oracle() -> str:
    from .llm import _sql_fdiv

    # Each round is ONE nested select with window totals (sum() OVER ())
    # instead of scalar CTEs: DuckDB inlines non-materialized CTEs, and a
    # chain whose every round references the previous one from multiple
    # scalar CTEs re-expands the corpus subtree exponentially (the same
    # lineage blowup the Spark side cuts with localCheckpoint). The
    # window form keeps the chain linear. raw appears twice textually —
    # both row-level, same value.
    g = "CAST(round(exp(0.5 * (ex / 1000000.0)) * 1000000) AS BIGINT)"
    rounds = []
    prev = "w0"
    for t in range(1, 6):
        rounds.append(rf"""
w{t} AS (
  SELECT domain, loss, {_sql_fdiv('raw', _sql_fdiv('z', '1000000'))} AS w
  FROM (
    SELECT domain, loss, w * {g} AS raw,
           sum(w * {g}) OVER () AS z
    FROM (
      SELECT domain, loss, w,
             least(greatest(loss - {_sql_fdiv('s', '1000000')}, -2000000),
                   2000000) AS ex
      FROM (SELECT domain, loss, w, sum(w * loss) OVER () AS s FROM {prev})
    )
  )
)""")
        prev = f"w{t}"
    return rf"""
WITH tok AS (
  SELECT source, unnest({_SQL_TOKS}) AS w
  FROM documents WHERE {_SQL_NORM} != ''
),
uc AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
tt AS (SELECT sum(cnt) AS T FROM uc),
model AS (
  SELECT w, CAST(round(ln(cnt / (T * 1.0)) * 1e6) AS BIGINT) AS lp
  FROM uc, tt
),
dl AS (
  SELECT source AS domain, count(*) AS n_tokens,
         CAST({_sql_fdiv('-sum(lp)', 'count(*)')} AS BIGINT) AS loss
  FROM tok JOIN model USING (w) GROUP BY source
),
kk AS (SELECT count(*) AS k FROM dl),
w0 AS (SELECT domain, loss, CAST(1000000 // k AS BIGINT) AS w FROM dl, kk),
{','.join(rounds)}
SELECT d.domain AS source, d.loss AS loss_micro,
       CAST({_sql_fdiv('900000 * w', '1000000')} + (100000 // k) AS BIGINT)
         AS w_micro,
       d.n_tokens
FROM {prev} JOIN dl d USING (domain), kk
"""


QUERIES["doc_doremi_weights"] = QuerySpec(
    q_doremi_weights,
    _doremi_oracle(),
    "DoReMi exponentiated-gradient domain mixture weights, micro-int exact",
)
