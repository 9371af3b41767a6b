"""Changefeed queries: CDC apply (changelog → current state) and SCD2
(changelog → validity-interval history), exercised over a deterministic
changelog derived from lineitem — each (l_orderkey, l_linenumber) row is
read as one change to the order's state, l_linenumber is the per-key
sequence, and a returnflag of 'R' on the last change marks a delete.

Both have exact ANSI-SQL oracles (window formulations); the Spark side of
cdc_apply deliberately uses the aggregate (max_by) formulation instead —
the point of the operator is that the partial-aggregated shuffle beats
the window sort at scale while computing the same relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import cdc_apply, scd2_history
from ..sources.batch import read_table
from . import QuerySpec


def _changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic changelog: key=l_orderkey, seq=l_linenumber,
    op = 'D' where l_returnflag='R' else 'U', payload = quantity/price.

    The synthetic lineitem repeats (l_orderkey, l_linenumber), so the feed
    is collapsed to one change per (key, seq) by lexicographic max over
    (op, qty, price) — a CDC feed must carry a total order per key
    (cdc_apply's contract), and the collapse is the same in the oracle."""
    li = read_table(spark, sf_dir, "lineitem")
    raw = li.select(
        F.col("l_orderkey").alias("key"),
        F.col("l_linenumber").cast("int").alias("seq"),
        F.when(F.col("l_returnflag") == "R", "D").otherwise("U").alias("op"),
        F.col("l_quantity").alias("qty"),
        F.round("l_extendedprice", 2).alias("price"),
    )
    return (
        raw.groupBy("key", "seq")
        .agg(F.max(F.struct("op", "qty", "price")).alias("m"))
        .select("key", "seq", "m.op", "m.qty", "m.price")
    )


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → current state, then a small audit aggregate so the
    result is stable: surviving-key count + sums per final op batch."""
    cur = cdc_apply(
        _changes(spark, sf_dir), ["key"], "seq", "op", ["qty", "price"]
    )
    return cur.groupBy("seq").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.round(F.sum("qty"), 2).alias("sum_qty"),
        F.round(F.sum("price"), 2).alias("sum_price"),
    )


ORACLE_CDC_APPLY = """
WITH raw AS (
  SELECT l_orderkey AS key,
         CAST(l_linenumber AS INTEGER) AS seq,
         CASE WHEN l_returnflag = 'R' THEN 'D' ELSE 'U' END AS op,
         l_quantity AS qty,
         ROUND(l_extendedprice, 2) AS price
  FROM lineitem
), changes AS (
  SELECT key, seq, op, qty, price FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY key, seq ORDER BY op DESC, qty DESC, price DESC) AS dn
    FROM raw) WHERE dn = 1
), latest AS (
  SELECT key, seq, op, qty, price,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
  FROM changes
)
SELECT seq,
       COUNT(*) AS n_keys,
       ROUND(SUM(qty), 2) AS sum_qty,
       ROUND(SUM(price), 2) AS sum_price
FROM latest
WHERE rn = 1 AND op <> 'D'
GROUP BY seq
"""


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → SCD2 validity intervals on l_shipdate, summarized per
    version ordinal: row counts, open-version count, avg validity days."""
    li = read_table(spark, sf_dir, "lineitem")
    changes = li.select(
        F.col("l_orderkey").alias("key"),
        # NTZ → session-TZ timestamp (UTC ⇒ same instant) so the validity
        # arithmetic below can use epoch seconds.
        F.col("l_shipdate").cast("timestamp").alias("changed_at"),
        F.col("l_quantity").alias("qty"),
    ).groupBy("key", "changed_at").agg(F.round(F.sum("qty"), 2).alias("qty"))
    hist = scd2_history(changes, ["key"], "changed_at", ["qty"])
    return hist.groupBy("is_current").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.round(F.sum("qty"), 2).alias("sum_qty"),
        F.round(
            F.avg(
                F.when(
                    F.col("valid_to").isNotNull(),
                    F.col("valid_to").cast("long") - F.col("valid_from").cast("long"),
                )
            ),
            2,
        ).alias("avg_validity_sec"),
    )


ORACLE_SCD2_HISTORY = """
WITH changes AS (
  SELECT l_orderkey AS key,
         l_shipdate AS changed_at,
         ROUND(SUM(l_quantity), 2) AS qty
  FROM lineitem
  GROUP BY l_orderkey, l_shipdate
), hist AS (
  SELECT key, qty,
         changed_at AS valid_from,
         LEAD(changed_at) OVER (PARTITION BY key ORDER BY changed_at) AS valid_to
  FROM changes
)
SELECT (valid_to IS NULL) AS is_current,
       COUNT(*) AS n_versions,
       ROUND(SUM(qty), 2) AS sum_qty,
       ROUND(AVG(CASE WHEN valid_to IS NOT NULL
                      THEN epoch(valid_to) - epoch(valid_from) END), 2)
         AS avg_validity_sec
FROM hist
GROUP BY 1
"""


QUERIES = {
    "cdc_apply_latest": QuerySpec(
        q_cdc_apply,
        ORACLE_CDC_APPLY,
        "CDC apply: changelog → current state via partial-agg max_by "
        "(vs the oracle's window formulation)",
    ),
    "scd2_history": QuerySpec(
        q_scd2_history,
        ORACLE_SCD2_HISTORY,
        "SCD type-2: changelog → validity intervals (lead window)",
    ),
}


def q_scd2_pit_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) lookup against the SCD2 history — the
    temporal-join half of SCD2 that q_scd2_history builds: each order
    probes the quantity version valid at (o_orderdate + 90 days):
    valid_from <= probe < valid_to (open version = NULL valid_to).
    The join is a plain equi hash join on the key; the validity
    predicate is a post-join filter Catalyst keeps beside it — per-key
    version chains are short, so the non-equi residual is cheap (the
    degenerate hot-key case is the range-join bucketing in
    operators/range_join.py). Aggregated per o_orderstatus."""
    li = read_table(spark, sf_dir, "lineitem")
    changes = li.select(
        F.col("l_orderkey").alias("key"),
        F.col("l_shipdate").cast("timestamp").alias("changed_at"),
        F.col("l_quantity").alias("qty"),
    ).groupBy("key", "changed_at").agg(F.round(F.sum("qty"), 2).alias("qty"))
    hist = scd2_history(changes, ["key"], "changed_at", ["qty"])
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        "o_orderstatus",
        (F.col("o_orderdate").cast("timestamp") + F.expr("INTERVAL 90 DAYS")).alias(
            "probe"
        ),
    )
    j = orders.join(hist, "key").filter(
        (F.col("valid_from") <= F.col("probe"))
        & (F.col("valid_to").isNull() | (F.col("probe") < F.col("valid_to")))
    )
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_lookups"),
        F.round(F.sum("qty"), 2).alias("sum_qty"),
        F.sum(F.col("is_current").cast("int")).alias("n_open_versions"),
    )


ORACLE_SCD2_PIT = """
WITH changes AS (
  SELECT l_orderkey AS key, l_shipdate AS changed_at,
         round(sum(l_quantity), 2) AS qty
  FROM lineitem GROUP BY 1, 2
),
hist AS (
  SELECT key, qty, changed_at AS valid_from,
         lead(changed_at) OVER (PARTITION BY key ORDER BY changed_at)
           AS valid_to
  FROM changes
),
probes AS (
  SELECT o_orderkey AS key, o_orderstatus,
         o_orderdate + INTERVAL 90 DAY AS probe
  FROM orders
)
SELECT o_orderstatus,
       count(*) AS n_lookups,
       round(sum(qty), 2) AS sum_qty,
       cast(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_open_versions
FROM probes JOIN hist USING (key)
WHERE valid_from <= probe AND (valid_to IS NULL OR probe < valid_to)
GROUP BY 1
"""


QUERIES["scd2_pit_lookup"] = QuerySpec(
    q_scd2_pit_lookup,
    ORACLE_SCD2_PIT,
    "SCD2 point-in-time temporal lookup (equi join + validity residual)",
)
