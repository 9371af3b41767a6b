"""Behavioral / association analytics: Markov event transitions,
market-basket association (support + lift), and deterministic-split
Welch A/B testing.

The reference's analytics stop at KPI counts (Consumer.scala:127-149);
these are the next-layer behavioral queries a product-analytics engine
over the same event feed serves. All three are oracle-checked against
DuckDB.

Scale notes (100 TB posture):
- Transitions: ONE window sort per user partition; the transition
  matrix aggregate is |types|^2 rows, so the probability window runs on
  a trivially small table.
- Basket lift: per-basket brand sets are built with one hash aggregate,
  pairs are generated IN-ROW from the sorted set (triangle-count
  convention, operators/graph.py:155) — no basket self-join, so a hot
  order cannot go quadratic across the wire; the pair fan-out is
  C(brands_per_order, 2), bounded by the basket width cap.
- A/B test: pure partial-aggregable conditional stats (count/avg/var
  over when()), one shuffle of 6 doubles per event_type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import md5_64
from ..sources.batch import read_table
from . import QuerySpec


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user next-event Markov transition matrix: P(next | current)
    over event-time order (event_id tie-break makes the order total).
    One window sort keyed by user; the conditional-probability window
    runs over the |types|^2-row aggregate, not the events."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    trans = steps.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("cnt"))
    wt = Window.partitionBy("cur")
    return trans.select(
        "cur",
        "nxt",
        "cnt",
        F.round(F.col("cnt") / F.sum("cnt").over(wt), 6).alias("p"),
    )


ORACLE_MARKOV = """
WITH s AS (
  SELECT event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
t AS (SELECT cur, nxt, count(*) AS cnt FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2)
SELECT cur, nxt, cnt,
       round(cnt * 1.0 / sum(cnt) OVER (PARTITION BY cur), 6) AS p
FROM t
"""


MIN_PAIR_ORDERS = 5
MAX_BASKET_BRANDS = 64


def q_basket_brand_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association over orders: for each unordered pair of
    part brands co-occurring in an order, support = P(both in basket)
    and lift = P(a,b) / (P(a) P(b)), min-support filtered.

    Spark shape: part is broadcast onto lineitem; baskets are one hash
    aggregate to a sorted distinct-brand array; pairs are expanded
    IN-ROW (i < j over the sorted array) so there is no basket
    self-join — a hot basket costs C(w, 2) narrow rows, not a shuffled
    join key with w^2 remote matches. `MAX_BASKET_BRANDS` caps w (a
    pathological mega-basket degrades to quadratic work in exactly one
    row; the cap turns that into a loud skip). Brand and pair supports
    are tiny aggregates; the scalar basket total rides in via a
    broadcast 1-row cross join, keeping the whole plan collect-free."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    ).select("l_orderkey", "p_brand")
    # baskets feed the width guard, pair expansion, brand supports, and
    # the scalar total — persist so the lineitem join+aggregate runs once
    baskets = ob.groupBy("l_orderkey").agg(
        F.sort_array(F.array_distinct(F.collect_list("p_brand"))).alias("brands")
    ).persist()
    wide = baskets.filter(F.size("brands") > MAX_BASKET_BRANDS).limit(1).count()
    if wide:
        raise ValueError(
            f"basket wider than MAX_BASKET_BRANDS={MAX_BASKET_BRANDS}; "
            "in-row pair expansion would be quadratic — raise the cap "
            "knowingly or pre-trim baskets"
        )
    pair = F.explode(
        F.expr(
            "flatten(transform(sequence(0, size(brands)-2), i -> "
            "transform(slice(brands, i+2, size(brands)-i-1), x -> "
            "struct(brands[i] AS brand_a, x AS brand_b))))"
        )
    ).alias("pr")
    pc = (
        baskets.filter(F.size("brands") >= 2)
        .select(pair)
        .select("pr.brand_a", "pr.brand_b")
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("pair_orders"))
    )
    bc = (
        baskets.select(F.explode("brands").alias("brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    ca = bc.select(F.col("brand").alias("brand_a"), F.col("c").alias("c_a"))
    cb = bc.select(F.col("brand").alias("brand_b"), F.col("c").alias("c_b"))
    return (
        pc.filter(F.col("pair_orders") >= MIN_PAIR_ORDERS)
        .join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(total))
        .select(
            "brand_a",
            "brand_b",
            "pair_orders",
            F.round(F.col("pair_orders") / F.col("n_orders"), 6).alias("support"),
            F.round(
                F.col("pair_orders") * F.col("n_orders")
                / (F.col("c_a") * F.col("c_b")),
                6,
            ).alias("lift"),
        )
    )


ORACLE_BASKET_LIFT = f"""
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM ob),
pc AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS pair_orders
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
),
bc AS (SELECT p_brand, count(*) AS c FROM ob GROUP BY 1)
SELECT brand_a, brand_b, pair_orders,
       round(pair_orders * 1.0 / n_orders, 6) AS support,
       round(pair_orders * 1.0 * n_orders / (ca.c * cb.c), 6) AS lift
FROM pc
CROSS JOIN n
JOIN bc ca ON pc.brand_a = ca.p_brand
JOIN bc cb ON pc.brand_b = cb.p_brand
WHERE pair_orders >= {MIN_PAIR_ORDERS}
"""


AB_SALT = "ab-v1:"


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Welch z-test per event_type: users are split into
    variants A/B by deterministic hash (md5_64 parity — the engine-wide
    cross-engine-stable convention, functions/text.py:81), and the mean
    `value` difference is scored as z = (mA - mB) / sqrt(sA^2/nA +
    sB^2/nB). Everything is a partial-aggregable conditional stat — one
    shuffle of six doubles per event_type, no second pass."""
    ev = read_table(spark, sf_dir, "events")
    variant = md5_64(
        F.concat(F.lit(AB_SALT), F.col("user_id").cast("string"))
    ) % 2
    tagged = ev.select("event_type", "value", variant.alias("v"))
    in_a, in_b = F.col("v") == 0, F.col("v") == 1
    agg = tagged.groupBy("event_type").agg(
        F.count(F.when(in_a, 1)).alias("n_a"),
        F.count(F.when(in_b, 1)).alias("n_b"),
        F.avg(F.when(in_a, F.col("value"))).alias("m_a"),
        F.avg(F.when(in_b, F.col("value"))).alias("m_b"),
        F.var_samp(F.when(in_a, F.col("value"))).alias("v_a"),
        F.var_samp(F.when(in_b, F.col("value"))).alias("v_b"),
    )
    se = F.sqrt(F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b"))
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        F.round("m_a", 6).alias("mean_a"),
        F.round("m_b", 6).alias("mean_b"),
        F.round((F.col("m_a") - F.col("m_b")) / se, 6).alias("welch_z"),
    )


ORACLE_AB_TEST = f"""
WITH t AS (
  SELECT event_type, value,
         cast(('0x' || substr(md5('{AB_SALT}' || cast(user_id AS varchar)), 1, 15))
              AS bigint) % 2 AS v
  FROM events
),
agg AS (
  SELECT event_type,
         count(*) FILTER (WHERE v = 0) AS n_a,
         count(*) FILTER (WHERE v = 1) AS n_b,
         avg(value) FILTER (WHERE v = 0) AS m_a,
         avg(value) FILTER (WHERE v = 1) AS m_b,
         var_samp(value) FILTER (WHERE v = 0) AS v_a,
         var_samp(value) FILTER (WHERE v = 1) AS v_b
  FROM t GROUP BY event_type
)
SELECT event_type, n_a, n_b,
       round(m_a, 6) AS mean_a,
       round(m_b, 6) AS mean_b,
       round((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b), 6) AS welch_z
FROM agg
"""


QUERIES: dict[str, QuerySpec] = {
    "evt_markov_transitions": QuerySpec(
        q_markov_transitions,
        ORACLE_MARKOV,
        "per-user Markov transition matrix (one window sort, tiny prob window)",
    ),
    "basket_brand_lift": QuerySpec(
        q_basket_brand_lift,
        ORACLE_BASKET_LIFT,
        "market-basket support/lift, in-row pair expansion (no self-join)",
    ),
    "evt_ab_test": QuerySpec(
        q_ab_test,
        ORACLE_AB_TEST,
        "deterministic-split Welch z-test, one conditional-stats pass",
    ),
}
