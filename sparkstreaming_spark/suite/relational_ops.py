"""Relational capability-bar queries: filters/projections (SURVEY §2.3),
joins (§2.5 — absent in reference, required by north star), windows/sorts/
set ops (§2.6), grouping sets, and scalar functions (§2.7).

Scale notes per query are inline; the common themes:
- dimension joins are explicitly broadcast (`F.broadcast`) — at 100 TB the
  fact side never shuffles for a 25-row nation table;
- top-k is orderBy+limit → TakeOrderedAndProject (no global sort);
- all predicates are plain column expressions so they push into the
  parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import between_filter, top_k, union_all
from ..sources.batch import read_table
from . import QuerySpec


def q_filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — inclusive range predicate (Producer.scala:40), typed bounds,
    pushed to the parquet scan."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        between_filter(li, "l_quantity", 10, 20)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_project_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/P4/P5/P6/P7 in one plan: drop, withColumn, when/otherwise,
    lit, cast, alias (Consumer.scala:140-145,369,395)."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.drop("o_orderpriority")
        .withColumn("is_open", F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
        .withColumn("src", F.lit("orders"))
        .select(
            F.col("o_orderkey"),
            F.col("is_open").cast("int").alias("is_open"),
            F.col("src"),
            F.round(F.col("o_totalprice"), 2).alias("price_r"),
        )
    )


def q_join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, revenue
    per region. nation/region are broadcast (25/5 rows); orders⋈customer⋈
    lineitem shuffle on their keys with AQE sizing. TPC-H Q5 shape."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti joins (EXISTS / NOT EXISTS): customers with and
    without orders, counted per market segment."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    with_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("with_orders"))
    )
    without = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("without_orders"))
    )
    return with_orders.join(without, "c_mktsegment", "full_outer").select(
        "c_mktsegment",
        F.coalesce("with_orders", F.lit(0)).cast("bigint").alias("with_orders"),
        F.coalesce("without_orders", F.lit(0)).cast("bigint").alias("without_orders"),
    )


def q_outer_join_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping unmatched rows: every nation with its
    customer count (0 where none)."""
    n = read_table(spark, sf_dir, "nation")
    c = read_table(spark, sf_dir, "customer")
    per_nation = c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_customers"))
    return n.join(per_nation, n.n_nationkey == per_nation.c_nationkey, "left").select(
        "n_nationkey",
        "n_name",
        F.coalesce("n_customers", F.lit(0)).cast("bigint").alias("n_customers"),
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: 10 biggest customers by order revenue; tie-broken on custkey
    so the result is deterministic. TakeOrderedAndProject physical op."""
    o = read_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return top_k(per_cust, 10, F.col("revenue").desc(), F.col("o_custkey").asc())


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 window functions: rank orders within each customer by totalprice;
    keep each customer's top-3. Partitioned window → parallel by key."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price_r"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic frame: per-customer running order count ordered by date —
    the batch analogue of the reference's update-mode running totals
    (SURVEY §2.9 T2/T3)."""
    o = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("running_orders"),
    )


def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops: customers in BUILDING segment ∪/∩/∖ customers with an open
    order, reported as counts of each set-op result."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    open_cust = (
        o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k")).distinct()
    )
    rows = [
        building.union(open_cust).distinct().agg(
            F.lit("union").alias("op"), F.count(F.lit(1)).alias("cnt")
        ),
        building.intersect(open_cust).agg(
            F.lit("intersect").alias("op"), F.count(F.lit(1)).alias("cnt")
        ),
        building.exceptAll(open_cust.intersect(building)).distinct().agg(
            F.lit("except").alias("op"), F.count(F.lit(1)).alias("cnt")
        ),
    ]
    return union_all(rows)


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets via rollup: order counts by (status, priority),
    (status), and grand total."""
    o = read_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate: exact count-distinct of partkey/suppkey per
    returnflag (expands to a two-phase aggregate in Spark)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 scalar-function surface on strings/dates/math: lower, substring,
    length, concat, date_part extracts, abs/floor/ceil in one projection."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.lower(F.col("o_orderpriority")).alias("prio_lower"),
        F.substring(F.col("o_orderstatus"), 1, 1).alias("status_c"),
        F.length(F.col("o_orderpriority")).cast("int").alias("prio_len"),
        F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderpriority")).alias("tag"),
        F.year(F.col("o_orderdate")).cast("int").alias("yr"),
        F.month(F.col("o_orderdate")).cast("int").alias("mo"),
        F.floor(F.col("o_totalprice")).cast("bigint").alias("price_floor"),
        F.abs(F.col("o_totalprice") - 1000.0).alias("price_dist"),
    ).withColumn("price_dist", F.round("price_dist", 2))


def q_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safety surface (Spark 4 runs ANSI mode by default, where
    divide-by-zero and bad casts THROW): try_divide / try_element_at /
    try_cast return NULL instead — the contract pipelines rely on to
    survive dirty data without a crash-loop. NULL-production parity is
    checked exactly: the oracle reproduces each NULL case."""
    o = read_table(spark, sf_dir, "orders")
    parts = F.split("o_orderpriority", "-")
    staged = o.select(
        "o_orderstatus",
        F.try_divide(
            F.col("o_totalprice"), (F.col("o_orderkey") % 3).cast("double")
        ).alias("safe_div"),
        F.try_element_at(parts, F.lit(2)).alias("p2"),
        F.try_element_at(parts, F.lit(9)).alias("p9"),
        F.element_at(parts, 1).try_cast("int").alias("p1_int"),
    )
    return staged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        (F.count(F.lit(1)) - F.count("safe_div")).alias("n_div_null"),
        F.round(F.avg("safe_div"), 2).alias("avg_safe_div"),
        F.count("p2").alias("n_p2"),
        F.count("p9").alias("n_p9"),
        F.sum("p1_int").alias("sum_p1"),
    )


ORACLE_TRY_FUNCTIONS = """
WITH staged AS (
  SELECT o_orderstatus,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL
              ELSE o_totalprice / (o_orderkey % 3) END AS safe_div,
         string_split(o_orderpriority, '-')[2] AS p2,
         string_split(o_orderpriority, '-')[9] AS p9,
         try_cast(string_split(o_orderpriority, '-')[1] AS int) AS p1_int
  FROM orders
)
SELECT o_orderstatus, count(*) AS cnt,
       count(*) - count(safe_div) AS n_div_null,
       round(avg(safe_div), 2) AS avg_safe_div,
       count(p2) AS n_p2, count(p9) AS n_p9,
       cast(sum(p1_int) AS bigint) AS sum_p1
FROM staged GROUP BY o_orderstatus
"""


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: linestatus columns of summed quantity per returnflag (the
    two-phase pivot aggregate; values list pinned so the plan is static)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 4))
    )


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Official unpivot/melt API (vs the stack() idiom kpi_feature_means
    uses): three lineitem measures → long form → per-(flag, measure)
    stats. Unpivot is a narrow projection (no shuffle until the final
    aggregate), so wide→long at 100 TB costs one pass."""
    li = read_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("val"), 2).alias("total"),
        F.round(F.avg("val"), 6).alias("mean_val"),
    )


ORACLE_UNPIVOT = """
WITH long AS (
  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
)
SELECT l_returnflag, measure, count(*) AS cnt,
       round(sum(val), 2) AS total, round(avg(val), 6) AS mean_val
FROM long GROUP BY l_returnflag, measure
"""


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube over (status, priority): all 4 grouping sets incl. grand total."""
    o = read_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def q_sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL entry point (SURVEY §3: `spark.sql` over registered views —
    free via Catalyst, same plan as the DataFrame form): TPC-H Q3 shape,
    top-10 open orders by pending revenue for one market segment."""
    from ..sources.batch import load_tables

    load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
               o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
        """
    )


def q_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named parameter markers): the safe
    templating entry point — values bind as literals AFTER parsing, so a
    caller-supplied string can never change the plan shape (injection-
    proof by construction, and plan-cache friendly: one parse per
    template)."""
    from ..sources.batch import load_tables

    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus,
               count(*) AS cnt,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        WHERE o_totalprice BETWEEN :lo AND :hi AND o_orderpriority = :prio
        GROUP BY o_orderstatus
        """,
        args={"lo": 50_000.0, "hi": 200_000.0, "prio": "1-URGENT"},
    )


ORACLE_SQL_PARAMETERIZED = """
SELECT o_orderstatus, count(*) AS cnt, round(sum(o_totalprice), 2) AS revenue
FROM orders
WHERE o_totalprice BETWEEN 50000.0 AND 200000.0 AND o_orderpriority = '1-URGENT'
GROUP BY o_orderstatus
"""


def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UDF (Spark 4 CREATE FUNCTION ... RETURN expr): declarative
    reusable scalar logic that Catalyst INLINES into the plan — unlike a
    Python UDF there is no serialization boundary, so the call below
    plans identically to writing the expression out (codegen, pushdown
    intact). The oracle inlines the same expression by hand."""
    from ..sources.batch import load_tables

    load_tables(spark, sf_dir, ("lineitem",))
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
        RETURNS DOUBLE RETURN p * (1 - d)
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS cnt,
               round(sum(disc_price(l_extendedprice, l_discount)), 2) AS revenue
        FROM lineitem GROUP BY l_returnflag
        """
    )


ORACLE_SQL_UDF = """
SELECT l_returnflag, count(*) AS cnt,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem GROUP BY l_returnflag
"""


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE (operators/merge.py): every 7th order arrives as an
    update (status 'M', +10% price), every 91st (7×13) additionally as a
    tombstone. Updates win by key, tombstones drop, everything else
    passes through — verified by the post-merge status×revenue rollup."""
    from ..operators.merge import merge_upsert

    orders = read_table(spark, sf_dir, "orders")
    updates = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_orderstatus", F.lit("M"))
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .withColumn("__del", F.col("o_orderkey") % 13 == 0)
    )
    merged = merge_upsert(orders, updates, ["o_orderkey"], delete_col="__del")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


ORACLE_MERGE_UPSERT = """
WITH upd AS (
  SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
         o_totalprice * 1.1 AS o_totalprice, o_orderdate, o_orderpriority,
         (o_orderkey % 13 = 0) AS del
  FROM orders WHERE o_orderkey % 7 = 0
),
merged AS (
  SELECT o_orderstatus, o_totalprice FROM orders
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
  UNION ALL
  SELECT o_orderstatus, o_totalprice FROM upd WHERE NOT del
)
SELECT o_orderstatus, count(*) AS cnt, round(sum(o_totalprice), 2) AS revenue
FROM merged GROUP BY o_orderstatus
"""


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → ORC (zstd) → read back → pricing rollup. Timestamps and
    decimals must survive the format hop for the oracle (which reads the
    original parquet) to hash-match."""
    import tempfile

    from ..sinks.files import write_orc
    from ..sources.batch import read_orc

    li = read_table(spark, sf_dir, "lineitem")
    out = tempfile.mkdtemp(prefix="orc_rt_")
    write_orc(li, out)
    back = read_orc(spark, out)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.max("l_shipdate").alias("max_shipdate"),
    )


ORACLE_ORC_ROUNDTRIP = """
SELECT l_returnflag, count(*) AS cnt,
       round(sum(l_quantity), 2) AS sum_qty,
       max(l_shipdate) AS max_shipdate
FROM lineitem GROUP BY l_returnflag
"""


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation pattern through the correctness gate: lineitem ⋈
    orders salted 8 ways (operators/skew.py — left side salted by a
    unique column, right side replicated per salt), then revenue per
    order priority. Salting changes the PLAN (hot keys spread over 8
    reducers), never the RESULT — the oracle is the plain join."""
    from ..operators.skew import salted_join

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(
        li, orders, "l_orderkey", salt=8, left_unique_col="l_linenumber"
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


ORACLE_SALTED_JOIN = """
SELECT o_orderpriority, count(*) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → XML (Spark 4 built-in source, one element per row) →
    read back with a PINNED schema → per-lang aggregate. The writer
    escapes markup in text; the reader must unescape it losslessly for
    the oracle (which aggregates the original parquet) to hash-match."""
    import tempfile

    d = read_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="xml_rt_") + "/docs"
    d.write.format("xml").option("rootTag", "docs").option("rowTag", "doc").save(out)
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema("doc_id bigint, text string, lang string, source string, n_chars bigint")
        .load(out)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(F.length("text")).alias("sum_text_len"),
    )


ORACLE_XML_ROUNDTRIP = """
SELECT lang, count(*) AS n_docs,
       cast(sum(n_chars) AS bigint) AS sum_chars,
       cast(sum(length(text)) AS bigint) AS sum_text_len
FROM documents GROUP BY lang
"""


QUERIES: dict[str, QuerySpec] = {
    "orc_roundtrip": QuerySpec(
        q_orc_roundtrip, ORACLE_ORC_ROUNDTRIP, "ORC write→read round trip"
    ),
    "xml_roundtrip": QuerySpec(
        q_xml_roundtrip, ORACLE_XML_ROUNDTRIP, "XML write→read round trip (built-in source)"
    ),
    "join_salted_skew": QuerySpec(
        q_salted_join, ORACLE_SALTED_JOIN, "8-way salted skew join == plain join"
    ),
    "scalar_try_functions": QuerySpec(
        q_try_functions,
        ORACLE_TRY_FUNCTIONS,
        "ANSI-safe try_divide/try_element_at/try_cast NULL parity",
    ),
    "unpivot_measures": QuerySpec(
        q_unpivot, ORACLE_UNPIVOT, "official unpivot/melt API, wide→long"
    ),
    "merge_upsert": QuerySpec(
        q_merge_upsert, ORACLE_MERGE_UPSERT, "batch MERGE: upsert + tombstone"
    ),
    "sql_udf": QuerySpec(
        q_sql_udf,
        ORACLE_SQL_UDF,
        "SQL UDF (CREATE FUNCTION): inlined scalar logic, no UDF boundary",
    ),
    "sql_parameterized": QuerySpec(
        q_sql_parameterized,
        ORACLE_SQL_PARAMETERIZED,
        "named-parameter SQL entry point (post-parse literal binding)",
    ),
    "sql_shipping_priority": QuerySpec(
        q_sql_shipping_priority,
        "SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
        "strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O' "
        "GROUP BY o_orderkey, o_orderdate, o_orderpriority "
        "ORDER BY revenue DESC, o_orderkey ASC LIMIT 10",
        "spark.sql entry point, TPC-H Q3 shape",
    ),
    "pivot_qty": QuerySpec(
        q_pivot,
        "SELECT l_returnflag, "
        "round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS \"O\", "
        "round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS \"F\" "
        "FROM lineitem GROUP BY l_returnflag",
        "pivot via pinned value list",
    ),
    "cube_counts": QuerySpec(
        q_cube,
        "SELECT o_orderstatus, o_orderpriority, count(*) AS cnt FROM orders "
        "GROUP BY CUBE (o_orderstatus, o_orderpriority)",
        "cube grouping sets",
    ),
    "filter_between": QuerySpec(
        q_filter_between,
        "SELECT l_returnflag, count(*) AS cnt FROM lineitem "
        "WHERE l_quantity BETWEEN 10 AND 20 GROUP BY l_returnflag",
        "P3 range predicate",
    ),
    "project_derive": QuerySpec(
        q_project_derive,
        "SELECT o_orderkey, "
        "CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS is_open, "
        "'orders' AS src, round(o_totalprice, 2) AS price_r FROM orders",
        "P1/P2/P4/P5/P6/P7 projection surface",
    ),
    "join_star_revenue": QuerySpec(
        q_join_star_revenue,
        "SELECT r_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
        "count(*) AS n_items "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY r_name",
        "broadcast star join, TPC-H Q5 shape",
    ),
    "join_semi_anti": QuerySpec(
        q_join_semi_anti,
        "WITH w AS (SELECT c_mktsegment, count(*) AS with_orders FROM customer "
        "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) GROUP BY c_mktsegment), "
        "wo AS (SELECT c_mktsegment, count(*) AS without_orders FROM customer "
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) GROUP BY c_mktsegment) "
        "SELECT coalesce(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment, "
        "coalesce(with_orders, 0) AS with_orders, coalesce(without_orders, 0) AS without_orders "
        "FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment",
        "left-semi/left-anti joins",
    ),
    "outer_join_fill": QuerySpec(
        q_outer_join_fill,
        "SELECT n_nationkey, n_name, "
        "coalesce((SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey), 0) AS n_customers "
        "FROM nation",
        "left outer join with fill",
    ),
    "top_customers": QuerySpec(
        q_top_customers,
        "SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders "
        "FROM orders GROUP BY o_custkey "
        "ORDER BY revenue DESC, o_custkey ASC LIMIT 10",
        "top-k with deterministic tiebreak",
    ),
    "window_rank": QuerySpec(
        q_window_rank,
        "SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price_r, cast(rk AS int) AS rk "
        "FROM (SELECT *, row_number() OVER "
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk "
        "FROM orders) WHERE rk <= 3",
        "W1 ranking window",
    ),
    "window_running": QuerySpec(
        q_window_running,
        "SELECT o_custkey, o_orderkey, "
        "count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_orders "
        "FROM orders",
        "W1 analytic frame / running total",
    ),
    "setops": QuerySpec(
        q_setops,
        "WITH b AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'), "
        "o AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O') "
        "SELECT 'union' AS op, count(*) AS cnt FROM (SELECT k FROM b UNION SELECT k FROM o) "
        "UNION ALL SELECT 'intersect', count(*) FROM (SELECT k FROM b INTERSECT SELECT k FROM o) "
        "UNION ALL SELECT 'except', count(*) FROM (SELECT k FROM b EXCEPT SELECT k FROM o)",
        "U1/U2 + intersect/except",
    ),
    "rollup_counts": QuerySpec(
        q_rollup,
        "SELECT o_orderstatus, o_orderpriority, count(*) AS cnt FROM orders "
        "GROUP BY ROLLUP (o_orderstatus, o_orderpriority)",
        "grouping sets / rollup",
    ),
    "distinct_counts": QuerySpec(
        q_distinct_counts,
        "SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, "
        "count(DISTINCT l_suppkey) AS n_supps FROM lineitem GROUP BY l_returnflag",
        "exact distinct aggregates",
    ),
    "scalar_functions": QuerySpec(
        q_scalar_functions,
        "SELECT o_orderkey, lower(o_orderpriority) AS prio_lower, "
        "substring(o_orderstatus, 1, 1) AS status_c, "
        "cast(length(o_orderpriority) AS int) AS prio_len, "
        "concat_ws('-', o_orderstatus, o_orderpriority) AS tag, "
        "cast(year(o_orderdate) AS int) AS yr, cast(month(o_orderdate) AS int) AS mo, "
        "cast(floor(o_totalprice) AS bigint) AS price_floor, "
        "round(abs(o_totalprice - 1000.0), 2) AS price_dist "
        "FROM orders",
        "§2.7 scalar function surface",
    ),
}


def q_recursive_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): walk each doc_id < 200 up
    its binary-ancestor chain (node -> node DIV 2 until 1) emitting every
    intermediate (doc_id, node, depth) row — the hierarchy/graph-walk SQL
    surface (org charts, thread reply chains, BOM explosions). The oracle
    hash-compares the FULL chain, so the recursion itself is verified
    step by step, not just a closed-form final answer. Iteration depth is
    log2(max id); each step is a narrow self-union, no driver loop."""
    from ..sources.batch import load_tables

    load_tables(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        WITH RECURSIVE chain(doc_id, node, depth) AS (
          SELECT doc_id, doc_id AS node, CAST(0 AS INT) AS depth
          FROM documents WHERE doc_id < 200
          UNION ALL
          SELECT doc_id, node DIV 2, depth + 1 FROM chain WHERE node > 1
        )
        SELECT doc_id, node, depth FROM chain
        """
    )


ORACLE_RECURSIVE_CHAIN = """
WITH RECURSIVE chain(doc_id, node, depth) AS (
  SELECT doc_id, doc_id AS node, CAST(0 AS INT) AS depth
  FROM documents WHERE doc_id < 200
  UNION ALL
  SELECT doc_id, node // 2, depth + 1 FROM chain WHERE node > 1
)
SELECT doc_id, node, depth FROM chain
"""


QUERIES["sql_recursive_chain"] = QuerySpec(
    q_recursive_chain,
    ORACLE_RECURSIVE_CHAIN,
    "WITH RECURSIVE ancestor-chain walk (full chain hash-verified)",
)


def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (Spark 4 SQL surface): each customer's
    top-2 orders by price — the per-row dependent subquery form users
    write; Catalyst decorrelates it into a ranked window join rather than
    executing per-customer (the point of declaring it rather than
    looping). Deterministic via the (price DESC, orderkey) tiebreak."""
    from ..sources.batch import load_tables

    load_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_custkey < 200
        """
    )


ORACLE_LATERAL_TOPN = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
WHERE c.c_custkey < 200
"""


QUERIES["sql_lateral_topn"] = QuerySpec(
    q_lateral_topn,
    ORACLE_LATERAL_TOPN,
    "correlated LATERAL top-n subquery (Catalyst-decorrelated)",
)


def q_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicity-preserving set ops (the ALL variants §2.6 lacks
    elsewhere): order-priority bags of two status slices combined with
    INTERSECT ALL / EXCEPT ALL semantics via intersectAll/exceptAll,
    reduced to per-priority multiplicities. Bag semantics matter when
    rows are legitimately duplicated (event feeds) — DISTINCT set ops
    silently change counts."""
    o = read_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") != "F").select("o_orderpriority")
    b = o.filter(F.col("o_totalprice") > 100_000).select("o_orderpriority")
    inter = (
        a.intersectAll(b)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("op", F.lit("intersect_all"))
    )
    exc = (
        a.exceptAll(b)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("op", F.lit("except_all"))
    )
    return inter.unionByName(exc).select("op", "o_orderpriority", "cnt")


ORACLE_SETOPS_ALL = """
WITH a AS (SELECT o_orderpriority FROM orders WHERE o_orderstatus != 'F'),
b AS (SELECT o_orderpriority FROM orders WHERE o_totalprice > 100000),
ia AS (SELECT o_orderpriority FROM a INTERSECT ALL SELECT o_orderpriority FROM b),
ea AS (SELECT o_orderpriority FROM a EXCEPT ALL SELECT o_orderpriority FROM b)
SELECT 'intersect_all' AS op, o_orderpriority, count(*) AS cnt FROM ia GROUP BY 2
UNION ALL
SELECT 'except_all' AS op, o_orderpriority, count(*) AS cnt FROM ea GROUP BY 2
"""


def q_sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNPIVOT surface (Spark 3.4+ keyword, the inverse of PIVOT):
    melt four lineitem measures into (measure, val) rows and profile each
    — the narrow wide-to-long reshape; Catalyst expands it to the same
    Expand node as stack(), so it stays one scan + one partial agg."""
    from ..sources.batch import load_tables

    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT measure, count(*) AS n, round(avg(val), 6) AS avg_val,
               round(max(val), 2) AS max_val
        FROM lineitem
        UNPIVOT (val FOR measure IN (
          l_quantity, l_extendedprice, l_discount, l_tax))
        GROUP BY measure
        """
    )


ORACLE_SQL_UNPIVOT = """
WITH m AS (
  SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
)
SELECT measure, count(*) AS n, round(avg(val), 6) AS avg_val,
       round(max(val), 2) AS max_val
FROM m GROUP BY 1
"""


def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation window functions in one pass: lag, lead, first_value,
    last_value (bounded frame), nth_value — per-user event timelines
    (user_id < 20). The unbounded-following last_value uses an explicit
    full-partition frame on BOTH engines (default frames differ:
    RANGE..CURRENT ROW would return the current row itself)."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return ev.filter(F.col("user_id") < 20).select(
        "event_id",
        "user_id",
        F.lag("event_type", 1).over(w).alias("prev_type"),
        F.lead("event_type", 1).over(w).alias("next_type"),
        F.first("event_type").over(w_full).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
        F.nth_value("event_type", 3).over(w_full).alias("third_type"),
    )


ORACLE_WINDOW_NAVIGATION = """
SELECT event_id, user_id,
       lag(event_type, 1) OVER w AS prev_type,
       lead(event_type, 1) OVER w AS next_type,
       first_value(event_type) OVER wf AS first_type,
       last_value(event_type) OVER wf AS last_type,
       nth_value(event_type, 3) OVER wf AS third_type
FROM events WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       wf AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


QUERIES["setops_all"] = QuerySpec(
    q_setops_all, ORACLE_SETOPS_ALL, "INTERSECT ALL / EXCEPT ALL bag semantics"
)
QUERIES["sql_unpivot"] = QuerySpec(
    q_sql_unpivot, ORACLE_SQL_UNPIVOT, "SQL UNPIVOT wide-to-long reshape"
)
QUERIES["window_navigation_surface"] = QuerySpec(
    q_window_navigation,
    ORACLE_WINDOW_NAVIGATION,
    "lag/lead/first/last/nth_value in one window pass",
)


def q_agg_modern_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern aggregate surface in one pass: median(), count_if(),
    bool_and/bool_or, and ordered LISTAGG (Spark 4 WITHIN GROUP) — the
    SQL-2023-era aggregates a migrating warehouse workload expects.
    LISTAGG aggregates the DISTINCT priority set with an explicit order,
    so the string is deterministic in both engines."""
    o = read_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_mod")
    return spark.sql(
        """
        SELECT o_orderstatus,
               round(median(o_totalprice), 6) AS med_price,
               count_if(o_totalprice > 1000) AS n_big,
               bool_and(o_totalprice > 0) AS all_positive,
               bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
               listagg(DISTINCT o_orderpriority, ',')
                 WITHIN GROUP (ORDER BY o_orderpriority) AS priorities
        FROM __orders_mod
        GROUP BY o_orderstatus
        """
    )


ORACLE_AGG_MODERN = """
SELECT o_orderstatus,
       round(median(o_totalprice), 6) AS med_price,
       count(*) FILTER (WHERE o_totalprice > 1000) AS n_big,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
         AS priorities
FROM orders
GROUP BY o_orderstatus
"""


def q_hof_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function surface over per-order quantity arrays:
    aggregate (fold), zip_with, filter, forall, exists — the lambda
    family that keeps array logic inside Catalyst instead of Python.
    Arrays are sorted on build so every lambda sees the same element
    order in both engines."""
    li = read_table(spark, sf_dir, "lineitem")
    arrs = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.round("l_quantity", 2))).alias("q")
    )
    return arrs.select(
        "l_orderkey",
        F.round(
            F.aggregate("q", F.lit(0.0), lambda acc, x: acc + x), 2
        ).alias("folded_sum"),
        F.round(
            F.aggregate(
                F.zip_with("q", F.reverse("q"), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            2,
        ).alias("palindrome_dot"),
        F.size(F.filter("q", lambda x: x >= 30)).alias("n_ge30"),
        F.forall("q", lambda x: x > 0).alias("all_pos"),
        F.exists("q", lambda x: x == 40.0).alias("has_40"),
    )


ORACLE_HOF = """
WITH arrs AS (
  SELECT l_orderkey,
         list(round(l_quantity, 2) ORDER BY round(l_quantity, 2)) AS q
  FROM lineitem GROUP BY 1
)
SELECT l_orderkey,
       round(list_reduce(list_prepend(0.0, q), (acc, x) -> acc + x), 2)
         AS folded_sum,
       round(list_reduce(
               list_prepend(0.0,
                 list_transform(list_zip(q, list_reverse(q)),
                                t -> t[1] * t[2])),
               (acc, x) -> acc + x), 2) AS palindrome_dot,
       len(list_filter(q, x -> x >= 30)) AS n_ge30,
       len(list_filter(q, x -> NOT (x > 0))) = 0 AS all_pos,
       len(list_filter(q, x -> x = 40.0)) > 0 AS has_40
FROM arrs
"""


QUERIES.update(
    {
        "agg_modern_surface": QuerySpec(
            q_agg_modern_surface,
            ORACLE_AGG_MODERN,
            "median/count_if/bool_and/bool_or/ordered LISTAGG in one pass",
        ),
        "hof_surface": QuerySpec(
            q_hof_surface,
            ORACLE_HOF,
            "higher-order-function family (fold/zip_with/filter/forall/exists)",
        ),
    }
)
