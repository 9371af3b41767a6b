"""Physical-plan assertions for the subquery/decorrelation suite: the
value of these queries is HOW they execute (semi/anti joins, broadcast
dimensions, restricted aggregate inputs), which only a plan check pins."""

from __future__ import annotations

from tests.conftest import SF_DIR_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_exists_is_left_semi(spark):
    """EXISTS must compile to a LeftSemi join (no lineitem payload, no
    order duplication) — never an inner join + distinct."""
    from sparkstreaming_spark.suite.tpch import q_exists_orders

    plan = _plan(q_exists_orders(spark, SF_DIR_SMOKE))
    assert "LeftSemi" in plan, plan[:2000]
    assert "Distinct" not in plan


def test_not_exists_is_left_anti(spark):
    """Catalyst's RewritePredicateSubquery must turn NOT EXISTS into a
    LeftAnti join, and the uncorrelated avg threshold into a scalar
    subquery (one-row reuse), not a per-row recompute."""
    from sparkstreaming_spark.suite.tpch import q_inactive_customers

    plan = _plan(q_inactive_customers(spark, SF_DIR_SMOKE))
    assert "LeftAnti" in plan, plan[:2000]
    assert "Subquery" in plan  # scalar subquery node for the global avg


def test_avg_qty_threshold_restricts_before_agg(spark):
    """Q17 shape: the per-part avg must be computed on the brand-filtered
    lineitem (broadcast semi-restrict first). Both lineitem branches must
    join part with a BroadcastHashJoin; the threshold join keys on
    l_partkey."""
    from sparkstreaming_spark.suite.tpch import q_avg_qty_threshold

    plan = _plan(q_avg_qty_threshold(spark, SF_DIR_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2, plan[:3000]


def test_nation_volume_broadcasts_all_dims(spark):
    """Q5 shape: supplier/nation/region must broadcast — the only
    allowed shuffle joins are lineitem⋈orders and ⋈customer."""
    from sparkstreaming_spark.suite.tpch import q_nation_volume

    plan = _plan(q_nation_volume(spark, SF_DIR_SMOKE))
    # two-key supplier join (suppkey, nationkey) present and broadcast
    assert "BroadcastHashJoin [l_suppkey" in plan or plan.count(
        "BroadcastHashJoin"
    ) >= 3, plan[:3000]
    assert "SortMergeJoin" not in plan.replace(
        "SortMergeJoin [l_orderkey", ""
    ).replace("SortMergeJoin [o_custkey", "")
