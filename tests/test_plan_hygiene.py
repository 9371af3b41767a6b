"""Suite-wide physical-plan invariants: build the executed plan of every
batch query in the registry at smoke scale and assert the two red flags
that silently kill 100 TB runs never appear:

- CartesianProduct (an unconstrained cross join — every intentional
  scalar/tiny cross join in the suite broadcasts, which compiles to
  BroadcastNestedLoopJoin instead);
- BatchEvalPython / row-at-a-time PythonUDF in a non-Arrow node (the
  engine-wide rule is Arrow-vectorized Python only: ArrowEvalPython,
  ArrowEvalPythonUDTF, mapInPandas / FlatMapGroupsInPandas, mapInArrow).

Streaming queries are excluded: their fn() drains a real stream, which
is exercised (and oracle-checked) elsewhere.
"""

from __future__ import annotations

import pytest

from sparkstreaming_spark.suite import all_queries
from tests.conftest import SF_DIR_SMOKE

REGISTRY = all_queries()
BATCH = sorted(n for n in REGISTRY if not n.startswith("stream_"))


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", BATCH)
def test_no_cartesian_and_no_row_python(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR_SMOKE)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, f"{name}: {plan[:1500]}"
    assert "BatchEvalPython" not in plan, f"{name}: {plan[:1500]}"
