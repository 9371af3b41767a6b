"""Capture `.explain("formatted")` for named registry queries into
plans/$PLANS_ROUND/<query>_<tag>.txt (optimization evidence files;
PLANS_ROUND defaults to r12).

Usage: python tools/capture_plans.py <tag> <query> [<query> ...]
       e.g. python tools/capture_plans.py before graph_pagerank doc_bpe_merges

Note: building a query's DataFrame may itself run Spark jobs (model
training collects, stream drains) — streaming drains return the drained
memory-sink table, so the captured plan for stream_* rows is the final
batch read of the sink, not the micro-batch plan; for those the relevant
evidence is the batch-build phase plan plus the code.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkstreaming_spark.session import get_spark  # noqa: E402
from sparkstreaming_spark.suite import all_queries  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", os.environ.get("PLANS_ROUND", "r12"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("capture-plans")
    registry = all_queries()
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        # public API (ADVICE r11: the PythonSQLUtils internals break
        # across Spark versions) — explain prints, so capture stdout
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
