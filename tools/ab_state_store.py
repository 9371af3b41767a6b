#!/usr/bin/env python
"""A/B a subset of registry queries under the current session config
(state-store provider, state partitions, ...).

Usage: SPARKSTREAMING_STATE_PROVIDER=rocksdb python tools/ab_state_store.py q1 q2 ...
Prints one JSON line {query: median_sec}. Reuses bench.py's
measure_query, so the adaptive-median protocol (3 warm runs, 5 when
sub-second, result caches dropped between runs) matches the baseline
stamps being compared against.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import measure_query  # noqa: E402
from sparkstreaming_spark.session import get_spark  # noqa: E402
from sparkstreaming_spark.suite import all_queries  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_state_store")
    registry = all_queries()
    timings = {}
    for name in names:
        fn = registry[name].fn
        fn(spark, sf_dir).count()  # warm
        spark.catalog.clearCache()

        def run_once(fn=fn):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            elapsed = time.perf_counter() - t0
            spark.catalog.clearCache()
            return elapsed

        timings[name] = round(measure_query(run_once), 3)
    print(
        json.dumps(
            {
                "provider": os.environ.get(
                    "SPARKSTREAMING_STATE_PROVIDER", "rocksdb"
                ),
                "host_load_1min": round(os.getloadavg()[0], 1),
                "timings": timings,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
