#!/usr/bin/env python
"""A/B a subset of registry queries under the current state-store config.

Usage: SPARKSTREAMING_STATE_PROVIDER=rocksdb python tools/ab_state_store.py q1 q2 ...
Prints one JSON line {query: median_sec}. Same adaptive-median protocol as
bench.py (3 warm runs, result caches dropped between runs).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        timings[name] = sorted(runs)[1]
    print(json.dumps({"provider": os.environ.get("SPARKSTREAMING_STATE_PROVIDER", "rocksdb"), "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
