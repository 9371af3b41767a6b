#!/usr/bin/env python
"""One arm of the interleaved A/B harness (see ab_interleaved.py).

Hosts a SparkSession built from the repo checkout given as argv[1] and
executes one query run per stdin line, reporting wall seconds on stdout.
The driver process interleaves runs across two workers so shared-host
load bursts hit both arms equally — the measurement protocol VERDICT.md
(round 11) asked for to adjudicate load-contaminated per-query drifts.

Protocol (line-oriented, blocking):
  stdin  "PING"          -> stdout "PONG"            (after session build)
  stdin  "RUN <query>"   -> stdout {"q":..., "sec":...}  (one timed run)
  stdin  "EXIT"          -> worker quits

Timing matches bench.py exactly: wall clock of plan construction + the
count() action, result caches dropped after every run (CacheManager
would otherwise let run 2 reuse run 1's persisted intermediates).

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py;
AB_EXTRA_CONF — optional JSON dict of extra Spark confs (config-A/B
mode, where both arms run the same code with different session confs).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    sys.path.insert(0, repo)
    os.chdir(repo)

    from sparkstreaming_spark.session import get_spark
    from sparkstreaming_spark.suite import all_queries

    extra = json.loads(os.environ.get("AB_EXTRA_CONF", "{}")) or None
    spark = get_spark("ab_worker", extra_conf=extra)
    registry = all_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    out = sys.stdout
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        if line == "EXIT":
            break
        if line == "PING":
            out.write("PONG\n")
            out.flush()
            continue
        assert line.startswith("RUN "), f"bad command: {line!r}"
        name = line[4:]
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).count()
        elapsed = time.perf_counter() - t0
        spark.catalog.clearCache()
        out.write(json.dumps({"q": name, "sec": round(elapsed, 4)}) + "\n")
        out.flush()
    spark.stop()


if __name__ == "__main__":
    main()
