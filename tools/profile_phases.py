"""Round-11 optimization profiler: time a named registry query end to end
(noop-sink action, guide §1.4) and, when instructive, its internal phases,
with job descriptions set so any future UI inspection maps back.

Usage: python tools/profile_phases.py <query> [<query> ...]
       SPARK_GRAFT_SF_DIR overrides the data dir (default sf0.1).

Each query is run three times after a warm-up (median-ish signal without
the full bench protocol); prints per-run seconds. Result caches are
dropped between runs exactly like bench.py so persisted intermediates
are paid.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkstreaming_spark.session import get_spark  # noqa: E402
from sparkstreaming_spark.suite import all_queries  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    spark = get_spark("profile-phases")
    sc = spark.sparkContext
    registry = all_queries()
    # warm-up: JVM + parquet footers
    registry["kpi_global_count"].fn(spark, sf_dir).count()
    for name in names:
        runs = []
        stats = ""
        for i in range(3):
            group = f"prof-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
            sc.setJobGroup("idle", "idle")
            spark.catalog.clearCache()
            if i == 2:  # job/stage/task counts: load-independent evidence
                st = sc.statusTracker()
                jobs = st.getJobIdsForGroup(group)
                stages, tasks = 0, 0
                for j in jobs:
                    ji = st.getJobInfo(j)
                    if ji is None:
                        continue
                    for s in ji.stageIds:
                        si = st.getStageInfo(s)
                        if si is not None and si.numTasks > 0:
                            stages += 1
                            tasks += si.numTasks
                stats = f"jobs={len(jobs)} stages={stages} tasks={tasks}"
        load = os.getloadavg()[0]
        print(
            f"{name:35s} "
            + " ".join(f"{r:6.2f}" for r in runs)
            + f"  {stats} load={load:.1f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
