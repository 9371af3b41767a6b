"""Full-suite sf1 (10x bench-sf) scale run: build the 10x corpus via
tools/stress.py::build into /tmp/stress_10x, then time EVERY registry
query against it (single timed run per query — the point is the shape
of the per-family scaling curve vs the sf0.1 driver stamps, not
median-precision absolutes).

Writes BENCH_SF1.json at the repo root:
{"sf": "0.1x10", "total_sec": ..., "queries": {name: sec}}.

Usage: python tools/sf1_bench.py [--skip-streaming]
                                 [--data DIR] [--out FILE] [--sf LABEL]

--data/--out/--sf point the sweep at a different corpus — e.g. the TRUE
sf1 generation (tools/gen_sf1.py -> /tmp/sf1_true, out BENCH_SF1_TRUE
.json, label "1.0-true"), which carries honest document-frequency
statistics instead of 10x-replicated ones.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkstreaming_spark.session import get_spark  # noqa: E402
from sparkstreaming_spark.suite import all_queries  # noqa: E402
from stress import build  # noqa: E402


def _arg(flag: str, default: str) -> str:
    if flag in sys.argv:
        idx = sys.argv.index(flag)
        if idx + 1 >= len(sys.argv):
            raise SystemExit(f"usage: {flag} <value> (no value given)")
        return sys.argv[idx + 1]
    return default


def main() -> None:
    skip_streaming = "--skip-streaming" in sys.argv
    out_dir = _arg("--data", "/tmp/stress_10x")
    out_file = _arg("--out", "BENCH_SF1.json")
    sf_label = _arg("--sf", "0.1x10")
    spark = get_spark("sf1-bench")
    if not os.path.exists(f"{out_dir}/orders.parquet"):
        if out_dir != "/tmp/stress_10x":
            raise SystemExit(
                f"{out_dir} has no data; generate it first (tools/gen_sf1.py)"
            )
        t0 = time.perf_counter()
        build(spark, 10, out_dir)
        print(f"built 10x corpus in {time.perf_counter() - t0:.1f}s", flush=True)
    only = _arg("--only", "")  # comma-separated name prefixes
    load_start = round(os.getloadavg()[0], 1)
    registry = all_queries()
    names = sorted(registry)
    if skip_streaming:
        names = [n for n in names if not n.startswith(("stream", "streamck"))]
    if only:
        prefixes = tuple(p for p in only.split(",") if p)
        names = [n for n in names if n.startswith(prefixes)]
        if not names:
            raise SystemExit(f"--only {only!r} matched no queries")
    # warm-up: JVM + parquet footers
    registry[names[0]].fn(spark, out_dir).count()
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            registry[name].fn(spark, out_dir).count()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # record, don't abort the sweep
            timings[name] = -1.0
            print(f"ERR {name}: {exc}", flush=True)
        # drop frames queries persisted: without this, cached frames
        # accumulate across the 339-query session and memory pressure
        # inflates later rows (same fix as bench.py)
        spark.catalog.clearCache()
        print(f"{name}: {timings[name]:.2f}s", flush=True)
    total = round(sum(t for t in timings.values() if t > 0), 2)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        out_file,
    )
    with open(path, "w") as fh:
        json.dump(
            {
                "sf": sf_label,
                "total_sec": total,
                "queries": timings,
                "host_load_1min": [load_start, round(os.getloadavg()[0], 1)],
            },
            fh,
            indent=1,
        )
        fh.write("\n")
    print(f"TOTAL {total}s over {len(timings)} queries -> {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
