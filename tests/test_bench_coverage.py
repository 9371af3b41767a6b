"""The bench regression surface must equal the registry: every
`queries()` entry is timed per-round (BENCH_DETAIL.json), so a perf
regression in any operator is visible to the driver. Round 8's silent
cap (78 unbenched queries) must not regrow."""

import importlib.util
import os


def _load_bench():
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_headline_covers_full_registry():
    from sparkstreaming_spark.suite import all_queries

    bench = _load_bench()
    missing = sorted(set(all_queries()) - set(bench.HEADLINE))
    assert not missing, f"unbenched registry queries: {missing}"


def test_headline_has_no_stale_names():
    from sparkstreaming_spark.suite import all_queries

    bench = _load_bench()
    stale = sorted(set(bench.HEADLINE) - set(all_queries()))
    assert not stale, f"HEADLINE names not in registry: {stale}"


def test_core_subset_is_benched():
    bench = _load_bench()
    assert set(bench.CORE) <= set(bench.HEADLINE)
