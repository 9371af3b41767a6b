"""Persisted IVF index (similarity/index.py): build/append/query parity
with the in-memory path, incremental-append equivalence, and the
partition-pruning plan property that makes the index an index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreaming_spark.similarity import (
    append_to_ivf_index,
    build_ivf_index,
    ivf_knn,
    query_ivf_index,
)
from sparkstreaming_spark.sources.batch import read_table
from tests.conftest import SF_DIR_CORRECT


def _frames_equal(a, b):
    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    return ka == kb


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, SF_DIR_CORRECT, "embeddings")


def test_persisted_query_equals_in_memory(spark, emb, tmp_path_factory):
    """Same params ⇒ the saved index answers exactly like ivf_knn (both
    inherit the deterministic centroid training)."""
    idx = str(tmp_path_factory.mktemp("ivf") / "idx")
    build_ivf_index(emb, "vec_id", "embedding", idx, nlist=8, train_size=256)
    queries = emb.orderBy("vec_id").limit(5)
    got = query_ivf_index(spark, idx, queries, "vec_id", "embedding", k=5, nprobe=3)
    want = ivf_knn(
        emb, queries, "vec_id", "embedding", k=5, nlist=8, nprobe=3, train_size=256
    )
    assert _frames_equal(got, want)


def test_append_equals_full_rebuild(spark, emb, tmp_path_factory):
    """Build on the id-prefix, append the suffix ⇒ identical answers to a
    from-scratch build over everything (centroids frozen; the training
    sample is the same id-prefix in both)."""
    ids = [r.vec_id for r in emb.select("vec_id").orderBy("vec_id").collect()]
    cut = ids[len(ids) * 3 // 4]
    base = emb.filter(F.col("vec_id") <= cut)
    extra = emb.filter(F.col("vec_id") > cut)
    assert extra.count() > 0

    inc = str(tmp_path_factory.mktemp("ivf") / "inc")
    build_ivf_index(base, "vec_id", "embedding", inc, nlist=8, train_size=256)
    append_to_ivf_index(extra, "vec_id", "embedding", inc)

    full = str(tmp_path_factory.mktemp("ivf") / "full")
    build_ivf_index(emb, "vec_id", "embedding", full, nlist=8, train_size=256)

    queries = emb.orderBy("vec_id").limit(5)
    got = query_ivf_index(spark, inc, queries, "vec_id", "embedding", k=5, nprobe=3)
    want = query_ivf_index(spark, full, queries, "vec_id", "embedding", k=5, nprobe=3)
    assert _frames_equal(got, want)


def test_probe_scan_is_partition_pruned(spark, emb, tmp_path_factory):
    """The probed candidate scan must push list_id into PartitionFilters —
    reading all nlist partitions would defeat the index."""
    idx = str(tmp_path_factory.mktemp("ivf") / "idx")
    build_ivf_index(emb, "vec_id", "embedding", idx, nlist=8, train_size=256)
    queries = emb.orderBy("vec_id").limit(2)
    df = query_ivf_index(spark, idx, queries, "vec_id", "embedding", k=3, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "list_id" in m.group(1), plan[:2000]
    # 2 queries x nprobe=2 probe at most 4 distinct lists of the 8
    sel = df.select("query_id").distinct().count()
    assert sel <= 2
