"""Extension-point tests: custom Python Data Source partition fan-out and
determinism; UDTF null/empty handling. The bit-exact value checks live in
the oracle differential suite (suite/extensions.py entries)."""

from __future__ import annotations


def test_custom_source_partition_fanout(spark):
    """n_parts option must become n input partitions — that IS the
    parallel-ingest contract (each shard → one task)."""
    from sparkstreaming_spark.sources.custom import register_custom_sources

    register_custom_sources(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n_rows", 100)
        .option("n_parts", 7)
        .load()
    )
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 100


def test_custom_source_deterministic_across_layouts(spark):
    """Same seed ⇒ same corpus regardless of shard count (rows are keyed
    by doc_id, not by partition)."""
    from sparkstreaming_spark.sources.custom import register_custom_sources

    register_custom_sources(spark)

    def snapshot(parts: int):
        return {
            (r["doc_id"], r["text"])
            for r in spark.read.format("synthetic_docs")
            .option("n_rows", 50)
            .option("n_parts", parts)
            .load()
            .collect()
        }

    assert snapshot(1) == snapshot(5)


def test_custom_source_matches_local_generator(spark):
    """Executor-side rows equal the driver-side pure function — catches
    serialization/option-plumbing drift."""
    from sparkstreaming_spark.sources.custom import (
        DEFAULT_SEED,
        register_custom_sources,
        synth_text,
    )

    register_custom_sources(spark)
    rows = (
        spark.read.format("synthetic_docs")
        .option("n_rows", 20)
        .option("n_parts", 3)
        .load()
        .collect()
    )
    for r in rows:
        assert r["text"] == synth_text(DEFAULT_SEED, r["doc_id"])


def test_sentence_udtf_null_and_empty(spark):
    """NULL text yields no rows; punctuation-only text yields no rows;
    sent_idx counts only non-empty sentences."""
    from sparkstreaming_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "en", "One. Two two! ... Three three three?"),
         (2, "en", None),
         (3, "en", "!!!")],
        "doc_id long, lang string, text string",
    ).createOrReplaceTempView("udtf_edge")
    rows = spark.sql(
        "SELECT s.* FROM udtf_edge d, "
        "LATERAL sentence_split(d.doc_id, d.lang, d.text) s"
    ).collect()
    assert {r["doc_id"] for r in rows} == {1}
    got = {(r["sent_idx"], r["n_tokens"]) for r in rows}
    assert got == {(0, 1), (1, 2), (2, 3)}
