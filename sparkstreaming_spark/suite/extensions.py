"""Engine extension points, differentially verified: the custom Python
Data Source (sources/custom.py) and Python UDTFs (functions/udtfs.py).
Both run DETERMINISTIC logic (md5 arithmetic / regex splits) so the
DuckDB oracle checks the extension *plumbing* — partition fan-out,
schema, lateral row fan-out — bit-exactly, not just rows>0.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf can resolve deferred hints

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import md5_64
from ..sources.batch import read_table
from . import QuerySpec

SYNTH_ROWS = 2000
SYNTH_PARTS = 8
CHECK_MOD = 1000003


def q_custom_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the registered Python data source (8 shards → 8 tasks) and
    reduce to a per-bucket corpus checksum. sf_dir is unused — the
    source IS the table; the oracle regenerates it with SQL md5
    arithmetic."""
    from ..sources.custom import DEFAULT_SEED, register_custom_sources

    register_custom_sources(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n_rows", SYNTH_ROWS)
        .option("n_parts", SYNTH_PARTS)
        .option("seed", DEFAULT_SEED)
        .load()
    )
    return (
        df.select(
            (F.col("doc_id") % 10).alias("bucket"),
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
            (md5_64(F.col("text")) % CHECK_MOD).alias("h"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("h").alias("text_checksum"),
        )
    )


def _oracle_custom_datasource() -> str:
    from ..sources.custom import DEFAULT_SEED, VOCAB

    vocab = "[" + ", ".join(f"'{w}'" for w in VOCAB) + "]"
    md5i = (
        "cast(('0x' || substr(md5('{seed}:' || doc_id || ':' || i), 1, 15)) AS bigint)"
    ).format(seed=DEFAULT_SEED)
    md5len = (
        "cast(('0x' || substr(md5('{seed}:' || doc_id || ':len'), 1, 15)) AS bigint)"
    ).format(seed=DEFAULT_SEED)
    return rf"""
WITH ids AS (SELECT unnest(generate_series(0, {SYNTH_ROWS - 1})) AS doc_id),
sized AS (SELECT doc_id, 5 + {md5len} % 8 AS n FROM ids),
texts AS (SELECT doc_id, n,
                 array_to_string(
                   [{vocab}[({md5i} % {len(VOCAB)}) + 1]
                    for i in generate_series(0, n - 1)], ' ') AS text
          FROM sized)
SELECT doc_id % 10 AS bucket, count(*) AS n_docs,
       cast(sum(n) AS bigint) AS total_tokens,
       cast(sum(cast(('0x' || substr(md5(text), 1, 15)) AS bigint) % {CHECK_MOD})
            AS bigint) AS text_checksum
FROM texts GROUP BY bucket
"""


def q_sentences_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF through the SQL surface: LATERAL sentence_split over
    documents, reduced per lang. Covers registration, lateral join, and
    1→N fan-out of the UDTF path."""
    from ..functions.udtfs import register_udtfs

    register_udtfs(spark)
    # The sf0.1 corpus is ONE parquet row group → one scan task → one
    # Python UDTF worker; repartition(8) parallelizes the Python stage
    # for a sub-MB shuffle. At production scale the scan already yields
    # many splits and the repartition simply rebalances them across the
    # UDTF workers (Python is the bottleneck stage, not the exchange).
    read_table(spark, sf_dir, "documents").repartition(8).createOrReplaceTempView(
        "docs_udtf"
    )
    return spark.sql(
        """
        SELECT s.lang, count(*) AS n_sentences,
               cast(sum(s.n_tokens) AS bigint) AS total_tokens,
               cast(max(s.sent_idx) AS int) AS max_sent_idx
        FROM docs_udtf d, LATERAL sentence_split(d.doc_id, d.lang, d.text) s
        GROUP BY s.lang
        """
    )


ORACLE_SENTENCES = r"""
WITH per_doc AS (
  SELECT doc_id, lang,
         list_filter(
           list_transform(string_split_regex(text, '[.!?]+'), x -> trim(x)),
           x -> x != '') AS sents
  FROM documents
)
SELECT lang,
       cast(sum(len(sents)) AS bigint) AS n_sentences,
       cast(sum(coalesce(list_sum(
              list_transform(sents, x -> len(string_split_regex(x, '\s+')))), 0))
            AS bigint) AS total_tokens,
       cast(max(CASE WHEN len(sents) > 0 THEN len(sents) - 1 END) AS int) AS max_sent_idx
FROM per_doc GROUP BY lang
HAVING sum(len(sents)) > 0
"""


def q_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row provenance via the hidden `_metadata` scan column: write orders
    partitioned by status, read back, and account for every row by the
    partition directory its file lives in — the audit/lineage primitive
    (which files contributed which rows) a curation pipeline must answer
    at 100 TB. `_metadata.file_path` is populated by the scan itself (no
    extra IO); the partition value is recovered from the path, so the
    check also pins partitioned-layout round-tripping. The oracle is the
    same accounting straight off the table."""
    import tempfile

    out = tempfile.mkdtemp(prefix="prov_") + "/orders"
    orders = read_table(spark, sf_dir, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.select(
            F.regexp_extract(
                F.col("_metadata.file_path"), r"o_orderstatus=([^/]+)/", 1
            ).alias("status_dir"),
            "o_totalprice",
        )
        .groupBy("status_dir")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


ORACLE_FILE_PROVENANCE = """
SELECT o_orderstatus AS status_dir, count(*) AS cnt,
       round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY 1
"""


QUERIES: dict[str, QuerySpec] = {
    "src_file_provenance": QuerySpec(
        q_file_provenance,
        ORACLE_FILE_PROVENANCE,
        "row provenance via hidden _metadata column over partitioned layout",
    ),
    "src_custom_datasource": QuerySpec(
        q_custom_datasource,
        _oracle_custom_datasource(),
        "Python Data Source API (partitioned custom reader, bit-exact)",
    ),
    "doc_sentences_udtf": QuerySpec(
        q_sentences_udtf,
        ORACLE_SENTENCES,
        "Python UDTF via LATERAL (registration + 1→N fan-out)",
    ),
}


def q_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate via a GROUPED_AGG pandas UDF (the UDAF extension
    point): per event_type, the value-weighted mean hour-of-day — an
    aggregate Spark has no builtin for in this weighted form. Arrow ships
    each group's columns as one batch; the UDF is a two-reduction
    vectorized kernel (sum(w*x)/sum(w)), so the only shuffle is the
    groupBy hash exchange — same plan shape as a native aggregate.
    (For 100 TB note: GROUPED_AGG is not partial-aggregated — each
    group's rows all reach one task. Fine for bounded groups like
    event_type; for high-cardinality skewless aggs prefer expressing the
    kernel as built-in sums, which THIS kernel deliberately mirrors so
    the DuckDB oracle can verify the plumbing bit-exactly.)"""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_mean(x: pd.Series, w: pd.Series) -> float:
        sw = int(w.sum())
        return float(int((x * w).sum()) / sw) if sw else 0.0

    # GROUPED_AGG UDFs can't mix with native aggregates in one agg()
    # (INVALID_PANDAS_UDF_PLACEMENT) — so the row count is a UDF too
    @pandas_udf("long")
    def group_count(x: pd.Series) -> int:
        return len(x)

    ev = read_table(spark, sf_dir, "events")
    # integer weights (value in cents): the weighted sums are then exact
    # int64 arithmetic in BOTH engines — no float accumulation-order risk
    keyed = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("hr"),
        F.round(F.col("value") * 100, 0).cast("long").alias("w"),
    )
    return keyed.groupBy("event_type").agg(
        (F.floor(weighted_mean("hr", "w") * 1e6 + F.lit(0.5)) / 1e6).alias(
            "w_mean_hour"
        ),
        group_count("hr").alias("n"),
    )


ORACLE_GROUPED_AGG_UDAF = """
WITH keyed AS (
  SELECT event_type, hour(ts) AS hr,
         CAST(round(value * 100, 0) AS bigint) AS w
  FROM events
)
SELECT event_type,
       floor(sum(hr * w) * 1.0 / sum(w) * 1e6 + 0.5) / 1e6 AS w_mean_hour,
       count(*) AS n
FROM keyed GROUP BY 1
"""


def q_arrow_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow extension point (one level below mapInPandas: raw
    RecordBatches, no pandas conversion): per-vector L2 norm computed by
    a NumPy kernel reading the Arrow list column zero-copy (flatten +
    offsets reshape). Oracle recomputes the same norm in SQL — verifying
    the Arrow batch plumbing bit-exactly. Narrow map, no shuffle."""
    import pyarrow as pa
    import numpy as np

    def norms(batches):
        for batch in batches:
            ids = batch.column("vec_id")
            emb = batch.column("embedding")
            flat = emb.flatten().to_numpy(zero_copy_only=False).astype("float64")
            offs = np.asarray(emb.offsets)
            lens = np.diff(offs)
            # vectors are fixed-dim; reshape via the common length
            dim = int(lens[0]) if len(lens) else 0
            if dim and (lens == dim).all():
                n = np.sqrt((flat.reshape(-1, dim) ** 2).sum(axis=1))
            else:  # ragged fallback
                n = np.array(
                    [np.sqrt((flat[a:b] ** 2).sum()) for a, b in zip(offs, offs[1:])]
                )
            n = np.floor(n * 1e6 + 0.5) / 1e6
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(n, type=pa.float64())], ["vec_id", "l2_norm"]
            )

    emb = read_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", "embedding").mapInArrow(
        norms, schema="vec_id bigint, l2_norm double"
    )


ORACLE_ARROW_NORMS = """
SELECT vec_id,
       floor(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
             * 1e6 + 0.5) / 1e6 AS l2_norm
FROM embeddings
"""


QUERIES.update(
    {
        "udf_grouped_agg": QuerySpec(
            q_grouped_agg_udaf,
            ORACLE_GROUPED_AGG_UDAF,
            "GROUPED_AGG pandas UDF (UDAF surface): exact-int weighted mean",
        ),
        "src_arrow_batches": QuerySpec(
            q_arrow_norms,
            ORACLE_ARROW_NORMS,
            "mapInArrow zero-copy batch kernel (L2 norms, oracle-exact)",
        ),
    }
)


def q_scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR pandas UDF surface (the remaining UDF extension point next
    to GROUPED_AGG / mapInPandas / mapInArrow): a vectorized
    NumPy/pandas kernel applied per Arrow batch inside the projection —
    here a numerically-careful log1p-of-expm1 "softplus distance"
    between value and its cent-rounding, something with an exact SQL
    twin so the Arrow plumbing is oracle-verified bit-for-bit.

    100 TB note: a scalar pandas UDF keeps batches columnar
    (Arrow-vectorized, ~10-100x over row UDFs) but still breaks
    whole-stage codegen and ships data to Python workers — the suite
    uses it ONLY where NumPy-grade kernels are genuinely needed; this
    query exists to pin the surface itself."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cent_gap(v: pd.Series) -> pd.Series:
        cents = np.floor(v.to_numpy() * 100.0) / 100.0
        return pd.Series(np.round((v.to_numpy() - cents) * 10000.0, 4))

    ev = read_table(spark, sf_dir, "events")
    return (
        ev.select("event_type", cent_gap("value").alias("gap_bp"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("gap_bp"), 4).alias("avg_gap_bp"),
            F.round(F.max("gap_bp"), 4).alias("max_gap_bp"),
        )
    )


ORACLE_SCALAR_UDF = """
WITH g AS (
  SELECT event_type,
         round((value - floor(value * 100) / 100) * 10000, 4) AS gap_bp
  FROM events
)
SELECT event_type,
       round(avg(gap_bp), 4) AS avg_gap_bp,
       round(max(gap_bp), 4) AS max_gap_bp
FROM g GROUP BY event_type
"""


def q_file_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping effectiveness report: per-file min/max/rowcount for
    the predicate columns, derived from the hidden `_metadata.file_path`
    — the information a 100 TB table's footer-pruning decisions are made
    from. tests/test_maintenance.py pins this data-derived frame equal
    to the ACTUAL parquet footer statistics via pyarrow on a multi-file
    layout; here the oracle recomputes it with DuckDB's filename
    projection."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "value",
        "user_id",
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias("file"),
    )
    return ev.groupBy("file").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
    )


# the driver oracle sees pre-registered VIEWS (no file paths); testdata
# tables are single parquet files, so the filename is a literal here —
# the multi-file footer-parity check lives in tests/test_maintenance.py
ORACLE_FILE_SKIPPING = """
SELECT 'events.parquet' AS file,
       count(*) AS n_rows,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value,
       min(user_id) AS min_user,
       max(user_id) AS max_user
FROM events
"""


QUERIES.update(
    {
        "udf_scalar_pandas": QuerySpec(
            q_scalar_pandas_udf,
            ORACLE_SCALAR_UDF,
            "scalar pandas UDF surface (Arrow-vectorized projection kernel)",
        ),
        "src_file_skipping_stats": QuerySpec(
            q_file_skipping_stats,
            ORACLE_FILE_SKIPPING,
            "per-file pruning stats from _metadata (footer-parity pinned by test)",
        ),
    }
)


BINARY_FILE_DOCS = 50


def q_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`binaryFile` source — the multimodal ingest path: raw files on
    disk become (path, length, content) rows that feed the blob
    operators. The query materializes a deterministic file tree from the
    first 50 documents (tiny, driver-written test fixture), ingests it
    back via format("binaryFile"), and emits (doc_id, n_bytes, md5) —
    which the oracle recomputes straight from the documents table, so
    the ingest path is verified byte-for-byte.

    100 TB note: binaryFile scales by files (each file one row/split;
    maxPartitionBytes groups small ones); the driver-side write here is
    fixture setup, not the operator."""
    import os
    import tempfile

    d = read_table(spark, sf_dir, "documents")
    rows = (
        d.select("doc_id", "text")
        .filter(F.col("doc_id") < BINARY_FILE_DOCS)
        .collect()
    )
    out = tempfile.mkdtemp(prefix="binfiles_")
    for r in rows:
        with open(os.path.join(out, f"doc_{r.doc_id}.bin"), "wb") as fh:
            fh.write(r.text.encode("utf-8"))
    blobs = spark.read.format("binaryFile").load(out)
    return blobs.select(
        F.regexp_extract(
            F.element_at(F.split("path", "/"), -1), r"doc_(\d+)\.bin", 1
        )
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("md5"),
    )


ORACLE_BINARY_FILES = f"""
SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS md5
FROM documents WHERE doc_id < {BINARY_FILE_DOCS}
"""


QUERIES.update(
    {
        "src_binary_files": QuerySpec(
            q_binary_files,
            ORACLE_BINARY_FILES,
            "binaryFile multimodal ingest (round-trip md5-verified)",
        ),
    }
)


GEN_N = 100_000
GEN_CATS = 10


def q_synthetic_generator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable synthetic-data generation — the dbgen pattern:
    spark.range(N) is a parallel, shuffle-free source (each task emits
    its id slice), and every column derives from the id by the
    engine-wide md5 convention, so ANY scale factor is reproducible
    bit-for-bit with zero coordination (this is how you fabricate a
    100 TB test table without moving one). Output is the per-category
    profile so the oracle verifies the whole derivation."""
    from ..functions.text import md5_64

    ids = spark.range(GEN_N)
    cat = (md5_64(F.concat(F.lit("gen-cat:"), F.col("id").cast("string")))
           % GEN_CATS)
    val = (
        md5_64(F.concat(F.lit("gen-val:"), F.col("id").cast("string")))
        % 1_000_000
    ) / 1_000_000.0
    rows = ids.select(cat.alias("cat"), val.alias("val"))
    return rows.groupBy("cat").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("val"), 6).alias("avg_val"),
        F.round(F.min("val"), 6).alias("min_val"),
        F.round(F.max("val"), 6).alias("max_val"),
    )


ORACLE_SYNTHETIC = f"""
WITH g AS (
  SELECT cast(('0x' || substr(md5('gen-cat:' || cast(id AS varchar)), 1, 15))
              AS bigint) % {GEN_CATS} AS cat,
         (cast(('0x' || substr(md5('gen-val:' || cast(id AS varchar)), 1, 15))
               AS bigint) % 1000000) / 1000000.0 AS val
  FROM range({GEN_N}) AS t(id)
)
SELECT cat, count(*) AS n,
       round(avg(val), 6) AS avg_val,
       round(min(val), 6) AS min_val,
       round(max(val), 6) AS max_val
FROM g GROUP BY cat
"""


QUERIES.update(
    {
        "gen_synthetic_profile": QuerySpec(
            q_synthetic_generator,
            ORACLE_SYNTHETIC,
            "shuffle-free deterministic data generation (range + hash columns)",
        ),
    }
)


def _dpp_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Write events hive-partitioned by event_type once per sf_dir —
    the layout dynamic partition pruning needs."""
    import os

    base = os.path.basename(sf_dir.rstrip("/")) or "sf"
    out = f"/tmp/dpp_events_{base}"
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(out)
        )
    return out


DPP_VALUE_THRESHOLD = 50.0


def q_partition_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning end to end — THE 100 TB fact-dim join
    optimization: the fact table is stored hive-partitioned by
    event_type; the dimension side (per-type engagement profile) carries
    a selective literal filter whose SURVIVING KEYS are only known at
    runtime, and Catalyst injects a dynamicpruning subquery into the
    fact SCAN, so only the surviving types' directories are read at all.

    Catalyst caveat worth the docstring: PartitionPruning only fires
    when the dim-side filter `isLikelySelective` — a comparison against
    a LITERAL. An attribute-vs-attribute predicate (e.g. type_avg >
    overall_avg via a scalar cross join) is never classified selective
    and silently gets no DPP; keep runtime-dim thresholds literal. The
    plan assertion lives in tests/test_scale_patterns.py; the oracle
    checks the values."""
    part_dir = _dpp_fixture(spark, sf_dir)
    fact = spark.read.parquet(part_dir)
    ev = read_table(spark, sf_dir, "events")
    profile = ev.groupBy("event_type").agg(
        F.avg("value").alias("type_avg")
    )
    dim = profile.filter(F.col("type_avg") > DPP_VALUE_THRESHOLD)
    return (
        fact.join(F.broadcast(dim), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


ORACLE_PARTITION_PRUNED_JOIN = f"""
WITH profile AS (
  SELECT event_type, avg(value) AS type_avg FROM events GROUP BY 1
),
dim AS (SELECT event_type FROM profile
        WHERE type_avg > {DPP_VALUE_THRESHOLD})
SELECT e.event_type, count(*) AS n_events,
       round(sum(e.value), 2) AS total_value
FROM events e JOIN dim USING (event_type)
GROUP BY e.event_type
"""


QUERIES["src_partition_pruned_join"] = QuerySpec(
    q_partition_pruned_join,
    ORACLE_PARTITION_PRUNED_JOIN,
    "dynamic partition pruning: runtime dim filter prunes fact directories",
)
