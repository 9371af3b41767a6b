"""sparkstreaming_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
the reference project Yahia-Ferchouli/SparkStreaming (a Scala/Spark 3.3
streaming-KPI pipeline; see SURVEY.md), rebuilt Spark-first:

- declarative DataFrame/SQL plans (Catalyst optimizes; no custom planner),
- Structured Streaming (no DStreams),
- built-in functions over UDFs; Arrow-vectorized Pandas UDFs where Python
  is genuinely required (vector math, multimodal decode),
- 100 TB-oriented defaults: AQE on, broadcast dimension joins, partial
  aggregation, partition-pruned parquet scans.

Layout:
    session       SparkSession factory (reference: SparkSessionTrait.scala)
    sources       batch + streaming readers (reference: Producer/Consumer)
    sinks         foreachBatch idempotent upsert, file sinks (Consumer kpi*)
    operators     relational ops: project/filter/agg/join/window/setops
    functions     scalar/text/vector/json function library
    streaming     KPI pipeline, producer-splitter, text reconstitution
    dedup         exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
    similarity    brute-force + LSH-bucketed cosine top-k
    textstats     language-ID, quality scoring, token counts, fingerprints
    multimodal    binary-column plumbing (decode stubs, real Spark plumbing)
    plans         explain/plan-inspection helpers
"""

__version__ = "0.1.0"
