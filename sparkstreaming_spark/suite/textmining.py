"""Corpus mining: adjacent-token PMI collocations.

PMI (pointwise mutual information) over adjacent token pairs is the
classic collocation detector ("new york" scores high, "of the" scores
low) and a standard vocabulary-building signal for LLM tokenizer work.

Scale notes: the pair stream is one narrow explode of the token arrays
(no self-join); all marginals are derived FROM the aggregated pair
table (vocab-bounded), so the corpus is touched exactly once. Top-k is
orderBy+limit → TakeOrderedAndProject (k rows per partition cross the
wire).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import md5_64, tokenize
from ..sources.batch import read_table
from . import QuerySpec
from .llm import SQL_NORM, SQL_TOKS

PMI_MIN_COUNT = 5
PMI_TOP_K = 100


def q_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 adjacent-token collocations by PMI, min pair count 5.

    ln(c_ab * N / (c_a* * c_*b)) where the marginals are left/right
    occurrence totals of the SAME pair population — computed from the
    aggregated pair table, never a second corpus pass. Ordering is by
    the ROUNDED score (identical in both engines) with (w1, w2)
    tie-break, so the top-k frontier is deterministic."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(tokenize("text").alias("toks")).filter(F.size("toks") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks)-2), i -> "
                "struct(toks[i] AS w1, toks[i+1] AS w2))"
            )
        ).alias("pr")
    ).select("pr.w1", "pr.w2")
    # the aggregated pair table feeds FOUR consumers (filter, both
    # marginals, the scalar total) — persist it or the corpus explode
    # re-runs per consumer (measured 36s -> ~8s at 10x stress)
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt")).persist()
    lm = pc.groupBy("w1").agg(F.sum("cnt").alias("c1"))
    rm = pc.groupBy("w2").agg(F.sum("cnt").alias("c2"))
    n = pc.agg(F.sum("cnt").alias("n_pairs"))
    pmi = F.round(
        F.log((F.col("cnt") * F.col("n_pairs")) / (F.col("c1") * F.col("c2"))), 6
    )
    return (
        pc.filter(F.col("cnt") >= PMI_MIN_COUNT)
        .join(F.broadcast(lm), "w1")
        .join(F.broadcast(rm), "w2")
        .crossJoin(F.broadcast(n))
        .select("w1", "w2", "cnt", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(PMI_TOP_K)
    )


ORACLE_TOKEN_PMI = f"""
WITH t AS (
  SELECT doc_id, unnest({SQL_TOKS}) AS w,
         unnest(generate_series(1, len({SQL_TOKS}))) AS pos
  FROM documents WHERE {SQL_NORM} != ''
),
bg AS (
  SELECT w AS w1, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM t
),
b AS (SELECT w1, w2 FROM bg WHERE w2 IS NOT NULL),
pc AS (SELECT w1, w2, count(*) AS cnt FROM b GROUP BY 1, 2),
lm AS (SELECT w1, sum(cnt) AS c1 FROM pc GROUP BY 1),
rm AS (SELECT w2, sum(cnt) AS c2 FROM pc GROUP BY 1),
n AS (SELECT sum(cnt) AS n_pairs FROM pc)
SELECT w1, w2, cnt,
       round(ln((cnt * n_pairs) / (c1 * c2 * 1.0)), 6) AS pmi
FROM pc JOIN lm USING (w1) JOIN rm USING (w2) CROSS JOIN n
WHERE cnt >= {PMI_MIN_COUNT}
ORDER BY pmi DESC, w1, w2
LIMIT {PMI_TOP_K}
"""


QUERIES: dict[str, QuerySpec] = {
    "doc_token_pmi": QuerySpec(
        q_token_pmi,
        ORACLE_TOKEN_PMI,
        "adjacent-token PMI collocations (one corpus pass, TakeOrdered top-k)",
    ),
}


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability profile per language: words/sentence and
    a vowel-group syllable proxy feed the classic 206.835 − 1.015·wps −
    84.6·spw score. Every signal is a codegen'd regexp_count on the scan
    — zero Python, zero extra passes; the aggregate ships three doubles
    per language."""
    d = read_table(spark, sf_dir, "documents")
    words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    sentences = F.greatest(F.regexp_count("text", F.lit(r"[.!?]+")), F.lit(1))
    syll = F.greatest(
        F.regexp_count(F.lower("text"), F.lit("[aeiouy]+")), F.lit(1)
    )
    scored = d.filter(F.trim(F.col("text")) != "").select(
        "lang",
        (words / sentences).alias("wps"),
        (syll / words).alias("spw"),
    )
    flesch = F.lit(206.835) - F.lit(1.015) * F.col("wps") - F.lit(84.6) * F.col("spw")
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("wps"), 4).alias("avg_words_per_sentence"),
        F.round(F.avg(flesch), 4).alias("avg_flesch"),
    )


ORACLE_READABILITY = r"""
WITH s AS (
  SELECT lang,
         len(string_split_regex(trim(text), '\s+')) AS words,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS sentences,
         greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS syll
  FROM documents WHERE trim(text) != ''
)
SELECT lang, count(*) AS n_docs,
       round(avg(words * 1.0 / sentences), 4) AS avg_words_per_sentence,
       round(avg(206.835 - 1.015 * words / sentences - 84.6 * syll / words), 4)
         AS avg_flesch
FROM s GROUP BY lang
"""


KEYWORDS_PER_DOC = 3


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by tf·idf. One
    corpus explode builds the (doc, term, tf) table; document frequency
    is a vocab-sized aggregate broadcast back; ranking is a row_number
    window partitioned by doc (per-doc term lists are small, so the
    window sort is narrow). Scores are ROUNDED before ranking so the
    top-3 frontier is identical across engines."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokenize("text").alias("toks")).filter(
        F.size("toks") > 0
    )
    # tf feeds scoring + document frequency + the doc total — persist so
    # the corpus explode runs once, not per consumer
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = toks.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias(
                "tfidf"
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KEYWORDS_PER_DOC)
        .select("doc_id", "term", "tfidf", "rk")
    )


ORACLE_TFIDF_KEYWORDS = f"""
WITH t AS (
  SELECT doc_id, unnest({SQL_TOKS}) AS term
  FROM documents WHERE {SQL_NORM} != ''
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
scored AS (
  SELECT doc_id, term, round(tf * ln(n_docs * 1.0 / df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER
    (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
  FROM scored
)
SELECT doc_id, term, tfidf, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= {KEYWORDS_PER_DOC}
"""


QUERIES["doc_readability"] = QuerySpec(
    q_readability,
    ORACLE_READABILITY,
    "Flesch readability profile (codegen'd regexp counts, one pass)",
)
QUERIES["doc_tfidf_keywords"] = QuerySpec(
    q_tfidf_keywords,
    ORACLE_TFIDF_KEYWORDS,
    "per-doc top-3 tf-idf keywords (vocab broadcast, narrow doc window)",
)


HASH_DIM = 64


def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization: tokens map to a fixed HASH_DIM-bucket
    space by md5 (no vocabulary pass, no dictionary shuffle — the
    property that makes feature hashing THE text featurizer at corpus
    scale), then per-lang profile of the resulting sparse vectors:
    average distinct buckets hit (nnz) and the global top bucket. One
    explode + two hash aggregates."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", tokenize("text").alias("toks")).filter(
        F.size("toks") > 0
    )
    hashed = toks.select(
        "doc_id",
        "lang",
        F.explode("toks").alias("tok"),
    ).select(
        "doc_id",
        "lang",
        (md5_64(F.concat(F.lit("fh:"), F.col("tok"))) % HASH_DIM).alias("b"),
    )
    per_doc = hashed.groupBy("doc_id", "lang").agg(
        F.count_distinct("b").alias("nnz"),
        F.count(F.lit(1)).alias("n_toks"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("nnz"), 6).alias("avg_nnz"),
        F.round(F.avg(F.col("nnz") / F.col("n_toks")), 6).alias("avg_fill"),
        F.max("nnz").alias("max_nnz"),
    )


ORACLE_FEATURE_HASHING = f"""
WITH t AS (
  SELECT doc_id, lang, unnest({SQL_TOKS}) AS tok
  FROM documents WHERE {SQL_NORM} != ''
),
h AS (
  SELECT doc_id, lang,
         cast(('0x' || substr(md5('fh:' || tok), 1, 15)) AS bigint)
           % {HASH_DIM} AS b
  FROM t
),
per_doc AS (
  SELECT doc_id, lang, count(DISTINCT b) AS nnz, count(*) AS n_toks
  FROM h GROUP BY 1, 2
)
SELECT lang, count(*) AS n_docs,
       round(avg(nnz), 6) AS avg_nnz,
       round(avg(nnz * 1.0 / n_toks), 6) AS avg_fill,
       max(nnz) AS max_nnz
FROM per_doc GROUP BY lang
"""


QUERIES["doc_feature_hashing"] = QuerySpec(
    q_feature_hashing,
    ORACLE_FEATURE_HASHING,
    "hashing-trick featurization profile (no vocabulary pass)",
)


ZIPF_TOP = 500


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS slope of log(freq) on log(rank) over the top
    500 vocabulary terms (natural corpora sit near slope −1; synthetic /
    templated corpora deviate — a cheap corpus-health fingerprint).
    Vocabulary aggregate → distributed top-500 (`orderBy().limit()`
    compiles to TakeOrderedAndProject: per-partition partial top-k, one
    500-row merge — the full vocab table never single-task sorts) →
    rank window on those 500 rows → regr_slope/intercept/r2 as one
    aggregate."""
    d = read_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(tokenize("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    from pyspark.sql import Window

    top = vocab.orderBy(F.desc("freq"), "tok").limit(ZIPF_TOP)
    w = Window.orderBy(F.desc("freq"), "tok")
    ranked = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("lr"),
        F.log(F.col("freq").cast("double")).alias("lf"),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope("lf", "lr"), 6).alias("zipf_slope"),
        F.round(F.regr_intercept("lf", "lr"), 6).alias("zipf_intercept"),
        F.round(F.regr_r2("lf", "lr"), 6).alias("r2"),
    )


ORACLE_ZIPF = f"""
WITH t AS (
  SELECT unnest({SQL_TOKS}) AS tok FROM documents WHERE {SQL_NORM} != ''
),
vocab AS (SELECT tok, count(*) AS freq FROM t GROUP BY tok),
ranked AS (
  SELECT ln(row_number() OVER (ORDER BY freq DESC, tok) * 1.0) AS lr,
         ln(freq * 1.0) AS lf,
         row_number() OVER (ORDER BY freq DESC, tok) AS rk
  FROM vocab
)
SELECT count(*) AS n_terms,
       round(regr_slope(lf, lr), 6) AS zipf_slope,
       round(regr_intercept(lf, lr), 6) AS zipf_intercept,
       round(regr_r2(lf, lr), 6) AS r2
FROM ranked WHERE rk <= {ZIPF_TOP}
"""


QUERIES["doc_zipf_fit"] = QuerySpec(
    q_zipf_fit,
    ORACLE_ZIPF,
    "Zipf rank-frequency OLS fit (vocab aggregate; tiny rank window)",
)


MG_K = 50  # Misra-Gries counter budget per summary
MG_TOPN = 10


def q_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Misra-Gries heavy hitters over the token stream — the
    canonical bounded-memory frequent-items sketch, MERGEABLE per
    Agarwal et al., "Mergeable Summaries" (PODS 2012): each partition
    keeps k=50 counters (decrement-on-overflow), the ≤ k·#partitions
    summary rows collapse on the driver with the summary-merge rule
    (sum, then subtract the (k+1)-th largest and drop ≤0), and the
    guarantee — every token with true count > N/(k+1) survives — holds
    for the merged summary.

    Oracle contract: the verified output is the EXACT top-10 tokens
    (DuckDB-computable) plus `mg_guarantee_ok`, true iff the token is
    under the N/(k+1) threshold OR present in the merged MG candidate
    set — on this Zipfian corpus several tokens clear the threshold
    while partitions overflow their 50 counters, so a broken decrement
    or merge genuinely flips the boolean."""
    import pandas as pd

    from .llm import SQL_NORM, SQL_TOKS  # noqa: F401 (oracle twins)

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokenize("text")).alias("tok"))

    def partial_mg(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for t in pdf["tok"]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < MG_K:
                    counters[t] = 1
                else:  # decrement all; drop zeros (classic MG step)
                    drop = [w for w in counters if counters[w] == 1]
                    for w in counters:
                        counters[w] -= 1
                    for w in drop:
                        del counters[w]
        if counters:
            yield pd.DataFrame(
                {"tok": list(counters), "c": list(counters.values())}
            )

    summaries = toks.mapInPandas(partial_mg, "tok string, c long").collect()
    merged: dict[str, int] = {}
    for r in summaries:  # bounded: <= MG_K rows per partition
        merged[r["tok"]] = merged.get(r["tok"], 0) + int(r["c"])
    if len(merged) > MG_K:
        cut = sorted(merged.values(), reverse=True)[MG_K]
        merged = {t: c - cut for t, c in merged.items() if c - cut > 0}
    candidates = set(merged)

    exact = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = exact.agg(
        F.sum("cnt").alias("n"),
    )
    top = (
        exact.crossJoin(F.broadcast(total))
        .orderBy(F.desc("cnt"), "tok")
        .limit(MG_TOPN)
    )
    in_cand = F.col("tok").isin(*candidates) if candidates else F.lit(False)
    return top.select(
        "tok",
        "cnt",
        (
            (F.col("cnt") <= F.col("n") / (MG_K + 1)) | in_cand
        ).alias("mg_guarantee_ok"),
    )


ORACLE_HEAVY_HITTERS_MG = f"""
WITH t AS (
  SELECT unnest({SQL_TOKS}) AS tok FROM documents WHERE {SQL_NORM} != ''
),
exact AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok)
SELECT tok, cnt, TRUE AS mg_guarantee_ok
FROM exact ORDER BY cnt DESC, tok LIMIT {MG_TOPN}
"""


QUERIES["doc_heavy_hitters_mg"] = QuerySpec(
    q_heavy_hitters_mg,
    ORACLE_HEAVY_HITTERS_MG,
    "mergeable Misra-Gries heavy hitters: exact top-10 + guarantee contract",
)
