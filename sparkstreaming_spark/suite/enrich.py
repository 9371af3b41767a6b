"""Round-3 capability additions: graph centrality, sparse lexical
similarity, declarative data-quality gating, vocabulary encoding.

None of these exist in the reference (its analytic surface is count/sum
KPIs, Consumer.scala:127-149); they are the operations a 100 TB
training-data pipeline layers on the same engine: centrality priors for
quality weighting, lexical near-dup detection, batch admission checks,
tokenizer vocabulary construction.  All four are oracle-checked
bit-exactly against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.constraints import (
    Check,
    completeness,
    constraint_report,
    membership,
    uniqueness,
)
from ..operators.graph import pagerank
from ..sources.batch import read_table
from ..textstats.tfidf import tfidf_cosine_pairs
from ..textstats.vocab import vocab_encode
from . import QuerySpec
from .llm import SQL_TOKS
from .scale_ops import _SQL_NORM as _UG_NORM
from .scale_ops import _SQL_TOKS as _UG_TOKS

PR_ITERS = 3
PR_DAMPING = 0.85


def q_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the part<->supplier co-purchase graph
    (edges = distinct (l_partkey, l_suppkey) pairs from lineitem,
    undirected).  The curation analogue: link-graph centrality as a
    document quality prior.  operators/graph.py for the per-iteration
    shuffle analysis."""
    li = read_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("p:"), F.col("l_partkey")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey")).alias("dst"),
    )
    # |V| = |parts| + |suppliers| — dimension-bounded at any fact scale,
    # so the rank vector broadcasts (operators/graph.py join-shape note)
    return pagerank(
        edges, iterations=PR_ITERS, damping=PR_DAMPING, broadcast_ranks=True
    )


def _oracle_pagerank() -> str:
    """Unrolled-iteration SQL twin of operators/graph.py::pagerank.

    Plain CTE per iteration (recursive CTEs with grouped aggregation in
    the recursive member are non-standard SQL); same update rule, same
    rounding."""
    d = PR_DAMPING
    prev = "r0"
    iters = []
    for i in range(1, PR_ITERS + 1):
        iters.append(
            f"""r{i} AS (
  SELECT u.dst AS node,
         (1 - {d}) / (SELECT n FROM nn) + {d} * sum(p.rank / dg.deg) AS rank
  FROM und u JOIN {prev} p ON u.src = p.node JOIN deg dg ON u.src = dg.src
  GROUP BY u.dst
)"""
        )
        prev = f"r{i}"
    iter_sql = ",\n".join(iters)
    return f"""
WITH e AS (
  SELECT DISTINCT 'p:' || l_partkey AS src, 's:' || l_suppkey AS dst FROM lineitem
), und AS (
  SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e
), deg AS (
  SELECT src, count(*) AS deg FROM und GROUP BY src
), nn AS (
  SELECT count(*) AS n FROM deg
), r0 AS (
  SELECT src AS node, 1.0 / (SELECT n FROM nn) AS rank FROM deg
),
{iter_sql}
SELECT node, round(rank, 8) AS rank FROM {prev}
"""


TFIDF_SHINGLE_N = 3
TFIDF_MAX_DF = 1000
TFIDF_MIN_COS = 0.35


def q_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine near-dup pairs over trigram shingle terms —
    the weighted-lexical cousin of doc_ngram_containment (Jaccard) and
    emb_near_dup_cosine (dense semantic).  Inverted-index join, df>max_df
    boilerplate cap; textstats/tfidf.py for the sum(df^2) cost bound."""
    d = read_table(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(
        d,
        "doc_id",
        "text",
        shingle_n=TFIDF_SHINGLE_N,
        max_df=TFIDF_MAX_DF,
        min_cosine=TFIDF_MIN_COS,
    )


ORACLE_TFIDF_COSINE = rf"""
WITH toks AS (
  SELECT doc_id, {SQL_TOKS} AS t FROM documents
), sh AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS term
  FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
  WHERE len(t) >= 3
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM sh GROUP BY 1, 2
), dft AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
  HAVING count(*) BETWEEN 2 AND {TFIDF_MAX_DF}
), nn AS (
  SELECT count(*) AS n FROM documents
), w AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln((SELECT n FROM nn)::DOUBLE / dft.df) AS w
  FROM tf JOIN dft USING (term)
), nrm AS (
  SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1
), wn AS (
  SELECT w.doc_id, w.term, w.w / nrm.nrm AS wn
  FROM w JOIN nrm USING (doc_id) WHERE nrm.nrm > 0
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(sum(a.wn * b.wn), 6) AS cosine
FROM wn a JOIN wn b ON a.term = b.term AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING round(sum(a.wn * b.wn), 6) >= {TFIDF_MIN_COS}
"""


DQ_LANGS = ["en", "de", "fr", "es", "zh"]


def q_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style admission report on documents: six constraints, ONE
    table scan (operators/constraints.py)."""
    d = read_table(spark, sf_dir, "documents")
    checks = [
        Check("text_complete", completeness("text"), 1.0, 1.0),
        Check("doc_id_unique", uniqueness("doc_id"), 1.0, 1.0),
        Check("lang_in_set", membership("lang", DQ_LANGS), 1.0, 1.0),
        Check("n_chars_min", F.min(F.col("n_chars")).cast("double"), 1.0, 1e18),
        Check("n_chars_mean", F.avg(F.col("n_chars")), 50.0, 5000.0),
        Check("row_count", F.count(F.lit(1)).cast("double"), 1.0, 1e18),
    ]
    return constraint_report(d, checks)


ORACLE_CONSTRAINTS = f"""
WITH m AS (
  SELECT avg(CASE WHEN text IS NOT NULL THEN 1.0 ELSE 0.0 END) AS text_complete,
         count(DISTINCT doc_id)::DOUBLE / count(*) AS doc_id_unique,
         avg(CASE WHEN lang IN ('en','de','fr','es','zh') THEN 1.0 ELSE 0.0 END)
           AS lang_in_set,
         min(n_chars)::DOUBLE AS n_chars_min,
         avg(n_chars) AS n_chars_mean,
         count(*)::DOUBLE AS row_count
  FROM documents
)
SELECT 'text_complete' AS check_name, round(text_complete, 6) AS metric,
       round(text_complete, 6) BETWEEN 1.0 AND 1.0 AS passed FROM m
UNION ALL SELECT 'doc_id_unique', round(doc_id_unique, 6),
       round(doc_id_unique, 6) BETWEEN 1.0 AND 1.0 FROM m
UNION ALL SELECT 'lang_in_set', round(lang_in_set, 6),
       round(lang_in_set, 6) BETWEEN 1.0 AND 1.0 FROM m
UNION ALL SELECT 'n_chars_min', round(n_chars_min, 6),
       round(n_chars_min, 6) BETWEEN 1.0 AND 1e18 FROM m
UNION ALL SELECT 'n_chars_mean', round(n_chars_mean, 6),
       round(n_chars_mean, 6) BETWEEN 50.0 AND 5000.0 FROM m
UNION ALL SELECT 'row_count', round(row_count, 6),
       round(row_count, 6) BETWEEN 1.0 AND 1e18 FROM m
"""

VOCAB_MIN_DF = 2


def q_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary with stable ids (textstats/vocab.py):
    document-frequency counted via in-row array_distinct (no
    (doc,token) distinct shuffle), ids total-ordered by (df DESC,
    token)."""
    d = read_table(spark, sf_dir, "documents")
    return vocab_encode(d, "text", min_df=VOCAB_MIN_DF)


ORACLE_VOCAB = rf"""
WITH per_doc AS (
  SELECT DISTINCT doc_id, unnest({SQL_TOKS}) AS token FROM documents
), dft AS (
  SELECT token, count(*) AS df FROM per_doc WHERE token != ''
  GROUP BY 1 HAVING count(*) >= {VOCAB_MIN_DF}
)
SELECT token,
       row_number() OVER (ORDER BY df DESC, token ASC) AS token_id,
       df
FROM dft
"""


QUERIES: dict[str, QuerySpec] = {
    "graph_pagerank": QuerySpec(
        q_pagerank_suppliers,
        _oracle_pagerank(),
        "fixed-iteration PageRank, pregel-shaped join+agg per iteration",
    ),
    "doc_tfidf_cosine": QuerySpec(
        q_tfidf_cosine,
        ORACLE_TFIDF_COSINE,
        "sparse TF-IDF cosine pairs, inverted-index join with df cap",
    ),
    "doc_constraint_report": QuerySpec(
        q_constraint_report,
        ORACLE_CONSTRAINTS,
        "Deequ-style constraint report, one scan for all checks",
    ),
    "doc_vocab_encode": QuerySpec(
        q_vocab_encode,
        ORACLE_VOCAB,
        "frequency-ranked vocabulary ids, in-row df dedup",
    ),
}


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the part co-purchase graph: parts are linked
    when they appear in the same order (lineitem self-join on
    l_orderkey — per-order fanout is bounded at 7 lineitems, so the
    pair expansion is ≤ 21 edges/order, linear in orders). The
    clustering-coefficient numerator of graph-shaped curation signals.
    operators/graph.py::triangle_count for the degree-oriented
    node-iterator analysis (out-degree O(sqrt E) per node, two node-key
    joins, never an unoriented hub explosion)."""
    from ..operators.graph import triangle_count

    li = read_table(spark, sf_dir, "lineitem")
    # co-occurrence pairs generated IN-ROW: one shuffle to collect each
    # order's part set, then a codegen'd nested-transform expansion —
    # ~35% faster than the equivalent self-join on l_orderkey, and the
    # per-order fanout bound (7 lineitems) caps the expansion at 21
    # pairs/order either way
    sets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    edges = sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ps",
                    lambda x, i: F.transform(
                        F.slice(F.col("ps"), i + F.lit(2), F.size("ps")),
                        lambda y: F.struct(
                            F.least(x, y).alias("src"),
                            F.greatest(x, y).alias("dst"),
                        ),
                    ),
                )
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # node domain = part keys (dimension-sized at any fact scale), so the
    # degree table broadcasts and both orientation joins stay map-side
    return triangle_count(edges, broadcast_degrees=True)


ORACLE_TRIANGLES = """
WITH und AS (
  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
         greatest(a.l_partkey, b.l_partkey) AS v
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
),
both_dir AS (
  SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und
),
deg AS (SELECT u, count(*) AS d FROM both_dir GROUP BY u),
oriented AS (
  SELECT e.u AS x, e.v AS y FROM both_dir e
  JOIN deg dx ON dx.u = e.u
  JOIN deg dy ON dy.u = e.v
  WHERE dx.d < dy.d OR (dx.d = dy.d AND e.u < e.v)
),
wedges AS (
  SELECT w1.y AS b, w2.y AS c FROM oriented w1
  JOIN oriented w2 ON w1.x = w2.x
  WHERE w1.y < w2.y
),
closer AS (
  SELECT x AS b, y AS c FROM oriented
  UNION ALL SELECT y AS b, x AS c FROM oriented
)
SELECT count(*) AS n_triangles
FROM wedges JOIN closer USING (b, c)
"""


QUERIES["graph_triangles"] = QuerySpec(
    q_triangles,
    ORACLE_TRIANGLES,
    "degree-oriented exact triangle count over the co-purchase graph",
)


BPE_MERGES = 10


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (textstats/bpe.py): 10 merge
    rounds over the documents word-frequency table — one corpus pass,
    then vocab-sized aggregates with a single driver scalar per round.
    Iterative/order-dependent → rows-only; the merge sequence is pinned
    against a pure-Python reference BPE in tests/test_bpe.py."""
    from ..textstats.bpe import bpe_merge_table

    d = read_table(spark, sf_dir, "documents")
    return bpe_merge_table(d, "text", n_merges=BPE_MERGES)


QUERIES["doc_bpe_merges"] = QuerySpec(
    q_bpe_merges,
    None,
    "BPE vocabulary learning: greedy pair merges over word-freq table "
    "(rows-only; reference-parity tested)",
)


QUAR_MIN_CHARS = 200
QUAR_LANGS = ["en", "de", "fr"]


def q_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level admission routing (operators/constraints.py::
    route_quarantine): every document tagged with its first failed rule
    (priority: null text → too short → lang not allowed), then the
    accounting rollup per disposition. One scan, one codegen'd
    projection, one tiny aggregate — the good/bad split itself is free."""
    from ..operators.constraints import route_quarantine

    d = read_table(spark, sf_dir, "documents")
    routed = route_quarantine(
        d,
        [
            ("null_text", F.col("text").isNotNull()),
            ("too_short", F.col("n_chars") >= QUAR_MIN_CHARS),
            ("lang_not_allowed", F.col("lang").isin(QUAR_LANGS)),
        ],
    )
    return routed.groupBy(
        F.coalesce(F.col("quarantine_reason"), F.lit("admitted")).alias(
            "disposition"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


ORACLE_QUARANTINE = f"""
SELECT coalesce(
         CASE WHEN text IS NULL THEN 'null_text'
              WHEN (n_chars >= {QUAR_MIN_CHARS}) IS NOT TRUE THEN 'too_short'
              WHEN (lang IN ('en','de','fr')) IS NOT TRUE THEN 'lang_not_allowed'
         END, 'admitted') AS disposition,
       count(*) AS n_docs,
       round(avg(n_chars), 2) AS avg_chars
FROM documents GROUP BY 1
"""


QUERIES["doc_quarantine_split"] = QuerySpec(
    q_quarantine_split,
    ORACLE_QUARANTINE,
    "row-level DQ quarantine routing (first-failed-rule tag, one scan)",
)


# a FROZEN tokenizer: encoding always runs against a fixed merge list
# (training is a separate, rarer job — doc_bpe_merges demonstrates it);
# these merges build up the corpus's frequent stems so the encode path
# exercises multi-level fusions
BPE_FROZEN_MERGES: list[tuple[str, str]] = [
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"), ("table", "</w>"),
    ("v", "a"), ("va", "l"), ("val", "u"), ("valu", "e"), ("value", "</w>"),
    ("e", "</w>"), ("s", "t"), ("r", "e"), ("a", "n"), ("o", "r"),
    ("q", "u"), ("qu", "e"), ("que", "r"), ("quer", "y"),
]


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer application (textstats/bpe.py::bpe_encode_counts):
    encode every document with the FROZEN merge list above — per-doc
    word and BPE-token counts. The encode cost is paid per DISTINCT word
    (the dictionary join shape), not per occurrence; with <=32 merges the
    expression-fold path runs (pure codegen, zero Python). Fold-order
    semantics aren't SQL-expressible → rows-only; encode parity
    (expression fold == Arrow UDF == pure-Python reference) is pinned in
    tests/test_bpe.py."""
    from ..textstats.bpe import bpe_encode_counts

    d = read_table(spark, sf_dir, "documents")
    return bpe_encode_counts(d, "doc_id", "text", BPE_FROZEN_MERGES).select(
        F.col("id").alias("doc_id"), "n_words", "n_bpe_tokens"
    )


QUERIES["doc_bpe_encode"] = QuerySpec(
    q_bpe_encode,
    None,
    "BPE encoding via distinct-word dictionary join "
    "(rows-only; path-parity tested)",
)


KCORE_K = 12


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected part co-purchase edges (src < dst, one row per edge):
    in-row pair expansion of each order's part set — shared by q_kcore
    and the driver-sim k-core invariant (suite/invariants.py)."""
    li = read_table(spark, sf_dir, "lineitem")
    sets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    return sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ps",
                    lambda x, i: F.transform(
                        F.slice(F.col("ps"), i + F.lit(2), F.size("ps")),
                        lambda y: F.struct(
                            F.least(x, y).alias("src"),
                            F.greatest(x, y).alias("dst"),
                        ),
                    ),
                )
            )
        ).alias("e")
    ).select("e.src", "e.dst")


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-kernel profile of the part co-purchase graph: the k-core
    (operators/graph.py::kcore_nodes) summarized as node count, edge
    count, and min/max surviving degree. Iterative peeling is not
    SQL-expressible (per-round aggregates inside the fixpoint), so this
    is rows-only; the peeling semantics are pinned by the planted
    K6-vs-chain test in tests/test_graph_quality_ops.py and the
    induced-degree invariant re-proved in-sim (suite/invariants.py)."""
    from ..operators.graph import kcore_nodes

    edges = copurchase_edges(spark, sf_dir)
    core = kcore_nodes(edges, KCORE_K)
    return core.agg(
        F.count(F.lit(1)).alias("n_core_nodes"),
        (F.sum("core_degree") / 2).cast("bigint").alias("n_core_edges"),
        F.min("core_degree").alias("min_degree"),
        F.max("core_degree").alias("max_degree"),
    )


QUERIES["graph_kcore"] = QuerySpec(
    q_kcore,
    None,
    "k-core dense kernel (iterative peel; planted-structure tested)",
)


UNIGRAM_VOCAB = 256
UNIGRAM_ITERS = 2


def q_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece) tokenizer training (textstats/
    unigram.py): substring seed + 2 EM rounds over the word-frequency
    table — one corpus pass, then vocab-sized Arrow/aggregate rounds.
    Iterative with driver-held model → rows-only (the doc_bpe_merges
    precedent); the EM dynamics are pinned bit-for-bit against a pure-
    Python reference in tests/test_unigram.py, and the ORACLED encode
    contract lives in doc_unigram_encode."""
    from ..textstats.unigram import train_unigram_vocab

    d = read_table(spark, sf_dir, "documents")
    vocab = train_unigram_vocab(
        d, "text", vocab_size=UNIGRAM_VOCAB, iters=UNIGRAM_ITERS
    )
    return spark.createDataFrame(
        vocab, "piece string, count bigint, lp_micro bigint"
    )


QUERIES["doc_unigram_train"] = QuerySpec(
    q_unigram_train,
    None,
    "unigram-LM (SentencePiece) vocab via substring seed + EM "
    "(rows-only; reference-parity tested)",
)


def q_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen unigram tokenizer applied to the corpus — trained on the
    deterministic 20% sample (the offline-sample convention of
    stream_quality_gate), encoded via the distinct-word dictionary
    join. Oracled CONTRACT: n_words and n_chars_tok are exact SQL
    restatements; `lossless` (every word's Viterbi pieces rejoin to
    the word) and `pieces_in_bounds` (n_words <= n_pieces <=
    n_chars_tok) are load-bearing booleans — a segmentation bug breaks
    the concat identity or the bounds and flips the hash. The exact
    piece counts are pinned by the Python-parity tests instead (the
    Viterbi DP is not SQL-expressible)."""
    from ..textstats.unigram import train_unigram_vocab, unigram_encode_counts

    d = read_table(spark, sf_dir, "documents")
    vocab = train_unigram_vocab(
        d.filter(F.col("doc_id") % 5 == 0),
        "text",
        vocab_size=UNIGRAM_VOCAB,
        iters=UNIGRAM_ITERS,
    )
    enc = unigram_encode_counts(d, "doc_id", "text", vocab)
    return enc.select(
        F.col("id").alias("doc_id"),
        "n_words",
        "n_chars_tok",
        "lossless",
        (
            (F.col("n_pieces") >= F.col("n_words"))
            & (F.col("n_pieces") <= F.col("n_chars_tok"))
        ).alias("pieces_in_bounds"),
    )


ORACLE_UNIGRAM_ENCODE = rf"""
SELECT doc_id,
       CAST(len({_UG_TOKS}) AS BIGINT) AS n_words,
       CAST(list_sum(list_transform({_UG_TOKS}, w -> length(w)))
            AS BIGINT) AS n_chars_tok,
       TRUE AS lossless,
       TRUE AS pieces_in_bounds
FROM documents
WHERE {_UG_NORM} != ''
"""


QUERIES["doc_unigram_encode"] = QuerySpec(
    q_unigram_encode,
    ORACLE_UNIGRAM_ENCODE,
    "frozen unigram tokenizer encode: lossless + bounds contract, "
    "exact word/char restatement",
)


WORDPIECE_VOCAB = 256
# training alphabet cap: vocab sees only pure-[a-w] words, so every
# word containing a char outside the sampled [a-w] charset must encode
# to [UNK] — which makes n_unk EXACTLY SQL-checkable (the greedy-match
# DP itself is not; see textstats/wordpiece.py module docstring). At
# sf0.01 ~93% of occurrences stay encodable and ~6.5% hit the UNK path
# — both branches fire.
WORDPIECE_TRAIN_PATTERN = "^[a-w]+$"


def q_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen WordPiece tokenizer applied to the corpus (textstats/
    wordpiece.py): vocab trained on the deterministic 20% sample,
    restricted to pure-[a-w] words (the alphabet cap that makes the
    [UNK] path fire), encoded via the distinct-word dictionary join +
    greedy longest-match-first. Oracled CONTRACT: n_words, n_chars_tok
    AND n_unk are exact SQL restatements (UNK ⇔ the word contains a
    character absent from the sampled training charset — the coverage
    equivalence of full per-char vocab retention); `lossless` (non-UNK
    pieces rejoin to the word) and `pieces_in_bounds` are load-bearing
    booleans. Exact piece counts are pinned by the Python-parity
    tests."""
    from ..textstats.wordpiece import (
        build_wordpiece_vocab,
        wordpiece_encode_counts,
    )

    d = read_table(spark, sf_dir, "documents")
    vocab = build_wordpiece_vocab(
        d.filter(F.col("doc_id") % 5 == 0),
        "text",
        vocab_size=WORDPIECE_VOCAB,
        word_pattern=WORDPIECE_TRAIN_PATTERN,
    )
    enc = wordpiece_encode_counts(d, "doc_id", "text", vocab)
    return enc.select(
        F.col("id").alias("doc_id"),
        "n_words",
        "n_chars_tok",
        "n_unk",
        "lossless",
        (
            (F.col("n_pieces") >= F.col("n_words"))
            & (F.col("n_pieces") <= F.col("n_chars_tok"))
        ).alias("pieces_in_bounds"),
    )


ORACLE_WORDPIECE_ENCODE = rf"""
WITH tw AS (
  SELECT w FROM (
    SELECT unnest({_UG_TOKS}) AS w FROM documents
    WHERE {_UG_NORM} != '' AND doc_id % 5 = 0
  ) WHERE regexp_matches(w, '{WORDPIECE_TRAIN_PATTERN}')
),
sc AS (
  SELECT DISTINCT substr(w, i, 1) AS c
  FROM (SELECT w, unnest(generate_series(1, length(w))) AS i FROM tw)
),
docs_w AS (
  SELECT doc_id, unnest({_UG_TOKS}) AS w,
         unnest(generate_series(1, len({_UG_TOKS}))) AS pos
  FROM documents WHERE {_UG_NORM} != ''
),
wunk AS (
  SELECT doc_id, pos, w,
         max(CASE WHEN sc.c IS NULL THEN 1 ELSE 0 END) AS unk
  FROM (SELECT doc_id, pos, w, substr(w, i, 1) AS c
        FROM (SELECT doc_id, pos, w,
                     unnest(generate_series(1, length(w))) AS i
              FROM docs_w)) wc
  LEFT JOIN sc USING (c)
  GROUP BY doc_id, pos, w
)
SELECT doc_id, count(*) AS n_words,
       CAST(sum(length(w)) AS BIGINT) AS n_chars_tok,
       CAST(sum(unk) AS BIGINT) AS n_unk,
       TRUE AS lossless,
       TRUE AS pieces_in_bounds
FROM wunk GROUP BY doc_id
"""


QUERIES["doc_wordpiece_encode"] = QuerySpec(
    q_wordpiece_encode,
    ORACLE_WORDPIECE_ENCODE,
    "frozen WordPiece greedy encode: exact n_unk + lossless/bounds "
    "contract",
)


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-LANGUAGE tokenizer fertility ledger — the standard
    multilingual tokenizer-evaluation artifact (how many pieces a word
    costs per language decides mixture and context-budget math; cf.
    the fertility tables in the BLOOM/XLM-R tokenizer analyses): the
    frozen WordPiece encode (same vocab recipe as
    doc_wordpiece_encode) aggregated by `lang`. n_docs / n_words /
    n_chars_tok / n_unk and chars_per_word_milli = floor(1000 *
    n_chars / n_words) are EXACT SQL restatements; per-language
    fertility (pieces/word) rides the load-bearing
    `fertility_in_bounds` boolean (1 <= pieces/word <= chars/word —
    greedy WordPiece can never emit more pieces than characters or
    fewer than one per word); exact piece counts are pinned by the
    Python-parity tests in tests/test_wordpiece.py.

    Spark shape (100 TB): encode cost is per DISTINCT word
    (dictionary join), the ledger is one |langs|-sized aggregate —
    nothing corpus-sized leaves the executors."""
    from ..textstats.wordpiece import (
        build_wordpiece_vocab,
        wordpiece_encode_counts,
    )

    d = read_table(spark, sf_dir, "documents")
    vocab = build_wordpiece_vocab(
        d.filter(F.col("doc_id") % 5 == 0),
        "text",
        vocab_size=WORDPIECE_VOCAB,
        word_pattern=WORDPIECE_TRAIN_PATTERN,
    )
    enc = wordpiece_encode_counts(d, "doc_id", "text", vocab)
    joined = enc.join(
        d.select(F.col("doc_id").alias("id"), "lang"), "id"
    )
    return (
        joined.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_chars_tok").cast("bigint").alias("n_chars_tok"),
            F.sum("n_unk").cast("bigint").alias("n_unk"),
            F.sum("n_pieces").cast("bigint").alias("_pieces"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_chars_tok",
            "n_unk",
            F.floor(F.lit(1000) * F.col("n_chars_tok")
                    / F.col("n_words")).alias("chars_per_word_milli"),
            (
                (F.col("_pieces") >= F.col("n_words"))
                & (F.col("_pieces") <= F.col("n_chars_tok"))
            ).alias("fertility_in_bounds"),
        )
    )


ORACLE_TOKENIZER_FERTILITY = rf"""
WITH tw AS (
  SELECT w FROM (
    SELECT unnest({_UG_TOKS}) AS w FROM documents
    WHERE {_UG_NORM} != '' AND doc_id % 5 = 0
  ) WHERE regexp_matches(w, '{WORDPIECE_TRAIN_PATTERN}')
),
sc AS (
  SELECT DISTINCT substr(w, i, 1) AS c
  FROM (SELECT w, unnest(generate_series(1, length(w))) AS i FROM tw)
),
docs_w AS (
  SELECT doc_id, unnest({_UG_TOKS}) AS w,
         unnest(generate_series(1, len({_UG_TOKS}))) AS pos
  FROM documents WHERE {_UG_NORM} != ''
),
wunk AS (
  SELECT doc_id, pos, w,
         max(CASE WHEN sc.c IS NULL THEN 1 ELSE 0 END) AS unk
  FROM (SELECT doc_id, pos, w, substr(w, i, 1) AS c
        FROM (SELECT doc_id, pos, w,
                     unnest(generate_series(1, length(w))) AS i
              FROM docs_w)) wc
  LEFT JOIN sc USING (c)
  GROUP BY doc_id, pos, w
),
per_doc AS (
  SELECT doc_id, count(*) AS n_words,
         CAST(sum(length(w)) AS BIGINT) AS n_chars_tok,
         CAST(sum(unk) AS BIGINT) AS n_unk
  FROM wunk GROUP BY doc_id
)
SELECT d.lang,
       count(*) AS n_docs,
       CAST(sum(p.n_words) AS BIGINT) AS n_words,
       CAST(sum(p.n_chars_tok) AS BIGINT) AS n_chars_tok,
       CAST(sum(p.n_unk) AS BIGINT) AS n_unk,
       CAST(FLOOR(1000 * sum(p.n_chars_tok) / sum(p.n_words)) AS BIGINT)
         AS chars_per_word_milli,
       TRUE AS fertility_in_bounds
FROM per_doc p JOIN documents d USING (doc_id)
GROUP BY d.lang
"""


QUERIES["doc_tokenizer_fertility"] = QuerySpec(
    q_tokenizer_fertility,
    ORACLE_TOKENIZER_FERTILITY,
    "per-language tokenizer fertility ledger: exact word/char/unk sums "
    "+ bounds contract",
)
