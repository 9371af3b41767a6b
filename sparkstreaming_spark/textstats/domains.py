"""URL/domain-level curation — the first filter of every web-scale
pretraining recipe (RefinedWeb §3.1 runs URL filtering before any
content dedup; Dolma and C4 cap or drop whole domains). Three pieces:

* `url_host` / `registrable_domain`: pure built-in extraction
  (Spark's parse_url, then the last two dot-labels as the registrable
  unit — a deliberate simplification of the Public Suffix List, which
  is a data file, not an algorithm; the suffix join is a one-line
  extension when the PSL table is available).
* `domain_mix`: per-domain document/char accounting with integer ppm
  shares — the corpus-composition ledger a curation run reports.
* `domain_caps`: per-domain document caps via HASH-RATE selection:
  keep doc iff md5(salt‖id) mod n_domain_docs < cap. Keeps `cap` docs
  per domain in expectation, deterministically (same docs on any rerun,
  any partitioning), with NO per-domain sort or window — the exact-cap
  alternative (row_number over a domain partition) makes the largest
  domain a single-task sort, the same scale-killer the suite's CCNet
  bucketing avoids. When exactness matters at small cap the suite's
  reservoir pattern (suite/scale_ops.py::q_reservoir_per_source)
  already provides per-group exact top-K; the rate form is the one
  that survives a 100 TB crawl where one domain is 10% of the corpus.

Scale shape (100 TB): domain extraction is whole-stage codegen; the
cap needs one hash aggregate to the |domains|-sized count table and
one equi-join back (AQE broadcasts it when it fits) plus a codegen
filter; the mix is one aggregate + one scalar total folded via a
broadcast cross-join. No windows, no driver-side state.

Reference parity: the reference has no URL surface
(FileReconstitution.scala:7-12 is its only text handling); north-star
extension per SURVEY §6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_64

DOMAIN_CAP_SALT = "domcap1"


def url_host(url: Column | str) -> Column:
    """Lower-cased HOST component via the parse_url built-in (JVM-side,
    no UDF)."""
    return F.lower(F.parse_url(F.col(url) if isinstance(url, str) else url,
                               F.lit("HOST")))


def registrable_domain(host: Column) -> Column:
    """Last two dot-labels of the host ('a.b.site.com' → 'site.com').
    Hosts without a dot (e.g. 'localhost') pass through unchanged."""
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(two != "", two).otherwise(host)


def domain_mix(df: DataFrame, url_col: str, weight_col: str) -> DataFrame:
    """Corpus-composition ledger: → (domain, n_docs, mass, share_ppm)
    where mass = Σ weight_col per registrable domain and share_ppm =
    floor(mass · 1e6 / total_mass) (double math in the identical order
    both engines, then floor → bigint)."""
    d = df.select(
        registrable_domain(url_host(url_col)).alias("domain"),
        F.col(weight_col).alias("__w"),
    )
    per = d.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__w").cast("bigint").alias("mass"),
    )
    total = per.agg(F.sum("mass").alias("__t"))
    return per.crossJoin(F.broadcast(total)).select(
        "domain",
        "n_docs",
        "mass",
        F.floor(
            F.col("mass").cast("double") * F.lit(1e6)
            / F.col("__t").cast("double")
        ).cast("bigint").alias("share_ppm"),
    )


def canonical_url(url: Column | str) -> Column:
    """Canonical URL key for crawl-level dedup (the FIRST dedup of
    every web pipeline — RefinedWeb §3.2 dedups by URL before any
    content pass): lower-cased host + path with the query string,
    fragment, and any trailing slash stripped. Pure built-ins."""
    u = F.col(url) if isinstance(url, str) else url
    host = url_host(u)
    path = F.regexp_extract(u, r"^[a-zA-Z]+://[^/?#]+([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    return F.concat(host, path)


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Keep ONE document per canonical URL (smallest id wins —
    deterministic, the exact-dedup convention of dedup/exact.py):
    adds `canon_url`, `n_url_dups` (total docs sharing the key) and
    boolean `keep`. One hash aggregate + one equi-join back; no
    window, no driver state."""
    d = df.withColumn("canon_url", canonical_url(url_col))
    per = d.groupBy("canon_url").agg(
        F.count(F.lit(1)).alias("n_url_dups"),
        F.min(F.col(id_col)).alias("__keep_id"),
    )
    return d.join(per, "canon_url").withColumn(
        "keep", F.col(id_col) == F.col("__keep_id")
    ).drop("__keep_id")


def domain_caps(
    df: DataFrame,
    url_col: str,
    id_col: str,
    cap: int,
    salt: str = DOMAIN_CAP_SALT,
) -> DataFrame:
    """Per-domain document cap (hash-rate form): adds `domain`,
    `n_domain_docs` and boolean `keep` = md5(salt‖id) mod n < cap.
    A domain with n <= cap keeps everything (h mod n lies in [0, n),
    so every residue is < cap); a domain with n > cap keeps `cap`
    docs in expectation."""
    d = df.withColumn(
        "domain", registrable_domain(url_host(url_col))
    )
    counts = d.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_domain_docs")
    )
    keyed = d.join(counts, "domain")
    h = md5_64(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return keyed.withColumn(
        "keep", F.pmod(h, F.col("n_domain_docs")) < F.lit(cap)
    )
