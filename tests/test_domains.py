"""URL/domain curation ops (textstats/domains.py): host parsing,
registrable-domain extraction, hash-rate caps, mix accounting."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def test_host_and_registrable_domain(spark):
    from sparkstreaming_spark.textstats.domains import (
        registrable_domain,
        url_host,
    )

    rows = [
        (0, "https://en.news.site.com/a/b?x=1"),
        (1, "http://SITE.COM/path"),
        (2, "https://localhost/x"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["i", "url"]))
    out = {
        r["i"]: (r["h"], r["d"])
        for r in df.select(
            "i",
            url_host("url").alias("h"),
            registrable_domain(url_host("url")).alias("d"),
        ).collect()
    }
    assert out[0] == ("en.news.site.com", "site.com")
    assert out[1] == ("site.com", "site.com")  # lower-cased
    assert out[2] == ("localhost", "localhost")  # no dot → pass-through


def test_domain_caps_small_domains_keep_everything(spark):
    from sparkstreaming_spark.textstats.domains import domain_caps

    rows = [(i, f"https://small.com/{i}", i) for i in range(3)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "url", "x"])
    )
    out = domain_caps(df, "url", "doc_id", cap=5).collect()
    assert all(r["keep"] for r in out)
    assert all(r["n_domain_docs"] == 3 for r in out)


def test_domain_caps_rate_and_determinism(spark):
    from sparkstreaming_spark.textstats.domains import domain_caps

    rows = [(i, "https://big.com/x", i) for i in range(200)] + [
        (1000 + i, "https://tiny.com/y", i) for i in range(4)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "url", "x"])
    )
    out = domain_caps(df, "url", "doc_id", cap=10)
    kept = out.filter("keep").groupBy("domain").count().collect()
    by_dom = {r["domain"]: r["count"] for r in kept}
    # tiny domain under the cap keeps all 4; big domain keeps ~10
    # (hash-rate: expectation 10 over 200 docs — allow a generous band)
    assert by_dom["tiny.com"] == 4
    assert 2 <= by_dom["big.com"] <= 25
    # determinism: identical keep set on a re-run with shuffled input
    again = domain_caps(
        df.repartition(7), "url", "doc_id", cap=10
    ).filter("keep")
    ids1 = {r["doc_id"] for r in out.filter("keep").collect()}
    ids2 = {r["doc_id"] for r in again.collect()}
    assert ids1 == ids2


def test_domain_mix_shares_sum(spark):
    from sparkstreaming_spark.textstats.domains import domain_mix

    rows = [
        (0, "https://a.com/1", 100),
        (1, "https://a.com/2", 100),
        (2, "https://b.com/1", 200),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "url", "n_chars"])
    )
    out = {r["domain"]: r.asDict()
           for r in domain_mix(df, "url", "n_chars").collect()}
    assert out["a.com"]["n_docs"] == 2 and out["a.com"]["mass"] == 200
    assert out["a.com"]["share_ppm"] == 500_000
    assert out["b.com"]["share_ppm"] == 500_000


def test_canonical_url_and_dedup(spark):
    from sparkstreaming_spark.textstats.domains import (
        canonical_url,
        url_dedup,
    )

    rows = [
        (0, "https://A.com/x/y"),
        (1, "https://a.com/x/y?utm=z"),     # query stripped
        (2, "https://a.com/x/y/#frag"),     # fragment + trailing slash
        (3, "https://a.com/other"),
        (4, "https://b.com/x/y"),           # different host
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "url"]))
    canon = {r["doc_id"]: r["c"]
             for r in df.select("doc_id",
                                canonical_url("url").alias("c")).collect()}
    assert canon[0] == canon[1] == canon[2] == "a.com/x/y"
    assert canon[3] == "a.com/other" and canon[4] == "b.com/x/y"
    out = {r["doc_id"]: r.asDict()
           for r in url_dedup(df, "url", "doc_id").collect()}
    assert out[0]["keep"] and not out[1]["keep"] and not out[2]["keep"]
    assert out[0]["n_url_dups"] == 3
    assert out[3]["keep"] and out[4]["keep"]


def test_domain_caps_plan_no_window(spark):
    """The cap must stay window-free: one aggregate + one join back +
    a codegen filter (the whole point vs row_number per domain)."""
    from sparkstreaming_spark.textstats.domains import domain_caps
    from tests.conftest import SF_DIR_SMOKE as S

    docs = spark.read.parquet(f"{S}/documents.parquet").withColumn(
        "url", F.concat(F.lit("https://"), F.col("source"),
                        F.lit(".com/"), F.col("doc_id").cast("string"))
    )
    plan = domain_caps(docs, "url", "doc_id", cap=5)
    p = plan._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p, p[:3000]
