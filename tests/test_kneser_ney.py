"""Kneser-Ney bigram LM (textstats/lm.py): probability axioms on a
hand-computable corpus and the filtering property the smoothing is for."""

import math

import pandas as pd

from sparkstreaming_spark.textstats.lm import add_kneser_ney_logprob


def _score(spark, rows):
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    return {r["doc_id"]: r.asDict()
            for r in add_kneser_ney_logprob(df, "text").collect()}


def test_hand_computed_probability(spark):
    # corpus: doc1 "a b a b", doc2 "a c"
    # bigrams: (a b) x2, (b a) x1, (a c) x1 -> 3 types
    # cp(a)=3, n1f(a)=2; cp(b)=1, n1f(b)=1
    # n1r(b)=1 (only 'a b'), n1r(a)=1, n1r(c)=1; T=3
    out = _score(spark, [(1, "a b a b"), (2, "a c")])
    D = 0.75
    p_ab = (max(2 - D, 0) + D * 2 * (1 / 3)) / 3
    p_ba = (max(1 - D, 0) + D * 1 * (1 / 3)) / 1
    p_ac = (max(1 - D, 0) + D * 2 * (1 / 3)) / 3
    exp1 = round(math.log(p_ab) * 1e6) * 2 + round(math.log(p_ba) * 1e6)
    exp2 = round(math.log(p_ac) * 1e6)
    assert out[1]["n_bigrams"] == 3 and out[1]["lp_micro_sum"] == exp1
    assert out[2]["n_bigrams"] == 1 and out[2]["lp_micro_sum"] == exp2


def test_conditional_sums_to_one_per_context(spark):
    # for every context w1 the KN conditional over SEEN continuations
    # plus backoff mass to unseen ones must total 1:
    # sum_seen P + D*n1f/cp * (1 - sum_seen Pcont) ... verify the
    # closed-form identity sum_seen[(cb-D)/cp] + D*n1f/cp = 1 when
    # Pcont sums to 1 over the whole vocab — check via the discount
    # bookkeeping on a small corpus
    rows = [(1, "x y x z x y"), (2, "y z y x")]
    # bigrams doc1: xy, yx, xz, zx, xy; doc2: yz, zy, yx
    # counts: xy2 yx2 xz1 zx1 yz1 zy1 -> T=6
    # context x: continuations y(2), z(1) -> cp=3, n1f=2
    D = 0.75
    seen_mass = (2 - D) / 3 + (1 - D) / 3
    backoff_coeff = D * 2 / 3
    # Pcont over all w2: each of x,y,z has n1r: x<-(yx,zx)=2? compute:
    # right words: y in xy,zy ->2; x in yx,zx ->2; z in xz,yz ->2; sum=6=T
    pcont_total = (2 + 2 + 2) / 6
    assert abs(pcont_total - 1.0) < 1e-12
    assert abs(seen_mass + backoff_coeff * pcont_total - 1.0) < 1e-12
    # and the operator runs clean on this corpus
    out = _score(spark, rows)
    assert out[1]["n_bigrams"] == 5 and out[2]["n_bigrams"] == 3


def test_repeated_boilerplate_scores_higher_than_shuffled(spark):
    # natural-ish docs share bigrams; the shuffled doc's bigrams are
    # mostly singletons -> lower (more negative) mean log-prob
    natural = [(i, "the quick brown fox jumps over the lazy dog") for i in range(4)]
    shuffled = [(10, "dog the over quick lazy jumps fox brown the")]
    out = _score(spark, natural + shuffled)
    nat_mean = out[0]["lp_micro_sum"] / out[0]["n_bigrams"]
    shuf_mean = out[10]["lp_micro_sum"] / out[10]["n_bigrams"]
    assert nat_mean > shuf_mean


def test_single_token_docs_are_excluded(spark):
    out = _score(spark, [(1, "solo"), (2, "a b")])
    assert 1 not in out and 2 in out


def test_ccnet_buckets_split_and_order(spark):
    # 9 docs in one lang: 3 share heavy boilerplate (low perplexity),
    # 3 mid, 3 near-unique token streams (high perplexity). ntile(3)
    # must put 3 docs per bucket and head.ppl_hi <= middle.ppl_lo <=
    # middle.ppl_hi <= tail.ppl_lo.
    from sparkstreaming_spark.textstats.lm import ccnet_perplexity_buckets

    boiler = "the quick brown fox jumps over the lazy dog"
    rows = []
    for i in range(3):
        rows.append((i, boiler + " " + boiler, "en"))
    for i in range(3, 6):
        rows.append((i, boiler + f" extra{i} words{i} here{i}", "en"))
    for i in range(6, 9):
        rows.append((i, f"zq{i} wv{i} xk{i} pj{i} mn{i} rt{i} uy{i}", "en"))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )
    out = {r["bucket"]: r.asDict()
           for r in ccnet_perplexity_buckets(df, "text").collect()}
    assert set(out) == {"head", "middle", "tail"}
    assert all(out[b]["n_docs"] == 3 for b in out)
    assert out["head"]["ppl_hi"] <= out["middle"]["ppl_lo"]
    assert out["middle"]["ppl_hi"] <= out["tail"]["ppl_lo"]
    assert out["head"]["chars"] > 0


def test_ccnet_buckets_partitioned_by_lang(spark):
    # two languages bucket independently: each lang gets its own thirds
    from sparkstreaming_spark.textstats.lm import ccnet_perplexity_buckets

    # three distinct difficulty tiers per language (threshold bucketing
    # groups perplexity TIES into one bucket, so tiers must differ)
    rows = []
    for lang, words in (("en", "alpha beta gamma delta"),
                        ("fr", "un deux trois quatre")):
        base = 0 if lang == "en" else 6
        for i in range(2):
            rows.append((base + i, words + " " + words, lang))
        for i in range(2, 4):
            rows.append((base + i, words + f" x{base + i} y{base + i}", lang))
        for i in range(4, 6):
            rows.append((base + i,
                         f"q{base + i} r{base + i} s{base + i} t{base + i}",
                         lang))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )
    out = ccnet_perplexity_buckets(df, "text").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == {"en", "fr"}
    for lang, rs in by_lang.items():
        assert sum(r["n_docs"] for r in rs) == 6
        assert {r["bucket"] for r in rs} == {"head", "middle", "tail"}
        rng = {r["bucket"]: (r["ppl_lo"], r["ppl_hi"]) for r in rs}
        assert rng["head"][1] <= rng["middle"][0] <= rng["middle"][1] \
            <= rng["tail"][0]


def test_kn_heldout_four_tiers(spark):
    """Every probability tier of the held-out scorer: seen bigram,
    unseen bigram w/ both unigrams seen, unseen context (full backoff),
    and unscorable (w2 unseen → n_oov)."""
    import math

    from sparkstreaming_spark.textstats.lm import score_kneser_ney_heldout

    train = spark.createDataFrame(
        pd.DataFrame([(0, "a b c a b")], columns=["doc_id", "text"])
    )
    # train pairs: ab, bc, ca, ab → counts ab=2, bc=1, ca=1; T = 3 types
    # fwd: cp(a)=2/n1f=1, cp(b)=1/n1f=1, cp(c)=1/n1f=1
    # rev: n1r(a)=1 (ca), n1r(b)=1 (ab), n1r(c)=1 (bc)
    score = spark.createDataFrame(
        pd.DataFrame(
            [(1, "a b"), (2, "b a"), (3, "zz c"), (4, "a zz")],
            columns=["doc_id", "text"],
        )
    )
    out = {r["doc_id"]: r.asDict()
           for r in score_kneser_ney_heldout(train, score, "text").collect()}
    D, T = 0.75, 3.0
    # doc 1: seen bigram ab: (max(2-D,0) + D*1*1/T)/2
    exp1 = round(math.log((2 - D + D * 1 * 1 / T) / 2) * 1e6)
    assert out[1] == {"doc_id": 1, "n_bigrams": 1, "n_oov": 0,
                      "lp_micro_sum": exp1}
    # doc 2: unseen bigram 'b a', both seen: (0 + D*n1f(b)*n1r(a)/T)/cp(b)
    exp2 = round(math.log((0 + D * 1 * 1 / T) / 1) * 1e6)
    assert out[2]["lp_micro_sum"] == exp2 and out[2]["n_oov"] == 0
    # doc 3: w1 'zz' unseen, w2 'c' seen: full backoff n1r(c)/T
    exp3 = round(math.log(1 / T) * 1e6)
    assert out[3]["lp_micro_sum"] == exp3 and out[3]["n_oov"] == 0
    # doc 4: w2 'zz' unseen → unscorable, excluded from the sum
    assert out[4] == {"doc_id": 4, "n_bigrams": 1, "n_oov": 1,
                      "lp_micro_sum": 0}


def test_ccnet_heldout_buckets_quarantines_and_splits(spark):
    from sparkstreaming_spark.textstats.lm import ccnet_heldout_buckets

    # train vocab: only 'alpha beta gamma'; score docs span three
    # difficulty tiers, plus one all-unscorable doc (every w2 unseen)
    train = spark.createDataFrame(
        pd.DataFrame(
            [(0, "alpha beta gamma alpha beta", "en")],
            columns=["doc_id", "text", "lang"],
        )
    )
    rows = []
    for i in range(2):
        rows.append((10 + i, "alpha beta gamma", "en"))     # all seen
    for i in range(2, 4):
        rows.append((10 + i, "alpha beta zz gamma", "en"))  # backoff mix
    for i in range(4, 6):
        rows.append((10 + i, "zz alpha qq beta", "en"))     # harder mix
    rows.append((99, "qq zz", "en"))                        # unscorable
    score = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )
    out = ccnet_heldout_buckets(train, score, "text").collect()
    assert sum(r["n_docs"] for r in out) == 6  # doc 99 quarantined
    got = {r["bucket"] for r in out}
    assert got == {"head", "middle", "tail"}
    rng = {r["bucket"]: (r["ppl_lo"], r["ppl_hi"]) for r in out}
    assert rng["head"][1] <= rng["middle"][0] <= rng["middle"][1] \
        <= rng["tail"][0]
    # plan: no corpus-sized window (broadcast cut points)
    plan = ccnet_heldout_buckets(
        train, score, "text"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_sketched_lm_shape_and_mass(spark):
    import math

    from sparkstreaming_spark.textstats.lm import sketched_bigram_lm

    rows = [(1, "a b a b a c"), (2, "a b d e")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    weights, oov, total = sketched_bigram_lm(df, "text", buckets=64)
    # bigrams: doc1 ab,ba,ab,ba,ac; doc2 ab,bd,de -> total 8
    assert total == 8 and len(weights) == 64
    filled = [w for w in weights if w != oov]
    # 5 distinct bigrams, 64 buckets: collisions possible but mass must
    # sum to ~1 (micro-nat rounding tolerance)
    mass = sum(math.exp(w / 1e6) for w in filled)
    assert abs(mass - 1.0) < 1e-4
    # oov sits one nat below the rarest filled bucket
    assert oov == min(filled) - 1_000_000
    # the most frequent bigram ('a b' x3) owns the max weight
    assert max(filled) == round(math.log(3 / 8) * 1e6)


def test_sketched_lm_empty_corpus_raises(spark):
    import pytest

    from sparkstreaming_spark.textstats.lm import sketched_bigram_lm

    df = spark.createDataFrame(
        pd.DataFrame([(1, "solo")], columns=["doc_id", "text"])
    )
    with pytest.raises(ValueError, match="no bigrams"):
        sketched_bigram_lm(df, "text", buckets=16)
