"""functions/lm.py (bigram-LM perplexity, Naive Bayes) and
functions/retrieval.py (TF-IDF / BM25) against hand-computed models
on tiny corpora — every count, smoothing term, and ranking law."""

import math

import pytest
from pyspark.sql import functions as F

from hbase_spark.functions.lm import (
    lm_score,
    nb_classify,
    perplexity_bucket,
    train_bigram_lm,
    train_naive_bayes,
)
from hbase_spark.functions.retrieval import (
    bm25_topk,
    corpus_stats,
    document_frequencies,
    term_frequencies,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --------------------------------------------------------------- LM


def test_bigram_lm_counts_and_perplexity_by_hand(spark):
    # ref corpus: "a b a" + "b a" -> unigrams a:3 b:2 (V=2),
    # bigrams: "a b":1, "b a":2
    ref = _docs(spark, [(0, "a b a"), (1, "b a")])
    lm = train_bigram_lm(ref)
    uni = {r["c1"] for r in lm.unigrams.collect()}
    assert uni == {3, 2}
    bi = sorted(r["c12"] for r in lm.bigrams.collect())
    assert bi == [1, 2]
    st = lm.stats.first()
    assert st["vocab_size"] == 2 and st["n_tokens"] == 5

    # score "a b c": bigrams "a b" (c12=1, c1=3), "b c" (c12=0, c1=2)
    out = lm_score(_docs(spark, [(7, "a b c")]), lm).first()
    assert out["n_bigrams"] == 2
    assert out["n_oov_bigrams"] == 1
    assert out["sum_c12"] == 1 and out["sum_c1"] == 5
    k, v = 1.0, 2
    expect = -(
        math.log((1 + k) / (3 + k * v)) + math.log((0 + k) / (2 + k * v))
    ) / 2
    assert out["log_ppl"] == pytest.approx(expect, rel=1e-12)
    assert out["ppl"] == pytest.approx(math.exp(expect), rel=1e-12)


def test_bigram_lm_short_and_empty_docs_score_null(spark):
    lm = train_bigram_lm(_docs(spark, [(0, "a b a b")]))
    rows = {
        r["doc_id"]: r
        for r in lm_score(
            _docs(spark, [(1, "solo"), (2, ""), (3, "a b")]), lm
        ).collect()
    }
    for d in (1, 2):
        assert rows[d]["n_bigrams"] == 0
        assert rows[d]["ppl"] is None
    assert rows[3]["n_bigrams"] == 1 and rows[3]["ppl"] is not None


def test_perplexity_bucket_thresholds_and_null(spark):
    lm = train_bigram_lm(_docs(spark, [(0, "a b a b a b a b")]))
    scored = lm_score(
        _docs(spark, [(1, "a b a b"), (2, "z z z z"), (3, "x")]), lm
    )
    # Thresholds are in the default log_ppl space: doc 1 is
    # in-distribution (log_ppl ~0.257), doc 2 all-OOV (log_ppl =
    # ln V ~0.693, the add-1 smoothing floor 1/V per position), doc 3
    # NULL (too short)
    got = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_bucket(scored, head=0.41, tail=0.64).collect()
    }
    assert got[1] == "head"
    assert got[2] == "tail"
    assert got[3] == "tail"  # NULL (too short) buckets conservative


def test_lm_oov_rate_separates_reference_from_noise(spark):
    ref = _docs(spark, [(i, "alpha beta gamma delta") for i in range(4)])
    lm = train_bigram_lm(ref)
    out = {
        r["doc_id"]: r
        for r in lm_score(
            _docs(spark, [(0, "alpha beta gamma"), (1, "qq ww ee rr")]), lm
        ).collect()
    }
    assert out[0]["n_oov_bigrams"] == 0
    assert out[1]["n_oov_bigrams"] == out[1]["n_bigrams"] == 3
    assert out[1]["ppl"] > out[0]["ppl"]


# ------------------------------------------------------- Naive Bayes


def test_nb_two_class_scores_by_hand(spark):
    train = spark.createDataFrame(
        [(0, "spam spam buy", "spam"), (1, "hello world", "ham")],
        "doc_id long, text string, lang string",
    )
    model = train_naive_bayes(train, label_col="lang")
    st = model.stats.first()
    assert st["vocab_size"] == 4 and st["n_docs_total"] == 2

    out = nb_classify(
        _docs(spark, [(9, "spam buy")]), model
    ).first()
    # by hand: V=4, k=1; spam class: n_tokens=3, prior ln(1/2)
    s_spam = (
        math.log(0.5)
        + math.log((2 + 1) / (3 + 4))
        + math.log((1 + 1) / (3 + 4))
    )
    s_ham = (
        math.log(0.5)
        + math.log((0 + 1) / (2 + 4))
        + math.log((0 + 1) / (2 + 4))
    )
    assert out["pred"] == "spam"
    assert out["score"] == pytest.approx(s_spam, rel=1e-12)
    assert out["margin"] == pytest.approx(s_spam - s_ham, rel=1e-12)


def test_nb_oov_words_smooth_not_zero(spark):
    train = spark.createDataFrame(
        [(0, "a a a", "x"), (1, "b b b", "y")],
        "doc_id long, text string, lang string",
    )
    model = train_naive_bayes(train, label_col="lang")
    out = nb_classify(_docs(spark, [(5, "zz zz")]), model).first()
    # all-OOV doc: both classes score identically except priors (equal)
    # -> tie broken deterministically by max(struct) = greater label
    assert out["margin"] == pytest.approx(0.0, abs=1e-12)
    assert out["pred"] == "y"


def test_nb_margin_gate_raises_on_tie(spark):
    train = spark.createDataFrame(
        [(0, "a a a", "x"), (1, "b b b", "y")],
        "doc_id long, text string, lang string",
    )
    model = train_naive_bayes(train, label_col="lang")
    gated = nb_classify(
        _docs(spark, [(5, "zz zz")]), model, min_margin=1e-9
    )
    with pytest.raises(Exception, match="margin below gate"):
        gated.collect()


def test_nb_single_class_margin_infinite(spark):
    train = spark.createDataFrame(
        [(0, "a b c", "only")], "doc_id long, text string, lang string"
    )
    model = train_naive_bayes(train, label_col="lang")
    out = nb_classify(_docs(spark, [(1, "a")]), model, min_margin=1.0).first()
    assert out["pred"] == "only" and math.isinf(out["margin"])


# -------------------------------------------------------------- BM25


def test_term_and_document_frequencies(spark):
    docs = _docs(spark, [(0, "a a b"), (1, "b c")])
    tf = term_frequencies(docs)
    assert tf.count() == 4  # (0,a),(0,b),(1,b),(1,c)
    assert {r["dl"] for r in tf.filter("doc_id = 0").collect()} == {3}
    df = [r["df"] for r in document_frequencies(tf).collect()]
    assert sorted(df) == [1, 1, 2]  # a:1, b:2, c:1
    st = corpus_stats(docs).first()
    assert st["n_docs"] == 2 and st["avgdl"] == pytest.approx(2.5)


def test_bm25_score_by_hand_and_ranking(spark):
    docs = _docs(spark, [(0, "x x y"), (1, "x z z"), (2, "w w w")])
    out = {
        (r["query_id"], r["doc_id"]): r
        for r in bm25_topk(docs, [(1, "x")], k=10).collect()
    }
    # idf(x) = ln(1 + (3-2+0.5)/(2+0.5)); avgdl=3, dl=3 -> norm=1
    idf = math.log(1 + 1.5 / 2.5)

    def s(tf):
        return idf * tf * 2.2 / (tf + 1.2)

    assert out[(1, 0)]["score"] == pytest.approx(s(2), rel=1e-12)
    assert out[(1, 1)]["score"] == pytest.approx(s(1), rel=1e-12)
    assert out[(1, 0)]["rank"] == 1 and out[(1, 1)]["rank"] == 2
    assert (1, 2) not in out  # no shared term -> never scored


def test_bm25_rank_ties_break_on_doc_id(spark):
    docs = _docs(spark, [(5, "q r"), (3, "q s"), (9, "q t")])
    rows = bm25_topk(docs, [(1, "q")], k=3).orderBy("rank").collect()
    assert [r["doc_id"] for r in rows] == [3, 5, 9]
    assert len({r["score"] for r in rows}) == 1


def test_bm25_unseen_query_term_contributes_nothing(spark):
    docs = _docs(spark, [(0, "a b"), (1, "a c")])
    both = bm25_topk(docs, [(1, "a never9seen")], k=5)
    just_a = bm25_topk(docs, [(1, "a")], k=5)
    a = {(r["doc_id"], round(r["score"], 12)) for r in both.collect()}
    b = {(r["doc_id"], round(r["score"], 12)) for r in just_a.collect()}
    assert a == b


def test_bm25_length_normalization_prefers_short_docs(spark):
    docs = _docs(spark, [(0, "x y"), (1, "x " + "pad " * 20)])
    rows = {r["doc_id"]: r["score"] for r in
            bm25_topk(docs, [(1, "x")], k=5).collect()}
    assert rows[0] > rows[1]


def test_tfidf_score_by_hand(spark):
    from hbase_spark.functions.retrieval import (
        _query_terms,
        corpus_stats,
        tfidf_score,
    )

    docs = _docs(spark, [(0, "x x y"), (1, "y z"), (2, "z z")])
    tf = term_frequencies(docs)
    out = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in tfidf_score(
            tf,
            document_frequencies(tf),
            corpus_stats(docs),
            _query_terms(spark, [(1, "x y")]),
        ).collect()
    }
    # doc 0: x tf=2 df=1, y tf=1 df=2; N=3
    exp0 = (1 + math.log(2)) * math.log(3 / 1) + (1 + math.log(1)) * math.log(
        3 / 2
    )
    exp1 = (1 + math.log(1)) * math.log(3 / 2)  # y only
    assert out[(1, 0)] == pytest.approx(exp0, rel=1e-12)
    assert out[(1, 1)] == pytest.approx(exp1, rel=1e-12)
    assert (1, 2) not in out  # no query term


# ----------------------------------------------- stupid backoff n-gram


def test_ngram_lm_counts_per_order(spark):
    from hbase_spark.functions.lm import train_ngram_lm

    lm = train_ngram_lm(_docs(spark, [(0, "a b c a b d")]), n=3)
    assert sorted(r["c1"] for r in lm.orders[1].collect()) == [1, 1, 2, 2]
    assert sorted(r["c2"] for r in lm.orders[2].collect()) == [1, 1, 1, 2]
    assert sorted(r["c3"] for r in lm.orders[3].collect()) == [1, 1, 1, 1]
    st = lm.stats.first()
    assert st["vocab_size"] == 4 and st["n_tokens"] == 6


def test_stupid_backoff_scores_by_hand(spark):
    from hbase_spark.functions.lm import lm_score_backoff, train_ngram_lm

    lm = train_ngram_lm(_docs(spark, [(0, "a b c a b d")]), n=3)
    out = {
        r["doc_id"]: r
        for r in lm_score_backoff(
            _docs(spark, [(1, "a b c"), (2, "c b d"), (3, "z")]), lm
        ).collect()
    }
    la = math.log(0.4)
    # doc 1: "a" unigram 2/6 (no context, NO penalty); "b" via "a b"/
    # "a" = 2/2; "c" via trigram "a b c"/"a b" = 1/2.  Zero backoffs.
    d1 = out[1]
    assert d1["n_scored"] == 3 and d1["n_backoffs"] == 0 and d1["n_oov"] == 0
    exp1 = -(math.log(2 / 6) + math.log(2 / 2) + math.log(1 / 2)) / 3
    assert d1["avg_logs"] == pytest.approx(exp1, rel=1e-12)
    assert d1["score_ppl"] == pytest.approx(math.exp(exp1), rel=1e-12)
    # doc 2: "c" unigram 1/6; "b" backs off ("c b" unseen) to unigram
    # 2/6 with one alpha; "d" backs off from the unseen trigram to
    # "b d"/"b" = 1/2 with one alpha.  Two backoffs total.
    d2 = out[2]
    assert d2["n_backoffs"] == 2 and d2["n_oov"] == 0
    exp2 = -(
        math.log(1 / 6) + (math.log(2 / 6) + la) + (math.log(1 / 2) + la)
    ) / 3
    assert d2["avg_logs"] == pytest.approx(exp2, rel=1e-12)
    # doc 3: single OOV token -> add-1 floor 1/(N+V), no backoff charge
    d3 = out[3]
    assert d3["n_scored"] == 1 and d3["n_oov"] == 1 and d3["n_backoffs"] == 0
    assert d3["avg_logs"] == pytest.approx(-math.log(1 / 10), rel=1e-12)


def test_stupid_backoff_prefers_in_distribution_text(spark):
    from hbase_spark.functions.lm import lm_score_backoff, train_ngram_lm

    ref = _docs(
        spark, [(i, "the quick brown fox jumps over the lazy dog")
                for i in range(3)]
    )
    lm = train_ngram_lm(ref, n=3)
    out = {
        r["doc_id"]: r["score_ppl"]
        for r in lm_score_backoff(
            _docs(spark, [(0, "the quick brown fox"),
                          (1, "dog lazy the over jumps")]), lm
        ).collect()
    }
    assert out[0] < out[1]  # fluent order scores better than shuffled


def test_train_ngram_lm_validates_n(spark):
    from hbase_spark.functions.lm import train_ngram_lm

    with pytest.raises(ValueError):
        train_ngram_lm(_docs(spark, [(0, "a b")]), n=0)


# ------------------------------------------------------------- DSIR


def test_dsir_weights_identity_and_direction(spark):
    from hbase_spark.functions.lm import dsir_weights, hashed_ngram_counts

    docs = _docs(
        spark,
        [(0, "good text about science"), (1, "spam spam buy now"),
         (2, "")],
    )
    target = hashed_ngram_counts(docs.filter("doc_id = 0"))
    raw = hashed_ngram_counts(docs)
    w = {r["doc_id"]: r for r in dsir_weights(docs, target, raw).collect()}
    # n_features = unigrams + bigrams
    assert w[0]["n_features"] == 4 + 3
    assert w[2]["n_features"] == 0 and w[2]["weight"] is None
    # the target-like doc out-weighs the spam doc
    assert w[0]["weight"] > w[1]["weight"]

    # target == raw -> every feature's log-ratio cancels exactly
    same = {
        r["doc_id"]: r["weight"]
        for r in dsir_weights(docs, raw, raw).collect()
        if r["weight"] is not None
    }
    assert all(v == 0.0 for v in same.values())

    # portable md5 bucketing computes the same counts per scheme
    p = hashed_ngram_counts(docs, portable=True)
    assert p.agg({"c": "sum"}).first()[0] == raw.agg({"c": "sum"}).first()[0]


def test_dsir_shared_feature_frame_equals_naive(spark):
    """The single-pass path (hashed_ngram_features feeding counts AND
    weights) must produce bit-identical weights to the three-pass
    naive form — it is the same math over the same buckets, tokenized
    once."""
    from hbase_spark.functions.lm import (
        dsir_weights,
        hashed_ngram_counts,
        hashed_ngram_features,
    )

    docs = _docs(
        spark,
        [(0, "good text about science"), (1, "spam spam buy now"),
         (2, ""), (3, "science text with more words here")],
    ).withColumn("lang", (F.col("doc_id") % 2 == 0).cast("string"))

    naive_t = hashed_ngram_counts(docs.filter("lang = 'true'"))
    naive_r = hashed_ngram_counts(docs)
    naive = {
        r["doc_id"]: (r["n_features"], r["weight"])
        for r in dsir_weights(docs, naive_t, naive_r).collect()
    }

    feats = hashed_ngram_features(docs, extra_cols=("lang",))
    t = hashed_ngram_counts(docs, features=feats.filter("lang = 'true'"))
    rw = hashed_ngram_counts(docs, features=feats)
    shared = {
        r["doc_id"]: (r["n_features"], r["weight"])
        for r in dsir_weights(docs, t, rw, features=feats).collect()
    }
    assert shared == naive


def test_dsir_sample_deterministic_and_top_weighted(spark):
    from pyspark.sql import functions as F

    from hbase_spark.functions.lm import dsir_sample

    weighted = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(100)] + [(100, None)],
        "doc_id long, weight double",
    )
    a = {r["doc_id"] for r in dsir_sample(weighted, fraction=0.2).collect()}
    b = {r["doc_id"] for r in dsir_sample(weighted, fraction=0.2).collect()}
    assert a == b and 0 < len(a) <= 30
    assert 100 not in a  # NULL weight never selected

    # gumbel=False: pure top-fraction by weight
    top = dsir_sample(weighted, fraction=0.1, gumbel=False)
    got = {r["doc_id"]: r["weight"] for r in top.collect()}
    assert all(v == 9.0 for v in got.values())

    # a different seed draws a different (still deterministic) sample
    c = {r["doc_id"] for r in
         dsir_sample(weighted, fraction=0.2, seed=7).collect()}
    assert c != a


def test_bm25_sharded_topk_equals_single_stage(spark):
    """shards>1 (the stop-word scale path) returns exactly the
    single-stage result — the global top-k is contained in the union
    of per-shard top-ks."""
    docs = _docs(
        spark,
        [(i, f"common tok{i % 13} other{i % 5}") for i in range(200)],
    )
    qs = [(1, "common"), (2, "tok3 other1")]
    one = bm25_topk(docs, qs, k=7)
    sharded = bm25_topk(docs, qs, k=7, shards=8)
    a = {(r["query_id"], r["doc_id"], r["rank"], round(r["score"], 10))
         for r in one.collect()}
    b = {(r["query_id"], r["doc_id"], r["rank"], round(r["score"], 10))
         for r in sharded.collect()}
    assert a == b and len(a) > 0


def test_lm_score_routed_per_language(spark):
    """CC-Net routing: each doc is scored by ITS language's LM, so an
    in-distribution doc scores near-zero log_ppl under its own model
    while the cross-scored form would not; unknown languages go to the
    default or drop."""
    from hbase_spark.functions.lm import lm_score_routed

    en = _docs(spark, [(0, "aa bb aa bb aa bb")])
    de = _docs(spark, [(1, "xx yy xx yy xx yy")])
    lms = {"en": train_bigram_lm(en), "de": train_bigram_lm(de)}
    docs = spark.createDataFrame(
        [(10, "aa bb aa", "en"), (11, "xx yy xx", "de"),
         (12, "aa bb", "fr")],
        "doc_id long, text string, lang string",
    )
    out = {
        r["doc_id"]: r
        for r in lm_score_routed(docs, lms, default="en").collect()
    }
    assert out[10]["lm_lang"] == "en" and out[11]["lm_lang"] == "de"
    assert out[12]["lm_lang"] == "en"  # unknown lang -> default
    # each in-distribution doc has zero OOV under its own model
    assert out[10]["n_oov_bigrams"] == 0
    assert out[11]["n_oov_bigrams"] == 0
    # without a default, the unknown-language doc is dropped
    dropped = lm_score_routed(docs, lms)
    assert {r["doc_id"] for r in dropped.collect()} == {10, 11}
    with pytest.raises(ValueError):
        lm_score_routed(docs, lms, default="zz")
    with pytest.raises(ValueError):
        lm_score_routed(docs, {})

    # non-Latin leg: the lang column comes from lang_id itself, so the
    # script-majority route (Cyrillic -> ru) drives the LM routing the
    # way curate_documents wires it for a multilingual crawl
    from hbase_spark.functions.text import lang_id

    ru = _docs(spark, [(2, "привет мир привет мир привет")])
    lms_ru = {"ru": train_bigram_lm(ru), "en": train_bigram_lm(en)}
    docs2 = spark.createDataFrame(
        [(20, "привет мир привет"), (21, "aa bb aa")],
        "doc_id long, text string",
    ).withColumn("lang", lang_id("text"))
    out2 = {
        r["doc_id"]: r
        for r in lm_score_routed(docs2, lms_ru, default="en").collect()
    }
    assert out2[20]["lm_lang"] == "ru" and out2[20]["n_oov_bigrams"] == 0
    assert out2[21]["lm_lang"] == "en"  # no marker hits -> default route


def test_perplexity_thresholds_percentiles(spark):
    from hbase_spark.functions.lm import (
        perplexity_bucket,
        perplexity_thresholds,
    )

    scored = spark.createDataFrame(
        [(i, float(i)) for i in range(100)] + [(100, None)],
        "doc_id long, log_ppl double",
    )
    head, tail = perplexity_thresholds(scored)
    assert 30 <= head <= 36 and 63 <= tail <= 69
    b = perplexity_bucket(scored, head=head, tail=tail)
    counts = {r["ppl_bucket"]: r["count"]
              for r in b.groupBy("ppl_bucket").count().collect()}
    # roughly thirds, with the NULL row bucketed tail
    assert abs(counts["head"] - 33) <= 4
    assert abs(counts["middle"] - 33) <= 4
    assert abs(counts["tail"] - 34) <= 5
    with pytest.raises(ValueError):
        perplexity_thresholds(scored, probs=(0.7, 0.3))
