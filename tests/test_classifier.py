"""Trained quality classifier (functions/classifier.py) — the GPT-3 /
CC-Net / DCLM model-based filter slot."""

import pytest
from pyspark.sql import functions as F

from hbase_spark.functions.classifier import (
    pareto_select,
    quality_scores,
    train_quality_classifier,
)

CLEAN = [
    "the committee published a detailed report on regional water quality",
    "researchers measured the effect of sunlight on plant growth rates",
    "the library extended its opening hours after community feedback",
    "engineers tested the bridge design under simulated storm loads",
    "the orchestra performed three symphonies to a full concert hall",
    "students presented their findings at the annual science fair",
    "the museum restored a collection of nineteenth century maps",
    "volunteers planted native trees along the restored river bank",
]
JUNK = [
    "click here buy now click here buy now click here buy now",
    "xxx zzz qqq xxx zzz qqq xxx zzz qqq xxx zzz qqq",
    "free free free win win win cash cash cash now now now",
    "aaaa bbbb aaaa bbbb aaaa bbbb aaaa bbbb aaaa bbbb",
    "subscribe like share subscribe like share subscribe like share",
    "lorem lorem lorem ipsum ipsum ipsum lorem ipsum lorem ipsum",
    "buy cheap buy cheap buy cheap buy cheap buy cheap buy cheap",
    "spam spam spam spam eggs spam spam spam spam eggs spam spam",
]


@pytest.fixture(scope="module")
def corpus(spark):
    # 8 templates x 8 variants per class: suffix a variant word so the
    # classifier must generalize over hashed grams, not memorize rows
    rows = []
    i = 0
    for v in range(8):
        for t in CLEAN:
            rows.append((i, f"{t} volume {v}", 1.0))
            i += 1
        for t in JUNK:
            rows.append((i, f"{t} v{v}", 0.0))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def test_classifier_separates_holdout(corpus):
    train = corpus.filter(F.col("doc_id") % 4 != 0)
    hold = corpus.filter(F.col("doc_id") % 4 == 0)
    clf = train_quality_classifier(train, max_iter=25)
    got = quality_scores(
        clf, hold, extra_cols=("label",)
    ).collect()
    assert all(0.0 <= r["quality_prob"] <= 1.0 for r in got)
    acc = sum(
        1 for r in got if (r["quality_prob"] >= 0.5) == (r["label"] == 1.0)
    ) / len(got)
    assert acc >= 0.9, f"holdout accuracy {acc}"


def test_scoring_plan_is_jvm_only(corpus):
    clf = train_quality_classifier(corpus, max_iter=5)
    plan = quality_scores(clf, corpus)._jdf.queryExecution().analyzed().toString()
    assert "EvalPython" not in plan and "PythonUDF" not in plan


def test_train_cap_subsample_is_deterministic(corpus):
    a = train_quality_classifier(corpus, train_cap=40, max_iter=5)
    b = train_quality_classifier(corpus, train_cap=40, max_iter=5)
    ca = a.model.coefficients.toArray()
    cb = b.model.coefficients.toArray()
    assert abs(ca - cb).max() < 1e-6


def test_pareto_select_seeded_and_score_monotone(spark):
    # score 1.0 -> kept unless the seeded uniform is exactly 1;
    # score 0.0 -> kept only when pareto(9) > 1 (probability 2^-9)
    n = 2000
    scored = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n // 2, 0.98).otherwise(0.02).alias(
            "quality_prob"
        ),
    )
    out = pareto_select(scored).groupBy("quality_prob").agg(
        F.avg(F.col("kept").cast("double")).alias("rate")
    )
    rates = {r["quality_prob"]: r["rate"] for r in out.collect()}
    # analytic keep rates: P(pareto(9) > 1-s) = (2-s)^-9
    # s=0.98 -> 1.02^-9 ~ 0.837;  s=0.02 -> 1.98^-9 ~ 0.002
    assert 0.78 < rates[0.98] < 0.90
    assert rates[0.02] < 0.02
    # deterministic: the same seed replays the exact keep set
    k1 = pareto_select(scored).filter("kept").select("doc_id").collect()
    k2 = pareto_select(scored).filter("kept").select("doc_id").collect()
    assert sorted(r[0] for r in k1) == sorted(r[0] for r in k2)
    # a different seed replays deterministically too, and the xxhash64
    # uniform keeps full 31-bit resolution (the coarse double-pmod
    # quantization would collapse distinct draws — ADVICE r8): the two
    # seeds must not produce an identical keep set on 2k docs
    k3 = pareto_select(scored, seed=7).filter("kept").select("doc_id").collect()
    k3b = pareto_select(scored, seed=7).filter("kept").select("doc_id").collect()
    assert sorted(r[0] for r in k3) == sorted(r[0] for r in k3b)
    assert sorted(r[0] for r in k3) != sorted(r[0] for r in k1)


def test_curate_documents_model_gate(corpus):
    """The trained filter composes into the shared curation transform
    (streaming/ingest.curate_documents): rules first, then the model
    gate — stateless, so stream==batch parity is by construction."""
    from hbase_spark.streaming.ingest import curate_documents

    clf = train_quality_classifier(corpus, max_iter=25)
    docs = corpus.select("doc_id", "text")
    thr = curate_documents(
        docs, ruleset="gopher", classifier=clf, model_gate=0.5
    )
    assert "quality_prob" in thr.columns
    rows = thr.collect()
    assert all(r["quality_prob"] >= 0.5 for r in rows)
    # the pareto gate replays deterministically (same seed, same set)
    p1 = curate_documents(docs, classifier=clf).select("doc_id").collect()
    p2 = curate_documents(docs, classifier=clf).select("doc_id").collect()
    assert sorted(r[0] for r in p1) == sorted(r[0] for r in p2)


def test_portable_classifier_separates_and_replays(corpus, tmp_path):
    """The portable (md5-bucket, exported-weights) variant: same recipe,
    engine-replayable serving — must separate the planted corpus, score
    through a JVM-only shuffle-free plan, round-trip its plain-file
    fixture exactly, and agree with a pure-Python replay of the stored
    (bucket, weight) pairs (the same recomputation the DuckDB oracle
    twin does)."""
    import hashlib
    import math
    import re

    from hbase_spark.functions.classifier import (
        load_portable_quality_classifier,
        portable_quality_scores,
        save_portable_quality_classifier,
        train_quality_classifier_portable,
    )

    train = corpus.filter(F.col("doc_id") % 4 != 0)
    hold = corpus.filter(F.col("doc_id") % 4 == 0)
    clf = train_quality_classifier_portable(train, max_iter=25)
    got = portable_quality_scores(
        clf, hold, extra_cols=("label",)
    ).collect()
    acc = sum(
        1 for r in got if (r["quality_prob"] >= 0.5) == (r["label"] == 1.0)
    ) / len(got)
    assert acc >= 0.9, f"portable holdout accuracy {acc}"

    # serving plan: JVM-only, no shuffle (one map stage over docs)
    sdf = portable_quality_scores(clf, corpus)
    plan = sdf._jdf.queryExecution().analyzed().toString()
    assert "EvalPython" not in plan and "PythonUDF" not in plan
    phys = sdf._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in phys.split("Initial Plan")[0]

    # fixture round-trip: full-repr doubles survive the CSV exactly
    save_portable_quality_classifier(clf, str(tmp_path / "pq"))
    back = load_portable_quality_classifier(str(tmp_path / "pq"))
    assert back.weights == clf.weights
    assert back.intercept == clf.intercept
    assert (back.n, back.num_features) == (clf.n, clf.num_features)

    # independent replay of the stored pairs (what the SQL twin does)
    hold_rows = hold.select("doc_id", "text").collect()
    by_id = {r["doc_id"]: r["text"] for r in hold_rows}
    for r in got[:16]:
        toks = [t for t in re.split(r"[^a-z0-9]+", by_id[r["doc_id"]].lower()) if t]
        grams = toks + [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ]
        buckets = {
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
            % clf.num_features
            for g in grams
        }
        z = clf.intercept + sum(clf.weights[b] for b in buckets)
        assert r["quality_prob"] == pytest.approx(
            1.0 / (1.0 + math.exp(-z)), abs=1e-12
        )


def test_save_load_roundtrip(corpus, tmp_path):
    from hbase_spark.functions.classifier import (
        load_quality_classifier,
        save_quality_classifier,
    )

    clf = train_quality_classifier(corpus, max_iter=10)
    save_quality_classifier(clf, str(tmp_path / "qclf"))
    back = load_quality_classifier(str(tmp_path / "qclf"))
    assert (back.n, back.num_features, back.binary) == (
        clf.n, clf.num_features, clf.binary,
    )
    a = quality_scores(clf, corpus).orderBy("doc_id").collect()
    b = quality_scores(back, corpus).orderBy("doc_id").collect()
    assert [r["quality_prob"] for r in a] == [r["quality_prob"] for r in b]
