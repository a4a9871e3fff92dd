"""Trained quality classification — the model-based filter slot of
published pretraining pipelines.

GPT-3 trained a logistic-regression classifier over hashed word
features to score CommonCrawl documents against a high-quality
reference, then kept documents by a Pareto-thresholded lottery on the
score (Brown et al. 2020, Appendix A); CC-Net discriminates crawl text
from a trusted reference the same way (Wenzek et al. 2020), and DCLM's
strongest single filter is a fastText classifier over word [1,2]-grams
(Li et al. 2024).  This module is that recipe, Spark-first:

- **featurization** is the same JVM word-[1..n]-gram expression stack
  the DSIR operators use (``lm._gram_strings`` over the shared ASCII
  tokenizer), hashed by Spark ML's ``HashingTF`` — murmur3 on the JVM,
  no Python anywhere;
- **training** is MLlib ``LogisticRegression``: distributed LBFGS
  whose every iteration is one treeAggregate gradient pass (the same
  partial/final split as any Catalyst aggregate).  At 100 TB the
  classifier trains on a bounded sample — the published recipes train
  on 1e5-1e6 labeled docs, not the corpus — so the training frame is
  capped by a deterministic hash subsample, never ``limit()``
  (partition-order-dependent) and never a full-corpus LBFGS;
- **scoring** is ``model.transform``: one map stage over the corpus
  with the coefficient vector (8 bytes x ``num_features``; 2 MB at the
  2^18 default) shipped once per executor as a broadcast, no shuffle
  at all;
- **selection** is the GPT-3 Pareto lottery as a pure Catalyst
  expression with a SEEDED per-document uniform (md5-free xxhash64
  scheme — deterministic across retries/partitionings, the same
  discipline as text.seeded_shuffle).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lm import _gram_strings
from .text import _ascii_tokens


@dataclass
class QualityClassifier:
    """A fitted quality model: the MLlib LR model plus the
    featurization config scoring must replay exactly."""

    model: object  # pyspark.ml.classification.LogisticRegressionModel
    n: int
    num_features: int
    binary: bool


def _gram_frame(
    docs: DataFrame, text_col: str, n: int, keep: list[str]
) -> DataFrame:
    """(keep..., _grams) with word 1..n-grams as one array column.
    Two projection stages so the tokenizer's split materializes once
    (the O(tokens^2) re-split trap documented in
    text.duplicate_ngram_stats)."""
    base = docs.select(*keep, _ascii_tokens(text_col).alias("_t"))
    return base.select(
        *keep,
        F.concat(
            *[_gram_strings(F.col("_t"), k) for k in range(1, n + 1)]
        ).alias("_grams"),
    )


def train_quality_classifier(
    labeled: DataFrame,
    *,
    label_col: str = "label",
    text_col: str = "text",
    n: int = 2,
    num_features: int = 1 << 18,
    binary: bool = True,
    max_iter: int = 100,
    reg_param: float = 0.01,
    elastic_net: float = 0.0,
    train_cap: int = 1_000_000,
    seed: int = 0,
) -> QualityClassifier:
    """Fit the GPT-3-style quality LR on a labeled document frame
    (``label_col``: 1.0 = high-quality reference, 0.0 = raw crawl).

    ``train_cap`` bounds the frame LBFGS iterates over: past the cap,
    rows are kept by ``xxhash64(text, seed) % stride == 0`` — a
    deterministic content-hash subsample (the published classifiers
    train on a reference-vs-crawl SAMPLE; iterating LBFGS over 100 TB
    would be 50 full-corpus scans for no accuracy gain).  One count()
    decides the stride; everything else is lazy until ``fit``.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    rows = labeled.count()
    if rows > train_cap:
        stride = -(-rows // train_cap)  # ceil
        labeled = labeled.filter(
            F.pmod(F.xxhash64(F.col(text_col), F.lit(seed)), F.lit(stride))
            == 0
        )
    # Size the fit's partition count to the SAMPLE (optimization guide
    # §5 + §2.5): every LBFGS iteration runs a treeAggregate whose
    # per-task payload is a dense num_features-sized gradient (2 MiB at
    # 2^18), so an over-partitioned small sample pays maxIter x
    # partitions x 2 MiB of aggregation for no compute win — measured
    # 2x on the fit (32 partitions 21.8s vs 4 partitions 10.7s for a
    # 5k-doc sample; the fitted model came out identical) — while an
    # UNDER-partitioned one (a single input file) serializes the
    # gradient math.  ~2k rows per gradient task, capped at the
    # cluster's parallelism; the shuffled frame is the capped sample,
    # never the corpus.
    est = min(rows, train_cap)
    fit_parts = max(1, min(
        -(-est // 2048),
        labeled.sparkSession.sparkContext.defaultParallelism,
    ))
    frame = _gram_frame(
        labeled.repartition(fit_parts), text_col, n, keep=[label_col]
    ).withColumn(
        label_col, F.col(label_col).cast("double")
    )
    tf = HashingTF(
        inputCol="_grams",
        outputCol="_features",
        numFeatures=num_features,
        # gram PRESENCE, like fastText's bag — with raw counts the
        # boilerplate class's repeated tokens dominate the gradient
        binary=binary,
    )
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol=label_col,
        maxIter=max_iter,
        # a little L2 matters here: with reg=0, LBFGS piles weight on
        # the grams specific to each training document and held-out
        # docs of the SAME quality lose their margin (measured:
        # holdout acc 0.5 -> 1.0 at 0.01 on a planted split corpus);
        # standardization is left OFF so hashed presence features
        # keep one scale and the penalty means the same thing for all
        regParam=reg_param,
        elasticNetParam=elastic_net,
        standardization=False,
    )
    model = lr.fit(tf.transform(frame))
    return QualityClassifier(
        model=model, n=n, num_features=num_features, binary=binary
    )


def save_quality_classifier(clf: QualityClassifier, path: str) -> None:
    """Persist the fitted model + featurization config — the
    train-once/serve-forever layout, like the persisted IVF-PQ index:
    the MLlib model writes its own parquet directory, the config rides
    in a JSON sidecar (NOT ``_``-prefixed — Hadoop input formats treat
    those as hidden)."""
    import json
    import os

    clf.model.write().overwrite().save(os.path.join(path, "model"))
    with open(os.path.join(path, "classifier-config.json"), "w") as fh:
        json.dump(
            {"n": clf.n, "num_features": clf.num_features,
             "binary": clf.binary},
            fh,
        )


def load_quality_classifier(path: str) -> QualityClassifier:
    """Inverse of ``save_quality_classifier``."""
    import json
    import os

    from pyspark.ml.classification import LogisticRegressionModel

    with open(os.path.join(path, "classifier-config.json")) as fh:
        cfg = json.load(fh)
    model = LogisticRegressionModel.load(os.path.join(path, "model"))
    return QualityClassifier(model=model, **cfg)


def with_quality_prob(
    clf: QualityClassifier,
    docs: DataFrame,
    *,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """``docs`` with ``out_col`` = P(label=1) appended, every original
    column kept — the composable form the streaming curation pipeline
    gates on.  One JVM map stage: HashingTF + the LR transform
    (coefficients broadcast internally); the probability vector
    unpacks via ``vector_to_array``, still JVM-side."""
    from pyspark.ml.feature import HashingTF
    from pyspark.ml.functions import vector_to_array

    cols = list(docs.columns)
    tf = HashingTF(
        inputCol="_grams",
        outputCol="_features",
        numFeatures=clf.num_features,
        binary=clf.binary,
    )
    frame = tf.transform(_gram_frame(docs, text_col, clf.n, keep=cols))
    scored = clf.model.transform(frame)
    return scored.select(
        *cols,
        vector_to_array(F.col(clf.model.getProbabilityCol()))[1].alias(
            out_col
        ),
    )


def quality_scores(
    clf: QualityClassifier,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple = (),
) -> DataFrame:
    """(id, extra..., quality_prob) for every document — the skinny
    projection of ``with_quality_prob``."""
    keep = docs.select(id_col, *extra_cols, text_col)
    return with_quality_prob(clf, keep, text_col=text_col).select(
        id_col, *extra_cols, "quality_prob"
    )


@dataclass
class PortableQualityClassifier:
    """A fitted quality LR in engine-portable form: a plain
    (bucket -> weight) table + intercept over the md5 feature-bucket
    scheme (``lm._bucket(portable=True)``), so ANY engine with md5 can
    replay every score bit-for-bit from the exported weights — the
    audit/replay companion to the murmur3 ``QualityClassifier`` (which
    is faster to featurize but JVM-only).  Scoring needs no MLlib at
    runtime: it is one Catalyst map stage."""

    weights: list[float]  # len == num_features, bucket-indexed
    intercept: float
    n: int
    num_features: int


def _portable_buckets(
    docs: DataFrame, text_col: str, n: int, num_features: int,
    keep: list[str],
) -> DataFrame:
    """(keep..., _buckets) with the DISTINCT md5 feature buckets of the
    word 1..n grams — binary presence, the same bag semantics as the
    HashingTF path's ``binary=True``.  Pure array expressions: one map
    stage, text never shuffles."""
    from .lm import _bucket

    g = _gram_frame(docs, text_col, n, keep)
    return g.select(
        *keep,
        F.array_distinct(
            F.transform(
                "_grams", lambda s: _bucket(s, num_features, True)
            )
        ).alias("_buckets"),
    )


def train_quality_classifier_portable(
    labeled: DataFrame,
    *,
    label_col: str = "label",
    text_col: str = "text",
    n: int = 2,
    num_features: int = 2048,
    max_iter: int = 100,
    reg_param: float = 0.01,
    elastic_net: float = 0.0,
    train_cap: int = 1_000_000,
    seed: int = 0,
) -> PortableQualityClassifier:
    """``train_quality_classifier`` over the portable md5 buckets,
    returning the exported-weights form.  The default width is smaller
    (2^11 vs 2^18): the portable model exists to be serialized into
    replay oracles and cross-engine audits, so its weight table should
    stay human-sized; murmur3/2^18 remains the production default.

    The presence vector is built JVM-side (sequence + exists, then
    ``array_to_vector``) — O(num_features x doc_buckets) per row, which
    only ever runs over the hash-capped training sample, never the
    corpus."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    rows = labeled.count()
    if rows > train_cap:
        stride = -(-rows // train_cap)  # ceil
        labeled = labeled.filter(
            F.pmod(F.xxhash64(F.col(text_col), F.lit(seed)), F.lit(stride))
            == 0
        )
    b = _portable_buckets(
        labeled, text_col, n, num_features, keep=[label_col]
    )
    frame = b.select(
        F.col(label_col).cast("double").alias(label_col),
        array_to_vector(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_features - 1)),
                lambda i: F.exists(
                    "_buckets", lambda bk: bk == i
                ).cast("double"),
            )
        ).alias("_features"),
    )
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        elasticNetParam=elastic_net,
        standardization=False,
    )
    model = lr.fit(frame)
    return PortableQualityClassifier(
        weights=[float(w) for w in model.coefficients.toArray()],
        intercept=float(model.intercept),
        n=n,
        num_features=num_features,
    )


def save_portable_quality_classifier(
    clf: PortableQualityClassifier, path: str
) -> None:
    """Plain-file layout (no Spark needed on either end): weights.csv
    with full-repr doubles (round-trip exact) + a JSON config sidecar.
    This is the fixture an SQL replay oracle reads its (bucket, weight)
    pairs from."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "weights.csv"), "w") as fh:
        fh.write("bucket,weight\n")
        for i, w in enumerate(clf.weights):
            fh.write(f"{i},{w!r}\n")
    with open(os.path.join(path, "portable-config.json"), "w") as fh:
        json.dump(
            {"intercept": repr(clf.intercept), "n": clf.n,
             "num_features": clf.num_features},
            fh,
        )


def load_portable_quality_classifier(path: str) -> PortableQualityClassifier:
    """Inverse of ``save_portable_quality_classifier``."""
    import json
    import os

    with open(os.path.join(path, "portable-config.json")) as fh:
        cfg = json.load(fh)
    weights = [0.0] * cfg["num_features"]
    with open(os.path.join(path, "weights.csv")) as fh:
        next(fh)
        for line in fh:
            b, w = line.rstrip("\n").split(",")
            weights[int(b)] = float(w)
    return PortableQualityClassifier(
        weights=weights,
        intercept=float(cfg["intercept"]),
        n=cfg["n"],
        num_features=cfg["num_features"],
    )


def portable_quality_scores(
    clf: PortableQualityClassifier,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "quality_prob",
    extra_cols: tuple = (),
) -> DataFrame:
    """Score documents with an exported portable model — ONE shuffle-
    free Catalyst map stage: the weight table ships as a single array
    literal in the plan (16 KB at the 2048 default), the per-doc score
    is an ``aggregate`` fold over the distinct buckets, and the sigmoid
    closes it.  No MLlib, no join, no Python."""
    b = _portable_buckets(
        docs, text_col, clf.n, clf.num_features,
        keep=[id_col, *extra_cols],
    )
    w = F.lit(clf.weights)
    z = F.lit(clf.intercept) + F.aggregate(
        "_buckets",
        F.lit(0.0),
        lambda acc, bk: acc + F.get(w, bk.cast("int")),
    )
    return b.select(
        id_col,
        *extra_cols,
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias(out_col),
    )


def pareto_select(
    scored: DataFrame,
    *,
    alpha: float = 9.0,
    seed: int = 0,
    id_col: str = "doc_id",
    score_col: str = "quality_prob",
    portable: bool = False,
) -> DataFrame:
    """GPT-3's quality lottery (Brown et al. 2020, Appendix A): keep a
    document iff ``pareto(alpha) > 1 - score`` — high-scoring docs are
    almost always kept, low-scoring docs survive with small probability
    (so the filtered corpus keeps SOME long-tail text instead of
    collapsing onto the reference distribution).

    The Pareto draw is the inverse-CDF transform ``u^(-1/alpha) - 1``
    of a SEEDED per-document uniform (xxhash64 of the id — stable
    across retries, partitionings, and sessions, unlike ``F.rand``
    whose draw depends on partition layout).  Pure Catalyst expression;
    adds a ``kept`` column — filter or audit downstream.

    ``portable=True`` draws the uniform from the md5 scheme the other
    seeded operators use (first 32 bits of ``md5(id || ':seed:pareto')``)
    so a SQL oracle can replay every keep decision bit-for-bit —
    slower (md5 vs xxhash64) but engine-portable."""
    if portable:
        bits = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(id_col).cast("string"),
                        F.lit(f":{seed}:pareto"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        u = (bits + F.lit(1.0)) / F.lit(float(1 << 32))  # (0, 1]
    else:
        # pmod in INTEGER space, cast after: a double modulus coerces
        # the 64-bit hash to double first, and mantissa rounding at
        # ~2^63 magnitude quantizes the uniform to ~2^20 distinct
        # values; the long pmod keeps the full 31-bit resolution
        bits = F.pmod(
            F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)),
            F.lit(1 << 31),
        ).cast("double")
        u = (bits + F.lit(1.0)) / F.lit(float(1 << 31))  # (0, 1]
    draw = F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return scored.withColumn(
        "kept", draw > (F.lit(1.0) - F.col(score_col))
    )
