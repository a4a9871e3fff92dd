"""Statistical language-model operators for corpus curation.

Two classic, fully-distributable models that published pretraining
pipelines run at corpus scale, expressed as pure DataFrame plans:

- **Bigram LM perplexity filtering** (the CC-Net recipe, Wenzek et
  al. 2020: score every crawled document with an n-gram LM trained on
  a trusted reference corpus, then keep/bucket by perplexity).  The
  reference pipeline uses a KenLM 5-gram; the distributable analog
  here is an add-k-smoothed bigram model whose training is one
  map-side-combinable hash-agg over gram hashes and whose scoring is
  two hash-joins — no model file, no Python in the hot path.

- **Multinomial Naive Bayes text classification** (the
  "Wikipedia-like" quality / language classifier slot of the GPT-3 and
  CC-Net pipelines).  Training is two hash-aggs (class priors,
  word-class counts); scoring is a broadcast of the class list, one
  join against the count table, and an argmax — all counts integer,
  all smoothing add-k, so a SQL oracle can reproduce every decision.

Scale shape (100 TB posture): tokens and grams travel as 8-byte
xxhash64 values — document text is tokenized in a map stage and never
crosses an exchange.  The trained "models" are count DataFrames
(vocab-bounded aggregates, not corpus-sized), so they behave like
dimension tables: Spark broadcasts them when small and shuffle-joins
on the hash key when not.  Scoring never collects anything to the
driver; scalar statistics (vocab size, class totals) ride along as
1-row/¦classes¦-row frames cross-joined into the plan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import _ascii_tokens


def _tok_frame(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) pairs, one row per token OCCURRENCE, tokenized
    map-side with the portable ASCII tokenizer shared by every oracle.
    Two projection stages so the split materializes once (the
    O(tokens^2) re-split trap documented in text.duplicate_ngram_stats).
    """
    base = docs.select(F.col(id_col), _ascii_tokens(text_col).alias("_t"))
    return base.select(id_col, F.explode("_t").alias("_w"))


# --------------------------------------------------------------------
# Bigram LM (CC-Net-style perplexity filtering)
# --------------------------------------------------------------------


@dataclass
class BigramLM:
    """A trained add-k bigram model: three count frames.

    ``unigrams`` — (w1 hash, c1) context counts; ``bigrams`` —
    (bigram hash, c12); ``stats`` — a single row (vocab_size,
    n_tokens).  All aggregates: the model's size is bounded by the
    reference-corpus vocabulary, never by the scored corpus.
    """

    unigrams: DataFrame
    bigrams: DataFrame
    stats: DataFrame
    add_k: float = 1.0


def train_bigram_lm(
    ref_docs: DataFrame,
    *,
    text_col: str = "text",
    add_k: float = 1.0,
) -> BigramLM:
    """Train the bigram LM on a reference corpus (CC-Net trains one
    LM per language on Wikipedia; pass the trusted subset here).

    One pass: tokenize map-side, hash-agg unigram and bigram counts on
    xxhash64 keys.  Only (hash, count) pairs shuffle.
    """
    base = ref_docs.select(_ascii_tokens(text_col).alias("_t"))
    uni = (
        base.select(F.explode("_t").alias("_w"))
        .groupBy(F.xxhash64("_w").alias("h1"))
        .agg(F.count("*").alias("c1"))
    )
    # Bigram occurrences: positions 1..n-1 of each doc, as "w1 w2".
    bi = (
        base.select(
            F.explode(
                F.when(
                    F.size("_t") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("_t") - 1),
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at("_t", i),
                            F.element_at("_t", i + 1),
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("_g")
        )
        .groupBy(F.xxhash64("_g").alias("h12"))
        .agg(F.count("*").alias("c12"))
    )
    stats = uni.agg(
        F.count("*").cast("long").alias("vocab_size"),
        F.sum("c1").cast("long").alias("n_tokens"),
    )
    return BigramLM(unigrams=uni, bigrams=bi, stats=stats, add_k=add_k)


def lm_score(
    docs: DataFrame,
    lm: BigramLM,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against the trained LM — the CC-Net filtering
    signal.  Per document:

    - ``n_bigrams`` — scored positions (token count - 1; 0 for docs
      shorter than 2 tokens, which get NULL perplexity),
    - ``n_oov_bigrams`` — positions whose bigram the reference corpus
      never saw (integer, exact),
    - ``sum_c12`` / ``sum_c1`` — total matched bigram / context mass
      (integers, exact — these pin the training counts and the join),
    - ``log_ppl`` — add-k perplexity in log space:
      ``-avg log p(w2|w1)`` with
      ``p = (c12 + k) / (c1 + k * vocab_size)``,
    - ``ppl = exp(log_ppl)``.

    Plan: explode positions map-side, two left hash-joins on 8-byte
    gram hashes, one hash-agg back to documents, scalar stats
    cross-joined (1-row broadcast).  Nothing collects to the driver.
    """
    base = docs.select(F.col(id_col), _ascii_tokens(text_col).alias("_t"))
    pos = base.select(
        id_col,
        F.explode(
            F.when(
                F.size("_t") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - 1),
                    lambda i: F.struct(
                        F.xxhash64(
                            F.concat_ws(
                                " ",
                                F.element_at("_t", i),
                                F.element_at("_t", i + 1),
                            )
                        ).alias("h12"),
                        F.xxhash64(F.element_at("_t", i)).alias("h1"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<h12:long,h1:long>>"))
        ).alias("_p"),
    ).select(id_col, F.col("_p.h12").alias("h12"), F.col("_p.h1").alias("h1"))
    joined = (
        pos.join(lm.bigrams, "h12", "left")
        .join(lm.unigrams, "h1", "left")
        .select(
            id_col,
            F.coalesce("c12", F.lit(0)).alias("c12"),
            F.coalesce("c1", F.lit(0)).alias("c1"),
        )
    )
    k = float(lm.add_k)
    stats = lm.stats.select("vocab_size")
    scored = (
        joined.crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum((F.col("c12") == 0).cast("long")).alias("n_oov_bigrams"),
            F.sum("c12").cast("long").alias("sum_c12"),
            F.sum("c1").cast("long").alias("sum_c1"),
            F.sum(
                F.log(F.col("c12") + F.lit(k))
                - F.log(F.col("c1") + F.lit(k) * F.col("vocab_size"))
            ).alias("_sum_logp"),
        )
    )
    out = docs.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("n_oov_bigrams", F.lit(0)).cast("long").alias(
            "n_oov_bigrams"
        ),
        F.coalesce("sum_c12", F.lit(0)).cast("long").alias("sum_c12"),
        F.coalesce("sum_c1", F.lit(0)).cast("long").alias("sum_c1"),
        (-F.col("_sum_logp") / F.col("n_bigrams")).alias("log_ppl"),
    )
    return out.withColumn("ppl", F.exp("log_ppl"))


def perplexity_bucket(
    scored: DataFrame,
    *,
    head: float,
    tail: float,
    col: str = "log_ppl",
) -> DataFrame:
    """CC-Net's head/middle/tail split at fixed log-perplexity
    thresholds (the paper derives them as percentiles of the scored
    reference distribution; pass those numbers in — recomputing
    percentiles inline would make the output depend on approximate
    quantile internals).  NULL (too-short docs) buckets as 'tail'.
    """
    c = F.col(col)
    return scored.withColumn(
        "ppl_bucket",
        F.when(c.isNull(), "tail")
        .when(c <= F.lit(head), "head")
        .when(c <= F.lit(tail), "middle")
        .otherwise("tail"),
    )


# --------------------------------------------------------------------
# Multinomial Naive Bayes (quality / language classifier)
# --------------------------------------------------------------------


@dataclass
class NaiveBayesModel:
    """Count frames of a trained multinomial NB classifier.

    ``classes`` — (label, n_docs, n_tokens) priors + class token
    totals; ``word_class`` — (word hash, label, c_wc); ``stats`` —
    1 row (vocab_size, n_docs_total).
    """

    classes: DataFrame
    word_class: DataFrame
    stats: DataFrame
    add_k: float = 1.0


def train_naive_bayes(
    docs: DataFrame,
    *,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 1.0,
) -> NaiveBayesModel:
    """Train multinomial NB from labeled documents: two hash-aggs.
    Only (word hash, label, count) rows shuffle; the model is
    vocab × classes aggregates, never corpus-sized.
    """
    tok = docs.select(
        F.col(label_col).alias("label"), _ascii_tokens(text_col).alias("_t")
    )
    word_class = (
        tok.select("label", F.explode("_t").alias("_w"))
        .groupBy(F.xxhash64("_w").alias("hw"), "label")
        .agg(F.count("*").alias("c_wc"))
    )
    classes = tok.groupBy("label").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size("_t")).cast("long").alias("n_tokens"),
    )
    stats = word_class.agg(
        F.count_distinct("hw").cast("long").alias("vocab_size")
    ).crossJoin(
        classes.agg(F.sum("n_docs").cast("long").alias("n_docs_total"))
    )
    return NaiveBayesModel(
        classes=classes, word_class=word_class, stats=stats, add_k=add_k
    )


def nb_classify(
    docs: DataFrame,
    model: NaiveBayesModel,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_margin: float | None = None,
) -> DataFrame:
    """Classify documents: argmax over classes of
    ``log P(c) + sum_w log P(w|c)`` with add-k smoothing
    ``P(w|c) = (c_wc + k) / (n_tokens_c + k * vocab_size)``.

    Output: (id, pred, score, margin) — ``margin`` is the winner's
    lead in log space over the runner-up (+inf for a single class).
    ``min_margin`` arms an in-plan gate: any document whose decision
    is closer than the threshold fails the job instead of silently
    returning an engine-dependent argmax — the contract that makes the
    discrete prediction hash-checkable across engines (same pattern as
    the ANN recall gates).

    Plan: token occurrences cross-joined with the (tiny, broadcast)
    class frame, one left join on (word hash, label), hash-agg to
    (doc, class), argmax via max_by over a (score, label) struct —
    deterministic tie-break on the label, though the gate makes ties a
    failure, not a coin flip.  OOV words score k / (n_tokens_c + kV)
    like any unseen-in-class word, the standard multinomial-NB
    convention.  Token-LESS documents carry no evidence and are absent
    from the output — left-join the result back onto the corpus and
    default to the majority prior if you need total coverage.
    """
    tok = _tok_frame(docs, id_col, text_col).select(
        id_col, F.xxhash64("_w").alias("hw")
    )
    cls = model.classes.crossJoin(F.broadcast(model.stats))
    k = float(model.add_k)
    per_word = (
        tok.crossJoin(F.broadcast(cls.select("label")))
        .join(model.word_class, ["hw", "label"], "left")
        .groupBy(id_col, "label")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(
                F.log(F.coalesce("c_wc", F.lit(0)) + F.lit(k))
            ).alias("_sum_log_num"),
        )
    )
    scored = (
        per_word.join(F.broadcast(cls), "label")
        .select(
            id_col,
            "label",
            (
                F.log(F.col("n_docs") / F.col("n_docs_total"))
                + F.col("_sum_log_num")
                - F.col("n_words")
                * F.log(
                    F.col("n_tokens") + F.lit(k) * F.col("vocab_size")
                )
            ).alias("score"),
        )
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct("score", "label")).alias("_best"),
        F.count("*").alias("_n_cls"),
        F.max("score").alias("_s1"),
        F.sort_array(F.collect_list("score"), asc=False).alias("_scores"),
    )
    out = best.select(
        id_col,
        F.col("_best.label").alias("pred"),
        F.col("_best.score").alias("score"),
        F.when(F.col("_n_cls") > 1, F.col("_s1") - F.element_at("_scores", 2))
        .otherwise(F.lit(float("inf")))
        .alias("margin"),
    )
    if min_margin is not None:
        out = out.select(
            id_col,
            F.when(
                F.col("margin") < F.lit(float(min_margin)),
                F.raise_error(
                    F.concat(
                        F.lit("nb_classify margin below gate: "),
                        F.col("margin").cast("string"),
                    )
                ),
            )
            .otherwise(F.col("pred"))
            .alias("pred"),
            "score",
            "margin",
        )
    return out
