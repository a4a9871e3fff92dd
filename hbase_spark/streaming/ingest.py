"""Streaming corpus ingestion: crawl drop → curated document store.

The end-to-end ingest-as-it-lands pipeline a training-data platform
runs continuously, composed from pieces that are each already tested
and (where portable) oracle-checked in batch form:

    stream_warc (checkpointed archive discovery, sources/warc.py)
      → warc_documents (records → the curation `documents` shape)
      → stream_url_dedup (canonical-URL first-seen within watermark)
      → gopher_filter + quality/token columns (functions/text.py)
      → foreachBatch parquet append (exactly-once per archive via the
        stream checkpoint, same discipline as streaming/merge.py)

Scale shape: one task per archive end-to-end (WARC gzip members are
not splittable — the parallelism unit every crawl consumer uses);
dedup state is 8 bytes per URL within the watermark horizon; the
quality gate is pure codegen column arithmetic; the sink appends
columnar files partitioned however the downstream layout wants them.
Nothing in the hot path collects, and the only shuffle is the
dropDuplicates state exchange on an 8-byte key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate_documents(
    docs: DataFrame,
    *,
    min_tokens: int = 0,
    ruleset: str = "gopher",
    classifier=None,
    model_gate: float | str = "pareto",
    seed: int = 0,
) -> DataFrame:
    """The batch curation transform shared by the streaming pipeline
    and any backfill job (stream/batch parity by construction — the
    same plan fragment runs in both): quality-rule keep flag, language
    ID, token count, and fingerprint columns appended to the documents
    frame; rows below ``min_tokens`` or failing the quality gate are
    dropped.  ``ruleset`` picks the gate: 'gopher' (Rae et al. 2021),
    'c4' (Raffel et al. 2020 — also line-cleans the text), or 'both'
    (C4 line cleaning, then both page gates must pass).  The keep
    verdict is always ``quality_keep``; the legacy ``gopher_keep``
    name is emitted only when the Gopher rules were actually
    evaluated ('gopher'/'both') so the column never carries a
    different rule set's decision.  Note the C4 rulesets add C4's
    audit columns (n_lines, rule bits, ...) — the output schema is a
    function of the ruleset, so don't switch rulesets mid-checkpoint
    against an existing parquet sink.

    ``classifier``: an optional trained ``QualityClassifier``
    (functions/classifier.py) applied AFTER the rule gates — the
    GPT-3 arrangement (rules remove the mechanical junk, the model
    scores what remains).  Scoring is a stateless JVM map stage, so
    stream==batch parity is by construction, like every other hop of
    this transform.  ``model_gate``: 'pareto' (default) keeps by the
    seeded Pareto lottery on the doc_id — deterministic, so a
    re-delivered document gets the same verdict in every micro-batch;
    a float keeps ``quality_prob >= model_gate``.  Either way the
    surviving rows carry ``quality_prob`` for downstream mixing."""
    from hbase_spark.functions.text import (
        c4_clean,
        fingerprint,
        gopher_rules,
        lang_id,
        token_count,
    )

    if ruleset not in ("gopher", "c4", "both"):
        raise ValueError(f"bad ruleset {ruleset!r}")
    out = docs
    keep = None
    if ruleset in ("c4", "both"):
        # Clean into a temp column, then swap: with out_col='text' the
        # audit expressions (n_sentences, page-rule bits) would resolve
        # against the already-cleaned text — correct today only because
        # the line filter is idempotent, and silently skewed the moment
        # a non-idempotent line rule lands.
        out = (
            c4_clean(out, out_col="_c4_text")
            .withColumnRenamed("keep", "_c4_keep")
            .drop("text")
            .withColumnRenamed("_c4_text", "text")
        )
        keep = F.col("_c4_keep")
    if ruleset in ("gopher", "both"):
        rules = gopher_rules("text")
        g = None
        for c in rules.values():
            g = c if g is None else (g & c)
        keep = g if keep is None else (keep & g)
    out = (
        out.withColumn("lang_pred", lang_id("text"))
        .withColumn("n_tokens", token_count("text"))
        .withColumn("fp", fingerprint("text"))
        .withColumn("quality_keep", keep)
    )
    if ruleset in ("gopher", "both"):
        # back-compat alias — only when Gopher actually gated
        out = out.withColumn("gopher_keep", F.col("quality_keep"))
    if "_c4_keep" in out.columns:
        out = out.drop("_c4_keep")
    out = out.filter(
        F.col("quality_keep") & (F.col("n_tokens") >= F.lit(min_tokens))
    )
    if classifier is not None:
        from hbase_spark.functions.classifier import (
            pareto_select,
            with_quality_prob,
        )

        out = with_quality_prob(classifier, out)
        if model_gate == "pareto":
            out = pareto_select(out, seed=seed).filter("kept").drop("kept")
        else:
            out = out.filter(F.col("quality_prob") >= F.lit(float(model_gate)))
    return out


def stream_curate_warc(
    spark: SparkSession,
    crawl_dir: str,
    out_dir: str,
    checkpoint: str,
    *,
    watermark: str = "1 hour",
    min_tokens: int = 0,
    max_files_per_trigger: int | None = None,
):
    """Wire the full ingest pipeline and return the started streaming
    query: WARC archives landing under ``crawl_dir`` become curated,
    URL-deduped parquet documents under ``out_dir``.  Stop the
    returned query to pause ingestion; the checkpoint resumes it
    exactly-once per archive.

    URL dedup keys on the canonical form of the record's target URI;
    event time is the WARC-Date header, so a frontier that re-delivers
    a page (or its tracking-param variants) within the watermark
    horizon emits it once.
    """
    from hbase_spark.sources.warc import stream_warc, warc_documents
    from hbase_spark.streaming.dedup import stream_url_dedup

    records = stream_warc(
        spark, crawl_dir, max_files_per_trigger=max_files_per_trigger
    )
    # a record without a (parseable) WARC-Date must not feed a NULL
    # event time into the watermark, and epoch 0 is no better — Spark's
    # INITIAL watermark is epoch 0, so an epoch-0 row is already "late"
    # and silently dropped.  The standard fallback for missing event
    # time is arrival time (the micro-batch timestamp): always inside
    # the horizon, so the record ingests and dedups on first sight.
    docs = warc_documents(records, with_date=True).withColumn(
        "warc_ts",
        F.coalesce("warc_ts", F.unix_millis(F.current_timestamp())),
    )
    deduped = stream_url_dedup(
        docs,
        url_col="source",
        ts_col="warc_ts",
        watermark=watermark,
    ).drop("warc_ts")

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        curated = curate_documents(batch, min_tokens=min_tokens)
        curated.write.mode("append").parquet(out_dir)

    return (
        deduped.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _codepoint_encode(docs: DataFrame, *, id_col: str, text_col: str,
                      width: int = 40) -> DataFrame:
    """Default toy encoder (the portable scheme the pack oracle arm
    uses): first ``width`` characters become codepoint id arrays."""
    chars = F.filter(
        F.split(F.substring(text_col, 1, width), ""), lambda x: x != ""
    )
    return docs.select(
        F.col(id_col),
        F.transform(chars, lambda x: F.ascii(x)).alias("ids"),
    )


def export_training(
    spark: SparkSession,
    docs_dir: str,
    export_dir: str,
    *,
    encode=None,
    seq_len: int = 1024,
    shards: int = 8,
    seed: int = 0,
    eos_id: int | None = None,
    drop_last: bool = True,
    id_col: str = "doc_id",
) -> None:
    """ONE-SHOT training export of a curated document store: tokenize
    → ``pack_token_sequences`` → ``seeded_shuffle`` → shard-partitioned
    parquet under ``export_dir`` (overwrite).  Both hops order by the
    seeded md5 scheme, so the output is a pure function of the
    document SET — partitioning and write order cannot change a byte.

    This is the per-batch body of ``stream_export_training`` exposed
    as a batch call (same code path, so the stream==batch law is by
    construction): a deployment whose trainer only reads the export
    after ingest completes should run the curation STREAM without the
    export hop and call this once when it drains — one whole-corpus
    transpose instead of one per micro-batch.

    ``encode``: callable docs_frame -> (id_col, ids array<int>) frame;
    defaults to the portable codepoint toy encoder — swap in
    ``functions.bpe.bbpe_encode`` for a real tokenizer."""
    from hbase_spark.functions.text import (
        pack_token_sequences,
        seeded_shuffle,
    )

    enc_fn = encode or (
        lambda d: _codepoint_encode(d, id_col=id_col, text_col="text")
    )
    full = spark.read.parquet(docs_dir)  # the accumulated store
    packed = pack_token_sequences(
        enc_fn(full), seq_len=seq_len, shards=shards, seed=seed,
        eos_id=eos_id, drop_last=drop_last, id_col=id_col,
    )
    # epoch ordering over sequences: one scalar uid per sequence
    # (pack's shard/seq_id pair), then the seeded permutation; the
    # trainer reads shard files in pos order
    uid = (F.col("shard").cast("long") * (1 << 32) + F.col("seq_id"))
    ordered = seeded_shuffle(
        packed.withColumn("seq_uid", uid).drop("shard"),
        id_col="seq_uid", seed=seed, shards=shards,
    )
    (
        ordered.repartition("shard")
        .sortWithinPartitions("pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(export_dir)
    )


def stream_export_training(
    spark: SparkSession,
    docs_dir: str,
    export_dir: str,
    checkpoint: str,
    *,
    encode=None,
    seq_len: int = 1024,
    shards: int = 8,
    seed: int = 0,
    eos_id: int | None = None,
    drop_last: bool = True,
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = None,
    mode: str = "per_batch",
):
    """The training-export hops (tokenize → ``pack_token_sequences`` →
    ``seeded_shuffle``) running INSIDE the streaming ingest pipeline:
    as curated documents land under ``docs_dir`` (the
    ``stream_curate_warc`` sink), each micro-batch re-materializes the
    packed, epoch-ordered export of the ACCUMULATED store under
    ``export_dir`` (overwrite — the export is a whole-corpus
    transpose, so it is refreshed, not appended).  That per-batch
    refresh buys an always-current export at the cost of one
    corpus-sized job per micro-batch — size triggers accordingly.

    ``mode='on_drain'`` (round-8 verdict item 5) is the convenience
    for the common trainer posture — "the export is only read after
    ingest completes": the availableNow stream drains through the
    checkpoint WITHOUT exporting (each micro-batch is a committed
    no-op, so drop/duplicate accounting stays exactly-once), the call
    BLOCKS until termination, and the corpus transpose runs exactly
    once at the end — N micro-batches cost ONE export job instead of
    N.  Because the export is a pure function of the document set,
    the drain-once bytes equal both the per-batch final state and the
    batch ``export_training`` over the same store.

    The stream==batch law holds BYTE-EXACTLY here because both hops
    order by the seeded md5 scheme: the export is a pure function of
    the document SET — arrival order, micro-batch boundaries, and
    partitioning cannot change a byte, so after the stream drains,
    ``export_dir`` equals the batch export over the same corpus
    (pinned by tests/test_streaming.py).  Packing is deliberately NOT
    incremental per batch: a sequence may straddle documents from
    different micro-batches, and only the corpus-complete transpose
    assigns every token its deterministic (shard, seq, position).

    ``encode``: callable docs_frame -> (id_col, ids array<int>) frame;
    defaults to the portable codepoint toy encoder — swap in
    ``functions.bpe.bbpe_encode`` for a real tokenizer.  Returns the
    started availableNow query (``mode='per_batch'``) or the
    TERMINATED query after the single drain export
    (``mode='on_drain'``)."""
    if mode not in ("per_batch", "on_drain"):
        raise ValueError(f"mode must be per_batch|on_drain, got {mode!r}")
    schema = spark.read.parquet(docs_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir)

    def _export(batch: DataFrame, epoch_id: int) -> None:
        if mode == "per_batch":
            export_training(
                spark, docs_dir, export_dir, encode=encode,
                seq_len=seq_len, shards=shards, seed=seed, eos_id=eos_id,
                drop_last=drop_last, id_col=id_col,
            )
        # on_drain: the micro-batch commits as a no-op — the checkpoint
        # still advances exactly-once, only the transpose is deferred

    q = (
        stream.writeStream.foreachBatch(_export)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if mode == "on_drain":
        q.awaitTermination()
        export_training(
            spark, docs_dir, export_dir, encode=encode, seq_len=seq_len,
            shards=shards, seed=seed, eos_id=eos_id, drop_last=drop_last,
            id_col=id_col,
        )
    return q
