"""Streaming deduplication for continuous document ingestion.

The batch dedup operators (functions/dedup.py) assume the corpus is at
rest; a training-data ingestion pipeline also needs the STREAMING
shape: drop re-crawled / re-delivered documents as they arrive.  Spark
gives this natively as ``dropDuplicatesWithinWatermark`` — state is a
fingerprint set bounded by the watermark horizon, so the operator runs
forever at 100 TB/day without unbounded state (exactly the windowed
dedup discipline a crawler pipeline uses; re-deliveries are
overwhelmingly near-in-time, duplicates older than the horizon are
left to the periodic batch ``exact_dedup`` compaction pass).

No reference analog — this extends the engine's LLM-pipeline surface
(SURVEY.md §7.2 phase 6) to Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbase_spark.functions.text import normalize_text


def fingerprinted(stream: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Append the 64-bit content fingerprint (same normalization as the
    batch ``exact_dedup``: lowercase, collapse whitespace, strip
    non-alphanumerics — so stream and batch agree on what 'duplicate'
    means)."""
    return stream.withColumn("_fp", F.xxhash64(normalize_text(text_col)))


def stream_dedup(
    stream: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first-seen document per content fingerprint within the
    watermark horizon.

    ``ts_col`` is epoch-millis event time (CellFrame convention).
    State size is O(distinct fingerprints inside the horizon): 8-byte
    keys, evicted as the watermark advances — the bounded-state
    requirement for an always-on ingestion job.
    """
    with_ts = fingerprinted(stream, text_col=text_col).withColumn(
        "_event_time", F.timestamp_millis(F.col(ts_col))
    )
    return (
        with_ts.withWatermark("_event_time", watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        # output schema == input schema: both internals are dropped
        .drop("_event_time", "_fp")
    )


def batch_dedup_twin(
    stream_frame: DataFrame, *, text_col: str = "text", ts_col: str = "ts"
) -> DataFrame:
    """The batch definition the streaming operator must agree with on
    any finite prefix: the first-SEEN row per fingerprint — min ts,
    ties broken by the full row's natural order (min_by over a struct,
    deterministic; a bare dropDuplicates would keep an arbitrary row).
    Output schema == input schema, like ``stream_dedup``."""
    cols = stream_frame.columns
    payload = F.struct(*[F.col(c) for c in cols])
    ordering = F.struct(F.col(ts_col), *[F.col(c) for c in cols])
    return (
        fingerprinted(stream_frame, text_col=text_col)
        .groupBy("_fp")
        .agg(F.min_by(payload, ordering).alias("_row"))
        .select(*[F.col(f"_row.{c}").alias(c) for c in cols])
    )


def stream_url_dedup(
    stream: DataFrame,
    *,
    url_col: str = "url",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming URL-level dedup — the ingestion-time twin of the batch
    ``url_dedup`` (functions/text.py): keep the first-seen document per
    CANONICAL URL within the watermark horizon, so a crawl frontier
    that re-delivers tracking-param / fragment / case variants of one
    page emits it once.

    Same state discipline as ``stream_dedup``: the dedup key is the
    xxhash64 of the canonical URL (8-byte state entries, evicted at the
    horizon); canonicalization is the identical codegen rule chain the
    batch op uses, so stream and batch agree on what 'same URL' means.
    """
    from hbase_spark.functions.text import canonical_url

    with_key = stream.withColumn(
        "_uh", F.xxhash64(canonical_url(url_col))
    ).withColumn("_event_time", F.timestamp_millis(F.col(ts_col)))
    return (
        with_key.withWatermark("_event_time", watermark)
        .dropDuplicatesWithinWatermark(["_uh"])
        .drop("_event_time", "_uh")
    )
