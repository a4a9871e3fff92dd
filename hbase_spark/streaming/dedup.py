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


def stream_minhash_candidates(
    stream: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    cap: int = 1024,
    watermark: str = "1 hour",
    state_ttl_ms: int = 24 * 3_600_000,
) -> DataFrame:
    """Streaming MinHash near-dup detection — the batch
    ``minhash_candidates`` banding as an ingest-time operator: a new
    document becomes a candidate pair with EVERY earlier document that
    shares any LSH band bucket within the state horizon.  This is the
    near-dup twin of ``stream_dedup`` (exact) and ``stream_url_dedup``
    (URL): what a continuously-fed crawl actually wants, since batch
    near-dedup over the full corpus can't run per-arrival.

    Signatures and band buckets are computed MAP-SIDE with the exact
    SQL pipeline the batch path uses (``minhash_signatures`` +
    ``_band_bucket_expr`` — multi-arg xxhash64 gram hashes, one nested
    transform for the k slots, ``xxhash64(band, slots...)`` bucket
    hash), so stream and batch agree on what "same bucket" means — the
    stream==batch law is pytest-pinned.  The shared selectExpr form
    also keeps per-micro-batch query construction off the py4j
    round-trip path (the per-slot Column/lambda form this replaced
    cost seconds of driver time PER BATCH at 128 hashes).  State per bucket is a capped long-id list (first
    ``cap`` arrivals; later members still PAIR with the stored ones
    but stop being stored — the same truncation contract as the batch
    ``_capped_groups`` default), evicted ``state_ttl_ms`` after the
    bucket's latest event time once the watermark passes (event-time
    timeout).  Output: (a, b) candidate id pairs, a < b, distinct per
    micro-batch per bucket; the same pair can re-emit from another
    band's bucket — downstream exact-Jaccard verification (join the
    doc store, ``minhash_pairs``-style) naturally dedups.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    from hbase_spark.functions.dedup import (
        _band_bucket_expr,
        _ident,
        minhash_signatures,
    )

    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    sigs = minhash_signatures(
        stream, id_col=id_col, text_col=text_col,
        num_hashes=num_hashes, shingle_n=shingle_n,
        extra_cols=(ts_col,),
    ).selectExpr(
        "_id",
        f"CAST({_ident(ts_col)} AS LONG) AS _ts_ms",
        f"timestamp_millis({_ident(ts_col)}) AS _event_time",
        "_sig",
    )
    banded = sigs.selectExpr(
        "_id", "_ts_ms", "_event_time",
        _band_bucket_expr(num_hashes, bands),
    )

    out_schema = StructType(
        [StructField("a", LongType()), StructField("b", LongType())]
    )
    state_schema = StructType(
        [StructField("ids", ArrayType(LongType()))]
    )
    ttl = int(state_ttl_ms)

    def _fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        seen = list(state.get[0]) if state.exists else []
        frames = [p for p in pdfs]
        batch = (
            pd.concat(frames)
            if frames
            else pd.DataFrame(columns=["_id", "_ts_ms"])
        )
        new = sorted(set(int(x) for x in batch["_id"]) - set(seen))
        pairs = set()
        for x in new:
            for s in seen:
                pairs.add((min(x, s), max(x, s)))
        for i, x in enumerate(new):
            for y in new[i + 1:]:
                pairs.add((x, y))
        room = cap - len(seen)
        if room > 0:
            seen = seen + new[:room]
        state.update((seen,))
        if len(batch):
            # the raw epoch-millis column, NOT the converted
            # _event_time: Arrow hands timestamps over as
            # session-timezone-naive, and pandas' .timestamp() would
            # re-interpret them as UTC — shifting the timeout by the
            # zone offset under any non-UTC session timezone (and a
            # negative shift can land below the watermark and raise).
            latest = int(batch["_ts_ms"].max())
            state.setTimeoutTimestamp(latest + ttl)
        if pairs:
            ordered = sorted(pairs)
            yield pd.DataFrame(
                {"a": [p[0] for p in ordered], "b": [p[1] for p in ordered]}
            )

    return (
        banded.withWatermark("_event_time", watermark)
        .groupBy("_bucket")
        .applyInPandasWithState(
            _fn,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
