"""Streaming: the WAL / replication surface (SURVEY.md §2.10).

In HBase every mutation is durably logged (WAL append,
rs/HRegion.java:8377 doWALAppend) and replication tails that log
shipping edits to peers with tracked offsets
(server/replication/regionserver/ReplicationSource.java:87,
WALEntryStream.java:50).  The Spark-native shape: the mutation log IS
a Structured Streaming source of cell records; a foreachBatch merge
appends each micro-batch to the CellFrame table (tombstones included —
they're data), and sink checkpointing replaces offset tracking.
Ordering per row key is preserved by the explicit ``seq`` column, the
analog of serial replication's per-region ordering.

- ``wal_player``  — batch replay of a log range into a table
  (mr/WALPlayer.java:76, time-windowed).
- ``stream_merge`` — the ReplicationSource/Endpoint analog
  (server/replication/ReplicationEndpoint.java:48): readStream ->
  foreachBatch append with checkpoint.
- ``latest_view_stream`` — a continuously-maintained latest-version
  view (the "table is the state" pattern): streaming aggregation
  keyed by (row, family, qualifier) with max_by(ts, seq).

Invariant (tested): streaming merge of a mutation log ≡ batch
resolve() over all cells — the ITBLL-style check of SURVEY.md §5.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_spark.model import cell_schema
from hbase_spark.operators.resolve import _time_range_pred


def mutation_stream(
    spark: SparkSession,
    log_dir: str,
    *,
    key_type=None,
    value_type=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """A file-based mutation-log stream of cell records (WALInputFormat
    analog, mr/WALInputFormat.java:61; swap for Kafka by changing the
    format — the schema contract is the same CellFrame)."""
    reader = spark.readStream.schema(cell_schema(key_type, value_type))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(log_dir)


class WALObserver:
    """server/coprocessor/WALObserver.java — intercept the edit stream
    at the log boundary.  ``pre_wal_write(batch) -> batch`` may rewrite
    or filter the micro-batch's cells before they are appended
    (preWALWrite:59); ``post_wal_write(batch, epoch_id)`` is a
    notification after the append commits (postWALWrite:77)."""

    def __init__(self, pre_wal_write=None, post_wal_write=None):
        self.pre_wal_write = pre_wal_write
        self.post_wal_write = post_wal_write


def stream_merge(
    stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    *,
    trigger_once: bool = True,
    observers: list[WALObserver] | None = None,
):
    """Merge the mutation stream into a CellFrame table directory.

    foreachBatch append = ReplicationEndpoint.replicate; the checkpoint
    directory carries the source offsets (ReplicationQueueStorage
    analog), giving at-least-once delivery with idempotent effect
    (cells are content-addressed by (row,family,qualifier,ts,type,seq),
    and resolution is insensitive to duplicate appends).
    ``observers``: WALObserver chain applied per micro-batch.
    """

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        for ob in observers or []:
            if ob.pre_wal_write is not None:
                batch = ob.pre_wal_write(batch)
        batch.write.mode("append").parquet(table_dir)
        for ob in observers or []:
            if ob.post_wal_write is not None:
                ob.post_wal_write(batch, epoch_id)

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def latest_view_stream(stream: DataFrame, query_name: str):
    """Maintain the latest-put-per-column view as a streaming state —
    the low-latency analog of a resolved snapshot (complete-mode memory
    sink for local use; production would target a keyed store)."""
    latest = (
        stream.filter(F.col("type") == 4)
        .groupBy("row", "family", "qualifier")
        .agg(
            F.max_by(
                F.struct("ts", "value", "seq"), F.struct("ts", "seq")
            ).alias("_c")
        )
        .select(
            "row",
            "family",
            "qualifier",
            F.col("_c.ts").alias("ts"),
            F.col("_c.value").alias("value"),
            F.col("_c.seq").alias("seq"),
        )
    )
    return (
        latest.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def wal_player(
    spark: SparkSession,
    log_dir: str,
    *,
    time_range: tuple | None = None,
    key_type=None,
    value_type=None,
    observers: list | None = None,
) -> DataFrame:
    """Batch replay of a mutation-log range (WALPlayer: mr/WALPlayer.java:76):
    read the log files, optionally time-window, return cells ready to
    append to a table (or bulk-write via sources.layout.write_table).

    ``observers``: RegionObserver WAL-replay hooks —
    ``pre_replay_wals`` brackets the WHOLE replay (RegionObserver.java
    :1401 — "about to replay these logs"; may rewrite the raw edit
    stream before any per-edit hook), ``pre_wal_restore`` may rewrite
    the replayed edits before they are handed to the caller,
    ``post_wal_restore`` is notified with the final frame, and
    ``post_replay_wals`` closes the bracket (:1411).
    (RegionObserver.java:1395,1416 for the per-edit pair; the
    reference fires per WALEdit during region replay, the declarative
    twin is one transform over the replayed frame)."""
    df = spark.read.schema(cell_schema(key_type, value_type)).parquet(log_dir)
    if time_range is not None:
        df = df.filter(_time_range_pred(time_range))
    for ob in observers or []:
        if getattr(ob, "pre_replay_wals", None):
            df = ob.pre_replay_wals(df)
    for ob in observers or []:
        if getattr(ob, "pre_wal_restore", None):
            df = ob.pre_wal_restore(df)
    for ob in observers or []:
        if getattr(ob, "post_wal_restore", None):
            ob.post_wal_restore(df)
    for ob in observers or []:
        if getattr(ob, "post_replay_wals", None):
            ob.post_replay_wals(df)
    return df


def log_cleaner(
    log_dir: str, *, ttl_ms: int, now_ms: int | None = None
) -> list[str]:
    """TimeToLiveLogCleaner (master/cleaner/TimeToLiveLogCleaner.java):
    delete mutation-log segments older than ``ttl_ms`` by file mtime.
    Replication readers track consumed files in their checkpoints, so
    removing fully-aged segments never disturbs an active stream; size
    the TTL to exceed the slowest peer's lag, as the reference does.
    Returns the deleted paths."""
    import glob
    import os
    import time as _time

    now_ms = int(_time.time() * 1000) if now_ms is None else now_ms
    deleted = []
    for f in glob.glob(os.path.join(log_dir, "*.parquet")):
        if os.path.getmtime(f) * 1000 + ttl_ms <= now_ms:
            os.remove(f)
            deleted.append(f)
    return deleted
