"""Event-time windowed rollups over the mutation stream — the
Structured Streaming half of the engine's time-series surface
(SURVEY.md §2.10).

The reference has no native windowed aggregation (clients build
rollups with coprocessors or MR jobs over time-ranged scans); the
Spark-native shape is `readStream -> withWatermark -> window(...)
groupBy agg`, which gives the same result as the batch rollup
(`events_daily_rollup`) plus incremental maintenance and bounded
state:

- the **watermark** bounds how late a mutation may arrive and still
  update its window — state for windows older than the watermark is
  dropped (the reference's analog is the TTL on replication queues);
- in append output mode a window emits exactly once, when the
  watermark passes its end — so downstream sinks receive finalized
  rollups only.

At 100 TB/day the state store holds only open windows × group keys
(bounded by the watermark delay), and the aggregation is the same
map-side-combinable hash agg the batch rollup uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_rollup(
    stream: DataFrame,
    *,
    window: str = "1 day",
    slide: str | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("family", "qualifier"),
    value_col: str = "value",
    value_type: str = "double",
) -> DataFrame:
    """Tumbling (or sliding) event-time rollup of a mutation stream.

    ``ts`` is CellFrame epoch-millis; late cells beyond ``watermark``
    are dropped.  Works identically on a batch frame (watermark is a
    no-op there), so the streaming and batch rollups can share one
    definition — the property tests assert stream == batch.
    """
    with_ts = stream.withColumn("_event_time", F.timestamp_millis(F.col(ts_col)))
    win = (
        F.window("_event_time", window, slide)
        if slide
        else F.window("_event_time", window)
    )
    return (
        with_ts.withWatermark("_event_time", watermark)
        .groupBy(win.alias("win"), *[F.col(c) for c in group_cols])
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(value_col).cast(value_type)).alias("total"),
        )
        .select(
            F.unix_millis(F.col("win.start")).alias("win_start"),
            F.unix_millis(F.col("win.end")).alias("win_end"),
            *group_cols,
            "n",
            "total",
        )
    )


def run_windowed_rollup(
    stream: DataFrame,
    sink_table: str,
    *,
    checkpoint: str,
    output_mode: str = "append",
    **rollup_kw,
):
    """Wire the rollup to a memory/table sink; returns the streaming
    query (caller awaits/stops).  Append mode emits each window once,
    after the watermark closes it."""
    out = windowed_rollup(stream, **rollup_kw)
    return (
        out.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint)
        .start()
    )
