"""Custom stateful streaming operators (SURVEY.md §2.10/§2.11).

Where the built-in streaming aggregations can't express the semantics,
``applyInPandasWithState`` holds explicit per-key state across
micro-batches.  Two operators:

- ``streaming_increment_totals`` — WriteHeavyIncrementObserver in
  streaming form: per (row, family, qualifier), state = running sum of
  delta cells; each batch emits the updated total.  The table-side
  batch analog is plans/observers.write_heavy_increment_observer.
- ``serial_apply`` — the serial-replication ordering guarantee
  (ReplicationSource ordering, SURVEY §2.10): per row key, emit
  mutations in ``seq`` order and drop stale ones (seq <= the
  high-water mark already applied), state = high-water mark.  This is
  what "preserve per-region mutation order" means once arrival order
  is decoupled from log order.

State size is bounded by live keys (one long per column / per row),
not by history — safe for indefinite streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_TOTALS_OUT = StructType(
    [
        StructField("row", StringType()),
        StructField("family", StringType()),
        StructField("qualifier", StringType()),
        StructField("total", LongType()),
    ]
)
_TOTALS_STATE = StructType([StructField("total", LongType())])


def _totals_fn(key, pdfs, state: GroupState):
    import pandas as pd

    total = state.get[0] if state.exists else 0
    for pdf in pdfs:
        total += int(pd.to_numeric(pdf["value"]).sum())
    state.update((total,))
    yield pd.DataFrame(
        [{"row": key[0], "family": key[1], "qualifier": key[2], "total": total}]
    )


def streaming_increment_totals(stream: DataFrame):
    """Running per-column totals over a delta-cell stream."""
    return (
        stream.groupBy("row", "family", "qualifier")
        .applyInPandasWithState(
            _totals_fn,
            _TOTALS_OUT,
            _TOTALS_STATE,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


_SERIAL_OUT = StructType(
    [
        StructField("row", StringType()),
        StructField("seq", LongType()),
        StructField("value", StringType()),
    ]
)
_SERIAL_STATE = StructType([StructField("high", LongType())])


def _serial_fn(key, pdfs, state: GroupState):
    import pandas as pd

    high = state.get[0] if state.exists else -1
    frames = [pdf for pdf in pdfs]
    batch = pd.concat(frames) if frames else pd.DataFrame(columns=["seq", "value"])
    batch = batch.sort_values("seq")
    fresh = batch[batch["seq"] > high]
    if len(fresh):
        high = int(fresh["seq"].max())
        state.update((high,))
        yield pd.DataFrame(
            {"row": key[0], "seq": fresh["seq"], "value": fresh["value"]}
        )


def serial_apply(stream: DataFrame):
    """Emit each row's mutations in seq order, dropping stale replays."""
    return (
        stream.groupBy("row")
        .applyInPandasWithState(
            _serial_fn,
            _SERIAL_OUT,
            _SERIAL_STATE,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
