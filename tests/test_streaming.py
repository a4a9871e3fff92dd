"""Streaming merge invariant (FIXTURES.md §A3 / SURVEY.md §5.2 item 6):
replaying a mutation log through the streaming foreachBatch merge must
yield exactly the same resolved state as batch resolve() over all
cells; plus WALPlayer time-windowed replay and the latest-view stream.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hbase_spark.model import CellType, cell_schema
from hbase_spark.operators.resolve import resolve
from hbase_spark.streaming.merge import (
    latest_view_stream,
    mutation_stream,
    stream_merge,
    wal_player,
)


@pytest.fixture()
def dirs():
    base = tempfile.mkdtemp(prefix="hbase_spark_stream_")
    yield {
        "log": f"{base}/log",
        "table": f"{base}/table",
        "ckpt": f"{base}/ckpt",
    }
    shutil.rmtree(base, ignore_errors=True)


def _mutation_log(spark):
    """A deterministic log: puts with increasing versions, deletes
    interleaved, several batches (files)."""
    batches = []
    seq = 0
    rows = [f"k{i:03d}" for i in range(50)]
    for b in range(4):
        cells = []
        for i, r in enumerate(rows):
            cells.append((r, "m", "c01", 1000 + b, CellType.PUT, f"v{b}-{i}", seq))
            seq += 1
        if b == 2:
            # delete-column tombstones for every 10th row
            for r in rows[::10]:
                cells.append((r, "m", "c01", 1002, CellType.DELETE_COLUMN, None, seq))
                seq += 1
        batches.append(cells)
    return batches


def test_stream_merge_equals_batch_resolve(spark, dirs):
    batches = _mutation_log(spark)
    all_cells = [c for b in batches for c in b]
    for i, b in enumerate(batches):
        spark.createDataFrame(b, schema=cell_schema()).coalesce(1).write.mode(
            "append"
        ).parquet(dirs["log"])

    stream = mutation_stream(spark, dirs["log"], max_files_per_trigger=1)
    q = stream_merge(stream, dirs["table"], dirs["ckpt"])
    q.awaitTermination(120)

    merged = spark.read.parquet(dirs["table"])
    batch_df = spark.createDataFrame(all_cells, schema=cell_schema())
    got = {
        (r.row, r.qualifier, r.ts, r.value)
        for r in resolve(merged, versions=1).collect()
    }
    want = {
        (r.row, r.qualifier, r.ts, r.value)
        for r in resolve(batch_df, versions=1).collect()
    }
    assert got == want
    # tombstoned rows: ts<=1002 masked, but the b=3 put at ts=1003 survives
    assert ("k000", "c01", 1003, "v3-0") in got


def test_stream_merge_is_incremental(spark, dirs):
    """New log files after the first run are picked up by a resumed
    stream without reprocessing old ones (checkpoint = offsets)."""
    batches = _mutation_log(spark)
    for b in batches[:2]:
        spark.createDataFrame(b, schema=cell_schema()).coalesce(1).write.mode(
            "append"
        ).parquet(dirs["log"])
    q = stream_merge(mutation_stream(spark, dirs["log"]), dirs["table"], dirs["ckpt"])
    q.awaitTermination(120)
    n1 = spark.read.parquet(dirs["table"]).count()

    for b in batches[2:]:
        spark.createDataFrame(b, schema=cell_schema()).coalesce(1).write.mode(
            "append"
        ).parquet(dirs["log"])
    q2 = stream_merge(mutation_stream(spark, dirs["log"]), dirs["table"], dirs["ckpt"])
    q2.awaitTermination(120)
    merged = spark.read.parquet(dirs["table"])
    assert merged.count() == sum(len(b) for b in batches)
    assert merged.count() > n1
    # no duplicates: every (seq) appears exactly once
    assert merged.select("seq").distinct().count() == merged.count()


def test_wal_player_time_window(spark, dirs):
    batches = _mutation_log(spark)
    for b in batches:
        spark.createDataFrame(b, schema=cell_schema()).coalesce(1).write.mode(
            "append"
        ).parquet(dirs["log"])
    replayed = wal_player(spark, dirs["log"], time_range=(1001, 1003))
    assert {r.ts for r in replayed.select("ts").distinct().collect()} == {1001, 1002}


def test_latest_view_stream(spark, dirs):
    batches = _mutation_log(spark)
    for b in batches:
        spark.createDataFrame(b, schema=cell_schema()).coalesce(1).write.mode(
            "append"
        ).parquet(dirs["log"])
    q = latest_view_stream(mutation_stream(spark, dirs["log"]), "latest_view_t")
    q.processAllAvailable()
    q.stop()
    view = spark.sql("SELECT * FROM latest_view_t")
    row = view.filter("row = 'k001'").collect()[0]
    assert row.ts == 1003 and row.value == "v3-1"
    assert view.count() == 50
