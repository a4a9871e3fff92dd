"""Backup / restore roundtrip tests (SURVEY.md §2.10)."""

import shutil
import tempfile

from hbase_spark.operators.mutations import make_cells
from hbase_spark.operators.resolve import resolve
from hbase_spark.sources.backup import backup_full, backup_incremental, restore


def cells(spark):
    rows = [
        ("r1", "f", "a", 10, 4, "v1", 1),
        ("r1", "f", "a", 20, 4, "v2", 2),
        ("r2", "f", "a", 10, 4, "x1", 3),
        ("r1", "f", "a", 20, 8, None, 4),  # DELETE exact version
        ("r2", "f", "b", 30, 4, "x2", 5),
    ]
    return make_cells(spark, rows)


def snap(df):
    return {
        (r.row, r.qualifier, r.ts, r.value) for r in resolve(df, versions=2).collect()
    }


def test_full_plus_incremental_restore(spark):
    d = tempfile.mkdtemp(prefix="hb_backup_")
    try:
        full = cells(spark)
        m = backup_full(full.filter("seq <= 3"), d, num_regions=2)
        assert m["high_seq"] == 3
        m = backup_incremental(full, d)
        assert m["high_seq"] == 5 and m["segments"] == ["incr_00000"]
        # idempotent when nothing new
        m = backup_incremental(full, d)
        assert m["segments"] == ["incr_00000"]
        restored = restore(spark, d)
        assert snap(restored) == snap(full)
        # point-in-time: before the delete (seq 4) the masked put is live
        pit = restore(spark, d, to_seq=3)
        assert ("r1", "a", 20, "v2") in snap(pit)
        assert ("r1", "a", 20, "v2") not in snap(restored)
    finally:
        shutil.rmtree(d, ignore_errors=True)
