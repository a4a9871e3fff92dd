"""PerformanceEvaluation-analog harness tests (hbase_spark/pe.py;
reference hbase-diagnostics PerformanceEvaluation.java).

The harness is a measurement tool, but every workload makes a
checkable CORRECTNESS claim (counts, deterministic values, CAS
outcomes) — these tests pin those claims at small N so a PE run's
numbers mean what they say."""

import json
import tempfile

import pytest

from hbase_spark.operators.scan import Scan
from hbase_spark.pe import (
    COLUMN_ZERO,
    FAMILY_NAME_BASE,
    PEOptions,
    PerformanceEvaluation,
    pe_value_py,
)

ROWS = 300


@pytest.fixture(scope="module")
def pe(spark):
    opts = PEOptions(rows=ROWS, value_size=48, families=2, columns=2,
                     nclients=2, queries=4)
    return PerformanceEvaluation(
        spark, tempfile.mkdtemp(prefix="pe_catalog_"), opts)


@pytest.fixture(scope="module")
def loaded(pe):
    out = pe.run("sequentialWrite")
    assert out["rows"] == ROWS * 2 * 2  # rows x families x columns
    return out


def _snapshot(pe):
    return pe.admin.table(pe.opts.table).scan(Scan())


def test_sequential_write_layout_and_values(pe, loaded):
    snap = _snapshot(pe)
    assert snap.select("row").distinct().count() == ROWS
    # families info0/info1, qualifiers 0/1 (PE's FAMILY_NAME_BASE/COLUMN_ZERO)
    fams = {r["family"] for r in snap.select("family").distinct().collect()}
    assert fams == {"info0", "info1"}
    # deterministic generateData analog: value recomputable off-engine,
    # 8-byte letter runs of the requested size
    key = f"{7:026d}"
    got = (
        snap.filter(f"row = '{key}' and family = 'info0' and qualifier = '0'")
        .first()["value"]
    )
    assert got == pe_value_py(f"{key}|{FAMILY_NAME_BASE}0|{COLUMN_ZERO}", 48)
    assert len(got) == 48
    assert all(got[i : i + 8] == got[i] * 8 for i in range(0, 48, 8))


def test_read_workloads_count_every_row(pe, loaded):
    assert pe.run("scan")["rows"] == ROWS
    assert pe.run("sequentialRead")["rows"] == ROWS
    assert pe.run("reverseScan")["rows"] == ROWS


def test_random_read_finds_only_existing_keys(pe, loaded):
    out = pe.run("randomRead")
    assert out["rows"] == ROWS  # K = min(rows, 10k) gets issued
    # every random key is drawn from [0, total_rows) = the written span
    assert 0 < out["rows_found"] <= ROWS


def test_scan_range_counts_match_dense_keyspace(pe, loaded):
    # keys are the dense integers 0..ROWS-1, so a [start, start+N)
    # range must return exactly min(N, ROWS - start) rows
    out = pe.run("scanRange100")
    expected = sum(min(100, ROWS - s) for s in pe._rand_starts(4))
    assert out["rows"] == expected
    assert out["queries"] == 4


def test_random_seek_scan_reads_120_rows_per_seek(pe, loaded):
    out = pe.run("randomSeekScan")
    expected = sum(min(120, ROWS - s) for s in pe._rand_starts(4))
    assert out["rows"] == expected


def test_filter_scan_selects_exactly_the_target_row(pe, loaded):
    out = pe.run("filterScan")
    assert out["rows_matched"] == 1


def test_increment_and_append(pe, loaded):
    pe.run("increment")
    snap = _snapshot(pe).filter("qualifier = 'IncrementTest'")
    assert snap.count() == ROWS * 2  # every row x family
    assert {r["value"] for r in snap.select("value").distinct().collect()} == {"1"}
    # re-running accumulates (the monotonic op clock: no ts collisions)
    pe.run("increment")
    snap = _snapshot(pe).filter("qualifier = 'IncrementTest'")
    assert {r["value"] for r in snap.select("value").distinct().collect()} == {"2"}

    pe.run("append")
    snap = _snapshot(pe).filter("qualifier = 'AppendTest'")
    row0 = f"{0:026d}"
    got = snap.filter(f"row = '{row0}' and family = 'info0'").first()["value"]
    assert got == row0


def test_check_and_put_delete_mutate(pe, loaded):
    pe.run("checkAndPut")
    snap = _snapshot(pe).filter("qualifier = 'CheckAndPutTest'")
    assert snap.count() == ROWS
    assert {r["value"] for r in snap.select("value").distinct().collect()} == {"T"}

    pe.run("checkAndDelete")  # sentinel put then guarded delete -> gone
    snap = _snapshot(pe).filter("qualifier = 'CheckAndDeleteTest'")
    assert snap.count() == 0

    pe.run("checkAndMutate")
    snap = _snapshot(pe).filter("qualifier = 'CheckAndMutateTest'")
    assert snap.count() == ROWS


def test_meta_random_read_locates_regions(pe, loaded):
    out = pe.run("metaRandomRead")
    assert out["located"] == out["rows"] > 0


def test_random_write_newest_wins_on_collisions(pe):
    out = pe.run("randomWrite")
    assert out["rows"] == ROWS * 2 * 2
    snap = _snapshot(pe)
    distinct = snap.select("row").distinct().count()
    # uniform draws with collisions: fewer distinct rows than draws,
    # every key inside the formatted [0, total_rows) span
    assert 0 < distinct <= ROWS
    lo, hi = f"{0:026d}", f"{ROWS - 1:026d}"
    bad = snap.filter(f"row < '{lo}' or row > '{hi}'").count()
    assert bad == 0
    # randomWrite rebuilt the table; restore sequential data for any
    # later module (cheap at ROWS=300)
    pe.run("sequentialWrite")


def test_report_shape_and_unknown_command(pe, loaded):
    out = pe.run("scan")
    assert set(out) >= {"workload", "rows", "sec", "rows_per_sec", "clients"}
    json.dumps(out)  # one JSON line per workload
    with pytest.raises(ValueError, match="unknown PE command"):
        pe.run("warmup")
