"""Compaction policy jobs (rs/compactions/ analogs): minor coalescing,
date-tiered layout + tier pruning, FIFO expired-tier dropping, stripes."""

import glob
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hbase_spark.model import CellType, cell_schema
from hbase_spark.sources.compaction import (
    compact_date_tiered,
    compact_minor,
    compact_stripes,
    fifo_expired_tiers,
    read_date_tiered,
    read_fifo,
    stripe_boundaries,
)

NOW = 1_000_000_000
WINDOW = 1_000_000  # 1000s tiers


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="hb_compact_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def aged_cells(spark, n=200):
    # ages spread over ~30 windows so several tiers populate
    rows = [
        (
            str(i).zfill(6),
            "f",
            "q",
            NOW - (i % 30) * WINDOW - 1,
            CellType.PUT,
            f"v{i}",
            i,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, schema=cell_schema())


def test_minor_compaction_coalesces_files(spark, tmpdir):
    cells = aged_cells(spark).repartition(24)
    src = f"{tmpdir}/src"
    cells.write.parquet(src)
    n_before = len(glob.glob(f"{src}/*.parquet"))
    out = f"{tmpdir}/minor"
    compact_minor(spark.read.parquet(src), out, num_regions=4)
    n_after = len(glob.glob(f"{out}/*.parquet"))
    assert n_after <= 4 < n_before
    # nothing dropped, order preserved per file
    back = spark.read.parquet(out)
    assert back.count() == cells.count()


def test_date_tiered_layout_prunes_old_tiers(spark, tmpdir):
    cells = aged_cells(spark)
    path = f"{tmpdir}/tiered"
    compact_date_tiered(cells, path, now=NOW, window_ms=WINDOW, tiers=5)
    # tier directories exist
    tier_dirs = glob.glob(f"{path}/_tier=*")
    assert len(tier_dirs) >= 3
    # full read returns everything
    assert read_date_tiered(spark, path).count() == 200
    # a recent-only time range prunes old tiers: read only tier<=1
    recent = read_date_tiered(
        spark,
        path,
        time_range=(NOW - 2 * WINDOW, None),
        now=NOW,
        window_ms=WINDOW,
        tiers=5,
    )
    got = recent.filter(F.col("ts") >= NOW - 2 * WINDOW).count()
    want = cells.filter(F.col("ts") >= NOW - 2 * WINDOW).count()
    assert got == want > 0


def test_fifo_matches_plain_ttl_filter(spark, tmpdir):
    cells = aged_cells(spark)
    path = f"{tmpdir}/fifo"
    compact_date_tiered(cells, path, now=NOW, window_ms=WINDOW, tiers=6)
    ttl = 7 * WINDOW
    dead = fifo_expired_tiers(
        spark, path, ttl_ms=ttl, now=NOW, window_ms=WINDOW, tiers=6
    )
    assert dead, "some tiers must be wholly expired in this setup"
    got = {r.row for r in read_fifo(
        spark, path, ttl_ms=ttl, now=NOW, window_ms=WINDOW, tiers=6
    ).collect()}
    want = {r.row for r in cells.filter(F.col("ts") >= NOW - ttl).collect()}
    assert got == want


def test_stripes_and_boundaries(spark, tmpdir):
    cells = aged_cells(spark)
    path = f"{tmpdir}/stripes"
    compact_stripes(cells, path, stripes=5)
    assert len(glob.glob(f"{path}/*.parquet")) <= 5
    bounds = stripe_boundaries(cells, 4)
    assert len(bounds) == 3 and bounds == sorted(bounds)
    assert spark.read.parquet(path).count() == 200
