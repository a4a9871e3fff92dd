"""Salted-key tests: stability, round-trip, fanned range scan, point read."""

from pyspark.sql import functions as F

from hbase_spark.operators.mutations import make_cells
from hbase_spark.sources.salt import (
    salt_cells,
    salted_point_pred,
    salted_range_pred,
    unsalt_cells,
)


def cells(spark, n=40):
    rows = [(str(i).zfill(6), "f", "q", 1, 4, f"v{i}", i) for i in range(n)]
    return make_cells(spark, rows)


def test_salt_round_trip_and_stability(spark):
    c = cells(spark)
    salted = salt_cells(c, 8)
    # deterministic: salting twice gives identical keys
    again = salt_cells(c, 8)
    assert sorted(r.row for r in salted.collect()) == sorted(
        r.row for r in again.collect()
    )
    back = unsalt_cells(salted)
    assert {r.row for r in back.collect()} == {r.row for r in c.collect()}


def test_salted_range_scan_matches_unsalted(spark):
    c = cells(spark)
    salted = salt_cells(c, 8)
    got = {
        r.row[2:]
        for r in salted.filter(salted_range_pred("000010", "000020", 8)).collect()
    }
    want = {r.row for r in c.filter((F.col("row") >= "000010") & (F.col("row") < "000020")).collect()}
    assert got == want


def test_salted_open_start_scan(spark):
    """Open-start scan (start=None, stop set) must respect the unsalted
    stop in EVERY bucket — regression for the missing bucket-prefix guard."""
    c = cells(spark)
    salted = salt_cells(c, 8)
    got = {
        r.row[2:]
        for r in salted.filter(salted_range_pred(None, "000020", 8)).collect()
    }
    want = {r.row for r in c.filter(F.col("row") < "000020").collect()}
    assert got == want
    assert len(got) == 20


def test_salted_open_stop_scan(spark):
    c = cells(spark)
    salted = salt_cells(c, 8)
    got = {
        r.row[2:]
        for r in salted.filter(salted_range_pred("000030", None, 8)).collect()
    }
    want = {r.row for r in c.filter(F.col("row") >= "000030").collect()}
    assert got == want
    assert len(got) == 10


def test_salted_full_scan(spark):
    c = cells(spark)
    salted = salt_cells(c, 8)
    got = {r.row[2:] for r in salted.filter(salted_range_pred(None, None, 8)).collect()}
    assert got == {r.row for r in c.collect()}


def test_salted_point_read_single_bucket(spark):
    c = cells(spark)
    salted = salt_cells(c, 8)
    hit = salted.filter(salted_point_pred("000025", 8)).collect()
    assert len(hit) == 1 and hit[0].value == "v25"


def test_salting_spreads_buckets(spark):
    c = cells(spark, n=200)
    salted = salt_cells(c, 8)
    counts = (
        salted.groupBy(F.substring("row", 1, 2).alias("b")).count().collect()
    )
    assert len(counts) == 8  # every bucket used
    assert max(r["count"] for r in counts) < 200 / 2  # no hotspot
