"""Layout / pre-split tests (RegionSplitter analog, SURVEY.md §4.1)."""

import shutil
import tempfile

from pyspark.sql import functions as F

from hbase_spark.operators.mutations import make_cells
from hbase_spark.sources.layout import (
    decimal_split_points,
    hex_split_points,
    read_table,
    region_id,
    write_table,
)


def test_hex_split_points():
    pts = hex_split_points(4, width=8)
    assert pts == ["40000000", "80000000", "c0000000"]
    assert hex_split_points(2, width=4) == ["8000"]


def test_decimal_split_points():
    assert decimal_split_points(4, width=4) == ["2500", "5000", "7500"]


def test_region_id_respects_split_points(spark):
    # keys on either side of each hex boundary land in adjacent regions
    keys = ["00000000", "3fffffff", "40000000", "7fffffff", "80000000", "ffffffff"]
    df = spark.createDataFrame([(k,) for k in keys], "row string")
    got = {
        r.row: r.rid
        for r in df.select("row", region_id(F.col("row"), 4).alias("rid")).collect()
    }
    assert got == {
        "00000000": 0,
        "3fffffff": 0,
        "40000000": 1,
        "7fffffff": 1,
        "80000000": 2,
        "ffffffff": 3,
    }


def test_region_id_decimal_and_uniform(spark):
    df = spark.createDataFrame([("24999999",), ("25000000",)], "row string")
    got = [
        r.rid
        for r in df.select(
            region_id(F.col("row"), 4, algo="decimal").alias("rid")
        ).collect()
    ]
    assert got == [0, 1]  # boundary at 25000000 for width=8
    dfb = spark.createDataFrame(
        [(bytearray(b"\x00\x00\x00\x01"),), (bytearray(b"\xc0\x00\x00\x00"),)],
        "row binary",
    )
    got = [
        r.rid
        for r in dfb.select(
            region_id(F.col("row"), 4, algo="uniform").alias("rid")
        ).collect()
    ]
    assert got == [0, 3]


def test_presplit_write_read_roundtrip(spark):
    d = tempfile.mkdtemp(prefix="hb_layout_")
    try:
        rows = [
            (format(i * 97 % 256, "08x"), "f", "q", 1, 4, f"v{i}", i)
            for i in range(64)
        ]
        cells = make_cells(spark, rows)
        write_table(cells, d, num_regions=4, split_algo="hex", by_family=False)
        back = read_table(spark, d)
        assert back.count() == 64
        assert {tuple(r) for r in back.collect()} == {tuple(r) for r in cells.collect()}
    finally:
        shutil.rmtree(d, ignore_errors=True)
