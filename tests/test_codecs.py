"""Codec layer tests (SURVEY.md §1.2): Bytes round-trips, OrderedBytes
order preservation under unsigned byte comparison (the comparison both
HBase row keys and Spark BinaryType use — §7.4 watch item 4), and
struct compound-key ordering.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hbase_spark.functions.codecs import (
    bytes_from_long,
    bytes_to_long,
    ordered_from_double,
    ordered_from_long,
    ordered_from_string,
    ordered_to_long,
    py_bytes_from_long,
    py_ordered_from_double,
    py_ordered_from_long,
    py_ordered_from_string,
    py_ordered_to_long,
    py_struct_key,
    struct_key,
)

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(st.lists(I64, min_size=2, max_size=50, unique=True))
@settings(max_examples=50, deadline=None)
def test_py_ordered_long_preserves_order(vals):
    enc = [py_ordered_from_long(v) for v in vals]
    assert sorted(range(len(vals)), key=lambda i: vals[i]) == sorted(
        range(len(vals)), key=lambda i: enc[i]
    )
    for v in vals:
        assert py_ordered_to_long(py_ordered_from_long(v)) == v


@given(
    st.lists(
        st.floats(allow_nan=False, width=64), min_size=2, max_size=50, unique=True
    )
)
@settings(max_examples=50, deadline=None)
def test_py_ordered_double_preserves_order(vals):
    # -0.0 and 0.0 encode differently (distinct bit patterns) but compare
    # equal numerically; drop the collision like the reference's total order
    vals = [v for v in vals if not (v == 0 and math.copysign(1, v) < 0)]
    enc = [py_ordered_from_double(v) for v in vals]
    assert sorted(range(len(vals)), key=lambda i: vals[i]) == sorted(
        range(len(vals)), key=lambda i: enc[i]
    )


@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_characters="\x00", max_codepoint=0x7F),
            max_size=8,
        ),
        min_size=2,
        max_size=30,
        unique=True,
    )
)
@settings(max_examples=50, deadline=None)
def test_py_ordered_string_preserves_order(vals):
    enc = [py_ordered_from_string(v) for v in vals]
    assert sorted(range(len(vals)), key=lambda i: vals[i]) == sorted(
        range(len(vals)), key=lambda i: enc[i]
    )


@given(
    st.lists(
        st.tuples(st.integers(min_value=-100, max_value=100), st.sampled_from("abc")),
        min_size=2,
        max_size=30,
        unique=True,
    )
)
@settings(max_examples=50, deadline=None)
def test_py_struct_key_preserves_tuple_order(tuples):
    enc = [py_struct_key((a, "long"), (s, "string")) for a, s in tuples]
    assert sorted(range(len(tuples)), key=lambda i: tuples[i]) == sorted(
        range(len(tuples)), key=lambda i: enc[i]
    )


def test_spark_codecs_match_python(spark):
    vals = [-(2**63), -1_000_000, -1, 0, 1, 42, 2**40, 2**63 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = df.select(
        "v",
        bytes_from_long(F.col("v")).alias("be"),
        ordered_from_long(F.col("v")).alias("oe"),
        bytes_to_long(bytes_from_long(F.col("v"))).alias("rt"),
        ordered_to_long(ordered_from_long(F.col("v"))).alias("ort"),
    ).collect()
    for r in rows:
        assert bytes(r.be) == py_bytes_from_long(r.v)
        assert bytes(r.oe) == py_ordered_from_long(r.v)
        assert r.rt == r.v
        assert r.ort == r.v


def test_spark_double_codec_matches_python(spark):
    vals = [-math.inf, -1.5, -0.0, 0.0, 1e-300, 2.5, math.inf]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = df.select("v", ordered_from_double(F.col("v")).alias("e")).collect()
    for r in rows:
        assert bytes(r.e) == py_ordered_from_double(r.v)


def test_spark_binary_sort_matches_value_sort(spark):
    # Spark orders BinaryType unsigned-lexicographically — the HBase row
    # comparator.  orderBy(encoded) must equal orderBy(value).
    vals = [-(2**62), -5, -1, 0, 3, 2**35, 2**62]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    by_enc = [
        r.v
        for r in df.select("v", ordered_from_long(F.col("v")).alias("k"))
        .orderBy("k")
        .collect()
    ]
    assert by_enc == sorted(vals)


def test_spark_struct_key_range_scan(spark):
    # compound (string, long) key: range scan on the encoded key returns
    # exactly the tuple range — the Struct row-key pattern
    rows = [(g, i) for g in ("a", "b", "c") for i in range(5)]
    df = spark.createDataFrame(rows, "g string, i long")
    keyed = df.select(
        "g", "i", struct_key((F.col("g"), "string"), (F.col("i"), "long")).alias("k")
    )
    lo = py_struct_key(("b", "string"), (1, "long"))
    hi = py_struct_key(("b", "string"), (4, "long"))
    got = sorted(
        (r.g, r.i)
        for r in keyed.filter(
            (F.col("k") >= F.lit(lo)) & (F.col("k") < F.lit(hi))
        ).collect()
    )
    assert got == [("b", 1), ("b", 2), ("b", 3)]
