"""Filter conformance tests — ports of the seeded-region scenarios in
hbase-server/src/test/.../filter/TestFilter.java (FIXTURES.md §A2):
a fixed grid of rows/families/qualifiers/values so every filter's
expected (row, qualifier, value) set is enumerable by hand.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hbase_spark.filters import (
    BinaryComparator,
    BinaryPrefixComparator,
    BitComparator,
    ColumnCountGetFilter,
    ColumnPaginationFilter,
    ColumnPrefixFilter,
    ColumnRangeFilter,
    ColumnValueFilter,
    DependentColumnFilter,
    FamilyFilter,
    FilterList,
    FirstKeyOnlyFilter,
    FuzzyRowFilter,
    InclusiveStopFilter,
    KeyOnlyFilter,
    LongComparator,
    MultipleColumnPrefixFilter,
    MultiRowRangeFilter,
    NullComparator,
    PageFilter,
    PrefixFilter,
    QualifierFilter,
    RandomRowFilter,
    RegexStringComparator,
    RowFilter,
    SingleColumnValueExcludeFilter,
    SingleColumnValueFilter,
    SkipFilter,
    SubstringComparator,
    TimestampsFilter,
    ValueFilter,
    WhileMatchFilter,
    parse_filter,
)
from hbase_spark.model import CELL_COLUMNS, cell_schema
from hbase_spark.operators.scan import Scan, scan

ROWS_ONE = [f"testRowOne-{i}" for i in range(4)]
ROWS_TWO = [f"testRowTwo-{i}" for i in range(4)]
FAMILIES = ["testFamilyOne", "testFamilyTwo"]
QUALIFIERS_ONE = [f"testQualifierOne-{i}" for i in range(4)]
V1, V2 = "testValueOne", "testValueTwo"


@pytest.fixture(scope="module")
def region(spark):
    """The seeded region: rowsOne carry valueOne, rowsTwo valueTwo, in
    both families x 4 qualifiers, single version at ts=1; plus a
    numeric family 'nums' (long strings 0..7) and ts=2 second versions
    on qualifier 0 for DependentColumnFilter."""
    cells = []
    seq = 0
    for row, val in [(r, V1) for r in ROWS_ONE] + [(r, V2) for r in ROWS_TWO]:
        for fam in FAMILIES:
            for q in QUALIFIERS_ONE:
                cells.append((row, fam, q, 1, 4, val, seq))
                seq += 1
    for i, row in enumerate(ROWS_ONE + ROWS_TWO):
        cells.append((row, "nums", "n", 1, 4, str(i), seq))
        seq += 1
    # second version slice at ts=2 on qualifier 0, family one
    for row in ROWS_ONE:
        cells.append((row, "testFamilyOne", "testQualifierOne-0", 2, 4, V1 + "@2", seq))
        seq += 1
    return spark.createDataFrame(cells, schema=cell_schema())


def rows_of(df):
    return {r.row for r in df.select("row").distinct().collect()}


def rqv(df):
    return {(r.row, r.qualifier, r.value) for r in df.collect()}


def scan_with(region, flt, **kw):
    return scan(region, Scan(filter=flt, **kw))


def test_row_filter(region):
    out = scan_with(region, RowFilter("=", BinaryComparator("testRowOne-2")))
    assert rows_of(out) == {"testRowOne-2"}
    out = scan_with(region, RowFilter(">=", BinaryComparator("testRowTwo-0")))
    assert rows_of(out) == set(ROWS_TWO)


def test_family_filter(region):
    out = scan_with(region, FamilyFilter("=", BinaryComparator("testFamilyTwo")))
    assert {r.family for r in out.collect()} == {"testFamilyTwo"}


def test_qualifier_filter(region):
    out = scan_with(
        region, QualifierFilter("<", BinaryComparator("testQualifierOne-2"))
    )
    quals = {r.qualifier for r in out.collect()}
    assert quals == {"testQualifierOne-0", "testQualifierOne-1", "n"}


def test_value_filter_substring(region):
    out = scan_with(region, ValueFilter("=", SubstringComparator("valuetwo")))
    assert rows_of(out) == set(ROWS_TWO)
    assert all(r.value == V2 for r in out.collect())


def test_value_filter_regex(region):
    out = scan_with(region, ValueFilter("=", RegexStringComparator(".*One$")))
    vals = {r.value for r in out.collect()}
    assert vals == {V1}


def test_column_value_filter(region):
    out = scan_with(
        region,
        ColumnValueFilter("testFamilyOne", "testQualifierOne-1", "=", BinaryComparator(V2)),
    )
    got = rqv(out)
    assert got == {(r, "testQualifierOne-1", V2) for r in ROWS_TWO}


def test_single_column_value_filter(region):
    f = SingleColumnValueFilter(
        "testFamilyOne", "testQualifierOne-1", "=", BinaryComparator(V1)
    )
    out = scan_with(region, f)
    # whole rows kept, including other qualifiers
    assert rows_of(out) == set(ROWS_ONE)
    assert {r.qualifier for r in out.collect()} >= set(QUALIFIERS_ONE)


def test_scvf_filter_if_missing(region):
    # column exists nowhere -> all rows pass when filterIfMissing=False
    f = SingleColumnValueFilter("testFamilyOne", "nope", "=", BinaryComparator("x"))
    assert rows_of(scan_with(region, f)) == set(ROWS_ONE + ROWS_TWO)
    f2 = SingleColumnValueFilter(
        "testFamilyOne", "nope", "=", BinaryComparator("x"), filter_if_missing=True
    )
    assert rows_of(scan_with(region, f2)) == set()


def test_scvf_latest_version_only(region):
    # rowsOne's latest q0 version is "testValueOne@2", so an exact match
    # on the older V1 fails under latest-only semantics
    f = SingleColumnValueFilter(
        "testFamilyOne", "testQualifierOne-0", "=", BinaryComparator(V1)
    )
    assert rows_of(scan_with(region, f)) == set()


def test_scvf_latest_version_only_exact(region):
    f = SingleColumnValueFilter(
        "testFamilyOne", "testQualifierOne-0", "=", BinaryComparator(V1 + "@2")
    )
    assert rows_of(scan_with(region, f)) == set(ROWS_ONE)
    f_any = SingleColumnValueFilter(
        "testFamilyOne",
        "testQualifierOne-0",
        "=",
        BinaryComparator(V1),
        latest_version_only=False,
    )
    # with versions=2 the older V1 version is visible and tested
    out = scan(region, Scan(filter=f_any, versions=2))
    assert set(ROWS_ONE) <= rows_of(out)


def test_scv_exclude_filter(region):
    f = SingleColumnValueExcludeFilter(
        "testFamilyOne", "testQualifierOne-1", "=", BinaryComparator(V1)
    )
    out = scan_with(region, f)
    assert rows_of(out) == set(ROWS_ONE)
    assert (
        "testQualifierOne-1"
        not in {r.qualifier for r in out.filter(F.col("family") == "testFamilyOne").collect()}
    )


def test_dependent_column_filter(region):
    # reference column = (testFamilyOne, q0); only cells sharing its ts survive
    f = DependentColumnFilter("testFamilyOne", "testQualifierOne-0")
    out = scan(region, Scan(filter=f, versions=2))
    assert set(ROWS_ONE + ROWS_TWO) == rows_of(out)
    assert {r.ts for r in out.collect()} == {1, 2}
    f_drop = DependentColumnFilter(
        "testFamilyOne", "testQualifierOne-0", drop_dependent_column=True
    )
    out2 = scan(region, Scan(filter=f_drop, versions=2))
    assert (
        len(
            out2.filter(
                (F.col("family") == "testFamilyOne")
                & (F.col("qualifier") == "testQualifierOne-0")
            ).collect()
        )
        == 0
    )


def test_prefix_filter(region):
    out = scan_with(region, PrefixFilter("testRowOne"))
    assert rows_of(out) == set(ROWS_ONE)


def test_column_prefix_filter(region):
    out = scan_with(region, ColumnPrefixFilter("testQualifier"))
    assert {r.qualifier for r in out.collect()} == set(QUALIFIERS_ONE)


def test_multiple_column_prefix_filter(region):
    out = scan_with(region, MultipleColumnPrefixFilter(["n", "testQualifierOne-1"]))
    assert {r.qualifier for r in out.collect()} == {"n", "testQualifierOne-1"}


def test_column_range_filter(region):
    out = scan_with(
        region,
        ColumnRangeFilter("testQualifierOne-1", True, "testQualifierOne-3", False),
    )
    assert {r.qualifier for r in out.collect()} == {
        "testQualifierOne-1",
        "testQualifierOne-2",
    }


def test_column_pagination_filter(region):
    out = scan_with(region, ColumnPaginationFilter(2, 1))
    # columns per row in (family, qualifier) order: ('nums','n') ranks 1,
    # then testFamilyOne q0..q3; offset 1 limit 2 -> ranks 2..3 = q0, q1
    got = {(r.family, r.qualifier) for r in out.collect()}
    assert got == {
        ("testFamilyOne", "testQualifierOne-0"),
        ("testFamilyOne", "testQualifierOne-1"),
    }


def test_column_count_get_filter(region):
    out = scan_with(region, ColumnCountGetFilter(3))
    per_row = out.groupBy("row").agg(
        F.countDistinct("family", "qualifier").alias("n")
    )
    assert all(r.n <= 3 for r in per_row.collect())


def test_page_filter(region):
    out = scan_with(region, PageFilter(3))
    assert rows_of(out) == set(sorted(ROWS_ONE + ROWS_TWO)[:3])


def test_inclusive_stop_filter(region):
    out = scan_with(region, InclusiveStopFilter("testRowOne-1"))
    assert rows_of(out) == {"testRowOne-0", "testRowOne-1"}


def test_multi_row_range_filter(region):
    out = scan_with(
        region,
        MultiRowRangeFilter(
            [
                ("testRowOne-0", True, "testRowOne-1", True),
                ("testRowTwo-3", True, None, False),
            ]
        ),
    )
    assert rows_of(out) == {"testRowOne-0", "testRowOne-1", "testRowTwo-3"}


def test_fuzzy_row_filter(region):
    # fixed 'testRow' prefix, wildcard middle, fixed '-2' suffix
    pattern = "testRowOne-2"
    mask = "0000000111100"  # 'One-' wildcarded, final digit fixed
    out = scan_with(region, FuzzyRowFilter([(pattern, mask)]))
    assert rows_of(out) == {"testRowOne-2", "testRowTwo-2"}


def test_timestamps_filter(region):
    out = scan(region, Scan(filter=TimestampsFilter([2]), versions=2))
    assert {r.ts for r in out.collect()} == {2}


def test_key_only_filter(region):
    out = scan_with(region, KeyOnlyFilter())
    assert all(r.value is None for r in out.collect())
    out2 = scan_with(region, KeyOnlyFilter(len_as_val=True))
    vals = {r.value for r in out2.filter(F.col("qualifier") == "testQualifierOne-1").collect()}
    assert vals == {str(len(V1)), str(len(V2))}


def test_first_key_only_filter(region):
    out = scan_with(region, FirstKeyOnlyFilter())
    assert out.count() == 8  # one cell per row
    assert rows_of(out) == set(ROWS_ONE + ROWS_TWO)


def test_random_row_filter_deterministic(region):
    a = rows_of(scan_with(region, RandomRowFilter(0.5, seed=7)))
    b = rows_of(scan_with(region, RandomRowFilter(0.5, seed=7)))
    assert a == b
    assert rows_of(scan_with(region, RandomRowFilter(1.0))) == set(ROWS_ONE + ROWS_TWO)
    assert rows_of(scan_with(region, RandomRowFilter(0.0))) == set()


def test_skip_filter(region):
    # drop any row containing a cell with value V2 anywhere
    out = scan_with(region, SkipFilter(ValueFilter("!=", BinaryComparator(V2))))
    assert rows_of(out) == set(ROWS_ONE)


def test_while_match_filter(region):
    # stop at the first row whose row key is >= testRowTwo-1
    out = scan_with(
        region, WhileMatchFilter(RowFilter("<", BinaryComparator("testRowTwo-1")))
    )
    assert rows_of(out) == set(ROWS_ONE) | {"testRowTwo-0"}


def test_filter_list_and_or(region):
    f = FilterList(
        "AND",
        [PrefixFilter("testRowOne"), QualifierFilter("=", BinaryComparator("n"))],
    )
    out = scan_with(region, f)
    assert rqv(out) == {(r, "n", str(i)) for i, r in enumerate(ROWS_ONE)}

    f2 = FilterList(
        "OR",
        [
            RowFilter("=", BinaryComparator("testRowOne-0")),
            RowFilter("=", BinaryComparator("testRowTwo-3")),
        ],
    )
    assert rows_of(scan_with(region, f2)) == {"testRowOne-0", "testRowTwo-3"}


def test_filter_list_nested_with_row_stage(region):
    f = FilterList(
        "AND",
        [
            ValueFilter("=", SubstringComparator("valueone")),
            PageFilter(2),
        ],
    )
    out = scan_with(region, f)
    assert rows_of(out) == {"testRowOne-0", "testRowOne-1"}


def test_filter_list_or_page_branch(region):
    # OR with a row-stage PageFilter branch: the page branch admits its
    # first row; the prefix branch admits all rowsTwo
    f = FilterList("OR", [PageFilter(1), PrefixFilter("testRowTwo")])
    out = scan_with(region, f)
    assert rows_of(out) == {"testRowOne-0"} | set(ROWS_TWO)


def test_long_comparator(region):
    out = scan_with(
        region,
        FilterList(
            "AND",
            [
                FamilyFilter("=", BinaryComparator("nums")),
                ValueFilter(">=", LongComparator(6)),
            ],
        ),
    )
    assert {r.value for r in out.collect()} == {"6", "7"}


def test_bit_comparator(region):
    # values 0..7; AND with 1 nonzero -> odd values
    out = scan_with(
        region,
        FilterList(
            "AND",
            [
                FamilyFilter("=", BinaryComparator("nums")),
                ValueFilter("=", BitComparator(1, "AND")),
            ],
        ),
    )
    assert {r.value for r in out.collect()} == {"1", "3", "5", "7"}


def test_null_comparator(region, spark):
    # add an empty-valued cell; NullComparator EQUAL matches only it
    extra = spark.createDataFrame(
        [("zz-empty", "testFamilyOne", "q", 1, 4, "", 9_999)], schema=cell_schema()
    )
    seeded = region.unionByName(extra)
    out = scan(seeded, Scan(filter=ValueFilter("=", NullComparator())))
    assert rows_of(out) == {"zz-empty"}


def test_binary_prefix_comparator(region):
    out = scan_with(region, ValueFilter("=", BinaryPrefixComparator("testValue")))
    assert out.filter(F.col("family") != "nums").count() > 0
    assert {r.value for r in out.collect() if r.family == "nums"} == set()


# ---- ParseFilter round-trips ------------------------------------------------


def test_parse_simple(region):
    f = parse_filter("RowFilter(>=, 'binary:testRowTwo-0')")
    assert rows_of(scan_with(region, f)) == set(ROWS_TWO)


def test_parse_combined(region):
    f = parse_filter(
        "(PrefixFilter('testRowOne') AND QualifierFilter(=, 'binary:n')) "
        "OR RowFilter(=, 'binary:testRowTwo-3')"
    )
    out = scan_with(region, f)
    assert rows_of(out) == set(ROWS_ONE) | {"testRowTwo-3"}


def test_parse_skip_while(region):
    f = parse_filter("SKIP ValueFilter(!=, 'binary:testValueTwo')")
    assert rows_of(scan_with(region, f)) == set(ROWS_ONE)
    f2 = parse_filter("WHILE RowFilter(<, 'binary:testRowTwo-1')")
    assert rows_of(scan_with(region, f2)) == set(ROWS_ONE) | {"testRowTwo-0"}


def test_parse_scvf(region):
    f = parse_filter(
        "SingleColumnValueFilter('testFamilyOne','testQualifierOne-1',=,"
        "'substring:valueone',true,true)"
    )
    assert rows_of(scan_with(region, f)) == set(ROWS_ONE)


def test_parse_quoted_escape():
    f = parse_filter("PrefixFilter('it''s')")
    assert f.prefix == "it's"


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_filter("NoSuchFilter(1)")
    with pytest.raises(ValueError):
        parse_filter("RowFilter(>=, 'binary:a'")


@given(
    st.text(
        alphabet="RowFilter(>=,'binary:a') ANDORSKIPWHILE\"'x10",
        max_size=60,
    )
)
@settings(max_examples=300, deadline=2000)
def test_parse_fuzz_never_hangs(s):
    # any input must either parse or raise ValueError promptly —
    # malformed strings previously looped forever in parse_unary
    try:
        parse_filter(s)
    except ValueError:
        pass


def test_scvf_matrix_multi_family(region):
    # the essential-family rewrite: 2x2 of filter_if_missing x
    # latest_version_only over rows spanning three families.
    # Guard column: (testFamilyOne, testQualifierOne-0); rowsOne have a
    # ts=2 second version V1+"@2" there, rowsTwo have only ts=1 V2.
    guard = ("testFamilyOne", "testQualifierOne-0")

    # latest_version_only=True: rowsOne's newest guard value is V1@2
    f = SingleColumnValueFilter(*guard, "=", V1 + "@2")
    out = scan_with(region, f, versions=2)
    assert rows_of(out) == set(ROWS_ONE)
    # surviving rows keep their OTHER families' cells (whole-row keep)
    fams = {r.family for r in out.collect()}
    assert fams == {"testFamilyOne", "testFamilyTwo", "nums"}

    # latest_version_only=False: the ts=1 version V1 also matches
    f = SingleColumnValueFilter(*guard, "=", V1, latest_version_only=False)
    assert rows_of(scan_with(region, f, versions=2)) == set(ROWS_ONE)
    # ...but with latest_version_only=True it does not
    f = SingleColumnValueFilter(*guard, "=", V1)
    assert rows_of(scan_with(region, f, versions=2)) == set()

    # filter_if_missing semantics on a guard column only rowsOne+Two
    # have vs the nums-only guard nobody-but-everyone has:
    f = SingleColumnValueFilter("nums", "missing-q", "=", "x")
    assert rows_of(scan_with(region, f)) == set(ROWS_ONE + ROWS_TWO)
    f = SingleColumnValueFilter(
        "nums", "missing-q", "=", "x", filter_if_missing=True
    )
    assert rows_of(scan_with(region, f)) == set()


def test_filter_list_or_with_row_stage_children(region):
    # MUST_PASS_ONE of two SCVFs (FilterListWithOR.java:34): a row
    # passes if either guard matches — union of branch include-sets
    f = FilterList(
        "OR",
        [
            SingleColumnValueFilter(
                "testFamilyOne", "testQualifierOne-1", "=", BinaryComparator(V1)
            ),
            SingleColumnValueFilter("nums", "n", "=", BinaryComparator("6")),
        ],
    )
    out = scan_with(region, f)
    assert rows_of(out) == set(ROWS_ONE) | {"testRowTwo-2"}  # nums "6" is row idx 6


def test_filter_list_or_mixes_cell_and_row_stage(region):
    # cell-level branch admits its matching cells; row-stage branch
    # admits whole passing rows; result is the union
    f = FilterList(
        "OR",
        [
            ValueFilter("=", BinaryComparator("0")),  # nums cell of first row
            SingleColumnValueFilter("nums", "n", "=", BinaryComparator("5")),
        ],
    )
    out = scan_with(region, f)
    rows = rows_of(out)
    assert rows == {"testRowOne-0", "testRowTwo-1"}
    # the cell-branch row contributes ONLY its matching cell
    one = out.filter(F.col("row") == "testRowOne-0").collect()
    assert {(r.qualifier, r.value) for r in one} == {("n", "0")}
    # the row-stage branch keeps the whole row
    assert out.filter(F.col("row") == "testRowTwo-1").count() > 1


def test_filter_list_or_rejects_transforming_child(region):
    with pytest.raises(NotImplementedError):
        FilterList("OR", [KeyOnlyFilter(), PrefixFilter("x")])


def test_parse_or_of_scvf_row_stage(region):
    # the string language now reaches the OR-of-row-stage path
    f = parse_filter(
        "SingleColumnValueFilter('testFamilyOne','testQualifierOne-1',=,"
        "'binary:testValueOne') OR SingleColumnValueFilter('nums','n',=,"
        "'binary:6')"
    )
    out = scan_with(region, f)
    assert rows_of(out) == set(ROWS_ONE) | {"testRowTwo-2"}


def test_nested_filter_list_and_of_or(region):
    # (prefix OR prefix) AND qualifier< — nested lists compose
    inner = FilterList(
        "OR", [PrefixFilter("testRowOne-1"), PrefixFilter("testRowTwo-2")]
    )
    outer = FilterList(
        "AND",
        [inner, QualifierFilter("<", BinaryComparator("testQualifierOne-1"))],
    )
    out = scan_with(region, outer)
    got = rqv(out.filter(F.col("family") == "testFamilyOne"))
    assert got == {
        ("testRowOne-1", "testQualifierOne-0", V1 + "@2"),
        ("testRowTwo-2", "testQualifierOne-0", V2),
    }


def test_skip_wrapping_filter_list(region):
    # SKIP (value != "0") drops every row containing a "0" cell —
    # i.e. only testRowOne-0's nums cell is "0", dropping that row
    f = SkipFilter(
        FilterList("AND", [ValueFilter("!=", BinaryComparator("0"))])
    )
    out = scan_with(region, f)
    assert rows_of(out) == set(ROWS_ONE[1:] + ROWS_TWO)


def test_while_match_with_list(region):
    # WHILE row < testRowTwo-0: take-while over the AND list
    f = WhileMatchFilter(
        FilterList("AND", [RowFilter("<", BinaryComparator("testRowTwo-0"))])
    )
    out = scan_with(region, f)
    assert rows_of(out) == set(ROWS_ONE)


def test_while_match_reversed_scan(spark):
    """Reversed scan + WHILE: take-while proceeds from the highest key
    downward and stops at the first rejected row from that side."""
    from hbase_spark.filters import BinaryComparator, ValueFilter, WhileMatchFilter
    from hbase_spark.model import CellType, cell_schema
    from hbase_spark.operators.scan import Scan, scan

    rows = [
        (f"r{i}", "f", "q", 1, CellType.PUT, "bad" if i == 3 else "ok", i)
        for i in range(6)
    ]
    cells = spark.createDataFrame(rows, schema=cell_schema())
    flt = WhileMatchFilter(ValueFilter("=", BinaryComparator("ok")))
    fwd = {r.row for r in scan(cells, Scan(filter=flt)).collect()}
    assert fwd == {"r0", "r1", "r2"}
    rev = {r.row for r in scan(cells, Scan(filter=flt, reversed=True)).collect()}
    assert rev == {"r4", "r5"}
