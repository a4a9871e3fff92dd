"""Table facade (client/Table.java surface) + visibility labels."""

import pytest
from pyspark.sql import functions as F

from hbase_spark import Table
from hbase_spark.model import CellType, cell_schema
from hbase_spark.table import FamilyDescriptor
from hbase_spark.functions.visibility import evaluate, visible


@pytest.fixture()
def table(spark):
    cells = spark.createDataFrame(
        [
            ("r1", "f", "a", 10, CellType.PUT, "1", 1),
            ("r1", "f", "b", 10, CellType.PUT, "x", 2),
            ("r2", "f", "a", 10, CellType.PUT, "5", 3),
        ],
        schema=cell_schema(),
    )
    return Table(cells)


def test_put_get_exists(table):
    t = table.put([("r3", "f", "a", "9")], ts=20, seq=10)
    assert t.exists("r3") and not t.exists("r9")
    got = {(r.qualifier, r.value) for r in t.get("r3").collect()}
    assert got == {("a", "9")}


def test_delete_masks(table):
    t = table.delete([("r1", "f", "a", )[:3]], ts=15, seq=10)
    vis = {(r.row, r.qualifier) for r in t.snapshot().collect()}
    assert ("r1", "a") not in vis and ("r1", "b") in vis


def test_increment_and_append(table):
    t = table.increment([("r1", "f", "a", 7)], ts=20, seq=10)
    assert t.get("r1").filter("qualifier='a'").collect()[0].value == "8"
    t = t.append([("r1", "f", "b", "!")], ts=21, seq=11)
    assert t.get("r1").filter("qualifier='b'").collect()[0].value == "x!"


def test_batch_and_count(table, spark):
    m1 = spark.createDataFrame(
        [("r4", "f", "a", 30, CellType.PUT, "z", 20)], schema=cell_schema()
    )
    m2 = spark.createDataFrame(
        [("r2", "f", "a", 30, CellType.DELETE_FAMILY, None, 21)],
        schema=cell_schema(),
    )
    t = table.batch([m1, m2])
    assert t.count() == 2  # r1, r4 (r2 family-deleted)


def test_max_versions_schema(spark):
    cells = spark.createDataFrame(
        [
            ("r", "f", "q", t, CellType.PUT, f"v{t}", t)
            for t in (1, 2, 3)
        ],
        schema=cell_schema(),
    )
    t = Table(cells, families={"f": FamilyDescriptor(max_versions=2)})
    vals = sorted(r.value for r in t.snapshot().collect())
    assert vals == ["v2", "v3"]


def test_ttl(spark):
    cells = spark.createDataFrame(
        [
            ("r", "f", "old", 100, CellType.PUT, "dead", 1),
            ("r", "f", "new", 900, CellType.PUT, "live", 2),
        ],
        schema=cell_schema(),
    )
    t = Table(cells, families={"f": FamilyDescriptor(ttl_ms=500)}, now=1000)
    assert [r.qualifier for r in t.snapshot().collect()] == ["new"]


# ----------------------------------------------------------- visibility

def test_visibility_evaluate():
    auths = {"public", "audit"}
    assert evaluate("public", auths)
    assert evaluate(None, auths) and evaluate("", auths)
    assert not evaluate("pii", auths)
    assert evaluate("pii|audit", auths)
    assert not evaluate("pii&audit", auths)
    assert evaluate("!pii", auths)
    assert evaluate("audit&(public|pii)", auths)
    assert not evaluate("!(public|audit)", auths)
    with pytest.raises(ValueError):
        evaluate("a &", auths)
    with pytest.raises(ValueError):
        evaluate("(a", auths)


def test_visible_filters_cells(spark):
    df = spark.createDataFrame(
        [("r1", "public"), ("r2", "pii&audit"), ("r3", None), ("r4", "!pii")],
        "row string, labels string",
    )
    got = {r.row for r in visible(df, {"public", "audit"}).collect()}
    assert got == {"r1", "r3", "r4"}


def test_compact_preserves_kdc_back_in_time(spark):
    cells = spark.createDataFrame(
        [
            ("r1", "f", "q", 10, CellType.PUT, "old", 1),
            ("r1", "f", "q", 50, CellType.DELETE_COLUMN, None, 2),
        ],
        schema=cell_schema(),
    )
    fams = {"f": FamilyDescriptor(keep_deleted_cells=True)}
    t = Table(cells, fams).compact()
    # tombstone and masked put survive the rewrite...
    assert t.cells.count() == 2
    # ...so the back-in-time read still works post-compaction
    got = {r.value for r in t.snapshot(time_range=(0, 20)).collect()}
    assert got == {"old"}
    # without KDC, compaction physically drops both
    t2 = Table(cells, {"f": FamilyDescriptor()}).compact()
    assert t2.cells.count() == 0


def test_get_applies_family_knobs(spark):
    # a Get is a one-row Scan: TTL and max_versions from the descriptor
    # must mask expired/old versions in point reads too
    cells = spark.createDataFrame(
        [
            ("r1", "f", "q", 1_000, CellType.PUT, "stale", 1),
            ("r1", "f", "q", 9_000, CellType.PUT, "fresh", 2),
        ],
        schema=cell_schema(),
    )
    t = Table(cells, {"f": FamilyDescriptor(ttl_ms=5_000)}, now=10_000)
    got = {r.value for r in t.get("r1").collect()}
    assert got == {"fresh"}
    got2 = {r.value for r in t.multi_get(["r1", "rX"]).collect()}
    assert got2 == {"fresh"}
    assert t.exists("r1") and not t.exists("rX")


def test_increment_reads_under_ttl(spark):
    # the "current value" read of an increment must honor TTL: an
    # expired base cell counts as absent (delta starts from 0)
    cells = spark.createDataFrame(
        [("r1", "f", "cnt", 1_000, CellType.PUT, "100", 1)],
        schema=cell_schema(),
    )
    t = Table(cells, {"f": FamilyDescriptor(ttl_ms=5_000)}, now=10_000)
    t2 = t.increment([("r1", "f", "cnt", 7)], ts=9_000, seq=2)
    got = {r.value for r in t2.get("r1").collect()}
    assert got == {"7"}  # not "107": the expired base was invisible


# -- per-family descriptor knobs (strictly per-CF in the reference:
# client/ColumnFamilyDescriptor.java) ---------------------------------


def _two_family_cells(spark):
    rows = []
    for fam in ("cf1", "cf2"):
        for ts in (10, 20, 30):
            rows.append(("r1", fam, "q", ts, CellType.PUT, f"{fam}-v{ts}", ts))
    return spark.createDataFrame(rows, schema=cell_schema())


def test_heterogeneous_max_versions(spark):
    """cf1 MAX_VERSIONS=3, cf2 MAX_VERSIONS=1: each family returns its
    own version count, not a table-wide max."""
    t = Table(
        _two_family_cells(spark),
        families={
            "cf1": FamilyDescriptor(max_versions=3),
            "cf2": FamilyDescriptor(max_versions=1),
        },
    )
    got = t.snapshot().groupBy("family").count().collect()
    counts = {r.family: r["count"] for r in got}
    assert counts == {"cf1": 3, "cf2": 1}


def test_scan_versions_clamped_at_family_max(spark):
    """Scan(versions=5) on a max_versions=1 family returns 1 version
    (min(schema MAX_VERSIONS, readVersions) — client/Scan.java:487)."""
    from hbase_spark.operators.scan import Scan

    t = Table(
        _two_family_cells(spark),
        families={
            "cf1": FamilyDescriptor(max_versions=2),
            "cf2": FamilyDescriptor(max_versions=1),
        },
    )
    got = t.scan(Scan(versions=5)).groupBy("family").count().collect()
    counts = {r.family: r["count"] for r in got}
    assert counts == {"cf1": 2, "cf2": 1}


def test_per_family_nvb(spark):
    """NVB on cf1 only: same-ts delete-then-put survives in cf1 but is
    masked in cf2 (NewVersionBehaviorTracker semantics per family)."""
    rows = []
    for fam in ("cf1", "cf2"):
        rows += [
            ("r1", fam, "q", 10, CellType.DELETE, None, 1),
            ("r1", fam, "q", 10, CellType.PUT, "late-put", 2),
        ]
    cells = spark.createDataFrame(rows, schema=cell_schema())
    t = Table(
        cells,
        families={
            "cf1": FamilyDescriptor(new_version_behavior=True),
            "cf2": FamilyDescriptor(),
        },
    )
    got = {r.family for r in t.snapshot().collect()}
    assert got == {"cf1"}


def test_per_family_kdc_back_in_time(spark):
    """KEEP_DELETED_CELLS on cf1 only: a back-in-time read sees cf1's
    pre-delete state but not cf2's."""
    rows = []
    for fam in ("cf1", "cf2"):
        rows += [
            ("r1", fam, "q", 10, CellType.PUT, "old", 1),
            ("r1", fam, "q", 50, CellType.DELETE_COLUMN, None, 2),
        ]
    cells = spark.createDataFrame(rows, schema=cell_schema())
    t = Table(
        cells,
        families={
            "cf1": FamilyDescriptor(keep_deleted_cells=True),
            "cf2": FamilyDescriptor(),
        },
    )
    got = {r.family for r in t.snapshot(time_range=(None, 20)).collect()}
    assert got == {"cf1"}


def test_per_family_min_versions_ttl(spark):
    """MIN_VERSIONS=1 on cf1 keeps its newest expired cell; cf2 with
    MIN_VERSIONS=0 drops everything expired."""
    rows = [
        ("r1", "cf1", "q", 10, CellType.PUT, "old1", 1),
        ("r1", "cf2", "q", 10, CellType.PUT, "old2", 2),
    ]
    cells = spark.createDataFrame(rows, schema=cell_schema())
    t = Table(
        cells,
        families={
            "cf1": FamilyDescriptor(ttl_ms=100, min_versions=1),
            "cf2": FamilyDescriptor(ttl_ms=100),
        },
        now=10_000,
    )
    got = {r.family for r in t.snapshot().collect()}
    assert got == {"cf1"}


def test_buffered_mutator_coalesces_and_autoflushes(spark):
    from hbase_spark.operators.mutations import put_cells
    from hbase_spark.table import BufferedMutator, Table

    t = Table(put_cells(spark, [("r0", "f", "q", "base")], ts=1, seq=0))
    bm = BufferedMutator(t, buffer_size=4)
    for i in range(3):
        bm.mutate_put(f"r{i+1}", "f", "q", f"v{i}", ts=10, seq=i + 1)
    # below buffer_size: nothing applied yet
    assert bm.table.cells.count() == 1
    bm.mutate_delete("r0", "f", "q", ts=20, seq=9)  # 4th mutation -> autoflush
    assert bm.table.cells.count() == 5
    got = {r.row: r.value for r in bm.table.snapshot().collect()}
    assert got == {"r1": "v0", "r2": "v1", "r3": "v2"}  # r0 deleted
    # the whole batch is ONE union over the base plan, not one per put
    assert "Union" in bm.table.cells._jdf.queryExecution().logical().toString()
    # family check still applies through the buffer
    from hbase_spark.table import FamilyDescriptor, NoSuchColumnFamilyError

    bm2 = BufferedMutator(Table(bm.table.cells, {"f": FamilyDescriptor()}))
    with pytest.raises(NoSuchColumnFamilyError):
        bm2.mutate_put("r", "nope", "q", "x", ts=1, seq=1)


def test_scan_batch_partial_results(spark):
    """Scan.setBatch (client/Scan.java:475): a row's visible cells
    chunk into partial results of <= batch cells, counted in cell
    order (family asc, qualifier asc, newest version first)."""
    from hbase_spark.operators.mutations import make_cells
    from hbase_spark.operators.scan import Scan, scan

    cells = make_cells(
        spark,
        [("r1", "f", f"q{i}", 10, CellType.PUT, f"v{i}", i) for i in range(5)]
        + [("r1", "f", "q0", 20, CellType.PUT, "v0b", 9)]
        + [("r2", "g", "qa", 10, CellType.PUT, "w", 1)],
    )
    out = scan(cells, Scan(batch=2, versions=2))
    got = {
        (r.row, r.family, r.qualifier, r.ts): r.batch for r in out.collect()
    }
    # r1 order: q0@20, q0@10, q1, q2, q3, q4 -> batches 0,0,1,1,2,2
    assert got == {
        ("r1", "f", "q0", 20): 0,
        ("r1", "f", "q0", 10): 0,
        ("r1", "f", "q1", 10): 1,
        ("r1", "f", "q2", 10): 1,
        ("r1", "f", "q3", 10): 2,
        ("r1", "f", "q4", 10): 2,
        ("r2", "g", "qa", 10): 0,
    }
    with pytest.raises(ValueError):
        scan(cells, Scan(batch=0))


def test_scan_column_family_time_range(spark):
    """setColumnFamilyTimeRange (client/Scan.java:330): a family's own
    range overrides the scan-level one; other families keep it; the
    KDC marker bound follows each family's range."""
    from hbase_spark.operators.mutations import make_cells
    from hbase_spark.operators.scan import Scan, scan

    cells = make_cells(
        spark,
        [("r1", "a", "q", t, CellType.PUT, f"a{t}", t) for t in (10, 30, 50)]
        + [("r1", "b", "q", t, CellType.PUT, f"b{t}", t) for t in (10, 30, 50)],
    )
    out = scan(
        cells,
        Scan(time_range=(0, 20), family_time_ranges={"b": (40, 60)},
             versions=3),
    )
    got = {(r.family, r.ts) for r in out.collect()}
    assert got == {("a", 10), ("b", 50)}
    # family override alone (no scan-level range): others unconstrained
    out2 = scan(cells, Scan(family_time_ranges={"b": (0, 20)}, versions=3))
    got2 = {(r.family, r.ts) for r in out2.collect()}
    assert got2 == {("a", 10), ("a", 30), ("a", 50), ("b", 10)}
    # KDC: a marker past family b's range does not mask b's history,
    # while family a (marker within its global range) stays masked
    kdc = make_cells(
        spark,
        [("r1", "a", "q", 10, CellType.PUT, "av", 1),
         ("r1", "a", "q", 15, CellType.DELETE_COLUMN, None, 2),
         ("r1", "b", "q", 10, CellType.PUT, "bv", 1),
         ("r1", "b", "q", 30, CellType.DELETE_COLUMN, None, 2)],
    )
    out3 = scan(
        kdc,
        Scan(time_range=(0, 20), family_time_ranges={"b": (0, 20)},
             versions=3),
        keep_deleted_cells=True,
    )
    got3 = {(r.family, r.ts) for r in out3.collect()}
    assert got3 == {("b", 10)}
