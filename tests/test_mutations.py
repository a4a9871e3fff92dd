"""Mutation-merge semantics tests — mirrors the increment/append/
checkAndMutate cases of the reference's TestHRegion.java /
TestFromClientSide (SURVEY.md §5.2)."""

from pyspark.sql import functions as F

from hbase_spark.model import CellType, cell_schema
from hbase_spark.operators.mutations import (
    apply_appends,
    apply_check_and_mutate,
    apply_increments,
    apply_mutations,
    delete_cells,
    make_cells,
    put_cells,
)
from hbase_spark.operators.resolve import resolve


def snap_map(cells):
    return {
        (r.row, r.family, r.qualifier): r.value
        for r in resolve(cells, versions=1).collect()
    }


def base(spark):
    return put_cells(
        spark,
        [("r1", "f", "cnt", "5"), ("r1", "f", "log", "a"), ("r2", "f", "cnt", "100")],
        ts=10,
        seq=1,
    )


def test_put_then_delete_roundtrip(spark):
    cells = base(spark)
    cells = apply_mutations(
        cells, put_cells(spark, [("r3", "f", "x", "1")], ts=20, seq=2)
    )
    assert snap_map(cells)[("r3", "f", "x")] == "1"
    cells = apply_mutations(
        cells, delete_cells(spark, [("r3", "f", "x")], ts=30, seq=3)
    )
    assert ("r3", "f", "x") not in snap_map(cells)


def test_increment_existing_and_new(spark):
    cells = base(spark)
    deltas = spark.createDataFrame(
        [("r1", "f", "cnt", 7), ("r9", "f", "cnt", 3)],
        ["row", "family", "qualifier", "delta"],
    )
    out = apply_increments(cells, deltas, ts=20, seq=2)
    m = snap_map(out)
    assert m[("r1", "f", "cnt")] == "12"
    assert m[("r9", "f", "cnt")] == "3"  # coalesce(missing, 0) + 3
    assert m[("r2", "f", "cnt")] == "100"  # untouched


def test_increment_batch_sums(spark):
    cells = base(spark)
    deltas = spark.createDataFrame(
        [("r1", "f", "cnt", 1), ("r1", "f", "cnt", 2), ("r1", "f", "cnt", 3)],
        ["row", "family", "qualifier", "delta"],
    )
    out = apply_increments(cells, deltas, ts=20, seq=2)
    assert snap_map(out)[("r1", "f", "cnt")] == "11"


def test_increment_view_matches_apply_then_resolve(spark):
    """increment_view must equal resolve(apply_increments(...), versions=1)
    — same law the reference's reckonDeltas obeys (the post-increment
    visible state), including delta-created columns, tombstone masking,
    and the untouched passthrough."""
    from hbase_spark.operators.mutations import increment_view

    cells = apply_mutations(
        base(spark),
        delete_cells(spark, [("r2", "f", None)], ts=15, seq=2,
                     kind=CellType.DELETE_FAMILY),
    )
    deltas = spark.createDataFrame(
        [("r1", "f", "cnt", 7), ("r2", "f", "cnt", 3), ("r9", "f", "cnt", 1)],
        ["row", "family", "qualifier", "delta"],
    )
    via_apply = resolve(
        apply_increments(cells, deltas, ts=20, seq=3), versions=1
    )
    via_view = increment_view(cells, deltas, ts=20, seq=3)
    key = lambda r: (r.row, r.family, r.qualifier)  # noqa: E731
    a = {key(r): (r.ts, r.type, r.value, r.seq) for r in via_apply.collect()}
    v = {key(r): (r.ts, r.type, r.value, r.seq) for r in via_view.collect()}
    assert a == v
    # the family tombstone masked r2's old cnt: increment starts from 0
    assert v[("r2", "f", "cnt")][2] == "3"


def test_increment_view_snapshot_reuse(spark):
    """snapshot= skips the internal resolve and must give the same view."""
    from hbase_spark.operators.mutations import increment_view

    cells = base(spark)
    deltas = spark.createDataFrame(
        [("r1", "f", "cnt", 2)], ["row", "family", "qualifier", "delta"]
    )
    snap = resolve(cells, versions=1)
    direct = increment_view(cells, deltas, ts=20, seq=2).collect()
    reused = increment_view(cells, deltas, ts=20, seq=2, snapshot=snap).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, reused))


def test_append_concat_in_seq_order(spark):
    cells = base(spark)
    appends = spark.createDataFrame(
        [("r1", "f", "log", "c", 2), ("r1", "f", "log", "b", 1), ("r8", "f", "log", "z", 1)],
        ["row", "family", "qualifier", "delta", "seq"],
    )
    out = apply_appends(cells, appends, ts=20, seq=2)
    m = snap_map(out)
    assert m[("r1", "f", "log")] == "abc"
    assert m[("r8", "f", "log")] == "z"


def test_check_and_put_guard_passes_and_fails(spark):
    cells = base(spark)
    muts = put_cells(spark, [("r1", "f", "st", "won"), ("r2", "f", "st", "won")], ts=20, seq=2)
    out = apply_check_and_mutate(
        cells, muts, guard_family="f", guard_qualifier="cnt", op="=", value="5"
    )
    m = snap_map(out)
    assert m.get(("r1", "f", "st")) == "won"  # r1.cnt == 5 -> pass
    assert ("r2", "f", "st") not in m  # r2.cnt == 100 -> fail


def test_check_and_put_absent_column(spark):
    cells = base(spark)
    muts = put_cells(spark, [("r1", "f", "init", "1"), ("r9", "f", "init", "1")], ts=20, seq=2)
    # null-value guard = "column absent" (checkAndPut(..., null, put))
    out = apply_check_and_mutate(
        cells, muts, guard_family="f", guard_qualifier="init", op="="
    )
    m = snap_map(out)
    assert m.get(("r1", "f", "init")) == "1"
    assert m.get(("r9", "f", "init")) == "1"
    # second attempt must now fail on both (column present)
    muts2 = put_cells(spark, [("r1", "f", "init", "2")], ts=30, seq=3)
    out2 = apply_check_and_mutate(
        out, muts2, guard_family="f", guard_qualifier="init", op="="
    )
    assert snap_map(out2)[("r1", "f", "init")] == "1"


def test_check_and_delete(spark):
    cells = base(spark)
    muts = delete_cells(spark, [("r2", "f", "cnt")], ts=20, seq=2)
    out = apply_check_and_mutate(
        cells, muts, guard_family="f", guard_qualifier="cnt", op=">", value="050"
    )
    # "100" > "050" lexicographically -> guard passes, column deleted
    assert ("r2", "f", "cnt") not in snap_map(out)


def test_check_and_mutate_with_filter_guard(spark):
    from hbase_spark.filters import SingleColumnValueFilter

    cells = base(spark)
    muts = put_cells(spark, [("r1", "f", "st", "ok"), ("r2", "f", "st", "ok")], ts=20, seq=2)
    # filter_if_missing=True: rows lacking the guarded column fail the guard
    guard = SingleColumnValueFilter("f", "log", "=", "a", filter_if_missing=True)
    out = apply_check_and_mutate(cells, muts, guard_family=None, guard_qualifier=None, op="=", filter=guard)
    m = snap_map(out)
    assert m.get(("r1", "f", "st")) == "ok"  # r1 has log=a
    assert ("r2", "f", "st") not in m


def test_bulk_delete_by_scan(spark):
    # BulkDeleteEndpoint analog: tombstone every cell the predicate matches
    from hbase_spark.operators.mutations import bulk_delete

    cells = base(spark)
    tombs = bulk_delete(cells, F.col("qualifier") == "cnt", ts=20, seq=2)
    m = snap_map(apply_mutations(cells, tombs))
    assert set(m) == {("r1", "f", "log")}
    # DELETE kind removes only the matched versions (exact ts)
    cells2 = apply_mutations(
        cells, put_cells(spark, [("r1", "f", "cnt", "6")], ts=30, seq=3)
    )
    tombs2 = bulk_delete(
        cells2,
        (F.col("qualifier") == "cnt") & (F.col("ts") == 30),
        ts=0,
        seq=4,
        kind=CellType.DELETE,
        visible=resolve(cells2, versions=9),
    )
    m2 = snap_map(apply_mutations(cells2, tombs2))
    assert m2[("r1", "f", "cnt")] == "5"  # ts=30 masked, ts=10 resurfaces


def test_row_mutations_atomic_batch(spark):
    # RowMutations = one batch: put one column, delete another, same row/seq
    cells = base(spark)
    rm = make_cells(
        spark,
        [
            ("r1", "f", "st", 20, CellType.PUT, "done", 2),
            ("r1", "f", "log", 20, CellType.DELETE_COLUMN, None, 2),
        ],
    )
    out = apply_mutations(cells, rm)
    m = snap_map(out)
    assert m[("r1", "f", "st")] == "done"
    assert ("r1", "f", "log") not in m
