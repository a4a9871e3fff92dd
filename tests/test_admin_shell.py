"""Admin catalog + shell-DSL surface tests."""

import shutil
import tempfile

import pytest

from hbase_spark.admin import Admin, TableNotEnabledError
from hbase_spark.shell import (
    shell_count,
    shell_delete,
    shell_get,
    shell_put,
    shell_scan,
)
from hbase_spark.table import FamilyDescriptor


@pytest.fixture()
def catalog(spark):
    d = tempfile.mkdtemp(prefix="hb_admin_")
    yield Admin(spark, d)
    shutil.rmtree(d, ignore_errors=True)


def test_create_mutate_flush_reopen(catalog):
    catalog.create_table("t1", {"f": FamilyDescriptor(max_versions=2)})
    t = catalog.table("t1")
    t = shell_put(t, "r1", "f:a", "1", ts=10, seq=1)
    t = shell_put(t, "r2", "f:a", "2", ts=10, seq=2)
    catalog.flush("t1", t, num_regions=2)
    t2 = catalog.table("t1")
    assert shell_count(t2) == 2
    got = {r.row: r.value for r in shell_get(t2, "r1", COLUMNS=["f:a"]).collect()}
    assert got == {"r1": "1"}


def test_shell_scan_filter_string_and_columns(catalog):
    catalog.create_table("t2", ["f"])
    t = catalog.table("t2")
    for i in range(6):
        t = shell_put(t, f"row-{i}", "f:q", f"v{i}", ts=10, seq=i)
    out = shell_scan(
        t, STARTROW="row-1", STOPROW="row-5", FILTER="PrefixFilter('row')",
        COLUMNS=["f:q"], LIMIT=3,
    )
    assert [r.row for r in out.select("row").distinct().orderBy("row").collect()] == [
        "row-1", "row-2", "row-3",
    ]


def test_shell_delete_masks(catalog):
    catalog.create_table("t3", ["f"])
    t = catalog.table("t3")
    t = shell_put(t, "r", "f:q", "x", ts=10, seq=1)
    t = shell_delete(t, "r", "f:q", ts=20, seq=2)
    assert shell_count(t) == 0


def test_disable_enable_delete(catalog):
    catalog.create_table("t4", ["f"])
    catalog.disable_table("t4")
    with pytest.raises(TableNotEnabledError):
        catalog.table("t4")
    with pytest.raises(RuntimeError):
        catalog.create_table("t5", ["f"]) or catalog.delete_table("t5")
    catalog.enable_table("t4")
    assert catalog.describe("t4")["enabled"]
    catalog.disable_table("t4")
    catalog.delete_table("t4")
    assert "t4" not in catalog.list_tables()


def test_list_tables(catalog):
    catalog.create_table("a1", ["f"])
    catalog.create_table("a2", ["f"])
    assert catalog.list_tables() == ["a1", "a2"]


def test_shell_scan_raw_and_timerange(catalog):
    catalog.create_table("t6", ["f"])
    t = catalog.table("t6")
    t = shell_put(t, "r", "f:q", "v1", ts=10, seq=1)
    t = shell_put(t, "r", "f:q", "v2", ts=20, seq=2)
    t = shell_delete(t, "r", "f:q", ts=30, seq=3)
    # RAW exposes tombstone + both versions
    raw = shell_scan(t, RAW=True)
    assert raw.count() == 3
    # TIMERANGE before the delete still masked (marker outside range
    # masks under default KEEP_DELETED_CELLS=FALSE)
    assert shell_scan(t, TIMERANGE=(0, 25)).count() == 0
    # VERSIONS over raw-visible history
    assert shell_scan(t, RAW=True, VERSIONS=2).count() == 3


def test_alter_modify_and_describe(catalog):
    from hbase_spark.shell import shell_alter, shell_describe, shell_exists

    catalog.create_table("t7", ["f"])
    shell_alter(catalog, "t7", {"NAME": "f", "VERSIONS": 3, "TTL": 60})
    d = shell_describe(catalog, "t7")
    assert d["FAMILIES"]["f"]["VERSIONS"] == 3
    assert d["FAMILIES"]["f"]["TTL"] == 60
    # the opened Table picks up the altered knobs
    t = catalog.table("t7", now=0)
    assert t.families["f"].max_versions == 3
    assert t.families["f"].ttl_ms == 60_000
    assert shell_exists(catalog, "t7") and not shell_exists(catalog, "nope")


def test_alter_add_and_delete_family(catalog):
    from hbase_spark.shell import shell_alter, shell_describe, shell_put

    catalog.create_table("t8", ["f"])
    shell_alter(catalog, "t8", {"NAME": "g", "VERSIONS": 1})
    assert set(shell_describe(catalog, "t8")["FAMILIES"]) == {"f", "g"}
    t = catalog.table("t8")
    t = shell_put(t, "r", "f:q", "keep", ts=1, seq=1)
    t = shell_put(t, "r", "g:q", "drop", ts=1, seq=2)
    catalog.flush("t8", t, num_regions=2)
    shell_alter(catalog, "t8", {"NAME": "g", "METHOD": "delete"})
    got = {r.family for r in catalog.table("t8").scan().collect()}
    assert got == {"f"}  # dropped family invisible immediately


def test_truncate_keeps_schema(catalog):
    from hbase_spark.shell import shell_put, shell_truncate

    catalog.create_table("t9", ["f"])
    t = shell_put(catalog.table("t9"), "r", "f:q", "v", ts=1, seq=1)
    catalog.flush("t9", t, num_regions=2)
    assert catalog.table("t9").count() == 1
    shell_truncate(catalog, "t9")
    assert catalog.table("t9").count() == 0
    assert "f" in catalog.describe("t9")["families"]


def test_shell_incr_append_counter(catalog):
    from hbase_spark.shell import (
        shell_append,
        shell_get_counter,
        shell_incr,
        shell_put,
    )

    catalog.create_table("t10", ["f"])
    t = catalog.table("t10")
    t = shell_incr(t, "r", "f:hits", 5, ts=1, seq=1)
    t = shell_incr(t, "r", "f:hits", 3, ts=2, seq=2)
    assert shell_get_counter(t, "r", "f:hits") == 8
    assert shell_get_counter(t, "r", "f:miss") is None
    t = shell_put(t, "r", "f:tag", "a", ts=3, seq=3)
    t = shell_append(t, "r", "f:tag", "b", ts=4, seq=4)
    got = {r.value for r in t.get("r").filter("qualifier='tag'").collect()}
    assert got == {"ab"}


def test_shell_deleteall_masks_whole_row(catalog):
    from hbase_spark.shell import shell_deleteall, shell_put

    catalog.create_table("t11", ["f", "g"])
    t = catalog.table("t11")
    t = shell_put(t, "r1", "f:a", "1", ts=1, seq=1)
    t = shell_put(t, "r1", "g:b", "2", ts=1, seq=2)
    t = shell_put(t, "r2", "f:a", "3", ts=1, seq=3)
    t = shell_deleteall(t, "r1", ts=5, seq=9)
    rows = {r.row for r in t.scan().collect()}
    assert rows == {"r2"}


def test_snapshot_restore_point_in_time(catalog):
    from hbase_spark.shell import (
        shell_list_snapshots,
        shell_restore_snapshot,
        shell_snapshot,
    )

    catalog.create_table("s1", ["f"])
    t = catalog.table("s1")
    t = shell_put(t, "r1", "f:a", "old", ts=10, seq=1)
    catalog.flush("s1", t, num_regions=2)
    shell_snapshot(catalog, "s1", "snap-before")
    # mutate past the snapshot point
    t = catalog.table("s1")
    t = shell_put(t, "r1", "f:a", "new", ts=20, seq=2)
    t = shell_put(t, "r2", "f:a", "x", ts=20, seq=3)
    catalog.flush("s1", t, num_regions=2)
    assert shell_count(catalog.table("s1")) == 2
    assert shell_list_snapshots(catalog) == ["snap-before"]
    # restore requires disable, like the reference
    with pytest.raises(RuntimeError):
        shell_restore_snapshot(catalog, "snap-before")
    catalog.disable_table("s1")
    shell_restore_snapshot(catalog, "snap-before")
    catalog.enable_table("s1")
    back = catalog.table("s1")
    assert shell_count(back) == 1
    assert [r.value for r in shell_get(back, "r1", COLUMNS=["f:a"]).collect()] == [
        "old"
    ]


def test_clone_snapshot_is_zero_copy_and_cow(catalog):
    from hbase_spark.shell import shell_clone_snapshot, shell_snapshot

    catalog.create_table("src", ["f"])
    t = catalog.table("src")
    for i in range(4):
        t = shell_put(t, f"r{i}", "f:a", str(i), ts=10, seq=i)
    catalog.flush("src", t, num_regions=2)
    shell_snapshot(catalog, "src", "snap1")
    shell_clone_snapshot(catalog, "snap1", "dst")
    # zero-copy: the clone reads the SAME parquet files as the source
    src_files = set(catalog.table("src").cells.inputFiles())
    dst_files = set(catalog.table("dst").cells.inputFiles())
    assert src_files == dst_files and src_files
    # copy-on-write: flushing the clone must not disturb src or the snapshot
    d = catalog.table("dst")
    d = shell_put(d, "r9", "f:a", "clone-only", ts=20, seq=9)
    catalog.flush("dst", d, num_regions=2)
    assert shell_count(catalog.table("dst")) == 5
    assert shell_count(catalog.table("src")) == 4
    assert set(catalog.table("src").cells.inputFiles()) == src_files


def test_flush_preserves_snapshot_data(catalog):
    # versioned dirs: a flush AFTER the snapshot must not invalidate it
    from hbase_spark.shell import shell_clone_snapshot, shell_snapshot

    catalog.create_table("v1", ["f"])
    t = catalog.table("v1")
    t = shell_put(t, "r", "f:a", "kept", ts=10, seq=1)
    catalog.flush("v1", t, num_regions=1)
    shell_snapshot(catalog, "v1", "pinned")
    for gen in range(2):  # two more flush generations
        t = catalog.table("v1")
        t = shell_put(t, f"g{gen}", "f:a", "later", ts=20 + gen, seq=10 + gen)
        catalog.flush("v1", t, num_regions=1)
    shell_clone_snapshot(catalog, "pinned", "v1-at-snap")
    assert shell_count(catalog.table("v1-at-snap")) == 1
    assert shell_count(catalog.table("v1")) == 3


def test_delete_snapshot(catalog):
    from hbase_spark.shell import (
        shell_delete_snapshot,
        shell_list_snapshots,
        shell_snapshot,
    )

    catalog.create_table("ds", ["f"])
    shell_snapshot(catalog, "ds", "gone")
    shell_delete_snapshot(catalog, "gone")
    assert shell_list_snapshots(catalog) == []
    with pytest.raises(ValueError):
        catalog.clone_snapshot("never-existed", "x")


def test_namespace_lifecycle(catalog):
    from hbase_spark.shell import (
        shell_create_namespace,
        shell_describe_namespace,
        shell_drop_namespace,
        shell_list_namespace,
    )

    shell_create_namespace(catalog, "prod")
    assert shell_list_namespace(catalog) == ["default", "prod"]
    assert shell_describe_namespace(catalog, "prod")["name"] == "prod"
    catalog.create_table("prod:users", ["f"])
    t = catalog.table("prod:users")
    t = shell_put(t, "u1", "f:a", "1", ts=10, seq=1)
    catalog.flush("prod:users", t, num_regions=1)
    assert shell_count(catalog.table("prod:users")) == 1
    assert "prod:users" in catalog.list_tables()
    # drop refuses while tables remain
    with pytest.raises(RuntimeError):
        shell_drop_namespace(catalog, "prod")
    catalog.disable_table("prod:users")
    catalog.delete_table("prod:users")
    shell_drop_namespace(catalog, "prod")
    assert shell_list_namespace(catalog) == ["default"]
    with pytest.raises(ValueError):
        catalog.create_namespace("bad/name")
