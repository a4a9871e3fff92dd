"""Observer-hook tests mirroring the reference coprocessor examples."""

from pyspark.sql import functions as F

from hbase_spark.operators.mutations import make_cells, put_cells
from hbase_spark.plans.observers import (
    ObservedTable,
    scan_modifying_observer,
    value_rewriting_observer,
    write_heavy_increment_observer,
)
from hbase_spark.table import Table


def base(spark):
    return Table(
        put_cells(
            spark,
            [("r1", "f", "a", "1"), ("r1", "f", "b", "2"), ("r2", "f", "a", "3")],
            ts=10,
            seq=1,
        )
    )


def test_scan_modifying_observer(spark):
    ot = ObservedTable(base(spark), [scan_modifying_observer(qualifiers=["a"])])
    got = {(r.row, r.qualifier) for r in ot.scan().collect()}
    assert got == {("r1", "a"), ("r2", "a")}


def test_value_rewriting_observer(spark):
    ot = ObservedTable(
        base(spark),
        [value_rewriting_observer(F.col("value") == "2", F.lit("rewritten"))],
    )
    vals = {r.qualifier: r.value for r in ot.scan().filter("row='r1'").collect()}
    assert vals == {"a": "1", "b": "rewritten"}


def test_write_heavy_increment_observer(spark):
    # three delta cells for (r1,f,cnt) -> scan returns their sum
    deltas = make_cells(
        spark,
        [
            ("r1", "f", "cnt", 10, 4, "5", 1),
            ("r1", "f", "cnt", 20, 4, "7", 2),
            ("r1", "f", "cnt", 30, 4, "-2", 3),
            ("r2", "f", "cnt", 10, 4, "100", 4),
        ],
    )
    ot = ObservedTable(Table(deltas), [write_heavy_increment_observer()])
    got = {(r.row, r.value) for r in ot.scan(versions=1_000_000).collect()}
    assert got == {("r1", "10"), ("r2", "100")}


def test_observer_chain_order(spark):
    # pre_scan projection runs before post_scan rewrite sees the frame
    ot = ObservedTable(
        base(spark),
        [
            scan_modifying_observer(qualifiers=["b"]),
            value_rewriting_observer(F.lit(True), F.lit("X")),
        ],
    )
    rows = ot.scan().collect()
    assert {(r.qualifier, r.value) for r in rows} == {("b", "X")}


def test_pre_mutate_hook(spark):
    from hbase_spark.plans.observers import Observer

    audit = Observer(
        pre_mutate=lambda df: df.withColumn("value", F.upper(F.col("value")))
    )
    ot = ObservedTable(base(spark), [audit])
    ot2 = ot.with_cells(put_cells(spark, [("r3", "f", "a", "low")], ts=20, seq=5))
    got = {r.value for r in ot2.table.scan().filter("row='r3'").collect()}
    assert got == {"LOW"}


def test_pre_get_and_post_get_hooks(spark):
    from hbase_spark.plans.observers import Observer

    redirect = Observer(pre_get=lambda k: "r1", post_get=lambda df: df.filter(
        F.col("qualifier") == "a"
    ))
    ot = ObservedTable(base(spark), [redirect])
    got = ot.get("whatever").collect()
    assert {(r.row, r.qualifier) for r in got} == {("r1", "a")}


def test_post_mutate_hook_sees_new_table(spark):
    from hbase_spark.plans.observers import Observer

    seen = []
    ob = Observer(post_mutate=lambda t: (seen.append(t.count()), t)[1])
    ot = ObservedTable(base(spark), [ob])
    ot.with_cells(put_cells(spark, [("r9", "f", "a", "v")], ts=20, seq=9))
    assert seen and seen[0] >= 3


def test_pre_compact_hook_rewrites_stream(spark):
    from hbase_spark.plans.observers import Observer

    # ZooKeeperScanPolicyObserver-style: drop cells older than a cutoff
    # during compaction only
    ob = Observer(pre_compact=lambda cells: cells.filter(F.col("ts") >= 10))
    ot = ObservedTable(base(spark), [ob])
    compacted = ot.compact()
    assert all(r.ts >= 10 for r in compacted.table.cells.collect())


# -- round-2 tranche: RMW / guard / lifecycle hooks ----------------------


def test_increment_and_append_hooks(spark):
    from hbase_spark.plans.observers import Observer

    seen = {}

    def double_deltas(deltas):
        seen["incr"] = True
        return [(r, f, q, v * 2) for (r, f, q, v) in deltas]

    def tag_append(appends):
        seen["app"] = True
        return [(r, f, q, v + "!") for (r, f, q, v) in appends]

    ot = ObservedTable(
        base(spark), [Observer(pre_increment=double_deltas, pre_append=tag_append)]
    )
    ot = ot.increment([("r1", "f", "cnt", 5)], ts=20, seq=2)
    got = {r.qualifier: r.value for r in ot.table.get("r1").collect()}
    assert got["cnt"] == "10"  # pre_increment doubled the delta
    ot = ot.append([("r1", "f", "a", "x")], ts=30, seq=3)
    got = {r.qualifier: r.value for r in ot.table.get("r1").collect()}
    assert got["a"] == "1x!"  # pre_append rewrote the payload
    assert seen == {"incr": True, "app": True}


def test_check_and_mutate_guard_hook(spark):
    from hbase_spark.model import CellType
    from hbase_spark.plans.observers import audit_guard_observer

    muts = make_cells(
        spark,
        [
            ("r1", "f", "a", 20, CellType.PUT, "ok", 2),
            ("r2", "f", "a", 20, CellType.PUT, "blocked", 3),
        ],
    )
    from hbase_spark.plans.observers import Observer

    seen = {}
    ot = ObservedTable(
        base(spark),
        [
            audit_guard_observer(F.col("value") == "blocked"),
            # postCheckAndMutate (RegionObserver.java:1037): notified
            # with — and free to replace — the guarded result table
            Observer(
                post_check_and_mutate=lambda t: (
                    seen.__setitem__("cells", t.cells.count()),
                    t,
                )[1]
            ),
        ],
    )
    ot = ot.check_and_mutate(
        muts, guard_family="f", guard_qualifier="a", op="=", value="1"
    )
    got = {r.row: r.value for r in ot.table.scan().filter("qualifier='a'").collect()}
    # r1 guard passed and mutation applied; r2's cell was vetoed by the
    # observer before the guard ever ran
    assert got == {"r1": "ok", "r2": "3"}
    assert seen["cells"] == ot.table.cells.count()  # post hook saw the result


def test_scan_policy_observer_drops_expired_at_flush_and_compact(spark):
    from hbase_spark.plans.observers import scan_policy_observer

    cells = make_cells(
        spark,
        [
            ("r1", "f", "a", 100, 4, "fresh", 1),
            ("r1", "f", "b", 10, 4, "stale", 2),
        ],
    )
    ot = ObservedTable(Table(cells), [scan_policy_observer(ttl_ms=50, now=120)])
    flushed = {r.qualifier for r in ot.flush_cells().collect()}
    assert flushed == {"a"}  # preFlush dropped the expired cell
    compacted = {r.qualifier for r in ot.compact().table.cells.collect()}
    assert compacted == {"a"}  # preCompact applies the same policy


def test_post_flush_and_post_compact_notifications(spark):
    """postFlush/postCompact (RegionObserver.java:163,:312) observe the
    written / compacted frame; combined with a preFlush policy the
    notification must see the POST-interception state."""
    from hbase_spark.plans.observers import (
        region_metrics_observer,
        scan_policy_observer,
    )

    cells = make_cells(
        spark,
        [
            ("r1", "f", "a", 100, 4, "fresh", 1),
            ("r1", "f", "b", 10, 4, "stale", 2),
            ("r1", "f", "a", 90, 4, "old-version", 3),
        ],
    )
    stats: dict = {}
    ot = ObservedTable(
        Table(cells),
        [scan_policy_observer(ttl_ms=50, now=120), region_metrics_observer(stats)],
    )
    ot.flush_cells()
    assert stats["flushed_cells"] == 2  # stale cell dropped pre-flush
    ot.compact()
    # compaction resolves to 1 visible cell (versions=1 on family f)
    assert stats["compacted_cells"] == 1


def test_bulk_load_observers(spark, tmp_path):
    """preBulkLoadHFile rewrites/drops before the layout write;
    postBulkLoadHFile observes what loaded — and the written layout
    contains only sanctioned families."""
    from hbase_spark.plans.observers import (
        observed_bulk_load,
        region_metrics_observer,
        secure_bulk_load_observer,
    )
    from hbase_spark.sources.layout import read_table

    cells = make_cells(
        spark,
        [
            ("r1", "f", "a", 10, 4, "keep", 1),
            ("r2", "g", "a", 10, 4, "drop-me", 2),
            ("r3", "f", "b", 10, 4, "keep2", 3),
        ],
    )
    stats: dict = {}
    path = str(tmp_path / "layout")
    observed_bulk_load(
        cells, path,
        [secure_bulk_load_observer(["f"]), region_metrics_observer(stats)],
        num_regions=2,
    )
    assert stats["bulk_loaded_cells"] == 2
    loaded = read_table(spark, path)
    assert {r.family for r in loaded.collect()} == {"f"}


# ----------------------------------------------------- master observers


def test_master_observer_veto_rewrite_audit(spark):
    """MasterObserver hooks around Admin DDL: veto (AccessController
    pattern), argument rewrite, and post-op audit notifications."""
    import shutil
    import tempfile

    import pytest

    from hbase_spark.admin import Admin
    from hbase_spark.plans.master_observers import (
        MasterObserver,
        ObservedAdmin,
        ddl_audit_observer,
        table_name_guard,
    )

    d = tempfile.mkdtemp(prefix="hb_mobs_")
    try:
        log = []
        admin = ObservedAdmin(
            Admin(spark, d), [table_name_guard("sys_"), ddl_audit_observer(log)]
        )
        admin.create_table("t1", ["f"])
        with pytest.raises(PermissionError):
            admin.create_table("sys_meta", ["f"])
        admin.snapshot("s1", "t1")
        admin.disable_table("t1")
        admin.delete_table("t1")
        assert log == [
            ("create_table", "t1"), ("snapshot", "s1"),
            ("disable_table", "t1"), ("delete_table", "t1"),
        ]
        # pre-hook rewrite: force every namespace lowercase
        rewriter = MasterObserver(
            pre_create_namespace=lambda a, k: ((a[0].lower(),) + a[1:], k)
        )
        admin2 = ObservedAdmin(Admin(spark, d), [rewriter])
        admin2.create_namespace("LOUD")
        assert "loud" in admin2.list_namespaces()
        # pass-through of non-DDL methods
        assert admin2.list_tables() == []
        with pytest.raises(ValueError):
            MasterObserver(pre_bogus_op=lambda a, k: None)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_access_controller_master_observer(spark):
    """ACL registry drives DDL authorization through the MasterObserver
    chain (AccessController.java as a master coprocessor)."""
    import shutil
    import tempfile

    import pytest

    from hbase_spark.admin import Admin
    from hbase_spark.plans.master_observers import (
        ObservedAdmin,
        access_controller,
    )

    d = tempfile.mkdtemp(prefix="hb_acl_mo_")
    try:
        root = Admin(spark, d)
        root.grant("alice", "C")           # global CREATE only
        root.grant("alice", "A", "t1")     # ADMIN on t1 specifically
        alice = ObservedAdmin(root, [access_controller(root, "alice")])
        alice.create_table("t1", ["f"])    # C globally: ok
        alice.snapshot("s1", "t1")         # A on t1: ok
        alice.disable_table("t1")
        alice.create_table("t2", ["f"])
        with pytest.raises(PermissionError):
            alice.disable_table("t2")      # no A on t2
        bob = ObservedAdmin(root, [access_controller(root, "bob")])
        with pytest.raises(PermissionError):
            bob.create_table("t3", ["f"])  # bob has nothing
        # reads are not DDL: pass through untouched
        assert "t1" in bob.list_tables()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_master_observer_region_switch_and_rsgroup_hooks(spark):
    """Round-3 MasterObserver widening: region geometry
    (preSplitRegion:575 / preMergeRegions:1193), master switches
    (preSetSplitOrMergeEnabled:555), table flush (preTableFlush:1031)
    and the rsgroup surface (preAddRSGroup:1271, preMoveTables:1252,
    preBalanceRSGroup:1307) all run through the observer chain —
    veto-able and audited like the rest of the DDL surface."""
    import shutil
    import tempfile

    import pytest

    from hbase_spark.admin import Admin
    from hbase_spark.plans.master_observers import (
        MasterObserver,
        ObservedAdmin,
        ddl_audit_observer,
    )
    from hbase_spark.shell import shell_put

    d = tempfile.mkdtemp(prefix="hb_mobs2_")
    try:
        log = []
        root = Admin(spark, d)
        admin = ObservedAdmin(root, [ddl_audit_observer(log)])
        admin.create_table("rg", ["f"])
        t = admin.table("rg")
        for i in range(20):
            t = shell_put(t, f"r{i:03d}", "f:q", str(i), ts=1, seq=i)
        admin.flush("rg", t, num_regions=2)
        admin.split_region("rg", "r005")
        admin.set_switch("balancer", False)
        admin.add_rsgroup("pool")
        admin.move_servers_rsgroup(["s:1"], "pool")
        admin.move_tables_rsgroup(["rg"], "pool")
        with pytest.raises(RuntimeError):  # balancer switch off, post skipped
            admin.balance_rsgroup("pool")
        ops = [op for op, _ in log]
        assert ops == [
            "create_table", "flush", "split_region", "set_switch",
            "add_rsgroup", "move_servers_rsgroup", "move_tables_rsgroup",
        ]
        # veto: a guard observer can refuse region splits outright
        guard = MasterObserver(
            pre_split_region=lambda a, k: (_ for _ in ()).throw(
                PermissionError("no manual splits")
            )
        )
        guarded = ObservedAdmin(root, [guard])
        with pytest.raises(PermissionError):
            guarded.split_region("rg", "r010")
        # rewrite: force rsgroup names lowercase
        rewriter = MasterObserver(
            pre_add_rsgroup=lambda a, k: ((a[0].lower(),) + a[1:], k)
        )
        admin3 = ObservedAdmin(root, [rewriter])
        admin3.add_rsgroup("POOL2")
        assert "pool2" in root.list_rsgroups()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_scanner_lifecycle_hooks_audit_and_rescue(spark):
    from hbase_spark.operators.scan import Scan
    from hbase_spark.plans.observers import (
        row_rescue_observer,
        scan_auditing_observer,
    )

    t = Table(
        put_cells(
            spark,
            [("r1", "f", "a", "1"), ("r2", "f", "a", "7"),
             ("r3", "f", "a", "9")],
            ts=10,
            seq=1,
        )
    )
    audit = {}
    spec = Scan(filter=F.col("value") < "5")  # drops r2, r3
    ot = ObservedTable(t, [scan_auditing_observer(audit)])
    got = {r.row for r in ot.scan(spec).collect()}
    assert got == {"r1"}
    assert audit["opened"] == 1
    assert audit["filtered_rows"] == 2
    assert audit["closing"] == 1 and audit["closed"] == 1

    # a rescue observer outranks the filter for matching rows
    ot2 = ObservedTable(t, [row_rescue_observer(F.col("row") == "r3")])
    got2 = {r.row for r in ot2.scan(spec).collect()}
    assert got2 == {"r1", "r3"}

    # no filter -> the filter-row hook never fires (no extra scan)
    audit2 = {}
    ObservedTable(t, [scan_auditing_observer(audit2)]).scan().collect()
    assert "filtered_rows" not in audit2
    assert audit2["opened"] == 1

    # filter + limit: the hook sees only FILTER-dropped rows — rows
    # the filter kept but the limit cut must not reach it (the
    # reference hook fires per filter-excluded row), so the audit
    # counts 1 (r3) not 2, and a rescue targeting the limit-cut row
    # (r2) resurrects nothing — the limit contract holds.
    audit3 = {}
    spec_lim = Scan(filter=F.col("value") < "8", limit=1)  # keeps r1
    ot3 = ObservedTable(t, [scan_auditing_observer(audit3)])
    got3 = {r.row for r in ot3.scan(spec_lim).collect()}
    assert got3 == {"r1"}
    assert audit3["filtered_rows"] == 1  # r3 only
    ot4 = ObservedTable(t, [row_rescue_observer(F.col("row") == "r2")])
    assert {r.row for r in ot4.scan(spec_lim).collect()} == {"r1"}
    # while a genuinely filter-dropped row still rescues
    ot5 = ObservedTable(t, [row_rescue_observer(F.col("row") == "r3")])
    assert {r.row for r in ot5.scan(spec_lim).collect()} == {"r1", "r3"}


def test_exists_hooks_short_circuit_and_rewrite(spark):
    from hbase_spark.plans.observers import Observer

    t = base(spark)
    calls = []

    def pre(key):
        calls.append(key)
        return True if key == "ghost" else None  # bypass only for ghost

    ot = ObservedTable(t, [Observer(pre_exists=pre)])
    # preExists answers for the missing key without a read (bypass)
    assert ot.exists("ghost") is True
    # pre returns None -> the real read runs
    assert ot.exists("r1") is True
    assert ot.exists("nope") is False
    assert calls == ["ghost", "r1", "nope"]

    # postExists may rewrite the verdict
    ot2 = ObservedTable(t, [Observer(post_exists=lambda k, found: not found)])
    assert ot2.exists("r1") is False
    assert ot2.exists("nope") is True


def test_batch_mutate_hooks(spark):
    from hbase_spark.plans.observers import Observer

    t = base(spark)
    seen = {}

    def pre(frames):
        seen["n"] = len(frames)
        return frames[:1]  # drop the second mutation frame

    def post(table):
        seen["post_rows"] = table.snapshot().count()
        return table

    m1 = put_cells(spark, [("r9", "f", "a", "x")], ts=20, seq=5)
    m2 = put_cells(spark, [("r8", "f", "a", "y")], ts=20, seq=6)
    ot = ObservedTable(t, [Observer(pre_batch_mutate=pre, post_batch_mutate=post)])
    out = ot.batch([m1, m2])
    rows = {r.row for r in out.table.snapshot().collect()}
    assert seen["n"] == 2
    assert "r9" in rows and "r8" not in rows  # frame 2 was dropped
    assert seen["post_rows"] == out.table.snapshot().count()


def test_commit_store_file_hooks_stage_then_commit(spark, tmp_path):
    """pre/postCommitStoreFile (RegionObserver.java:1449,1460): with
    commit hooks present the bulk load stages the layout and moves
    each store file individually — the pre hook sees every staged
    (family, src) before its move, the post hook every committed
    path, and the final layout reads back identical to an unhooked
    load."""
    import os

    from hbase_spark.plans.observers import Observer, observed_bulk_load
    from hbase_spark.sources.layout import read_table

    cells = make_cells(
        spark,
        [(f"r{i}", fam, "a", 10, 4, f"v{i}", i)
         for i in range(8) for fam in ("f", "g")],
    )
    committed: list[tuple[str, str]] = []
    staged: list[tuple[str, str]] = []
    ob = Observer(
        pre_commit_store_file=lambda fam, p: staged.append((fam, p)),
        post_commit_store_file=lambda fam, p: committed.append((fam, p)),
    )
    path = str(tmp_path / "hooked")
    observed_bulk_load(cells, path, [ob], num_regions=2)
    assert staged and len(staged) == len(committed)
    # pre saw staging paths, post saw final-layout paths
    assert all("__bulkload_staging" in p for _, p in staged)
    assert all(p.startswith(path) and p.endswith(".parquet")
               for _, p in committed)
    assert {f for f, _ in committed} == {"f", "g"}  # per-family stores
    assert not os.path.exists(path + ".__bulkload_staging")
    plain = str(tmp_path / "plain")
    observed_bulk_load(cells, plain, [], num_regions=2)
    got = sorted(map(tuple, read_table(spark, path).collect()))
    exp = sorted(map(tuple, read_table(spark, plain).collect()))
    assert got == exp
