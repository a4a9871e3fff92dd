"""Shell-flavored convenience surface (hbase-shell parity,
hbase-shell/src/main/ruby/shell/commands/ — scan/get/put/delete/count
with HBase shell keyword arguments re-expressed as Python kwargs).

The JRuby shell's ``scan 't', STARTROW => 'a', FILTER => "..."``
becomes ``shell_scan(table, STARTROW='a', FILTER="...")``.  Filters
are ParseFilter strings (the same language the shell accepts);
COLUMNS use the shell's 'family:qualifier' form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbase_spark.operators.scan import Scan
from hbase_spark.table import Table


def _columns(cols: list[str] | None):
    """'fam:qual' shell column specs -> (families, qualifiers)."""
    if not cols:
        return None, None
    fams, quals = set(), set()
    for c in cols:
        if ":" in c:
            f, q = c.split(":", 1)
            fams.add(f)
            quals.add(q)
        else:
            fams.add(c)
    return sorted(fams) or None, (sorted(quals) or None)


def _prefix_stop_row(prefix):
    """Smallest key sorting after every key with ``prefix`` — the
    reference's ClientUtil.calculateTheClosestNextRowKeyForPrefix:
    increment the rightmost non-max unit, truncate the rest; all-max
    prefixes scan to the end of the table (None)."""
    if isinstance(prefix, (bytes, bytearray)):
        b = bytearray(prefix)
        while b and b[-1] == 0xFF:
            b.pop()
        if not b:
            return None
        b[-1] += 1
        return bytes(b)
    s = str(prefix)
    while s and ord(s[-1]) >= 0x10FFFF:
        s = s[:-1]
    if not s:
        return None
    return s[:-1] + chr(ord(s[-1]) + 1)


def shell_scan(
    table: Table,
    *,
    STARTROW=None,
    STOPROW=None,
    COLUMNS: list[str] | None = None,
    FILTER: str | None = None,
    LIMIT: int | None = None,
    REVERSED: bool = False,
    VERSIONS: int = 1,
    TIMERANGE: tuple | None = None,
    RAW: bool = False,
    ROWPREFIXFILTER: str | None = None,
) -> DataFrame:
    """hbase-shell `scan` (shell/commands/scan.rb argument surface).
    ROWPREFIXFILTER is the shell's prefix shorthand — mutually
    exclusive with STARTROW/STOPROW, exactly like the shell enforces
    (table.rb _hash_to_scan).  Translated to computed start/stop rows
    (ClientUtil.calculateTheClosestNextRowKeyForPrefix), matching the
    reference shell — NOT spliced into the filter string, so prefixes
    containing quotes or parser metacharacters are safe, and the range
    prunes at the source instead of filtering post-scan."""
    if ROWPREFIXFILTER is not None:
        if STARTROW is not None or STOPROW is not None:
            raise ValueError(
                "ROWPREFIXFILTER cannot be combined with STARTROW/STOPROW"
            )
        STARTROW = ROWPREFIXFILTER
        STOPROW = _prefix_stop_row(ROWPREFIXFILTER)
    families, qualifiers = _columns(COLUMNS)
    return table.scan(
        Scan(
            start_row=STARTROW,
            stop_row=STOPROW,
            families=families,
            qualifiers=qualifiers,
            filter=FILTER,
            limit=LIMIT,
            reversed=REVERSED,
            versions=VERSIONS,
            time_range=TIMERANGE,
            raw=RAW,
        )
    )


def shell_get(
    table: Table,
    row,
    *,
    COLUMNS: list[str] | None = None,
    VERSIONS: int = 1,
    TIMERANGE: tuple | None = None,
    FILTER: str | None = None,
) -> DataFrame:
    """hbase-shell `get` (shell/commands/get.rb): COLUMN/VERSIONS/
    TIMERANGE/FILTER keyword surface — a Get IS a one-row Scan, so the
    options pass straight through."""
    out = table.get(
        row, versions=VERSIONS, time_range=TIMERANGE, filter=FILTER
    )
    families, qualifiers = _columns(COLUMNS)
    if families:
        out = out.filter(out.family.isin(families))
    if qualifiers:
        out = out.filter(out.qualifier.isin(qualifiers))
    return out


def shell_put(table: Table, row, column: str, value, *, ts: int, seq: int) -> Table:
    fam, qual = column.split(":", 1)
    return table.put([(row, fam, qual, value)], ts=ts, seq=seq)


def shell_delete(table: Table, row, column: str, *, ts: int, seq: int) -> Table:
    fam, qual = column.split(":", 1)
    return table.delete([(row, fam, qual)], ts=ts, seq=seq)


def shell_count(table: Table, *, FILTER: str | None = None) -> int:
    """shell `count` (hbase-shell table.rb:321 uses FirstKeyOnly+KeyOnly;
    here: distinct visible row keys, optionally under a ParseFilter
    string — `count 't', FILTER => "..."`)."""
    if FILTER is None:
        return table.count()
    return (
        table.scan(Scan(filter=FILTER)).select("row").distinct().count()
    )


def shell_incr(table: Table, row, column: str, value: int = 1, *, ts: int, seq: int) -> Table:
    """shell `incr` (shell/commands/incr.rb)."""
    fam, qual = column.split(":", 1)
    return table.increment([(row, fam, qual, value)], ts=ts, seq=seq)


def shell_get_counter(table: Table, row, column: str) -> int | None:
    """shell `get_counter` (shell/commands/get_counter.rb) — the
    current value of an increment-maintained column."""
    fam, qual = column.split(":", 1)
    hit = (
        table.get(row)
        .filter((F.col("family") == fam) & (F.col("qualifier") == qual))
        .select("value")
        .collect()
    )
    return int(hit[0].value) if hit else None


def shell_append(table: Table, row, column: str, value: str, *, ts: int, seq: int) -> Table:
    """shell `append` (shell/commands/append.rb)."""
    fam, qual = column.split(":", 1)
    return table.append([(row, fam, qual, value)], ts=ts, seq=seq)


def shell_deleteall(table: Table, row, *, ts: int, seq: int) -> Table:
    """shell `deleteall` (shell/commands/deleteall.rb): the whole row —
    one DELETE_FAMILY marker per family the row has (or per declared
    family when the table has descriptors)."""
    from hbase_spark.model import CellType

    if table.families:
        fams = sorted(table.families)
    else:
        fams = [
            r.family
            for r in table.cells.filter(F.col("row") == row)
            .select("family")
            .distinct()
            .collect()
        ]
    return table.delete(
        [(row, f, None) for f in fams], ts=ts, seq=seq, kind=CellType.DELETE_FAMILY
    )


# -- admin-backed shell commands (shell/commands/{alter,describe,list,
# truncate,exists}.rb) -------------------------------------------------


def shell_alter(admin, name: str, spec: dict) -> None:
    """shell `alter 't', NAME => 'f', VERSIONS => 3, TTL => ...` —
    spec keys: NAME (family, required), VERSIONS, MIN_VERSIONS, TTL
    (seconds, like the shell), NEW_VERSION_BEHAVIOR, KEEP_DELETED_CELLS,
    METHOD ('delete' to drop the family)."""
    from hbase_spark.table import FamilyDescriptor

    fam = spec["NAME"]
    if spec.get("METHOD") == "delete":
        admin.alter(name, fam, method="delete")
        return
    ttl_s = spec.get("TTL")
    admin.alter(
        name,
        fam,
        FamilyDescriptor(
            max_versions=spec.get("VERSIONS", 1),
            min_versions=spec.get("MIN_VERSIONS", 0),
            ttl_ms=ttl_s * 1000 if ttl_s is not None else None,
            new_version_behavior=spec.get("NEW_VERSION_BEHAVIOR", False),
            keep_deleted_cells=spec.get("KEEP_DELETED_CELLS", False),
        ),
    )


def shell_describe(admin, name: str) -> dict:
    """shell `describe` — family schema in shell keyword form."""
    desc = admin.describe(name)
    return {
        "ENABLED": desc["enabled"],
        "FAMILIES": {
            f: {
                "VERSIONS": k["max_versions"],
                "MIN_VERSIONS": k["min_versions"],
                "TTL": (k["ttl_ms"] // 1000) if k["ttl_ms"] else None,
                "NEW_VERSION_BEHAVIOR": k["new_version_behavior"],
                "KEEP_DELETED_CELLS": k["keep_deleted_cells"],
            }
            for f, k in desc["families"].items()
        },
    }


def shell_list(admin) -> list[str]:
    """shell `list`."""
    return admin.list_tables()


def shell_truncate(admin, name: str) -> None:
    """shell `truncate`."""
    admin.truncate_table(name)


def shell_exists(admin, name: str) -> bool:
    """shell `exists`."""
    return admin.table_exists(name)


# -- snapshot + namespace shell commands (shell/commands/{snapshot,
# clone_snapshot,restore_snapshot,delete_snapshot,list_snapshots,
# create_namespace,describe_namespace,list_namespace,
# drop_namespace}.rb) --------------------------------------------------


def shell_snapshot(admin, table_name: str, snapshot_name: str) -> None:
    """shell `snapshot 't', 'snap'`."""
    admin.snapshot(snapshot_name, table_name)


def shell_clone_snapshot(admin, snapshot_name: str, table_name: str) -> None:
    """shell `clone_snapshot 'snap', 't2'`."""
    admin.clone_snapshot(snapshot_name, table_name)


def shell_restore_snapshot(admin, snapshot_name: str) -> None:
    """shell `restore_snapshot 'snap'` (table must be disabled)."""
    admin.restore_snapshot(snapshot_name)


def shell_delete_snapshot(admin, snapshot_name: str) -> None:
    """shell `delete_snapshot 'snap'`."""
    admin.delete_snapshot(snapshot_name)


def shell_list_snapshots(admin) -> list[str]:
    """shell `list_snapshots`."""
    return admin.list_snapshots()


def shell_create_namespace(admin, ns: str) -> None:
    """shell `create_namespace 'ns'`."""
    admin.create_namespace(ns)


def shell_describe_namespace(admin, ns: str) -> dict:
    """shell `describe_namespace 'ns'`."""
    return admin.describe_namespace(ns)


def shell_list_namespace(admin) -> list[str]:
    """shell `list_namespace`."""
    return admin.list_namespaces()


def shell_drop_namespace(admin, ns: str) -> None:
    """shell `drop_namespace 'ns'` (must be empty)."""
    admin.drop_namespace(ns)


# -- table state / schema / region commands (shell/commands/{enable,
# disable,is_enabled,is_disabled,list_enabled_tables,list_disabled_tables,
# clone_table_schema,major_compact,list_regions,get_splits,
# locate_region}.rb) ----------------------------------------------------


def shell_enable(admin, name: str) -> None:
    """shell `enable 't'`."""
    admin.enable_table(name)


def shell_disable(admin, name: str) -> None:
    """shell `disable 't'`."""
    admin.disable_table(name)


def shell_is_enabled(admin, name: str) -> bool:
    """shell `is_enabled 't'`."""
    return admin.is_table_enabled(name)


def shell_is_disabled(admin, name: str) -> bool:
    """shell `is_disabled 't'`."""
    return admin.is_table_disabled(name)


def shell_list_enabled_tables(admin) -> list[str]:
    """shell `list_enabled_tables`."""
    return admin.list_enabled_tables()


def shell_list_disabled_tables(admin) -> list[str]:
    """shell `list_disabled_tables`."""
    return admin.list_disabled_tables()


def shell_clone_table_schema(admin, src: str, dst: str) -> None:
    """shell `clone_table_schema 'src', 'dst'` (schema only, no data)."""
    admin.clone_table_schema(src, dst)


def shell_major_compact(admin, name: str, *, now: int | None = None) -> None:
    """shell `major_compact 't'`."""
    admin.major_compact(name, now=now)


def shell_list_regions(admin, name: str) -> DataFrame:
    """shell `list_regions 't'`."""
    return admin.list_regions(name)


def shell_get_splits(admin, name: str) -> list[str]:
    """shell `get_splits 't'`."""
    return admin.get_splits(name)


def shell_locate_region(admin, name: str, row) -> dict:
    """shell `locate_region 't', 'row'`."""
    return admin.locate_region(name, row)


def shell_split(admin, name: str, split_point) -> None:
    """shell `split 't', 'splitkey'` (shell/commands/split.rb)."""
    admin.split_region(name, split_point)


def shell_merge_region(admin, name: str, row_a, row_b) -> None:
    """shell `merge_region` — regions addressed by a row they contain
    (the encoded-region-name analog)."""
    admin.merge_region(name, row_a, row_b)


# -- visibility label commands (shell/commands/{add_labels,list_labels,
# set_auths,get_auths,clear_auths}.rb) ----------------------------------


def shell_add_labels(admin, labels: list[str]) -> None:
    """shell `add_labels ['A', 'B']`."""
    admin.add_labels(labels)


def shell_list_labels(admin) -> list[str]:
    """shell `list_labels`."""
    return admin.list_labels()


def shell_set_auths(admin, user: str, labels: list[str]) -> None:
    """shell `set_auths 'user', ['A']`."""
    admin.set_auths(user, labels)


def shell_get_auths(admin, user: str) -> list[str]:
    """shell `get_auths 'user'`."""
    return admin.get_auths(user)


def shell_clear_auths(admin, user: str, labels: list[str] | None = None) -> None:
    """shell `clear_auths 'user'`."""
    admin.clear_auths(user, labels)


def shell_list_namespace_tables(admin, ns: str) -> list[str]:
    """shell `list_namespace_tables 'ns'`."""
    return admin.list_namespace_tables(ns)


def shell_delete_table_snapshots(admin, table: str) -> list[str]:
    """shell `delete_table_snapshots 't'`."""
    return admin.delete_table_snapshots(table)


def shell_delete_all_snapshot(admin, regex: str) -> list[str]:
    """shell `delete_all_snapshot 'regex'`."""
    return admin.delete_all_snapshot(regex)


def shell_export_snapshot(admin, snapshot_name: str, dest_admin) -> None:
    """shell/tool `ExportSnapshot 'snap', <dest catalog>`."""
    admin.export_snapshot(snapshot_name, dest_admin)


def shell_grant(admin, user: str, perms: str, table: str | None = None) -> None:
    """shell `grant 'user', 'RW'[, 't']`."""
    admin.grant(user, perms, table)


def shell_revoke(admin, user: str, table: str | None = None) -> None:
    """shell `revoke 'user'[, 't']`."""
    admin.revoke(user, table)


def shell_user_permission(admin, table: str | None = None) -> dict:
    """shell `user_permission ['t']`."""
    return admin.user_permission(table)


def shell_set_quota(admin, **kw) -> None:
    """shell `set_quota` (shell/commands/set_quota.rb; quota args in
    hbase-shell/src/main/ruby/hbase/quotas.rb).

    ``TYPE='SPACE'``: TABLE=/NAMESPACE=, LIMIT= (bytes, or the string
    'NONE' to remove), POLICY= one of SpaceViolationPolicy.
    ``TYPE='THROTTLE'``: USER=/TABLE=, THROTTLE_TYPE=, LIMIT= (per
    INTERVAL_MS, default 1000), or LIMIT='NONE' to remove."""
    qtype = kw.pop("TYPE", "THROTTLE")
    limit = kw.pop("LIMIT", None)
    remove = limit == "NONE"
    if qtype == "SPACE":
        admin.set_space_quota(
            table=kw.pop("TABLE", None),
            namespace=kw.pop("NAMESPACE", None),
            limit=None if remove else limit,
            policy=kw.pop("POLICY", "NO_WRITES"),
            remove=remove,
        )
    elif qtype == "THROTTLE":
        admin.set_throttle_quota(
            user=kw.pop("USER", None),
            table=kw.pop("TABLE", None),
            throttle_type=kw.pop("THROTTLE_TYPE", "REQUEST_NUMBER"),
            limit=None if remove else limit,
            interval_ms=kw.pop("INTERVAL_MS", 1000),
            refill=kw.pop("REFILL", "fixed"),
            remove=remove,
        )
    else:
        raise ValueError(f"unknown quota TYPE {qtype!r}")
    if kw:
        raise ValueError(f"unknown set_quota args {sorted(kw)}")


def shell_list_quotas(admin) -> dict:
    """shell `list_quotas`."""
    return admin.list_quotas()


def shell_list_quota_snapshots(admin) -> dict:
    """shell `list_quota_snapshots` — per-table usage/limit/violation
    (QuotaObserverChore view)."""
    return {
        name: admin.get_space_quota_snapshot(name)
        for name in admin.list_tables()
        if admin._space_quota_for(name) is not None
    }


def shell_status(admin, fmt: str = "summary") -> dict:
    """shell `status` (shell/commands/status.rb).

    There is one "server" — the Spark application.  'summary' gives
    the rolled-up counts; 'detailed' adds the per-table region list;
    'replication' reports the peer map."""
    tables = admin.list_tables()
    regions = 0
    per_table: dict[str, int] = {}
    for t in tables:
        try:
            n = len(admin._cached_region_inventory(t))
        except Exception:  # noqa: BLE001 — table with no layout yet
            n = 0
        per_table[t] = n
        regions += n
    out = {
        "servers": 1,
        "dead_servers": 0,
        "tables": len(tables),
        "regions": regions,
        "snapshots": len(admin.list_snapshots()),
    }
    if fmt == "detailed":
        out["per_table_regions"] = per_table
    elif fmt == "replication":
        out["peers"] = admin.list_peers()
    return out


def shell_processlist(admin) -> list[dict]:
    """shell `processlist` — active work in the engine: running Spark
    job groups (statusTracker) plus active streaming queries."""
    sc = admin.spark.sparkContext
    tracker = sc.statusTracker()
    procs = [
        {"kind": "job", "id": jid,
         "status": (info.status if (info := tracker.getJobInfo(jid)) else
                    "UNKNOWN")}
        for jid in tracker.getActiveJobsIds()
    ]
    procs += [
        {"kind": "stream", "id": q.id, "status": "ACTIVE",
         "name": q.name}
        for q in admin.spark.streams.active
    ]
    return procs


def shell_version(admin) -> str:
    """shell `version` — engine + Spark version string."""
    return f"hbase_spark on Spark {admin.spark.version}"


def shell_whoami(admin, user: str = "default") -> dict:
    """shell `whoami` — the acting user with its auths and grants."""
    return {
        "user": user,
        "auths": admin.get_auths(user),
        "permissions": admin.user_permission().get(user, ""),
    }


def shell_create(admin, name: str, *families, SPLITS=None, **fam_kw) -> None:
    """shell `create 't', 'f1', {NAME=>'f2', VERSIONS=>3},
    SPLITS => ['b','m']` (shell/commands/create.rb).

    Positional families are names or {NAME=>..., VERSIONS=>...,
    TTL=>ms, MIN_VERSIONS=>..., KEEP_DELETED_CELLS=>...,
    NEW_VERSION_BEHAVIOR=>..., MOB_THRESHOLD=>...} dicts."""
    from hbase_spark.table import FamilyDescriptor

    fams = {}
    for f in families:
        if isinstance(f, str):
            fams[f] = FamilyDescriptor()
            continue
        spec = dict(f)
        fname = spec.pop("NAME")
        fams[fname] = FamilyDescriptor(
            max_versions=spec.pop("VERSIONS", 1),
            min_versions=spec.pop("MIN_VERSIONS", 0),
            ttl_ms=spec.pop("TTL", None),
            new_version_behavior=spec.pop("NEW_VERSION_BEHAVIOR", False),
            keep_deleted_cells=spec.pop("KEEP_DELETED_CELLS", False),
            mob_threshold=spec.pop("MOB_THRESHOLD", None),
        )
        if spec:
            raise ValueError(f"unknown family attributes {sorted(spec)}")
    if fam_kw:
        raise ValueError(f"unknown create args {sorted(fam_kw)}")
    admin.create_table(name, fams, splits=SPLITS)


def shell_truncate_preserve(admin, name: str) -> None:
    """shell `truncate_preserve` (truncate_preserve.rb): drop all data
    but keep the region boundaries.  Declared split points live in the
    descriptor, which truncate keeps — so the next flush re-creates
    the same region dirs."""
    if not admin._read_desc(name).get("split_points"):
        raise ValueError(
            f"table {name!r} has no declared split points to preserve "
            "(use truncate)"
        )
    admin.truncate_table(name)


def shell_flush(admin, name: str, table=None) -> None:
    """shell `flush 't'` — persist the table's current state (pass the
    mutated Table; without one this is a no-op rewrite of the current
    snapshot, the memstore-flush analog)."""
    admin.flush(name, table if table is not None else admin.table(name))


def shell_get_table(admin, name: str):
    """shell `get_table 't'` (get_table.rb) — the Table facade."""
    return admin.table(name)


def shell_top(admin, n: int = 10) -> list[dict]:
    """hbtop region-mode analog (hbase-hbtop): the n hottest regions
    by cell count across all enabled tables, with key ranges — the
    skew-spotting view (a hot region here is a salting/split
    candidate)."""
    rows = []
    for name in admin.list_tables():
        try:
            if not admin.is_table_enabled(name):
                continue
            region_rows = admin.list_regions(name).collect()
        except Exception:  # noqa: BLE001 — empty layout etc.
            continue
        for r in region_rows:
            rows.append(
                {"table": name, "start_key": r.start_key,
                 "end_key": r.end_key, "cells": r.cell_count}
            )
    return sorted(rows, key=lambda x: -x["cells"])[:n]


# -- normalizer / master switches (shell/commands/normalize.rb,
# normalizer_switch.rb, normalizer_enabled.rb, splitormerge_switch.rb,
# splitormerge_enabled.rb, balance_switch.rb, balancer_enabled.rb) ----


def shell_normalize(admin, name: str, **plan_kw) -> list[dict]:
    """shell `normalize` — run the region normalizer on one table."""
    return admin.normalize(name, **plan_kw)


def shell_normalizer_switch(admin, enabled: bool) -> bool:
    """shell `normalizer_switch true|false` — returns previous state."""
    return admin.set_switch("normalizer", enabled)


def shell_normalizer_enabled(admin) -> bool:
    return admin.is_switch_enabled("normalizer")


def shell_splitormerge_switch(admin, kind: str, enabled: bool) -> bool:
    """shell `splitormerge_switch 'SPLIT'|'MERGE', true|false`."""
    return admin.set_switch(kind.lower(), enabled)


def shell_splitormerge_enabled(admin, kind: str) -> bool:
    return admin.is_switch_enabled(kind.lower())


def shell_balance_switch(admin, enabled: bool) -> bool:
    """shell `balance_switch true|false` — returns previous state."""
    return admin.set_switch("balancer", enabled)


def shell_balancer_enabled(admin) -> bool:
    return admin.is_switch_enabled("balancer")


# -- rsgroups (hbase-shell rsgroup commands: add_rsgroup.rb,
# remove_rsgroup.rb, list_rsgroups.rb, get_rsgroup.rb,
# move_servers_rsgroup.rb, move_tables_rsgroup.rb,
# balance_rsgroup.rb, get_table_rsgroup.rb, get_server_rsgroup.rb,
# remove_servers_rsgroup.rb) ------------------------------------------


def shell_add_rsgroup(admin, group: str) -> None:
    admin.add_rsgroup(group)


def shell_remove_rsgroup(admin, group: str) -> None:
    admin.remove_rsgroup(group)


def shell_list_rsgroups(admin) -> dict:
    return admin.list_rsgroups()


def shell_get_rsgroup(admin, group: str) -> dict:
    return admin.get_rsgroup(group)


def shell_get_table_rsgroup(admin, name: str) -> str:
    return admin.get_rsgroup_of_table(name)


def shell_get_server_rsgroup(admin, server: str) -> str | None:
    return admin.get_rsgroup_of_server(server)


def shell_move_servers_rsgroup(admin, servers: list[str], group: str) -> None:
    admin.move_servers_rsgroup(servers, group)


def shell_move_tables_rsgroup(admin, tables: list[str], group: str) -> None:
    admin.move_tables_rsgroup(tables, group)


def shell_remove_servers_rsgroup(admin, servers: list[str]) -> None:
    admin.remove_servers_rsgroup(servers)


def shell_balance_rsgroup(admin, group: str, **kw) -> dict[str, int]:
    return admin.balance_rsgroup(group, **kw)


def shell_compact(admin, name: str, **kw) -> None:
    """shell `compact 't'` (compact.rb) — minor compaction."""
    admin.compact(name, **kw)


def shell_compaction_state(admin, name: str) -> dict:
    """shell `compaction_state 't'` (compaction_state.rb)."""
    return admin.compaction_state(name)


def shell_cleaner_chore_run(admin, **kw) -> dict:
    """shell `cleaner_chore_run` (cleaner_chore_run.rb) — gated on the
    cleaner_chore switch (cleaner_chore_switch.rb) — archive
    cleanup of unreferenced layout version dirs."""
    if not admin.is_switch_enabled("cleaner_chore"):
        raise RuntimeError("master switch 'cleaner_chore' is disabled")
    return admin.cleaner_chore(**kw)


def shell_snapshot_cleanup_switch(admin, enabled: bool) -> bool:
    """shell `snapshot_cleanup_switch true|false` — previous state."""
    return admin.set_switch("snapshot_cleanup", enabled)


def shell_snapshot_cleanup_enabled(admin) -> bool:
    return admin.is_switch_enabled("snapshot_cleanup")


# -- balancer / procedures / locks / wal / zk (balancer.rb,
# list_procedures.rb, list_locks.rb, wal_roll.rb, zk_dump.rb) ----------


def shell_balancer(admin, name: str | None = None, **kw) -> bool:
    """shell `balance` (balancer.rb): run the balancer now; returns
    True if it ran (i.e. the switch is on), like the reference shell.
    Keyword args pass through to Admin.balance (slop, dry_run)."""
    admin.balance(name, **kw)
    return True


def shell_balancer_report(admin, name: str | None = None) -> list[dict]:
    """Layout-skew report backing `balance` — region mass histogram +
    imbalance cost per table (the StochasticLoadBalancer cost view)."""
    return admin.balancer_report(name)


def shell_list_procedures(admin) -> list[dict]:
    """shell `list_procedures` (list_procedures.rb)."""
    return admin.list_procedures()


def shell_list_locks(admin) -> list[dict]:
    """shell `list_locks` (list_locks.rb)."""
    return admin.list_locks()


def shell_wal_roll(admin, log_dir: str) -> dict:
    """shell `wal_roll 'server'` (wal_roll.rb) — here the roll target
    is a mutation-log directory."""
    return admin.wal_roll(log_dir)


def shell_zk_dump(admin) -> dict:
    """shell `zk_dump` (zk_dump.rb) — coordination-state dump."""
    return admin.zk_dump()


def shell_hbck_chore_run(admin, **kw) -> dict:
    """shell `hbck_chore_run` (hbck_chore_run.rb / Admin.runHbckChore):
    run the master's HbckChore consistency scan and return the report
    (region overlaps, meta/fs family agreement, orphan version dirs,
    broken snapshots, stuck procedures) — report-only, like the
    reference chore."""
    return admin.hbck(**kw)


# -- round-5 data-touching scraps (show_filters.rb, get_counter.rb,
# list_replicated_tables.rb, list_snapshot_sizes.rb,
# list_quota_table_sizes.rb, compaction_switch.rb, catalogjanitor_*.rb,
# get_balancer_decisions.rb, get_balancer_rejections.rb, peer cmds) ----

# ParseFilter registry names (filter/ParseFilter.java:52-100) — the
# filters the string DSL can construct (show_filters prints this list)
SUPPORTED_FILTERS = [
    "ColumnCountGetFilter", "ColumnPaginationFilter", "ColumnPrefixFilter",
    "ColumnRangeFilter", "ColumnValueFilter", "DependentColumnFilter",
    "FamilyFilter", "FilterList", "FirstKeyOnlyFilter", "FuzzyRowFilter",
    "InclusiveStopFilter", "KeyOnlyFilter", "MultiRowRangeFilter",
    "MultipleColumnPrefixFilter", "PageFilter", "PrefixFilter",
    "QualifierFilter", "RandomRowFilter", "RowFilter",
    "SingleColumnValueExcludeFilter", "SingleColumnValueFilter",
    "SkipFilter", "TimestampsFilter", "ValueFilter", "WhileMatchFilter",
]


def shell_show_filters(admin=None) -> list[str]:
    """shell `show_filters` — the ParseFilter-constructible filters."""
    return list(SUPPORTED_FILTERS)


def shell_list_replicated_tables(admin) -> list[str]:
    return admin.list_replicated_tables()


def shell_list_snapshot_sizes(admin) -> dict:
    return admin.list_snapshot_sizes()


def shell_list_quota_table_sizes(admin) -> dict:
    return admin.list_quota_table_sizes()


def shell_compaction_switch(admin, enabled: bool) -> bool:
    """shell `compaction_switch true|false` — previous state."""
    return admin.set_switch("compaction", enabled)


def shell_catalogjanitor_switch(admin, enabled: bool) -> bool:
    """shell `catalogjanitor_switch` — gates the janitor run (the
    version-dir GC role the catalog janitor plays after split/merge)."""
    return admin.set_switch("catalogjanitor", enabled)


def shell_catalogjanitor_enabled(admin) -> bool:
    return admin.is_switch_enabled("catalogjanitor")


def shell_catalogjanitor_run(admin, **kw) -> dict:
    """shell `catalogjanitor_run`: GC the version dirs split/merge/
    flush left behind (CatalogJanitor.java's cleanParent role maps to
    the same immutable-dir reclaim as the cleaner chore)."""
    if not admin.is_switch_enabled("catalogjanitor"):
        raise RuntimeError("master switch 'catalogjanitor' is disabled")
    return admin.cleaner_chore(**kw)


def shell_get_balancer_decisions(admin) -> list[dict]:
    return admin.get_balancer_decisions()


def shell_get_balancer_rejections(admin) -> list[dict]:
    return admin.get_balancer_rejections()


def shell_append_peer_table_cfs(admin, peer_id: str, table_cfs: dict) -> None:
    admin.append_peer_table_cfs(peer_id, table_cfs)


def shell_remove_peer_table_cfs(admin, peer_id: str, table_cfs: dict) -> None:
    admin.remove_peer_table_cfs(peer_id, table_cfs)


def shell_show_peer_table_cfs(admin, peer_id: str):
    """shell `show_peer_tableCFs`."""
    return admin.get_peer_config(peer_id).get("table_cfs")


def shell_transit_peer_sync_replication_state(
    admin, peer_id: str, state: str
) -> None:
    """shell `transit_peer_sync_replication_state`
    (transit_peer_sync_replication_state.rb) — round 9: previously a
    needs-a-second-cluster scope-out; two catalogs now model the two
    clusters (see Admin.transit_peer_sync_replication_state)."""
    admin.transit_peer_sync_replication_state(peer_id, state)


def shell_set_peer_bandwidth(admin, peer_id: str, bandwidth: int) -> None:
    admin.set_peer_bandwidth(peer_id, bandwidth)


def shell_set_peer_serial(admin, peer_id: str, serial: bool) -> None:
    admin.set_peer_serial(peer_id, serial)


def shell_list_peer_configs(admin) -> dict:
    return admin.list_peer_configs()


def shell_peer_modification_switch(admin, enabled: bool) -> bool:
    """shell `peer_modification_switch` — previous state."""
    return admin.set_switch("peer_modification", enabled)


def shell_peer_modification_enabled(admin) -> bool:
    return admin.is_switch_enabled("peer_modification")


def shell_truncate_region(admin, name: str, row) -> None:
    """shell `truncate_region 't', 'row'` (truncate_region.rb)."""
    admin.truncate_region(name, row)


# -- round-8 breadth: peer replication scope, rsgroup refinements,
# batch table ops, throttle switches, misc introspection (closing the
# shell-coverage partial; each maps 1:1 to a <command>.rb) ---------------


def shell_set_peer_replicate_all(admin, peer_id: str, flag: bool) -> None:
    """shell `set_peer_replicate_all` (set_peer_replicate_all.rb)."""
    admin.set_peer_replicate_all(peer_id, flag)


def shell_set_peer_namespaces(admin, peer_id: str, namespaces) -> None:
    """shell `set_peer_namespaces` (set_peer_namespaces.rb)."""
    admin.set_peer_namespaces(peer_id, namespaces)


def shell_append_peer_namespaces(admin, peer_id: str, namespaces) -> None:
    """shell `append_peer_namespaces`."""
    admin.append_peer_namespaces(peer_id, namespaces)


def shell_remove_peer_namespaces(admin, peer_id: str, namespaces) -> None:
    """shell `remove_peer_namespaces`."""
    admin.remove_peer_namespaces(peer_id, namespaces)


def shell_set_peer_exclude_namespaces(admin, peer_id: str, namespaces) -> None:
    """shell `set_peer_exclude_namespaces`."""
    admin.set_peer_exclude_namespaces(peer_id, namespaces)


def shell_append_peer_exclude_namespaces(admin, peer_id, namespaces) -> None:
    """shell `append_peer_exclude_namespaces`."""
    admin.append_peer_exclude_namespaces(peer_id, namespaces)


def shell_remove_peer_exclude_namespaces(admin, peer_id, namespaces) -> None:
    """shell `remove_peer_exclude_namespaces`."""
    admin.remove_peer_exclude_namespaces(peer_id, namespaces)


def shell_set_peer_exclude_table_cfs(admin, peer_id: str, table_cfs) -> None:
    """shell `set_peer_exclude_tableCFs`."""
    admin.set_peer_exclude_table_cfs(peer_id, table_cfs)


def shell_append_peer_exclude_table_cfs(admin, peer_id, table_cfs) -> None:
    """shell `append_peer_exclude_tableCFs`."""
    admin.append_peer_exclude_table_cfs(peer_id, table_cfs)


def shell_remove_peer_exclude_table_cfs(admin, peer_id, table_cfs) -> None:
    """shell `remove_peer_exclude_tableCFs`."""
    admin.remove_peer_exclude_table_cfs(peer_id, table_cfs)


def shell_update_peer_config(admin, peer_id: str, **fields) -> dict:
    """shell `update_peer_config` (update_peer_config.rb)."""
    return admin.update_peer_config(peer_id, **fields)


def shell_rename_rsgroup(admin, old: str, new: str) -> None:
    """shell `rename_rsgroup` (rename_rsgroup.rb)."""
    admin.rename_rsgroup(old, new)


def shell_move_namespaces_rsgroup(admin, namespaces, target: str) -> None:
    """shell `move_namespaces_rsgroup`."""
    admin.move_namespaces_rsgroup(namespaces, target)


def shell_get_namespace_rsgroup(admin, ns: str) -> str:
    """shell `get_namespace_rsgroup`."""
    return admin.get_namespace_rsgroup(ns)


def shell_move_servers_tables_rsgroup(admin, servers, tables, target) -> None:
    """shell `move_servers_tables_rsgroup`."""
    admin.move_servers_tables_rsgroup(servers, tables, target)


def shell_move_servers_namespaces_rsgroup(
    admin, servers, namespaces, target
) -> None:
    """shell `move_servers_namespaces_rsgroup`."""
    admin.move_servers_namespaces_rsgroup(servers, namespaces, target)


def shell_alter_rsgroup_config(admin, group: str, props: dict) -> dict:
    """shell `alter_rsgroup_config` / `update_rsgroup_config`."""
    return admin.update_rsgroup_config(group, props)


shell_update_rsgroup_config = shell_alter_rsgroup_config


def shell_show_rsgroup_config(admin, group: str) -> dict:
    """shell `show_rsgroup_config`."""
    return admin.show_rsgroup_config(group)


def shell_alter_namespace(admin, ns: str, props: dict) -> dict:
    """shell `alter_namespace` (alter_namespace.rb)."""
    return admin.alter_namespace(ns, props)


def shell_enable_all(admin, regex: str) -> list[str]:
    """shell `enable_all 'regex'` (enable_all.rb)."""
    return admin.enable_all(regex)


def shell_disable_all(admin, regex: str) -> list[str]:
    """shell `disable_all 'regex'` (disable_all.rb)."""
    return admin.disable_all(regex)


def shell_drop(admin, name: str) -> None:
    """shell `drop 't'` (drop.rb) — delete a DISABLED table."""
    if admin.is_table_enabled(name):
        raise ValueError(f"table {name!r} must be disabled before drop")
    admin.delete_table(name)


def shell_drop_all(admin, regex: str) -> list[str]:
    """shell `drop_all 'regex'` (drop_all.rb)."""
    return admin.drop_all(regex)


def shell_list_table_snapshots(admin, table: str, regex: str = ".*"):
    """shell `list_table_snapshots` (list_table_snapshots.rb)."""
    return admin.list_table_snapshots(table, regex)


def shell_list_security_capabilities(admin) -> list[str]:
    """shell `list_security_capabilities`."""
    return admin.list_security_capabilities()


def shell_regioninfo(admin, name: str, row) -> dict:
    """shell `regioninfo` (regioninfo.rb)."""
    return admin.regioninfo(name, row)


def shell_wal_roll_all(admin, log_dirs: list[str]) -> dict:
    """shell `wal_roll_all` (wal_roll_all.rb)."""
    return admin.wal_roll_all(log_dirs)


def shell_enable_rpc_throttle(admin) -> bool:
    """shell `enable_rpc_throttle` — previous state
    (Admin.switchRpcThrottle(true))."""
    return admin.set_switch("rpc_throttle", True)


def shell_disable_rpc_throttle(admin) -> bool:
    """shell `disable_rpc_throttle` — previous state.  While disabled
    every throttle_limiter lookup returns None, so quota throttles
    stop being enforced (the reference's quota-manager bypass)."""
    return admin.set_switch("rpc_throttle", False)


def shell_rpc_throttle_enabled(admin) -> bool:
    """shell `rpc_throttle_enabled`."""
    return admin.is_switch_enabled("rpc_throttle")


def shell_cleaner_chore_switch(admin, enabled: bool) -> bool:
    """shell `cleaner_chore_switch` — previous state; gates
    cleaner_chore_run like the catalogjanitor pair."""
    return admin.set_switch("cleaner_chore", enabled)


def shell_cleaner_chore_enabled(admin) -> bool:
    """shell `cleaner_chore_enabled`."""
    return admin.is_switch_enabled("cleaner_chore")


def shell_set_visibility(
    table,
    expression: str,
    *,
    family: str | None = None,
    qualifier=None,
    row_prefix: str | None = None,
    label_col: str = "labels",
):
    """shell `set_visibility 't', 'expr', {...criteria}`
    (set_visibility.rb; VisibilityController's setCellVisibility write
    path): stamp the visibility expression onto every existing cell
    matching the criteria.  Returns a Table whose cell frame carries
    the (new or updated) label column — one codegen'd conditional
    projection, no shuffle.  The expression is validated with the
    shared parser before any plan is built."""
    from pyspark.sql import functions as F

    from hbase_spark.functions.visibility import evaluate
    from hbase_spark.table import Table

    evaluate(expression, frozenset())  # syntax check (result unused)
    cells = table.cells
    match = F.lit(True)
    if family is not None:
        match = match & (F.col("family") == family)
    if qualifier is not None:
        match = match & (F.col("qualifier") == qualifier)
    if row_prefix is not None:
        match = match & F.col("row").startswith(row_prefix)
    existing = (
        F.col(label_col) if label_col in cells.columns
        else F.lit(None).cast("string")
    )
    out = cells.withColumn(
        label_col, F.when(match, F.lit(expression)).otherwise(existing)
    )
    return Table(out, table.families, table.now)


# -- server topology / assignment commands (the 34 server-lifecycle
# commands COVERAGE.md previously scoped out; hbase_spark/topology.py
# has the model: server registry + deterministic assignment map) -----------


def shell_move(admin, encoded_region: str, server: str | None = None) -> str:
    """shell `move` (move.rb) — returns the destination server."""
    return admin.move(encoded_region, server)


def shell_assign(admin, encoded_region: str):
    """shell `assign` (assign.rb)."""
    return admin.assign(encoded_region)


def shell_unassign(admin, encoded_region: str, force=None) -> None:
    """shell `unassign` (unassign.rb; the force flag is deprecated in
    the reference and ignored, same here)."""
    admin.unassign(encoded_region)


def shell_close_region(admin, encoded_region: str,
                       server: str | None = None) -> None:
    """shell `close_region` (deprecated alias of unassign)."""
    admin.close_region(encoded_region, server)


def shell_rit(admin) -> list[dict]:
    """shell `rit` (rit.rb)."""
    return admin.rit()


def shell_reopen_regions(admin, name: str) -> int:
    """reopen a table's regions (refresh the layout's cached listing)."""
    return admin.reopen_regions(name)


def shell_list_liveservers(admin) -> list[str]:
    """shell `list_liveservers`."""
    return admin.list_liveservers()


def shell_list_deadservers(admin) -> list[str]:
    """shell `list_deadservers`."""
    return admin.list_deadservers()


def shell_list_unknownservers(admin) -> list[str]:
    """shell `list_unknownservers`."""
    return admin.list_unknownservers()


def shell_list_decommissioned_regionservers(admin) -> list[str]:
    """shell `list_decommissioned_regionservers`."""
    return admin.list_decommissioned_regionservers()


def shell_decommission_regionservers(admin, servers, offload=False) -> None:
    """shell `decommission_regionservers`."""
    if isinstance(servers, str):
        servers = [servers]
    admin.decommission_regionservers(servers, offload)


def shell_recommission_regionserver(admin, server: str,
                                    encoded_regions=None) -> None:
    """shell `recommission_regionserver`."""
    admin.recommission_regionserver(server, encoded_regions)


def shell_clear_deadservers(admin, *servers) -> list[str]:
    """shell `clear_deadservers` — returns servers NOT cleared."""
    return admin.clear_deadservers(list(servers) or None)


def shell_stop_regionserver(admin, server: str) -> None:
    """shell `stop_regionserver`."""
    admin.stop_regionserver(server)


def shell_stop_master(admin) -> None:
    """shell `stop_master`."""
    admin.stop_master()


def shell_is_in_maintenance_mode(admin) -> bool:
    """shell `is_in_maintenance_mode`."""
    return admin.is_in_maintenance_mode()


def shell_get_slowlog_responses(admin, servers="*", filters=None) -> list[dict]:
    """shell `get_slowlog_responses`."""
    return admin.get_slowlog_responses(servers, filters)


def shell_get_largelog_responses(admin, servers="*", filters=None) -> list[dict]:
    """shell `get_largelog_responses`."""
    return admin.get_largelog_responses(servers, filters)


def shell_clear_slowlog_responses(admin, servers=None) -> int:
    """shell `clear_slowlog_responses`."""
    return admin.clear_slowlog_responses(servers)


def shell_trace(admin, startstop: str = "status",
                spanname: str = "HBaseShell") -> bool:
    """shell `trace` (trace.rb)."""
    return admin.trace(startstop, spanname)


def shell_clear_block_cache(admin, name: str) -> dict:
    """shell `clear_block_cache`."""
    return admin.clear_block_cache(name)


def shell_clear_compaction_queues(admin, server: str,
                                  queues=("long", "short")) -> int:
    """shell `clear_compaction_queues`."""
    return admin.clear_compaction_queues(server, queues)


def shell_compact_rs(admin, server: str, major: bool = False) -> list[str]:
    """shell `compact_rs` (compact_rs.rb)."""
    return admin.compact_regionserver(server, major)


def shell_flush_master_store(admin) -> dict:
    """shell `flush_master_store`."""
    return admin.flush_master_store()


def shell_refresh_hfiles(admin, name: str) -> int:
    """`refresh_hfiles` (RefreshHFilesEndpoint example)."""
    return admin.refresh_hfiles(name)


def shell_refresh_meta(admin) -> dict:
    """shell `refresh_meta`."""
    return admin.refresh_meta()


def shell_change_sft(admin, name: str, family_or_tracker: str,
                     tracker: str | None = None) -> None:
    """shell `change_sft` (change_sft.rb)."""
    admin.change_sft(name, family_or_tracker, tracker)


def shell_change_sft_all(admin, tracker: str, pattern: str = ".*") -> list[str]:
    """shell `change_sft_all`."""
    return admin.change_sft_all(tracker, pattern)


def shell_enable_exceed_throttle_quota(admin) -> bool:
    """shell `enable_exceed_throttle_quota` — previous value."""
    return admin.enable_exceed_throttle_quota()


def shell_disable_exceed_throttle_quota(admin) -> bool:
    """shell `disable_exceed_throttle_quota` — previous value."""
    return admin.disable_exceed_throttle_quota()


def shell_update_config(admin, server: str | None = None) -> dict:
    """shell `update_config`."""
    return admin.update_config(server)


def shell_update_all_config(admin) -> dict:
    """shell `update_all_config`."""
    return admin.update_all_config()


def shell_alter_async(admin, name: str, family: str, descriptor=None,
                      *, method: str = "modify") -> int:
    """shell `alter_async` — returns the procedure pid."""
    return admin.alter_async(name, family, descriptor, method=method)


def shell_alter_status(admin, name: str) -> dict:
    """shell `alter_status` — regions updated / total."""
    return admin.alter_status(name)


def shell_table_help() -> str:
    """shell `table_help` (table_help.rb)."""
    from hbase_spark.topology import table_help

    return table_help()
