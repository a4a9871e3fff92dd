"""Coprocessor-style observer hooks (SURVEY.md §2.11).

The reference's RegionObserver (server/coprocessor/RegionObserver.java:101,
143 hooks) intercepts gets/puts/scans/flushes server-side.  With no
server to intercept, the Spark-native shape is *pipeline transform
hooks*: pure functions applied around the Table's read and write paths.
An ``ObservedTable`` wraps a Table with an ordered observer chain —
the coprocessor load order analog.

Concrete observers mirror the reference examples
(hbase-examples/.../coprocessor/example/):

- ``ScanModifyingObserver``   — rewrites the Scan spec before execution
  (ScanModifyingObserver.java: adds a family/qualifier projection).
- ``ValueRewritingObserver``  — rewrites cell values in scan results
  (ValueRewritingObserver.java: value substitution at scan time).
- ``WriteHeavyIncrementObserver`` — converts read-modify-write
  increments into plain appended delta cells and aggregates at read
  time (WriteHeavyIncrementObserver.java:70: each increment is stored
  as its own versioned cell; scans sum all versions per column).  At
  100 TB this is the right trade: O(1) append on write, a map-side
  combinable sum on read, no per-batch join against the snapshot.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_spark.model import CellType
from hbase_spark.operators.scan import Scan
from hbase_spark.table import Table


@dataclass
class Observer:
    """Hook bundle; any subset may be provided (RegionObserver's hooks
    default to pass-through the same way).  Hook-to-reference mapping:

    - pre_scan / post_scan    — preScannerOpen / postScannerNext
    - pre_get / post_get      — preGetOp / postGetOp
    - pre_mutate / post_mutate — prePut+preDelete / postPut+postDelete
      (pre_mutate sees the mutation CellFrame and may rewrite or drop
      cells — the reference's most common interception point)
    - pre_compact             — preCompact (wrap the compaction
      scanner: rewrite/drop cells as they are rewritten)
    """

    pre_scan: Callable[[Scan], Scan] | None = None          # preScannerOpen
    post_scan: Callable[[DataFrame], DataFrame] | None = None  # postScannerNext
    pre_get: Callable[[object], object] | None = None       # preGetOp (key rewrite)
    post_get: Callable[[DataFrame], DataFrame] | None = None  # postGetOp
    pre_mutate: Callable[[DataFrame], DataFrame] | None = None  # prePut/preDelete
    post_mutate: Callable[["Table"], "Table"] | None = None  # postPut/postDelete
    pre_compact: Callable[[DataFrame], DataFrame] | None = None  # preCompact
    # RMW + guard + lifecycle interception (RegionObserver.java:
    # preIncrement :520, postIncrement :552, preAppend :475,
    # postAppend :507, preCheckAndPut :330 / preCheckAndDelete :395,
    # preFlush :180)
    pre_increment: Callable[[list], list] | None = None      # preIncrement
    post_increment: Callable[["Table"], "Table"] | None = None  # postIncrement
    pre_append: Callable[[list], list] | None = None         # preAppend
    post_append: Callable[["Table"], "Table"] | None = None  # postAppend
    pre_check_and_mutate: Callable[[DataFrame], DataFrame] | None = None
    # postCheckAndMutate (RegionObserver.java:1037) — sees (and may
    # replace) the guarded-mutation RESULT table
    post_check_and_mutate: Callable[["Table"], "Table"] | None = None
    pre_flush: Callable[[DataFrame], DataFrame] | None = None  # preFlush
    # lifecycle notifications + bulk-load interception
    # (RegionObserver.java: postFlush :163, postCompact :312,
    # preBulkLoadHFile :1438, postBulkLoadHFile :1472)
    post_flush: Callable[[DataFrame], None] | None = None    # postFlush
    post_compact: Callable[[DataFrame], None] | None = None  # postCompact
    pre_bulk_load: Callable[[DataFrame], DataFrame] | None = None
    post_bulk_load: Callable[[DataFrame], None] | None = None
    # scanner lifecycle family (RegionObserver.java: postScannerOpen
    # :1100, postScannerFilterRow :1175, preScannerClose :1190,
    # postScannerClose :1203; preScannerOpen is ``pre_scan`` above).
    # ``post_scanner_open`` wraps the freshly-opened scanner frame
    # BEFORE the per-row post_scan hooks.  ``post_scanner_filter_row``
    # is the reference's "row was filtered out" callback: it receives
    # the cells of rows the Scan filter DROPPED and returns the subset
    # to resurrect (None/empty = stay filtered) — the declarative twin
    # of returning hasMore=true from the hook.  The close hooks are
    # notifications with the final scanner frame at plan hand-off (a
    # lazy engine's scanner "closes" when the consumer materializes;
    # interception points are fixed at hand-off).
    post_scanner_open: Callable[[DataFrame], DataFrame] | None = None
    post_scanner_filter_row: Callable[[DataFrame], DataFrame] | None = None
    pre_scanner_close: Callable[[DataFrame], None] | None = None
    post_scanner_close: Callable[[DataFrame], None] | None = None
    # exists + mini-batch interception (RegionObserver.java:
    # preExists :246 — may answer and bypass the read — postExists
    # :262, preBatchMutate :716 — sees the whole mini-batch —
    # postBatchMutate :736)
    pre_exists: Callable[[object], "bool | None"] | None = None
    post_exists: Callable[[object, bool], bool] | None = None
    pre_batch_mutate: Callable[[list], list] | None = None
    post_batch_mutate: Callable[["Table"], "Table"] | None = None
    # compaction FILE selection — store-scoped, like the reference's
    # (RegionObserver.java: preCompactSelection :268 may shrink the
    # candidate store-file list, postCompactSelection :290 is notified
    # with the final pick).  Consumed by Admin.compact(observers=...).
    pre_compact_selection: Callable[[list], list] | None = None
    post_compact_selection: Callable[[list], None] | None = None
    # WAL replay interception (RegionObserver.java: preWALRestore
    # :1395 — may rewrite the replayed edits — postWALRestore :1416).
    # Consumed by streaming.merge.wal_player(observers=...).
    pre_wal_restore: Callable[[DataFrame], DataFrame] | None = None
    post_wal_restore: Callable[[DataFrame], None] | None = None
    # whole-replay bracket (RegionObserver.java: preReplayWALs :1401,
    # postReplayWALs :1411) — fired ONCE around a wal_player replay,
    # before/after the per-edit WALRestore hooks; pre may rewrite the
    # raw edit stream (the reference's "about to replay these logs"
    # interception), post is notified with the final replayed frame.
    pre_replay_wals: Callable[[DataFrame], DataFrame] | None = None
    post_replay_wals: Callable[[DataFrame], None] | None = None
    # region lifecycle notifications (RegionObserver.java: preOpen
    # :112, postOpen :120, preClose :322, postClose :331) — fired by
    # Admin geometry rewrites (split/merge/truncate_region) as region
    # files retire (close) and their replacements appear (open); the
    # hook receives the region-file path, the region-identity analog.
    pre_close: Callable[[str], None] | None = None
    post_close: Callable[[str], None] | None = None
    pre_open: Callable[[str], None] | None = None
    post_open: Callable[[str], None] | None = None
    # bulk-load per-file commit (RegionObserver.java:
    # preCommitStoreFile :1449 — before each produced store file is
    # moved into the layout, with (family, path) — postCommitStoreFile
    # :1460 — after).  Consumed by observed_bulk_load.
    pre_commit_store_file: Callable[[str, str], None] | None = None
    post_commit_store_file: Callable[[str, str], None] | None = None


@dataclass
class ObservedTable:
    """A Table with an observer chain applied around reads and writes."""

    table: Table
    observers: list[Observer] = field(default_factory=list)

    def scan(self, spec: Scan | None = None, **kwargs) -> DataFrame:
        spec = spec or Scan(**kwargs)
        for ob in self.observers:
            if ob.pre_scan:  # preScannerOpen
                spec = ob.pre_scan(spec)
        out = self.table.scan(spec)
        for ob in self.observers:
            if ob.post_scanner_open:  # postScannerOpen — wrap the scanner
                out = ob.post_scanner_open(out)
        if spec.filter is not None and any(
            ob.post_scanner_filter_row for ob in self.observers
        ):
            # postScannerFilterRow: the hook sees the rows the filter
            # excluded.  Cost shape matches the reference (the hook is
            # the slow path, called once per filtered row): one extra
            # filter-free scan, anti-joined on row key to the kept set
            # — the join touches only dropped rows.
            from dataclasses import replace as _replace

            unfiltered = self.table.scan(
                _replace(spec, filter=None, limit=None)
            )
            # Diff against the filter-KEPT set pre-limit, not the
            # final (possibly limit-truncated) output: the reference
            # hook fires only for rows the FILTER excluded, so rows
            # the filter kept but the limit cut must not reach it —
            # otherwise audits overcount and a rescue hook could
            # resurrect limit-truncated rows, breaking the limit
            # contract.
            kept = (
                out
                if spec.limit is None
                else self.table.scan(_replace(spec, limit=None))
            )
            dropped = unfiltered.join(
                kept.select("row").distinct(), "row", "left_anti"
            )
            for ob in self.observers:
                if ob.post_scanner_filter_row:
                    rescued = ob.post_scanner_filter_row(dropped)
                    if rescued is not None:
                        out = out.unionByName(rescued)
        for ob in self.observers:
            if ob.post_scan:  # postScannerNext
                out = ob.post_scan(out)
        for ob in self.observers:
            if ob.pre_scanner_close:
                ob.pre_scanner_close(out)
        for ob in self.observers:
            if ob.post_scanner_close:
                ob.post_scanner_close(out)
        return out

    def get(self, row_key, **kw) -> DataFrame:
        for ob in self.observers:
            if ob.pre_get:
                row_key = ob.pre_get(row_key)
        out = self.table.get(row_key, **kw)
        for ob in self.observers:
            if ob.post_get:
                out = ob.post_get(out)
        return out

    def exists(self, row_key) -> bool:
        """preExists may answer without reading (the reference's
        bypass: the hook fills in ``exists`` and the get is skipped);
        postExists may rewrite the verdict."""
        found = None
        for ob in self.observers:
            if ob.pre_exists:
                found = ob.pre_exists(row_key)
                if found is not None:
                    break
        if found is None:
            found = self.table.exists(row_key)
        for ob in self.observers:
            if ob.post_exists:
                found = ob.post_exists(row_key, found)
        return bool(found)

    def batch(self, mutation_frames: list) -> "ObservedTable":
        """preBatchMutate sees (and may rewrite or drop members of)
        the WHOLE mini-batch before any merge; postBatchMutate sees
        the merged table."""
        for ob in self.observers:
            if ob.pre_batch_mutate:
                mutation_frames = ob.pre_batch_mutate(mutation_frames)
        t = self.table.batch(mutation_frames)
        for ob in self.observers:
            if ob.post_batch_mutate:
                t = ob.post_batch_mutate(t)
        return ObservedTable(t, self.observers)

    def with_cells(self, more: DataFrame) -> "ObservedTable":
        for ob in self.observers:
            if ob.pre_mutate:
                more = ob.pre_mutate(more)
        t = self.table.with_cells(more)
        for ob in self.observers:
            if ob.post_mutate:
                t = ob.post_mutate(t)
        return ObservedTable(t, self.observers)

    def increment(self, deltas, *, ts: int, seq: int) -> "ObservedTable":
        for ob in self.observers:
            if ob.pre_increment:
                deltas = ob.pre_increment(deltas)
        t = self.table.increment(deltas, ts=ts, seq=seq)
        for ob in self.observers:
            if ob.post_increment:
                t = ob.post_increment(t)
        return ObservedTable(t, self.observers)

    def append(self, appends, *, ts: int, seq: int) -> "ObservedTable":
        for ob in self.observers:
            if ob.pre_append:
                appends = ob.pre_append(appends)
        t = self.table.append(appends, ts=ts, seq=seq)
        for ob in self.observers:
            if ob.post_append:
                t = ob.post_append(t)
        return ObservedTable(t, self.observers)

    def check_and_mutate(self, mutations: DataFrame, **guard) -> "ObservedTable":
        for ob in self.observers:
            if ob.pre_check_and_mutate:
                mutations = ob.pre_check_and_mutate(mutations)
        t = self.table.check_and_mutate(mutations, **guard)
        for ob in self.observers:
            if ob.post_check_and_mutate:
                t = ob.post_check_and_mutate(t)
        return ObservedTable(t, self.observers)

    def flush_cells(self) -> DataFrame:
        """The frame a flush would persist, after preFlush interception
        (Admin.flush(name, Table(observed.flush_cells(), ...)) is the
        full write path); postFlush observers are then notified with
        that frame (RegionObserver.java:163 — a notification, it cannot
        change what was written)."""
        cells = self.table.cells
        for ob in self.observers:
            if ob.pre_flush:
                cells = ob.pre_flush(cells)
        for ob in self.observers:
            if ob.post_flush:
                ob.post_flush(cells)
        return cells

    def compact(self) -> "ObservedTable":
        cells = self.table.cells
        for ob in self.observers:
            if ob.pre_compact:
                cells = ob.pre_compact(cells)
        t = Table(cells, self.table.families, self.table.now).compact()
        for ob in self.observers:
            if ob.post_compact:
                # postCompact (RegionObserver.java:312): notified with
                # the compaction RESULT, like the reference's resulting
                # store file
                ob.post_compact(t.cells)
        return ObservedTable(t, self.observers)


def scan_modifying_observer(families: list[str] | None = None,
                            qualifiers: list | None = None) -> Observer:
    """ScanModifyingObserver.java — force a projection onto every scan."""

    def pre(spec: Scan) -> Scan:
        return replace(
            spec,
            families=families if families is not None else spec.families,
            qualifiers=qualifiers if qualifiers is not None else spec.qualifiers,
        )

    return Observer(pre_scan=pre)


def value_rewriting_observer(match: Column, replacement: Column) -> Observer:
    """ValueRewritingObserver.java — substitute values at scan time."""

    def post(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "value", F.when(match, replacement).otherwise(F.col("value"))
        )

    return Observer(post_scan=post)


def scan_policy_observer(ttl_ms: int, now: int) -> Observer:
    """ZooKeeperScanPolicyObserver (hbase-examples) — a TTL policy
    sourced OUTSIDE the schema, enforced at flush and compaction time:
    cells older than ``now - ttl_ms`` are dropped as the store files
    are rewritten (the reference builds a custom ScanInfo for
    preFlushScannerOpen / preCompactScannerOpen)."""
    cutoff = now - ttl_ms

    def drop_expired(cells: DataFrame) -> DataFrame:
        return cells.filter(F.col("ts") >= F.lit(cutoff))

    return Observer(pre_flush=drop_expired, pre_compact=drop_expired)


def audit_guard_observer(forbidden: Column) -> Observer:
    """preCheckAndPut-style guard interception: silently drop mutation
    cells matching ``forbidden`` before the guard evaluates (the
    coprocessor veto pattern — AccessController.preCheckAndPut)."""

    def pre(mutations: DataFrame) -> DataFrame:
        return mutations.filter(~forbidden)

    return Observer(pre_check_and_mutate=pre, pre_mutate=pre)


def observed_bulk_load(
    cells: DataFrame, path: str, observers: list[Observer], **layout_kw
) -> None:
    """Bulk load (sources/layout.write_table — the HFileOutputFormat2
    job) with observer interception: preBulkLoadHFile observers may
    rewrite or drop cells before the layout is written
    (RegionObserver.java:1438 — the SecureBulkLoadEndpoint pattern);
    postBulkLoadHFile observers are notified with the loaded frame
    (:1472).

    When any observer carries store-file COMMIT hooks
    (preCommitStoreFile :1449 / postCommitStoreFile :1460), the load
    runs the reference's stage-then-commit protocol: the layout is
    written to a staging directory, and each produced store file is
    moved into the final layout individually with the pre hook fired
    before its move (receiving ``(family, src_path)``) and the post
    hook after (``(family, committed_path)``) — exactly the
    SecureBulkLoad per-file commit points."""
    import glob
    import os
    import shutil

    from hbase_spark.sources.layout import write_table

    for ob in observers:
        if ob.pre_bulk_load:
            cells = ob.pre_bulk_load(cells)
    commit_hooked = any(
        ob.pre_commit_store_file or ob.post_commit_store_file
        for ob in observers
    )
    if not commit_hooked:
        write_table(cells, path, **layout_kw)
    else:
        staging = path.rstrip("/") + ".__bulkload_staging"
        shutil.rmtree(staging, ignore_errors=True)
        write_table(cells, staging, **layout_kw)
        shutil.rmtree(path, ignore_errors=True)
        for src in sorted(glob.glob(f"{staging}/**/*", recursive=True)):
            if not os.path.isfile(src):
                continue
            rel = os.path.relpath(src, staging)
            dst = os.path.join(path, rel)
            is_store_file = src.endswith(".parquet")
            family = next(
                (
                    p.split("=", 1)[1]
                    for p in rel.split(os.sep)
                    if p.startswith("family=")
                ),
                "*",  # non-family-partitioned layout: one store per region
            )
            if is_store_file:
                for ob in observers:
                    if ob.pre_commit_store_file:
                        ob.pre_commit_store_file(family, src)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.move(src, dst)
            if is_store_file:
                for ob in observers:
                    if ob.post_commit_store_file:
                        ob.post_commit_store_file(family, dst)
        shutil.rmtree(staging, ignore_errors=True)
    for ob in observers:
        if ob.post_bulk_load:
            ob.post_bulk_load(cells)


def region_metrics_observer(stats: dict) -> Observer:
    """Lifecycle-notification example: record flushed / compacted /
    bulk-loaded cell counts into ``stats`` — the metrics-coprocessor
    pattern (the reference example coprocessors export the same
    counters via its MetricRegistry)."""

    def _record(key):
        def note(cells: DataFrame) -> None:
            stats[key] = cells.count()

        return note

    return Observer(
        post_flush=_record("flushed_cells"),
        post_compact=_record("compacted_cells"),
        post_bulk_load=_record("bulk_loaded_cells"),
    )


def secure_bulk_load_observer(allowed_families: list[str]) -> Observer:
    """preBulkLoadHFile guard: only cells of sanctioned families load
    (the AccessController/SecureBulkLoad veto shape — unsanctioned
    input is dropped before the layout write)."""

    def pre(cells: DataFrame) -> DataFrame:
        return cells.filter(F.col("family").isin(allowed_families))

    return Observer(pre_bulk_load=pre)


def scan_auditing_observer(audit: dict) -> Observer:
    """Scanner-lifecycle metrics: count scanner opens/closes and the
    rows the filter dropped — the metrics-coprocessor pattern over the
    scanner family (RegionObserver.java postScannerOpen :1100 /
    postScannerFilterRow :1175 / postScannerClose :1203)."""

    def opened(df: DataFrame) -> DataFrame:
        audit["opened"] = audit.get("opened", 0) + 1
        return df

    def filtered(dropped: DataFrame):
        audit["filtered_rows"] = dropped.select("row").distinct().count()
        return None  # observe only; nothing resurrected

    def closing(df: DataFrame) -> None:
        audit["closing"] = audit.get("closing", 0) + 1

    def closed(df: DataFrame) -> None:
        audit["closed"] = audit.get("closed", 0) + 1

    return Observer(
        post_scanner_open=opened,
        post_scanner_filter_row=filtered,
        pre_scanner_close=closing,
        post_scanner_close=closed,
    )


def row_rescue_observer(keep: Column) -> Observer:
    """postScannerFilterRow interception that overrides the filter's
    verdict: cells of dropped rows matching ``keep`` are returned to
    the result — the AccessController-style 'the coprocessor outranks
    the filter' pattern, generalized declaratively (the reference hook
    reacts per dropped row mid-iteration)."""

    def rescue(dropped: DataFrame) -> DataFrame:
        return dropped.filter(keep)

    return Observer(post_scanner_filter_row=rescue)


def write_heavy_increment_observer(value_type: str = "long") -> Observer:
    """WriteHeavyIncrementObserver.java:70 — increments become plain
    versioned cells; the scan hook sums all versions per column.  Pair
    with ``Table.scan(versions=<large>)`` (the reference's
    readAllVersions flush/scan override, :80) so every delta survives
    version capping until aggregated here."""

    def post(df: DataFrame) -> DataFrame:
        extra = [c for c in df.columns if c not in ("row", "family", "qualifier")]
        return (
            df.filter(F.col("type") == CellType.PUT)
            .groupBy("row", "family", "qualifier")
            .agg(
                F.sum(F.col("value").cast(value_type)).cast("string").alias("value"),
                F.max("ts").alias("ts"),
                F.max("seq").alias("seq"),
                F.max("type").alias("type"),
            )
            .select("row", "family", "qualifier", *extra)
        )

    return Observer(post_scan=post)
