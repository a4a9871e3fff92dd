"""Range scans — the Spark translation of client/Scan.java:84 (§2.3).

A Scan is declarative query state; ``scan()`` compiles it to one
DataFrame plan:

1. source pruning: row range + family/qualifier projection (these reach
   the parquet scan as pushed filters — the Spark analog of region
   pruning and HFile key-range pruning, SURVEY.md §4.1);
2. snapshot resolution (tombstones / TTL / time-range / as-of);
3. cell-level filter predicate (UserScanQueryMatcher.java:216 order:
   after delete masking, before version counting);
4. version capping (readVersions, client/Scan.java:487);
5. row-stage filter (filterRow, rs/RegionScannerImpl.java:463-472);
6. reversed ordering (client/Scan.java:692) and row limit (:958).

The reference advances region-by-region sequentially
(client/AsyncClientScanner.java:65); here all partitions scan in
parallel — a capability upgrade (SURVEY.md §3.2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_spark.filters.base import Filter
from hbase_spark.model import CellType
from hbase_spark.operators.resolve import cap_versions, mask_deletes, _time_range_pred


@dataclass
class Scan:
    """Declarative scan spec — field-for-field analog of client/Scan.java."""

    start_row: object | None = None          # withStartRow, Scan.java:349
    stop_row: object | None = None           # withStopRow,  Scan.java:391
    start_inclusive: bool = True             # Scan.java:368
    stop_inclusive: bool = False             # Scan.java:410
    families: list[str] | None = None        # addFamily,    Scan.java:269
    qualifiers: list | None = None           # addColumn,    Scan.java:282
    versions: int | dict = 1                 # readVersions, Scan.java:487
    #   (dict = per-family effective cap, see operators.resolve)
    time_range: tuple | None = None          # setTimeRange, Scan.java:304
    raw: bool = False                        # setRaw,       Scan.java:848
    reversed: bool = False                   # setReversed,  Scan.java:692
    limit: int | None = None                 # setLimit,     Scan.java:958
    filter: Filter | Column | str | None = None  # setFilter, Scan.java:556
    #   (str = ParseFilter language, parsed at scan time)
    as_of: int | None = None                 # mvccReadPoint analog, Scan.java:997
    max_results_per_family: int | None = None   # Scan.java:514
    row_offset_per_family: int = 0              # Scan.java:523
    batch: int | None = None                    # setBatch, Scan.java:475
    #   (chunks each row's cells into partial results of <= batch cells
    #   in cell order — implies allowPartialResults, Scan.java:529; the
    #   ScannerContext batch-limit analog surfaces as a `batch` column,
    #   the partial-result index consumers group on)
    family_time_ranges: dict | None = None      # setColumnFamilyTimeRange,
    #   Scan.java:330 / Get.java:205: family -> (min_ts, max_ts)
    #   half-open, OVERRIDING the scan-level time_range for that
    #   family's store (each StoreScanner's matcher gets its CF's
    #   TimeRange); families absent from the map keep time_range.
    #   Check order matches the global range: after tombstone masking,
    #   before version counting.
    extra: dict = field(default_factory=dict)


def row_range_pred(scan: Scan) -> Column:
    pred = F.lit(True)
    if scan.start_row is not None:
        op = F.col("row").__ge__ if scan.start_inclusive else F.col("row").__gt__
        pred = pred & op(F.lit(scan.start_row))
    if scan.stop_row is not None:
        op = F.col("row").__le__ if scan.stop_inclusive else F.col("row").__lt__
        pred = pred & op(F.lit(scan.stop_row))
    return pred


def _scan_time_pred(spec: Scan) -> Column | None:
    """The put-visibility time predicate: scan-level range with
    per-family overrides (setColumnFamilyTimeRange, Scan.java:330)."""
    if spec.time_range is None and not spec.family_time_ranges:
        return None
    pred = (
        _time_range_pred(spec.time_range)
        if spec.time_range is not None
        else F.lit(True)
    )
    for fam, tr in (spec.family_time_ranges or {}).items():
        pred = F.when(
            F.col("family") == fam, _time_range_pred(tr)
        ).otherwise(pred)
    return pred


def _kdc_hi(spec: Scan) -> Column | None:
    """Per-family upper bound for KEEP_DELETED_CELLS marker tracking
    (the matcher's tr.withinTimeRange uses each store's CF range)."""
    glob = (
        spec.time_range[1]
        if spec.time_range is not None and spec.time_range[1] is not None
        else None
    )
    fams = {
        f: tr[1]
        for f, tr in (spec.family_time_ranges or {}).items()
        if tr[1] is not None
    }
    if glob is None and not fams:
        return None
    hi = F.lit(glob).cast("long")
    for fam, v in fams.items():
        hi = F.when(F.col("family") == fam, F.lit(v)).otherwise(hi)
    return hi


def scan(
    cells: DataFrame,
    spec: Scan | None = None,
    *,
    ttl_by_family: dict[str, int] | None = None,
    now: int | None = None,
    new_version_behavior: bool | set = False,
    min_versions: int | dict = 0,
    keep_deleted_cells: bool | set = False,
    single_version: bool = False,
    **kwargs,
) -> DataFrame:
    """Execute a Scan over a raw CellFrame, returning visible cells.

    ``single_version=True`` is the caller's contract that the frame
    holds at most one PUT per (row, family, qualifier) and no
    tombstones (see operators.resolve.resolve) — snapshot resolution
    then degenerates to the put-type filter and the scan runs with no
    aggregation, sort or exchange of its own; filters, pagination,
    batching and limits apply unchanged."""
    spec = spec or Scan(**kwargs)
    if isinstance(spec.filter, str):
        # shell/REST parity: a string filter goes through ParseFilter
        from dataclasses import replace as _replace

        from hbase_spark.filters.parse import parse_filter

        spec = _replace(spec, filter=parse_filter(spec.filter))
    if isinstance(spec.filter, Filter):
        spec.filter.set_reversed(spec.reversed)

    c = cells.filter(row_range_pred(spec))
    if spec.families:
        c = c.filter(F.col("family").isin(spec.families))
    if spec.qualifiers:
        # Keep family-scope tombstones: their masking must still apply
        # even when the projection drops other qualifiers.
        c = c.filter(
            F.col("qualifier").isin(spec.qualifiers)
            | F.col("type").isin(
                [CellType.DELETE_FAMILY, CellType.DELETE_FAMILY_VERSION]
            )
        )

    if spec.as_of is not None:
        c = c.filter(F.col("ts") <= F.lit(spec.as_of))

    if spec.raw:
        out = c
        tp = _scan_time_pred(spec)
        if tp is not None:
            out = out.filter(tp)
        return _scan_tail(out, spec, resolved=False)
    else:
        from hbase_spark.operators.resolve import _fam_member, _norm_flag, _norm_versions

        min_versions = _norm_versions(min_versions, default=0)
        keep_deleted_cells = _norm_flag(keep_deleted_cells)
        cutoff = None
        if ttl_by_family:
            if now is None:
                raise ValueError("now= required with ttl_by_family")
            cutoff = F.lit(None).cast("long")
            for fam, ttl_ms in ttl_by_family.items():
                cutoff = F.when(F.col("family") == fam, F.lit(now - ttl_ms)).otherwise(
                    cutoff
                )
            # pre-drop expired cells only where minVersions<=0 (per
            # family when min_versions is family-keyed) — mirrors
            # resolve()
            if isinstance(min_versions, int):
                if min_versions <= 0:
                    c = c.filter(cutoff.isNull() | (F.col("ts") >= cutoff))
                    cutoff = None
            else:
                pos_fams = [f for f, v in min_versions.items() if v > 0]
                c = c.filter(
                    F.col("family").isin(pos_fams)
                    | cutoff.isNull()
                    | (F.col("ts") >= cutoff)
                )
                if not pos_fams:
                    cutoff = None
        from hbase_spark.operators.resolve import _cap_is_identity, _fam_col

        puts = c.filter(F.col("type") == CellType.PUT)
        if single_version and _cap_is_identity(spec.versions):
            out = puts
            tp = _scan_time_pred(spec)
            if tp is not None:
                out = out.filter(tp)
            if isinstance(spec.filter, Column):
                out = out.filter(spec.filter)
            elif isinstance(spec.filter, Filter):
                pred = spec.filter.cell_pred()
                if pred is not None:
                    out = out.filter(pred)
            if cutoff is not None:
                minv = (
                    F.lit(min_versions)
                    if isinstance(min_versions, int)
                    else _fam_col(min_versions, 0)
                )
                out = out.filter(
                    cutoff.isNull() | (F.col("ts") >= cutoff) | (minv >= 1)
                )
            return _scan_tail(out, spec)
        dels = c.filter(F.col("type") != CellType.PUT)
        hi = _kdc_hi(spec)
        if keep_deleted_cells and hi is not None:
            # KEEP_DELETED_CELLS: markers after the scan's time range
            # don't mask (NormalUserScanQueryMatcher.java:95) — KDC
            # families only, when family-keyed; per-family CF ranges
            # bound their own family's markers.
            keep_pred = hi.isNull() | (F.col("ts") < hi)
            if keep_deleted_cells is True:
                dels = dels.filter(keep_pred)
            else:
                dels = dels.filter(
                    ~_fam_member(keep_deleted_cells) | keep_pred
                )
        out = mask_deletes(puts, dels, new_version_behavior=new_version_behavior)
        tp = _scan_time_pred(spec)
        if tp is not None:
            out = out.filter(tp)

        # cell-level filter BEFORE version counting (matcher order)
        if isinstance(spec.filter, Column):
            out = out.filter(spec.filter)
        elif isinstance(spec.filter, Filter):
            pred = spec.filter.cell_pred()
            if pred is not None:
                out = out.filter(pred)

        out = cap_versions(
            out, spec.versions, min_versions=min_versions, ttl_cutoff=cutoff
        )
        return _scan_tail(out, spec)

def _scan_tail(out: DataFrame, spec: Scan, *, resolved: bool = True) -> DataFrame:
    """Post-resolution scan stages, shared by the resolved, raw and
    single_version paths: per-row column pagination and the row-stage
    filter (resolved scans only — matcher order), then transport
    batching, the row limit, and reversed ordering."""
    if resolved:
        # per-row per-family column pagination (Scan.java:514,523)
        if spec.max_results_per_family is not None or spec.row_offset_per_family:
            from pyspark.sql import Window

            w = Window.partitionBy("row", "family").orderBy("qualifier")
            out = out.withColumn("_cn", F.dense_rank().over(w))
            lo = spec.row_offset_per_family
            out = out.filter(F.col("_cn") > lo)
            if spec.max_results_per_family is not None:
                out = out.filter(F.col("_cn") <= lo + spec.max_results_per_family)
            out = out.drop("_cn")

        # row-stage filter (filterRow analog)
        if isinstance(spec.filter, Filter):
            out = spec.filter.post(out)

    if spec.batch is not None:
        # Scan.setBatch (Scan.java:475): each row's visible cells chunk
        # into partial results of <= batch cells, counted in cell order
        # (family, qualifier, newest version first) — the order
        # RegionScannerImpl returns them under a ScannerContext batch
        # limit.  Transport chunking becomes an annotation column.
        from pyspark.sql import Window

        if spec.batch < 1:
            raise ValueError("batch must be >= 1")
        wb = Window.partitionBy("row").orderBy(
            F.col("family").asc(),
            F.col("qualifier").asc(),
            F.col("ts").desc(),
            F.col("seq").desc(),
        )
        out = out.withColumn(
            "batch",
            F.floor((F.row_number().over(wb) - 1) / spec.batch).cast("int"),
        )

    if spec.limit is not None:
        key = F.col("row").desc() if spec.reversed else F.col("row").asc()
        keep = out.select("row").distinct().orderBy(key).limit(spec.limit)
        out = out.join(F.broadcast(keep), "row", "left_semi")

    if spec.reversed:
        out = out.orderBy(
            F.col("row").desc(),
            F.col("family").asc(),
            F.col("qualifier").asc(),
            F.col("ts").desc(),
        )
    return out
