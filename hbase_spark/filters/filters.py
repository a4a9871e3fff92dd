"""The 24 user-facing HBase filters + FilterList, compiled to Spark
(SURVEY.md §2.5; reference files under hbase-client/.../filter/).

Cell-level filters compile to Column predicates (``cell_pred``);
row-stage filters (the filterRow half: SingleColumnValue, Skip,
WhileMatch, pagination, first-key) compile to DataFrame transforms
(``post``) applied after version capping, matching the reference's
evaluation order (rs/RegionScannerImpl.java:463-472).

Seek-hint machinery (SEEK_NEXT_USING_HINT etc.) is physical-only in
Spark — predicate pushdown and row-group skipping subsume it
(SURVEY.md §4.2) — so it has no analog here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hbase_spark.filters.base import Filter
from hbase_spark.filters.comparators import BinaryComparator, Comparator


def _cmp(comparator) -> Comparator:
    if isinstance(comparator, Comparator):
        return comparator
    return BinaryComparator(comparator)


class _CompareFilter(Filter):
    """Base of the four component-compare filters (filter/CompareFilter.java:54)."""

    _col: str

    def __init__(self, op: str, comparator):
        self.op = op
        self.comparator = _cmp(comparator)

    def cell_pred(self) -> Column:
        return self.comparator.matches(F.col(self._col), self.op)


class RowFilter(_CompareFilter):
    """filter/RowFilter.java:44 — compare the row key."""

    _col = "row"


class FamilyFilter(_CompareFilter):
    """filter/FamilyFilter.java:48."""

    _col = "family"


class QualifierFilter(_CompareFilter):
    """filter/QualifierFilter.java:45."""

    _col = "qualifier"


class ValueFilter(_CompareFilter):
    """filter/ValueFilter.java:45 — compare each cell's value."""

    _col = "value"


class ColumnValueFilter(Filter):
    """filter/ColumnValueFilter.java:48 — cell-level: emit only the
    matching column's matching cells."""

    def __init__(self, family: str, qualifier, op: str, comparator):
        self.family, self.qualifier = family, qualifier
        self.op, self.comparator = op, _cmp(comparator)

    def cell_pred(self) -> Column:
        return (
            (F.col("family") == self.family)
            & (F.col("qualifier") == self.qualifier)
            & self.comparator.matches(F.col("value"), self.op)
        )


class SingleColumnValueFilter(Filter):
    """filter/SingleColumnValueFilter.java:65 — keep or drop the WHOLE
    row based on one column's value.

    ``filter_if_missing``: drop rows lacking the column (default False:
    such rows pass).  ``latest_version_only``: test only the newest
    visible version (default True, like the reference).
    """

    def __init__(
        self,
        family: str,
        qualifier,
        op: str,
        comparator,
        *,
        filter_if_missing: bool = False,
        latest_version_only: bool = True,
    ):
        self.family, self.qualifier = family, qualifier
        self.op, self.comparator = op, _cmp(comparator)
        self.filter_if_missing = filter_if_missing
        self.latest_version_only = latest_version_only

    def _row_verdicts(self, df: DataFrame):
        """Per-row guard verdicts computed from ONLY the tested column's
        cells — the essential-column-family two-phase read
        (rs/RegionScannerImpl.java:167-202 "joinedHeap" /
        Filter.isFamilyEssential): the guard family is scanned and
        aggregated alone (filter pushed to the source scan), and the
        full rows are fetched by semi/anti join afterwards.  At scale
        this aggregates one column instead of windowing every cell of
        every family by row."""
        guard = df.filter(
            (F.col("family") == self.family)
            & (F.col("qualifier") == self.qualifier)
        )
        if self.latest_version_only:
            per_row = guard.groupBy("row").agg(
                F.max_by("value", F.struct("ts", "seq")).alias("_v")
            )
            matched = self.comparator.matches(F.col("_v"), self.op)
        else:
            pred = self.comparator.matches(F.col("value"), self.op)
            per_row = guard.groupBy("row").agg(
                F.max(F.coalesce(pred, F.lit(False)).cast("int")).alias("_m")
            )
            matched = F.col("_m") == 1
        return per_row, F.coalesce(matched, F.lit(False))

    def post(self, df: DataFrame) -> DataFrame:
        per_row, matched = self._row_verdicts(df)
        if self.filter_if_missing:
            # only rows whose guard column exists AND matches survive
            return df.join(per_row.filter(matched).select("row"), "row", "semi")
        # rows with a failing guard drop; rows lacking the column pass
        return df.join(per_row.filter(~matched).select("row"), "row", "anti")


class SingleColumnValueExcludeFilter(SingleColumnValueFilter):
    """filter/SingleColumnValueExcludeFilter.java:41 — same, then drop
    the tested column from the output."""

    def post(self, df: DataFrame) -> DataFrame:
        df = super().post(df)
        return df.filter(
            ~((F.col("family") == self.family) & (F.col("qualifier") == self.qualifier))
        )


class DependentColumnFilter(Filter):
    """filter/DependentColumnFilter.java:46 — keep cells whose ts
    matches a timestamp of the reference column in the same row;
    optional value compare on the reference; optionally drop the
    reference column itself."""

    def __init__(
        self,
        family: str,
        qualifier,
        *,
        drop_dependent_column: bool = False,
        op: str | None = None,
        comparator=None,
    ):
        self.family, self.qualifier = family, qualifier
        self.drop = drop_dependent_column
        self.op = op
        self.comparator = _cmp(comparator) if comparator is not None else None

    def post(self, df: DataFrame) -> DataFrame:
        ref = df.filter(
            (F.col("family") == self.family) & (F.col("qualifier") == self.qualifier)
        )
        if self.comparator is not None:
            ref = ref.filter(self.comparator.matches(F.col("value"), self.op))
        # One (row, ts) pair per reference-column cell: grows with the
        # table, so no broadcast hint — AQE picks broadcast only when the
        # build side is actually small (a forced broadcast of an
        # unbounded frame OOMs at scale).
        ts_set = ref.select("row", "ts").distinct()
        out = df.join(ts_set, ["row", "ts"], "left_semi").select(*df.columns)
        if self.drop:
            out = out.filter(
                ~(
                    (F.col("family") == self.family)
                    & (F.col("qualifier") == self.qualifier)
                )
            )
        return out


class PrefixFilter(Filter):
    """filter/PrefixFilter.java:39 — row-key prefix.  The reference's
    seek-hint/early-stop becomes automatic range pruning: Catalyst
    rewrites startswith into a sargable range over parquet min/max."""

    def __init__(self, prefix: str):
        self.prefix = prefix

    def cell_pred(self) -> Column:
        return F.col("row").startswith(self.prefix)


class ColumnPrefixFilter(Filter):
    """filter/ColumnPrefixFilter.java:42."""

    def __init__(self, prefix: str):
        self.prefix = prefix

    def cell_pred(self) -> Column:
        return F.col("qualifier").startswith(self.prefix)


class MultipleColumnPrefixFilter(Filter):
    """filter/MultipleColumnPrefixFilter.java:46 — qualifier matches any
    of N prefixes."""

    def __init__(self, prefixes: list[str]):
        self.prefixes = list(prefixes)

    def cell_pred(self) -> Column:
        pred = F.lit(False)
        for p in self.prefixes:
            pred = pred | F.col("qualifier").startswith(p)
        return pred


class ColumnRangeFilter(Filter):
    """filter/ColumnRangeFilter.java:46 — qualifier in [min, max)."""

    def __init__(self, min_column=None, min_inclusive=True, max_column=None, max_inclusive=False):
        self.min_column, self.min_inclusive = min_column, min_inclusive
        self.max_column, self.max_inclusive = max_column, max_inclusive

    def cell_pred(self) -> Column:
        q = F.col("qualifier")
        pred = F.lit(True)
        if self.min_column is not None:
            pred = pred & (
                q >= self.min_column if self.min_inclusive else q > self.min_column
            )
        if self.max_column is not None:
            pred = pred & (
                q <= self.max_column if self.max_inclusive else q < self.max_column
            )
        return pred


class ColumnPaginationFilter(Filter):
    """filter/ColumnPaginationFilter.java:47 — per row: skip ``offset``
    columns (or start at ``column_offset``), take ``limit``."""

    def __init__(self, limit: int, offset: int = 0, column_offset=None):
        self.limit, self.offset, self.column_offset = limit, offset, column_offset

    def post(self, df: DataFrame) -> DataFrame:
        if self.column_offset is not None:
            df = df.filter(F.col("qualifier") >= self.column_offset)
            lo = 0
        else:
            lo = self.offset
        w = Window.partitionBy("row").orderBy("family", "qualifier")
        return (
            df.withColumn("_cn", F.dense_rank().over(w))
            .filter((F.col("_cn") > lo) & (F.col("_cn") <= lo + self.limit))
            .drop("_cn")
        )


class ColumnCountGetFilter(Filter):
    """filter/ColumnCountGetFilter.java:38 — cap total columns per row."""

    def __init__(self, limit: int):
        self.limit = limit

    def post(self, df: DataFrame) -> DataFrame:
        w = Window.partitionBy("row").orderBy("family", "qualifier")
        return (
            df.withColumn("_cn", F.dense_rank().over(w))
            .filter(F.col("_cn") <= self.limit)
            .drop("_cn")
        )


class PageFilter(Filter):
    """filter/PageFilter.java:42 — stop after N rows.  The reference's
    per-region quirk (can return > N across regions before the client
    trims) is replaced by the intended global LIMIT semantics
    (SURVEY.md §7.4 item 2)."""

    def __init__(self, page_size: int):
        self.page_size = page_size

    def post(self, df: DataFrame) -> DataFrame:
        keep = (
            df.select("row").distinct().orderBy("row").limit(self.page_size)
        )
        return df.join(F.broadcast(keep), "row", "left_semi").select(*df.columns)


class InclusiveStopFilter(Filter):
    """filter/InclusiveStopFilter.java:38 — scan until row == stop, inclusive."""

    def __init__(self, stop_row):
        self.stop_row = stop_row

    def cell_pred(self) -> Column:
        return F.col("row") <= self.stop_row


class MultiRowRangeFilter(Filter):
    """filter/MultiRowRangeFilter.java:53 — OR of row ranges.  Each
    range is (start, start_inclusive, stop, stop_inclusive); None =
    open.  Range-prunable: Catalyst pushes the OR-of-ranges down."""

    def __init__(self, ranges: list[tuple]):
        self.ranges = ranges

    def cell_pred(self) -> Column:
        pred = F.lit(False)
        r = F.col("row")
        for start, start_inc, stop, stop_inc in self.ranges:
            p = F.lit(True)
            if start is not None:
                p = p & (r >= start if start_inc else r > start)
            if stop is not None:
                p = p & (r <= stop if stop_inc else r < stop)
            pred = pred | p
        return pred


class FuzzyRowFilter(Filter):
    """filter/FuzzyRowFilter.java:67 — row matches a pattern with fixed
    and wildcard positions.  ``pairs`` = [(pattern, mask)] where mask
    char '0' = must match pattern char, '1'/'?' = wildcard (fixed-width
    keys).  The reference's next-row seek hints are subsumed by
    predicate pushdown."""

    def __init__(self, pairs: list[tuple[str, str]]):
        self.pairs = pairs

    def cell_pred(self) -> Column:
        pred = F.lit(False)
        for pattern, mask in self.pairs:
            p = F.length(F.col("row")) >= len(pattern)
            i = 0
            while i < len(pattern):
                if mask[i] == "0":
                    j = i
                    while j < len(pattern) and mask[j] == "0":
                        j += 1
                    p = p & (
                        F.substring(F.col("row"), i + 1, j - i) == pattern[i:j]
                    )
                    i = j
                else:
                    i += 1
            pred = pred | p
        return pred


class TimestampsFilter(Filter):
    """filter/TimestampsFilter.java:46 — ts in an explicit set."""

    def __init__(self, timestamps: list[int]):
        self.timestamps = [int(t) for t in timestamps]

    def cell_pred(self) -> Column:
        return F.col("ts").isin(self.timestamps)


class KeyOnlyFilter(Filter):
    """filter/KeyOnlyFilter.java:53 — strip values (or replace with the
    value length)."""

    def __init__(self, len_as_val: bool = False):
        self.len_as_val = len_as_val

    def post(self, df: DataFrame) -> DataFrame:
        vt = df.schema["value"].dataType.simpleString()
        new = (
            F.length(F.col("value")).cast("string").cast(vt)
            if self.len_as_val
            else F.lit(None).cast(vt)
        )
        return df.withColumn("value", new)

    def transforms_cells(self) -> bool:
        return True


class FirstKeyOnlyFilter(Filter):
    """filter/FirstKeyOnlyFilter.java:37 — only the first cell of each
    row, in cell order (the row-count optimization)."""

    def post(self, df: DataFrame) -> DataFrame:
        w = Window.partitionBy("row").orderBy(
            "family", "qualifier", F.col("ts").desc(), F.col("seq").desc()
        )
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )


class RandomRowFilter(Filter):
    """filter/RandomRowFilter.java:34 — include each row with
    probability p.  The reference draws java.util.Random per row
    (non-reproducible); we hash the row key with a seed so the sample
    is deterministic and consistent across every cell of a row.

    The bucket hash is the first 32 bits of md5(row || seed) — chosen
    over xxhash64 because md5 is portable to any SQL oracle (DuckDB:
    ``CAST('0x' || substr(md5(rk || seed), 1, 8) AS BIGINT)``), so the
    sample is verifiable engine-to-engine.  Still fully JVM-side."""

    def __init__(self, chance: float, seed: int = 42):
        self.chance, self.seed = chance, seed

    def cell_pred(self) -> Column:
        h32 = F.conv(
            F.substring(F.md5(F.concat(F.col("row"), F.lit(str(self.seed)))), 1, 8),
            16,
            10,
        ).cast("bigint")
        return F.pmod(h32, F.lit(1_000_000)) < int(self.chance * 1_000_000)


class SkipFilter(Filter):
    """filter/SkipFilter.java:49 — drop the whole row if the wrapped
    filter rejects ANY cell in it (per-row bool_and)."""

    def __init__(self, inner: Filter):
        pred = inner.cell_pred()
        if pred is None:
            raise ValueError("SkipFilter requires a cell-level inner filter")
        self.inner_pred = pred

    def post(self, df: DataFrame) -> DataFrame:
        w = Window.partitionBy("row")
        ok = F.min(self.inner_pred.cast("int")).over(w) == 1
        return df.withColumn("_ok", ok).filter(F.col("_ok")).drop("_ok")


class WhileMatchFilter(Filter):
    """filter/WhileMatchFilter.java:39 — take-while: terminate the scan
    at the first cell the wrapped filter rejects.  Emulated with
    ordered semantics at row granularity: keep rows strictly before the
    first row containing a rejected cell (SURVEY.md §7.4 item 2)."""

    def __init__(self, inner: Filter):
        pred = inner.cell_pred()
        if pred is None:
            raise ValueError("WhileMatchFilter requires a cell-level inner filter")
        self.inner_pred = pred

    def post(self, df: DataFrame) -> DataFrame:
        # On a reversed scan the take-while proceeds from the HIGHEST
        # key downward, so the boundary is max(row) and we keep the
        # rows above it (WhileMatchFilter wraps the scan direction in
        # the reference too — the matcher just sees iteration order).
        rev = getattr(self, "_scan_reversed", False)
        agg = F.max("row") if rev else F.min("row")
        first_bad = df.filter(~self.inner_pred).agg(agg.alias("_stop_row"))
        keep = (
            (F.col("row") > F.col("_stop_row"))
            if rev
            else (F.col("row") < F.col("_stop_row"))
        )
        return (
            df.join(F.broadcast(first_bad))
            .filter(F.col("_stop_row").isNull() | keep)
            .drop("_stop_row")
        )


class FilterList(Filter):
    """filter/FilterList.java:46 — AND (MUST_PASS_ALL) / OR
    (MUST_PASS_ONE) tree.  Cell predicates combine with & / | (Catalyst
    short-circuits like the reference's lazy AND evaluation).  Row-stage
    children compose sequentially under AND; under OR only cell-level
    children are supported (the reference's OR of row-stage filters has
    no clean relational form — raise rather than silently diverge)."""

    def __init__(self, operator: str, filters: list[Filter]):
        operator = operator.upper()
        if operator in ("AND", "MUST_PASS_ALL"):
            self.op = "AND"
        elif operator in ("OR", "MUST_PASS_ONE"):
            self.op = "OR"
        else:
            raise ValueError(f"bad FilterList operator {operator!r}")
        self.filters = list(filters)
        if self.op == "OR":
            for f in self.filters:
                if f.transforms_cells():
                    raise NotImplementedError(
                        f"OR FilterList with cell-transforming child "
                        f"{type(f).__name__}"
                    )

    def cell_pred(self) -> Column | None:
        if self.op == "OR" and self.has_row_stage():
            # handled wholly in post(): each branch computes its own
            # include-set from the unfiltered frame (a cell a branch's
            # row-stage would admit must not be pre-dropped by another
            # branch's cell predicate)
            return None
        preds = [f.cell_pred() for f in self.filters]
        preds = [p for p in preds if p is not None]
        if not preds:
            return None
        out = preds[0]
        for p in preds[1:]:
            out = (out & p) if self.op == "AND" else (out | p)
        return out

    def has_row_stage(self) -> bool:
        return any(f.has_row_stage() for f in self.filters)

    def set_reversed(self, reversed: bool) -> None:
        super().set_reversed(reversed)
        for f in self.filters:
            f.set_reversed(reversed)

    def post(self, df: DataFrame) -> DataFrame:
        if self.op == "AND":
            for f in self.filters:
                df = f.post(df)
            return df
        if not self.has_row_stage():
            return df
        # MUST_PASS_ONE with row-stage children
        # (filter/FilterListWithOR.java:34): a cell is included if ANY
        # branch includes it — union of per-branch include-sets, deduped
        # by cell identity.
        #
        # KNOWN ORDERING DIVERGENCE: because cell_pred() returns None in
        # this mode, scan() runs cap_versions on the UNFILTERED frame and
        # the branch cell predicates apply here, after version counting.
        # The reference matcher runs cell filters before version
        # counting, so with versions=1 an older matching version that
        # should fill the slot is lost when the newest version fails the
        # predicate.  Affects only OR-lists that mix row-stage children
        # with cell predicates AND versions < all-versions; the pure
        # cell path (no row-stage children) keeps exact matcher order.
        branches = []
        for f in self.filters:
            b = df
            p = f.cell_pred()
            if p is not None:
                b = b.filter(p)
            branches.append(f.post(b))
        out = branches[0]
        for b in branches[1:]:
            out = out.unionByName(b)
        return out.dropDuplicates(["row", "family", "qualifier", "ts", "seq"])
