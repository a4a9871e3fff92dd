"""Filter protocol.

HBase filters (filter/Filter.java:120-153) fuse a per-cell predicate
with skip-ahead *advice* (ReturnCodes like NEXT_ROW / SEEK_NEXT_USING_HINT)
and optional whole-row post-processing (filterRow/filterRowCells,
filter/FilterBase.java).  In Spark the advice half is subsumed by
columnar pruning + predicate pushdown (SURVEY.md §4.2), so a filter here
is just:

- ``cell_pred()`` — an optional Column predicate evaluated per visible
  cell (the filterCell half); and
- ``post(df)``    — an optional row-stage transformation evaluated after
  version capping / row assembly (the filterRow half).

Scan applies them in the reference's order: tombstone masking -> cell
predicate -> version counting -> row stage
(rs/querymatcher/UserScanQueryMatcher.java:168,216;
rs/RegionScannerImpl.java:463-472).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


class Filter:
    """Base class; concrete filters live in hbase_spark.filters.filters."""

    def cell_pred(self) -> Column | None:
        """Per-cell predicate over CellFrame columns, or None."""
        return None

    def post(self, df: DataFrame) -> DataFrame:
        """Row-stage transformation (filterRow analog); default no-op."""
        return df

    def has_row_stage(self) -> bool:
        """True if this filter does row-stage work in ``post``."""
        return type(self).post is not Filter.post

    def transforms_cells(self) -> bool:
        """True if ``post`` rewrites cell CONTENT (not just selection) —
        e.g. KeyOnlyFilter stripping values.  Such filters can't join an
        OR FilterList: branch-union semantics would mix transformed and
        untransformed copies of the same cell."""
        return False

    def set_reversed(self, reversed: bool) -> None:
        """Scan direction hint — ``scan()`` calls this before the row
        stage so direction-sensitive filters (WhileMatchFilter's
        take-while boundary) orient correctly on reversed scans.
        Wrapper filters override to propagate to children."""
        self._scan_reversed = reversed

    # Python operator sugar mirroring FilterList (filter/FilterList.java:46)
    def __and__(self, other: "Filter") -> "Filter":
        from hbase_spark.filters.filters import FilterList

        return FilterList("AND", [self, other])

    def __or__(self, other: "Filter") -> "Filter":
        from hbase_spark.filters.filters import FilterList

        return FilterList("OR", [self, other])
