"""Aggregations — the AggregationClient / AggregateImplementation
endpoint re-expressed as Catalyst aggregates (SURVEY.md §2.6).

The reference computes each aggregate as a server-side partial per
region + client-side final merge
(endpoint/coprocessor/AggregateImplementation.java; client
endpoint/client/coprocessor/AggregationClient.java) — exactly the
partial/final split Spark's agg() generates automatically, so every
one of these is a single declarative aggregate.

``ColumnInterpreter`` typed views (LongColumnInterpreter etc.) become
casts: interpreter='long' | 'double' | 'decimal'.

The reference supports only a single group (the scan range); we expose
the same single-group calls plus the natural group_by generalization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_INTERPRETERS = {
    "long": "long",          # LongColumnInterpreter
    "double": "double",      # DoubleColumnInterpreter
    "decimal": "decimal(38,10)",  # BigDecimalColumnInterpreter
}


def _typed(col: str | Column, interpreter: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(_INTERPRETERS[interpreter])


def agg_table(
    visible: DataFrame,
    family: str,
    qualifier,
    *,
    interpreter: str = "long",
    group_by: list[str] | None = None,
    exact_median: bool = True,
) -> DataFrame:
    """All endpoint aggregates in one pass over a resolved CellFrame.

    max/min/sum/count/avg/std: AggregateImplementation.java:84,143,201,
    260,325,401.  median (:483 — the reference needs a two-phase
    weighted-median scan) is exact via percentile() by default; pass
    ``exact_median=False`` for percentile_approx — at 100 TB the exact
    percentile buffers every value per group, while the approx sketch
    is fixed-size and map-side combinable, so approx is the scale
    default and exact the verification path.
    """
    v = _typed("value", interpreter)
    cells = visible.filter(
        (F.col("family") == family) & (F.col("qualifier") == qualifier)
    )
    pct = "percentile" if exact_median else "percentile_approx"
    aggs = [
        F.max(v).alias("max"),
        F.min(v).alias("min"),
        F.sum(v).alias("sum"),
        F.count(v).alias("count"),
        F.avg(v).alias("avg"),
        F.stddev_pop(v).alias("std"),
        F.expr(f"{pct}(cast(value as {_INTERPRETERS[interpreter]}), 0.5)").alias(
            "median"
        ),
    ]
    if group_by:
        return cells.groupBy(*group_by).agg(*aggs)
    return cells.agg(*aggs)


def _single(visible, family, qualifier, interpreter, expr_fn):
    row = agg_table(visible, family, qualifier, interpreter=interpreter).collect()[0]
    return expr_fn(row)


def agg_max(visible, family, qualifier, interpreter="long"):
    """AggregationClient.max — endpoint/client/.../AggregationClient.java:228."""
    return _single(visible, family, qualifier, interpreter, lambda r: r["max"])


def agg_min(visible, family, qualifier, interpreter="long"):
    """AggregationClient.min — AggregationClient.java:295."""
    return _single(visible, family, qualifier, interpreter, lambda r: r["min"])


def agg_sum(visible, family, qualifier, interpreter="long"):
    """AggregationClient.sum — AggregationClient.java:437."""
    return _single(visible, family, qualifier, interpreter, lambda r: r["sum"])


def agg_avg(visible, family, qualifier, interpreter="long"):
    """AggregationClient.avg — (sum, count) pair merged client-side."""
    return _single(visible, family, qualifier, interpreter, lambda r: r["avg"])


def agg_std(visible, family, qualifier, interpreter="long"):
    """AggregationClient.std — AggregationClient.java:675."""
    return _single(visible, family, qualifier, interpreter, lambda r: r["std"])


def agg_median(visible, family, qualifier, interpreter="long"):
    """AggregationClient.median — AggregationClient.java:778,796."""
    return _single(visible, family, qualifier, interpreter, lambda r: r["median"])


def row_count(visible: DataFrame) -> int:
    """AggregationClient.rowCount (AggregationClient.java:350) /
    RowCounter (mr/RowCounter.java:60): distinct row keys.  The
    reference injects FirstKeyOnlyFilter to avoid materializing values;
    count(distinct row) gives Catalyst the same shortcut via a
    partial-agg over the single pruned column."""
    return visible.select("row").distinct().count()
