"""Melt wide relational tables into the cell model.

This is the Spark analog of ImportTsv (mr/ImportTsv.java:75 — external
tabular data -> cells with a designated row key and optional
timestamp), used both as a real ingestion path and to build cell-layer
fixtures from the driver's TPC-H-ish parquet tables (FIXTURES.md §B).

The melt is defined so that the exact same cells are derivable in ANSI
SQL (see __spark_entry__.oracle_sql): values are rendered to strings
with engine-agnostic formatting (ints verbatim, timestamps as
'yyyy-MM-dd', doubles via a decimal cast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hbase_spark.model import CellType


def _render(df: DataFrame, col: str) -> F.Column:
    """Engine-portable string rendering of a column value."""
    dt = df.schema[col].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return F.date_format(F.col(col), "yyyy-MM-dd")
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        # double -> string formatting differs across engines; go through
        # a fixed-scale decimal so Spark and DuckDB render identically.
        return F.col(col).cast("decimal(18,2)").cast("string")
    return F.col(col).cast("string")


def melt_table(
    df: DataFrame,
    row_key: str,
    family: str,
    columns: list[str] | None = None,
    *,
    ts: int | str = 1,
    seq: int | str | None = None,
    key_width: int = 12,
) -> DataFrame:
    """Melt one wide row into one cell per non-key column.

    row = zero-padded string of ``row_key`` (preserves numeric order
    under lexicographic comparison, like OrderedBytes encodings —
    common/util/OrderedBytes.java:297), family = ``family``,
    qualifier = column name, value = portable string rendering.

    ``ts``/``seq`` may be a constant or a source column name (e.g. the
    event timestamp, giving multi-versioned cells per FIXTURES.md §B).
    """
    columns = columns or [c for c in df.columns if c != row_key]
    if isinstance(ts, int):
        ts_col = F.lit(int(ts)).cast("long")
    else:
        dt = df.schema[ts].dataType
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            # NTZ → TZ cast is value-preserving under the UTC session tz.
            ts_col = F.unix_millis(F.col(ts).cast("timestamp"))
        else:
            ts_col = F.col(ts).cast("long")

    if seq is None:
        seq_col = ts_col
    elif isinstance(seq, int):
        seq_col = F.lit(seq).cast("long")
    else:
        seq_col = F.col(seq).cast("long")

    pairs = []
    for c in columns:
        pairs.append(F.struct(F.lit(c).alias("q"), _render(df, c).alias("v")))
    exploded = df.select(
        F.lpad(F.col(row_key).cast("string"), key_width, "0").alias("row"),
        ts_col.alias("ts"),
        seq_col.alias("seq"),
        F.explode(F.array(*pairs)).alias("cell"),
    )
    return exploded.select(
        "row",
        F.lit(family).alias("family"),
        F.col("cell.q").alias("qualifier"),
        "ts",
        F.lit(CellType.PUT).alias("type"),
        F.col("cell.v").alias("value"),
        "seq",
    )


def assemble_rows(visible: DataFrame) -> DataFrame:
    """Row assembly — the Result.getMap analog (client/Result.java:595):
    one output row per row key with a nested
    ``map<family, map<qualifier, array<struct<ts, value>>>>``, versions
    newest-first.  Input must already be resolved/visible cells.

    Two hash aggregations keyed by progressively coarser keys — both
    map-side combinable; no window, no pivot inference pass.
    """
    per_col = visible.groupBy("row", "family", "qualifier").agg(
        F.reverse(
            F.array_sort(
                F.collect_list(F.struct(F.col("ts"), F.col("value")))
            )
        ).alias("versions")
    )
    per_family = per_col.groupBy("row", "family").agg(
        F.map_from_entries(
            F.collect_list(F.struct("qualifier", "versions"))
        ).alias("columns")
    )
    return per_family.groupBy("row").agg(
        F.map_from_entries(F.collect_list(F.struct("family", "columns"))).alias(
            "families"
        )
    )


def pivot_wide(
    visible: DataFrame,
    qualifiers: list[str],
    *,
    family: str | None = None,
) -> DataFrame:
    """Latest-version wide view: one column per qualifier (the inverse
    of melt_table for fixed schemas — SURVEY §1.6 "pivot to wide").

    Takes the qualifier list explicitly: ``DataFrame.pivot`` without
    values runs a distinct-inference job over the input first — an
    extra full pass at 100 TB.  Conditional max_by aggregation needs
    exactly one shuffle.
    """
    src = visible
    if family is not None:
        src = src.filter(F.col("family") == family)
    aggs = [
        F.max_by(
            F.when(F.col("qualifier") == q, F.col("value")),
            F.when(F.col("qualifier") == q, F.struct("ts", "seq")),
        ).alias(q)
        for q in qualifiers
    ]
    return src.groupBy("row").agg(*aggs)
