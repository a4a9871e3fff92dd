"""ImportTsv — delimited text -> cells (mr/ImportTsv.java:75).

Column spec mirrors the reference: a list like
``["HBASE_ROW_KEY", "f:q1", "f:q2", "HBASE_TS_KEY"]`` where
``HBASE_ROW_KEY`` marks the row-key column, ``HBASE_TS_KEY`` an
optional per-row timestamp column, and ``family:qualifier`` maps a
field to a cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_spark.model import CellType

ROW_KEY = "HBASE_ROW_KEY"
TS_KEY = "HBASE_TS_KEY"


def import_tsv(
    spark: SparkSession,
    path: str,
    columns: list[str],
    *,
    sep: str = "\t",
    ts: int = 1,
    seq: int = 0,
    header: bool = False,
) -> DataFrame:
    """Read a delimited file and melt it into a CellFrame."""
    df = spark.read.csv(path, sep=sep, header=header, inferSchema=False)
    src = df.columns
    if len(columns) != len(src):
        raise ValueError(f"spec has {len(columns)} columns, file has {len(src)}")
    try:
        row_idx = columns.index(ROW_KEY)
    except ValueError:
        raise ValueError(f"column spec must include {ROW_KEY}") from None
    ts_col = (
        F.col(src[columns.index(TS_KEY)]).cast("long")
        if TS_KEY in columns
        else F.lit(ts).cast("long")
    )
    pairs = []
    for spec, col in zip(columns, src):
        if spec in (ROW_KEY, TS_KEY):
            continue
        fam, _, qual = spec.partition(":")
        pairs.append(
            F.struct(
                F.lit(fam).alias("f"), F.lit(qual).alias("q"), F.col(col).alias("v")
            )
        )
    return (
        df.select(
            F.col(src[row_idx]).alias("row"),
            ts_col.alias("ts"),
            F.explode(F.array(*pairs)).alias("c"),
        )
        .select(
            "row",
            F.col("c.f").alias("family"),
            F.col("c.q").alias("qualifier"),
            "ts",
            F.lit(CellType.PUT).alias("type"),
            F.col("c.v").alias("value"),
            F.lit(seq).cast("long").alias("seq"),
        )
    )
