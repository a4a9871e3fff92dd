"""Export / Import / CopyTable (SURVEY.md §2.1).

- Export (mr/Export.java:43): table -> files, honoring a scan spec
  (filter / time range / versions).  Import (mr/Import.java:88) reads
  back, with optional family rename (Import's CF-rename feature).
- CopyTable (mr/CopyTable.java:55): table -> table with optional
  renamed families and a time window.

All are thin compositions of scan + write — already parallel
(the reference needed a coprocessor endpoint variant for that,
endpoint/coprocessor/Export.java).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_spark.operators.scan import Scan, scan
from hbase_spark.sources.layout import write_table


def export_table(
    cells: DataFrame, path: str, spec: Scan | None = None, *, raw: bool = True, **kw
) -> None:
    """Export cells (raw=True keeps tombstones+versions, like Export's
    raw mode) to a bulk layout."""
    spec = spec or Scan(raw=raw)
    write_table(scan(cells, spec), path, **kw)


def import_table(
    spark: SparkSession, path: str, *, rename_families: dict[str, str] | None = None
) -> DataFrame:
    df = spark.read.parquet(path)
    if rename_families:
        mapping = F.col("family")
        for old, new in rename_families.items():
            mapping = F.when(F.col("family") == old, F.lit(new)).otherwise(mapping)
        df = df.withColumn("family", mapping)
    return df


def copy_table(
    cells: DataFrame,
    *,
    rename_families: dict[str, str] | None = None,
    time_range: tuple | None = None,
    raw: bool = True,
) -> DataFrame:
    out = scan(cells, Scan(raw=raw, time_range=time_range))
    if rename_families:
        mapping = F.col("family")
        for old, new in rename_families.items():
            mapping = F.when(F.col("family") == old, F.lit(new)).otherwise(mapping)
        out = out.withColumn("family", mapping)
    return out
