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
    cells: DataFrame,
    path: str,
    spec: Scan | None = None,
    *,
    raw: bool = True,
    format: str = "parquet",
    **kw,
) -> None:
    """Export cells (raw=True keeps tombstones+versions, like Export's
    raw mode) to a bulk layout.

    ``format``: 'parquet' (default — the pruned range layout) or an
    interchange format for foreign consumers, 'json' / 'csv' / 'orc'
    — the analog of Export's pluggable serialization (the reference
    writes SequenceFiles of Results).  Canonical cells carry string
    values, so interchange formats need no binary encoding; they skip
    the range layout (plain write; ORC keeps columnar stats for
    foreign engines that prune on them)."""
    spec = spec or Scan(raw=raw)
    out = scan(cells, spec)
    if format == "parquet":
        write_table(out, path, **kw)
    elif format == "json":
        out.write.mode(kw.get("mode", "overwrite")).json(path)
    elif format == "csv":
        out.write.mode(kw.get("mode", "overwrite")).option("header", True).csv(path)
    elif format == "orc":
        out.write.mode(kw.get("mode", "overwrite")).orc(path)
    else:
        raise ValueError(f"unknown export format {format!r}")


def import_table(
    spark: SparkSession,
    path: str,
    *,
    rename_families: dict[str, str] | None = None,
    format: str = "parquet",
) -> DataFrame:
    """mr/Import.java:88 — read an export back as a CellFrame, with
    optional family rename.  json/csv imports re-apply the cell schema
    (interchange formats erase types)."""
    from hbase_spark.model import cell_schema

    if format == "parquet":
        df = spark.read.parquet(path)
    elif format == "json":
        df = spark.read.schema(cell_schema()).json(path)
    elif format == "csv":
        df = spark.read.schema(cell_schema()).option("header", True).csv(path)
    elif format == "orc":
        df = spark.read.schema(cell_schema()).orc(path)
    else:
        raise ValueError(f"unknown import format {format!r}")
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
