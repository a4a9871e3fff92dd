"""Physical table layout: the Spark analog of HBase's region × store
file organization and bulk load (SURVEY.md §2.1, §4.1).

- Bulk load (mr/HFileOutputFormat2.java + BulkLoadHFilesTool.java:120):
  sort + write store files, atomically adopt.  Spark-native:
  ``repartitionByRange(row).sortWithinPartitions(...).write`` — each
  output file covers a disjoint key range (a "region"), files are
  internally sorted, and parquet min/max stats on ``row`` give the
  same file-pruning the reference gets from HFile key ranges
  (StoreFileReader.java:434 passesKeyRangeFilter).
- Bloom filters on ``row`` replicate BLOOMFILTER=ROW
  (StoreFileReader.java:224) via parquet bloom filters.
- ``partitionBy(family)`` mirrors one HStore per column family
  (rs/HStore.java:135): family projection prunes whole directories.

At 100 TB: pick ``num_regions`` so each file is 0.5–1 GB; scans with
row-range predicates then touch only the overlapping files — the same
scaling story as region pruning, with no region servers to run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_table(
    cells: DataFrame,
    path: str,
    *,
    num_regions: int = 32,
    by_family: bool = True,
    mode: str = "overwrite",
) -> None:
    """Bulk-load a CellFrame to a range-partitioned, sorted parquet layout."""
    out = cells.repartitionByRange(num_regions, "row").sortWithinPartitions(
        "row", "family", "qualifier", F.col("ts").desc(), F.col("seq").desc()
    )
    writer = (
        out.write.mode(mode)
        .option("parquet.bloom.filter.enabled#row", "true")
        .option("parquet.bloom.filter.expected.ndv#row", "1000000")
    )
    if by_family:
        writer = writer.partitionBy("family")
    writer.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a bulk-loaded CellFrame layout (TableSnapshotInputFormat
    analog — mr/TableSnapshotInputFormat.java:84: scan the files
    directly, no servers)."""
    return spark.read.parquet(path)
