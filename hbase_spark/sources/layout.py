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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Pre-split algorithms (server/util/RegionSplitter.java:148) — deterministic
# region boundaries computed from the key space, not from data.  At 100 TB
# this matters: ``repartitionByRange`` runs a sampling pass over the input
# to pick boundaries; a pre-split assigns each cell its region with pure
# arithmetic, no extra scan, and boundaries stay stable across loads
# (so incremental bulk loads land in the same file ranges).
# ---------------------------------------------------------------------------


def hex_split_points(num_regions: int, width: int = 8) -> list[str]:
    """HexStringSplit (RegionSplitter.java:825): evenly divide the
    space of ``width``-digit lowercase hex keys."""
    space = 16**width
    return [
        format(space * i // num_regions, f"0{width}x")
        for i in range(1, num_regions)
    ]


def decimal_split_points(num_regions: int, width: int = 8) -> list[str]:
    """DecimalStringSplit (RegionSplitter.java:842): evenly divide
    ``width``-digit decimal keys."""
    space = 10**width
    return [
        str(space * i // num_regions).zfill(width) for i in range(1, num_regions)
    ]


def region_id(
    row: Column, num_regions: int, *, algo: str = "hex", width: int = 8
) -> Column:
    """The region a key belongs to under a pre-split — constant
    arithmetic on the key prefix, evaluated JVM-side with no shuffle
    of its own.  algo='hex' assumes hex-string keys
    (HexStringSplit), 'decimal' zero-padded decimal keys
    (DecimalStringSplit), 'uniform' raw binary keys (UniformSplit
    RegionSplitter.java:1048 — first 4 bytes as an unsigned int)."""
    if algo == "hex":
        v = F.conv(F.substring(row, 1, width), 16, 10).cast("decimal(38,0)")
        space = 16**width
    elif algo == "decimal":
        v = F.substring(row, 1, width).cast("decimal(38,0)")
        space = 10**width
    elif algo == "uniform":
        v = F.conv(F.hex(F.substring(row, 1, 4)), 16, 10).cast("decimal(38,0)")
        space = 2**32
    else:
        raise ValueError(f"unknown split algo {algo!r}")
    # exact integer floor-division: decimal `/` rounds at scale 6, which
    # misassigns keys near boundaries — subtract pmod first so the
    # division is exact
    space_lit = F.lit(str(space)).cast("decimal(38,0)")
    num = v * num_regions
    rid = ((num - F.pmod(num, space_lit)) / space_lit).cast("int")
    return F.least(rid, F.lit(num_regions - 1))


def write_table(
    cells: DataFrame,
    path: str,
    *,
    num_regions: int = 32,
    by_family: bool = True,
    mode: str = "overwrite",
    split_algo: str | None = None,
    split_width: int = 8,
    split_points: list | None = None,
) -> None:
    """Bulk-load a CellFrame to a range-partitioned, sorted parquet layout.

    Default boundaries come from ``repartitionByRange`` (a sampling
    pass); pass ``split_algo`` for a deterministic pre-split with no
    sampling scan (see region_id above), or ``split_points`` for
    user-chosen boundaries (the shell's ``SPLITS =>`` /
    RegionSplitter custom-split analog: N points -> N+1 regions,
    region i holds rows in [points[i-1], points[i])).  Pre-split
    files group whole regions (hash placement may co-locate two
    regions in one file); each file still covers a bounded, sorted
    key set, so parquet min/max pruning applies — trade a little
    pruning precision for zero sampling cost and stable boundaries
    across incremental loads.
    """
    if split_points is not None:
        pts = sorted(split_points)
        # region id = number of split points <= row (a searchsorted
        # over a literal array — no sampling pass, stable boundaries).
        # The id becomes a PHYSICAL partition dir, so declared regions
        # map 1:1 to directories: directory-level partition pruning on
        # top of per-file min/max, deterministic in one write job.
        rid = F.size(
            F.filter(
                F.array(*[F.lit(p) for p in pts]),
                lambda p: p <= F.col("row"),
            )
        )
        out = cells.withColumn("_region", rid).repartition(
            len(pts) + 1, F.col("_region")
        )
        out = out.sortWithinPartitions(
            "row", "family", "qualifier", F.col("ts").desc(),
            F.col("seq").desc()
        )
        writer = (
            out.write.mode(mode)
            .option("parquet.bloom.filter.enabled#row", "true")
            .option("parquet.bloom.filter.expected.ndv#row", "1000000")
        )
        writer = writer.partitionBy(
            *((["family"] if by_family else []) + ["_region"])
        )
        writer.parquet(path)
        return
    if split_algo is not None:
        rid = region_id(
            F.col("row"), num_regions, algo=split_algo, width=split_width
        )
        out = cells.repartition(num_regions, rid)
    else:
        out = cells.repartitionByRange(num_regions, "row")
    out = out.sortWithinPartitions(
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
    directly, no servers).  Layouts written with explicit
    ``split_points`` carry a ``_region`` partition dir; it is dropped
    from the schema (its pruning value lives in the directory
    structure, not the rows).

    An EMPTY layout written through ``partitionBy`` has no part files
    at all (partition dirs only materialize per value), so schema
    inference fails — that is a valid state (compacting or balancing
    an empty table), read as an empty CellFrame."""
    from pyspark.errors.exceptions.captured import AnalysisException

    from hbase_spark.model import cell_schema

    try:
        df = spark.read.parquet(path)
    except AnalysisException as e:
        if "UNABLE_TO_INFER_SCHEMA" in str(e):
            return spark.createDataFrame([], schema=cell_schema())
        raise
    return df.drop("_region") if "_region" in df.columns else df


def write_bucketed(
    cells: DataFrame,
    table_name: str,
    *,
    num_buckets: int = 32,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Catalog-registered BUCKETED layout: ``bucketBy(row)`` +
    ``sortBy`` into a managed table, so Spark *knows* the partitioning.

    This is the co-located-join story at 100 TB: every row-keyed
    operation on a bucketed CellFrame — snapshot resolution's version
    cap, SyncTable's diff join between two bucketed tables, multi-get
    semi-joins — reuses the bucket partitioning instead of shuffling
    the table (the plan shows NO Exchange under the aggregation; guard
    in tests/test_plans.py).  The range layout (`write_table`) remains
    the scan-pruning store; bucketed tables are the join-heavy
    deployment's variant, exactly like keeping HBase regions aligned
    across tables for coprocessor-local joins.

    The sort spec is the HFile invariant itself — cells ordered by
    (row, family, qualifier, ts, seq) inside each store file — and the
    pre-write ``repartition(num_buckets, row)`` (the same hash the
    bucket spec uses) leaves exactly ONE file per bucket, which is the
    condition under which Spark's scan also reports the sort ORDER
    (``spark.sql.legacy.bucketedTableScan.outputOrdering``, set by
    ``get_spark``).  Snapshot resolution's per-cell max_by is a
    sort-based aggregation (struct buffers are not hash-aggregable),
    so on this layout it runs with NO Exchange and NO Sort — one
    stage, the plan the reference gets for free from the LSM order.
    ``path`` makes the table external (bulk-load layouts live outside
    the warehouse and are re-registered per session by
    ``read_bucketed_path``).  Sizing: pick ``num_buckets`` for
    0.5-1 GB per bucket file at the target scale, exactly like
    ``write_table``'s num_regions."""
    out = cells.repartition(num_buckets, F.col("row"))
    writer = (
        out.write.mode(mode)
        .bucketBy(num_buckets, "row")
        .sortBy("row", "family", "qualifier", "ts", "seq")
        .option("parquet.bloom.filter.enabled#row", "true")
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed CellFrame with its bucket spec attached."""
    return spark.table(table_name)


def read_bucketed_path(
    spark: SparkSession,
    path: str,
    table_name: str,
    *,
    num_buckets: int = 32,
) -> DataFrame:
    """Attach an on-disk bucketed layout (written by ``write_bucketed``
    with ``path=``) to THIS session's catalog, so a fresh process reads
    it with the bucket spec and sort order intact — the session-local
    analog of opening a snapshot's manifest.  No data IO beyond one
    parquet footer for the schema."""
    if not spark.catalog.tableExists(table_name):
        schema = spark.read.parquet(path).schema
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema
        )
        spark.sql(
            f"CREATE TABLE `{table_name}` ({cols}) USING parquet "
            f"CLUSTERED BY (row) "
            f"SORTED BY (row, family, qualifier, ts, seq) "
            f"INTO {num_buckets} BUCKETS LOCATION '{path}'"
        )
    return spark.table(table_name)
