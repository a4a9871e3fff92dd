"""Incremental backup / restore (SURVEY.md §2.10).

The reference's backup system (hbase-backup/.../BackupDriver.java:66)
takes a FULL backup (table snapshot) plus INCREMENTAL backups (the WAL
segments written since the previous backup), and restore = full image +
ordered WAL replay.  The Spark-native shape: the full image is a
range-partitioned parquet snapshot of the raw CellFrame; an incremental
segment is the slice of the mutation log with ``seq`` beyond the
previous high-water mark (the explicit ``seq`` column replaces WAL
offsets); restore unions the full image with every segment — tombstones
are data, so replay is a pure append and the restored table resolves
identically to the original.

Point-in-time restore = bounding the union by ``seq`` (the backup
analog of the mvccReadPoint).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_spark.sources.layout import read_table, write_table

# no leading underscore: Hadoop input formats treat _-prefixed paths as hidden
_MANIFEST = "backup-manifest"


def _manifest_path(backup_dir: str) -> str:
    return f"{backup_dir}/{_MANIFEST}.json"


def _read_manifest(spark: SparkSession, backup_dir: str) -> dict:
    try:
        rows = spark.read.text(_manifest_path(backup_dir)).collect()
        return json.loads("\n".join(r.value for r in rows))
    except Exception:  # noqa: BLE001 — no manifest yet
        return {"segments": [], "high_seq": None}


def _write_manifest(spark: SparkSession, backup_dir: str, manifest: dict) -> None:
    spark.createDataFrame([(json.dumps(manifest),)], "v string").coalesce(
        1
    ).write.mode("overwrite").text(_manifest_path(backup_dir))


def backup_full(
    cells: DataFrame, backup_dir: str, *, num_regions: int = 16
) -> dict:
    """FULL backup: bulk-layout snapshot of the raw CellFrame plus a
    manifest recording the seq high-water mark."""
    write_table(cells, f"{backup_dir}/full", num_regions=num_regions)
    high = cells.agg(F.max("seq")).collect()[0][0]
    manifest = {"segments": [], "high_seq": high}
    _write_manifest(cells.sparkSession, backup_dir, manifest)
    return manifest


def backup_incremental(cells: DataFrame, backup_dir: str) -> dict:
    """INCREMENTAL backup: append the mutation-log slice with
    ``seq > high_seq`` as a new segment and advance the mark."""
    spark = cells.sparkSession
    manifest = _read_manifest(spark, backup_dir)
    prev = manifest["high_seq"]
    if prev is None:
        raise ValueError("no full backup found — run backup_full first")
    seg = cells.filter(F.col("seq") > F.lit(prev))
    high = seg.agg(F.max("seq")).collect()[0][0]
    if high is None:
        return manifest  # nothing new since the last backup
    seg_name = f"incr_{len(manifest['segments']):05d}"
    seg.write.mode("overwrite").parquet(f"{backup_dir}/{seg_name}")
    manifest["segments"].append(seg_name)
    manifest["high_seq"] = high
    _write_manifest(spark, backup_dir, manifest)
    return manifest


def restore(
    spark: SparkSession, backup_dir: str, *, to_seq: int | None = None
) -> DataFrame:
    """Restore = full image + ordered segment replay (pure union —
    tombstones included).  ``to_seq`` gives point-in-time restore."""
    manifest = _read_manifest(spark, backup_dir)
    out = read_table(spark, f"{backup_dir}/full")
    for seg in manifest["segments"]:
        out = out.unionByName(spark.read.parquet(f"{backup_dir}/{seg}"))
    if to_seq is not None:
        out = out.filter(F.col("seq") <= F.lit(to_seq))
    return out
