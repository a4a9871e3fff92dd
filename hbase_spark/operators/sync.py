"""Table diff / repair — HashTable + SyncTable and VerifyReplication
(SURVEY.md §2.7).

The reference detects divergence between two tables with a
hierarchical hash comparison (mr/HashTable.java:64) and then walks
mismatched ranges cell-by-cell to diff/repair (mr/SyncTable.java:64);
VerifyReplication (mr/replication/VerifyReplication.java) is the same
compare for replication peers.

In Spark the hierarchical-hash dance (built to avoid shipping whole
tables over RPC) collapses into a full-outer join on the cell key +
hash compare — shuffles are the engine's job.  We still expose a
``hash_ranges`` step because comparing range digests FIRST is the
right 100 TB strategy: two 50 TB tables that are 99.99% identical
produce a tiny mismatched-range list, and only those ranges join
cell-level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY = ["row", "family", "qualifier", "ts"]


def hash_ranges(cells: DataFrame, *, buckets: int = 1024) -> DataFrame:
    """HashTable analog: one digest per row-key bucket.

    Deterministic: xor of per-cell hashes is order-independent, so it
    needs no sort — one map-side-combinable aggregation.
    """
    bucket = F.pmod(F.xxhash64("row"), F.lit(buckets))
    return (
        cells.groupBy(bucket.alias("bucket"))
        .agg(
            # xor-fold via sum of (hash bit-mixed) is not xor; use
            # bit_xor aggregate for an order-independent digest
            F.expr(
                "bit_xor(xxhash64(row, family, qualifier, ts, type, value))"
            ).alias("digest"),
            F.count("*").alias("cells"),
        )
    )


def diff_buckets(source: DataFrame, target: DataFrame, *, buckets: int = 1024) -> DataFrame:
    """Bucket digests that differ between two tables (cheap first pass)."""
    a = hash_ranges(source, buckets=buckets).withColumnRenamed("digest", "src_digest").withColumnRenamed("cells", "src_cells")
    b = hash_ranges(target, buckets=buckets).withColumnRenamed("digest", "tgt_digest").withColumnRenamed("cells", "tgt_cells")
    return a.join(b, "bucket", "full_outer").filter(
        ~(F.col("src_digest").eqNullSafe(F.col("tgt_digest")))
    )


def sync_diff(source: DataFrame, target: DataFrame) -> DataFrame:
    """SyncTable's cell-level diff: full-outer join on the cell key.

    Output: one record per divergent cell with change kind
    ``only_in_source`` / ``only_in_target`` / ``value_mismatch``.
    """
    s = source.select(
        *_KEY, F.col("type").alias("src_type"), F.col("value").alias("src_value")
    )
    t = target.select(
        *_KEY, F.col("type").alias("tgt_type"), F.col("value").alias("tgt_value")
    )
    joined = s.join(t, _KEY, "full_outer")
    kind = (
        F.when(F.col("tgt_type").isNull(), F.lit("only_in_source"))
        .when(F.col("src_type").isNull(), F.lit("only_in_target"))
        .when(
            ~(
                F.col("src_value").eqNullSafe(F.col("tgt_value"))
                & (F.col("src_type") == F.col("tgt_type"))
            ),
            F.lit("value_mismatch"),
        )
        .otherwise(F.lit(None))
    )
    return joined.withColumn("kind", kind).filter(F.col("kind").isNotNull())


def sync_repair(source: DataFrame, target: DataFrame) -> DataFrame:
    """Make target's visible content match source (SyncTable --doPuts/
    --doDeletes): returns the repaired target CellFrame — source cells
    adopted for mismatches, target-only cells dropped."""
    d = sync_diff(source, target)
    drop = d.filter(F.col("kind") == "only_in_target").select(*_KEY)
    add = d.filter(F.col("kind") != "only_in_target").select(*_KEY)
    kept = target.join(drop, _KEY, "left_anti")
    adopted = source.join(add, _KEY, "left_semi")
    # value_mismatch rows exist in both; drop target's version first
    kept = kept.join(add, _KEY, "left_anti")
    return kept.unionByName(adopted.select(*target.columns))


def verify_replication(source: DataFrame, peer: DataFrame) -> DataFrame:
    """VerifyReplication: GOODROWS / BADROWS style summary per kind."""
    return sync_diff(source, peer).groupBy("kind").agg(F.count("*").alias("cells"))
