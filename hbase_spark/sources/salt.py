"""Key salting — the standard HBase hot-key prefix pattern, and Spark's
skew mitigation, in one helper (SURVEY.md §4.1 / §7.2 phase 6).

Monotonic row keys (timestamps, sequence ids) hotspot a single region
in the reference and a single partition/task here.  The fix is the
same in both worlds: prefix the key with a small deterministic salt
bucket so writes and shuffles spread across ``buckets`` groups, and
fan a range scan out to one sub-range per bucket.

The salt is ``pmod(xxhash64(row), buckets)`` rendered as a fixed-width
decimal prefix, so salting is stable (the same row always lands in the
same bucket — required for point reads) and the salted table still
sorts by (bucket, row) — range scans stay file-prunable within each
bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WIDTH = 2  # up to 100 buckets; widen if you need more


def salt_of(row: Column, buckets: int) -> Column:
    """The bucket a key belongs to — deterministic, JVM-side."""
    return F.pmod(F.xxhash64(row), F.lit(buckets))


def salted_key(row: Column, buckets: int) -> Column:
    """Prefix the key with its zero-padded salt bucket."""
    return F.concat(F.lpad(salt_of(row, buckets).cast("string"), _WIDTH, "0"), row)


def unsalted_key(row: Column) -> Column:
    """Strip the salt prefix back off."""
    return F.substring(row, _WIDTH + 1, 2_147_483_647)


def salt_cells(cells: DataFrame, buckets: int) -> DataFrame:
    """Rewrite a CellFrame's row keys to salted form (bulk-load side)."""
    return cells.withColumn("row", salted_key(F.col("row"), buckets))


def unsalt_cells(cells: DataFrame) -> DataFrame:
    return cells.withColumn("row", unsalted_key(F.col("row")))


def salted_range_pred(start: str | None, stop: str | None, buckets: int) -> Column:
    """A range scan over a salted table = OR of one sub-range per
    bucket ([salt+start, salt+stop) for every salt) — each sub-range
    prunes independently against file min/max, exactly the multi-range
    scan the reference's salted-table clients issue."""
    preds = []
    for b in range(buckets):
        prefix = str(b).zfill(_WIDTH)
        # Lower bound is always at least the bucket prefix itself — without
        # it an open-start scan would admit every row of every lower bucket
        # (their keys sort below ``prefix + stop`` regardless of unsalted key).
        lo = prefix + start if start is not None else prefix
        pred = F.col("row") >= F.lit(lo)
        if stop is not None:
            # prefix+stop also upper-bounds the bucket: any higher bucket's
            # keys compare greater on the prefix digits alone.
            pred = pred & (F.col("row") < F.lit(prefix + stop))
        else:
            pred = pred & F.col("row").startswith(prefix)
        preds.append(pred)
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def salted_point_pred(row_key: str, buckets: int) -> Column:
    """A point read needs only ONE bucket — recompute the salt for the
    key and look in that bucket alone (no fan-out)."""
    return (
        F.col("row")
        == F.concat(
            F.lpad(
                F.pmod(F.xxhash64(F.lit(row_key)), F.lit(buckets)).cast("string"),
                _WIDTH,
                "0",
            ),
            F.lit(row_key),
        )
    )
