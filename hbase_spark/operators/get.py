"""Point reads — client/Get.java:65 and the multi-get batch path
(client/Table.java:156,176).

A Get is a single-row Scan (the reference literally converts it,
rs/HRegion.java get -> Scan); a multi-get over a key list is a
broadcast semi-join (SURVEY.md §2.2) so the big table is never
shuffled — the Spark analog of fanning RPCs to only the regions
holding the keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbase_spark.operators.scan import Scan, scan


def get(
    cells: DataFrame, row_key, *, single_version: bool = False, **scan_kwargs
) -> DataFrame:
    """Fetch one row (client/Table.java:156)."""
    spec = Scan(
        start_row=row_key, stop_row=row_key, stop_inclusive=True, **scan_kwargs
    )
    return scan(cells, spec, single_version=single_version)


# Below this size a literal IN-list beats any join: Catalyst pushes
# In(row, [...]) into the parquet scan, so row-group stats + the row
# bloom filter prune before any data moves — the exact analog of the
# reference fanning point-Gets to only the regions holding the keys.
_ISIN_MAX = 1000


def multi_get(
    cells: DataFrame,
    row_keys: list,
    *,
    single_version: bool = False,
    **scan_kwargs,
) -> DataFrame:
    """Batch point reads (client/Table.java:176).

    Small batches become a pushed-down IN predicate (file/row-group
    pruning, zero shuffle); large batches a broadcast semi-join.
    ``single_version`` is the resolve-is-identity caller contract
    (operators.resolve.resolve)."""
    if len(row_keys) <= _ISIN_MAX:
        narrowed = cells.filter(F.col("row").isin(list(row_keys)))
    else:
        spark = cells.sparkSession
        keys = spark.createDataFrame([(k,) for k in row_keys], ["row"])
        # NO coalesce(1) here: a literal frame is a LocalTableScan and
        # broadcasts driver-side with zero jobs; wrapping it in a
        # Repartition forces a real job before the broadcast (measured
        # 3-5x on the batched-query arms, round 10)
        narrowed = cells.join(F.broadcast(keys), "row", "left_semi")
    return scan(narrowed, Scan(**scan_kwargs), single_version=single_version)


def exists(cells: DataFrame, row_key) -> bool:
    """client/Table.java:91 — existence check without value transfer."""
    return get(cells, row_key).select("row").limit(1).count() > 0
