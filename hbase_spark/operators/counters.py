"""Counting jobs: RowCounter and CellCounter (SURVEY.md §2.6).

- RowCounter (mr/RowCounter.java:60): rows in a scan range, with
  optional filter — counter ``ROWS``.
- CellCounter (mr/CellCounter.java:73, counters :91-92,139-140,175):
  grouped counts — total rows, total cells, cells per CF, cells per
  (row, qualifier), versions per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_counter(visible: DataFrame) -> int:
    return visible.select("row").distinct().count()


def cell_counter(visible: DataFrame) -> dict[str, DataFrame]:
    """All CellCounter groupings as DataFrames (lazy; caller collects)."""
    return {
        "total_cells": visible.groupBy().agg(F.count("*").alias("cells")),
        "total_rows": visible.agg(
            F.countDistinct("row").alias("rows")
        ),
        "cells_per_family": visible.groupBy("family").agg(
            F.count("*").alias("cells")
        ),
        "cells_per_qualifier": visible.groupBy("family", "qualifier").agg(
            F.count("*").alias("cells")
        ),
        "versions_per_column": visible.groupBy("row", "family", "qualifier").agg(
            F.count("*").alias("versions")
        ),
    }
