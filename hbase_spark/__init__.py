"""hbase_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Apache HBase (reference: Apache9/hbase).

Architecture (see SURVEY.md):

- **Cell layer**: the canonical representation is a *CellFrame* — a plain
  DataFrame with columns ``(row, family, qualifier, ts, type, value, seq)``
  mirroring HBase's Cell 5-tuple + type tag
  (reference: hbase-common/.../Cell.java:60).  Deletes are data
  (tombstones); reads resolve them via :func:`hbase_spark.operators.resolve`.
- **Frame layer**: wide, typed DataFrames for OLAP and LLM-data-pipeline
  operators (dedup, similarity search, text analysis) built on top.

Everything is DataFrame/SQL-first: Catalyst handles pruning, pushdown and
join strategy; custom work is library-level transformations only.
"""

from hbase_spark.admin import Admin
from hbase_spark.model import CELL_COLUMNS, CellType, cell_schema
from hbase_spark.operators.resolve import compact, resolve
from hbase_spark.operators.scan import Scan
from hbase_spark.table import FamilyDescriptor, NoSuchColumnFamilyError, Table

__all__ = [
    "Admin",
    "NoSuchColumnFamilyError",
    "CELL_COLUMNS",
    "CellType",
    "FamilyDescriptor",
    "Scan",
    "Table",
    "cell_schema",
    "compact",
    "resolve",
]

__version__ = "0.1.0"
