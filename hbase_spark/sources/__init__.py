from hbase_spark.sources.melt import melt_table

__all__ = ["melt_table"]
