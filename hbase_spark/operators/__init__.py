from hbase_spark.operators.resolve import resolve

__all__ = ["resolve"]
