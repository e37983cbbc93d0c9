from mr_py_spark.sources.catalog import TABLES, load, tbl

__all__ = ["TABLES", "load", "tbl"]
