from chiv_spark.sources.catalog import TABLES, load_tables, read_table

__all__ = ["TABLES", "load_tables", "read_table"]
