from spark_glove_spark.sources.tables import table, write_parquet

__all__ = ["table", "write_parquet"]
