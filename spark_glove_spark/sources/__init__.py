from spark_glove_spark.sources.tables import parallelized, table, write_parquet

__all__ = ["parallelized", "table", "write_parquet"]
