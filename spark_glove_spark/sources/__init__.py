from spark_glove_spark.sources.tables import table

__all__ = ["table"]
