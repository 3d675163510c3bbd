from spark_glove_spark.sources.tables import (
    parallelized,
    scalar_bounds,
    table,
    write_parquet,
)

__all__ = ["parallelized", "scalar_bounds", "table", "write_parquet"]
