"""Engine facade: importing this module registers every declared query.

``__spark_entry__.py`` (the driver contract) delegates here.
"""

from __future__ import annotations

# Importing the operator modules populates the registry (side-effect
# imports are deliberate — each module registers its declared queries).
import spark_glove_spark.operators.analytics  # noqa: F401
import spark_glove_spark.operators.ann  # noqa: F401
import spark_glove_spark.operators.arrow_queries  # noqa: F401
import spark_glove_spark.operators.avro_queries  # noqa: F401
import spark_glove_spark.operators.bpe  # noqa: F401
import spark_glove_spark.operators.clustering  # noqa: F401
import spark_glove_spark.operators.dedup  # noqa: F401
import spark_glove_spark.operators.embeddings  # noqa: F401
import spark_glove_spark.operators.glove_queries  # noqa: F401
import spark_glove_spark.operators.graph  # noqa: F401
import spark_glove_spark.operators.graph_analytics  # noqa: F401
import spark_glove_spark.operators.io_udfs  # noqa: F401
import spark_glove_spark.operators.multimodal  # noqa: F401
import spark_glove_spark.operators.pipeline  # noqa: F401
import spark_glove_spark.operators.pydatasource  # noqa: F401
import spark_glove_spark.operators.relational  # noqa: F401
import spark_glove_spark.operators.scale_ops  # noqa: F401
import spark_glove_spark.operators.statml  # noqa: F401
import spark_glove_spark.operators.temporal  # noqa: F401
import spark_glove_spark.operators.scalar_queries  # noqa: F401
import spark_glove_spark.operators.text_analysis  # noqa: F401
import spark_glove_spark.operators.text_queries  # noqa: F401
import spark_glove_spark.operators.tpch  # noqa: F401

import spark_glove_spark.streaming.queries  # noqa: F401

from spark_glove_spark.registry import (  # noqa: F401
    DRIVER_PRIORITY,
    DRIVER_WINDOW,
    REGISTRY,
    driver_oracle_sql,
    driver_queries,
    oracle_sql,
    original_name,
    queries,
)

__all__ = [
    "DRIVER_PRIORITY",
    "DRIVER_WINDOW",
    "REGISTRY",
    "queries",
    "oracle_sql",
    "driver_queries",
    "driver_oracle_sql",
    "original_name",
]
