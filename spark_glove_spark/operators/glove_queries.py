"""Declared queries for the GloVe training surface (H5/H6).

Training is iterative + seeded-random — not SQL-expressible — so these
are rows-only to the driver (SURVEY.md §5.2); the real correctness
teeth are the property tests in tests/test_glove.py (monotone loss,
determinism, shapes).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_glove_spark.glove import Glove
from spark_glove_spark.registry import query
from spark_glove_spark.sources import table

_FIT_KW = dict(dim=8, window=5, min_count=5, iterations=3, seed=42, blocks=8)

# h5 and h6 both need the same deterministic fit; cache one model per
# (session, sf_dir) so a sequential correctness sweep pays for training
# once, not twice. Seeded fit ⇒ the cache changes cost, not results.
_FIT_CACHE: dict[tuple[str, str], object] = {}


def _fitted(spark: SparkSession, sf_dir: str) -> "Glove.Model":
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _FIT_CACHE:
        _FIT_CACHE[key] = Glove(**_FIT_KW).fit(table(spark, sf_dir, "documents"))
    return _FIT_CACHE[key]


@query("h5_glove_fit", section="H5,J4,J5")
def h5_glove_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5: end-to-end distributed GloVe fit (3 iterations, dim 8) on the

    corpus; returns word → W+W̃ vector, rounded for stable hashing and
    comma-joined to a flat string (driver comparator can't hash lists).
    Row count == vocab size; schema fixed."""
    model = _fitted(spark, sf_dir)
    return model.vectors.select(
        "word",
        "id",
        F.concat_ws(
            ",",
            F.transform("vector", lambda v: F.round(v, 6).cast("string")),
        ).alias("vector"),
    )


@query("h6_model_export_roundtrip", section="H6,A3")
def h6_model_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6+A3: fit → write model parquet → read back (sink/source

    round-trip); returns per-word vector norms from the re-read copy."""
    model = _fitted(spark, sf_dir)
    out = os.path.join(tempfile.gettempdir(), "spark_glove_model_export")
    model.vectors.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    norm = F.sqrt(
        F.aggregate("vector", F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return back.select("word", F.round(norm, 4).alias("vector_norm"))
