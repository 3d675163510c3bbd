"""Salted-join correctness + scatter property (functions/skew.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_glove_spark.functions.skew import salted_join


def _skewed_frames(spark):
    # 90% of fact rows share one hot key
    fact = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
    )
    return fact, dim


def test_salted_join_matches_plain_join(spark):
    fact, dim = _skewed_frames(spark)
    plain = fact.join(dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    salted = salted_join(fact, dim, "k", n_salts=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched_big_rows(spark):
    fact, dim = _skewed_frames(spark)
    fact = fact.withColumn("k", F.col("k") + 90)  # half the keys miss the dim
    plain = fact.join(dim, "k", "left")
    salted = salted_join(fact, dim, "k", n_salts=4, how="left")
    assert plain.count() == salted.count()
    assert (
        plain.where(F.col("name").isNull()).count()
        == salted.where(F.col("name").isNull()).count()
    )


def test_hot_key_scatters_across_salts(spark):
    fact, dim = _skewed_frames(spark)
    from spark_glove_spark.functions.skew import _SALT

    salted = fact.withColumn(_SALT, (F.rand(42) * 8).cast("int"))
    per_salt = (
        salted.where(F.col("k") == 7)
        .groupBy(_SALT)
        .count()
        .collect()
    )
    assert len(per_salt) == 8, "hot key did not reach all salt buckets"
    counts = [r["count"] for r in per_salt]
    assert max(counts) < 3 * min(counts), f"salt distribution skewed: {counts}"
