"""Custom Python data source (SURVEY.md §2.A extension — Spark 4's
``pyspark.sql.datasource`` API, public).

A real columnar SOURCE, not a DataFrame wrapper: the engine asks the
reader for its partitions, ships one ``InputPartition`` per task, and
each task yields Arrow RecordBatches — so generation is distributed,
vectorized (numpy -> Arrow, no per-row Python), and scales with the
requested partition count exactly like a file-based source scales
with splits. This is the extension point for bespoke feeds at 100 TB
(internal services, proprietary formats, synthetic load) when no
built-in connector exists.

The synthetic stream is a deterministic integer sequence with a
Knuth-multiplicative-hash amount column, so the WHOLE source —
including its partitioning — is oracle-checkable: DuckDB regenerates
it from ``range()`` with the same closed-form arithmetic, and the
hash compare proves partition slicing neither drops nor duplicates
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_glove_spark.registry import query

_N = 50_000
_PARTS = 8
_KNUTH = 2654435761  # 2^32 / golden ratio; amounts stay < 2^32


def _register(spark: SparkSession) -> None:
    # Imports live inside so merely importing this module (registry
    # population) never touches the datasource machinery.
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class SyntheticEventsReader(DataSourceReader):
        def __init__(self, options: dict) -> None:
            self.n = int(options.get("n", _N))
            self.parts = int(options.get("partitions", _PARTS))

        def partitions(self):  # noqa: D102 — API hook
            step = -(-self.n // self.parts)
            return [
                InputPartition((lo, min(lo + step, self.n)))
                for lo in range(0, self.n, step)
            ]

        def read(self, partition):  # noqa: D102 — API hook
            import numpy as np
            import pyarrow as pa

            lo, hi = partition.value
            ids = np.arange(lo, hi, dtype=np.int64)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids),
                    pa.array((ids % 16).astype(np.int32)),
                    pa.array((ids * _KNUTH) % (1 << 32)),
                ],
                names=["id", "bucket", "amount"],
            )

    class SyntheticEventsDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "synthetic_events"

        def schema(self) -> str:
            return "id BIGINT, bucket INT, amount BIGINT"

        def reader(self, schema):  # noqa: D102 — API hook
            return SyntheticEventsReader(self.options)

    spark.dataSource.register(SyntheticEventsDataSource)


@query(
    "a10_python_datasource",
    section="A1,A4,D1",
    tags=("source",),
    oracle=f"""
SELECT CAST(i % 16 AS INT) AS bucket,
       count(*) AS n,
       CAST(sum((i * {_KNUTH}) % 4294967296) AS BIGINT) AS amount_sum
FROM range(0, {_N}) t(i)
GROUP BY 1
""",
)
def a10_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-and-aggregate over the custom ``synthetic_events`` Python
    data source: 8 input partitions generated task-side as Arrow
    batches flow through an ordinary hash aggregate. The oracle
    regenerates the identical rows from DuckDB ``range()`` — a full
    value-hash proof that the source's partition slicing is exact
    (no dropped/duplicated rows at the split boundaries).
    """
    _register(spark)
    src = (
        spark.read.format("synthetic_events")
        .option("n", _N)
        .option("partitions", _PARTS)
        .load()
    )
    return src.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("amount").alias("amount_sum"),
    )


def _register_stream(spark: SparkSession) -> None:
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    class SyntheticStreamReader(SimpleDataSourceStreamReader):
        """Offset = rows emitted so far; each micro-batch advances by
        ``step`` until ``n`` is reached, then reports caught-up (empty
        batch, unchanged offset) so availableNow terminates. The
        simple-reader variant generates in the driver with replay via
        ``readBetweenOffsets`` — right for control-rate feeds; a high-
        volume source implements the partition-planning
        ``DataSourceStreamReader`` instead (the batch reader above
        shows that plan shape)."""

        def __init__(self, options: dict) -> None:
            self.n = int(options.get("n", _N))
            self.step = int(options.get("step", 16_384))

        def initialOffset(self):
            return {"pos": 0}

        def _rows(self, lo: int, hi: int):
            return [
                (i, i % 16, (i * _KNUTH) % (1 << 32)) for i in range(lo, hi)
            ]

        def read(self, start):
            lo = start["pos"]
            hi = min(lo + self.step, self.n)
            return iter(self._rows(lo, hi)), {"pos": hi}

        def readBetweenOffsets(self, start, end):
            return iter(self._rows(start["pos"], end["pos"]))

        def commit(self, end) -> None:
            pass

    class SyntheticEventsStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "synthetic_events_stream"

        def schema(self) -> str:
            return "id BIGINT, bucket INT, amount BIGINT"

        def simpleStreamReader(self, schema):  # noqa: D102 — API hook
            return SyntheticStreamReader(self.options)

    spark.dataSource.register(SyntheticEventsStreamSource)


@query(
    "i12_python_stream_source",
    section="A5,I1,D1",
    tags=("streaming", "source"),
    # Identical oracle to a10: replaying the same sequence through
    # micro-batches must converge to the batch aggregate exactly.
    oracle=f"""
SELECT CAST(i % 16 AS INT) AS bucket,
       count(*) AS n,
       CAST(sum((i * {_KNUTH}) % 4294967296) AS BIGINT) AS amount_sum
FROM range(0, {_N}) t(i)
GROUP BY 1
""",
)
def i12_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python source as a STREAM: the same deterministic
    sequence arrives in ~4 offset-bounded micro-batches through a
    ``SimpleDataSourceStreamReader`` (initialOffset / read /
    readBetweenOffsets — the exactly-once replay contract), feeding a
    complete-mode aggregate. The final table hash-matches a10's batch
    oracle, proving offset slicing is gap- and overlap-free across
    micro-batch boundaries.
    """
    import uuid

    _register_stream(spark)
    src = (
        spark.readStream.format("synthetic_events_stream")
        .option("n", _N)
        .load()
    )
    agg = src.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("amount").alias("amount_sum"),
    )
    # availableNow would freeze the end offset at the simple reader's
    # FIRST prefetched batch (one read() call) and drain only 16k of
    # the 50k rows; processAllAvailable() keeps triggering until the
    # reader reports caught-up (empty batch, unchanged offset), i.e.
    # the real end of the sequence.
    name = f"sink_{uuid.uuid4().hex[:12]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)
