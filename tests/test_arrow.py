"""Arrow IPC source/sink teeth (operators/arrow_queries.py): writer
batch slicing, empty partitions, self-describing schema inference,
multi-batch files, body compression, and the reader's batch walk."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.ipc as ipc
import pytest
from pyspark.sql import functions as F

from spark_glove_spark.operators.arrow_queries import (
    _register_arrow,
    write_arrow_ipc,
)


def _roundtrip(spark, df, tmp_path, **kw):
    path = str(tmp_path / "ipc")
    n = write_arrow_ipc(df, path, **kw)
    _register_arrow(spark)
    return n, path, spark.read.format("sgs_arrow").option("path", path).load()


def test_roundtrip_values_and_schema(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 7 == 0, F.lit(None))
        .otherwise(F.concat(F.lit("v"), F.col("id")))
        .alias("s"),
        F.array(F.col("id").cast("float"), F.lit(0.5)).alias("vec"),
    )
    n, _, back = _roundtrip(spark, df.repartition(3), tmp_path)
    assert n == 1000
    assert back.schema.simpleString() == df.schema.simpleString()
    assert back.count() == 1000
    a = sorted(df.collect(), key=lambda r: r.k)
    b = sorted(back.collect(), key=lambda r: r.k)
    assert a == b


def test_writer_slices_to_batch_budget(spark, tmp_path):
    df = spark.range(0, 5000).coalesce(1)
    _, path, back = _roundtrip(spark, df, tmp_path, batch_rows=512)
    files = glob.glob(os.path.join(path, "*.arrow"))
    assert len(files) == 1
    with ipc.open_file(files[0]) as r:
        sizes = [r.get_batch(i).num_rows for i in range(r.num_record_batches)]
    assert max(sizes) <= 512  # task-resident bound held on disk
    assert sum(sizes) == 5000
    assert back.count() == 5000


def test_empty_partitions_write_no_files(spark, tmp_path):
    # 8 partitions, 3 rows: >= 5 partitions are empty and must leave
    # no zero-row footer files behind
    df = spark.range(0, 3).repartition(8)
    n, path, back = _roundtrip(spark, df, tmp_path)
    assert n == 3
    assert 0 < len(glob.glob(os.path.join(path, "*.arrow"))) <= 3
    assert back.count() == 3


def test_empty_directory_raises_loudly(spark, tmp_path):
    os.makedirs(tmp_path / "none", exist_ok=True)
    _register_arrow(spark)
    with pytest.raises(Exception, match="no .arrow files"):
        spark.read.format("sgs_arrow").option(
            "path", str(tmp_path / "none")
        ).load().count()


@pytest.mark.parametrize("codec", ["zstd", "lz4"])
def test_body_compression_roundtrips(spark, tmp_path, codec):
    try:
        ipc.IpcWriteOptions(compression=codec)
    except Exception:
        pytest.skip(f"pyarrow built without {codec}")
    df = spark.range(0, 2000).select(
        F.col("id"), F.lit("x" * 50).alias("pad")
    )
    n, path, back = _roundtrip(
        spark, df.coalesce(1), tmp_path, compression=codec
    )
    assert n == 2000 and back.count() == 2000
    plain = str(tmp_path / "plain")
    write_arrow_ipc(df.coalesce(1), plain)
    csize = os.path.getsize(glob.glob(os.path.join(path, "*.arrow"))[0])
    psize = os.path.getsize(glob.glob(os.path.join(plain, "*.arrow"))[0])
    assert csize < psize  # the pad column really compressed


def test_files_are_foreign_readable(spark, tmp_path):
    """The files are plain Arrow IPC: pyarrow (standing in for any
    foreign Arrow consumer — DuckDB, Polars, pandas) reads them with
    no knowledge of this repo."""
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    _, path, _ = _roundtrip(spark, df.repartition(2), tmp_path)
    tables = [
        ipc.open_file(f).read_all()
        for f in sorted(glob.glob(os.path.join(path, "*.arrow")))
    ]
    got = sorted(pa.concat_tables(tables)["k"].to_pylist())
    assert got == list(range(100))


def test_columns_option_prunes_at_the_scan(spark, tmp_path):
    """.option('columns', ...) selects zero-copy at the file walk:
    the pruned column's buffers never cross into the JVM, and the
    inferred schema shrinks to match."""
    df = spark.range(0, 500).select(
        F.col("id").alias("k"),
        F.lit("HEAVY" * 100).alias("payload"),
        (F.col("id") * 2).alias("v"),
    )
    path = str(tmp_path / "ipc")
    write_arrow_ipc(df.repartition(2), path)
    _register_arrow(spark)
    back = (
        spark.read.format("sgs_arrow")
        .option("path", path)
        .option("columns", "v,k")
        .load()
    )
    assert [f.name for f in back.schema.fields] == ["v", "k"]
    rows = back.orderBy("k").collect()
    assert len(rows) == 500 and rows[7].v == 14 and rows[7].k == 7
