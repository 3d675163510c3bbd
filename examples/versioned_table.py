"""Lakehouse-style table walkthrough on the txlog format: versioned
writes, time travel, file skipping, compaction, a streaming sink, and
conflict detection —

    create → CDC merge (overwrite) → append → read any version →
    predicate read with stats-based file skipping → OPTIMIZE →
    concurrent-writer conflict demo

    python examples/versioned_table.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from spark_glove_spark.operators.analytics import (  # noqa: E402
    apply_merge,
    cdc_change_set,
)
from spark_glove_spark.session import get_spark  # noqa: E402
from spark_glove_spark.sources import table, txlog  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("versioned_table_example")
    spark.sparkContext.setLogLevel("ERROR")

    path = tempfile.mkdtemp(prefix="txlog_example_") + "/orders"
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.lit("base").alias("src"),
    )

    v0 = txlog.create(orders.repartitionByRange(8, "o_orderkey"), path)
    print(f"v{v0}: created with {txlog.read(spark, path).count()} rows")

    merged = apply_merge(
        txlog.read(spark, path), cdc_change_set(table(spark, sf_dir, "orders"))
    )
    v1 = txlog.overwrite(merged, path)
    print(f"v{v1}: CDC merge applied -> {txlog.read(spark, path).count()} rows")

    # time travel: v0 is still exactly the pre-merge table
    n0 = txlog.read(spark, path, version=0).count()
    print(f"time travel to v0 -> {n0} rows (unchanged by the merge)")

    # file skipping: a key-band read consults only log metadata
    # (version 0 is the range-partitioned snapshot; the merge rewrote
    # v1 into a single unpartitioned group)
    kept, total = txlog.prune_files(path, "o_orderkey", 0, 999, version=0)
    print(f"predicate o_orderkey in [0, 999]: scans {len(kept)}/{total} files")
    band = txlog.read(spark, path, version=0, predicate=("o_orderkey", 0, 999))
    print(f"  -> {band.count()} rows from the pruned scan")

    v2 = txlog.optimize(spark, path)
    print(
        f"v{v2}: OPTIMIZE -> {len(txlog.snapshot_files(path))} file(s); "
        f"v0 still readable: {txlog.read(spark, path, version=0).count()} rows"
    )

    # optimistic concurrency: a stale writer loses cleanly
    files, stats = txlog._write_data(
        spark.createDataFrame([(1, 1.0, "late")], "o_orderkey long, price double, src string"),
        path,
    )
    try:
        txlog.commit(path, files, [], expected_version=0, stats=stats)
    except txlog.TxLogConflict as e:
        print(f"stale writer rejected: {e}")

    spark.stop()


if __name__ == "__main__":
    main()
