"""Lakehouse-style table walkthrough on the txlog format: versioned
writes, time travel, file skipping, compaction, copy-on-write
mutations, schema evolution, a change feed, bloom point lookups,
merge-on-read deletion vectors, an object-store commit backend, and
conflict detection —

    create → CDC merge (overwrite) → read any version → predicate
    read with stats-based file skipping → OPTIMIZE → COW DELETE →
    MERGE INTO → additive schema evolution → row-level change feed →
    bloom point lookup → concurrent-writer conflict demo

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

    # copy-on-write DELETE: only files holding matches rewrite
    res = txlog.delete(
        spark, path, "o_orderkey % 1000 = 7"
    )
    print(
        f"v{res['version']}: DELETE removed {res['rows_deleted']} rows, "
        f"rewrote {res['files_rewritten']}/{res['files_total']} files"
    )

    # MERGE INTO: upsert two rows, delete one — touched files only
    src = spark.createDataFrame(
        [(3, 1.0, "upsert", "U"), (999999999, 2.0, "new", "I"),
         (5, 0.0, "", "D")],
        "o_orderkey long, price double, src string, op string",
    )
    res = txlog.merge(spark, path, src, on=["o_orderkey"], op_col="op")
    print(
        f"v{res['version']}: MERGE upserted {res['rows_upserted']}, "
        f"deleted {res['rows_deleted']}, rewrote "
        f"{res['files_rewritten']}/{res['files_total']} files"
    )

    # additive schema evolution: one log entry, zero data rewrite
    tagged = txlog.read(spark, path).limit(3).withColumn(
        "channel", F.lit("backfill")
    )
    v = txlog.append(tagged, path, merge_schema=True)
    cols = [f.name for f in txlog.snapshot_schema(path).fields]
    print(f"v{v}: schema evolved to {cols}; v0 columns unchanged: "
          f"{txlog.read(spark, path, version=0).columns}")

    # row-level change feed: net changes per commit, computed from
    # each commit's touched files only
    feed = txlog.changes(spark, path, v - 3, v)
    print("change feed (last 3 commits):")
    for r in (
        feed.groupBy("_commit_version", "_change_type").count()
        .orderBy("_commit_version", "_change_type").collect()
    ):
        print(f"  v{r[0]} {r[1]}: {r[2]} rows")

    # merge-on-read DELETE: scattered keys, zero files rewritten —
    # the commit records (file, row-position) deletion vectors and
    # readers subtract them with one broadcast anti-join
    files_before = txlog.snapshot_files(path)
    res = txlog.delete_mor(spark, path, "o_orderkey % 997 = 11")
    assert txlog.snapshot_files(path) == files_before
    print(
        f"v{res['version']}: MOR DELETE removed {res['rows_deleted']} rows "
        f"across {res['files_touched']} files — zero rewrite "
        f"(vectors: {sum(len(v) for v in txlog.snapshot_dvs(path).values())}"
        " positions)"
    )

    # PURGE: pay one rewrite to drop the read-side anti-join
    res = txlog.purge_dvs(spark, path)
    print(
        f"v{res['version']}: PURGE re-materialized {res['files_purged']} "
        f"file(s), dropped {res['rows_dropped']} dead positions; vectors "
        f"now: {txlog.snapshot_dvs(path)}"
    )

    # conditional-put commit backend (the object-store model) with an
    # injected ambiguous failure: the put landed, the response didn't —
    # commit read-backs its own payload and reports success
    cas_path = tempfile.mkdtemp(prefix="txlog_cas_") + "/t"
    backend = txlog.CASCommitBackend()
    with txlog.use_backend(backend):
        txlog.create(
            txlog.read(spark, path).limit(100).coalesce(1), cas_path
        )
        backend.faults.append("fail_after_store")
        v = txlog.append(
            txlog.read(spark, path).limit(5).coalesce(1), cas_path
        )
        print(
            f"CAS backend: ambiguous put resolved to SUCCESS at v{v} "
            f"({txlog.read(spark, cas_path).count()} rows readable)"
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
