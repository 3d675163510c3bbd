"""Step-level probe inside _curate_epoch (r14 optimization round).

Replicates _curate_epoch statement-for-statement with wall timers per
step, on the same staged replay the capstone uses, to locate the ~3 s
per-epoch cost. Measurement-only tool; the product path stays in
spark_glove_spark/streaming/queries.py.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from spark_glove_spark.operators.dedup import (  # noqa: E402
    portable_band_buckets,
    portable_shingles,
)
from spark_glove_spark.session import get_spark  # noqa: E402
from spark_glove_spark.sources import table, txlog  # noqa: E402
from spark_glove_spark.streaming import queries as sq  # noqa: E402
from spark_glove_spark.streaming.jobs import (  # noqa: E402
    run_stream_foreach_batch,
    stage_ranged_stream,
)


def timed_epoch(spark, tables, batch_df, epoch_id, log):
    t = time.time()

    def lap(name):
        nonlocal t
        now = time.time()
        log.append((int(epoch_id), name, round(now - t, 3)))
        t = now

    if batch_df.count() == 0:
        return
    lap("batch_count")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    sr = (
        F.size(F.filter(toks, lambda x: x.isin("a", "the"))).cast("double") / n
    )
    passed = (
        batch_df.select("doc_id", "lang", "text", n.alias("n"))
        .where(n.between(20, 80) & (sr < 0.3))
        .localCheckpoint(eager=True)
    )
    lap("quality_ckpt")
    if passed.count() == 0:
        return
    lap("passed_count")
    sh_new = portable_shingles(
        passed.select("doc_id", "text")
    ).localCheckpoint(eager=True)
    lap("shingles_ckpt")
    bk_new = portable_band_buckets(sh_new).localCheckpoint(eager=True)
    lap("buckets_ckpt")
    bk_all = txlog.read(spark, tables["bk"]).unionByName(bk_new)
    sh_all = txlog.read(spark, tables["sh"]).unionByName(sh_new)
    a = bk_all.alias("a")
    b = bk_new.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sa = sh_all.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("set_a")
    )
    sb = sh_new.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("set_b")
    )
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size("set_a") + F.size("set_b") - inter
    dropped = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(inter.cast("double") / union >= 0.5)
        .select("doc_b")
        .distinct()
        .withColumnRenamed("doc_b", "doc_id")
    )
    kept = passed.join(dropped, "doc_id", "left_anti").select(
        "doc_id", "lang", "n"
    ).localCheckpoint(eager=True)
    lap("kept_ckpt")
    for app, tbl, frame in (
        ("psc-buckets", tables["bk"], bk_new),
        ("psc-shingles", tables["sh"], sh_new),
    ):
        txlog.append_idempotent(frame.coalesce(1), tbl, app, int(epoch_id))
    lap("append_hist")
    if kept.count() == 0:
        return
    lap("kept_count")
    txlog.append_idempotent(
        kept.coalesce(1), tables["cur"], "psc-curated", int(epoch_id)
    )
    lap("append_cur")
    delta = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("d_docs"),
        F.sum("n").cast("long").alias("d_tokens"),
    )
    old = txlog.read(spark, tables["mon"]).select(
        "lang",
        F.col("n_docs").alias("o_docs"),
        F.col("total_tokens").alias("o_tokens"),
    )
    src_rows = (
        delta.join(old, "lang", "left")
        .select(
            "lang",
            (F.col("d_docs") + F.coalesce(F.col("o_docs"), F.lit(0))).alias(
                "n_docs"
            ),
            (
                F.col("d_tokens") + F.coalesce(F.col("o_tokens"), F.lit(0))
            ).alias("total_tokens"),
        )
        .localCheckpoint(eager=True)
    )
    lap("monitor_delta_ckpt")
    txlog.merge(
        spark,
        tables["mon"],
        src_rows,
        on=["lang"],
        txn=("psc-monitor", int(epoch_id)),
    )
    lap("monitor_merge")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("phaseprobe_psc_epoch")
    spark.sparkContext.setLogLevel("ERROR")
    table(spark, sf_dir, "region").count()

    for rep in range(2):
        d = table(spark, sf_dir, "documents")
        base = tempfile.mkdtemp(prefix="psc_eprobe_")
        sdf = stage_ranged_stream(
            d,
            "doc_id",
            base,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        tables = sq._curate_tables_init(spark, d, base)
        log: list = []

        def process(batch_df, epoch_id):
            timed_epoch(spark, tables, batch_df, epoch_id, log)

        t0 = time.time()
        run_stream_foreach_batch(sdf, process, "append")
        total = time.time() - t0
        by_step: dict = {}
        for _, name, s in log:
            by_step[name] = by_step.get(name, 0.0) + s
        print(f"rep{rep}: drain={total:.2f}s steps(sum over 4 epochs):")
        for name, s in sorted(by_step.items(), key=lambda kv: -kv[1]):
            print(f"    {name:20s} {s:6.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
