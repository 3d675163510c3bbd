"""Phase probe for pipeline_streaming_curate (r14 optimization round).

Times the capstone's phases separately so the optimization targets the
real cost, not the guess: staging (ranged replay files + empty state
tables), the 4-epoch foreachBatch drain (per-epoch wall printed from
inside the process function), and the final rollup drain.

Usage: python tools/phaseprobe_psc_r14.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import tempfile  # noqa: E402

from spark_glove_spark.session import get_spark  # noqa: E402
from spark_glove_spark.sources import table  # noqa: E402
from spark_glove_spark.streaming import queries as sq  # noqa: E402
from spark_glove_spark.streaming.jobs import (  # noqa: E402
    run_stream_foreach_batch,
    stage_ranged_stream,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("phaseprobe_psc")
    spark.sparkContext.setLogLevel("ERROR")
    table(spark, sf_dir, "region").count()  # session warmup

    for rep in range(3):
        t0 = time.time()
        d = table(spark, sf_dir, "documents")
        base = tempfile.mkdtemp(prefix="psc_probe_")
        sdf = stage_ranged_stream(
            d,
            "doc_id",
            base,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        t1 = time.time()
        tables = sq._curate_tables_init(spark, d, base)
        t2 = time.time()
        epochs = []

        def process(batch_df, epoch_id):
            e0 = time.time()
            sq._curate_epoch(spark, tables, batch_df, epoch_id)
            epochs.append((int(epoch_id), round(time.time() - e0, 3)))

        run_stream_foreach_batch(sdf, process, "append")
        t3 = time.time()
        from pyspark.sql import functions as F

        from spark_glove_spark.sources import txlog

        out = (
            txlog.read(spark, tables["cur"])
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n").cast("long").alias("total_tokens"),
            )
        )
        out.write.mode("overwrite").format("noop").save()
        t4 = time.time()
        print(
            f"rep{rep}: stage={t1 - t0:.2f}s init={t2 - t1:.2f}s "
            f"drain={t3 - t2:.2f}s rollup={t4 - t3:.2f}s "
            f"total={t4 - t0:.2f}s epochs={epochs}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
