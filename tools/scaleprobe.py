"""10x scale probe for the GloVe trainer (PLANS.md "Measured scale-up").

Replicates the sf0.1 documents fixture 10x (fresh doc_ids, 32 output
files so the scan parallelizes without `parallelized()`), then times a
warm min-of-2 `Glove.fit` at the given iteration count on both corpora.
The interesting number is the TIME RATIO at 10x data: per-iteration
driver/JVM overhead (plan analysis, Arrow launch, checkpoint commit)
is constant per iteration, so higher `iterations` isolates how much of
the wall-clock is overhead vs real gradient work — the closest thing
to a 100 TB scaling argument a single-host sandbox can make.

Usage: python tools/scaleprobe.py [iterations] [dim]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from spark_glove_spark.glove import Glove  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402
from spark_glove_spark.sources import table  # noqa: E402


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scaleprobe")
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = table(spark, sf_dir, "documents")
    n1 = docs1.count()

    rep_path = f"/tmp/scaleprobe_docs10x_{os.path.basename(sf_dir.rstrip('/'))}"
    if not os.path.exists(rep_path):
        # 10 copies with disjoint doc_ids; 32 files so the scan splits
        copies = docs1.crossJoin(
            spark.range(10).select(F.col("id").alias("rep"))
        ).select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            *[c for c in docs1.columns if c != "doc_id"],
        )
        copies.repartition(32).write.mode("overwrite").parquet(rep_path)
    docs10 = spark.read.parquet(rep_path)
    n10 = docs10.count()

    def fit_time(docs) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            Glove(
                dim=dim, window=10, iterations=iters, min_count=5, seed=42
            ).fit(docs).vectors.count()
            best = min(best, time.time() - t0)
        return round(best, 2)

    t1 = fit_time(docs1)
    t10 = fit_time(docs10)
    print(
        f"glove_fit d{dim} w10 it{iters}: "
        f"sf0.1 ({n1} docs) {t1} s | 10x ({n10} docs) {t10} s | "
        f"ratio {t10 / t1:.2f}x | per-iter {t1 / iters:.2f} s vs "
        f"{t10 / iters:.2f} s"
    )


if __name__ == "__main__":
    main()
