"""Core-scaling rung at 10x data (VERDICT r14 item 4).

At sf0.1 every 8->32-core bench ratio reads <= 1.17 — the suite
measures fixed overhead, not parallelism. This rung times the heavy
entries on the 10x replica (tools/mk10x_r15.py) at the CPU count in
$SPARK_GRAFT_CPUS, so running it twice (8, 32) yields ratios the
suite can resolve: a parallel entry should approach the core ratio;
an entry stuck near 1 has a named serial bottleneck to find.

Usage: SPARK_GRAFT_CPUS=N python tools/scalerung_r15.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_glove_spark import api  # noqa: E402
from spark_glove_spark.glove import Glove  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402
from spark_glove_spark.sources import table  # noqa: E402

ENTRIES = [
    "pipeline_streaming_curate",
    "pipeline_rag_serving",
    "h16_hnsw_portable",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf10x_r15")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("scalerung_r15")
    spark.sparkContext.setLogLevel("ERROR")
    table(spark, sf_dir, "region").count()
    qs = api.queries()
    for name in ENTRIES:
        walls = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"rung{cpus}:{name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            walls.append(round(time.time() - t0, 3))
        print(f"cpus={cpus} {name}: min={min(walls)} reps={walls}")
    docs = table(spark, sf_dir, "documents")
    walls = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(f"rung{cpus}:glove_fit")
        t0 = time.time()
        Glove(dim=50, window=10, iterations=5, min_count=5, seed=42).fit(
            docs
        ).vectors.count()
        walls.append(round(time.time() - t0, 3))
    print(f"cpus={cpus} glove_fit_d50_w10_it5: min={min(walls)} reps={walls}")
    spark.stop()


if __name__ == "__main__":
    main()
