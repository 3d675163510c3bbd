"""Phase probe for the graph-ANN search kernel (r14 optimization).

Splits the portable NSW/HNSW lanes into build vs descent wall and
counts Spark jobs, so optimization effort lands on the measured
phase (guide §1). Solo process; run on a quiet host.

Usage: python tools/phaseprobe_nsw_r14.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_glove_spark.operators import ann  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("phaseprobe_nsw")
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()

    for name, fn in (
        ("nsw", ann._nsw_search),
        ("hnsw", ann._hnsw_search),
    ):
        for rep in range(2):
            t = {}
            j0 = len(st.getJobIdsForGroup(None))
            t0 = time.time()
            out = fn(spark, sf_dir, timings=t)
            t1 = time.time()
            out.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            j1 = len(st.getJobIdsForGroup(None))
            print(
                f"{name} rep{rep}: build={t['build_s']:.2f}s"
                f" construct+descent_lazy={t1 - t0 - t['build_s']:.2f}s"
                f" drain={t2 - t1:.2f}s total={t2 - t0:.2f}s"
                f" jobs={j1 - j0}",
                flush=True,
            )


if __name__ == "__main__":
    main()
