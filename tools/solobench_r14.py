"""Solo min-of-N timer for individual bench entries (r14 round).

Times qs[name] with the same methodology as bench.py (noop sink,
min-of-N) but for a chosen subset, so per-change measurements don't
pay a full suite run.

Usage: python tools/solobench_r14.py name[,name...] [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_glove_spark import api  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402
from spark_glove_spark.sources import table  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("solobench_r14")
    spark.sparkContext.setLogLevel("ERROR")
    table(spark, sf_dir, "region").count()
    qs = api.queries()
    for name in names:
        walls = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"solo:{name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            walls.append(round(time.time() - t0, 3))
        print(f"{name}: min={min(walls)} reps={walls}")
    spark.stop()


if __name__ == "__main__":
    main()
