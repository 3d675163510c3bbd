"""r13 rerun of the HNSW rung of the r12 vector ladder with the
plane knobs DERIVED BY DEFAULT (VERDICT r12 item 7): _hnsw_search now
computes (base, l1, l2) from corpus size via hnsw_plane_schedule —
the bisected descent law that the r12 probe carried in its own
schedule dict — so this probe calls it with NO plane arguments and
checks that recall still matches the flat NSW baseline at 1x/10x/100x.

Differences vs the r12 probe's HNSW column: planes come from the
derived schedule (identical at 1x/10x/30x; 11 vs the hand-tuned 10 at
100x — one bit of schedule granularity), everything else verbatim
(pinned probes, 2+2+5 descent so base exploration equals NSW's 5
rounds, exact top-3 truth of the grown corpus).

Usage: python tools/scaleprobe_hnsw_r13.py [factor ...] (default 10 100)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from spark_glove_spark.operators.ann import (  # noqa: E402
    _NB_TOPK,
    _hnsw_search,
    _nsw_search,
    hnsw_plane_schedule,
)
from spark_glove_spark.registry import drain_deferred_unpersist  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402
from tools.scaleprobe_vec_r11 import PLANES, SF_DIR, build_emb_nx  # noqa: E402
from tools.scaleprobe_vec_r12 import exact_topk  # noqa: E402


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark("scaleprobe_hnsw_r13")
    spark.sparkContext.setLogLevel("ERROR")
    pinned = (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 10_000_000)
    dirs = {1: SF_DIR, **{n: build_emb_nx(spark, n) for n in factors}}

    print(
        f"{'n':>4s} {'rows':>8s} {'sched':>10s} "
        f"{'nsw_rec':>7s} {'hn_rec':>7s} {'hn_bld':>8s} {'hn_srch':>8s}"
    )
    for n in [1] + factors:
        d = dirs[n]
        rows = spark.read.parquet(os.path.join(d, "embeddings.parquet")).count()
        truth = exact_topk(spark, d, pinned, _NB_TOPK)
        drain_deferred_unpersist()

        nsw = {
            (r["probe_id"], r["vec_id"])
            for r in _nsw_search(
                spark, d, n_planes=PLANES.get(n, 10), probe_pred=pinned
            ).collect()
        }
        nsw_rec = len(nsw & truth) / len(truth)
        drain_deferred_unpersist()

        t = {}
        t0 = time.time()
        hn = {
            (r["probe_id"], r["vec_id"])
            for r in _hnsw_search(
                spark, d, hops=(2, 2, 5), probe_pred=pinned, timings=t
            ).collect()  # NO plane knobs: the derived schedule is on trial
        }
        hn_bld, hn_srch = t["build_s"], time.time() - t0 - t["build_s"]
        hn_rec = len(hn & truth) / len(truth)
        drain_deferred_unpersist()

        print(
            f"{n:4d} {rows:8d} {str(hnsw_plane_schedule(rows)):>10s} "
            f"{nsw_rec:7.2f} {hn_rec:7.2f} {hn_bld:8.2f} {hn_srch:8.2f}"
        )


if __name__ == "__main__":
    main()
