"""r14 default-path rerun of the graph-ANN ladder with EVERY knob
derived (VERDICT r13 item 3 closure): the calibration grids
(tools/scaleprobe_beam_r14.py, scaleprobe_hnswhops_r14.py) measured
which (beam, hops) restore recall at each rung against once-built
graphs; this probe calls _nsw_search and _hnsw_search with NO
arguments beyond the pinned probe set — planes, beam, and hops all
flow through hnsw_plane_schedule / nsw_search_schedule /
hnsw_search_schedule — and verifies the WIRED defaults reproduce the
grid's recall at 1x/10x/100x. This is the law-as-default evidence:
a user at any corpus size inherits these knobs without touching one.

Usage: python tools/scaleprobe_searchlaw_r14.py [factor ...] (default 10 100)
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
    hnsw_search_schedule,
    nsw_search_schedule,
)
from spark_glove_spark.registry import drain_deferred_unpersist  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402
from tools.scaleprobe_vec_r11 import SF_DIR, build_emb_nx  # noqa: E402
from tools.scaleprobe_vec_r12 import exact_topk  # noqa: E402


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark("scaleprobe_searchlaw_r14")
    spark.sparkContext.setLogLevel("ERROR")
    pinned = (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 10_000_000)
    dirs = {1: SF_DIR, **{n: build_emb_nx(spark, n) for n in factors}}

    print(
        f"{'n':>4s} {'rows':>8s} {'nsw_sched':>10s} {'nsw_rec':>7s} "
        f"{'nsw_s':>7s} {'hn_sched':>24s} {'hn_rec':>7s} {'hn_s':>7s}"
    )
    for n in [1] + factors:
        d = dirs[n]
        rows = spark.read.parquet(os.path.join(d, "embeddings.parquet")).count()
        truth = exact_topk(spark, d, pinned, _NB_TOPK)
        drain_deferred_unpersist()

        t0 = time.time()
        nsw = {
            (r["probe_id"], r["vec_id"])
            for r in _nsw_search(spark, d, probe_pred=pinned).collect()
        }
        nsw_s = time.time() - t0
        nsw_rec = len(nsw & truth) / len(truth)
        drain_deferred_unpersist()

        t0 = time.time()
        hn = {
            (r["probe_id"], r["vec_id"])
            for r in _hnsw_search(spark, d, probe_pred=pinned).collect()
        }
        hn_s = time.time() - t0
        hn_rec = len(hn & truth) / len(truth)
        drain_deferred_unpersist()

        print(
            f"{n:4d} {rows:8d} {str(nsw_search_schedule(rows)):>10s} "
            f"{nsw_rec:7.2f} {nsw_s:7.1f} "
            f"{str(hnsw_search_schedule(rows)):>24s} {hn_rec:7.2f} {hn_s:7.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
