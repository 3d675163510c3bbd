"""r14 search-side beam sweep (VERDICT r13 item 3): calibrate the
graph-ANN SEARCH law the way r12's ladder calibrated the BUILD law.

The r13 probe showed recall falling 0.37 -> 0.27 -> 0.12 across the
1x/10x/100x ladder at FIXED beam/hops (_NB_BEAM=12, _NB_HOPS=5) while
the search wall FELL (13.8 -> 6.9 s) — measured headroom to spend beam
width on recall. This probe builds each rung's NSW graph ONCE (the
schedule-derived plane width), then serves the SAME pinned probes
through `edges_in` at a grid of (beam, hops), so the sweep pays the
search cost only — the calibration data the beam law is derived from.

A second block does the same for the HNSW hierarchy (base-layer beam
grid over once-built layered edges).

Usage: python tools/scaleprobe_beam_r14.py [factor ...] (default 100)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from spark_glove_spark.operators.ann import (  # noqa: E402
    _HN_DEG_UP,
    _HN_L1_MOD,
    _HN_L2_MOD,
    _HN_T1,
    _HN_T2,
    _NB_DEG,
    _NB_TOPK,
    _PL_SCALE,
    _hn_edge_table,
    _hnsw_search,
    _nsw_edges,
    _nsw_search,
    hnsw_plane_schedule,
)
from spark_glove_spark.registry import drain_deferred_unpersist  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402
from tools.scaleprobe_vec_r11 import SF_DIR, build_emb_nx  # noqa: E402
from tools.scaleprobe_vec_r12 import exact_topk  # noqa: E402


def _base_frame(spark, d: str):
    e = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
    qv = F.transform(
        "embedding",
        lambda x: F.floor(
            x.cast("double") * F.lit(float(_PL_SCALE)) + F.lit(0.5)
        ),
    )
    zero = F.lit(0).cast("long")
    nn = F.aggregate(
        F.transform("qv", lambda x: x * x), zero, lambda a, x: a + x
    )
    return e.select("vec_id", qv.alias("qv")).withColumn("nn", nn).persist()


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [100]
    spark = get_spark("scaleprobe_beam_r14")
    spark.sparkContext.setLogLevel("ERROR")
    pinned = (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 10_000_000)
    dirs = {n: (SF_DIR if n == 1 else build_emb_nx(spark, n)) for n in factors}

    for n in factors:
        d = dirs[n]
        base = _base_frame(spark, d)
        rows = base.count()
        planes = hnsw_plane_schedule(rows)[0]
        truth = exact_topk(spark, d, pinned, _NB_TOPK)
        drain_deferred_unpersist()

        # --- NSW: one edge build at the law's plane width, beam grid ---
        edges = _nsw_edges(base, n_planes=planes, deg=_NB_DEG).localCheckpoint(
            eager=True
        )
        print(f"n={n} rows={rows} planes={planes} | NSW beam grid")
        print(f"{'beam':>5s} {'hops':>5s} {'recall':>7s} {'search_s':>9s}")
        for beam, hops in [
            (12, 5),
            (24, 5),
            (36, 5),
            (48, 5),
            (24, 6),
            (36, 6),
            (48, 6),
            (48, 7),
        ]:
            t0 = time.time()
            got = {
                (r["probe_id"], r["vec_id"])
                for r in _nsw_search(
                    spark,
                    d,
                    n_planes=planes,
                    beam=beam,
                    hops=hops,
                    probe_pred=pinned,
                    edges_in=edges,
                ).collect()
            }
            wall = time.time() - t0
            rec = len(got & truth) / len(truth)
            print(f"{beam:5d} {hops:5d} {rec:7.2f} {wall:9.2f}")
            drain_deferred_unpersist()

        # --- HNSW: one layered build, base-beam grid over the descent ---
        sb, s1, s2 = hnsw_plane_schedule(rows)
        l1 = F.col("vec_id") % _HN_L1_MOD == 0
        l2 = F.col("vec_id") % _HN_L2_MOD == 0
        edges0 = (
            _hn_edge_table(base, 0, sb, _NB_DEG, None)
            .union(_hn_edge_table(base, 1, sb, _NB_DEG, None))
            .distinct()
            .localCheckpoint(eager=True)
        )
        edges1 = _hn_edge_table(base, _HN_T1, s1, _HN_DEG_UP, l1).localCheckpoint(
            eager=True
        )
        edges2 = _hn_edge_table(base, _HN_T2, s2, _HN_DEG_UP, l2).localCheckpoint(
            eager=True
        )
        print(f"n={n} sched={(sb, s1, s2)} | HNSW beam grid (descent 2+2+5)")
        print(f"{'beams':>12s} {'recall':>7s} {'search_s':>9s}")
        for beams in [
            (4, 8, 12),
            (4, 12, 24),
            (8, 16, 36),
            (8, 24, 48),
            (12, 24, 48),
        ]:
            t0 = time.time()
            got = {
                (r["probe_id"], r["vec_id"])
                for r in _hnsw_search(
                    spark,
                    d,
                    hops=(2, 2, 5),
                    beams=beams,
                    probe_pred=pinned,
                    edges_in=(edges0, edges1, edges2),
                ).collect()
            }
            wall = time.time() - t0
            rec = len(got & truth) / len(truth)
            print(f"{str(beams):>12s} {rec:7.2f} {wall:9.2f}")
            drain_deferred_unpersist()
        base.unpersist()


if __name__ == "__main__":
    main()
