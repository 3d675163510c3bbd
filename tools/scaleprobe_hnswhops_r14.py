"""r14 supplementary HNSW sweep: base-layer HOPS x beam grid.

The first r14 beam sweep (tools/scaleprobe_beam_r14.py) showed the
NSW law cleanly — beam x2 and hops +1 per decade restores recall
0.35+ at 100x — but HNSW's grid only varied BEAMS at fixed descent
hops (2, 2, 5) and topped out at 0.15: the base-layer frontier can't
reach the true neighborhood in 5 rounds once the graph's diameter
grows. This sweep holds the once-built layered edges fixed and grids
over (base hops, beams) to calibrate the HNSW half of the search law.

Usage: python tools/scaleprobe_hnswhops_r14.py [factor ...] (default 10 100)
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
    _hn_edge_table,
    _hnsw_search,
    hnsw_plane_schedule,
)
from spark_glove_spark.registry import drain_deferred_unpersist  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402
from tools.scaleprobe_beam_r14 import _base_frame  # noqa: E402
from tools.scaleprobe_vec_r11 import SF_DIR, build_emb_nx  # noqa: E402
from tools.scaleprobe_vec_r12 import exact_topk  # noqa: E402


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark("scaleprobe_hnswhops_r14")
    spark.sparkContext.setLogLevel("ERROR")
    pinned = (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 10_000_000)
    dirs = {n: (SF_DIR if n == 1 else build_emb_nx(spark, n)) for n in factors}

    for n in factors:
        d = dirs[n]
        base = _base_frame(spark, d)
        rows = base.count()
        truth = exact_topk(spark, d, pinned, _NB_TOPK)
        drain_deferred_unpersist()

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
        print(f"n={n} rows={rows} sched={(sb, s1, s2)} | HNSW hops x beams")
        print(f"{'hops':>12s} {'beams':>14s} {'recall':>7s} {'search_s':>9s}")
        for hops, beams in [
            ((2, 2, 5), (8, 24, 48)),
            ((2, 2, 6), (8, 24, 48)),
            ((2, 2, 7), (8, 24, 48)),
            ((2, 2, 7), (12, 24, 48)),
            ((3, 3, 7), (8, 24, 48)),
            ((2, 2, 6), (4, 12, 24)),
        ]:
            t0 = time.time()
            got = {
                (r["probe_id"], r["vec_id"])
                for r in _hnsw_search(
                    spark,
                    d,
                    hops=hops,
                    beams=beams,
                    probe_pred=pinned,
                    edges_in=(edges0, edges1, edges2),
                ).collect()
            }
            wall = time.time() - t0
            rec = len(got & truth) / len(truth)
            print(f"{str(hops):>12s} {str(beams):>14s} {rec:7.2f} {wall:9.2f}")
            drain_deferred_unpersist()
        base.unpersist()


if __name__ == "__main__":
    main()
