"""Scale probe for the r13 incremental HNSW insert lane: connect cost
must track the NEW BATCH, not the corpus. A fixed 2,000-node insert
batch is search-then-connected into bases of ~18k / ~58k / ~198k
covered nodes (the r11/r12 ladder corpora); if the lane is really
O(new x beam) broadcasts, the connect wall should stay near-flat
while the base grows 10x — the base enters only through the stored
edge-table scans each hop joins against. The full O(corpus) rebuild
wall is printed beside it as the cost the lane exists to avoid.

Usage: python tools/scaleprobe_insert_r13.py [factor ...] (default 10 30 100)
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
    _PL_SCALE,
    _hn_edge_table,
    _hnsw_search,
    hnsw_plane_schedule,
)
from spark_glove_spark.registry import drain_deferred_unpersist  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402
from tools.scaleprobe_vec_r11 import build_emb_nx  # noqa: E402

BATCH = 2_000  # fixed insert-batch size at every rung


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [10, 30, 100]
    spark = get_spark("scaleprobe_insert_r13")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        f"{'n':>4s} {'covered':>8s} {'new':>6s} {'sched':>10s} "
        f"{'build_s':>8s} {'connect_s':>9s} {'edges':>7s}"
    )
    for n in factors:
        d = build_emb_nx(spark, n)
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
        base = (
            e.select("vec_id", qv.alias("qv")).withColumn("nn", nn).persist()
        )
        total = base.count()
        # watermark = the BATCH-th largest id: covered grows with n,
        # the insert batch stays fixed
        wm = (
            base.select("vec_id")
            .orderBy(F.col("vec_id").desc())
            .limit(BATCH)
            .agg(F.min("vec_id"))
            .collect()[0][0]
        ) - 1
        covered = base.where(F.col("vec_id") <= wm)
        n_cov = covered.count()
        l1 = F.col("vec_id") % _HN_L1_MOD == 0
        l2 = F.col("vec_id") % _HN_L2_MOD == 0
        t0 = time.time()
        pb, p1, p2 = hnsw_plane_schedule(n_cov)
        e0 = (
            _hn_edge_table(covered, 0, pb, _NB_DEG)
            .union(_hn_edge_table(covered, 1, pb, _NB_DEG))
            .distinct()
            .localCheckpoint(eager=True)
        )
        e1 = _hn_edge_table(
            covered, _HN_T1, p1, _HN_DEG_UP, l1
        ).localCheckpoint(eager=True)
        e2 = _hn_edge_table(
            covered, _HN_T2, p2, _HN_DEG_UP, l2
        ).localCheckpoint(eager=True)
        build_s = time.time() - t0

        newp = F.col("vec_id") > wm
        t0 = time.time()
        edges = 0
        for pred, hops, deg in (
            (newp, (2, 2, 3), _NB_DEG),
            (newp & l1, (2, 2, 0), _HN_DEG_UP),
            (newp & l2, (2, 0, 0), _HN_DEG_UP),
        ):
            nb = _hnsw_search(
                spark,
                d,
                probe_pred=pred,
                edges_in=(e0, e1, e2),
                graph_pred=F.col("vec_id") <= wm,
                hops=hops,
                topk=deg,
            )
            edges += nb.count() * 2  # forward + reverse
        connect_s = time.time() - t0
        print(
            f"{n:4d} {n_cov:8d} {total - n_cov:6d} "
            f"{str((pb, p1, p2)):>10s} {build_s:8.2f} {connect_s:9.2f} "
            f"{edges:7d}",
            flush=True,
        )
        base.unpersist()
        drain_deferred_unpersist()


if __name__ == "__main__":
    main()
