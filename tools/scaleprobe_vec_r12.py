"""10x/30x/100x scale probe for the vector-index lane (VERDICT r11
items 3+7): extends the r11 BQ/NSW ladder to 100x and adds the HNSW
descent probe — recall at a CONSTANT descent depth while the corpus
grows, the property the layer hierarchy exists to buy.

Probe corpora and regime come verbatim from scaleprobe_vec_r11
(realistic per-(replica, dim) jitter; replica 0 verbatim so the probe
set is PINNED to the base corpus). Knob schedules:

* h16_bq_portable — NO knob: a linear 8-byte-code pass, wall ~ n.
* h16_nsw_portable — n_planes ~ log2(n) per decade (edge-build pairs
  per node flat); search depth FIXED at _NB_HOPS=5 from the LSH warm
  start. As n grows, a flat graph's entry-to-neighborhood distance
  grows, so fixed-depth recall is expected to SAG — that sag is the
  baseline the hierarchy is measured against.
* h16_hnsw_portable — EVERY layer's proposal hash scales with its
  layer size (base planes ~ log2(n); l1 = base-3, l2 = base-6 for the
  8x / 64x sparser layers — measured: without this, the upper-layer
  graphs go geometrically blind at 30x+ and descent recall halves),
  and the descent runs 2+2+5 so the BASE exploration budget equals
  the flat NSW's 5 rounds. The claim under test: a single GLOBAL
  entry + layered descent matches the per-probe LSH warm start's
  recall at equal base depth — the hierarchy replaces the serve-time
  hash lookup with a pure graph structure, which is what HNSW buys.

Recall is measured per factor against the EXACT top-_NB_TOPK of the
grown corpus for the pinned probes (a brute-force broadcast scan —
affordable at probe-set size, the h15_retrieval_metrics truth shape).

Usage: python tools/scaleprobe_vec_r12.py [factor ...] (default 10 30 100)
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from spark_glove_spark.operators.ann import (  # noqa: E402
    _BQ_TOPK,
    _NB_TOPK,
    _PL_SCALE,
    _bq_scored,
    _hnsw_search,
    _nsw_search,
)
from spark_glove_spark.registry import drain_deferred_unpersist  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402
from tools.scaleprobe_vec_r11 import PLANES, SF_DIR, build_emb_nx  # noqa: E402


def exact_topk(spark, d: str, probe_pred, k: int) -> set[tuple[int, int]]:
    """Exact (probe_id, vec_id) top-k of the grown corpus for the
    pinned probes — the quantized-integer truth both graph tiers are
    scored against (same fixed-point space as the searches)."""
    e = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
    qv = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * F.lit(float(_PL_SCALE)) + F.lit(0.5)),
    )
    zero = F.lit(0).cast("long")
    nn = F.aggregate(F.transform("qv", lambda x: x * x), zero, lambda a, x: a + x)
    base = e.select("vec_id", qv.alias("qv")).withColumn("nn", nn)
    probes = base.where(probe_pred).select(
        F.col("vec_id").alias("probe_id"), F.col("qv").alias("qp")
    )
    num = F.aggregate(
        F.zip_with("qv", "qp", lambda x, y: x * y), zero, lambda a, x: a + x
    )
    score = num.cast("double") / F.sqrt(F.col("nn").cast("double"))
    w = Window.partitionBy("probe_id").orderBy(F.col("s").desc(), "vec_id")
    rows = (
        base.crossJoin(F.broadcast(probes))
        .where(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", score.alias("s"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .collect()
    )
    return {(r["probe_id"], r["vec_id"]) for r in rows}


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [10, 30, 100]
    spark = get_spark("scaleprobe_vec_r12")
    spark.sparkContext.setLogLevel("ERROR")
    pinned = (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 10_000_000)
    dirs = {1: SF_DIR, **{n: build_emb_nx(spark, n) for n in factors}}

    print(
        f"{'n':>4s} {'rows':>8s} {'bq_s':>7s} {'planes':>6s} "
        f"{'nsw_bld':>8s} {'nsw_srch':>8s} {'nsw_rec':>7s} "
        f"{'hn_bld':>8s} {'hn_srch':>8s} {'hn_rec':>7s}"
    )
    for n in [1] + factors:
        d = dirs[n]
        rows = spark.read.parquet(os.path.join(d, "embeddings.parquet")).count()
        truth = exact_topk(spark, d, pinned, _NB_TOPK)
        drain_deferred_unpersist()

        t0 = time.time()
        _bq_scored(spark, d, probe_pred=pinned).where(
            F.col("rn") <= _BQ_TOPK
        ).count()
        bq_s = time.time() - t0
        drain_deferred_unpersist()

        planes = PLANES.get(n, round(math.log2(n)) + 4)

        t = {}
        t0 = time.time()
        nsw = {
            (r["probe_id"], r["vec_id"])
            for r in _nsw_search(
                spark, d, n_planes=planes, probe_pred=pinned, timings=t
            ).collect()
        }
        nsw_bld, nsw_srch = t["build_s"], time.time() - t0 - t["build_s"]
        nsw_rec = len(nsw & truth) / len(truth)
        drain_deferred_unpersist()

        t = {}
        t0 = time.time()
        hn = {
            (r["probe_id"], r["vec_id"])
            for r in _hnsw_search(
                spark,
                d,
                base_planes=planes,
                l1_planes=max(2, planes - 3),
                l2_planes=max(0, planes - 6),
                hops=(2, 2, 5),
                probe_pred=pinned,
                timings=t,
            ).collect()
        }
        hn_bld, hn_srch = t["build_s"], time.time() - t0 - t["build_s"]
        hn_rec = len(hn & truth) / len(truth)
        drain_deferred_unpersist()

        print(
            f"{n:4d} {rows:8d} {bq_s:7.2f} {planes:6d} "
            f"{nsw_bld:8.2f} {nsw_srch:8.2f} {nsw_rec:7.2f} "
            f"{hn_bld:8.2f} {hn_srch:8.2f} {hn_rec:7.2f}"
        )


if __name__ == "__main__":
    main()
