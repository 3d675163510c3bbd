"""10x/30x scale probe for the r11 vector-search tail (BQ + NSW).

Probe style: embeddings replicated verbatim (the id shift is a
multiple of 100 ONLY for the base copy, so the probe set is PINNED to
the base corpus's probes — at 100 TB you grow the corpus, not the
query batch). Knob schedules follow each index family's standard
scaling law:

* h16_bq_portable — NO knob: the Hamming scan is a linear pass over
  8-byte codes, so wall should grow ~ n (the whole point of BQ is
  that the linear pass is cheap enough to afford).
* h16_nsw_portable (via _nsw_search) — n_planes ~ log2(n) per decade
  (1x: 4 planes/16 buckets, 10x: 7/128, 30x: 9/512) keeps bucket
  occupancy ~constant, so edge-build pairs per node stay flat and
  build wall grows ~ n; beam search cost is frontier-bounded and
  should stay ~flat (its only n-term is the edge-table scan each hop,
  which a src-bucketed layout prunes in production).

Usage: python tools/scaleprobe_vec_r11.py [factor ...]  (default 10 30)
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from spark_glove_spark.operators.ann import (  # noqa: E402
    _BQ_TOPK,
    _bq_scored,
    _nsw_search,
)
from spark_glove_spark.registry import drain_deferred_unpersist  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANES = {1: 4, 10: 7, 30: 9, 100: 10}


def build_emb_nx(spark, n: int) -> str:
    """embeddings x n with REALISTIC growth: each replica's vector gets
    a deterministic per-(replica, dim) jitter, so copies land in
    different LSH buckets / Hamming neighborhoods the way genuinely
    new vectors would. Verbatim replication is the maximal-collision
    adversary (every copy shares its original's bucket exactly, so
    bucket-join pair work picks up an x n^2 term BY CONSTRUCTION —
    measured 6.5x wall for 3.3x rows on the NSW build); the same
    regime-choice argument as scaleprobe_r11's prefixed documents."""
    out = f"/tmp/scaleprobe_vec_r11_emb{n}x"
    marker = os.path.join(out, "_done")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    rep = spark.range(n).select(F.col("id").alias("rep"))
    # jitter varies per (vector, replica, dim): a per-replica-constant
    # offset is itself an adversary (it biases every dot's sign the
    # same way, concentrating a whole replica into a few buckets —
    # measured 5x worse than verbatim). LCG-style mix over all three.
    jittered = F.transform(
        "embedding",
        lambda x, i: (
            x.cast("double")
            + ((F.col("vec_id") * 7 + F.col("rep") * 31 + i) % 13 - 6)
              .cast("double") * 0.02
        ).cast("float"),
    )
    # replica 0 stays VERBATIM: it is the base corpus whose probes the
    # ladder pins (the vec_id < 10M conjunct selects it), so the n=1
    # row (raw SF_DIR) and every n>=10 row time identical probe
    # vectors against identical base content
    jitter = F.when(F.col("rep") == 0, F.col("embedding")).otherwise(jittered)
    big = e.crossJoin(rep).select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        jitter.alias("embedding"),
        *[c for c in e.columns if c not in ("vec_id", "embedding")],
    )
    big.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    open(marker, "w").close()
    return out


def _timed(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [10, 30]
    spark = get_spark("scaleprobe_vec_r11")
    spark.sparkContext.setLogLevel("ERROR")
    # base-copy probes only: replicas shift vec_id by >= 10M
    pinned = (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 10_000_000)
    dirs = {1: SF_DIR, **{n: build_emb_nx(spark, n) for n in factors}}

    print(f"{'n':>4s} {'rows':>8s} {'bq_s':>7s} "
          f"{'planes':>6s} {'nsw_build_s':>11s} {'nsw_search_s':>12s}")
    for n in [1] + factors:
        d = dirs[n]
        rows = spark.read.parquet(os.path.join(d, "embeddings.parquet")).count()

        bq_s = _timed(
            lambda: _bq_scored(spark, d, probe_pred=pinned)
            .where(F.col("rn") <= _BQ_TOPK)
            .count()
        )

        planes = PLANES.get(n, round(math.log2(n)) + 4)

        def nsw_once():
            t = {}
            t0 = time.time()
            _nsw_search(
                spark, d, n_planes=planes, probe_pred=pinned, timings=t
            ).count()
            return t["build_s"], time.time() - t0 - t["build_s"]

        builds, searches = zip(*(nsw_once() for _ in range(2)))
        # direct _nsw_search calls bypass the @query-wrapper drain; one
        # corpus-sized persisted base would otherwise pin per call
        drain_deferred_unpersist()
        print(f"{n:4d} {rows:8d} {bq_s:7.2f} {planes:6d} "
              f"{min(builds):11.2f} {min(searches):12.2f}")


if __name__ == "__main__":
    main()
