"""10x scale probe for the round-3 operator wave (PLANS.md evidence).

Builds a 10x-replicated copy of the tables the probed queries touch
(events / customer / documents — fresh surrogate keys, user_ids and
names deliberately UNCHANGED so per-key series get 10x deeper and
name groups 10x wider: the stress goes into the per-key/per-block
work, not just the scan), passes the other fixture tables through
untouched, then times each query warm (min-of-2) at sf0.1 and at 10x.
The ratio is the sandbox's closest stand-in for a 100 TB scaling
argument: near-linear (<=~10x on 10x data, minus constant overhead)
means no super-linear term is hiding in the plan.

Usage: python tools/scaleprobe_ops.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from spark_glove_spark import api  # noqa: E402
from spark_glove_spark.schemas import TABLES  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "c9_sessionize",
    "c9_ewma",
    "d12_heavy_hitters",
    "d13_anomaly_zscore",
    "d14_histogram",
    "h17_dsir_weights",
    "h17_quality_classifier",
    "c11_fuzzy_join",
    "a9_bucketed_join",
]

# table -> (surrogate key, per-copy shift)
_REPLICATE = {
    "events": ("event_id", 1_000_000_000),
    # orders shift is a multiple of 56 (= 8*7) so the %7 change-set
    # classes and the %2 split of the txlog queries replicate with the
    # table — every copy contributes the same U/D/I mix
    "orders": ("o_orderkey", 560_000_000),
    "customer": ("c_custkey", 100_000_000),
    "documents": ("doc_id", 10_000_000),
    # vec_id shift is a multiple of 100 so the `vec_id % 100 == 0`
    # probe sets of the ANN queries replicate with the corpus (10x
    # probes x 10x corpus — the stress probes the candidate fan-out)
    "embeddings": ("vec_id", 10_000_000),
}


def build_10x(spark, sf_dir: str) -> str:
    out = f"/tmp/scaleprobe10xv2_{os.path.basename(sf_dir.rstrip('/'))}"
    marker = os.path.join(out, "_done")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        df = spark.read.parquet(src)
        if t in _REPLICATE:
            key, shift = _REPLICATE[t]
            df = df.crossJoin(
                spark.range(10).select(F.col("id").alias("rep"))
            ).select(
                (F.col(key) + F.col("rep") * shift).alias(key),
                *[c for c in df.columns if c != key],
            )
            df.repartition(32).write.mode("overwrite").parquet(dst)
        else:
            df.write.mode("overwrite").parquet(dst)
    open(marker, "w").close()
    return out


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scaleprobe_ops")
    spark.sparkContext.setLogLevel("ERROR")
    big = build_10x(spark, sf_dir)

    def run(name: str, d: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            api.REGISTRY[name].fn(spark, d).count()
            best = min(best, time.time() - t0)
        return best

    print(f"{'query':30s} {'sf0.1':>7s} {'10x':>7s} {'ratio':>6s}")
    for name in names:
        t1 = run(name, sf_dir)
        t10 = run(name, big)
        print(f"{name:30s} {t1:7.2f} {t10:7.2f} {t10 / t1:5.1f}x")


if __name__ == "__main__":
    main()
