"""30x/100x scale ladder for the r11 watch items (VERDICT r10 item 6).

Extends the 10x probe (tools/scaleprobe_ops.py) one decade further on
the three queries whose 100 TB claims concentrate, with two probe
styles chosen to measure the PLAN rather than an adversary:

* REALISTIC growth (h17_span_dedup_bucketed, pipeline_streaming_
  curate): documents replicated with a per-copy token prefix, so
  content across copies is UNIQUE — candidate pairs stay proportional
  to within-copy duplicates x N. The existing 10x identical-replica
  probe is the deliberate maximal-collision regime; at 100x identical
  replicas every replica pairs with every other INSIDE one band
  bucket, so the pair term is quadratic BY CONSTRUCTION and the probe
  would measure the planted adversary, not the plan. Real corpus
  growth adds mostly-new content; this style models that.

* INDEX growth (h16_ivf_persisted's build/probe path): embeddings
  replicated verbatim (clusters get denser), n_lists grown ~ sqrt(n)
  (the FAISS heuristic), probe set PINNED to the base corpus's 20
  probes. The claim under test is the partition-prune ratio: the
  fraction of index rows a probe batch scans should track
  n_probe/n_lists — i.e. FALL as the corpus and list count grow —
  and probe wall-clock should grow far slower than the corpus.

Usage: python tools/scaleprobe_r11.py [factor ...]   (default: 30 100)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from spark_glove_spark import api  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DOC_QUERIES = ["h17_span_dedup_bucketed", "pipeline_streaming_curate"]


def build_docs_nx(spark, n: int) -> str:
    """documents x n with per-copy UNIQUE content: every token gets a
    per-copy prefix, so within-copy duplicate structure replicates
    (each copy carries the fixture's own dups) while cross-copy
    near-dup pairs are impossible — pair work grows ∝ n, the realistic
    regime. doc_id shift keeps ids disjoint."""
    out = f"/tmp/scaleprobe_r11_docs{n}x"
    marker = os.path.join(out, "_done")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    rep = spark.range(n).select(F.col("id").alias("rep"))
    tagged = (
        d.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda x: F.concat(
                        F.lit("r"), F.col("rep").cast("string"), F.lit("_"), x
                    ),
                ),
                " ",
            ).alias("text"),
            *[c for c in d.columns if c not in ("doc_id", "text")],
        )
    )
    tagged.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    open(marker, "w").close()
    return out


def build_emb_nx(spark, n: int) -> str:
    """embeddings x n, vectors verbatim (clusters densify), vec_id
    shift a multiple of 100 so the declared probe predicate replicates;
    the probe SET is pinned to the base ids separately."""
    out = f"/tmp/scaleprobe_r11_emb{n}x"
    marker = os.path.join(out, "_done")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    rep = spark.range(n).select(F.col("id").alias("rep"))
    big = e.crossJoin(rep).select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        *[c for c in e.columns if c != "vec_id"],
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


def probe_docs(spark, factors: list[int]) -> None:
    print(f"{'query':30s} {'base':>7s} " + " ".join(f"{n}x".rjust(8) for n in factors))
    dirs = {n: build_docs_nx(spark, n) for n in factors}
    for name in DOC_QUERIES:
        row = [f"{name:30s}"]
        base = _timed(lambda: api.REGISTRY[name].fn(spark, SF_DIR).count())
        row.append(f"{base:7.2f}")
        for n in factors:
            t = _timed(lambda d=dirs[n]: api.REGISTRY[name].fn(spark, d).count())
            row.append(f"{t:6.2f}({t / base:4.1f}x)")
        print(" ".join(row))


def probe_ivf(spark, factors: list[int]) -> None:
    """Build a persisted IVF index per decade with n_lists ~ 10*sqrt(n)
    and measure: probe wall (pinned 20-probe batch, min-of-2), and the
    fraction of index ROWS the pruned scan touches (footer metadata of
    wanted list dirs / all dirs)."""
    import glob
    import math
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from spark_glove_spark.operators.ann import (
        _probe_lists,
        _read_centroid_literals,
        ivf_build_index,
        ivf_probe_index,
    )

    print(f"{'n':>4s} {'rows':>8s} {'n_lists':>7s} {'build_s':>8s} "
          f"{'probe_s':>8s} {'frac_scanned':>12s}")
    for n in [1] + factors:
        d = SF_DIR if n == 1 else build_emb_nx(spark, n)
        e = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        rows = e.count()
        n_lists = max(10, int(10 * math.sqrt(n)))
        probes = e.where(
            (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 10_000_000)
        ).select(F.col("vec_id").alias("probe_id"), "embedding")
        path = tempfile.mkdtemp(prefix=f"ivfprobe_{n}x_")
        t0 = time.time()
        ivf_build_index(e, path, n_lists=n_lists, seed=42)
        build_s = time.time() - t0
        probe_s = _timed(
            lambda: ivf_probe_index(spark, path, probes, k=10, n_probe=3).count()
        )
        cents = _read_centroid_literals(spark, path)
        wanted = {
            r["list_id"]
            for r in _probe_lists(probes, cents, 3)
            .select("list_id")
            .distinct()
            .collect()
        }

        def dir_rows(list_dir: str) -> int:
            return sum(
                pq.read_metadata(f).num_rows
                for f in glob.glob(
                    os.path.join(list_dir, "*.parquet"), recursive=True
                )
            )

        per_list = {
            int(os.path.basename(p).split("=")[1]): dir_rows(p)
            for p in glob.glob(os.path.join(path, "lists", "list_id=*"))
        }
        frac = sum(per_list[w] for w in wanted) / sum(per_list.values())
        print(f"{n:4d} {rows:8d} {n_lists:7d} {build_s:8.1f} "
              f"{probe_s:8.2f} {frac:12.3f}")
        shutil.rmtree(path, ignore_errors=True)


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [30, 100]
    spark = get_spark("scaleprobe_r11")
    spark.sparkContext.setLogLevel("ERROR")
    probe_ivf(spark, factors)
    probe_docs(spark, factors)


if __name__ == "__main__":
    main()
