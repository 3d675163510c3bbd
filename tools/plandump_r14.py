"""Dump .explain("formatted") for every benched query → plans/r14/.

Usage: python tools/plandump_r14.py <suffix>   (suffix = before|after)

Captures the optimizer-facing physical plan for each of the 19 bench
entries (the streaming/pipeline composites run their side effects
while building the returned frame; the captured plan is the final
returned computation, which is what the bench's noop sink drains).
glove_fit has no single plan (iterative trainer) — PLANS.md carries
its per-iteration shape instead.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_glove_spark import api  # noqa: E402
from spark_glove_spark.operators.cooccurrence import cooccurrence_matrix  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402
from spark_glove_spark.sources import table  # noqa: E402

BENCH_QUERIES = [
    "d1_pricing_summary",
    "c2_shuffle_join",
    "e2_topk_per_group",
    "h3_cooccurrence_topk",
    "h10_tfidf",
    "h13_minhash_neardup",
    "h15_knn_bruteforce",
    "h16_lsh_ann",
    "i1_tumbling_window",
    "c8_asof_join",
    "h17_span_dedup_bucketed",
    "ml_naive_bayes",
    "graph_kcore",
    "pipeline_curate_corpus",
    "pipeline_streaming_curate",
    "h16_bq_portable",
    "pipeline_rag_serving",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plandump_r14")
    spark.sparkContext.setLogLevel("ERROR")
    qs = api.queries()
    names = only if only else BENCH_QUERIES + ["glove_cooc_build_w10"]
    for name in names:
        spark.sparkContext.setJobDescription(f"plandump:{name}")
        if name == "glove_cooc_build_w10":
            df = cooccurrence_matrix(table(spark, sf_dir, "documents"), window=10)
        else:
            df = qs[name](spark, sf_dir)
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
