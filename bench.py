"""Headline benchmark — one JSON line for the driver (BENCH_r{N}.json).

Runs the engine's representative queries at $SPARK_GRAFT_SF_DIR
(default sf0.1) on local[$SPARK_GRAFT_CPUS]: the relational core
(TPC-H Q1 shape, big shuffle join, window top-k), the GloVe pipeline
(window-10 co-occurrence build and a dim-50 fit), the LLM-pipeline
operators (MinHash near-dup, TF-IDF, brute-force kNN), and a streaming
window aggregation. Results go to the noop sink so timings measure
compute + shuffle, not driver materialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from spark_glove_spark import api  # noqa: E402
from spark_glove_spark.glove import Glove  # noqa: E402
from spark_glove_spark.operators.cooccurrence import cooccurrence_matrix  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402
from spark_glove_spark.sources import table  # noqa: E402

# BASELINE.md "Our baseline — MEASURED at M7" per-query seconds; the
# bench output carries ratios_vs_baseline so regressions show up in
# one file (VERDICT r1 item 7). Query set must stay stable or baseline
# comparability breaks.
BASELINE_SEC = {
    "d1_pricing_summary": 2.4,
    "c2_shuffle_join": 1.5,
    "e2_topk_per_group": 1.1,
    "h3_cooccurrence_topk": 1.9,
    "h10_tfidf": 1.1,
    "h13_minhash_neardup": 5.5,
    "h15_knn_bruteforce": 1.0,
    "h16_lsh_ann": 1.8,
    "i1_tumbling_window": 2.5,
    "c8_asof_join": 0.7,
    "glove_cooc_build_w10": 2.4,
    "glove_fit_d50_w10_it5": 10.7,
    # r8 additions (VERDICT r7 item 7): the three heaviest r7-family
    # operators, baselined at their measured min-of-3 on the r8 host
    # (BASELINE.md "Round-8 bench expansion") so regressions in the
    # new surface are caught by BENCH, not only by probes.
    "h17_span_dedup_bucketed": 3.8,
    "ml_naive_bayes": 1.8,
    "graph_kcore": 2.0,
    # r10 additions (VERDICT r9 item 7): the two user-story capstones —
    # the batch curate funnel and the 4-epoch streaming ingest (quality
    # gate -> online near-dup -> exactly-once txlog sink -> incremental
    # monitor, all inside the timed call). Baselined at measured
    # min-of-3 on the r10 host (BASELINE.md "Round-10 bench expansion").
    "pipeline_curate_corpus": 6.1,
    "pipeline_streaming_curate": 14.8,
    # r12 addition (VERDICT r11 item 2): the vector-index flagship —
    # the binary-quantization tier's code-only Hamming scan +
    # shortlist rerank — joins the contract so the r10-r11 ANN
    # surface has BENCH regression tracking, not only scale probes.
    # Baselined at measured min-of-3 on the r12 host (BASELINE.md
    # "Round-12 bench expansion"; cold first rep 7.4 s, settled
    # 2.45-2.9 s).
    "h16_bq_portable": 2.5,
    # r13 addition (VERDICT r12 item 4): the retrieval flagship — the
    # RAG serving capstone (chunk -> integer chunk embeddings -> BQ
    # code table -> Hamming shortlist + rerank -> chunk BM25 -> RRF ->
    # per-row recall/RR) joins the contract so the round's headline
    # composite has per-round BENCH regression tracking like the
    # curate capstones. Baselined at the r13 host's measured reps
    # [19.0, 10.1, 9.9, 8.7] (cold first rep = codegen for the packed
    # code expressions + chunker; min-of-3 settles at 8.7-10.1 s) —
    # BASELINE.md "Round-13 bench expansion".
    "pipeline_rag_serving": 8.7,
}

# The original 12-entry suite (r1 contract: 16.1 s min-of-N total);
# totals for this subset stay comparable across every round.
LEGACY12 = [
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
    "glove_cooc_build_w10",
    "glove_fit_d50_w10_it5",
]

HEADLINE = [
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


def _drain(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM + parquet-footer warmup so q1 doesn't pay session startup
    table(spark, sf_dir, "region").count()

    # Each entry is timed and the MIN is reported: the shared host
    # shows 2-4x transient load swings (measured: identical code,
    # 194s -> 77s -> 47s across consecutive runs), and min-of-N is the
    # standard way to measure the engine rather than the neighbor.
    # Cheap queries (< ~2.5 s baseline) get a third rep: their
    # absolute noise floor (JIT, first-touch page faults, a neighbor
    # burst) rivals their runtime, and one bad pair is exactly how r2
    # recorded h15 at 1.61x while the code was unchanged and min-of-3
    # reproduces 0.65x (r3 bisect — the plan never regressed).
    qs = api.queries()
    times: dict[str, float] = {}

    def timed(name, fn) -> None:
        # h13 gets min-of-3 despite its 5.5 s baseline (VERDICT r3
        # item 3): its r1/r2 numbers turned out to be warm-cache
        # artifacts (plan-equality cache hits across reps before the
        # deferred-unpersist hygiene landed), so its honest cold time
        # deserves the same repetition as the cheap queries.
        # glove_fit joins the min-of-3 club in r6 (VERDICT r5 item 7):
        # the r5 driver run recorded 7.04 s against a 4.7-5.7 s noise
        # band while the closing min-of-3 at the same HEAD reproduced
        # 5.00 s — a second rep is not enough to shed a neighbor burst
        # on the one entry that dominates the total.
        # The two capstones' BASELINES are min-of-3 with a documented
        # cold first rep (BASELINE.md r10: [9.7, 6.2, 6.1] and
        # [24.1, 15.4, 14.8]) — timing them min-of-2 would compare a
        # cold+1 reading against a min-of-3 contract, a systematic
        # ~4% bias toward false regression (r10 review finding).
        reps = (
            3
            if (
                BASELINE_SEC.get(name, 99.0) < 2.5
                or name == "h13_minhash_neardup"
                or name == "glove_fit_d50_w10_it5"
                or name.startswith("pipeline_")
            )
            else 2
        )
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)

    for name in HEADLINE:
        timed(name, lambda n=name: _drain(qs[n](spark, sf_dir)))

    docs = table(spark, sf_dir, "documents")
    timed(
        "glove_cooc_build_w10",
        lambda: _drain(cooccurrence_matrix(docs, window=10)),
    )
    timed(
        "glove_fit_d50_w10_it5",
        lambda: Glove(
            dim=50, window=10, iterations=5, min_count=5, seed=42
        ).fit(docs).vectors.count(),
    )

    total = round(sum(times.values()), 3)
    ratios = {
        name: round(t / BASELINE_SEC[name], 2)
        for name, t in times.items()
        if name in BASELINE_SEC
    }
    print(
        json.dumps(
            {
                "metric": "headline_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": times,
                "ratios_vs_baseline": ratios,
                # the r1-contract subset (16.1 s) — comparable across
                # all rounds; `value` covers the full 19-entry suite
                # (r13 contract 55.8 s = r12's 47.1 s + the RAG
                # capstone's 8.7 s, BASELINE.md)
                "legacy12_total": round(
                    sum(times[n] for n in LEGACY12 if n in times), 3
                ),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
