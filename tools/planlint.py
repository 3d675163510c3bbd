"""Plan lint: sweep every declared BATCH query's physical plan for
scale smells (PLANS.md's audit, automated).

Smells checked:
  * CartesianProduct / unhinted BroadcastNestedLoopJoin — O(n*m) joins
    (allowlisted where the BNLJ IS the documented design: broadcast-
    probe kNN scans and the §2 C6/C7 contract demos);
  * BatchEvalPython — row-at-a-time Python in the plan (allowlisted
    for the §2 J1 scalar-UDF contract demo only);
  * > MAX_EXCHANGES shuffles in one query — fused-stage queries
    should not fan into shuffle chains silently;
  * UNPARTITIONED window specs (VERDICT r8 item 3) — a window with no
    PARTITION BY funnels every row through ONE task; at fact scale
    that is a single-executor sort bottleneck. Allowlisted only where
    the window's input is provably bounded (key-domain aggregates,
    168-cell profiles, ≤k-row frames) — the class that let
    e12_rfm's three global ntiles ship unflagged through r8.

Queries whose *declaration* executes work (streaming drains,
iterative trainers, sink roundtrips) are skipped by tag/name — their
plan hygiene is asserted by dedicated pytest guards instead.

Usage: python tools/planlint.py [sf_dir]   (exit 1 on new smells)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_glove_spark import api  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402

# Declarations that RUN (streams, loops, writes) rather than build a
# lazy plan; each has its own plan/property guard in tests/.
SKIP_TAGS = {"streaming", "training", "cdc", "fault-tolerance"}
SKIP_PREFIXES = (
    "i", "glove_", "mm_", "pipeline_", "graph_", "h17_bpe_train",
    "a3_", "a5_", "a7_", "a8_", "a9_", "a11_", "a12_", "a13_",
    "h16_ivf", "h16_pq", "h13_semantic", "clustering_", "h17_quality_classifier", "a14_",
    "h6_", "skew_",
)

# BNLJ/cartesian by documented design (broadcast-probe scans + the
# C6/C7 cross/theta-join contract rows).
BNLJ_OK = {
    "c6_theta_self_join",
    "c7_cross_join",
    "h15_knn_bruteforce",
    # same broadcast-probe crossJoin design as h15_knn_bruteforce,
    # over the 0.4x pre-filtered corpus (r10 review finding: the new
    # query shipped un-allowlisted — planlint red at its own HEAD)
    "h15_knn_filtered",
    "h15_range_search",
    "h15_mmr_rerank",
    "h13_embedding_neardup",
    "h16_lsh_ann",
    "h16_int8_quant",
    "h16_quantized_knn",
    "h8_analogy",
    "h7_topk_cosine",
    "d2_global_agg",  # scalar-broadcast crossJoin
    # BNLJ against a SCALAR broadcast aggregate (corpus size, global
    # bounds, grand totals — O(n x 1)) or a tiny bounded dim (g3's
    # 25-row nation theta self-join): verified by reading each plan;
    # the lint pins them so a real two-table BNLJ can never hide
    # behind the same name.
    "d14_histogram",
    "g3_edit_distance",
    "h10_bm25",
    "h10_tfidf",
    "h17_domain_mix_weights",
    "h17_dsir_weights",
    "h17_lm_quality_score",
    "sql_tpch_q22",
    # broadcast-probe / broadcast-centroid scans (h15 family) and the
    # scalar token-total broadcast in the subsampler
    "h15_knn_classifier",
    "h15_centroid_classifier",
    "h15_hard_negatives",  # broadcast-anchor brute scan, by design
    "h16_opq_ann",  # broadcast-probe ADC scan, same design as h16_quantized_knn
    "h2_frequent_subsample",
    "h10_tfidf_doc_sim",  # corpus-size scalar broadcast
    # r5 portable twins: broadcast-centroid/probe cross joins against
    # k tiny rows are the documented assignment/ADC design (same
    # family as the h15/h16 entries above)
    "h13_semdedup_portable",
    "ml_kmeans_portable",
    "h15_mmr_portable",
    "h16_ivf_portable",
    "h16_pq_portable",
    "h16_opq_portable",  # r6 twin: same broadcast-probe ADC crossJoin as pq
    # r7 additions, each read from the printed plan:
    "h9_matryoshka_truncate",  # broadcast-probe scan, same design as h7
    "sql_tpch_q11_shape",  # grand-total scalar broadcast (HAVING fraction)
    "ml_naive_bayes",  # langs x vocab probability-table cross join — both
    # sides bounded (|langs| x |vocab| rows); the CLASSIFIER'S model
    # table, not a data-pair structure
    # r7 statistics wave: every BNLJ is a 1-2-row TOTALS broadcast
    # cross-joined into a bounded domain frame (value domain / bins /
    # contingency cells) — the d2_global_agg class; the totals frames
    # themselves now derive from the small aggregates, never from a
    # second corpus scan (planlint round-7 fix)
    "h15_rrf_fusion",  # broadcast-probe scan, same design as h7/h9
    "d22_ks_drift",
    "d23_psi_drift",
    "d24_chi2_association",
    "d25_mutual_information",
    "d26_auc_ranksum",
    "d28_benford",
    "d33_seasonal_profile",  # grand-mean scalar broadcast over the
    # checkpointed 168-cell profile — same totals class as above
    "d34_cusum_changepoint",  # extremum/argmax scalar broadcasts over
    # the persisted hourly-bucket cusum frame (<= 8760 rows/year)
    # r11 vector-search tail: the BQ Hamming scan is the broadcast-
    # probe design (h15 class) over 8-byte CODES, and the metrics
    # query embeds both that scan and the h15 exact-truth scan
    "h16_bq_portable",
    # same broadcast-probe code scan, over the ~40% label-filtered
    # candidate side (the h15_knn_filtered precedent one tier down)
    "h16_bq_filtered",
    "h15_retrieval_metrics",
    # KMV sketch: 1-row totals/kth-min crossjoins (the d2_global_agg
    # class) feeding the union/intersection estimates
    "d35_kmv_sketch",
    # hybrid retrieval: ONE scalar-stats broadcast crossJoin (the h10
    # BM25 totals class; the dense side is all equi-joins)
    "h15_hybrid_retrieval",
    # late-interaction MaxSim: the unit-pair fan-out broadcasts the
    # tiny probe-unit side against candidate units (docstring plan
    # shape) — shipped un-allowlisted at its own commit (9e7614f),
    # the r10-review failure class again; caught by this sweep
    "h15_maxsim",
}
PYTHON_OK = {"j1_scalar_udf", "j6_udtf"}  # Python IS the J1/J6 contract
MAX_EXCHANGES = 8
# Multi-phase pipelines with audited shuffle chains: recorded ceilings
# re-measured under the SHUFFLE-ONLY metric (broadcasts excluded) so
# the caps are tight — any NEW shuffle trips the lint.
EXCHANGE_ALLOWANCE = {
    "h10_bm25": 13,
    "h14_similarity_join": 10,
    # printed plan re-expands the persisted tf/v subtrees under each
    # InMemoryRelation consumer; the executed DAG reuses them. r4: the
    # champion-list candidate stage adds two more consumers of v
    # (champ window + cands join), each re-printing the persisted
    # subtree — executed shuffles stay ~a dozen.
    "h10_tfidf_doc_sim": 53,
    # same artifact: the persisted hashed-gram stream is printed under
    # each of its three consumers (nd / tot / dupw); executed DAG
    # shuffles are ~10 (3 aggs, dup join, island window, 2 stat aggs,
    # 2 final joins) for a 3-rung ladder.
    "h17_span_dedup_multi": 22,
    # r7: persisted-subtree re-expansion in the printed plan (the
    # h10_tfidf_doc_sim artifact) — executed shuffles are far fewer:
    # naive bayes executes ~6 (vocab distinct, two count aggs, score
    # agg, argmax window, confusion agg); the estimator executes ~7
    # (sig agg, band join, 4 sig/set joins, output); the bigram LM
    # executes ~4 (two count aggs, score join agg, doc agg)
    # (18 after persisting tok: each of the four InMemoryRelation
    # consumers re-prints the persisted explode subtree)
    "ml_naive_bayes": 18,
    "h13_minhash_jaccard_estimate": 10,
    "h17_bigram_lm_perplexity": 9,
    # d25 takes three entropy/MI aggregates + two marginal aggs, ALL
    # over the checkpointed |langs|x|sources| (~80-row) contingency
    # leaf — the corpus is scanned exactly once upstream of it
    "d25_mutual_information": 10,
    # d31 estimates THREE key columns: per column one 64-row register
    # aggregate + its 1-row fold + the exact-truth count distinct (the
    # calibration column) — 3 x 3 exchanges, every one over a <=64-row
    # or distinct-key domain
    "d31_hll_portable": 9,
    # d34's printed plan re-expands the persisted cusum frame under
    # each of its five consumers (ext, argmax, argmin, the mu/n head,
    # and the final combine); every executed window/agg runs over the
    # hourly-bucket domain (one corpus scan upstream)
    "d34_cusum_changepoint": 18,
    # r11 re-audit (ADVICE r10): the r10 18-Exchange readings described
    # the persist/InMemoryRelation-era plans, whose printed form
    # re-expanded the persisted value-domain/prefix-sum subtrees under
    # every consumer. scale_ops now pins those frames with an EAGER
    # localCheckpoint (commit a0754c7), which truncates lineage to an
    # ExistingRDD scan — the printed plan equals the executed DAG and
    # both queries measure exactly 7 shuffles at HEAD (ONE fact scan ->
    # groupBy(value) shuffle, rangepartitioning + hash(_gp_pid) window,
    # two SinglePartition scalar aggs over the distinct-value domain).
    "d22_ks_drift": 7,
    "d26_auc_ranksum": 7,
    # r11 vector-search tail. The metrics query runs TWO ranked
    # pipelines (the BQ system tier + the exact truth tier) and the
    # label join/aggregate: 2 shortlist/topk windows + truth window +
    # metric agg + the id-join re-rank — 12 printed, each over
    # probes x shortlist rows at most beyond the two corpus scans.
    "h15_retrieval_metrics": 12,
    # KMV sketch: segment sketches, union sketch, exact tiers and the
    # three 1-row estimate combines — every aggregate/window runs over
    # the distinct-customer domain or a <= k-row sketch, never a fact
    # window; 14 printed at sf0.001
    "d35_kmv_sketch": 14,
    # hybrid retrieval: the persisted (doc,word) aggregate re-prints
    # under its four consumers (tf/df/dl/scored — the h10_bm25
    # artifact) plus the dense lookup chain; executed shuffles ~10
    # (tf agg, dl, df, stats, bm agg, vocab distinct, wmap join,
    # wscore agg, dense agg, two 20-row TakeOrdered + fusion join)
    "h15_hybrid_retrieval": 20,
    # NSW: graph build (2 bucket self-joins + 2 per-table degree
    # windows + edge distinct) executes eagerly at declaration (the
    # per-hop localCheckpoint discipline); the RETURNED plan still
    # prints the persisted base under each consumer plus the final
    # frontier scoring/window chain — 16 printed, executed hops are
    # checkpoint-truncated (beam rows <= probes x beam x degree).
    "h16_nsw_portable": 16,
    # HNSW: identical artifact to the NSW twin — the three per-layer
    # edge builds execute eagerly at declaration behind eager
    # localCheckpoints, and every descent hop truncates its lineage the
    # same way; the RETURNED plan re-prints the persisted base under
    # each consumer of the LAST base-layer hop (cand distinct, probe
    # join, scoring join, final/np windows) — 16 printed at sf0.001,
    # executed hop work is frontier-bounded (<= probes x beam x degree
    # rows per round, measured flat to 100x in PLANS.md r12).
    "h16_hnsw_portable": 16,
}


# Unpartitioned windows by audited design — every name here runs its
# global window over a BOUNDED domain (read from each plan / source),
# never the fact table; the lint pins them so a full-fact global
# window can never hide behind the same name. Swept r10 (the rule
# landed r9 un-swept — VERDICT r9 item 2); one documented bound per
# entry, same discipline as EXCHANGE_ALLOWANCE.
GLOBAL_WINDOW_OK: set[str] = {
    # lag over the MONTHLY revenue series — pre-aggregated month
    # domain (TPC-H orderdate spans 1992–1998: <= ~84 rows); the only
    # fact-sized work is the map-side-combinable groupBy upstream
    "d18_percent_change",
    # extremum/argmax/argmin windows over the persisted HOURLY-bucket
    # cusum frame (<= 8760 rows/year); 6 printed specs = the persisted
    # frame re-printed under each consumer, all the same bounded domain
    "d34_cusum_changepoint",
    # vocab-domain global rank: the window input is the post-minCount
    # vocabulary aggregate, hard-truncated to the top-400k terms
    # before ranking — never the token stream
    "d8_vocabulary",
    # trailing-7d RANGE frame over the DAILY revenue series
    # (pre-aggregated day-index domain: <= ~2,500 rows for 1992–1998)
    "e9_interval_range_frame",
    # per-retriever rank windows over the UNION OF TOP-N candidate
    # lists (<= n_retrievers * k rows per query), never the corpus
    "h15_rrf_fusion",
    # vocab-domain rank (same top-400k-truncated vocabulary aggregate
    # as d8) feeding the GloVe block assignment
    "h5_glove_fit",
    "h5_glove_fit_micro",
    # vocab-domain rank for the embedding lookup table — bounded by
    # the trained vocabulary, never the document stream
    "h9_doc_embedding",
    # two rank windows over the <= _HY_TOPN(=20)-row candidate lists
    # that orderBy+limit (TakeOrderedAndProject) already cut — never
    # the corpus
    "h15_hybrid_retrieval",
}


def _unpartitioned_windows(plan: str) -> int:
    """Count window specs with NO partition columns in a physical-plan
    string. A printed spec is ``windowspecdefinition(part..., ord ASC
    NULLS FIRST, ..., frame)``; partition columns precede the sort
    items, so a spec whose FIRST argument is itself a sort item (its
    first comma-free segment carries ASC/DESC) has no partitioning.
    Complex order expressions containing commas can evade this (their
    first segment looks like a partition column) — a false NEGATIVE,
    never a false alarm; every declared query orders by plain
    columns."""
    n = 0
    for chunk in plan.split("windowspecdefinition(")[1:]:
        first = chunk.split(",", 1)[0]
        if " ASC" in first or " DESC" in first:
            n += 1
    return n


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("planlint")
    spark.sparkContext.setLogLevel("ERROR")
    problems = []
    n_checked = 0
    for name, q in sorted(api.REGISTRY.items()):
        if SKIP_TAGS & set(q.tags) or name.startswith(SKIP_PREFIXES):
            continue
        try:
            plan = (
                q.fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as exc:  # noqa: BLE001 — report, don't die
            problems.append(f"{name}: plan build failed: {exc}")
            continue
        n_checked += 1
        if "CartesianProduct" in plan and name not in BNLJ_OK:
            problems.append(f"{name}: CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            problems.append(f"{name}: BroadcastNestedLoopJoin")
        if "BatchEvalPython" in plan and name not in PYTHON_OK:
            problems.append(f"{name}: row-at-a-time Python (BatchEvalPython)")
        # count SHUFFLE exchanges only: BroadcastExchange is not a
        # shuffle and ReusedExchange is a reuse marker
        n_ex = (
            plan.count("Exchange")
            - plan.count("ReusedExchange")
            - plan.count("BroadcastExchange")
        )
        cap = EXCHANGE_ALLOWANCE.get(name, MAX_EXCHANGES)
        if n_ex > cap:
            problems.append(f"{name}: {n_ex} Exchanges (> {cap})")
        n_gw = _unpartitioned_windows(plan)
        if n_gw and name not in GLOBAL_WINDOW_OK:
            problems.append(f"{name}: {n_gw} unpartitioned window spec(s)")
    print(f"planlint: {n_checked} plans checked, {len(problems)} problems")
    for p in problems:
        print(f"  SMELL {p}")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
