"""Teeth for the analytics + scale-ops wave (operators/analytics.py,
operators/scale_ops.py) beyond their DuckDB oracles: the properties
the oracle can't see — bloom pruning actually happening, Z-order
envelopes actually tight, funnel monotonicity, MERGE accounting, SCD2
interval integrity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_glove_spark import api
from spark_glove_spark.operators.scale_ops import _BLOOM_SEEDS, _bloom_words
from spark_glove_spark.sources import table

SF_DIR = "/root/testdata/sf0.001"


def test_funnel_counts_are_monotone(spark):
    rows = {
        r["stage"]: r
        for r in api.REGISTRY["e6_funnel"].fn(spark, SF_DIR).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_users"] >= rows[2]["n_users"] >= rows[3]["n_users"] > 0
    assert rows[1]["conversion"] == 1.0
    assert all(0.0 < rows[s]["conversion"] <= 1.0 for s in rows)


def test_scd2_intervals_are_contiguous_and_deduped(spark):
    df = api.REGISTRY["e8_scd2_history"].fn(spark, SF_DIR)
    bad_order = df.where(F.col("valid_to") <= F.col("valid_from")).count()
    assert bad_order == 0
    # exactly one open row per user, and consecutive states never repeat
    per_user = (
        df.groupBy("user_id")
        .agg(F.sum(F.col("is_current").cast("int")).alias("open"))
        .where(F.col("open") != 1)
        .count()
    )
    assert per_user == 0
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    rep = (
        df.withColumn("prev", F.lag("state").over(w))
        .where(F.col("prev") == F.col("state"))
        .count()
    )
    assert rep == 0


def test_merge_upsert_accounting(spark):
    o = table(spark, SF_DIR, "orders")
    n_upd = o.where(F.col("o_orderkey") % 7 == 0).count()
    n_del = o.where(F.col("o_orderkey") % 7 == 1).count()
    n_ins = o.where(F.col("o_orderkey") % 7 == 2).count()
    n_base = o.count()
    merged = api.REGISTRY["f8_merge_upsert"].fn(spark, SF_DIR)
    by_src = {r["src"]: r["n"] for r in merged.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_src.get("updated", 0) == n_upd
    assert by_src.get("inserted", 0) == n_ins
    assert by_src.get("base", 0) == n_base - n_upd - n_del
    # deleted keys are gone; inserted keys live in the shifted range
    assert merged.where((F.col("o_orderkey") % 7 == 1) & (F.col("o_orderkey") < 100000000)).count() == 0


def test_bloom_filter_prunes_before_the_join(spark):
    """The bloom pre-filter must (a) never drop a true match and
    (b) actually shrink the fact side vs the full scan."""
    dim = (
        table(spark, SF_DIR, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
        .distinct()
    )
    words, m = _bloom_words(spark, dim, "o_orderkey")
    li = table(spark, SF_DIR, "lineitem").select("l_orderkey")
    probe = li.withColumn("_w", F.lit(words))
    pred = F.lit(True)
    for s in _BLOOM_SEEDS:
        p = f"pmod(xxhash64(l_orderkey, {s}L), {m})"
        pred = pred & F.expr(
            f"(shiftright(element_at(_w, CAST({p} div 64 AS INT) + 1), "
            f"CAST({p} % 64 AS INT)) & 1) = 1"
        )
    survivors = probe.where(pred)
    n_total = li.count()
    n_surv = survivors.count()
    n_exact = li.join(dim, li["l_orderkey"] == dim["o_orderkey"], "left_semi").count()
    assert n_exact <= n_surv, "bloom dropped a true match (impossible by design)"
    assert n_surv < n_total, "bloom pruned nothing"
    # fp rate over the non-matching rows stays under 5% at ~12 bits/key
    fp = (n_surv - n_exact) / max(1, n_total - n_exact)
    assert fp < 0.05, f"false-positive rate {fp:.3f} too high for m={m}"


def test_zorder_buckets_are_tight_on_both_dims(spark):
    """Every Morton bucket's envelope must be narrow on BOTH source
    dimensions — the property that makes 2-D data skipping work. A
    single-dimension sort fails this: its buckets span the full range
    of the other column."""
    rows = api.REGISTRY["a8_zorder_layout"].fn(spark, SF_DIR).collect()
    assert len(rows) > 3
    gx = max(r["max_cust"] for r in rows) - min(r["min_cust"] for r in rows)
    gy = max(r["max_day"] for r in rows) - min(r["min_day"] for r in rows)
    # weighted mean envelope width per dimension, as a fraction of range
    n = sum(r["n_rows"] for r in rows)
    fx = sum((r["max_cust"] - r["min_cust"]) / gx * r["n_rows"] for r in rows) / n
    fy = sum((r["max_day"] - r["min_day"]) / gy * r["n_rows"] for r in rows) / n
    # top-8-bit buckets carve the normalized 16+16-bit key into a
    # 16x16 grid -> per-dim envelope ~1/16 of range; a plain
    # single-column sort leaves the other dimension at ~1.0
    assert fx < 0.25 and fy < 0.25, (fx, fy)


def test_profile_matches_direct_aggregates(spark):
    li = table(spark, SF_DIR, "lineitem")
    prof = {
        r["col_name"]: r
        for r in api.REGISTRY["d10_data_profile"].fn(spark, SF_DIR).collect()
    }
    direct = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_quantity").alias("nd"),
        F.round(F.max("l_extendedprice"), 6).alias("mx"),
    ).collect()[0]
    assert prof["l_quantity"]["n_rows"] == direct["n"]
    assert prof["l_quantity"]["n_distinct"] == direct["nd"]
    assert prof["l_extendedprice"]["max_v"] == direct["mx"]
    assert all(p["n_nulls"] == 0 for p in prof.values())


def test_approx_percentile_within_rank_error(spark):
    rows = api.REGISTRY["d11_approx_percentile"].fn(spark, SF_DIR).collect()
    li = table(spark, SF_DIR, "lineitem")
    for r in rows:
        q = r["quantile"]
        # exact quantiles at q +/- 1% rank bound the sketch value
        lo, hi = (
            li.where(F.col("l_returnflag") == r["l_returnflag"])
            .agg(
                F.expr(f"percentile(l_extendedprice, {max(0.0, q - 0.01)})"),
                F.expr(f"percentile(l_extendedprice, {min(1.0, q + 0.01)})"),
            )
            .collect()[0]
        )
        assert lo - 0.01 <= r["approx_value"] <= hi + 0.01, (r, lo, hi)


def test_mmr_rerank_matches_replica_and_diversifies(spark):
    import numpy as np

    out = api.REGISTRY["h15_mmr_rerank"].fn(spark, SF_DIR)
    got = {}
    for r in out.collect():
        got.setdefault(r["probe_id"], []).append((r["mmr_rank"], r["vec_id"]))
    # independent replica over the same candidate definition
    e = table(spark, SF_DIR, "embeddings").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in e}
    probes = [v for v in vecs if v % 100 == 0]
    assert set(got) == set(probes)
    deltas = []
    for p in probes:
        q = vecs[p]
        cands = sorted(
            ((float(vecs[v] @ q), v) for v in vecs if v != p),
            key=lambda t: (-t[0], t[1]),
        )[:30]
        ids = [v for _, v in cands]
        rel = {v: c for c, v in cands}
        sel = [ids[0]]
        while len(sel) < 10:
            best = max(
                (v for v in ids if v not in sel),
                key=lambda v: (
                    0.7 * rel[v]
                    - 0.3 * max(float(vecs[v] @ vecs[s]) for s in sel),
                    -v,
                ),
            )
            sel.append(best)
        assert [v for _, v in sorted(got[p])] == sel, f"probe {p}"
        deltas.append((sel, ids[:10]))
    # diversity holds in AGGREGATE, not per probe: greedy MMR bounds
    # max-sim-to-selected at each step, which doesn't force a lower
    # MEAN pairwise similarity for every probe (measured: 2/5 probes
    # land slightly higher at sf0.001) — assert the across-probe mean
    # self-similarity drops instead. Data is deterministic, no flake.
    def avg_sim(vs):
        return float(
            np.mean([vecs[a] @ vecs[b] for a in vs for b in vs if a != b])
        )

    mean_delta = np.mean([avg_sim(s) - avg_sim(t) for s, t in deltas])
    assert mean_delta < 0.0, mean_delta


def test_cms_overestimates_within_error_bound(spark):
    """CMS guarantees: est >= exact always (one-sided error), and with
    d=3 rows of w=256 counters the overshoot stays under ~e*N/w with
    overwhelming probability — asserted at 3x the expectation for a
    deterministic fixture."""
    rows = api.REGISTRY["d12_heavy_hitters"].fn(spark, SF_DIR).collect()
    n_total = table(spark, SF_DIR, "events").count()
    assert rows, "no heavy hitters returned"
    for r in rows:
        assert r["est_count"] >= r["exact_count"], r
        assert r["est_count"] - r["exact_count"] <= 3 * 2.72 * n_total / 256, r


def test_hll_portable_accuracy_across_regimes(spark):
    """The portable HLL twin's estimates must land inside the m=64
    theoretical error band (1.04/sqrt(64) ~ 13%; allow 2 sigma-ish
    margin) for all three true cardinalities — 150 (linear-counting
    regime boundary), 500, and 1500 (raw harmonic regime)."""
    from spark_glove_spark import api

    rows = api.REGISTRY["d31_hll_portable"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 3
    for r in rows:
        rel = abs(r["estimate"] - r["n_true"]) / r["n_true"]
        assert rel < 0.26, (r["col"], r["estimate"], r["n_true"])


def test_sample_quantiles_calibrated_against_exact(spark):
    """The exact-quantile calibration that used to ride along inside
    d32's declared result (a full-fact global row_number window) now
    lives here as a sandwich tooth: each hash-sample estimate must sit
    within the DKW rank band of the TRUE corpus quantile."""
    import math

    rows = {
        r["q"]: r["est"]
        for r in api.REGISTRY["d32_sample_quantiles"].fn(spark, SF_DIR).collect()
    }
    assert set(rows) == {0.5, 0.9, 0.95, 0.99}
    from spark_glove_spark.operators.statml import _SQ_N

    # DKW: P(sup|F_n - F| > eps) <= 2 exp(-2 n eps^2); a = 0.1%
    eps = math.sqrt(math.log(2 / 0.001) / (2 * _SQ_N))
    o = table(spark, SF_DIR, "orders")
    for q, est in rows.items():
        lo, hi = (
            o.agg(
                F.expr(f"percentile(o_totalprice, {max(0.0, q - eps)})"),
                F.expr(f"percentile(o_totalprice, {min(1.0, q + eps)})"),
            ).collect()[0]
        )
        assert lo - 0.01 <= est <= hi + 0.01, (q, est, lo, hi)


def test_sample_quantiles_plan_is_one_takeordered_no_window(spark):
    """Plan guard: the declared d32 form is ONE TakeOrderedAndProject
    over the corpus — no Window operator and no shuffle exchange may
    ever creep back into the sample plan (the calibration pass that
    carried a full-fact global window is pytest-only now)."""
    from spark_glove_spark.operators.statml import _sq_sample

    plan = (
        _sq_sample(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan
    # the only exchange allowed is parallelized()'s round-robin
    # fixture-spreading repartition (test-scale parallelism, not part
    # of the algorithm); no hash/range shuffle may appear
    shuffles = (
        plan.count("Exchange")
        - plan.count("ReusedExchange")
        - plan.count("BroadcastExchange")
        - plan.count("RoundRobinPartitioning")
    )
    assert shuffles == 0, plan


def test_kmv_sketch_error_bounds_and_identities(spark):
    """KMV estimates must sit within a loose 3-sigma band of exact
    (k=32 -> stderr ~ 1/sqrt(30) ~ 18%), the union estimate must be
    >= each segment's, and exact columns must obey inclusion-
    exclusion exactly."""
    from spark_glove_spark.operators.statml import d35_kmv_sketch

    rows = {r.part: r for r in d35_kmv_sketch(spark, "/root/testdata/sf0.1").collect()}
    assert set(rows) == {"seg0", "seg1", "union", "intersection"}
    for part, r in rows.items():
        assert r.exact > 0
        assert abs(r.est - r.exact) / r.exact < 0.55, (part, r.est, r.exact)
    assert (
        rows["seg0"].exact + rows["seg1"].exact
        == rows["union"].exact + rows["intersection"].exact
    )


def test_semantic_chunking_partitions_segments(spark):
    """Chunks must PARTITION each doc's segments: ids contiguous from
    0, segment counts summing to floor(tokens/8), and start offsets
    consistent with cumulative chunk sizes."""
    import pyspark.sql.functions as F

    from spark_glove_spark.operators.text_analysis import (
        _SC_SEG,
        h17_semantic_chunking,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = h17_semantic_chunking(spark, sf_dir).collect()
    docs = {}
    for r in out:
        docs.setdefault(r.doc_id, []).append(r)
    lens = {
        r.doc_id: r.n
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    # coverage: every doc with at least one full segment must appear
    assert set(docs) == {d for d, n in lens.items() if n >= _SC_SEG}
    for doc_id, chunks in docs.items():
        chunks.sort(key=lambda r: r.chunk_id)
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        assert sum(c.n_segments for c in chunks) == lens[doc_id] // _SC_SEG
        pos = 0
        for c in chunks:
            assert c.start_seg == pos
            pos += c.n_segments
