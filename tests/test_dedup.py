"""Dedup + ANN correctness (SURVEY.md §5.3.4): the rows-only gap for

hash-based sketches is closed here — injected near-duplicates MUST be
found, clean corpora MUST stay clean, and ANN recall is measured
against the exact brute-force baseline.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_glove_spark.functions.hashing import hamming64, simhash64
from spark_glove_spark.functions.text import tokenize
from spark_glove_spark.operators.ann import lsh_knn
from spark_glove_spark.operators.dedup import minhash_neardups


@pytest.fixture(scope="module")
def corpus_with_dups(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    # inject: 9001 = exact copy of doc 0; 9002 = doc 1 with one token
    # appended (high-Jaccard near-dup); 9003 = unrelated short doc
    base = {r.doc_id: r.text for r in docs.where(F.col("doc_id") < 2).collect()}
    extra = spark.createDataFrame(
        [
            (9001, base[0]),
            (9002, base[1] + " spark"),
            (9003, "zig zag zig zag zig"),
        ],
        "doc_id long, text string",
    )
    return docs.unionByName(extra)


def test_minhash_finds_injected_dups(corpus_with_dups):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_neardups(corpus_with_dups, threshold=0.5).collect()
    }
    assert (0, 9001) in pairs and pairs[(0, 9001)] == 1.0
    assert (1, 9002) in pairs and pairs[(1, 9002)] > 0.8
    assert not any(9003 in p for p in pairs)


def test_minhash_matches_bruteforce(spark):
    """The fixture corpus contains 28 PLANTED near-dup pairs (shingle-
    Jaccard ≈ 0.99 at sf0.001, verified by exact all-pairs computation).
    MinHash-LSH must find exactly that set: 100% recall at J≈0.99 (the
    4-band/4-row S-curve makes missing a 0.99 pair ~impossible) and the
    exact-Jaccard verify step guarantees precision."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    found = {
        (r.doc_a, r.doc_b)
        for r in minhash_neardups(docs, threshold=0.5).collect()
    }

    from spark_glove_spark.functions.text import shingles

    sets = docs.select(
        "doc_id",
        F.array_distinct(shingles(tokenize(F.col("text")), 3)).alias("s"),
    ).where(F.size("s") > 0)
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    exact = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .where(inter.cast("double") / union >= 0.5)
        .collect()
    }
    assert len(exact) > 0, "fixture should contain planted near-dups"
    assert found == exact


def test_simhash_hamming(spark, corpus_with_dups):
    fp = corpus_with_dups.select(
        "doc_id", simhash64(tokenize(F.col("text"))).alias("fp")
    )
    by_id = {r.doc_id: r.fp for r in fp.where(
        F.col("doc_id").isin(0, 1, 9001, 9002, 9003)).collect()}
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")  # noqa: E731
    assert ham(by_id[0], by_id[9001]) == 0          # exact copy
    assert ham(by_id[1], by_id[9002]) <= 6          # one-token edit
    assert ham(by_id[0], by_id[9003]) > 10          # unrelated


def test_hamming64_expression(spark):
    df = spark.createDataFrame([(0b1011, 0b0010)], "a long, b long")
    assert df.select(hamming64(F.col("a"), F.col("b")).alias("h")).collect()[0].h == 2


def test_lsh_ann_recall_vs_bruteforce(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    approx = lsh_knn(e, probes, k=10)
    # exact top-10 per probe
    from spark_glove_spark.functions.vector import dot
    from pyspark.sql import Window

    scored = (
        e.crossJoin(F.broadcast(probes.withColumnRenamed("embedding", "q")))
        .where(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", dot(F.col("embedding"), F.col("q")).alias("cos"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), "vec_id")
    exact = scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 10)

    ex = {(r.probe_id, r.vec_id) for r in exact.collect()}
    ap = {(r.probe_id, r.vec_id) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    # 4-bit LSH + multiprobe over 500 random 64-d vectors: recall is
    # modest by construction (random data has no cluster structure);
    # the assertion pins the floor so regressions are caught.
    assert recall >= 0.35, f"LSH recall {recall:.2f} below floor"
    # every approx neighbor must at least be a real corpus vector
    assert all(p != v for p, v in ap)


def test_ivf_ann_recall_vs_bruteforce(spark):
    """IVF beats LSH on clustered data (data-adaptive cells): floor
    0.45 vs LSH's 0.35, measured 0.64 at n_lists=10/n_probe=3."""
    from spark_glove_spark.operators.ann import ivf_knn

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    approx = ivf_knn(e, probes, k=10, n_lists=10, n_probe=3)
    from pyspark.sql import Window

    from spark_glove_spark.functions.vector import dot

    scored = (
        e.crossJoin(F.broadcast(probes.withColumnRenamed("embedding", "q")))
        .where(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", dot(F.col("embedding"), F.col("q")).alias("cos"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), "vec_id")
    exact = scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 10)
    ex = {(r.probe_id, r.vec_id) for r in exact.collect()}
    ap = {(r.probe_id, r.vec_id) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.45, f"IVF recall {recall:.2f} below floor"


def _exact_filtered_topk(e, probes, pred, k=10):
    """Ground truth for the filtered-ANN tests: the exact top-k per
    probe over the predicate-filtered corpus — ONE definition so the
    IVF and LSH tests can't drift apart (r10 review finding)."""
    from pyspark.sql import Window

    from spark_glove_spark.functions.vector import dot

    scored = (
        e.where(pred)
        .crossJoin(F.broadcast(probes.withColumnRenamed("embedding", "q")))
        .where(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id", "vec_id", dot(F.col("embedding"), F.col("q")).alias("cos")
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), "vec_id")
    return {
        (r.probe_id, r.vec_id)
        for r in scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .collect()
    }


def test_filtered_ivf_recall_vs_filtered_exact(spark):
    """Filtered ANN (VERDICT r9 item 6): the metadata predicate is
    pushed into the inverted-list scan BEFORE scoring (pre-filter),
    so (a) every returned neighbor satisfies the predicate, (b) every
    probe still gets k candidates drawn from the matching sub-corpus,
    and (c) recall vs the EXACT FILTERED top-k clears a floor. The
    floor is HIGHER than unfiltered IVF's (0.55 vs 0.45): n_probe
    widens 3 → 4 to offset the thinner cells (measured 0.60 at
    sf0.001, 0.68 at sf0.01)."""
    from spark_glove_spark.operators.ann import ivf_knn

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    pred = F.col("label") % 3 == 0
    approx = ivf_knn(
        e, probes, k=10, n_lists=10, n_probe=4, corpus_filter=pred
    )
    ex = _exact_filtered_topk(e, probes, pred)
    rows = approx.collect()
    # (a) pre-filter correctness: no neighbor violates the predicate
    assert all(r.label % 3 == 0 for r in rows), "filter leaked through"
    ap = {(r.probe_id, r.vec_id) for r in rows}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.55, f"filtered IVF recall {recall:.2f} below floor"


def test_simhash_fast_equals_expression_form(spark):
    """The vectorized numpy vote-fold must produce bit-identical
    fingerprints to the pure-expression reference form."""
    from spark_glove_spark.functions.hashing import simhash64, simhash64_fast
    from spark_glove_spark.functions.text import tokenize

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ref = {r.doc_id: r.s for r in d.select("doc_id", simhash64(tokenize(F.col("text"))).alias("s")).collect()}
    fast = {r.doc_id: r.s for r in d.select("doc_id", simhash64_fast(tokenize(F.col("text"))).alias("s")).collect()}
    assert ref == fast


def test_semantic_dedup_drop_set_verified_and_recall(spark):
    """h13_semantic_dedup teeth (rows-only op): (1) every dropped row's
    (keeper, dropped) pair really has cos >= 0.4 and keeper is the
    LOWEST qualifying same-cluster lower id — re-verified with numpy
    from the same centroids; (2) recall vs the brute-force all-pairs
    min-id drop set has a floor (clustering can only miss cross-cluster
    pairs); (3) an injected exact duplicate is always dropped."""
    import numpy as np

    from spark_glove_spark import api
    from spark_glove_spark.operators.clustering import kmeans_fit
    from spark_glove_spark.sources import table

    sf = "/root/testdata/sf0.001"
    out = {
        r.vec_id: (r.cluster_id, r.keeper_id, r.cos)
        for r in api.REGISTRY["h13_semantic_dedup"].fn(spark, sf).collect()
    }
    assert out, "fixture should produce a non-empty drop set"

    e = table(spark, sf, "embeddings").select("vec_id", "embedding")
    rows = sorted((r.vec_id, np.array(r.embedding, float)) for r in e.collect())
    ids = [i for i, _ in rows]
    mat = np.stack([v for _, v in rows])
    centers, _ = kmeans_fit(e, k=max(10, len(ids) // 500), max_iter=5, seed=42)
    # same argmin rule as _assign_expr: (‖c‖²−2⟨x,c⟩, cid) lexicographic
    # — np.argmin takes the FIRST minimum, i.e. the lowest cid on ties
    d = (centers**2).sum(axis=1)[None, :] - 2 * mat @ centers.T
    cid = np.argmin(d, axis=1)

    idx = {v: i for i, v in enumerate(ids)}
    sims = mat @ mat.T
    for vec_id, (cluster_id, keeper_id, cos) in out.items():
        i = idx[vec_id]
        assert cid[i] == cluster_id
        lower = [
            j
            for j in range(len(ids))
            if ids[j] < vec_id and cid[j] == cid[i] and sims[i, j] >= 0.4
        ]
        assert lower, f"{vec_id} dropped with no qualifying neighbor"
        assert ids[min(lower)] == keeper_id
        assert abs(sims[i, idx[keeper_id]] - cos) < 1e-4

    # brute-force global drop set (no clustering): recall floor
    brute = {
        ids[i]
        for i in range(len(ids))
        if any(sims[i, j] >= 0.4 for j in range(len(ids)) if ids[j] < ids[i])
    }
    recall = len(set(out) & brute) / len(brute)
    assert recall >= 0.3, f"semantic-dedup recall {recall:.2f} vs brute force"

    # injected exact duplicate of the first vector must be dropped
    dup = spark.createDataFrame(
        [(99991, rows[0][1].tolist(), 0)],
        "vec_id long, embedding array<double>, label int",
    ).select(
        "vec_id",
        F.col("embedding").cast("array<float>").alias("embedding"),
        "label",
    )
    aug = e.unionByName(
        dup.select("vec_id", "embedding"), allowMissingColumns=False
    )
    import spark_glove_spark.operators.dedup as dd

    centers2, _ = kmeans_fit(aug, k=max(10, (len(ids) + 1) // 500), max_iter=5, seed=42)
    from spark_glove_spark.operators.clustering import _assign_expr

    assigned = aug.select(
        "vec_id", "embedding", _assign_expr(centers2, "embedding").alias("cluster_id")
    )
    pair = (
        assigned.alias("a")
        .join(
            assigned.alias("b"),
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.vec_id") == ids[0])
            & (F.col("b.vec_id") == 99991),
        )
        .count()
    )
    assert pair == 1, "identical vectors must share a cluster"


def test_span_dedup_multi_finds_injected_long_duplicate(spark, tmp_path):
    """VERDICT r3 item 7: a 40-token span shared by two otherwise
    unrelated docs must surface at every ladder rung, and the k=32
    island union must recover the FULL 40-token extent (fixed k=8
    alone reports it, but only the ladder proves the span is long)."""
    from spark_glove_spark.api import queries

    span = " ".join(f"tok{i}" for i in range(40))
    filler_a = " ".join(f"aaa{i}" for i in range(20))
    filler_b = " ".join(f"bbb{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, f"{filler_a} {span}", "en", "src0", 0),
            (2, f"{span} {filler_b}", "en", "src1", 0),
            (3, f"{filler_a} {filler_b}", "en", "src2", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path)
    docs.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    out = queries()["h17_span_dedup_multi"](spark, sf_dir)
    rows = {(r["doc_id"], r["k"]): r for r in out.collect()}
    # Docs 1/2 share the 40-token span with each other AND their
    # 20-token filler with doc 3, so at k<=16 the dup windows are
    # span (40-k+1) + filler (20-k+1) and coverage is 60 tokens in
    # two islands; at k=32 only the long span survives the rung.
    for did in (1, 2):
        for k in (8, 16):
            r = rows[(did, k)]
            assert r["n_dup_windows"] == (40 - k + 1) + (20 - k + 1)
            assert r["covered_tokens"] == 60
            assert r["max_span_tokens"] == 40
        r = rows[(did, 32)]
        assert r["n_dup_windows"] == 40 - 32 + 1
        assert r["covered_tokens"] == 40
        assert r["max_span_tokens"] == 40
    # doc 3's duplicates are both 20-token fillers: visible at k<=16
    # but NOT at k=32 — the ladder separates span-length classes.
    assert rows[(3, 8)]["max_span_tokens"] == 20
    assert rows[(3, 8)]["covered_tokens"] == 40
    assert (3, 32) not in rows


def test_minhash_portable_matches_ground_truth(spark):
    """The portable-md5 twin must behave like the production sketch:
    exact precision (the verify step IS exact Jaccard) and full recall
    on the planted J≈0.99 pairs — 2-row bands are strictly more
    permissive than the production 4-row bands, so any pair the
    production pipeline catches at J≈0.99 the portable one must too."""
    from spark_glove_spark.operators.dedup import h13_minhash_portable

    sf = "/root/testdata/sf0.001"
    portable = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in h13_minhash_portable(spark, sf).collect()
    }
    production = {
        (r.doc_a, r.doc_b)
        for r in minhash_neardups(
            spark.read.parquet(f"{sf}/documents.parquet"), threshold=0.5
        ).collect()
    }
    assert set(portable) >= production
    assert all(j >= 0.5 for j in portable.values())


def test_lsh_portable_matches_numpy_replica(spark):
    """Full numpy replica of the portable LSH pipeline: quantize,
    LCG hyperplanes, bucket, candidate set, integer dots, top-3 —
    every returned row (probe, vec, num) must match, and the per-probe
    neighbor sets must be identical."""
    import numpy as np

    from spark_glove_spark.operators.ann import (
        DIM,
        _PL_PLANES,
        _PL_SCALE,
        _pl_coef,
        h16_lsh_portable,
    )

    sf = "/root/testdata/sf0.001"
    rows = spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    ids = np.array([r.vec_id for r in rows])
    emb = np.array([r.embedding for r in rows], dtype=np.float64)
    qv = np.floor(emb * _PL_SCALE + 0.5).astype(np.int64)
    coef = np.array(
        [[_pl_coef(j, d) for d in range(DIM)] for j in range(_PL_PLANES)],
        dtype=np.int64,
    )
    bits = (qv @ coef.T > 0).astype(int)
    bucket = bits @ (2 ** np.arange(_PL_PLANES - 1, -1, -1))
    nn = (qv * qv).sum(axis=1)

    expected = {}
    for pi, pid in enumerate(ids):
        if pid % 100 != 0:
            continue
        cand = [
            ci
            for ci in range(len(ids))
            if bucket[ci] == bucket[pi] and ids[ci] != pid
        ]
        scored = sorted(
            (
                (
                    -(qv[pi] @ qv[ci]) / np.sqrt(float(nn[pi] * nn[ci])),
                    ids[ci],
                    int(qv[pi] @ qv[ci]),
                )
                for ci in cand
            ),
        )[:3]
        expected[int(pid)] = {(v, n) for _, v, n in scored}

    got = {}
    for r in h16_lsh_portable(spark, sf).collect():
        got.setdefault(r.probe_id, set()).add((r.vec_id, r.num))
    assert got == expected


def test_span_dedup_exact_recovers_full_length(spark, tmp_path):
    """VERDICT r4 item 5: the diagonal-run query must report the TRUE
    maximal duplicated span length — an injected 100-token duplicate
    comes back at exactly 100 (no ladder bracketing), and a shorter
    23-token duplicate at exactly 23."""
    from spark_glove_spark.api import queries

    span = " ".join(f"tok{i}" for i in range(100))
    short = " ".join(f"sho{i}" for i in range(23))
    filler_a = " ".join(f"aaa{i}" for i in range(20))
    filler_b = " ".join(f"bbb{i}" for i in range(20))
    filler_c = " ".join(f"ccc{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, f"{filler_a} {span}", "en", "src0", 0),
            (2, f"{span} {filler_b}", "en", "src1", 0),
            (3, f"{filler_c} {short}", "en", "src2", 0),
            (4, f"{short} {filler_c}", "en", "src2", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path)
    docs.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    out = queries()["h17_span_dedup_exact"](spark, sf_dir)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["max_span_tokens"] == 100
    assert rows[1]["partner_doc"] == 2
    assert rows[1]["start_pos"] == 20  # after the 20-token filler
    assert rows[2]["max_span_tokens"] == 100
    assert rows[2]["start_pos"] == 0
    # docs 3/4 share BOTH the 23-token span and the 20-token filler;
    # the maximal one wins
    assert rows[3]["max_span_tokens"] == 23
    assert rows[4]["max_span_tokens"] == 23
    # a doc's span can never exceed its own length; sanity on ordering
    assert set(rows) == {1, 2, 3, 4}


def test_span_dedup_exact_within_doc_repeat(spark, tmp_path):
    """A substring repeated INSIDE one document is a duplicated span
    too (Lee et al. count both): 15 tokens repeated back-to-back must
    be reported with the doc as its own partner."""
    from spark_glove_spark.api import queries

    rep = " ".join(f"rr{i}" for i in range(15))
    filler = " ".join(f"ff{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, f"{rep} {filler} {rep}", "en", "src0", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path)
    docs.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    out = queries()["h17_span_dedup_exact"](spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["doc_id"] == 1 and r["partner_doc"] == 1
    assert r["max_span_tokens"] == 15


def test_cdc_chunking_survives_prefix_insertion(spark, tmp_path):
    """The content-defined property: the SAME passage must produce
    duplicated chunks even when one copy is shifted by an inserted
    prefix (fixed-stride chunking would misalign every boundary).
    Construct two docs sharing a long passage, one with 7 extra
    leading tokens, and require cross-doc duplicate chunks on both."""
    from spark_glove_spark.api import queries

    passage = " ".join(f"pp{i}" for i in range(120))
    prefix = " ".join(f"zz{i}" for i in range(7))
    docs = spark.createDataFrame(
        [
            (1, passage, "en", "s0", 0),
            (2, f"{prefix} {passage}", "en", "s1", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path)
    docs.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    rows = {r["doc_id"]: r for r in queries()["h17_cdc_chunking"](spark, sf_dir).collect()}
    assert rows[1]["n_dup_chunks"] >= 1, "shared passage must yield shared chunks"
    assert rows[2]["n_dup_chunks"] >= 1
    # and the duplicated chunks are the interior ones: not ALL of doc
    # 2's chunks can match (its first chunk starts inside the prefix)
    assert rows[2]["n_dup_chunks"] < rows[2]["n_chunks"]


def test_persisted_ivf_index_equals_inmemory_and_prunes_partitions(
    spark, tmp_path
):
    """The persisted IVF index (parquet partitioned by list_id +
    centroids table) must answer probes IDENTICALLY to the in-memory
    ivf_knn at the same seed, and its probe scan must carry the
    wanted-lists predicate as a PARTITION filter — the on-disk layout
    that makes an ANN probe a pruned scan instead of a corpus pass."""
    import glob
    import os

    from spark_glove_spark.operators.ann import (
        ivf_build_index,
        ivf_knn,
        ivf_probe_index,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    ivf_build_index(e, str(tmp_path), n_lists=10, seed=42)
    # the index actually materialized one directory per inverted list
    dirs = glob.glob(os.path.join(str(tmp_path), "lists", "list_id=*"))
    assert len(dirs) == 10
    got = ivf_probe_index(spark, str(tmp_path), probes, k=10, n_probe=3)
    mem = ivf_knn(e, probes, k=10, n_lists=10, n_probe=3)
    key = lambda df: sorted(  # noqa: E731
        (r["probe_id"], r["vec_id"], r["cos"])
        for r in df.select("probe_id", "vec_id", "cos").collect()
    )
    assert key(got) == key(mem)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:300]
    assert "list_id" in pf and ("IN" in pf or "In(" in pf), pf


def test_filtered_lsh_recall_and_bucket_width_guidance(spark):
    """Filtered LSH mirrors filtered IVF's pre-filter contract: every
    neighbor satisfies the predicate, and recall vs the exact filtered
    top-k clears a floor. Also pins the docstring's tuning guidance —
    a selective filter thins every bucket, so WIDENING buckets (drop
    n_planes 4 → 3) must recover recall (measured 0.48 → 0.74 at
    sf0.001; all values deterministic: seeded hyperplanes, fixed
    fixture)."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    pred = F.col("label") % 3 == 0
    ex = _exact_filtered_topk(e, probes, pred)

    def recall(n_planes):
        rows = lsh_knn(
            e, probes, k=10, n_planes=n_planes, corpus_filter=pred
        ).collect()
        assert all(r.label % 3 == 0 for r in rows), "filter leaked through"
        ap = {(r.probe_id, r.vec_id) for r in rows}
        return len(ex & ap) / len(ex)

    r4, r3 = recall(4), recall(3)
    assert r3 >= 0.70, f"filtered LSH (n_planes=3) recall {r3:.2f} below floor"
    assert r3 > r4, f"wider buckets must recover filtered recall ({r3} vs {r4})"


def test_ann_index_lifecycle_audit_invariants(spark):
    """Pytest guard for the planlint-skipped pipeline_ann_index_
    lifecycle (skipped queries must carry dedicated tests): beyond
    the in-body raises, the audit table must show the lifecycle —
    snapshot 0 serves the smaller corpus with ZERO delta results,
    the rebuild serves the full corpus and surfaces delta neighbors,
    and both serve k-bounded result sets."""
    from spark_glove_spark import api

    rows = sorted(
        api.REGISTRY["pipeline_ann_index_lifecycle"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect(),
        key=lambda r: r["index_version"],
    )
    assert [r["index_version"] for r in rows] == [0, 1]
    v0, v1 = rows
    assert v0["corpus_rows"] < v1["corpus_rows"]
    assert v0["delta_results"] == 0
    assert v1["delta_results"] > 0
    assert 0 < v0["n_results"] and 0 < v1["n_results"]
    # mean cosine of served neighbors is a sane similarity
    assert -1.0 <= v0["mean_cos"] <= 1.0 and -1.0 <= v1["mean_cos"] <= 1.0


def test_ann_drift_rebuild_policy_both_sides(spark):
    """Pytest guard for the planlint-skipped pipeline_ann_drift_rebuild
    (skipped queries must carry dedicated tests): the PSI policy must
    cut BOTH ways — the same-distribution epoch stays under threshold
    and leaves the catalog at one build, the planted-drift epoch trips
    it and appends exactly one rebuild — and the serving split must
    show the pinned snapshot blind to drifted vectors while the
    current index surfaces them."""
    from spark_glove_spark import api

    rows = sorted(
        api.REGISTRY["pipeline_ann_drift_rebuild"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect(),
        key=lambda r: r["epoch"],
    )
    assert [r["epoch"] for r in rows] == [1, 2]
    calm, drift = rows
    assert not calm["rebuilt"] and calm["psi"] <= 0.2
    assert drift["rebuilt"] and drift["psi"] > 0.2
    # drift is not a borderline fixture artifact: the planted shift
    # must move PSI by an order of magnitude, not epsilon
    assert drift["psi"] > 10 * max(calm["psi"], 0.01)
    assert calm["catalog_builds"] == 1 and drift["catalog_builds"] == 2
    assert calm["serving_version"] == 0 and drift["serving_version"] == 1
    # pinned snapshot (reported on the calm row) serves only pre-drift
    # vectors; the rebuilt index (drift row) surfaces drifted neighbors
    assert calm["probe_results"] > 0 and calm["drift_results"] == 0
    assert drift["drift_results"] > 0


def test_ivfpq_filtered_recall_and_pushdown(spark, tmp_path):
    """Filtered search against the PERSISTED composed index: the
    metadata predicate must (a) never leak a non-matching neighbor,
    (b) clear the same 0.55 recall floor as flat filtered IVF vs the
    shared exact ground truth (measured 0.60 at sf0.001, 0.68 at
    sf0.01 — identical to h16_ivf_filtered's, because the exact
    re-rank recovers whatever ADC ranks into the probed-cell top-100),
    and (c) reach the pruned CODE scan as a pushed filter, composing
    with the list_id partition pruning — that is what storing metadata
    IN the index buys."""
    from spark_glove_spark.operators.ann import (
        ivfpq_build_index,
        ivfpq_probe_index,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    pred = F.col("label") % 3 == 0
    ivfpq_build_index(e, str(tmp_path), n_lists=10, m=8, ksub=16, seed=42)
    got = ivfpq_probe_index(
        spark, str(tmp_path), e, probes, k=10, n_probe=4,
        shortlist=100, corpus_filter=pred,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the LISTS scan must carry BOTH prunings: list_id partition
    # filter and the label predicate pushed to parquet
    lists_scans = [
        c for c in plan.split("PartitionFilters")[1:] if "list_id" in c[:300]
    ]
    assert lists_scans, plan
    assert any("label" in c[:800] for c in lists_scans), lists_scans
    rows = got.collect()
    assert all(r.label % 3 == 0 for r in rows), "filter leaked through"
    ex = _exact_filtered_topk(e, probes, pred)
    ap = {(r.probe_id, r.vec_id) for r in rows}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.55, f"filtered IVFPQ recall {recall:.2f} below floor"


# ---------------------------------------------------------------------------
# r11 vector-search tail: binary quantization, retrieval metrics, NSW beam


def _quantized_exact_top3(spark, sf_dir):
    """Exact top-3 per probe under the portables' integer-quantized
    ranking (num/sqrt(nn) desc, vec_id) — the ground truth the BQ and
    NSW tiers and the metrics query all measure against."""
    from pyspark.sql import Window

    from spark_glove_spark.operators.ann import _BQ_TOPK, _bq_packed

    _, vecs = _bq_packed(spark, sf_dir)
    pq = vecs.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("qv").alias("qp")
    )
    zero = F.lit(0).cast("long")
    num = F.aggregate(
        F.zip_with("qv", "qp", lambda x, y: x * y), zero, lambda a, x: a + x
    )
    score = num.cast("double") / F.sqrt(F.col("nn").cast("double"))
    w = Window.partitionBy("probe_id").orderBy(F.col("s").desc(), "vec_id")
    return (
        vecs.crossJoin(F.broadcast(pq))
        .where(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", score.alias("s"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _BQ_TOPK)
    )


def test_bq_recall_vs_exact(spark):
    """1-bit codes + a 12-deep Hamming shortlist must recover a floored
    share of the exact top-3 (measured 0.47 at sf0.001 / 0.60 at
    sf0.01), never return the probe itself, and every Hamming distance
    must be a valid 0..64 popcount sum."""
    from spark_glove_spark.operators.ann import h16_bq_portable

    sf_dir = "/root/testdata/sf0.001"
    out = h16_bq_portable(spark, sf_dir).collect()
    ap = {(r.probe_id, r.vec_id) for r in out}
    assert all(p != v for p, v in ap)
    assert all(0 <= r.hamming <= 64 for r in out)
    ex = {
        (r.probe_id, r.vec_id)
        for r in _quantized_exact_top3(spark, sf_dir).collect()
    }
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.4, f"BQ recall {recall:.2f} below floor"


def test_bq_filtered_zero_leak_and_recall(spark):
    """h16_bq_filtered: every returned row satisfies the predicate
    (zero leak — pre-filtering makes this structural, the output
    label makes it hashed), no probe returns itself, and recall vs
    the EXACT filtered quantized top-3 clears a floor."""
    from pyspark.sql import Window

    from spark_glove_spark.operators.ann import (
        _BQ_TOPK,
        _bq_packed,
        h16_bq_filtered,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = h16_bq_filtered(spark, sf_dir).collect()
    assert out and all(r.label % 3 == 0 for r in out), "filter leak"
    ap = {(r.probe_id, r.vec_id) for r in out}
    assert all(p != v for p, v in ap)
    # exact filtered truth in the same integer-quantized space
    _, vecs = _bq_packed(spark, sf_dir)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label"
    )
    fv = vecs.join(e, "vec_id").where(F.col("label") % 3 == 0)
    pq = vecs.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("qv").alias("qp")
    )
    zero = F.lit(0).cast("long")
    num = F.aggregate(
        F.zip_with("qv", "qp", lambda x, y: x * y), zero, lambda a, x: a + x
    )
    score = num.cast("double") / F.sqrt(F.col("nn").cast("double"))
    w = Window.partitionBy("probe_id").orderBy(F.col("s").desc(), "vec_id")
    ex = {
        (r.probe_id, r.vec_id)
        for r in fv.crossJoin(F.broadcast(pq))
        .where(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", score.alias("s"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _BQ_TOPK)
        .collect()
    }
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.4, f"filtered BQ recall {recall:.2f} below floor"


def test_nsw_beam_recall_vs_exact(spark):
    """The LSH-seeded beam search must clear a recall floor vs the
    exact top-3 (measured 0.60 at both sf0.001 and sf0.01 with
    deg=6/beam=12/hops=5) and never return the probe itself."""
    from spark_glove_spark.operators.ann import h16_nsw_portable

    sf_dir = "/root/testdata/sf0.001"
    ap = {
        (r.probe_id, r.vec_id)
        for r in h16_nsw_portable(spark, sf_dir).collect()
    }
    assert all(p != v for p, v in ap)
    ex = {
        (r.probe_id, r.vec_id)
        for r in _quantized_exact_top3(spark, sf_dir).collect()
    }
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, f"NSW beam recall {recall:.2f} below floor"


def test_hnsw_descent_recall_vs_exact(spark):
    """The layered descent — 2 top-layer + 2 mid-layer + 3 base-layer
    beam rounds from ONE global entry point — must clear at least the
    flat NSW's 0.5 floor vs the exact top-3 DESPITE using 3 base
    rounds where NSW needs 5 from its LSH-seeded start (the hierarchy
    is what buys the shorter base search), and never return the probe
    itself."""
    from spark_glove_spark.operators.ann import h16_hnsw_portable

    sf_dir = "/root/testdata/sf0.001"
    ap = {
        (r.probe_id, r.vec_id)
        for r in h16_hnsw_portable(spark, sf_dir).collect()
    }
    assert all(p != v for p, v in ap)
    ex = {
        (r.probe_id, r.vec_id)
        for r in _quantized_exact_top3(spark, sf_dir).collect()
    }
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, f"HNSW descent recall {recall:.2f} below floor"


def test_retrieval_metrics_agree_with_set_recall(spark):
    """h15_retrieval_metrics' per-probe recall_k must EQUAL the set
    recall computed independently from h16_bq_portable vs the exact
    truth, and the metric ranges must hold (rr/ndcg in [0,1]; a probe
    with all hits scores a perfect 1.0 on both)."""
    from spark_glove_spark.operators.ann import (
        _BQ_TOPK,
        h15_retrieval_metrics,
        h16_bq_portable,
    )

    sf_dir = "/root/testdata/sf0.001"
    m = {r.probe_id: r for r in h15_retrieval_metrics(spark, sf_dir).collect()}
    sys_rows = h16_bq_portable(spark, sf_dir).collect()
    truth = {}
    for r in _quantized_exact_top3(spark, sf_dir).collect():
        truth.setdefault(r.probe_id, set()).add(r.vec_id)
    for pid, t in truth.items():
        got = {r.vec_id for r in sys_rows if r.probe_id == pid}
        assert m[pid].hits == len(got & t)
        assert abs(m[pid].recall_k - len(got & t) / _BQ_TOPK) < 1e-6
        assert 0.0 <= m[pid].rr <= 1.0
        assert 0.0 <= m[pid].ndcg <= 1.0
        if m[pid].hits == _BQ_TOPK:
            assert m[pid].rr == 1.0
            assert abs(m[pid].ndcg - 1.0) < 1e-6


def test_hybrid_retrieval_ranks_consistent_with_parents(spark):
    """The hybrid query's sparse candidate list must be exactly
    h10_bm25's top-20 doc set in the same order, its output must obey
    the RRF formula from its own rank columns, and every fused row
    must come from at least one list."""
    from spark_glove_spark.operators.embeddings import (
        _HY_K,
        h15_hybrid_retrieval,
    )
    from spark_glove_spark.operators.text_analysis import h10_bm25

    sf_dir = "/root/testdata/sf0.001"
    out = h15_hybrid_retrieval(spark, sf_dir).collect()
    assert 0 < len(out) <= 10
    bm = [r.doc_id for r in h10_bm25(spark, sf_dir).collect()]
    sparse_order = [
        r.doc_id for r in sorted(out, key=lambda r: r.r_sparse) if r.r_sparse > 0
    ]
    # every fused doc with a sparse rank appears in bm25's top-20 at
    # exactly that rank (bm is LIMIT 20 in the same order)
    for r in out:
        if r.r_sparse > 0:
            assert bm[r.r_sparse - 1] == r.doc_id
    assert sparse_order == sorted(sparse_order, key=lambda d: bm.index(d))
    for r in out:
        assert r.r_sparse > 0 or r.r_dense > 0
        want = (1.0 / (_HY_K + r.r_sparse) if r.r_sparse > 0 else 0.0) + (
            1.0 / (_HY_K + r.r_dense) if r.r_dense > 0 else 0.0
        )
        assert abs(r.rrf - round(want, 6)) < 1e-9


def test_hnsw_plane_schedule_law():
    """The r12 100x ladder's bisected descent law, encoded as the
    build-path default (VERDICT r12 item 7): base proposal hash grows
    ~log2(growth) from the 2,000-row reference rung, each sparser
    layer's hash is 3/6 bits narrower, and the three test scale
    factors (<= the reference rung) land on the authored fixture
    constants bit-for-bit so every oracle hash is unchanged."""
    from spark_glove_spark.operators.ann import hnsw_plane_schedule

    # fixture SFs: sf0.001 (50), sf0.01 (500), sf0.1 (2,000 rows)
    for n in (1, 50, 500, 2_000):
        assert hnsw_plane_schedule(n) == (4, 2, 0), n
    # the ladder rungs (l1 = base-3, l2 = base-6; floor keeps bucket
    # occupancy >= the reference rung's — the r13 probe measured
    # base 11 at 100x costing recall 0.07 vs 0.12 at base 10)
    assert hnsw_plane_schedule(20_000) == (7, 4, 1)
    assert hnsw_plane_schedule(60_000) == (8, 5, 2)
    assert hnsw_plane_schedule(200_000) == (10, 7, 4)
    # a 10^9-vector user inherits scaled hashes, not fixture constants
    base, l1, l2 = hnsw_plane_schedule(1_000_000_000)
    assert base == 4 + 18 and l1 == base - 3 and l2 == base - 6
    # monotone non-decreasing in n
    prev = (0, 0, 0)
    for n in (1, 2_000, 4_000, 20_000, 10**6, 10**9):
        cur = hnsw_plane_schedule(n)
        assert all(c >= p for c, p in zip(cur, prev)), (n, cur, prev)
        prev = cur


def test_graph_search_schedule_laws():
    """The r14 SEARCH-side laws (VERDICT r13 item 3), grid-calibrated
    by tools/scaleprobe_beam_r14.py + scaleprobe_hnswhops_r14.py:
    NSW beam doubles and hops gain one per decade of corpus growth
    past the 2,000-row reference rung (measured recall 0.37/0.52/0.35
    at 1x/10x/100x vs 0.37/0.27/0.12 at fixed constants); HNSW's base
    beam ramps one doubling steeper because the descent's single
    global entry degrades faster than NSW's LSH warm start (measured
    0.38/0.63/0.37 vs 0.15 fixed at 100x). Floors keep every test SF
    on the authored constants, so all oracle hashes are unchanged."""
    from spark_glove_spark.operators.ann import (
        hnsw_search_schedule,
        nsw_search_schedule,
    )

    # fixture SFs (50/500/2,000 rows): authored constants, bit-for-bit
    for n in (1, 50, 500, 2_000):
        assert nsw_search_schedule(n) == (12, 5), n
        assert hnsw_search_schedule(n) == ((4, 8, 12), (2, 2, 3)), n
    # the calibrated ladder rungs
    assert nsw_search_schedule(20_000) == (24, 6)
    assert nsw_search_schedule(200_000) == (48, 7)
    assert hnsw_search_schedule(20_000) == ((8, 16, 48), (2, 2, 6))
    assert hnsw_search_schedule(200_000) == ((8, 24, 96), (2, 2, 8))
    # fractional decades keep the current rung's knobs (floor-not-round)
    assert nsw_search_schedule(199_999) == (24, 6)
    # a 10^9-vector user inherits production-sized ef, derived
    assert nsw_search_schedule(1_000_000_000) == (12 * 2**5, 10)
    b, h = hnsw_search_schedule(1_000_000_000)
    assert b == (8, 8 * 6, 12 * 2**6) and h == (2, 2, 14)
    # monotone non-decreasing in n (both laws, every knob)
    prev_b, prev_h = (0, 0), 0
    for n in (1, 2_000, 20_001, 2 * 10**5, 10**7, 10**9):
        beam, hops = nsw_search_schedule(n)
        assert beam >= prev_b[0] and hops >= prev_h, n
        prev_b, prev_h = (beam, beam), hops


def test_ivf_list_schedule_law():
    """The r14 IVF law (the graph laws' discipline on the cell tier):
    n_lists ~ sqrt(n) bounded to >= 64 rows/list, n_probe ~
    sqrt(n_lists), so the scanned fraction n_probe/n_lists falls like
    n^(-1/4). Floors keep every test SF (embeddings tables: 50/500/
    5,000 rows) on the authored (8, 2); the lanes also pin their
    knobs explicitly, so oracle hashes cannot move either way."""
    from spark_glove_spark.operators.ann import ivf_list_schedule

    for n in (1, 50, 500, 5_000, 8_192):
        assert ivf_list_schedule(n) == (8, 2), n
    assert ivf_list_schedule(20_000) == (141, 12)
    assert ivf_list_schedule(200_000) == (447, 21)
    # the trainable-width cap binds at large n: the driver-side fit
    # trains <= 512 lists well from its 32k sample (wider wants the
    # distributed k-means; the schedule never hands out widths the
    # coarse fit can't honor)
    nl, np_ = ivf_list_schedule(1_000_000_000)
    assert (nl, np_) == (512, 23)
    # the >=64-rows-per-list bound binds just past the reference rung
    nl_small, _ = ivf_list_schedule(9_000)
    assert nl_small <= 9_000 // 64
    # scanned fraction strictly falls across the ladder
    fracs = [
        p / l for l, p in map(ivf_list_schedule, (20_000, 200_000, 10**9))
    ]
    assert fracs == sorted(fracs, reverse=True) and fracs[-1] < 0.05


def test_probe_dedup_scored_equals_distinct_window(spark):
    """r14 optimization: the beam hop's per-probe dedup rides ONE
    exchange (groupBy + array_distinct + inline) instead of
    distinct() + the rank window's shuffle. Teeth: (1) the helper's
    output EQUALS the old distinct() on a duplicate-heavy frontier,
    (2) a row_number window over its output plans with exactly one
    Exchange — the aggregate's — because inline preserves
    hashpartitioning(probe_id)."""
    from pyspark.sql import Window

    from spark_glove_spark.operators.ann import _probe_dedup_scored

    rows = []
    for p in range(5):
        for nd in range(20):
            # every (probe, node) appears 3x with identical payload —
            # the multi-edge proposal shape the hop actually produces
            for _ in range(3):
                rows.append((p, nd, (p * 7 + nd) % 11 - 5, nd + 1))
    raw = spark.createDataFrame(
        rows, "probe_id long, node long, num long, nn long"
    ).withColumn(
        "score",
        F.col("num").cast("double") / F.sqrt(F.col("nn").cast("double")),
    )
    got = _probe_dedup_scored(raw)
    want = raw.distinct()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    wb = Window.partitionBy("probe_id").orderBy(F.col("score").desc(), "node")
    ranked = got.withColumn("rn", F.row_number().over(wb)).where("rn <= 3")
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
