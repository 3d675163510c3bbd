"""Embedding / similarity-search queries (SURVEY.md §2: H7, H8, H9, H15).

The brute-force scan is the exact baseline every ANN variant (H16,
operators/ann.py) is measured against. Scale shape: probes are always
the broadcast side; the corpus never shuffles for scoring — only the
final per-probe top-k reduces. At 100 TB corpus: same plan, plus a
bounded-heap mapInPandas pre-reduction per partition before the window
(SURVEY §4.3.5) so the shuffle carries k rows per (probe, partition)
instead of the full scored corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_glove_spark.functions.vector import dot, dot_sql, vec_add, vec_sub
from spark_glove_spark.registry import defer_unpersist, query
from spark_glove_spark.sources import parallelized, table


@query(
    "h7_topk_cosine",
    section="H7",
    oracle=f"""
WITH probe AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, e.label,
       round({dot_sql('e.embedding', 'probe.q')}, 6) AS cos
FROM embeddings e CROSS JOIN probe
WHERE e.vec_id <> 0
ORDER BY cos DESC, e.vec_id
LIMIT 10
""",
)
def h7_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H7: findSynonyms shape — top-10 nearest to vec_id 0 by cosine

    (unit vectors ⇒ dot). Probe broadcast; corpus scanned once; top-k
    via TakeOrderedAndProject."""
    e = table(spark, sf_dir, "embeddings")
    probe = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            "label",
            F.round(dot(F.col("embedding"), F.col("q")), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(10)
    )


@query(
    "h8_analogy",
    section="H8",
    oracle=f"""
WITH a AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
b AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 1),
c AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 2),
q AS (
  SELECT list_transform(generate_series(1, len(a.v)),
                        i -> CAST(a.v[i] AS DOUBLE) - CAST(b.v[i] AS DOUBLE)
                             + CAST(c.v[i] AS DOUBLE)) AS q
  FROM a, b, c
)
SELECT e.vec_id, round({dot_sql('e.embedding', 'q.q')}, 6) AS score
FROM embeddings e CROSS JOIN q
WHERE e.vec_id NOT IN (0, 1, 2)
ORDER BY score DESC, e.vec_id
LIMIT 5
""",
)
def h8_analogy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H8: analogy query vec(a) − vec(b) + vec(c) → top-5 nearest.

    The query vector is composed with double-precision zip_with
    arithmetic, then scored like H7."""
    e = table(spark, sf_dir, "embeddings")

    def vec_of(vid: int) -> DataFrame:
        return e.where(F.col("vec_id") == vid).select(
            F.col("embedding").alias(f"v{vid}")
        )

    q = (
        vec_of(0)
        .crossJoin(vec_of(1))
        .crossJoin(vec_of(2))
        .select(
            vec_add(vec_sub(F.col("v0"), F.col("v1")), F.col("v2")).alias("q")
        )
    )
    return (
        e.where(~F.col("vec_id").isin(0, 1, 2))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(dot(F.col("embedding"), F.col("q")), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), "vec_id")
        .limit(5)
    )


@query(
    "h9_doc_embedding",
    section="H9",
    oracle="""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
counts AS (
  SELECT word, count(*) AS freq FROM words GROUP BY word HAVING count(*) >= 5
),
vocab AS (
  SELECT word, CAST(row_number() OVER (ORDER BY freq DESC, word) AS BIGINT) AS id
  FROM counts
),
tok_vecs AS (
  SELECT w.doc_id, e.embedding
  FROM words w
  JOIN vocab v ON w.word = v.word
  JOIN embeddings e ON v.id = e.vec_id
),
dims AS (
  SELECT doc_id,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM tok_vecs
)
SELECT doc_id, CAST(dim AS BIGINT) AS dim, round(avg(val), 6) AS v
FROM dims
WHERE doc_id % 50 = 0
GROUP BY 1, 2
""",
)
def h9_doc_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H9: mean-pooled document embeddings (Word2Vec.transform shape).

    words → vocab id (broadcast) → word vector (broadcast: vocab-sized)
    → posexplode dims → avg per (doc, dim). Output is dim-exploded so
    every one of the 64 means is hash-checked. avg is accumulation-
    order sensitive in the last ulp — round(6) with ~1e-16 error is
    9 orders of margin."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    counts = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") >= 5)
    )
    vocab = counts.select(
        "word",
        F.row_number()
        .over(Window.orderBy(F.col("freq").desc(), F.col("word")))
        .cast("long")
        .alias("id"),
    )
    tok_vecs = (
        words.join(F.broadcast(vocab), "word")
        .join(F.broadcast(e), F.col("id") == F.col("vec_id"))
        .select("doc_id", "embedding")
    )
    dims = tok_vecs.select(
        "doc_id", F.posexplode("embedding").alias("dim", "val")
    )
    return (
        dims.where(F.col("doc_id") % 50 == 0)
        .groupBy("doc_id", F.col("dim").cast("long").alias("dim"))
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("v"))
    )


@query(
    "h15_knn_bruteforce",
    section="H15,C7,E2",
    oracle=f"""
WITH probes AS (
  SELECT vec_id AS probe_id, embedding AS q FROM embeddings WHERE vec_id % 100 = 0
),
scored AS (
  SELECT p.probe_id, e.vec_id, e.label,
         round({dot_sql('e.embedding', 'p.q')}, 6) AS cos
  FROM embeddings e CROSS JOIN probes p
  WHERE e.vec_id <> p.probe_id
)
SELECT probe_id, vec_id, label, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY cos DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= 10
""",
)
def h15_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H15: brute-force k-NN, k=10, one probe per 100 vec_ids.

    crossJoin(broadcast(probes)) → score → per-probe top-k window.
    The exact baseline for ANN recall (H16)."""
    e = table(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("q")
    )
    # corpus side fans out first: the fixture file is one unsplittable
    # row group, and the scoring work is per-(corpus row x probe)
    scored = (
        parallelized(e).crossJoin(F.broadcast(probes))
        .where(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            "label",
            F.round(dot(F.col("embedding"), F.col("q")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .drop("rn")
    )


@query(
    "h15_knn_filtered",
    section="H15,B2,C7,E2",
    tags=("similarity", "ann"),
    oracle=f"""
WITH probes AS (
  SELECT vec_id AS probe_id, embedding AS q FROM embeddings WHERE vec_id % 100 = 0
),
scored AS (
  SELECT p.probe_id, e.vec_id, e.label,
         round({dot_sql('e.embedding', 'p.q')}, 6) AS cos
  FROM embeddings e CROSS JOIN probes p
  WHERE e.vec_id <> p.probe_id AND e.label % 3 = 0
)
SELECT probe_id, vec_id, label, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY cos DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= 10
""",
)
def h15_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H15 filtered k-NN: the exact brute-force baseline for FILTERED
    vector search — same probes/k as h15_knn_bruteforce but the corpus
    is pre-filtered to ``label % 3 = 0`` (~40% selectivity) BEFORE
    scoring. This is the oracle-checked ground truth the filtered ANN
    path (h16_ivf_filtered) is recall-floored against in tests.

    The predicate sits directly on the corpus scan (before the
    broadcast probe join), so Catalyst pushes it into the parquet
    reader (PushedFilters) and the crossJoin fan-out happens over the
    0.4x sub-corpus — pre-filtering is cheaper AND more correct than
    post-filtering the unfiltered top-k (which returns ~4 of 10 rows
    per probe). At 100 TB this exact tier verifies the ANN tier on
    samples; both share the identical predicate position."""
    e = table(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("q")
    )
    scored = (
        parallelized(e.where(F.col("label") % 3 == 0))
        .crossJoin(F.broadcast(probes))
        .where(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            "label",
            F.round(dot(F.col("embedding"), F.col("q")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .drop("rn")
    )


@query(
    "h15_range_search",
    section="H15,C7,G8",
    tags=("similarity",),
    oracle=f"""
WITH probes AS (
  SELECT vec_id AS probe_id, embedding AS q FROM embeddings WHERE vec_id % 100 = 0
)
SELECT p.probe_id, e.vec_id, e.label,
       round({dot_sql('e.embedding', 'p.q')}, 6) AS cos
FROM embeddings e CROSS JOIN probes p
WHERE e.vec_id <> p.probe_id
  AND {dot_sql('e.embedding', 'p.q')} >= 0.3
""",
)
def h15_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H15 companion: RANGE similarity search — every corpus vector
    within a cosine radius of each probe (cos >= 0.3), rather than a
    fixed k. The retrieval primitive behind "collect all candidates
    above a relevance floor" (e.g. near-dup audit, recall-oriented
    retrieval); complements the top-k form, which can truncate dense
    neighborhoods and pad sparse ones.

    Plan: identical shape to h15_knn_bruteforce — corpus fans out,
    probes broadcast, scoring is a codegen'd double fold — but with NO
    window: the radius predicate filters map-side, so the operator is
    shuffle-free end-to-end (explain shows no Exchange). At 100 TB the
    exact scan is the verification tier; the production tier feeds the
    same predicate from an ANN candidate set (h16_*)."""
    e = table(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("q")
    )
    cos = dot(F.col("embedding"), F.col("q"))
    return (
        parallelized(e)
        .crossJoin(F.broadcast(probes))
        .where((F.col("vec_id") != F.col("probe_id")) & (cos >= 0.3))
        .select(
            "probe_id",
            "vec_id",
            "label",
            F.round(cos, 6).alias("cos"),
        )
    )


@query(
    "h15_mmr_rerank",
    section="H15,J4",
    tags=("similarity",),
    oracle=None,  # greedy-iterative; pinned to an independent replica
    # + diversity property in tests/test_analytics.py
)
def h15_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-rank: per probe, take the top-30
    candidates by cosine (the h15 scan shape), then greedily select
    k=10 maximizing ``0.7*rel(c) - 0.3*max_{s in S} sim(c, s)`` — the
    classic retrieval-diversity step between ANN and the consumer.

    The greedy argmax is inherently sequential per probe, so it runs
    in an ``applyInPandas`` kernel over the BOUNDED candidate group
    (30 rows x 64 dims), never over the corpus: the corpus-sized work
    stays in the scan/top-30 stage (broadcast probes, WindowGroupLimit
    map-side), and Python sees 30-row groups regardless of corpus
    scale. Candidate order into the kernel is pinned (cos desc,
    vec_id) so ties resolve identically everywhere.
    """
    e = table(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("q")
    )
    scored = (
        parallelized(e)
        .crossJoin(F.broadcast(probes))
        .where(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            "embedding",
            dot(F.col("embedding"), F.col("q")).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), "vec_id")
    cands = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 30)
        .drop("rn")
    )

    def kernel(pdf):
        import numpy as np

        pdf = pdf.sort_values(
            ["cos", "vec_id"], ascending=[False, True]
        ).reset_index(drop=True)
        C = np.vstack(pdf["embedding"].to_numpy())
        rel = pdf["cos"].to_numpy()
        S = C @ C.T
        k = min(10, len(pdf))
        lam = 0.7
        sel = [0]  # best relevance first (sort pins ties)
        while len(sel) < k:
            score = lam * rel - (1.0 - lam) * S[:, sel].max(axis=1)
            score[sel] = -np.inf
            sel.append(int(np.argmax(score)))  # first index wins ties
        out = pdf.iloc[sel][["probe_id", "vec_id"]].copy()
        out["mmr_rank"] = range(1, len(sel) + 1)
        out["score"] = [
            round(float(rel[sel[0]]), 6)
        ] + [
            round(
                float(
                    lam * rel[i]
                    - (1.0 - lam) * S[i, sel[:r]].max()
                ),
                6,
            )
            for r, i in enumerate(sel[1:], start=1)
        ]
        return out

    return cands.groupBy("probe_id").applyInPandas(
        kernel, "probe_id long, vec_id long, mmr_rank int, score double"
    )


@query(
    "h15_knn_classifier",
    section="H15,E2,D1",
    tags=("similarity", "ml"),
    oracle=f"""
WITH probes AS (
  SELECT vec_id AS probe_id, embedding AS q, label AS true_label
  FROM embeddings WHERE vec_id % 100 = 0
),
scored AS (
  SELECT p.probe_id, p.true_label, e.label,
         round({dot_sql('e.embedding', 'p.q')}, 6) AS cos, e.vec_id
  FROM embeddings e CROSS JOIN probes p
  WHERE e.vec_id <> p.probe_id
),
nn AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
        PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rn
    FROM scored
  ) WHERE rn <= 10
),
votes AS (
  SELECT probe_id, true_label, label, count(*) AS n_votes,
         max(cos) AS best_cos
  FROM nn GROUP BY 1, 2, 3
)
SELECT probe_id, true_label,
       CAST(label AS INTEGER) AS predicted,
       CAST(n_votes AS BIGINT) AS n_votes
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY probe_id
      ORDER BY n_votes DESC, best_cos DESC, label) AS vr
  FROM votes
) WHERE vr = 1
""",
)
def h15_knn_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification over the embedding corpus: each probe takes
    its 10 nearest neighbors by cosine (the h15 broadcast-probe scan)
    and predicts the majority label, ties broken by best neighbor
    similarity then label id — the lazy-learning baseline classifier,
    and the standard label-propagation primitive for weak labeling at
    corpus scale. Same plan as h15 plus one bounded vote aggregate:
    the corpus never shuffles, votes are 10 rows per probe.

    Fixture honesty: the synthetic labels are independent of the
    embedding geometry (measured accuracy ~ chance), so no accuracy
    floor is asserted — the oracle verifies the MECHANICS (neighbor
    sets, vote counts, tiebreaks) exactly, which is what transfers to
    a corpus whose labels do cluster.
    """
    e = table(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("q"),
        F.col("label").alias("true_label"),
    )
    scored = (
        parallelized(e)
        .crossJoin(F.broadcast(probes))
        .where(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "true_label",
            "label",
            F.round(dot(F.col("embedding"), F.col("q")), 6).alias("cos"),
            "vec_id",
        )
    )
    wnn = Window.partitionBy("probe_id").orderBy(
        F.col("cos").desc(), "vec_id"
    )
    nn = (
        scored.withColumn("rn", F.row_number().over(wnn))
        .where(F.col("rn") <= 10)
    )
    votes = nn.groupBy("probe_id", "true_label", "label").agg(
        F.count(F.lit(1)).alias("n_votes"), F.max("cos").alias("best_cos")
    )
    wv = Window.partitionBy("probe_id").orderBy(
        F.col("n_votes").desc(), F.col("best_cos").desc(), "label"
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .where(F.col("vr") == 1)
        .select(
            "probe_id",
            "true_label",
            F.col("label").cast("int").alias("predicted"),
            F.col("n_votes").cast("long").alias("n_votes"),
        )
    )


@query(
    "h15_centroid_classifier",
    section="H15,H9,D1",
    tags=("similarity", "ml"),
    oracle=f"""
WITH pos AS (
  SELECT label, generate_subscripts(embedding, 1) AS dim,
         unnest(embedding) AS v
  FROM embeddings WHERE vec_id % 100 <> 0
),
cent AS (
  SELECT label, list(av ORDER BY dim) AS c
  FROM (SELECT label, dim, avg(v) AS av FROM pos GROUP BY 1, 2)
  GROUP BY 1
),
probes AS (
  SELECT vec_id AS probe_id, embedding AS q, label AS true_label
  FROM embeddings WHERE vec_id % 100 = 0
),
scored AS (
  SELECT p.probe_id, p.true_label, cent.label,
         round({dot_sql('cent.c', 'p.q')}, 6) AS score
  FROM probes p CROSS JOIN cent
)
SELECT probe_id, true_label,
       CAST(label AS INTEGER) AS predicted,
       score
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY probe_id ORDER BY score DESC, label) AS r
  FROM scored
) WHERE r = 1
""",
)
def h15_centroid_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classification: per-label centroids
    via DISTRIBUTED vector averaging — posexplode to (label, dim,
    value), one hash aggregate, re-assembled with sort-inside-
    aggregate — then each held-out probe takes the best-scoring
    centroid. The centroid table is labels x dims tiny and broadcast;
    probe scoring is map-side. This is the vector-aggregation
    primitive (same shape as H9's doc pooling) fused with the h7
    scoring shape; where kNN pays a corpus scan per batch, Rocchio
    pays one corpus scan EVER, then O(labels) per probe forever — the
    classic scale trade. (Same fixture-honesty note as
    h15_knn_classifier: labels are random w.r.t. geometry, so the
    oracle proves mechanics, not accuracy.)
    """
    e = table(spark, sf_dir, "embeddings")
    train = e.where(F.col("vec_id") % 100 != 0)
    pos = train.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    )
    cent = (
        pos.groupBy("label", "dim")
        .agg(F.avg("v").alias("av"))
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "av"))
            ).alias("pairs")
        )
        .select(
            "label",
            F.transform(F.col("pairs"), lambda p: p["av"]).alias("c"),
        )
    )
    probes = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("q"),
        F.col("label").alias("true_label"),
    )
    scored = probes.crossJoin(F.broadcast(cent)).select(
        "probe_id",
        "true_label",
        "label",
        F.round(dot(F.col("c"), F.col("q")), 6).alias("score"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("score").desc(), "label")
    return (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select(
            "probe_id",
            "true_label",
            F.col("label").cast("int").alias("predicted"),
            "score",
        )
    )


@query(
    "h15_hard_negatives",
    section="H15,C7,E2",
    tags=("similarity", "llm-pipeline"),
    oracle=f"""
WITH anchors AS (
  SELECT vec_id AS anchor_id, embedding AS q, label AS anchor_label
  FROM embeddings WHERE vec_id % 100 = 0
),
scored AS (
  SELECT a.anchor_id, a.anchor_label, e.vec_id AS negative_id,
         e.label AS negative_label,
         round({dot_sql('e.embedding', 'a.q')}, 6) AS cos
  FROM embeddings e CROSS JOIN anchors a
  WHERE e.label <> a.anchor_label
)
SELECT anchor_id, anchor_label, negative_id, negative_label, cos
FROM (
  SELECT *, row_number() OVER (PARTITION BY anchor_id
                               ORDER BY cos DESC, negative_id) AS rn
  FROM scored
) WHERE rn <= 3
""",
)
def h15_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining — the training-data op behind contrastive
    embedding fine-tuning (in-batch negatives are easy; the gradient
    signal lives in near-misses): for each anchor, the top-3 most
    similar vectors with a DIFFERENT label. Same exact
    broadcast-probe scan shape as h15_knn_bruteforce with the label
    inequality pushed into the scoring filter, so mined negatives are
    by construction the hardest ones the corpus offers.

    At 100 TB the anchor set broadcasts in batches and the corpus is
    scanned once per batch; the per-anchor top-3 is WindowGroupLimit-
    bounded. Swap the scan for the h16 ANN variants (same key shape)
    when the corpus no longer admits a full pass per anchor batch.
    """
    e = table(spark, sf_dir, "embeddings")
    anchors = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("q"),
        F.col("label").alias("anchor_label"),
    )
    scored = (
        parallelized(e)
        .crossJoin(F.broadcast(anchors))
        .where(F.col("label") != F.col("anchor_label"))
        .select(
            "anchor_id",
            "anchor_label",
            F.col("vec_id").alias("negative_id"),
            F.col("label").alias("negative_label"),
            F.round(dot(F.col("embedding"), F.col("q")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos").desc(), "negative_id"
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Portable MMR: the greedy diversity re-rank unrolled as a hash-matchable
# query (VERDICT r4 item 3 continued — the twin treatment applied to MMR).


_MMRP_CANDS = 8
_MMRP_K = 4
_MMRP_SCALE = 1000  # fixed-point quantization, the ann.py _PL_SCALE value
_MMRP_WREL = 7  # lambda = 0.7 as integer weights: score = 7*rel - 3*maxsim
_MMRP_WDIV = 3


def _mmrp_oracle() -> str:
    rounds = []
    for r in range(2, _MMRP_K + 1):
        selset = "\n    UNION ALL ".join(
            f"SELECT probe_id, vec_id FROM sel{i}" for i in range(1, r)
        )
        rounds.append(f""",
selset{r} AS (
    {selset}
),
ms{r} AS (
  SELECT s.probe_id, s.a AS vec_id, max(s.sim) AS maxsim
  FROM sim s JOIN selset{r} t
    ON t.probe_id = s.probe_id AND t.vec_id = s.b
  GROUP BY 1, 2
),
sel{r} AS (
  SELECT probe_id, vec_id, {r} AS mmr_rank, score FROM (
    SELECT c.probe_id, c.vec_id,
           {_MMRP_WREL} * c.rel - {_MMRP_WDIV} * m.maxsim AS score,
           row_number() OVER (
             PARTITION BY c.probe_id
             ORDER BY {_MMRP_WREL} * c.rel - {_MMRP_WDIV} * m.maxsim DESC,
                      c.vec_id
           ) AS rn
    FROM cand c
    JOIN ms{r} m ON m.probe_id = c.probe_id AND m.vec_id = c.vec_id
    WHERE NOT EXISTS (
      SELECT 1 FROM selset{r} x
      WHERE x.probe_id = c.probe_id AND x.vec_id = c.vec_id
    )
  ) WHERE rn = 1
)""")
    finals = "\nUNION ALL ".join(
        f"SELECT probe_id, vec_id, CAST(mmr_rank AS BIGINT) AS mmr_rank, "
        f"CAST(score AS BIGINT) AS score FROM sel{r}"
        for r in range(1, _MMRP_K + 1)
    )
    return f"""
WITH q AS (
  SELECT vec_id, i - 1 AS d,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_MMRP_SCALE} + 0.5) AS BIGINT) AS v
  FROM embeddings, range(1, 65) r(i)
),
probes AS (SELECT vec_id AS probe_id FROM embeddings WHERE vec_id % 100 = 0),
rels AS (
  SELECT p.probe_id, qc.vec_id, CAST(sum(qp.v * qc.v) AS BIGINT) AS rel
  FROM probes p
  JOIN q qp ON qp.vec_id = p.probe_id
  JOIN q qc ON qc.d = qp.d AND qc.vec_id <> p.probe_id
  GROUP BY 1, 2
),
cand AS (
  SELECT probe_id, vec_id, rel FROM (
    SELECT probe_id, vec_id, rel,
           row_number() OVER (
             PARTITION BY probe_id ORDER BY rel DESC, vec_id) AS rn
    FROM rels
  ) WHERE rn <= {_MMRP_CANDS}
),
sim AS (
  SELECT a.probe_id, a.vec_id AS a, b.vec_id AS b,
         CAST(sum(qa.v * qb.v) AS BIGINT) AS sim
  FROM cand a
  JOIN cand b ON b.probe_id = a.probe_id
  JOIN q qa ON qa.vec_id = a.vec_id
  JOIN q qb ON qb.vec_id = b.vec_id AND qb.d = qa.d
  GROUP BY 1, 2, 3
),
sel1 AS (
  SELECT probe_id, vec_id, 1 AS mmr_rank, {_MMRP_WREL} * rel AS score FROM (
    SELECT probe_id, vec_id, rel,
           row_number() OVER (
             PARTITION BY probe_id ORDER BY rel DESC, vec_id) AS rn
    FROM cand
  ) WHERE rn = 1
){''.join(rounds)}
{finals}
"""


@query("h15_mmr_portable", section="H15,E2", oracle=_mmrp_oracle())
def h15_mmr_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-rank, hash-matchable form: top-8 candidates by
    integer-dot relevance, then FOUR greedy selections of
    ``7*rel - 3*max_sim_to_selected`` (lambda = 0.7 as exact integer
    weights), each selection unrolled as its own declarative stage —
    no Python kernel anywhere, and the DuckDB oracle unrolls the
    identical four stages, so the greedy argmax sequence (including
    every tie-break: rel desc then vec_id; score desc then vec_id)
    is hash-checked end to end. Embeddings are fixed-point quantized
    (the ann.py discipline) so rel and sim are exact int64 dots and
    the score arithmetic is integer.

    The production path (h15_mmr_rerank) keeps the 30->10 float
    kernel (sequential greedy in applyInPandas over bounded groups);
    this twin exists so the MMR MATH carries a driver hash record.
    Scale shape: everything downstream of the top-8 window touches
    <= 8 rows per probe — the unrolled joins are constant-size."""
    e = parallelized(table(spark, sf_dir, "embeddings"))
    qv = F.transform(
        "embedding",
        lambda x: F.floor(
            x.cast("double") * F.lit(float(_MMRP_SCALE)) + F.lit(0.5)
        ),
    )
    base = defer_unpersist(e.select("vec_id", qv.alias("qv")).persist())
    zero = F.lit(0).cast("long")
    probes = base.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("qv").alias("qp")
    )
    rel = F.aggregate(
        F.zip_with("qv", "qp", lambda x, y: x * y), zero, lambda a, x: a + x
    )
    scored = (
        base.crossJoin(F.broadcast(probes))
        .where(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", "qv", rel.alias("rel"))
    )
    wrel = Window.partitionBy("probe_id").orderBy(F.col("rel").desc(), "vec_id")
    # localCheckpoint (not persist): the 4 unrolled selection rounds
    # each re-reference cand/sim/sel lineage, and the PRINTED plan
    # re-expands persisted subtrees per consumer — checkpointing the
    # bounded frames (<= 8 rows/probe) keeps the plan flat (planlint)
    cand = (
        scored.withColumn("rn", F.row_number().over(wrel))
        .where(F.col("rn") <= _MMRP_CANDS)
        .drop("rn")
        .localCheckpoint(eager=True)
    )
    simdot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y), zero, lambda a, x: a + x
    )
    sim = (
        cand.select("probe_id", F.col("vec_id").alias("a"), F.col("qv").alias("qa"))
        .join(
            cand.select(
                F.col("probe_id").alias("pb"),
                F.col("vec_id").alias("b"),
                F.col("qv").alias("qb"),
            ),
            F.col("probe_id") == F.col("pb"),
        )
        .select("probe_id", "a", "b", simdot.alias("sim"))
    )
    sim = sim.localCheckpoint(eager=True)
    sels = [
        cand.withColumn("rn", F.row_number().over(wrel))
        .where(F.col("rn") == 1)
        .select(
            "probe_id",
            "vec_id",
            F.lit(1).cast("long").alias("mmr_rank"),
            (F.col("rel") * _MMRP_WREL).alias("score"),
        )
    ]
    for r in range(2, _MMRP_K + 1):
        selset = sels[0].select("probe_id", "vec_id")
        for s in sels[1:]:
            selset = selset.unionByName(s.select("probe_id", "vec_id"))
        ms = (
            sim.join(
                selset.select(
                    F.col("probe_id").alias("sp"), F.col("vec_id").alias("sv")
                ),
                (F.col("probe_id") == F.col("sp")) & (F.col("b") == F.col("sv")),
            )
            .groupBy("probe_id", "a")
            .agg(F.max("sim").alias("maxsim"))
        )
        score = F.col("rel") * _MMRP_WREL - F.col("maxsim") * _MMRP_WDIV
        wsc = Window.partitionBy("probe_id").orderBy(
            score.desc(), "vec_id"
        )
        sel_r = (
            cand.join(
                ms,
                (cand["probe_id"] == ms["probe_id"])
                & (cand["vec_id"] == ms["a"]),
            )
            .drop(ms["probe_id"])
            .join(selset, ["probe_id", "vec_id"], "left_anti")
            .withColumn("rn", F.row_number().over(wsc))
            .where(F.col("rn") == 1)
            .select(
                "probe_id",
                "vec_id",
                F.lit(r).cast("long").alias("mmr_rank"),
                score.alias("score"),
            )
        )
        sels.append(sel_r.localCheckpoint(eager=True))
    out = sels[0]
    for s in sels[1:]:
        out = out.unionByName(s)
    return out


_MRL_DIM = 16


@query(
    "h9_matryoshka_truncate",
    section="H7,H9,G8",
    tags=("embeddings", "llm-pipeline"),
    oracle=f"""
WITH probe AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
tr AS (
  SELECT e.vec_id, e.label,
         list_reduce(list_transform(generate_series(1, {_MRL_DIM}),
             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(probe.q[i] AS DOUBLE)),
             (x, y) -> x + y) AS dt,
         sqrt(list_reduce(list_transform(generate_series(1, {_MRL_DIM}),
             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
             (x, y) -> x + y)) AS ne,
         sqrt(list_reduce(list_transform(generate_series(1, {_MRL_DIM}),
             i -> CAST(probe.q[i] AS DOUBLE) * CAST(probe.q[i] AS DOUBLE)),
             (x, y) -> x + y)) AS nq,
         list_reduce(list_transform(generate_series(1, len(e.embedding)),
             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(probe.q[i] AS DOUBLE)),
             (x, y) -> x + y) AS full_dot
  FROM embeddings e CROSS JOIN probe
  WHERE e.vec_id <> 0
)
SELECT vec_id, label,
       round(dt / (ne * nq), 6) AS cos_trunc,
       round(full_dot, 6) AS cos_full
FROM tr
ORDER BY cos_trunc DESC, vec_id
LIMIT 10
""",
)
def h9_matryoshka_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncated retrieval (Kusupati et al. 2022,
    public): rank the corpus for a probe using only the FIRST 16 of
    64 embedding dimensions, renormalized over the kept prefix — the
    memory/latency lever MRL-trained models expose (coarse search in
    the prefix, exact re-rank in full precision). The output carries
    BOTH the truncated cosine (the ranking key) and the full-dim
    cosine per returned row, so the ranking degradation is visible in
    the hash-checked result itself — the calibration a pipeline runs
    before committing to a truncation level.

    100 TB: the truncated score reads a quarter of the vector bytes
    (the scan-side win quantization also chases — h16_int8_quant is
    the orthogonal lever); plan shape is h7's broadcast-probe scan
    with a TakeOrderedAndProject."""
    e = parallelized(table(spark, sf_dir, "embeddings"))
    probe = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    tr = F.slice("embedding", 1, _MRL_DIM)
    qr = F.slice("q", 1, _MRL_DIM)
    dt = dot(tr, qr)
    ne = F.sqrt(dot(tr, tr))
    nq = F.sqrt(dot(qr, qr))
    return (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            "label",
            F.round(dt / (ne * nq), 6).alias("cos_trunc"),
            F.round(dot(F.col("embedding"), F.col("q")), 6).alias("cos_full"),
        )
        .orderBy(F.col("cos_trunc").desc(), "vec_id")
        .limit(10)
    )


_RRF_K = 60  # the standard reciprocal-rank-fusion constant


@query(
    "h15_rrf_fusion",
    section="H15,H7,E1",
    tags=("embeddings", "llm-pipeline"),
    oracle=f"""
WITH probe AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, e.label,
         list_reduce(list_transform(generate_series(1, len(e.embedding)),
             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(probe.q[i] AS DOUBLE)),
             (x, y) -> x + y) AS full_dot,
         list_reduce(list_transform(generate_series(1, {_MRL_DIM}),
             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(probe.q[i] AS DOUBLE)),
             (x, y) -> x + y) AS coarse_dot
  FROM embeddings e CROSS JOIN probe
  WHERE e.vec_id <> 0
),
ranked AS (
  SELECT vec_id, label,
         row_number() OVER (ORDER BY full_dot DESC, vec_id) AS r_full,
         row_number() OVER (ORDER BY coarse_dot DESC, vec_id) AS r_coarse
  FROM scored
)
SELECT vec_id, label,
       CAST(r_full AS BIGINT) AS r_full,
       CAST(r_coarse AS BIGINT) AS r_coarse,
       round(1.0 / ({_RRF_K} + r_full) + 1.0 / ({_RRF_K} + r_coarse), 6)
         AS rrf
FROM ranked
ORDER BY rrf DESC, vec_id
LIMIT 10
""",
)
def h15_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009, public) — THE
    standard way retrieval pipelines combine rankers without score
    calibration: fused(d) = Σ 1/(k + rank_i(d)) with k=60. Here the
    two rankers are the full 64-dim cosine and the 16-dim matryoshka
    prefix (the coarse/full pair h9_matryoshka_truncate calibrates) —
    the production hybrid where the coarse ranking is cheap and the
    fusion recovers most full-precision quality. Ranks use integer
    row_number with a vec_id tiebreak, so the fused score is exact
    rational arithmetic — fully hash-checked.

    100 TB: each ranker is the h7 broadcast-probe scan; fusion is a
    rank window per ranker over the candidate set + one arithmetic
    combine — at scale the windows run over each ranker's top-N
    candidates (bounded), never the corpus."""
    e = parallelized(table(spark, sf_dir, "embeddings"))
    probe = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    scored = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            "label",
            dot(F.col("embedding"), F.col("q")).alias("full_dot"),
            dot(
                F.slice("embedding", 1, _MRL_DIM), F.slice("q", 1, _MRL_DIM)
            ).alias("coarse_dot"),
        )
    )
    wf = Window.orderBy(F.col("full_dot").desc(), "vec_id")
    wc = Window.orderBy(F.col("coarse_dot").desc(), "vec_id")
    ranked = scored.select(
        "vec_id",
        "label",
        F.row_number().over(wf).alias("r_full"),
        F.row_number().over(wc).alias("r_coarse"),
    )
    rrf = F.round(
        1.0 / (_RRF_K + F.col("r_full")) + 1.0 / (_RRF_K + F.col("r_coarse")),
        6,
    )
    return (
        ranked.select(
            "vec_id",
            "label",
            F.col("r_full").cast("long"),
            F.col("r_coarse").cast("long"),
            rrf.alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "vec_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Late-interaction (multi-vector) retrieval — the ColBERT search shape
# (Khattab & Zaharia, SIGIR 2020, public): a document is a BAG of unit
# vectors, a query scores as the sum over its units of the best match
# in the document: MaxSim(q, d) = Σ_{u∈q} max_{v∈d} ⟨u, v⟩. The
# engine-relevant part is the two-level aggregation shape (pair dots →
# per-(probe, doc, q-unit) MAX → per-(probe, doc) SUM → top-k), which
# no single-vector operator expresses.

_MS_DIMS = 4  # unit-vector dims (kept small: the MATH is the exhibit)
_MS_TOPK = 3


def _ms_unit_vec_sql(unit: str) -> str:
    """One unit-vector coordinate, exact-integer from md5 — evaluated
    identically by Spark and DuckDB (the dedup.py:898 discipline)."""
    return (
        f"(('0x' || substr(md5('mv' || CAST(d AS VARCHAR) || '|' || {unit}),"
        f" 1, 8))::BIGINT % 2001) - 1000"
    )


def _maxsim_oracle() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
bg0 AS (
  SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
  FROM t WHERE len(toks) >= 2
),
bg AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(toks, i, i + 1), ' ') AS u
  FROM bg0
),
uv AS (
  SELECT doc_id, u, d, {_ms_unit_vec_sql("u")} AS v
  FROM bg, range({_MS_DIMS}) r(d)
),
quv AS (SELECT doc_id AS probe_id, u AS qu, d, v FROM uv WHERE doc_id % 200 = 0),
duv AS (SELECT doc_id, u, d, v FROM uv WHERE doc_id % 7 = 3),
dots AS (
  SELECT q.probe_id, c.doc_id, q.qu, c.u,
         CAST(sum(q.v * c.v) AS BIGINT) AS s
  FROM quv q
  JOIN duv c ON c.d = q.d AND c.doc_id <> q.probe_id
  GROUP BY 1, 2, 3, 4
),
mx AS (
  SELECT probe_id, doc_id, qu, max(s) AS mxs
  FROM dots GROUP BY 1, 2, 3
),
score AS (
  SELECT probe_id, doc_id, CAST(sum(mxs) AS BIGINT) AS score
  FROM mx GROUP BY 1, 2
),
ranked AS (
  SELECT probe_id, doc_id, score,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY score DESC, doc_id) AS rn
  FROM score
)
SELECT probe_id, doc_id, score FROM ranked WHERE rn <= {_MS_TOPK}
"""


@query("h15_maxsim", section="H15,H11,G7", oracle=_maxsim_oracle())
def h15_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction multi-vector retrieval (the ColBERT MaxSim
    search), fully ORACLE-checked: documents decompose into DISTINCT
    word-bigram units, each unit carries a {_MS_DIMS}-d exact-integer
    pseudo-embedding derived from md5 (a deterministic stand-in for a
    learned token encoder — the SEARCH ALGEBRA is what this certifies,
    as with the h16 portable twins), and a probe document's score
    against a candidate is Σ over the probe's units of the best
    inner product among the candidate's units; top-3 per probe with
    doc_id tiebreaks.

    Plan shape: unit vectors are EXPRESSIONS over the exploded bigram
    rows (no join to build them); the unit-pair fan-out is a broadcast
    of the tiny probe-unit side against the candidate units; then two
    hash aggregations (MAX per (probe, doc, q-unit), SUM per
    (probe, doc)) and a per-probe top-k window. 100 TB: production
    late-interaction bounds the pair fan-out with an ANN index per
    query unit (h16's job — candidates per unit ∝ collisions) and this
    exact MaxSim runs as the RE-RANK over that bounded candidate set;
    the two-level agg shape is identical either way."""
    d = parallelized(table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    units = (
        d.where(F.size(toks) >= 2)
        .select("doc_id", F.explode(bigrams).alias("u"))
        .distinct()
    )
    vec = F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"mv{dd}|"), F.col("u"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % 2001
            - 1000
            for dd in range(_MS_DIMS)
        ]
    )
    zero = F.lit(0).cast("long")
    q_units = units.where(F.col("doc_id") % 200 == 0).select(
        F.col("doc_id").alias("probe_id"),
        F.col("u").alias("qu"),
        vec.alias("qv"),
    )
    d_units = units.where(F.col("doc_id") % 7 == 3).select(
        "doc_id", "u", vec.alias("dv")
    )
    s = F.aggregate(
        F.zip_with("qv", "dv", lambda x, y: x * y), zero, lambda a, x: a + x
    )
    pairs = (
        d_units.crossJoin(F.broadcast(q_units))
        .where(F.col("doc_id") != F.col("probe_id"))
        .select("probe_id", "doc_id", "qu", s.alias("s"))
    )
    mx = pairs.groupBy("probe_id", "doc_id", "qu").agg(F.max("s").alias("mxs"))
    score = mx.groupBy("probe_id", "doc_id").agg(
        F.sum("mxs").cast("long").alias("score")
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("score").desc(), "doc_id")
    return (
        score.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _MS_TOPK)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: the query a production retrieval stack actually
# serves — ONE query's terms drive a lexical BM25 ranker AND a dense
# embedding ranker, the two top-N candidate lists fuse by reciprocal
# rank, all hash-matchable.

_HY_TERMS = ("vector", "query", "dup")  # the h10_bm25 query, reused
_HY_TOPN = 20  # candidates kept per ranker before fusion
_HY_K = 60  # the standard RRF constant
_HY_NVEC = 500  # word -> vector-table id: md5 mod 500 (vec_ids 0..499
# exist at EVERY sf, so the mapping is sf-stable)
_HY_SCALE = 1000  # fixed-point quantization (the ann._PL_SCALE value)


def _hy_terms_sql() -> str:
    return ", ".join(f"('{t}')" for t in _HY_TERMS)


def _hy_oracle() -> str:
    return f"""
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
df AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dl),
bm AS (
  SELECT tf.doc_id,
         round(sum(
             ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
         ), 6) AS bm25
  FROM tf
  JOIN df USING (word)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  WHERE tf.word IN {tuple(_HY_TERMS)!r}
  GROUP BY 1
),
stop AS (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT {_HY_TOPN}),
srank AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_sparse
  FROM stop
),
q AS (
  SELECT vec_id, i - 1 AS d,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_HY_SCALE} + 0.5) AS BIGINT) AS v
  FROM embeddings, range(1, 65) r(i)
),
tmap AS (
  SELECT ('0x' || substr(md5('hv|' || term), 1, 8))::BIGINT % {_HY_NVEC} AS vid
  FROM (VALUES {_hy_terms_sql()}) s(term)
),
qsum AS (
  SELECT q.d, CAST(sum(q.v) AS BIGINT) AS sv
  FROM tmap JOIN q ON q.vec_id = tmap.vid GROUP BY 1
),
vocab AS (SELECT DISTINCT word FROM t),
wmap AS (
  SELECT word,
         ('0x' || substr(md5('hv|' || word), 1, 8))::BIGINT % {_HY_NVEC} AS vid
  FROM vocab
),
wscore AS (
  SELECT wmap.word, CAST(sum(q.v * qsum.sv) AS BIGINT) AS ws
  FROM wmap
  JOIN q ON q.vec_id = wmap.vid
  JOIN qsum ON qsum.d = q.d
  GROUP BY 1
),
dense AS (
  SELECT t.doc_id, CAST(sum(ws) AS BIGINT) AS dense
  FROM t JOIN wscore USING (word) GROUP BY 1
),
dtop AS (SELECT doc_id, dense FROM dense ORDER BY dense DESC, doc_id LIMIT {_HY_TOPN}),
drank AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY dense DESC, doc_id) AS r_dense
  FROM dtop
)
SELECT doc_id,
       CAST(COALESCE(r_sparse, 0) AS BIGINT) AS r_sparse,
       CAST(COALESCE(r_dense, 0) AS BIGINT) AS r_dense,
       round(CASE WHEN r_sparse IS NOT NULL
                  THEN 1.0 / ({_HY_K} + r_sparse) ELSE 0.0 END
             + CASE WHEN r_dense IS NOT NULL
                    THEN 1.0 / ({_HY_K} + r_dense) ELSE 0.0 END, 6) AS rrf
FROM srank FULL OUTER JOIN drank USING (doc_id)
ORDER BY rrf DESC, doc_id
LIMIT 10
"""


@query(
    "h15_hybrid_retrieval",
    section="H15,H10,E1",
    tags=("embeddings", "llm-pipeline"),
    oracle=_hy_oracle(),
)
def h15_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval, fully ORACLE-checked: the SAME 3-term query
    drives (a) the h10 BM25 lexical ranker and (b) a dense ranker over
    the embeddings table — each vocabulary word hash-maps (md5, engine-
    identical) to a vector-table row, and by LINEARITY of the dot
    product a document's dense score is just the sum over its tokens
    of a per-WORD integer score dot(vec(word), sum of the query terms'
    vectors): a vocab-sized lookup table, never a per-doc vector
    materialization. The two rankers each cut to top-_HY_TOPN via
    orderBy+limit (TakeOrderedAndProject — no corpus-wide window
    exists anywhere), the ≤20-row lists get rank windows, and
    reciprocal-rank fusion (1/(60+r), the h15_rrf_fusion math) merges
    them with rank-0 sentinels for list misses. BM25 ranks on its
    round-6 score, the dense ranks on exact int64, ties on doc_id —
    every boundary cuts identically in both engines.

    100 TB: the sparse side is the h10 plan (one persisted (doc,word)
    aggregate feeds tf/df/dl/stats); the dense side is one vocab-sized
    broadcast join over the token stream + a map-side sum per doc;
    fusion touches 2 x _HY_TOPN rows. This is the two-tower serving
    shape: rankers never exchange more than their candidate lists."""
    from spark_glove_spark.functions.text import tokenize

    d = parallelized(table(spark, sf_dir, "documents"))
    words = d.select("doc_id", F.explode(tokenize(F.col("text"))).alias("word"))
    tf = defer_unpersist(
        words.groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .persist()
    )

    # --- sparse ranker: the h10_bm25 math, cut to top-N candidates ---
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    df = tf.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    score = (
        F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * F.col("tf")
        * 2.2
        / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl")))
    )
    bm = (
        tf.where(F.col("word").isin(*_HY_TERMS))
        .join(F.broadcast(df), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(score), 6).alias("bm25"))
    )
    stop = bm.orderBy(F.desc("bm25"), "doc_id").limit(_HY_TOPN)
    ws_rank = Window.orderBy(F.desc("bm25"), "doc_id")  # <= _HY_TOPN rows
    srank = stop.select(
        "doc_id", F.row_number().over(ws_rank).alias("r_sparse")
    )

    # --- dense ranker: word -> vector-table id -> per-word int score ---
    e = table(spark, sf_dir, "embeddings")
    qv = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * F.lit(float(_HY_SCALE)) + F.lit(0.5)),
    )
    q_df = e.select(F.col("vec_id").alias("vid"), qv.alias("qv"))
    import hashlib

    term_ids = [
        int(hashlib.md5(f"hv|{t}".encode()).hexdigest()[:8], 16) % _HY_NVEC
        for t in _HY_TERMS
    ]
    # multiplicity matters if two terms hash to one row — keep a row
    # per TERM, not per distinct id
    tvecs = spark.createDataFrame([(v,) for v in term_ids], "vid long")
    qsum = (
        tvecs.join(q_df, "vid")
        .select(F.posexplode("qv").alias("d", "v"))
        .groupBy("d")
        .agg(F.sum("v").cast("long").alias("sv"))
    )
    vocab = tf.select("word").distinct()
    wvid = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("hv|"), F.col("word"))), 1, 8), 16, 10
        ).cast("long")
        % _HY_NVEC
    )
    wmap = vocab.select("word", wvid.alias("vid"))
    wscore = (
        wmap.join(q_df, "vid")
        .select("word", F.posexplode("qv").alias("d", "v"))
        .join(F.broadcast(qsum), "d")
        .groupBy("word")
        .agg(F.sum(F.col("v") * F.col("sv")).cast("long").alias("ws"))
    )
    dense = (
        words.join(wscore, "word")
        .groupBy("doc_id")
        .agg(F.sum("ws").cast("long").alias("dense"))
    )
    dtop = dense.orderBy(F.desc("dense"), "doc_id").limit(_HY_TOPN)
    wd_rank = Window.orderBy(F.desc("dense"), "doc_id")  # <= _HY_TOPN rows
    drank = dtop.select(
        "doc_id", F.row_number().over(wd_rank).alias("r_dense")
    )

    # --- reciprocal-rank fusion over the two candidate lists ---
    fused = srank.join(drank, "doc_id", "full")
    rrf = F.round(
        F.when(
            F.col("r_sparse").isNotNull(), 1.0 / (_HY_K + F.col("r_sparse"))
        ).otherwise(0.0)
        + F.when(
            F.col("r_dense").isNotNull(), 1.0 / (_HY_K + F.col("r_dense"))
        ).otherwise(0.0),
        6,
    )
    return (
        fused.select(
            "doc_id",
            F.coalesce("r_sparse", F.lit(0)).cast("long").alias("r_sparse"),
            F.coalesce("r_dense", F.lit(0)).cast("long").alias("r_dense"),
            rrf.alias("rrf"),
        )
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(10)
    )
