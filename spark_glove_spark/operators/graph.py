"""Connected components over near-duplicate pair graphs (SURVEY.md §2
H13 extension; north-star dedup suite).

Pair generation (MinHash / SimHash / embedding-cosine, dedup.py) emits
EDGES; an actual corpus-dedup pipeline needs CLUSTERS — the transitive
closure of "is a near-dup of" — plus one canonical representative per
cluster to keep. This module supplies that last step as a first-class
distributed operator.

Algorithm: hash-min label propagation. Every vertex starts labeled
with its own id; each round every vertex takes the min label over
itself and its neighbors; fixpoint = per-component min id. Scale
shape (100 TB): the label state is VERTEX-sized (not edge-sized), each
round is one shuffle keyed on vertex id, and the edge list is scanned
once per round from cache. Round count is O(graph diameter) — for
near-dup graphs the diameter is tiny (dup clusters are cliques or
short chains; 3 rounds converge the fixture), which is exactly the
workload this operator targets. For adversarial long-chain graphs the
escalation path is alternating large-star/small-star contraction
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14 — public), which converges in O(log² n) rounds; implemented
here as ``connected_components_star`` (equivalence with hash-min
pinned on planted shapes and seeded random graphs in
tests/test_graph.py) but deliberately not the default, since its
per-round cost is higher and dedup graphs have tiny diameters.

Iterative-plan hygiene: every round ends in ``localCheckpoint`` —
PLANS.md "Known scale caveats" documents the Catalyst stats-product
explosion that unbounded iterative lineage causes; convergence is
detected from a one-scalar count per round (the only driver-side
value, same discipline as the GloVe trainer loss). Checkpoint blocks
from superseded rounds are reclaimed by Spark's ContextCleaner once
the Python references drop (each round rebinds ``labels``/``cur``, so
only the final round's blocks stay live past return) — accepted
behavior per ADVICE r2, documented here rather than forcing an eager
blocking unpersist into the convergence loop.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_glove_spark.functions.vector import dot, dot_sql
from spark_glove_spark.registry import query
from spark_glove_spark.sources import table


def connected_components(
    edges: DataFrame, vertices: DataFrame, max_iter: int = 25
) -> DataFrame:
    """(id, component) for every vertex; component = min id reachable.

    ``edges``: columns (u, v), undirected (one row per pair, either
    orientation). ``vertices``: column (id) — the universe, so
    isolated vertices get singleton components. ``max_iter`` bounds
    the rounds; the loop exits early at fixpoint (near-dup graphs
    converge in a handful of rounds — see module docstring). If the
    bound is hit without a fixpoint (diameter > max_iter), the labels
    would be silently WRONG for the unconverged chains — so this
    warns and falls back to ``connected_components_star``, whose
    round count is O(log² n) regardless of diameter, instead of
    returning labels downstream dedup would wrongly trust.
    """
    sym = (
        edges.select("u", "v")
        .union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .persist()
    )
    labels = (
        vertices.select("id", F.col("id").alias("comp"))
        .localCheckpoint(eager=True)
    )
    changed = -1
    for _ in range(max_iter):
        msgs = sym.join(labels, sym["u"] == labels["id"]).select(
            F.col("v").alias("id"), F.col("comp")
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        warnings.warn(
            f"connected_components did not reach fixpoint in {max_iter} "
            "rounds (graph diameter exceeds the bound); escalating to "
            "large/small-star contraction",
            RuntimeWarning,
            stacklevel=2,
        )
        return connected_components_star(edges, vertices)
    return labels


@query(
    "h13_dedup_clusters",
    section="H13,F5",
    tags=("dedup",),
    oracle=f"""
WITH RECURSIVE pairs AS (
    SELECT a.vec_id AS u, b.vec_id AS v
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {dot_sql('a.embedding', 'b.embedding')} >= 0.4
),
edges AS (
    SELECT u, v FROM pairs
    UNION ALL
    SELECT v AS u, u AS v FROM pairs
),
walk (id, reach) AS (
    SELECT vec_id AS id, vec_id AS reach FROM embeddings
    UNION
    SELECT w.id, e.v AS reach FROM walk w JOIN edges e ON w.reach = e.u
),
comp AS (SELECT id, min(reach) AS component_id FROM walk GROUP BY id)
SELECT CAST(id AS BIGINT) AS vec_id,
       CAST(component_id AS BIGINT) AS component_id,
       CAST(id = component_id AS INT) AS is_canonical,
       CAST(count(*) OVER (PARTITION BY component_id) AS BIGINT) AS cluster_size
FROM comp
""",
)
def h13_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H13 cluster step: near-dup PAIRS → dedup CLUSTERS + canonical
    representative. Edges are the exact, deterministic
    embedding-cosine graph of h13_embedding_neardup (label-blocked,
    cos ≥ 0.4) so the whole pipeline is oracle-checkable — the DuckDB
    twin computes the same transitive closure with a recursive CTE.
    Output: every vector, its component (min vec_id reachable), a
    keep/drop flag (canonical = the component minimum), and the
    cluster size. ``WHERE is_canonical = 1`` IS the dedup action."""
    e = table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("u"), F.col("embedding").alias("va"), "label")
    b = e.select(
        F.col("vec_id").alias("v"),
        F.col("embedding").alias("vb"),
        F.col("label").alias("label_b"),
    )
    edges = (
        a.join(b, (F.col("label") == F.col("label_b")) & (F.col("u") < F.col("v")))
        .where(dot(F.col("va"), F.col("vb")) >= 0.4)
        .select("u", "v")
    )
    verts = e.select(F.col("vec_id").alias("id"))
    comp = connected_components(edges, verts)
    w = Window.partitionBy("component_id")
    return (
        comp.select(
            F.col("id").alias("vec_id"),
            F.col("comp").alias("component_id"),
        )
        .withColumn(
            "is_canonical",
            (F.col("vec_id") == F.col("component_id")).cast("int"),
        )
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
    )


@query("h13_minhash_clusters", section="H13,F5", tags=("dedup",))
def h13_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full production dedup pipeline, end to end: MinHash-LSH
    candidate pairs → exact-Jaccard verify (≥ 0.5) → connected
    components → canonical representative per cluster. ``WHERE
    is_canonical = 0`` is the drop set. Rows-only to the driver
    (bucket membership is hash-function-specific, SURVEY §5.2); the
    correctness tooth is tests/test_graph.py, which pins the clusters
    to a brute-force exact-Jaccard ground truth on the planted
    near-duplicates."""
    from spark_glove_spark.operators.dedup import minhash_neardups

    docs = table(spark, sf_dir, "documents")
    edges = minhash_neardups(docs, threshold=0.5).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    verts = docs.select(F.col("doc_id").alias("id"))
    comp = connected_components(edges, verts)
    w = Window.partitionBy("component_id")
    return (
        comp.select(
            F.col("id").alias("doc_id"), F.col("comp").alias("component_id")
        )
        .withColumn(
            "is_canonical",
            (F.col("doc_id") == F.col("component_id")).cast("int"),
        )
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
    )


def connected_components_star(
    edges: DataFrame, vertices: DataFrame, max_iter: int = 30
) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14 — public):
    the O(log² n)-round algorithm for graphs whose DIAMETER defeats
    hash-min propagation (long chains), at a higher per-round cost.
    Same (id, comp) output contract as ``connected_components`` —
    equivalence on identical inputs is pinned by tests/test_graph.py.

    Per round, each node u looks at its neighborhood N(u) and
    re-points neighbors at m = min(N(u) ∪ {u}): large-star moves only
    strictly-larger neighbors (keeps the graph connected, strictly
    reduces large-star potential), small-star compacts the ≤-side.
    Both are one groupBy(u) + one join back to the edge list — two
    shuffles per round over EDGE-sized data; state never exceeds the
    (shrinking) edge set. Fixpoint = edge set stable, detected from a
    count + order-insensitive hash (two scalars per round)."""
    sym = (
        edges.select("u", "v")
        .union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _star(e: DataFrame, large: bool) -> DataFrame:
        nbrs = e if large else e.where(F.col("v") <= F.col("u"))
        m = (
            nbrs.groupBy("u")
            .agg(F.least(F.min("v"), F.first("u")).alias("m"))
        )
        moved = (
            e.where(F.col("v") > F.col("u")) if large else nbrs
        ).join(m, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
        extra = (
            m.select(F.col("u"), F.col("m").alias("v"))
            if not large
            else moved.limit(0)
        )
        return (
            moved.unionByName(extra)
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def _sig(e: DataFrame):
        # bit_xor: order-insensitive and overflow-free (a SUM of
        # full-range xxhash64 values trips ANSI overflow)
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    cur, cur_sig = sym, _sig(sym)
    for _ in range(max_iter):
        nxt = _star(_star(cur, large=True), large=False)
        # re-symmetrize: star edges are directed (child, root); hash-min
        # over stars needs both directions next round
        nxt = (
            nxt.union(nxt.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        nxt_sig = _sig(nxt)
        done = nxt_sig == cur_sig
        cur, cur_sig = nxt, nxt_sig
        if done:
            break
    # at fixpoint every component is a star around its minimum:
    # label(u) = min(u, min over neighbors) — one final aggregate
    labels = (
        cur.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("comp"))
        .select(F.col("u").alias("id"), "comp")
    )
    return (
        vertices.select("id")
        .join(labels, "id", "left")
        .select("id", F.coalesce("comp", F.col("id")).alias("comp"))
    )
