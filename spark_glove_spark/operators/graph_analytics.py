"""Graph analytics over the word co-occurrence graph (north-star
extension: the GloVe co-occurrence matrix IS a weighted graph, and
the classic distributed graph kernels — triangle counting, PageRank —
are the standard structural probes over it).

Shared edge set: the TOP-100 co-occurrence pairs by GloVe weight
(window=2, self-loops excluded, ties broken by word pair). Window-2
weights are sums of 1 and 0.5 — exactly representable doubles — so
the top-100 cut is bit-deterministic across engines and both
operators below are FULLY oracle-checked (the PageRank oracle unrolls
its 10 power iterations as chained SQL CTEs).

Scale notes (100 TB):

* Triangle counting is the two-equi-join formulation over an
  orientation (s < t) of the edge list — each triangle is found
  exactly once. The standard skew refinement (orient edges from
  lower-degree to higher-degree vertex so hub fan-out is bounded —
  Suri & Vassilvitskii, WWW'11 "Counting Triangles and the Curse of
  the Last Reducer", public) drops in by replacing the (s < t)
  orientation with (deg(s), s) < (deg(t), t); the lexicographic
  orientation is kept here because the oracle must replicate it
  cheaply.
* PageRank state is vertex-sized; each iteration is one equi-join of
  ranks to the out-edge list plus one map-side-combined aggregation —
  the canonical message-passing round. ``localCheckpoint`` per
  iteration (PLANS.md iterative-plan caveat). Degrees are attached to
  the edge list ONCE before the loop, so the per-iteration join
  carries (src, dst, deg) and never recomputes degree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_glove_spark.operators.cooccurrence import cooccurrence_matrix
from spark_glove_spark.registry import defer_unpersist, query
from spark_glove_spark.sources import table

N_EDGES = 100
_DAMPING = 0.85
_PR_ITERS = 10

# DuckDB twin of the shared edge set: top-100 co-occurrence pairs.
_EDGE_CTE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pos AS (SELECT doc_id, unnest(t) AS word,
               generate_subscripts(t, 1) AS pos
        FROM toks),
w AS (
    SELECT least(a.word, b.word) AS s, greatest(a.word, b.word) AS t2,
           sum(1.0 / (b.pos - a.pos)) AS x
    FROM pos a JOIN pos b
      ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 2
    WHERE a.word <> b.word
    GROUP BY 1, 2
),
e AS (SELECT s, t2 FROM w ORDER BY x DESC, s, t2 LIMIT {N_EDGES})
"""


def top_cooccurrence_edges(docs: DataFrame, n_edges: int = N_EDGES) -> DataFrame:
    """(s, t) edge list: top-``n_edges`` co-occurrence pairs by weight
    (window=2), self-loops excluded, s < t, deterministic tiebreak."""
    x = cooccurrence_matrix(docs, window=2)
    return (
        x.where(F.col("wi") != F.col("wj"))
        .orderBy(F.col("x").desc(), "wi", "wj")
        .limit(n_edges)
        .select(F.col("wi").alias("s"), F.col("wj").alias("t"))
    )


@query(
    "graph_triangle_count",
    section="H3,C2,D1",
    tags=("graph",),
    oracle=_EDGE_CTE
    + """,
tri AS (
    SELECT ab.s AS a, ab.t2 AS b, bc.t2 AS c
    FROM e ab JOIN e bc ON ab.t2 = bc.s
              JOIN e ac ON ac.s = ab.s AND ac.t2 = bc.t2
)
SELECT word, count(*) AS n_triangles
FROM (SELECT a AS word FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
GROUP BY 1
""",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counts over the top-100 co-occurrence
    graph: two equi-joins over the (s < t)-oriented edge list find
    each triangle exactly once; exploding its three corners and
    aggregating gives each word's triangle membership (the local
    clustering signal — high-triangle words sit in tight collocation
    clusters)."""
    docs = table(spark, sf_dir, "documents")
    e = defer_unpersist(top_cooccurrence_edges(docs).persist())
    ab = e.select(F.col("s").alias("a"), F.col("t").alias("b"))
    bc = e.select(F.col("s").alias("b"), F.col("t").alias("c"))
    ac = e.select(F.col("s").alias("a2"), F.col("t").alias("c2"))
    tri = (
        ab.join(bc, "b")
        .join(ac, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")))
        .select("a", "b", "c")
    )
    corners = (
        tri.select(F.col("a").alias("word"))
        .unionAll(tri.select(F.col("b").alias("word")))
        .unionAll(tri.select(F.col("c").alias("word")))
    )
    return corners.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def _pagerank_oracle() -> str:
    """Unroll the 10 power iterations as chained CTEs — DuckDB can't
    aggregate inside a recursive CTE, but a FIXED iteration count
    needs no recursion, which is what makes this op oracle-checkable
    at all."""
    d, n_it = _DAMPING, _PR_ITERS
    parts = [
        _EDGE_CTE
        + """,
sym AS (SELECT s AS src, t2 AS dst FROM e
        UNION ALL SELECT t2 AS src, s AS dst FROM e),
deg AS (SELECT src AS v, count(*) AS deg FROM sym GROUP BY 1),
vertices AS (SELECT v FROM deg),
nv AS (SELECT count(*) AS n FROM vertices),
r0 AS (SELECT v, 1.0 / (SELECT n FROM nv) AS r FROM vertices)"""
    ]
    for i in range(1, n_it + 1):
        parts.append(
            f""",
r{i} AS (
    SELECT se.dst AS v,
           (1 - {d}) / (SELECT n FROM nv)
             + {d} * sum(p.r / dg.deg) AS r
    FROM sym se
    JOIN r{i - 1} p ON se.src = p.v
    JOIN deg dg ON dg.v = se.src
    GROUP BY se.dst
)"""
        )
    parts.append(
        f"""
SELECT v AS word, round(r, 6) AS rank FROM r{n_it}
"""
    )
    return "".join(parts)


@query(
    "graph_pagerank",
    section="H3,C2,D1",
    tags=("graph",),
    oracle=_pagerank_oracle(),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 10 iterations) over the symmetrized
    top-100 co-occurrence graph. Every vertex has degree >= 1 by
    construction (vertices are edge endpoints), so there is no
    dangling mass and the 10-step power iteration is a pure
    join + aggregate per round — the oracle replays the identical
    unrolled recurrence in SQL, so the declared query is fully
    hash-checked despite being an iterative algorithm."""
    docs = table(spark, sf_dir, "documents")
    e = top_cooccurrence_edges(docs)
    sym = e.select(F.col("s").alias("src"), F.col("t").alias("dst")).unionAll(
        e.select(F.col("t").alias("src"), F.col("s").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # out-edges with the sender's degree attached once, reused per round
    out = defer_unpersist(sym.join(deg, "src").persist())
    n = out.select("src").distinct().count()
    ranks = out.select("src").distinct().select(
        F.col("src").alias("v"), F.lit(1.0 / n).alias("r")
    ).localCheckpoint(eager=True)
    for _ in range(_PR_ITERS):
        ranks = (
            out.join(ranks, out["src"] == ranks["v"])
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("deg")).alias("acc"))
            .select(
                F.col("dst").alias("v"),
                ((1 - _DAMPING) / n + _DAMPING * F.col("acc")).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("v").alias("word"), F.round("r", 6).alias("rank"))


@query(
    "graph_bfs_distance",
    section="H3,C2,F3",
    tags=("graph",),
    oracle=_EDGE_CTE
    + """,
und AS (SELECT s AS u, t2 AS v FROM e UNION ALL SELECT t2, s FROM e),
root AS (SELECT min(s) AS r FROM e),
walk AS (
    WITH RECURSIVE d(word, dist) AS (
        SELECT r, 0 FROM root
        UNION
        SELECT und.v, d.dist + 1
        FROM d JOIN und ON und.u = d.word
        WHERE d.dist < 10
    )
    SELECT * FROM d
)
SELECT word, CAST(min(dist) AS BIGINT) AS dist
FROM walk GROUP BY 1
""",
)
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS hop distances over the top-100 co-occurrence
    graph (root = lexicographically smallest vertex, 10-round cap
    matching the oracle's recursion bound). The iterative frontier
    expansion is the distributed-BFS shape: per round, ONE equi-join
    of the frontier to the out-edge list, an anti join against the
    visited set, and a min-dist aggregate — state is vertex-sized,
    work is frontier-sized, and ``localCheckpoint`` per round keeps
    the plan from accreting (the same iterative-plan hygiene as
    PageRank/connected-components). Oracle: DuckDB recursive CTE —
    a rare fully-hash-checked iterative graph kernel.
    """
    docs = table(spark, sf_dir, "documents")
    e = top_cooccurrence_edges(docs)
    und = defer_unpersist(
        e.select(F.col("s").alias("u"), F.col("t").alias("v"))
        .unionAll(e.select(F.col("t").alias("u"), F.col("s").alias("v")))
        .persist()
    )
    root = e.agg(F.min("s").alias("word")).withColumn("dist", F.lit(0))
    visited = root.localCheckpoint()
    frontier = visited
    for _ in range(10):
        nxt = (
            frontier.join(und, frontier["word"] == und["u"])
            .select(F.col("v").alias("word"), (F.col("dist") + 1).alias("dist"))
            .join(visited, "word", "left_anti")
            .groupBy("word")
            .agg(F.min("dist").alias("dist"))
        )
        nxt = nxt.localCheckpoint()
        if nxt.isEmpty():
            break
        visited = visited.unionAll(nxt).localCheckpoint()
        frontier = nxt
    return visited.select("word", F.col("dist").cast("long").alias("dist"))


_LP_SEEDS = 5
_LP_ROUNDS = 2


def _lp_oracle() -> str:
    rounds = []
    for r in range(1, _LP_ROUNDS + 1):
        rounds.append(f""",
n{r} AS (
  SELECT und.u, l.label, count(*) AS c
  FROM und JOIN l{r - 1} l ON l.u = und.v
  WHERE und.u NOT IN (SELECT u FROM l{r - 1})
  GROUP BY 1, 2
),
a{r} AS (
  SELECT u, label, {r} AS round_assigned FROM (
    SELECT u, label,
           row_number() OVER (PARTITION BY u ORDER BY c DESC, label) AS rn
    FROM n{r}
  ) WHERE rn = 1
),
l{r} AS (SELECT * FROM l{r - 1} UNION ALL SELECT * FROM a{r})""")
    return (
        _EDGE_CTE
        + f""",
und AS (SELECT s AS u, t2 AS v FROM e UNION ALL SELECT t2, s FROM e),
verts AS (SELECT DISTINCT u FROM und),
seeds AS (SELECT u, u AS label FROM verts ORDER BY u LIMIT {_LP_SEEDS}),
l0 AS (SELECT u, label, 0 AS round_assigned FROM seeds)"""
        + "".join(rounds)
        + f"""
SELECT u AS word, label, CAST(round_assigned AS BIGINT) AS round_assigned
FROM l{_LP_ROUNDS}
"""
    )


@query(
    "graph_label_prop",
    section="H3,C2,E2",
    tags=("graph",),
    oracle=_lp_oracle(),
)
def graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised LABEL PROPAGATION over the co-occurrence graph
    (Zhu & Ghahramani 2002 / Raghavan et al. 2007 — public), the
    weak-labeling primitive a curation pipeline uses to spread a few
    human labels across a similarity graph: the 5 lexicographically
    smallest vertices seed their own label; each round, every still-
    unlabeled vertex adopts the MAJORITY label among its labeled
    neighbors (ties -> smallest label); 2 rounds unrolled so the
    DuckDB oracle replays the propagation exactly (the same unrolled
    treatment as PageRank's chained CTEs). Output: every labeled
    vertex with its community label and the round it was absorbed.

    Scale shape: per-round state is vertex-sized, each round is one
    edge-list equi-join plus one map-side-combined majority count —
    the canonical message-passing round, same as PageRank; rounds
    localCheckpoint (iterative-plan caveat, PLANS.md)."""
    docs = table(spark, sf_dir, "documents")
    edges = top_cooccurrence_edges(docs)
    und = defer_unpersist(
        edges.select(F.col("s").alias("u"), F.col("t").alias("v"))
        .unionByName(edges.select(F.col("t").alias("u"), F.col("s").alias("v")))
        .persist()
    )
    verts = und.select("u").distinct()
    labels = (
        verts.orderBy("u")
        .limit(_LP_SEEDS)
        .select(
            "u", F.col("u").alias("label"), F.lit(0).cast("long").alias("round_assigned")
        )
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window

    for r in range(1, _LP_ROUNDS + 1):
        neigh = (
            und.join(
                labels.select(F.col("u").alias("lv"), F.col("label")),
                F.col("v") == F.col("lv"),
            )
            .join(labels.select("u"), "u", "left_anti")
            .groupBy("u", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        wmaj = Window.partitionBy("u").orderBy(F.col("c").desc(), "label")
        newly = (
            neigh.withColumn("rn", F.row_number().over(wmaj))
            .where(F.col("rn") == 1)
            .select("u", "label", F.lit(r).cast("long").alias("round_assigned"))
        )
        labels = labels.unionByName(newly).localCheckpoint(eager=True)
    return labels.select(F.col("u").alias("word"), "label", "round_assigned")


# ---------------------------------------------------------------------------
# Round 7: link prediction + k-core decomposition on the shared edge set.


_CN_TOP = 20


@query(
    "graph_common_neighbors",
    section="H3,C2,E2",
    tags=("graph",),
    oracle=_EDGE_CTE
    + f""",
und AS (SELECT s AS u, t2 AS v FROM e UNION ALL SELECT t2, s FROM e),
deg AS (SELECT u, count(*) AS d FROM und GROUP BY 1),
cn AS (
  SELECT a.u AS u, b.u AS v, count(*) AS cn,
         sum(1.0 / ln(dw.d)) AS aa
  FROM und a
  JOIN und b ON a.v = b.v AND a.u < b.u
  JOIN deg dw ON dw.u = a.v
  GROUP BY 1, 2
),
adj AS (SELECT u, v FROM und),
nonadj AS (
  SELECT cn.* FROM cn
  LEFT JOIN adj ON adj.u = cn.u AND adj.v = cn.v
  WHERE adj.u IS NULL
),
scored AS (
  SELECT n.u, n.v, n.cn,
         round(CAST(n.cn AS DOUBLE) / (du.d + dv.d - n.cn), 6) AS jaccard,
         round(n.aa, 6) AS adamic_adar
  FROM nonadj n JOIN deg du ON du.u = n.u JOIN deg dv ON dv.u = n.v
)
SELECT u, v, CAST(cn AS BIGINT) AS cn, jaccard, adamic_adar
FROM scored
ORDER BY cn DESC, adamic_adar DESC, u, v
LIMIT {_CN_TOP}
""",
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood overlap on the top-100
    co-occurrence graph: for every NON-adjacent vertex pair with at
    least one common neighbor, the three classical scores — common-
    neighbor count, neighborhood Jaccard, Adamic–Adar (Σ 1/ln deg(w)
    over shared neighbors, down-weighting hub intermediaries) — and
    the top-20 predicted edges by (cn, adamic_adar) with a
    deterministic tiebreak. This is the similar-entity / suggested-
    connection primitive over any co-interaction graph.

    100 TB: common neighbors come from ONE self-join of the adjacency
    list on the shared endpoint (wedge enumeration — work ∝ Σ deg²,
    the triangle-count bound, with the same degree-orientation
    refinement available for hubs); the anti-join against existing
    edges and the degree joins are all vertex/edge-sized."""
    docs = table(spark, sf_dir, "documents")
    e = defer_unpersist(top_cooccurrence_edges(docs).persist())
    und = e.select(F.col("s").alias("u"), F.col("t").alias("v")).unionAll(
        e.select(F.col("t").alias("u"), F.col("s").alias("v"))
    )
    und = defer_unpersist(und.persist())
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    a = und.select(F.col("u").alias("ua"), F.col("v").alias("w"))
    b = und.select(F.col("u").alias("ub"), F.col("v").alias("w2"))
    cn = (
        a.join(b, (F.col("w") == F.col("w2")) & (F.col("ua") < F.col("ub")))
        .join(
            F.broadcast(deg.select(F.col("u").alias("w"), F.col("d").alias("dw"))),
            "w",
        )
        .groupBy(F.col("ua").alias("u"), F.col("ub").alias("v"))
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum(1.0 / F.log("dw")).alias("aa"),
        )
    )
    nonadj = cn.join(und, ["u", "v"], "left_anti")
    du = deg.select(F.col("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("u").alias("v"), F.col("d").alias("dv"))
    return (
        nonadj.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            "u",
            "v",
            F.col("cn").cast("long").alias("cn"),
            F.round(
                F.col("cn").cast("double")
                / (F.col("du") + F.col("dv") - F.col("cn")),
                6,
            ).alias("jaccard"),
            F.round("aa", 6).alias("adamic_adar"),
        )
        .orderBy(F.col("cn").desc(), F.col("adamic_adar").desc(), "u", "v")
        .limit(_CN_TOP)
    )


_KCORE_K = 3
_KCORE_ROUNDS = 8


def _kcore_oracle() -> str:
    k, rounds = _KCORE_K, _KCORE_ROUNDS
    # AS MATERIALIZED: each round references the previous TWICE (two
    # semi joins); inlined CTEs would re-evaluate the whole chain
    # 2^rounds times (observed: fd exhaustion re-opening the parquet).
    ctes = [
        "e0 AS MATERIALIZED "
        "(SELECT s AS u, t2 AS v FROM e UNION ALL SELECT t2, s FROM e)"
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""v{r} AS MATERIALIZED (
  SELECT u FROM e{p} GROUP BY u HAVING count(*) >= {k}
),
e{r} AS MATERIALIZED (
  SELECT a.u, a.v FROM e{p} a
  JOIN v{r} x ON x.u = a.u
  JOIN v{r} y ON y.u = a.v
)"""
        )
    return (
        _EDGE_CTE
        + ",\n"
        + ",\n".join(ctes)
        + f"""
SELECT u AS word, CAST(count(*) AS BIGINT) AS core_degree
FROM e{rounds} GROUP BY 1
"""
    )


@query(
    "graph_kcore",
    section="H3,C4,D1",
    tags=("graph",),
    oracle=_kcore_oracle(),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=3) of the top-100 co-occurrence graph
    by iterative peeling: repeatedly drop vertices with degree < k
    and restrict the edge set to survivors — the dense-subgraph
    extractor community detection and spam/anomaly pipelines run
    (the k-core is where the real cluster lives; the shedding tail
    is noise). The oracle unrolls a fixed 8 peeling rounds; the Spark
    side peels until the edge count STABILIZES and raises if that
    takes more than the oracle's 8 — once a round removes nothing the
    edge set is a fixpoint of the peel, so every further unrolled
    round is the identity and the two engines agree by construction.
    (r14: the fixture graph stabilizes at round 1; the previous
    always-8-rounds body spent ~6 no-op checkpoint+count rounds —
    measured ~2.5 s at sf0.1 — re-proving the fixpoint it had already
    observed.)

    100 TB: each round is one degree aggregate + two semi joins —
    vertex/edge-sized state, and peeling converges in O(log n)-ish
    rounds on real graphs, which the early-exit now exploits instead
    of paying a worst-case cap; localCheckpoint per round keeps the
    plan flat (the iterative-stats discipline)."""
    docs = table(spark, sf_dir, "documents")
    e = top_cooccurrence_edges(docs)
    und = (
        e.select(F.col("s").alias("u"), F.col("t").alias("v"))
        .unionAll(e.select(F.col("t").alias("u"), F.col("s").alias("v")))
        .localCheckpoint(eager=True)
    )
    prev_edges = und.count()
    stable = False
    for r in range(_KCORE_ROUNDS):
        surv = (
            und.groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= _KCORE_K)
            .select("u")
        )
        und = (
            und.join(surv, "u", "left_semi")
            .join(surv.select(F.col("u").alias("v")), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        n = und.count()
        if n == prev_edges:  # fixpoint observed — rounds r+1..8 are
            stable = True  # the identity on both engines
            break
        prev_edges = n
    if not stable:
        raise AssertionError(
            f"k-core did not reach fixpoint in {_KCORE_ROUNDS} rounds"
        )
    return und.groupBy(F.col("u").alias("word")).agg(
        F.count(F.lit(1)).alias("core_degree")
    )
