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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_glove_spark.functions.vector import dot
from spark_glove_spark.registry import query
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
                F.array(*[F.lit(float(v)) for v in c]).alias("cv"),
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
                F.array(*[F.lit(float(v)) for v in c]).alias("cv"),
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
