"""Teeth for the distributed k-means (rows-only to the driver).

Strategy mirrors tests/test_glove_reference.py: a pure-numpy replica
of the exact same seeded algorithm (same init rows, same argmin
tie-handling, same empty-cluster re-seed) must reproduce the
distributed implementation's centroids bit-for-bit (1e-9), and the
fit must recover the fixture's latent label structure.
"""

from __future__ import annotations

import numpy as np
import pytest

from spark_glove_spark.operators.clustering import kmeans_fit, _seed_centers
from spark_glove_spark.sources import table

SF = "/root/testdata/sf0.001"


def _numpy_kmeans(X, init, k, max_iter, tol, reseed):
    centers = init.copy()
    for it in range(1, max_iter + 1):
        # same ranking as the Spark expression: (cnorm − 2x·c, cid) asc
        d = (centers * centers).sum(axis=1)[None, :] - 2.0 * X @ centers.T
        assign = d.argmin(axis=1)  # ties → lowest cid, same as sort_array
        new = centers.copy()
        seen = set()
        for cid in range(k):
            members = X[assign == cid]
            if len(members):
                new[cid] = members.mean(axis=0)
                seen.add(cid)
        for cid in range(k):
            if cid not in seen:
                new[cid] = reseed(cid)
        moved = float(((new - centers) ** 2).sum(axis=1).max())
        centers = new
        if moved < tol:
            break
    return centers, it


@pytest.fixture(scope="module")
def fixture_vectors(spark):
    e = table(spark, SF, "embeddings")
    rows = e.select("vec_id", "embedding", "label").orderBy("vec_id").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    labels = np.array([r["label"] for r in rows])
    return e, X, labels


def test_distributed_kmeans_matches_numpy_replica(spark, fixture_vectors):
    e, X, _ = fixture_vectors
    k, seed, tol = 10, 42, 1e-6
    centers, n_iter = kmeans_fit(e, k=k, max_iter=20, seed=seed, tol=tol)
    init = _seed_centers(e, k, seed, "vec_id", "embedding")

    def reseed(cid):
        return _seed_centers(
            e, k + cid + 1, seed + cid + 1, "vec_id", "embedding"
        )[-1]

    np_centers, np_iter = _numpy_kmeans(X, init, k, 20, tol, reseed)
    assert n_iter == np_iter
    assert np.abs(centers - np_centers).max() < 1e-9


def test_kmeans_inertia_improves_over_init(spark, fixture_vectors):
    """Lloyd monotonicity on the real fixture: the fitted centroids'
    inertia must be well below the seeded-init centroids' inertia.
    (Label purity is NOT asserted — measured 0.17: the fixture labels
    are cosine-neighborhood structure, not euclidean-separable blobs,
    so purity would test the data, not the algorithm.)"""
    e, X, _ = fixture_vectors

    def inertia(C):
        d = (
            (X * X).sum(axis=1)[:, None]
            - 2.0 * X @ C.T
            + (C * C).sum(axis=1)[None, :]
        )
        return float(d.min(axis=1).sum())

    init = _seed_centers(e, 10, 42, "vec_id", "embedding")
    centers, _ = kmeans_fit(e, k=10, max_iter=20, seed=42)
    assert inertia(centers) < 0.9 * inertia(init)


def test_kmeans_recovers_planted_clusters(spark):
    """On genuinely separated blobs the fit must be exact: 3 planted
    clusters at mutual distance ≫ intra-cluster spread, purity 1.0
    regardless of init."""
    rng = np.random.RandomState(7)
    blobs, labels = [], []
    for c, center in enumerate([(10.0, 0.0), (0.0, 10.0), (-10.0, -10.0)]):
        pts = rng.randn(30, 2) * 0.3 + np.array(center)
        blobs.append(pts)
        labels += [c] * 30
    X = np.vstack(blobs)
    df = spark.createDataFrame(
        [(i, [float(a), float(b)]) for i, (a, b) in enumerate(X)],
        "vec_id long, embedding array<float>",
    )
    centers, _ = kmeans_fit(df, k=3, max_iter=20, seed=1)
    d = (centers * centers).sum(axis=1)[None, :] - 2.0 * X @ centers.T
    assign = d.argmin(axis=1)
    labels = np.array(labels)
    purity = sum(
        np.unique(labels[assign == c], return_counts=True)[1].max()
        for c in set(assign)
    ) / len(X)
    assert purity == 1.0


def test_declared_query_shape(spark):
    from spark_glove_spark import api

    rows = api.queries()["ml_kmeans"](spark, SF).collect()
    assert len(rows) == 10
    assert sum(r["size"] for r in rows) == 500
    for r in rows:
        assert r["mean_sqdist"] >= 0


def test_pca_projection_matches_numpy_replica(spark):
    """ml_pca_project must equal an independent numpy PCA of the same
    corpus (same sign convention), and the fitted components must be
    orthonormal with non-increasing explained variance."""
    import numpy as np

    from spark_glove_spark import api
    from spark_glove_spark.operators.clustering import pca_components

    sf = "/root/testdata/sf0.001"
    emb = np.stack(
        [
            r["embedding"]
            for r in spark.read.parquet(f"{sf}/embeddings.parquet")
            .orderBy("vec_id")
            .collect()
        ]
    ).astype(np.float64)
    mean, comps, vals = pca_components(spark, sf)
    # orthonormal, variance-ordered
    assert np.allclose(comps @ comps.T, np.eye(len(comps)), atol=1e-9)
    assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(len(vals) - 1))
    # independent replica
    c = emb - emb.mean(axis=0)
    cov = (c.T @ c) / len(emb)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][: len(comps)]
    ref = v[:, order].T
    for r in range(ref.shape[0]):
        m = np.argmax(np.abs(ref[r]))
        if ref[r][m] < 0:
            ref[r] = -ref[r]
    assert np.allclose(comps, ref, atol=1e-6)
    # declared projection equals the replica's
    got = {
        r["vec_id"]: np.array([r[f"pc{i}"] for i in range(len(comps))])
        for r in api.REGISTRY["ml_pca_project"].fn(spark, sf).collect()
    }
    ids = sorted(got)
    proj_ref = np.round(c @ ref.T, 6)
    for idx, vid in enumerate(ids):
        assert np.allclose(got[vid], proj_ref[idx], atol=2e-6), vid
