"""Graph-analytics teeth: independent Python replicas of triangle
counting and PageRank over the same top-100 co-occurrence edge set
(the DuckDB oracles already hash-check these; this pins the semantics
against refactors without an oracle run)."""

from __future__ import annotations

from collections import defaultdict

from spark_glove_spark import api
from spark_glove_spark.operators.graph_analytics import (
    _DAMPING,
    _PR_ITERS,
    top_cooccurrence_edges,
)
from spark_glove_spark.sources import table

SF = "/root/testdata/sf0.001"


def _edges(spark):
    docs = table(spark, SF, "documents")
    return [(r.s, r.t) for r in top_cooccurrence_edges(docs).collect()]


def test_triangle_count_matches_replica(spark):
    edges = set(_edges(spark))
    nbrs = defaultdict(set)
    for s, t in edges:
        nbrs[s].add(t)  # oriented s < t: each triangle counted once
    tri_per_vertex: defaultdict = defaultdict(int)
    n_tri = 0
    for a, b in edges:
        for c in nbrs[b]:
            if (a, c) in edges:
                n_tri += 1
                for v in (a, b, c):
                    tri_per_vertex[v] += 1
    got = {
        r.word: r.n_triangles
        for r in api.REGISTRY["graph_triangle_count"].fn(spark, SF).collect()
    }
    assert got == dict(tri_per_vertex)
    assert sum(got.values()) == 3 * n_tri


def test_pagerank_matches_replica_and_conserves_mass(spark):
    edges = _edges(spark)
    sym = edges + [(t, s) for s, t in edges]
    deg = defaultdict(int)
    for s, _ in sym:
        deg[s] += 1
    vs = sorted(deg)
    n = len(vs)
    r = {v: 1.0 / n for v in vs}
    for _ in range(_PR_ITERS):
        acc = defaultdict(float)
        for s, t in sym:
            acc[t] += r[s] / deg[s]
        r = {v: (1 - _DAMPING) / n + _DAMPING * acc[v] for v in vs}
    got = {
        row.word: row.rank
        for row in api.REGISTRY["graph_pagerank"].fn(spark, SF).collect()
    }
    assert set(got) == set(vs)
    for v in vs:
        assert abs(got[v] - r[v]) < 1e-5, (v, got[v], r[v])
    assert abs(sum(got.values()) - 1.0) < 1e-4  # no dangling mass
