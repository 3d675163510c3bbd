"""connected_components: planted graphs with known components.

The oracle-checked query (h13_dedup_clusters) proves the embedding
edge case end-to-end; these tests pin the operator itself on graph
shapes the fixture doesn't contain — long chains (multi-round
convergence), isolated vertices, and multi-component mixes.
"""

from __future__ import annotations

from spark_glove_spark.operators.graph import connected_components


def _components(spark, edges, vertices):
    e = spark.createDataFrame(edges or [(None, None)], "u long, v long")
    if not edges:
        e = e.where("u IS NOT NULL")
    v = spark.createDataFrame([(x,) for x in vertices], "id long")
    out = connected_components(e, v).collect()
    return {r["id"]: r["comp"] for r in out}


def test_chain_triangle_singleton(spark):
    # chain 1-2-3-4-5 (diameter 4: needs >1 propagation round),
    # triangle 10-11-12, singleton 20
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12)]
    comp = _components(spark, edges, [1, 2, 3, 4, 5, 10, 11, 12, 20])
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20}


def test_edge_orientation_irrelevant(spark):
    # same component regardless of (u,v) orientation mix
    comp = _components(spark, [(5, 3), (3, 9), (9, 1)], [1, 3, 5, 9])
    assert set(comp.values()) == {1}


def test_no_edges_all_singletons(spark):
    comp = _components(spark, [], [7, 8, 9])
    assert comp == {7: 7, 8: 8, 9: 9}


def test_two_chains_merge_through_bridge(spark):
    # two chains joined by one bridge edge -> single component under min id
    edges = [(1, 2), (2, 3), (30, 31), (31, 32), (3, 30)]
    comp = _components(spark, edges, [1, 2, 3, 30, 31, 32])
    assert set(comp.values()) == {1}
    assert comp[32] == 1


def test_minhash_clusters_match_bruteforce_ground_truth(spark):
    """End-to-end pipeline tooth: the MinHash→verify→CC clusters must
    equal the components of the brute-force exact-Jaccard graph (all
    O(n²) pairs, shingle k=3, threshold 0.5) on the fixture corpus —
    i.e. LSH recall on the planted near-dups is total, and clustering
    is exact."""
    from spark_glove_spark.operators.graph import h13_minhash_clusters

    sf = "/root/testdata/sf0.001"
    rows = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    ).collect()

    def sh(text):
        t = text.split(" ")
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    sets = {r["doc_id"]: sh(r["text"]) for r in rows}
    ids = sorted(sets)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i_pos, a in enumerate(ids):
        for b in ids[i_pos + 1 :]:
            sa, sb = sets[a], sets[b]
            inter = len(sa & sb)
            if inter and inter / (len(sa) + len(sb) - inter) >= 0.5:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in ids}

    got = {
        r["doc_id"]: r["component_id"]
        for r in h13_minhash_clusters(spark, sf).collect()
    }
    assert got == expected
    n_clusters = len({c for c in expected.values()})
    assert n_clusters < len(ids)  # fixture plants real near-dups


def test_star_contraction_matches_hashmin_on_planted_shapes(spark):
    from spark_glove_spark.operators.graph import connected_components_star

    cases = [
        ([(1, 2), (2, 3), (3, 4), (4, 5)], [1, 2, 3, 4, 5, 9]),  # chain + isolate
        ([(10, 11), (11, 12), (10, 12)], [10, 11, 12]),  # triangle
        ([(1, 2), (2, 3), (30, 31), (31, 32), (3, 30)], [1, 2, 3, 30, 31, 32]),
        ([], [5, 6]),
    ]
    for edges, verts in cases:
        e = spark.createDataFrame(edges or [(None, None)], "u long, v long")
        if not edges:
            e = e.where("u IS NOT NULL")
        v = spark.createDataFrame([(x,) for x in verts], "id long")
        got = {
            r["id"]: r["comp"] for r in connected_components_star(e, v).collect()
        }
        expected = _components(spark, edges, verts)
        assert got == expected, (edges, got, expected)


def test_star_contraction_matches_hashmin_on_random_graphs(spark):
    """Seeded random graphs: both algorithms must produce identical
    component labelings (min id per component)."""
    import random

    from spark_glove_spark.operators.graph import connected_components_star

    rng = random.Random(42)
    for trial in range(5):
        n = 30
        verts = list(range(n))
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(5, 40))
        ]
        edges = [(u, v) for u, v in edges if u != v]
        e = spark.createDataFrame(edges or [(0, 1)], "u long, v long")
        if not edges:
            edges = [(0, 1)]
        v = spark.createDataFrame([(x,) for x in verts], "id long")
        a = {r["id"]: r["comp"] for r in connected_components_star(e, v).collect()}
        b = _components(spark, edges, verts)
        assert a == b, (trial, edges)


def test_nonconvergence_warns_and_falls_back_to_star(spark):
    """ADVICE r2: a graph whose diameter exceeds max_iter must NOT
    silently return wrong labels — hash-min escalates to star
    contraction (diameter-independent) with a RuntimeWarning, and the
    final labels are still exactly right."""
    import warnings

    chain = [(i, i + 1) for i in range(1, 12)]  # diameter 11 > max_iter 3
    e = spark.createDataFrame(chain, "u long, v long")
    v = spark.createDataFrame([(x,) for x in range(1, 13)], "id long")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        comp = {
            r["id"]: r["comp"]
            for r in connected_components(e, v, max_iter=3).collect()
        }
    assert any(
        issubclass(w.category, RuntimeWarning) and "fixpoint" in str(w.message)
        for w in caught
    )
    assert comp == {i: 1 for i in range(1, 13)}
