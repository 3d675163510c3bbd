"""Property checks for declared queries whose driver check is rows-only.

The DuckDB-oracle gate (tools/paritycheck.py) covers exact-SQL queries;
these tests give teeth to the sketch-based ones (SURVEY.md §5.3).
"""

from __future__ import annotations

import pytest

from spark_glove_spark import api

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return api.queries()


def test_approx_count_distinct_within_5pct(spark, qs):
    """D4: HLL++ at rsd=0.02 must land within ±5% of the exact distinct
    count per group (the docstring's contract)."""
    approx = {
        r["event_type"]: r["approx_users"]
        for r in qs["d4_approx_count_distinct"](spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in qs["d3_count_distinct"](spark, SF_DIR).collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(1, 0.05 * n), (
            f"{et}: approx {approx[et]} vs exact {n}"
        )


def test_simhash_fingerprints_deterministic(spark, qs):
    """H13 SimHash: same input → identical fingerprints across runs
    (plan-seeded, no RNG at execution time)."""
    a = {r["doc_id"]: r["simhash"] for r in qs["h13_simhash_fingerprints"](spark, SF_DIR).collect()}
    b = {r["doc_id"]: r["simhash"] for r in qs["h13_simhash_fingerprints"](spark, SF_DIR).collect()}
    assert a == b
    assert len(a) > 0


def test_lsh_ann_neighbors_are_real_vectors(spark, qs):
    """H16: every returned neighbor must exist in the corpus and carry a
    cosine score in [-1, 1]."""
    rows = qs["h16_lsh_ann"](spark, SF_DIR).collect()
    assert rows, "LSH ANN returned no neighbors at sf0.001"
    for r in rows:
        assert -1.0001 <= r["cos"] <= 1.0001
