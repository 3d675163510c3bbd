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


def test_language_id_identifies_planted_languages(spark):
    """H17 language-ID on genuinely mixed-language input (VERDICT r1
    item 6): one document per language built from that language's real
    function words (plus distinctive filler absent from every profile);
    the heuristic must recover each label. The parquet fixture can't
    test this — it is English word salad under every lang label."""
    from pyspark.sql import functions as F

    from spark_glove_spark.functions.text import tokenize
    from spark_glove_spark.operators.text_analysis import predict_language

    planted = spark.createDataFrame(
        [
            ("en", "the cat sat on a mat the dog and a bird"),
            ("fr", "le chat et la souris et le chien bonjour"),
            ("es", "el gato y la casa y el perro hola"),
            ("de", "der hund und die katze und der vogel hallo"),
            ("zh", "wo de mao shi hao de gou le ma"),
        ],
        "lang string, text string",
    )
    got = {
        r["lang"]: r["pred"]
        for r in planted.select(
            "lang", predict_language(tokenize(F.col("text"))).alias("pred")
        ).collect()
    }
    assert got == {lang: lang for lang in got}, f"misidentified: {got}"


def test_unicode_tokenize_handles_punctuation_and_unicode(spark, qs):
    """H1 on non-space text (VERDICT r3 item 4): the regex tokenizer
    must split on punctuation, keep accented/cyrillic/CJK letter runs
    whole, and case-fold unicode for the distinct count."""
    df = qs["h1_unicode_tokenize"](spark, SF_DIR)
    rows = {r["doc_id"]: r for r in df.limit(2000).collect()}
    assert rows, "no output"
    for r in rows.values():
        # Every doc gains the 'Héllo'/'№<id>' prefix tokens: the first
        # token is the accented word (№ is a symbol, not a letter).
        assert r["first_tok"] == "Héllo"
        assert r["n_tokens"] >= 3
        assert 1 <= r["n_unique_lower"] <= r["n_tokens"]
    # doc_id % 3 picks the suffix: cyrillic, latin-question, CJK.
    by_mod = {m: None for m in (0, 1, 2)}
    for did, r in rows.items():
        by_mod.setdefault(did % 3, r)
        if by_mod[did % 3] is None:
            by_mod[did % 3] = r
    assert by_mod[0]["last_tok"] == "конец"
    assert by_mod[1]["last_tok"] == "ok"
    # The fullwidth comma splits the CJK suffix; 世界 is the last run.
    assert by_mod[2]["last_tok"] == "世界"
