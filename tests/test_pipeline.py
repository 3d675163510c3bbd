"""Curation-funnel teeth: the oracle already hash-checks the composed
funnel; these exercise the stage the fixture can't (exact dedup — the
corpus has 0 exact dups by design) and pin the funnel's accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_glove_spark import api
from spark_glove_spark.sources import table

SF = "/root/testdata/sf0.001"


def test_funnel_accounting_totals(spark):
    d = table(spark, SF, "documents")
    n_input = d.count()
    out = api.REGISTRY["pipeline_curate_corpus"].fn(spark, SF).collect()
    assert sum(r.n_docs for r in out) == n_input  # every doc lands once
    assert {r.status for r in out} <= {
        "quality_fail", "exact_dup", "near_dup", "kept"
    }
    kept = [r for r in out if r.status == "kept"]
    assert kept and all(r.kept_tokens > 0 for r in kept)
    assert all(
        r.kept_tokens == 0 for r in out if r.status != "kept"
    )


def test_funnel_injected_exact_dup_is_caught(spark):
    """An exact copy of a quality-passing doc must land in exact_dup
    (the fixture has no exact dups, so this stage needs injection)."""
    from spark_glove_spark.operators.pipeline import pipeline_curate_corpus

    d = table(spark, SF, "documents")
    # find one doc that passes the quality gate (20-80 tokens)
    base = (
        d.where(
            (F.size(F.split("text", " ")).between(20, 80))
        )
        .select("doc_id", "text", "lang", "source", "n_chars")
        .limit(1)
        .collect()[0]
    )
    extra = spark.createDataFrame(
        [(999999, base.text, base.lang, base.source, base.n_chars)],
        d.schema,
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        aug_dir = f"{tmp}"
        d.unionByName(extra).write.mode("overwrite").parquet(
            f"{aug_dir}/documents.parquet"
        )
        out = {
            (r.lang, r.status): r.n_docs
            for r in pipeline_curate_corpus(spark, aug_dir).collect()
        }
    assert out.get((base.lang, "exact_dup"), 0) >= 1
