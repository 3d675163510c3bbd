"""End-to-end walkthrough: train GloVe, query the model, run the
LLM-data-pipeline operators — the reference user's full workflow.

    python examples/train_and_query.py [sf_dir]

Defaults to /root/testdata/sf0.01. Everything shown here is the public
API a reference (dmarcous/spark-glove-style) user would migrate to.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_glove_spark import api  # noqa: E402
from spark_glove_spark.glove import Glove, GloveModel  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402
from spark_glove_spark.sources import table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = table(spark, sf_dir, "documents")

    # --- 1. Train (reference estimator shape) -------------------------
    model = Glove(dim=50, window=10, min_count=5, iterations=15, seed=42).fit(docs)
    print(f"loss: {model.losses[0]:.1f} -> {model.losses[-1]:.1f}")

    # --- 2. Query the model -------------------------------------------
    print("\nsynonyms of 'spark':")
    model.find_synonyms("spark", 5).show(truncate=False)
    print("analogy spark - query + table:")
    model.analogy("spark", "query", "table", k=3).show(truncate=False)

    # --- 3. Document embeddings + persistence -------------------------
    doc_vecs = model.transform(docs)
    print(f"document vectors: {doc_vecs.count()} rows")
    model.save("/tmp/glove_model_example")
    reloaded = GloveModel.load(spark, "/tmp/glove_model_example")
    assert reloaded.vectors.count() == model.vectors.count()

    # --- 4. The wider engine: any declared query ----------------------
    qs = api.queries()
    print("\nnear-duplicate pairs (MinHash, J>=0.5):")
    qs["h13_minhash_neardup"](spark, sf_dir).show(5, truncate=False)
    print("ANN neighbors (IVF):")
    qs["h16_ivf_ann"](spark, sf_dir).show(5, truncate=False)
    print(f"\n{len(qs)} declared queries; oracle-checked: {len(api.oracle_sql())}")


if __name__ == "__main__":
    main()
