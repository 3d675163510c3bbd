"""Training-data curation walkthrough: the LLM-pipeline operators
chained the way a real corpus pass uses them —

    near-dup removal → quality filter → language profile →
    deterministic train/val split → stratified eval sample

    python examples/curate_corpus.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from spark_glove_spark.operators.dedup import minhash_neardups  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402
from spark_glove_spark.sources import table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("curate")
    spark.sparkContext.setLogLevel("ERROR")
    docs = table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. Near-dup removal: keep the lower doc_id of each duplicate pair.
    dup_pairs = minhash_neardups(docs, threshold=0.8)
    losers = dup_pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    docs = docs.join(losers, "doc_id", "left_anti")
    n1 = docs.count()

    # 2. Quality filter: drop very short documents.
    docs = docs.where(F.col("n_chars") >= 50)
    n2 = docs.count()

    # 3. Language profile of what survived.
    profile = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("n_chars"), 1).alias("avg_chars"),
    )

    # 4. Content-addressed split (reproducible across runs/engines).
    nibble = F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 1)
    docs = docs.withColumn(
        "split", F.when(nibble.isin("0", "1"), "val").otherwise("train")
    )
    split_counts = docs.groupBy("split").count()

    # 5. Stratified eval sample: exactly 5 docs per language from 'val'.
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.sha2(F.col("doc_id").cast("string"), 256), "doc_id"
    )
    eval_set = (
        docs.where(F.col("split") == "val")
        .select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )

    print(f"documents: {n0} -> {n1} after dedup -> {n2} after quality filter")
    print("\nlanguage profile:")
    profile.orderBy("lang").show()
    print("split sizes:")
    split_counts.show()
    print(f"stratified eval set: {eval_set.count()} docs")


if __name__ == "__main__":
    main()
