"""Training-data curation walkthrough: the LLM-pipeline operators
chained the way a real corpus pass uses them —

    near-dup clustering (keep one canonical per cluster) →
    PII scrub → quality filter → language profile →
    deterministic train/val split → stratified eval sample →
    sequence packing

    python examples/curate_corpus.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from spark_glove_spark.operators.dedup import minhash_neardups  # noqa: E402
from spark_glove_spark.operators.graph import connected_components  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402
from spark_glove_spark.sources import table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("curate")
    spark.sparkContext.setLogLevel("ERROR")
    docs = table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. Near-dup removal, done right: cluster the duplicate-pair
    #    graph (transitive closure) and keep ONE canonical doc per
    #    cluster. Dropping "doc_b of every pair" over-deletes on
    #    chains — A~B, B~C kills both B and C even though C's only
    #    duplicate (B) is already gone.
    edges = minhash_neardups(docs, threshold=0.8).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    comp = connected_components(
        edges, docs.select(F.col("doc_id").alias("id"))
    )
    keep = comp.where(F.col("id") == F.col("comp")).select(
        F.col("id").alias("doc_id")
    )
    docs = docs.join(keep, "doc_id", "left_semi")
    n1 = docs.count()

    # 1b. PII scrub: mask emails/phone patterns before anything else
    #     sees the text (map-only, no shuffle).
    email_re = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+"
    phone_re = r"\b555-[0-9][0-9][0-9][0-9]\b"
    docs = docs.withColumn(
        "text",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), email_re, "<EMAIL>"),
            phone_re,
            "<PHONE>",
        ),
    )

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

    # 6. Sequence packing: assign the surviving train docs to fixed
    #    256-token packs (per-bucket running sum — no global window).
    from pyspark.sql import Window as W

    train = docs.where(F.col("split") == "train").select(
        "doc_id",
        (F.col("doc_id") % 8).cast("int").alias("bucket"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    wp = (
        W.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packs = train.withColumn("cum", F.sum("n_tokens").over(wp)).select(
        (
            F.col("bucket") * 1000000
            + F.floor((F.col("cum") - F.col("n_tokens")) / 256)
        ).alias("pack_id")
    )
    n_packs = packs.distinct().count()

    print(f"documents: {n0} -> {n1} after cluster-dedup -> {n2} after quality filter")
    print("\nlanguage profile:")
    profile.orderBy("lang").show()
    print("split sizes:")
    split_counts.show()
    print(f"stratified eval set: {eval_set.count()} docs")
    print(f"train packs (256-token budget): {n_packs}")


if __name__ == "__main__":
    main()
