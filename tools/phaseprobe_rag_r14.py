"""Phase probe for pipeline_rag_serving (r14 optimization round).

Times the capstone's internal stages by draining each intermediate to
the noop sink in dependency order (persisted frames materialize once,
exactly as the product path's defer_unpersist persists do), so the
optimization targets the real cost distribution.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from spark_glove_spark.operators import pipeline as P  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402
from spark_glove_spark.sources import parallelized, table  # noqa: E402


def drain(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("phaseprobe_rag")
    spark.sparkContext.setLogLevel("ERROR")
    table(spark, sf_dir, "region").count()

    for rep in range(2):
        laps = []
        t = time.time()

        def lap(name):
            nonlocal t
            now = time.time()
            laps.append((name, round(now - t, 3)))
            t = now

        d = parallelized(table(spark, sf_dir, "documents"))
        segch = P._rag_segch(d).persist()
        segch.count()
        lap("segch_persist")
        chunks = P._rag_chunk_frame(segch).persist()
        chunks.count()
        lap("chunks_persist")
        qvecs = spark.createDataFrame(
            [
                (i, P._rag_qvec(tt), P._rag_code(P._rag_qvec(tt)))
                for i, tt in P._RAG_QUERIES
            ],
            "query_id long, qv array<long>, qcode long",
        )
        zero = F.lit(0).cast("long")
        num = F.aggregate(
            F.zip_with("qv", "cv", lambda x, y: x * y), zero, lambda a, x: a + x
        )
        from pyspark.sql import Window

        wq_num = Window.partitionBy("query_id").orderBy(
            F.col("num").desc(), "cid"
        )
        truth = (
            chunks.crossJoin(F.broadcast(qvecs.select("query_id", "qv")))
            .select("query_id", "cid", num.alias("num"))
            .withColumn("trn", F.row_number().over(wq_num))
            .where(F.col("trn") <= P._RAG_K)
            .select("query_id", F.col("cid").alias("tcid"))
        )
        drain(truth)
        lap("truth_scan")
        codes = chunks.select("cid", P._rag_code_col().alias("code"))
        hamming = F.bit_count(F.col("code").bitwiseXOR(F.col("qcode")))
        wq_ham = Window.partitionBy("query_id").orderBy("hamming", "cid")
        short = (
            codes.crossJoin(F.broadcast(qvecs.select("query_id", "qcode")))
            .select("query_id", "cid", hamming.alias("hamming"))
            .withColumn("hrn", F.row_number().over(wq_ham))
            .where(F.col("hrn") <= P._RAG_SHORT)
            .select("query_id", "cid")
        )
        sys_list = (
            chunks.join(F.broadcast(short), "cid")
            .join(F.broadcast(qvecs.select("query_id", "qv")), "query_id")
            .select("query_id", "cid", num.alias("num"))
            .withColumn("srn", F.row_number().over(wq_num))
            .where(F.col("srn") <= P._RAG_K)
            .select("query_id", "cid", "srn")
            .persist()
        )
        sys_list.count()
        lap("bq_shortlist_rerank")
        ctoks = segch.select("cid", F.explode("words").alias("word"))
        tf = (
            ctoks.groupBy("cid", "word")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
            .persist()
        )
        tf.count()
        lap("tf_persist")
        dl = tf.groupBy("cid").agg(F.sum("tf").cast("long").alias("dl"))
        dfreq = tf.groupBy("word").agg(
            F.count(F.lit(1)).cast("long").alias("df")
        )
        stats = dl.agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.avg("dl").alias("avgdl"),
        )
        qterms = spark.createDataFrame(
            [(i, w) for i, tt in P._RAG_QUERIES for w in tt.split(" ")],
            "query_id long, word string",
        )
        score = (
            F.log(
                1.0
                + (F.col("n_chunks") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * F.col("tf")
            * 2.2
            / (
                F.col("tf")
                + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
            )
        )
        bm = (
            tf.join(F.broadcast(qterms), "word")
            .join(F.broadcast(dfreq), "word")
            .join(dl, "cid")
            .crossJoin(F.broadcast(stats))
            .groupBy("query_id", "cid")
            .agg(F.round(F.sum(score), 6).alias("bm25"))
        )
        drain(bm)
        lap("bm25")
        for df in (segch, chunks, sys_list, tf):
            df.unpersist()
        print(f"rep{rep}: " + " ".join(f"{n}={s}s" for n, s in laps))
    spark.stop()


if __name__ == "__main__":
    main()
