"""Vector-serving walkthrough: the retrieval stack chained the way a
feature-store deployment runs it —

    land vectors over the Avro wire (arrays of float, the Kafka hop) →
    build a binary-quantization code table as a versioned txlog
    artifact → serve Hamming-shortlist + rerank searches from a
    pinned snapshot → grow the HNSW graph tier with epoch-batched
    search-then-connect inserts → audit recall against exact truth

    python examples/vector_serving.py [sf_dir]

Defaults to /root/testdata/sf0.01. Every stage below is a registered,
driver-verified query; this file just shows them composed as one
deployment story.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from spark_glove_spark.operators.avro_queries import (  # noqa: E402
    _register_avro,
    write_avro,
)
from spark_glove_spark.session import get_spark  # noqa: E402
from spark_glove_spark.sources import table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("vector_serving")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. Vectors arrive over the wire: Avro containers carrying
    #    array<float> embeddings (one container per producer
    #    partition — the Kafka-connect sink shape), landed straight
    #    back into a columnar frame.
    e = table(spark, sf_dir, "embeddings")
    drop_dir = tempfile.mkdtemp(prefix="vector_drop_")
    try:
        write_avro(e.repartition(4), drop_dir, codec="deflate")
        _register_avro(spark)
        landed = (
            spark.read.format("sgs_avro").option("path", drop_dir).load()
        )
        n = landed.count()
        dim = landed.select(F.size("embedding").alias("d")).agg(
            F.max("d")
        ).collect()[0][0]
        print(f"landed {n} vectors of dim {dim} over the Avro wire")

        # 2. Exact search tier (the ground truth every ANN tier is
        #    audited against): brute-force cosine top-k as a query.
        from spark_glove_spark.operators.embeddings import h15_knn_bruteforce

        exact = h15_knn_bruteforce(spark, sf_dir)
        print("exact tier sample:")
        exact.show(5, truncate=False)

        # 3. Binary-quantization serving tier: 8-byte sign codes in a
        #    versioned txlog table, Hamming shortlist + rerank served
        #    from a PINNED snapshot (the persisted lane prints its own
        #    version/staleness audit rows).
        from spark_glove_spark.operators.ann import (
            h16_bq_persisted,
            h16_hnsw_incremental,
        )

        print("BQ persisted serving audit (version, rows, equality):")
        h16_bq_persisted(spark, sf_dir).show(truncate=False)

        # 4. Graph tier growth WITHOUT a rebuild: new vectors arrive
        #    in epochs, beam-search the current graph for neighbors,
        #    and append one txlog version per epoch. The audit rows
        #    show each version's watermark, edges added, and the
        #    served recall vs exact truth at both ends.
        print("incremental HNSW insert audit:")
        h16_hnsw_incremental(spark, sf_dir).show(truncate=False)
    finally:
        shutil.rmtree(drop_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
