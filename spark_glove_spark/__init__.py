"""spark_glove_spark — a PySpark-native analytics engine.

A from-scratch, DataFrame-first engine with the query and
data-processing capabilities of the reference ``dmarcous/spark-glove``
(distributed GloVe word-embedding training on big corpora), extended
with the LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) required for 100 TB-scale training
data pipelines.

Design stance (see SURVEY.md §7):
  * DataFrame/SQL only — no RDDs; Catalyst sees every plan.
  * Built-in expressions over UDFs; Arrow-batched pandas kernels only
    where the math demands numpy (GloVe AdaGrad step, MinHash/LSH).
  * Explicit schemas everywhere; no runtime inference.
  * Every operator is a function ``(SparkSession, sf_dir) -> DataFrame``
    registered with its DuckDB oracle SQL beside it (registry.py).

The reference checkout at /root/reference is empty this session
(SURVEY.md §0) — behavior parity is established against the public
GloVe paper (Pennington, Socher & Manning, EMNLP 2014) and the driver's
DuckDB oracle harness, not against reference source lines.
"""

__version__ = "0.1.0"
