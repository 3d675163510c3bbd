"""Distributed BPE tokenizer training (north-star text-analysis
extension: learning the subword vocabulary IS a training-data-pipeline
job — the tokenizer is fit on the same corpus the engine curates).

Algorithm: classic byte-pair encoding over the word-frequency table
(Sennrich, Haddow & Birch, ACL 2016 — public): start from characters,
repeatedly merge the highest-weighted adjacent symbol pair, ties
broken lexicographically so the merge sequence is deterministic.

Scale split (same discipline as ml_kmeans / the GloVe trainer):

* The corpus collapses to the **word-frequency table once** — BPE
  statistics are invariant to where words occur, so the iterative part
  never rescans the corpus. At 100 TB the word table is million-row,
  not petabyte-row.
* Each merge round is one expression-only pair explode + one map-side-
  combined groupBy emitting pair weights, then a global top-1
  (TakeOrderedAndProject, no full sort); only ONE row crosses to the
  driver per round.
* The merge application is a higher-order ``aggregate`` fold over each
  word's symbol array — pure codegen, no Python, no join.
* ``localCheckpoint`` per round keeps the iterative plan bounded
  (PLANS.md "Known scale caveats": iterative plans must materialize
  per-iteration stats or Catalyst's stats product explodes).

Rows-only to the driver (an iterative fit has no SQL twin); teeth in
tests/test_bpe.py: the full merge sequence is pinned to a pure-Python
replica of the same greedy fold, plus planted-corpus and determinism
checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_glove_spark.functions.text import tokenize
from spark_glove_spark.registry import query
from spark_glove_spark.sources import parallelized, table

_EMPTY = "cast(array() as array<string>)"


def merge_pair_expr(col: Column, left: str, right: str, merged: str) -> Column:
    """Greedy left-to-right application of one merge rule to a symbol
    array, as a single codegen'd fold: scan symbols, and whenever the
    accumulator's tail is ``left`` and the current symbol is ``right``,
    replace the tail with ``merged`` (so ``a a a`` under (a,a) becomes
    ``aa a`` — the standard non-overlapping greedy semantics)."""
    return F.aggregate(
        col,
        F.expr(_EMPTY),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    words: DataFrame, n_merges: int = 10
) -> list[tuple[int, str, str, str, int]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) DataFrame.

    Returns [(rank, left, right, merged, weighted_count), ...] in
    merge order. Deterministic: the winning pair per round is
    (max weighted count, then lexicographically smallest pair).
    """
    sym = words.select(
        "word", "freq", F.split(F.col("word"), "").alias("sym")
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        pairs = sym.where(F.size("sym") >= 2).select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(F.col("sym"), 1, F.size("sym") - 1),
                    F.slice(F.col("sym"), 2, F.size("sym") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(
                F.col("p.l").alias("left"), F.col("p.r").alias("right")
            )
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], top[0]["cnt"]
        merged = left + right
        merges.append((rank, left, right, merged, cnt))
        sym = sym.withColumn(
            "sym", merge_pair_expr(F.col("sym"), left, right, merged)
        ).localCheckpoint(eager=True)
    return merges


@query("h17_bpe_train", section="H17,D8,G8", tags=("llm-pipeline", "ml"))
def h17_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 10 BPE merges on the corpus word-frequency table and emit
    the merge table: (rank, left, right, merged, weighted_count).
    Rows-only (iterative fit); tests/test_bpe.py pins the sequence to
    a pure-Python replica and checks planted-corpus behavior."""
    d = parallelized(table(spark, sf_dir, "documents"))
    words = (
        d.select(F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    merges = bpe_train(words, n_merges=10)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, weighted_count long"
    )


@query("h17_bpe_segment", section="H17,G8", tags=("llm-pipeline",))
def h17_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the 10 learned merges (h17_bpe_train) to segment every
    vocabulary word: (word, freq, segments comma-joined, n_segments).
    The tokenizer's APPLY side — segmentation is the sequential
    application of the merge table, each rule a codegen'd fold; at
    scale this runs map-only over any corpus once the merge table is
    learned. Rows-only (depends on the learned merges); the replica
    test pins segmentation via the same fold logic."""
    d = parallelized(table(spark, sf_dir, "documents"))
    words = (
        d.select(F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    merges = bpe_train(words, n_merges=10)
    seg = F.split(F.col("word"), "")
    for _, left, right, merged, _cnt in merges:
        seg = merge_pair_expr(seg, left, right, merged)
    return words.select(
        "word",
        "freq",
        F.array_join(seg, ",").alias("segments"),
        F.size(seg).alias("n_segments"),
    )


# ---------------------------------------------------------------------------
# Portable micro BPE: 3 unrolled merge rounds as a hash-matchable query
# (VERDICT r4 item 3 continued — the h5_glove_fit_micro treatment applied
# to the BPE trainer).


_BPE_MICRO_MERGES = 3


def _bpe_micro_oracle() -> str:
    """DuckDB twin of h17_bpe_train_micro: the full greedy BPE loop —
    overlapping pair counts, (max count, lexicographic) winner, and
    GREEDY NON-OVERLAPPING merge application — unrolled for
    _BPE_MICRO_MERGES rounds in pure SQL. The greedy left-to-right
    fold (``a a a`` under (a,a) -> ``aa a``) is expressed as
    gaps-and-islands: candidate positions (sym=l, next=r) that are
    CONSECUTIVE can only occur when l = r, and the fold keeps every
    other candidate from each run's start — so
    ``(pos - island_start) % 2 = 0`` reproduces the fold exactly,
    for both the l = r and l <> r cases."""
    parts = [
        """
WITH t AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
words AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM t WHERE word <> '' GROUP BY 1
),
w2 AS (
  SELECT word, freq, unnest(range(0, length(word))) AS pos FROM words
),
sym0 AS (SELECT word, freq, pos, word[pos + 1] AS sym FROM w2)"""
    ]
    for k in range(_BPE_MICRO_MERGES):
        parts.append(f""",
win{k} AS (
  SELECT s1.sym AS l, s2.sym AS r, CAST(sum(s1.freq) AS BIGINT) AS cnt
  FROM sym{k} s1
  JOIN sym{k} s2 ON s2.word = s1.word AND s2.pos = s1.pos + 1
  GROUP BY 1, 2
  ORDER BY cnt DESC, l, r
  LIMIT 1
),
cand{k} AS (
  SELECT s1.word, s1.pos
  FROM sym{k} s1
  JOIN sym{k} s2 ON s2.word = s1.word AND s2.pos = s1.pos + 1
  CROSS JOIN win{k} w
  WHERE s1.sym = w.l AND s2.sym = w.r
),
kept{k} AS (
  SELECT word, pos FROM (
    SELECT word, pos,
           pos - min(pos) OVER (
             PARTITION BY word, pos - rn
           ) AS run_off
    FROM (
      SELECT word, pos,
             row_number() OVER (PARTITION BY word ORDER BY pos) AS rn
      FROM cand{k}
    )
  ) WHERE run_off % 2 = 0
),
sym{k + 1} AS (
  SELECT s.word, s.freq,
         row_number() OVER (PARTITION BY s.word ORDER BY s.pos) - 1 AS pos,
         CASE WHEN kk.pos IS NOT NULL THEN w.l || w.r ELSE s.sym END AS sym
  FROM sym{k} s
  CROSS JOIN win{k} w
  LEFT JOIN kept{k} kk ON kk.word = s.word AND kk.pos = s.pos
  LEFT JOIN kept{k} kc ON kc.word = s.word AND kc.pos = s.pos - 1
  WHERE kc.pos IS NULL
)""")
    selects = "\nUNION ALL ".join(
        f'SELECT {k} AS rank, l AS "left", r AS "right", l || r AS merged, '
        f"cnt AS weighted_count FROM win{k}"
        for k in range(_BPE_MICRO_MERGES)
    )
    return "".join(parts) + "\n" + selects


@query(
    "h17_bpe_train_micro",
    section="H17,D8,G8",
    tags=("llm-pipeline", "ml"),
    oracle=_bpe_micro_oracle(),
)
def h17_bpe_train_micro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training, hash-matchable form: the SAME distributed trainer
    as h17_bpe_train (:func:`bpe_train` — expression-only pair
    explode, map-side-combined pair weights, top-1 winner per round,
    codegen'd greedy merge fold) run for 3 merges, against a DuckDB
    oracle that unrolls the full loop in pure SQL (_bpe_micro_oracle:
    overlapping pair counts, deterministic tie-breaks, and the greedy
    non-overlapping fold via gaps-and-islands parity). This gives the
    BPE MATH a driver hash record; the 10-merge production query
    (h17_bpe_train) stays pinned to its pure-Python replica in
    tests/test_bpe.py."""
    d = parallelized(table(spark, sf_dir, "documents"))
    words = (
        d.select(F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    merges = bpe_train(words, n_merges=_BPE_MICRO_MERGES)
    return spark.createDataFrame(
        merges,
        "rank int, left string, right string, merged string, weighted_count long",
    )
