"""Co-occurrence extraction — the heart of the GloVe pipeline.

SURVEY.md §2 H3 + D9 (+ C6 join form): for each token at position p,
every token at position p+d (0 < d <= window) co-occurs with weight
1/d (GloVe paper §4.2: "decreasing weighting function" — word pairs
d words apart contribute 1/d to the count).

Scale design (SURVEY.md §4.3.1): the naive formulation is a self-join
of the position-exploded corpus on doc_id with a range predicate —
Spark plans that as BroadcastNestedLoopJoin, O(len²) per doc. The
production path below generates the <= window forward neighbors AS AN
EXPRESSION (transform over a bounded offset sequence + element_at):
linear in corpus size, no join, fully whole-stage-codegen'd, and the
only shuffle is the final groupBy(wi, wj) partial+final hash
aggregation. This survives a 100 TB corpus: work is proportional to
tokens × window, partial aggregation collapses pairs map-side, and the
pair-key shuffle is the theoretical minimum data movement.

The unordered pair (a, b) is emitted once in canonical
(least, greatest) order; X is kept symmetric implicitly (mirror at
training time, glove/trainer.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_glove_spark.functions.text import tokenize
from spark_glove_spark.sources import parallelized


def token_positions(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """H1 + posexplode: (doc_id, pos, word, tokens, n) rows.

    ``text_col`` may be a raw string column (tokenized here) or an
    already-tokenized ``array<string>`` column (used as-is) — the
    pre-tokenized form is the reference-style input for corpora that
    ship as token sequences."""
    from pyspark.sql import types as T

    dtype = docs.schema[text_col].dataType
    toks_expr = (
        F.col(text_col)
        if isinstance(dtype, T.ArrayType)
        else tokenize(F.col(text_col))
    )
    toks = parallelized(
        docs.select("doc_id", toks_expr.alias("tokens"))
    ).withColumn("n", F.size("tokens"))
    return toks.select(
        "doc_id",
        "tokens",
        "n",
        F.posexplode("tokens").alias("pos", "word"),
    )


def _forward_pairs(window: int) -> Column:
    """Array of struct(wj, d) for offsets d=1..window that stay in-doc.

    filter-then-transform keeps ``sequence`` bounds static (a
    sequence with start > stop would run DESCENDING in Spark — the
    classic off-by-one trap the filter avoids).
    """
    offsets = F.filter(
        F.sequence(F.lit(1), F.lit(window)),
        lambda d: (F.col("pos") + d) < F.col("n"),
    )
    return F.transform(
        offsets,
        lambda d: F.struct(
            F.element_at(F.col("tokens"), F.col("pos") + d + F.lit(1)).alias("wj"),
            d.alias("d"),
        ),
    )


def cooccurrence_pairs(
    docs: DataFrame, window: int = 10, text_col: str = "text"
) -> DataFrame:
    """H3 production path: (wi, wj, d) one row per co-occurrence event,

    wi <= wj canonical. Expression-only — no self-join.
    """
    pos = token_positions(docs, text_col)
    pairs = pos.select(
        F.col("word").alias("w_center"),
        F.explode(_forward_pairs(window)).alias("p"),
    ).select(
        F.least("w_center", F.col("p.wj")).alias("wi"),
        F.greatest("w_center", F.col("p.wj")).alias("wj"),
        F.col("p.d").alias("d"),
    )
    return pairs


def cooccurrence_matrix(
    docs: DataFrame, window: int = 10, text_col: str = "text"
) -> DataFrame:
    """H3 + D9: X as COO triplets (wi, wj, x) with x = Σ 1/d.

    One shuffle (groupBy pair); partial aggregation collapses the
    pair stream map-side before it moves.
    """
    return (
        cooccurrence_pairs(docs, window, text_col)
        .groupBy("wi", "wj")
        .agg(F.sum(F.lit(1.0) / F.col("d")).alias("x"))
    )


def cooccurrence_counts_by_distance(
    docs: DataFrame, window: int = 10, text_col: str = "text"
) -> DataFrame:
    """Exact-integer variant: (wi, wj, d, cnt). Used for oracle-checked

    queries where float accumulation order would make hashes fragile,
    and by tests to hand-verify the 1/d math.
    """
    return (
        cooccurrence_pairs(docs, window, text_col)
        .groupBy("wi", "wj", "d")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def glove_weight(x: Column, x_max: float = 100.0, alpha: float = 0.75) -> Column:
    """H4: GloVe weighting f(x) = (x/x_max)^alpha if x < x_max else 1

    (GloVe paper eq. 9; defaults x_max=100, alpha=0.75 from §4.2).
    Pure expression — constant-folded and codegen'd by Catalyst.
    """
    return F.pow(F.least(x / F.lit(x_max), F.lit(1.0)), F.lit(alpha))
