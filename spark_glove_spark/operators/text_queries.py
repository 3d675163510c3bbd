"""Declared queries for the text/GloVe-preprocessing surface.

SURVEY.md §2: H1 (tokenize), D8 (vocabulary), H3+D9 (co-occurrence,
expression form), C6 (co-occurrence, join form — oracle parity shape),
H4 (GloVe weighting).

Oracle note: DuckDB positions come from ``generate_subscripts``;
Spark positions from ``posexplode``. Spark's is 0-based, DuckDB's
1-based — position *differences* (all that matters for co-occurrence)
agree; absolute positions are aligned by subtracting 1 in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_glove_spark.operators.cooccurrence import (
    cooccurrence_counts_by_distance,
    cooccurrence_matrix,
    glove_weight,
    token_positions,
)
from spark_glove_spark.functions.text import unicode_tokens
from spark_glove_spark.registry import query
from spark_glove_spark.sources import table

# Shared DuckDB CTE: token positions (1-based -> aligned to 0-based).
_POS_CTE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
pos AS (
  SELECT doc_id,
         unnest(t) AS word,
         generate_subscripts(t, 1) - 1 AS pos
  FROM toks
)
"""


def cooccurrence_topk(
    spark: SparkSession, sf_dir: str, window: int = 2, k: int = 20
) -> DataFrame:
    """Flagship: top-k co-occurring word pairs, window=2 (weights 1 and

    0.5 — exactly representable, so float hashing is exact). One scan →
    expression-only pair generation → single shuffle agg → global top-k
    (TakeOrderedAndProject, no full sort)."""
    x = cooccurrence_matrix(table(spark, sf_dir, "documents"), window=window)
    return (
        x.select("wi", "wj", F.round("x", 6).alias("x"))
        .orderBy(F.col("x").desc(), "wi", "wj")
        .limit(k)
    )


query(
    "h3_cooccurrence_topk",
    section="H3,D9,F2",
    oracle=_POS_CTE
    + """
SELECT least(a.word, b.word) AS wi,
       greatest(a.word, b.word) AS wj,
       round(sum(1.0 / (b.pos - a.pos)), 6) AS x
FROM pos a
JOIN pos b
  ON a.doc_id = b.doc_id
 AND b.pos - a.pos BETWEEN 1 AND 2
GROUP BY 1, 2
ORDER BY x DESC, wi, wj
LIMIT 20
""",
)(cooccurrence_topk)


@query(
    "h3_cooccurrence_by_distance",
    section="H3,C6",
    oracle=_POS_CTE
    + """
SELECT least(a.word, b.word) AS wi,
       greatest(a.word, b.word) AS wj,
       CAST(b.pos - a.pos AS BIGINT) AS d,
       count(*) AS cnt
FROM pos a
JOIN pos b
  ON a.doc_id = b.doc_id
 AND b.pos - a.pos BETWEEN 1 AND 5
GROUP BY 1, 2, 3
""",
)
def cooccurrence_by_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer co-occurrence counts per (pair, distance), window=5.

    The oracle is the C6 join formulation; the engine runs the linear
    expression form — same semantics, O(n·w) instead of O(n²)."""
    out = cooccurrence_counts_by_distance(
        table(spark, sf_dir, "documents"), window=5
    )
    return out.select("wi", "wj", F.col("d").cast("long").alias("d"), "cnt")


@query(
    "d8_vocabulary",
    section="D8",
    oracle="""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
counts AS (
  SELECT word, count(*) AS freq FROM words GROUP BY word HAVING count(*) >= 5
)
SELECT word,
       freq,
       CAST(row_number() OVER (ORDER BY freq DESC, word) AS BIGINT) AS id
FROM counts
""",
)
def vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8: word -> (frequency, dense rank id), minCount=5.

    GloVe orders its vocabulary by descending frequency (paper §4.2:
    top-400k most frequent words); ties broken by word for determinism.
    At scale the vocab table is small (<=400k rows) — always the
    broadcast side of downstream joins."""
    words = table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("word")
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq")).where(
        F.col("freq") >= 5
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("word"))
    return counts.select(
        "word", "freq", F.row_number().over(w).cast("long").alias("id")
    )


@query(
    "h4_glove_weighting",
    section="H4,G5",
    oracle=_POS_CTE
    + """
, x AS (
  SELECT least(a.word, b.word) AS wi,
         greatest(a.word, b.word) AS wj,
         count(*) AS cnt
  FROM pos a
  JOIN pos b ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 5
  GROUP BY 1, 2
)
SELECT wi, wj, cnt,
       round(pow(least(cnt / 100.0, 1.0), 0.75), 6) AS fx
FROM x
""",
)
def glove_weighting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4: f(x) = (x/x_max)^0.75 capped at 1 (GloVe eq. 9) applied to

    integer pair counts (window=5) so the input is exact."""
    counts = (
        cooccurrence_counts_by_distance(table(spark, sf_dir, "documents"), window=5)
        .groupBy("wi", "wj")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return counts.select(
        "wi",
        "wj",
        "cnt",
        F.round(glove_weight(F.col("cnt").cast("double")), 6).alias("fx"),
    )


@query(
    "h1_token_stats",
    section="H1,G6",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique
FROM documents
""",
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1/G6: per-document token and distinct-token counts — the

    tokenizer's observable contract, SQL-checkable without exposing
    raw arrays to the hash."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
    )


@query(
    "h1_unicode_tokenize",
    section="H1,G2,G6",
    tags=("llm-pipeline",),
    oracle=r"""
WITH messy AS (
  SELECT doc_id,
         concat(
           'Héllo №', CAST(doc_id AS VARCHAR), ': ',
           replace(text, ' ',
                   CASE doc_id % 4 WHEN 0 THEN ' ' WHEN 1 THEN ', '
                                   WHEN 2 THEN '—' ELSE ' … ' END),
           CASE doc_id % 3 WHEN 0 THEN ' (fin / конец)'
                           WHEN 1 THEN ' — DONE; ok?'
                           ELSE ' 你好,世界!' END
         ) AS mtext
  FROM documents
),
tok AS (
  SELECT doc_id,
         regexp_extract_all(mtext, '[\p{L}\p{N}]+') AS toks
  FROM messy
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(
           list_transform(toks, t -> lower(t)))) AS BIGINT)
           AS n_unique_lower,
       toks[1] AS first_tok,
       toks[len(toks)] AS last_tok
FROM tok
""",
)
def h1_unicode_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 on REAL-WORLD text: regex tokenization of messy
    punctuation/unicode input — the first thing a raw corpus hits,
    where the fixture's space-delimited tokenizer (h1_token_stats)
    stops being enough. The messy text is synthesized
    deterministically from the documents fixture (the mm_* pattern):
    an accented/symbol prefix, per-doc separator rewriting (comma, em
    dash, ellipsis), and a cyrillic/CJK/punctuation suffix, so a
    DuckDB oracle can hash-match the result byte-for-byte.

    Tokens are maximal runs of Unicode letters/digits
    (``[\\p{L}\\p{N}]+`` — the same class semantics in Java regex and
    RE2), reported as per-doc counts plus first/last token so the hash
    covers the token STREAM, not just its length. Lowercase-distinct
    exercises unicode-aware case folding on the cyrillic suffix. Plan:
    pure codegen string expressions, one scan, no shuffle.
    """
    d = table(spark, sf_dir, "documents")
    sep = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(" "))
        .when(F.col("doc_id") % 4 == 1, F.lit(", "))
        .when(F.col("doc_id") % 4 == 2, F.lit("—"))
        .otherwise(F.lit(" … "))
    )
    suffix = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(" (fin / конец)"))
        .when(F.col("doc_id") % 3 == 1, F.lit(" — DONE; ok?"))
        .otherwise(F.lit(" 你好,世界!"))
    )
    mtext = F.concat(
        F.lit("Héllo №"),
        F.col("doc_id").cast("string"),
        F.lit(": "),
        F.replace(F.col("text"), F.lit(" "), sep),
        suffix,
    )
    toks = unicode_tokens(F.col("mtext"))
    return (
        d.select("doc_id", mtext.alias("mtext"))
        .select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.size(
                F.array_distinct(F.transform(toks, F.lower))
            ).cast("long").alias("n_unique_lower"),
            F.element_at(toks, 1).alias("first_tok"),
            F.element_at(toks, -1).alias("last_tok"),
        )
    )


_SUBSAMPLE_T = 1e-3
_SUBSAMPLE_KNUTH = 2654435761


@query(
    "h2_frequent_subsample",
    section="H2,H1,D1",
    tags=("llm-pipeline",),
    oracle=f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
pos AS (
  SELECT doc_id, unnest(toks) AS word,
         generate_subscripts(toks, 1) AS pos
  FROM t
),
freq AS (SELECT word, count(*) AS f FROM pos GROUP BY 1),
n AS (SELECT count(*) AS total FROM pos),
kept AS (
  SELECT p.word,
         CASE WHEN ((p.doc_id * 10000 + p.pos) % 2147483647
                    * {_SUBSAMPLE_KNUTH})
                   % 4294967296 / 4294967296.0
                < sqrt({_SUBSAMPLE_T} * n.total / freq.f)
              THEN 1 ELSE 0 END AS keep
  FROM pos p JOIN freq USING (word) CROSS JOIN n
)
SELECT word, count(*) AS n_occurrences,
       CAST(sum(keep) AS BIGINT) AS n_kept
FROM kept
GROUP BY 1
ORDER BY n_occurrences DESC, word
LIMIT 20
""",
)
def h2_frequent_subsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-word subsampling (word2vec's preprocessing step,
    Mikolov et al. 2013 — public): each token OCCURRENCE survives with
    probability sqrt(t*N/f(word)), so stopword-frequency words are
    aggressively thinned while rare words always survive — the step
    that keeps a co-occurrence build from drowning in 'the'. The
    coin flip is DERANDOMIZED with the same Knuth-multiplicative
    integer hash as the CMS (keyed by (doc_id, pos), bit-exact in
    both engines), making the subsample reproducible across runs,
    partitionings, AND engines — which is exactly what a 100 TB
    pipeline wants from sampling: content-addressed decisions, no RNG
    state. One token scan + a vocab-bounded frequency join; the
    decision is pure map-side arithmetic.
    """
    d = table(spark, sf_dir, "documents")
    pos = token_positions(d).select("doc_id", "pos", "word")
    freq = pos.groupBy("word").agg(F.count(F.lit(1)).alias("f"))
    n = pos.agg(F.count(F.lit(1)).alias("total"))
    # token_positions is 0-based; the oracle's generate_subscripts is
    # 1-based — align the hash key so both engines flip the same coin.
    # The key is reduced mod 2^31-1 BEFORE the Knuth multiply so the
    # product stays inside int64 for any doc_id (the unreduced form
    # overflows past doc_id ~347k — ANSI crash or silent keep-all).
    u = (
        ((F.col("doc_id") * 10000 + F.col("pos") + 1)
         % F.lit(2147483647)
         * _SUBSAMPLE_KNUTH)
        % F.lit(4294967296)
        / F.lit(4294967296.0)
    )
    keep = F.when(
        u
        < F.sqrt(
            F.lit(_SUBSAMPLE_T) * F.col("total") / F.col("f")
        ),
        1,
    ).otherwise(0)
    kept = (
        pos.join(freq, "word")
        .crossJoin(F.broadcast(n))
        .withColumn("keep", keep)
    )
    return (
        kept.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.sum("keep").cast("long").alias("n_kept"),
        )
        .orderBy(F.col("n_occurrences").desc(), "word")
        .limit(20)
    )
