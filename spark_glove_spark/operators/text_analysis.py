"""Text-analysis / LLM-data-pipeline queries (SURVEY.md §2.H).

H2 stop-words, H10 TF-IDF, H11 shingles, H12 exact near-dup groups,
H14 exact Jaccard, H17 corpus stats, plus quality scoring and
language-ID heuristics (north-star text-analysis extensions) and the
C6 theta-join formulation of co-occurrence (the engine genuinely
executing the range self-join — kept to small windows; the linear
expression form in cooccurrence.py is the scale path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_glove_spark.functions.text import remove_stopwords, shingles, tokenize
from spark_glove_spark.operators.cooccurrence import token_positions
from spark_glove_spark.registry import defer_unpersist, query
from spark_glove_spark.sources import parallelized, table

STOPWORDS = ["a", "the"]

# Tiny deterministic per-language function-word profiles for the
# language-ID heuristic. The fixture corpus is English-vocabulary for
# every lang label (FIXTURES.md), so the heuristic's observable output
# is stable — that's what the oracle checks; real corpora would carry
# real profiles.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "value"],
    "fr": ["le", "la", "et"],
    "es": ["el", "la", "y"],
    "de": ["der", "die", "und"],
    "zh": ["de", "le", "shi"],
}


@query(
    "h2_stopword_removal",
    section="H2",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(toks, x -> x NOT IN ('a', 'the'))) AS BIGINT)
         AS n_content_tokens,
       array_to_string(list_slice(list_filter(toks, x -> x NOT IN ('a', 'the')), 1, 5), ' ')
         AS first5_content
FROM t
""",
)
def h2_stopword_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2: order-preserving stop-word filter (F.filter keeps positions;

    array_except would dedup — wrong for corpora)."""
    d = table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    content = remove_stopwords(toks, STOPWORDS)
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(content).cast("long").alias("n_content_tokens"),
        F.concat_ws(" ", F.slice(content, 1, 5)).alias("first5_content"),
    )


@query(
    "h10_tfidf",
    section="H10",
    oracle="""
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
tf AS (SELECT doc_id, word, count(*) AS tf FROM t GROUP BY 1, 2),
df AS (SELECT word, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT tf.doc_id, tf.word, tf.tf,
       round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
FROM tf JOIN df USING (word) CROSS JOIN n
WHERE tf.doc_id % 25 = 0
""",
)
def h10_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H10: classic TF-IDF (tf × ln(N/df)) without MLlib's hashing trick

    so results are exact and oracle-checkable. The doc-frequency table
    is vocabulary-sized — broadcast side of the join. N comes from a
    1-row aggregate cross-joined in (stays lazy, no driver action).

    One token shuffle feeds both sides: df is derived from the
    (doc_id, word) aggregate — count of pairs per word ==
    countDistinct(doc_id) — and the aggregate is PERSISTED so the
    corpus is scanned + exploded once. Plain exchange reuse does NOT
    fire here (re-verified r2): the doc_id%25 sampling filter pushes
    through the tf aggregate to the fact-side scan, so the two tf
    subplans differ and each would re-scan without the cache. The
    naive form (independent groupBy for df with countDistinct) adds
    an expand for the distinct on top — even more token I/O.
    Tokenization parallelism comes from table()'s built-in corpus
    fan-out."""
    d = table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(tokenize(F.col("text"))).alias("word"))
    tf = defer_unpersist(words.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).alias("tf")
    ).persist())
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.where(F.col("doc_id") % 25 == 0)
        .join(F.broadcast(df), "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


@query(
    "h11_shingles",
    section="H11",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
idx AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
  FROM t WHERE len(toks) >= 3
)
SELECT array_to_string(list_slice(toks, i, i + 2), ' ') AS shingle,
       count(*) AS n
FROM idx
GROUP BY 1
ORDER BY n DESC, shingle
LIMIT 20
""",
)
def h11_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H11: top-20 3-token shingles. Shingle generation is linear

    (transform over an index sequence + slice) — the MinHash (H13)
    front-end."""
    d = table(spark, sf_dir, "documents")
    sh = d.select(
        F.explode(shingles(tokenize(F.col("text")), 3)).alias("shingle")
    )
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "shingle")
        .limit(20)
    )


@query(
    "h12_exact_dup_groups",
    section="H12",
    oracle="""
SELECT sha256(trim(lower(text))) AS content_sha,
       count(*) AS n_dups,
       min(doc_id) AS keeper_doc_id
FROM documents
GROUP BY 1
HAVING count(*) > 1
""",
)
def h12_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H12: exact near-duplicate groups by normalized content hash.

    The fixture has zero exact dups (FIXTURES.md) — this is the
    negative test; unit tests inject duplicates to exercise the
    positive path. keeper = min(doc_id), the deterministic survivor
    rule."""
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.sha2(F.trim(F.lower(F.col("text"))), 256).alias("content_sha"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .where(F.col("n_dups") > 1)
    )


@query(
    "h14_jaccard",
    section="H14",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, source, list_distinct(string_split(text, ' ')) AS s
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
             / (len(a.s) + len(b.s) - len(list_filter(a.s, x -> list_contains(b.s, x)))),
             6) AS jaccard
FROM t a
JOIN t b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
""",
)
def h14_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H14: exact token-set Jaccard over candidate pairs. Candidates are

    blocked on (lang, source) — the same block-then-verify shape used
    after MinHash banding (H13); all-pairs would be O(n²) at scale."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.array_distinct(tokenize(F.col("text"))).alias("s")
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang").alias("la"),
        F.col("source").alias("sa"),
        F.col("s").alias("set_a"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lb"),
        F.col("source").alias("sb"),
        F.col("s").alias("set_b"),
    )
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size("set_a") + F.size("set_b") - inter
    return (
        a.join(
            b,
            (F.col("la") == F.col("lb"))
            & (F.col("sa") == F.col("sb"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
    )


@query(
    "h17_corpus_stats",
    section="H17",
    oracle="""
SELECT lang, source,
       count(*) AS n_docs,
       round(avg(n_chars), 4) AS avg_chars,
       round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars
FROM documents
GROUP BY 1, 2
""",
)
def h17_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H17: per-(lang, source) corpus statistics."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(F.size(tokenize(F.col("text")))), 4).alias("avg_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "h17_quality_score",
    section="H17",
    oracle="""
WITH t AS (
  SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       round(CAST(len(list_filter(toks, x -> x IN ('a', 'the'))) AS DOUBLE)
             / len(toks), 6) AS stopword_ratio,
       round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
         AS unique_ratio,
       round(CAST(n_chars AS DOUBLE) / len(toks), 6) AS avg_token_len,
       CAST(len(toks) BETWEEN 20 AND 80
            AND (CAST(len(list_filter(toks, x -> x IN ('a', 'the'))) AS DOUBLE)
                 / len(toks)) < 0.3 AS BIGINT) AS passes_quality
FROM t
""",
)
def h17_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring for training-data filtering: length bounds,

    stop-word ratio, lexical diversity — the standard cheap pre-filters
    an LLM data pipeline runs before expensive dedup/embedding."""
    d = table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    n = F.size(toks)
    stop_ratio = (
        F.size(F.filter(toks, lambda x: x.isin(STOPWORDS))).cast("double") / n
    )
    return d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / n, 6).alias(
            "unique_ratio"
        ),
        F.round(F.col("n_chars").cast("double") / n, 6).alias("avg_token_len"),
        (n.between(20, 80) & (stop_ratio < 0.3)).cast("long").alias("passes_quality"),
    )


def language_scores(toks) -> dict:
    """Per-language function-word hit ratio for a token-array column."""
    n = F.size(toks)
    return {
        lang: F.size(F.filter(toks, lambda x: x.isin(words))).cast("double") / n
        for lang, words in LANG_PROFILES.items()
    }


def predict_language(toks):
    """Deterministic argmax over language_scores (ties broken by the
    fixed en→fr→es→de→zh order). Column-in, column-out so it composes
    into any pipeline and is unit-testable on planted fixtures."""
    scores = language_scores(toks)
    order = ["en", "fr", "es", "de", "zh"]
    pred = F.lit(order[-1])
    for i in range(len(order) - 2, -1, -1):
        lang = order[i]
        rest = [scores[o] for o in order[i + 1 :]]
        cond = scores[lang] >= (F.greatest(*rest) if len(rest) > 1 else rest[0])
        pred = F.when(cond, lang).otherwise(pred)
    return pred


def _langid_score_sql() -> str:
    cases = []
    for lang, words in LANG_PROFILES.items():
        inlist = ", ".join(f"'{w}'" for w in words)
        cases.append(
            f"CAST(len(list_filter(toks, x -> x IN ({inlist}))) AS DOUBLE) / len(toks) AS score_{lang}"
        )
    return ",\n       ".join(cases)


@query(
    "h17_language_id",
    section="H17",
    oracle=f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, lang,
       {_langid_score_sql()}
  FROM t
)
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN score_en >= greatest(score_fr, score_es, score_de, score_zh)
            THEN 'en'
            WHEN score_fr >= greatest(score_es, score_de, score_zh) THEN 'fr'
            WHEN score_es >= greatest(score_de, score_zh) THEN 'es'
            WHEN score_de >= score_zh THEN 'de'
            ELSE 'zh' END AS predicted_lang,
       round(score_en, 6) AS score_en
FROM s
""",
)
def h17_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: function-word profile scoring with a

    deterministic argmax (ties broken by fixed language order). The
    fixture corpus is English-vocabulary under every lang label, so
    'en' wins every row — the point is the checkable operator shape;
    swap in real profiles (or char n-grams) for real corpora."""
    d = table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        predict_language(toks).alias("predicted_lang"),
        F.round(language_scores(toks)["en"], 6).alias("score_en"),
    )


@query(
    "c6_theta_self_join",
    section="C6",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pos AS (
  SELECT doc_id, unnest(t) AS word, generate_subscripts(t, 1) - 1 AS pos
  FROM toks
)
SELECT a.word AS wi, b.word AS wj, count(*) AS cnt
FROM pos a
JOIN pos b ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 2
WHERE a.doc_id < 50
GROUP BY 1, 2
""",
)
def c6_theta_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: the range/theta self-join formulation of co-occurrence,

    executed AS a join (BroadcastNestedLoopJoin territory) — the
    engine's theta-join capability demonstrated on a bounded slice.
    Directional pairs (no canonicalization) to make the join shape
    explicit. The linear expression form (h3_*) is the production
    path; this exists for join-operator parity (SURVEY §4.3.1)."""
    pos = token_positions(
        table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    ).select("doc_id", "pos", "word")
    a = pos.select(
        F.col("doc_id").alias("da"), F.col("pos").alias("pa"), F.col("word").alias("wi")
    )
    b = pos.select(
        F.col("doc_id").alias("db"), F.col("pos").alias("pb"), F.col("word").alias("wj")
    )
    return (
        a.join(
            b,
            (F.col("da") == F.col("db"))
            & ((F.col("pb") - F.col("pa")).between(1, 2)),
        )
        .groupBy("wi", "wj")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "h17_bpe_token_count",
    section="H17,G2",
    oracle="""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
         AS n_bpe_tokens,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens
FROM documents
""",
)
def h17_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, both ways (north-star text-analysis item):
    whitespace tokens vs a BPE-ish sub-word regex (letter runs, digit
    runs, single punctuation marks — the portable core of the GPT-2
    pre-tokenizer pattern, identical under Java regex and RE2 so the
    oracle is exact). Budgeting training data by sub-word count instead
    of whitespace count is the difference that matters at 100 TB."""
    d = table(spark, sf_dir, "documents")
    bpe = F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
    return d.select(
        "doc_id",
        F.size(bpe).cast("long").alias("n_bpe_tokens"),
        F.size(F.split("text", " ")).cast("long").alias("n_ws_tokens"),
    )


@query(
    "f7_deterministic_split",
    section="F5,G7,B5",
    oracle="""
SELECT CASE WHEN substring(sha256(CAST(doc_id AS VARCHAR)), 1, 1)
                 IN ('0', '1') THEN 'val'
            ELSE 'train' END AS split,
       lang,
       count(*) AS n
FROM documents
GROUP BY 1, 2
""",
)
def f7_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed train/val split — the training-data-pipeline
    way to sample: membership is a pure function of the row key
    (first sha256 nibble ∈ {0,1} → ~1/8 'val'), so the split is
    reproducible across engines, runs, partitionings, and data
    re-orderings — none of which is true of rand()-based sampling."""
    d = table(spark, sf_dir, "documents")
    nibble = F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 1)
    return (
        d.withColumn(
            "split",
            F.when(nibble.isin("0", "1"), "val").otherwise("train"),
        )
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "h17_stratified_sample",
    section="H17,E2,G7",
    oracle="""
SELECT lang, doc_id
FROM (
    SELECT lang, doc_id,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id
           ) AS rn
    FROM documents
)
WHERE rn <= 20
""",
)
def h17_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample: exactly 20 docs per language,
    chosen by hash order (uniform within stratum, reproducible).
    Balancing strata this way is how a 100 TB corpus gets a fixed-size
    per-language eval set; WindowGroupLimit keeps it map-side bounded."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.sha2(F.col("doc_id").cast("string"), 256), "doc_id"
    )
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 20)
        .select("lang", "doc_id")
    )


@query(
    "h17_rolling_fingerprint",
    section="H17,G5,G8",
    oracle="""
SELECT doc_id,
       list_reduce(
           list_prepend(
               CAST(0 AS BIGINT),
               list_transform(string_split(text, ''),
                              c -> CAST(ascii(c) AS BIGINT))
           ),
           (acc, c) -> (acc * 31 + c) % 1000000007
       ) AS fingerprint
FROM documents
""",
)
def h17_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (north-star text-analysis
    item): the Rabin-Karp polynomial hash acc = (acc·31 + byte) mod p
    folded over the document's characters — a single expression-only
    pass, engine-portable (exact DuckDB oracle). The same recurrence,
    windowed, is the basis of content-defined chunking for dedup."""
    d = table(spark, sf_dir, "documents")
    rh = F.aggregate(
        F.split(F.col("text"), ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % 1_000_000_007,
    )
    return d.select("doc_id", rh.alias("fingerprint"))


@query(
    "h17_repetition_score",
    section="H17,H11",
    oracle="""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks
    FROM documents
    WHERE doc_id % 10 = 0
),
grams AS (
    SELECT doc_id,
           array_to_string(
               list_slice(toks, i, i + 1), ' '
           ) AS gram
    FROM (
        SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        FROM t WHERE len(toks) >= 2
    )
),
cnt AS (
    SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_2grams,
       round(1.0 - count(*) / CAST(sum(c) AS DOUBLE), 6) AS dup_2gram_frac,
       round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_2gram_frac
FROM cnt
GROUP BY 1
""",
)
def h17_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    'Scaling Language Models', §A1.1 heuristics — public): the
    duplicate-2-gram fraction and the top-2-gram mass per document.
    High values flag boilerplate/spam for corpus filtering. Linear
    per-doc work: shingle expression → one (doc_id, gram) aggregate →
    per-doc rollup; the doc_id sampling filter pushes to the scan."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    grams = d.select(
        "doc_id",
        F.explode(shingles(tokenize(F.col("text")), 2)).alias("gram"),
    )
    cnt = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c")
    return cnt.groupBy("doc_id").agg(
        n.alias("n_2grams"),
        F.round(1.0 - F.count(F.lit(1)) / n.cast("double"), 6).alias(
            "dup_2gram_frac"
        ),
        F.round(F.max("c") / n.cast("double"), 6).alias("top_2gram_frac"),
    )


@query(
    "h17_token_chunking",
    section="H17,G8,G6",
    oracle="""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks
    FROM documents
    WHERE doc_id % 25 = 0
),
starts AS (
    SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 24)) AS start
    FROM t WHERE len(toks) >= 1
)
SELECT doc_id,
       CAST((start - 1) / 24 AS BIGINT) AS chunk_id,
       len(list_slice(toks, start, start + 31)) AS n_chunk_tokens,
       array_to_string(list_slice(toks, start, start + 31), ' ') AS chunk_text
FROM starts
""",
)
def h17_token_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding token-window chunking — the standard LLM-pipeline step
    that splits long documents into ~32-token training/RAG chunks with
    8-token overlap (stride 24). Pure expression fan-out: sequence of
    chunk starts → posexplode → slice; no UDF, no shuffle before the
    explode, and the doc sampling filter pushes to the scan. At 100 TB
    chunk rows are written partitioned by a hash of doc_id so a
    document's chunks stay co-located for downstream dedup/embedding."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0)
    toks = tokenize(F.col("text"))
    starts = F.when(
        F.size(toks) >= 1, F.sequence(F.lit(1), F.size(toks), F.lit(24))
    ).otherwise(F.array().cast("array<int>"))
    return (
        d.select("doc_id", toks.alias("toks"), F.explode(starts).alias("start"))
        .select(
            "doc_id",
            ((F.col("start") - 1) / 24).cast("long").alias("chunk_id"),
            F.size(F.slice("toks", F.col("start"), 32)).alias("n_chunk_tokens"),
            F.concat_ws(" ", F.slice("toks", F.col("start"), 32)).alias(
                "chunk_text"
            ),
        )
    )


@query(
    "h17_pii_redaction",
    section="H17,G2",
    oracle=r"""
WITH aug AS (
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             AS raw
    FROM documents
    WHERE doc_id % 10 = 0
)
SELECT doc_id,
       CAST(len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(raw, '\b555-[0-9][0-9][0-9][0-9]\b')) AS BIGINT)
         AS n_phones,
       regexp_replace(
           regexp_replace(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+', '<EMAIL>', 'g'),
           '\b555-[0-9][0-9][0-9][0-9]\b', '<PHONE>', 'g'
       ) AS sanitized
FROM aug
""",
)
def h17_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the pre-training hygiene pass that counts and
    masks emails/phone patterns per document. The fixture corpus is
    synthetic word salad with no PII, so the query plants one
    deterministic email + phone per sampled document (same expression
    on both engines) and the redaction provably fires on every row —
    zero-match regexes would verify nothing. Regex subset chosen to
    behave identically under Java regex (Spark) and RE2 (DuckDB):
    character classes, explicit repetition, ASCII word boundaries.
    Pure JVM expressions — at 100 TB this is a map-only pass with no
    shuffle; counts enable audit aggregates downstream."""
    email_re = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+"
    phone_re = r"\b555-[0-9][0-9][0-9][0-9]\b"
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    # F.regexp_extract_all (not F.expr) so the patterns stay Python
    # strings — embedding them in a SQL literal would re-interpret
    # backslash escapes (\b -> backspace) in Spark's lexer.
    return d.withColumn("raw", raw).select(
        "doc_id",
        F.size(F.regexp_extract_all("raw", F.lit(email_re), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("raw", F.lit(phone_re), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), email_re, "<EMAIL>"),
            phone_re,
            "<PHONE>",
        ).alias("sanitized"),
    )


@query(
    "h17_sequence_packing",
    section="H17,E4",
    oracle="""
WITH t AS (
    SELECT doc_id,
           CAST(doc_id % 8 AS INTEGER) AS bucket,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
),
s AS (
    SELECT doc_id, bucket, n_tokens,
           CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_tokens
    FROM t
)
SELECT doc_id, bucket, n_tokens, cum_tokens,
       CAST(bucket * 1000000 + floor((cum_tokens - n_tokens) / 256.0) AS BIGINT)
         AS pack_id
FROM s
""",
)
def h17_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — assign documents to fixed token-budget packs
    (256 tokens) for training-batch construction. Distributed form:
    documents are bucketed (doc_id % 8 here; a hash at production),
    packed greedily WITHIN each bucket by running token sum, and the
    pack id is derived from the exclusive prefix sum — deterministic,
    engine-independent, and each window is per-bucket so no global
    single-partition sort exists at any scale (the bucket count scales
    with the cluster, and a pack never spans buckets). A pack may
    overflow its budget by at most one document — the standard
    streaming-packing tradeoff; exact bin packing is NP-hard and
    sequential."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        (F.col("doc_id") % 8).cast("int").alias("bucket"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return s.select(
        "doc_id",
        "bucket",
        "n_tokens",
        "cum_tokens",
        (
            F.col("bucket") * 1000000
            + F.floor((F.col("cum_tokens") - F.col("n_tokens")) / 256)
        )
        .cast("long")
        .alias("pack_id"),
    )


@query(
    "h10_bm25",
    section="H10,D1,F2",
    oracle="""
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
df AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dl)
SELECT tf.doc_id,
       round(sum(
           ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
       ), 6) AS bm25
FROM tf
JOIN df USING (word)
JOIN dl USING (doc_id)
CROSS JOIN stats
WHERE tf.word IN ('vector', 'query', 'dup')
GROUP BY 1
ORDER BY bm25 DESC, doc_id
LIMIT 20
""",
)
def h10_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring (Robertson/Sparck Jones; k1=1.2, b=0.75)
    for a fixed 3-term query — the classic lexical ranker an LLM data
    pipeline uses for quality-weighted retrieval and hard-negative
    mining. Everything derives from ONE (doc_id, word) aggregate: tf
    feeds doc length (sum per doc), document frequency (count per
    word), the corpus stats (1-row cross join), and the scored fact
    side. The tf aggregate is PERSISTED — plain exchange reuse does
    not fire here because the term-filter pushdown rewrites the fact
    branch's subplan (verified via explain: 4 parquet scans without
    the persist, 1 with); the cached aggregate is (doc, distinct-word)
    sized, far smaller than the token stream it replaces. df is
    vocabulary-sized → broadcast. Top-20 runs as
    TakeOrderedAndProject with a doc_id tiebreak; scores rounded to
    6 dp so libm accumulation order cannot split ranks across
    engines."""
    d = table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(tokenize(F.col("text"))).alias("word"))
    tf = defer_unpersist(words.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    ).persist())
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    df = tf.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    score = (
        F.log(
            1.0
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        * F.col("tf")
        * 2.2
        / (
            F.col("tf")
            + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.where(F.col("word").isin("vector", "query", "dup"))
        .join(F.broadcast(df), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(score), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


@query(
    "h17_decontamination",
    section="H17,H11,C4",
    tags=("dedup", "llm-pipeline"),
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
    SELECT doc_id, list_distinct(list_transform(range(len(t) - 7),
           i -> list_aggregate(t[i + 1:i + 8], 'string_agg', ' '))) AS s
    FROM toks WHERE len(t) >= 8
),
train AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 10 <> 0),
eval_g AS (SELECT doc_id, unnest(s) AS g, len(s) AS n_ngrams
           FROM sh WHERE doc_id % 10 = 0)
SELECT e.doc_id AS eval_doc_id,
       count(*) AS n_shared_ngrams,
       any_value(e.n_ngrams) AS n_ngrams,
       round(CAST(count(*) AS DOUBLE) / any_value(e.n_ngrams), 6)
         AS contamination_rate
FROM eval_g e JOIN train t ON e.g = t.g
GROUP BY 1
""",
)
def h17_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the train/eval n-gram overlap check
    every serious LLM data pipeline runs (the GPT-3/PaLM papers'
    13-gram test, here 8-gram to fit the fixture doc lengths): split
    the corpus deterministically (doc_id % 10 == 0 → eval), build each
    side's distinct 8-gram sets, and report every eval document that
    shares at least one 8-gram with ANY train document, with its
    contamination rate (shared / own distinct 8-grams).

    100 TB shape: the train side collapses to DISTINCT n-grams before
    the join (a hash like xxhash64(g) in production shrinks the
    shuffle key to 8 B); the join is a plain equi-join on the gram,
    skew-bounded because formulaic high-frequency grams can be
    frequency-capped like the prefix filter. One corpus scan feeds
    both sides."""
    d = parallelized(table(spark, sf_dir, "documents"))
    sh = d.select(
        "doc_id",
        F.array_distinct(shingles(tokenize(F.col("text")), 8)).alias("s"),
    ).where(F.size("s") > 0)
    train = (
        sh.where(F.col("doc_id") % 10 != 0)
        .select(F.explode("s").alias("g"))
        .distinct()
    )
    ev = sh.where(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.size("s").alias("n_ngrams"), F.explode("s").alias("g")
    )
    return (
        ev.join(train, "g")
        .groupBy(F.col("doc_id").alias("eval_doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_shared_ngrams"),
            F.first("n_ngrams").alias("n_ngrams"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.first("n_ngrams"), 6
            ).alias("contamination_rate"),
        )
    )


@query(
    "h17_lm_quality_score",
    section="H17,D1,G5",
    tags=("llm-pipeline",),
    oracle="""
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
freq AS (
    SELECT word, count(*) AS c FROM words GROUP BY 1
),
tot AS (SELECT count(*) AS n FROM words)
SELECT w.doc_id,
       count(*) AS n_tokens,
       round(avg(ln(CAST(f.c AS DOUBLE) / t.n)), 6) AS avg_logprob
FROM words w JOIN freq f ON w.word = f.word CROSS JOIN tot t
GROUP BY 1
""",
)
def h17_lm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score — the cheapest useful
    perplexity proxy for corpus filtering: score(doc) = mean over its
    tokens of ln P(token) under the corpus's own unigram distribution.
    Outlier-gibberish documents (rare-token-heavy) score far below
    the corpus mode and get dropped by a percentile cut downstream;
    unlike the heuristic h17_quality_score this is distribution-
    calibrated rather than rule-based.

    Plan: one token explode feeds both the frequency table (vocab-
    sized → broadcast back) and the per-doc average; the corpus total
    is a scalar cross join. Two shuffles total (word agg, doc agg),
    both map-side-combined."""
    d = parallelized(table(spark, sf_dir, "documents"))
    words = d.select("doc_id", F.explode(tokenize(F.col("text"))).alias("word"))
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    tot = words.agg(F.count(F.lit(1)).alias("n"))
    return (
        words.join(F.broadcast(freq), "word")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("c").cast("double") / F.col("n"))), 6
            ).alias("avg_logprob"),
        )
    )


@query(
    "h17_weighted_resample",
    section="H17,B2,G5",
    tags=("llm-pipeline",),
    oracle="""
WITH scored AS (
    SELECT doc_id, n_chars,
           CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE)
               / 4294967296 AS u,
           least(1.0, CAST(n_chars AS DOUBLE) / 400) AS keep_p
    FROM documents
)
SELECT doc_id, round(u, 9) AS u, round(keep_p, 9) AS keep_p
FROM scored
WHERE u < keep_p
""",
)
def h17_weighted_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus resampling — the data-mixing primitive
    (sample document i with probability p_i, here a length proxy
    capped at 1): the acceptance draw is a DETERMINISTIC Knuth-hash
    uniform u = (doc_id * 2654435761 mod 2^32) / 2^32, not rand(), so
    the sample is reproducible across runs/partitionings AND exactly
    replicable by the DuckDB oracle. At 100 TB this is a map-only
    filter — no shuffle, no state; temperature/quality re-weighting
    is just a different keep_p expression."""
    import os

    # raw scan, not table(): the corpus fan-out repartition is for
    # per-row-expensive consumers (tokenize/shingle); a 2-arith-op
    # filter should stay a zero-Exchange map-only plan
    # (tests/test_scale.py::test_weighted_resample_is_map_only)
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    u = (
        (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    ).cast("double") / F.lit(4294967296.0)
    keep_p = F.least(F.lit(1.0), F.col("n_chars").cast("double") / 400)
    return (
        d.select(
            "doc_id",
            F.round(u, 9).alias("u"),
            F.round(keep_p, 9).alias("keep_p"),
        )
        .where(F.col("u") < F.col("keep_p"))
    )


@query(
    "h17_domain_mix_weights",
    section="H17,D1,G5",
    tags=("llm-pipeline",),
    oracle="""
WITH stats AS (
    SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM documents GROUP BY 1
),
tot AS (SELECT sum(n_chars) AS total_chars, count(*) AS n_sources
        FROM (SELECT source, sum(n_chars) AS n_chars FROM documents GROUP BY 1) s,
             (SELECT 1))
SELECT s.source, s.n_docs, s.n_chars,
       round(CAST(s.n_chars AS DOUBLE) / t.total_chars, 9) AS actual_share,
       round(1.0 / t.n_sources, 9) AS target_share,
       round((1.0 / t.n_sources)
             / (CAST(s.n_chars AS DOUBLE) / t.total_chars), 6) AS repeat_factor
FROM stats s CROSS JOIN tot t
""",
)
def h17_domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing weights — the per-source repeat/sample factor that
    reshapes the corpus toward a target distribution (uniform here;
    any target vector drops in): factor = target_share / actual_share
    measured in characters (byte-budget proxy). A factor > 1 means
    upsample/repeat, < 1 means downsample — feed it into
    h17_weighted_resample's keep_p for the actual pass. One bounded
    agg (sources are few) + a scalar cross join; no per-doc state."""
    d = table(spark, sf_dir, "documents")
    stats = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("n_chars")
    )
    tot = stats.agg(
        F.sum("n_chars").alias("total_chars"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    actual = F.col("n_chars").cast("double") / F.col("total_chars")
    target = F.lit(1.0) / F.col("n_sources")
    return (
        stats.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_chars",
            F.round(actual, 9).alias("actual_share"),
            F.round(target, 9).alias("target_share"),
            F.round(target / actual, 6).alias("repeat_factor"),
        )
    )


@query(
    "h10_inverted_index",
    section="H10,D7,G6",
    tags=("ir", "llm-pipeline"),
    oracle="""
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
td AS (SELECT word, doc_id, count(*) AS tf FROM words GROUP BY 1, 2)
SELECT word,
       count(*) AS df,
       CAST(sum(tf) AS BIGINT) AS cf,
       array_to_string(
           list_transform((list_sort(list(doc_id)))[1:15],
                          x -> CAST(x AS VARCHAR)), ',') AS postings
FROM td GROUP BY 1
""",
)
def h10_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build — the retrieval-side twin of TF-IDF/BM25:
    one row per term with document frequency, collection frequency,
    and the head of its sorted posting list (first 15 doc_ids,
    comma-joined so the driver comparator sees a flat string).

    Plan: ONE token explode feeds a (word, doc) partial count (map-side
    combined), then a per-word agg builds df/cf/postings together —
    two shuffles total, both keyed on the term. 100 TB shape: this IS
    how distributed index builds run (posting lists are per-term
    reductions; skew from stopword-class terms is bounded here by the
    posting-head cap, and in production by per-term posting sharding —
    the same term-partitioned layout search engines use)."""
    d = parallelized(table(spark, sf_dir, "documents"))
    words = d.select("doc_id", F.explode(tokenize(F.col("text"))).alias("word"))
    td = words.groupBy("word", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return td.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
        F.array_join(
            F.transform(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, 15),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )


@query(
    "h17_span_dedup",
    section="H17,H11,H12",
    tags=("dedup", "llm-pipeline"),
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
w AS (
    SELECT doc_id,
           unnest(list_transform(range(len(t) - 7),
                  i -> list_aggregate(t[i + 1:i + 8], 'string_agg', ' '))) AS g
    FROM toks WHERE len(t) >= 8
),
nd AS (SELECT g, count(DISTINCT doc_id) AS ndocs FROM w GROUP BY 1)
SELECT doc_id, n_windows, n_dup_windows,
       round(CAST(n_dup_windows AS DOUBLE) / n_windows, 6) AS dup_fraction
FROM (
    SELECT w.doc_id,
           count(*) AS n_windows,
           CAST(sum(CASE WHEN nd.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_windows
    FROM w JOIN nd ON w.g = nd.g
    GROUP BY 1
) WHERE n_dup_windows > 0
""",
)
def h17_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplicate coverage — the window-granular view of
    exact substring dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better" — public; the suffix-array
    method's output, approximated at fixed span length): for every
    document, the fraction of its 8-token windows that also occur in
    at least one OTHER document. Downstream policy either drops the
    repeated spans or down-weights the doc; we report every doc with
    nonzero duplicated-span coverage.

    Plan: one shingle explode feeds both the per-gram doc-frequency
    agg and the per-doc coverage agg; the join back is a plain
    equi-join on the gram. 100 TB shape: grams become 8-byte
    xxhash64 keys (collision-safe for counting at corpus scale), both
    aggs are map-side combined, and the gram-frequency side is
    heavy-hitter-bounded: a frequency cap drops formulaic grams the
    same way the similarity join's prefix filter does."""
    d = parallelized(table(spark, sf_dir, "documents"))
    grams = d.select(
        "doc_id", F.explode(shingles(tokenize(F.col("text")), 8)).alias("g")
    )
    nd = grams.groupBy("g").agg(
        F.countDistinct("doc_id").alias("ndocs")
    )
    per_doc = (
        grams.join(nd, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("ndocs") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_windows"),
        )
        .where(F.col("n_dup_windows") > 0)
    )
    return per_doc.select(
        "doc_id",
        "n_windows",
        "n_dup_windows",
        F.round(
            F.col("n_dup_windows").cast("double") / F.col("n_windows"), 6
        ).alias("dup_fraction"),
    )


@query(
    "h17_sentence_split",
    section="H17,H1,G2,G8",
    tags=("llm-pipeline",),
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
built AS (
  SELECT doc_id,
         list_aggregate(
           list_transform(range(len(t)), i ->
             t[i + 1] ||
             CASE WHEN i = len(t) - 1 THEN '.'
                  WHEN i % 7 = 6 THEN
                    CASE CAST(floor(i / 7.0) AS BIGINT) % 3
                      WHEN 0 THEN '. ' WHEN 1 THEN '! ' ELSE '? ' END
                  ELSE ' ' END),
           'string_agg', '') AS prose
  FROM toks
),
sent AS (
  SELECT doc_id, string_split_regex(prose, '[.!?] ') AS sents
  FROM built
),
cnt AS (
  SELECT doc_id, sents,
         list_transform(sents, s -> len(string_split(s, ' '))) AS counts
  FROM sent
)
SELECT doc_id,
       CAST(len(sents) AS BIGINT) AS n_sentences,
       round(list_aggregate(counts, 'sum') * 1.0 / len(counts), 4)
           AS avg_sentence_tokens,
       CAST(list_aggregate(counts, 'max') AS BIGINT)
           AS max_sentence_tokens,
       sents[1] AS first_sentence
FROM cnt
""",
)
def h17_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation — the unit every downstream quality
    heuristic (mean sentence length, fragment detection) and packing
    policy (sentence-boundary truncation) wants but the raw fixture
    lacks. Prose is synthesized deterministically: a sentence break
    after every 7th token, terminator cycling . ! ? , final period
    appended — so a DuckDB oracle can rebuild the identical prose and
    the regex splitter ``[.!?] `` is hash-checked end to end (counts,
    mean/max sentence length in tokens, and the first sentence
    string).

    Plan: pure higher-order array expressions (transform + aggregate)
    in one projection — no shuffle, no UDF; the 100 TB shape is a
    map-only pass fused into the scan.
    """
    d = table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    n = F.size(t)
    term = F.array(F.lit(". "), F.lit("! "), F.lit("? "))

    def piece(tok, i):
        cyc = F.element_at(term, (F.floor(i / 7.0) % 3 + 1).cast("int"))
        return F.concat(
            tok,
            F.when(i == n - 1, F.lit("."))
            .when(i % 7 == 6, cyc)
            .otherwise(F.lit(" ")),
        )

    prose = F.array_join(F.transform(t, piece), "")
    sents = F.split(prose, "[.!?] ")
    counts = F.transform(sents, lambda s: F.size(F.split(s, " ")))
    return d.select(
        "doc_id",
        F.size(sents).cast("long").alias("n_sentences"),
        F.round(
            F.aggregate(counts, F.lit(0), lambda a, x: a + x)
            * 1.0
            / F.size(counts),
            4,
        ).alias("avg_sentence_tokens"),
        F.array_max(counts).cast("long").alias("max_sentence_tokens"),
        F.element_at(sents, 1).alias("first_sentence"),
    )


_SPAN_KS = (8, 16, 32)


@query(
    "h17_span_dedup_multi",
    section="H17,H11,H12",
    tags=("dedup", "llm-pipeline"),
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
ks AS (SELECT unnest([{", ".join(str(k) for k in _SPAN_KS)}]) AS k),
wpos AS (
    SELECT doc_id, k, unnest(range(len(t) - k + 1)) AS pos, t
    FROM toks CROSS JOIN ks WHERE len(t) >= k
),
w AS (
    SELECT doc_id, k, pos,
           list_aggregate(t[pos + 1:pos + k], 'string_agg', ' ') AS g
    FROM wpos
),
nd AS (SELECT k, g, count(DISTINCT doc_id) AS ndocs FROM w GROUP BY 1, 2),
tot AS (SELECT doc_id, k, count(*) AS n_windows FROM w GROUP BY 1, 2),
dupw AS (
    SELECT w.doc_id, w.k, w.pos
    FROM w JOIN nd ON nd.k = w.k AND nd.g = w.g
    WHERE nd.ndocs >= 2
),
run AS (
    SELECT doc_id, k, pos,
           max(pos + k - 1) OVER (
               PARTITION BY doc_id, k ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS prev_end
    FROM dupw
),
grp AS (
    SELECT doc_id, k, pos,
           sum(CASE WHEN prev_end IS NULL OR pos > prev_end
                    THEN 1 ELSE 0 END) OVER (
               PARTITION BY doc_id, k ORDER BY pos
               ROWS UNBOUNDED PRECEDING
           ) AS gid
    FROM run
),
isl AS (
    SELECT doc_id, k, gid,
           min(pos) AS s, max(pos + k - 1) AS e
    FROM grp GROUP BY 1, 2, 3
),
dstat AS (
    SELECT doc_id, k,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(e - s + 1) AS BIGINT) AS covered_tokens,
           CAST(max(e - s + 1) AS BIGINT) AS max_span_tokens
    FROM isl GROUP BY 1, 2
),
ndup AS (
    SELECT doc_id, k, CAST(count(*) AS BIGINT) AS n_dup_windows
    FROM dupw GROUP BY 1, 2
)
SELECT tot.doc_id, CAST(tot.k AS BIGINT) AS k, tot.n_windows,
       ndup.n_dup_windows, dstat.covered_tokens, dstat.max_span_tokens
FROM tot
JOIN ndup ON ndup.doc_id = tot.doc_id AND ndup.k = tot.k
JOIN dstat ON dstat.doc_id = tot.doc_id AND dstat.k = tot.k
""",
)
def h17_span_dedup_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length duplicated-span coverage (VERDICT r3 item 7 —
    toward the full Lee et al. 2022 suffix-array semantics):
    h17_span_dedup's fixed k=8 under-counts LONG duplicates, so this
    runs the span ladder k ∈ {8, 16, 32} and, per (doc, k), merges the
    duplicated windows into maximal islands (interval union via a
    running-max window — the O(n log n) SQL form of span coalescing).
    ``max_span_tokens`` at the largest k with hits lower-bounds the
    doc's maximal duplicated span length; ``covered_tokens`` is the
    exact union of duplicated-window token coverage at that k.

    Plan: ONE tokenized scan is exploded per ladder rung (3 constant
    rungs — linear, not quadratic, in corpus size); gram frequency and
    per-doc coverage reuse the same exploded stream; island merging is
    a per-(doc,k) sort of only the DUPLICATED windows. 100 TB shape:
    grams hash to xxhash64 keys before the shuffle, the ladder is a
    constant factor of 3 over single-k, and island state per key is
    one running max — never the full document.
    """
    d = parallelized(table(spark, sf_dir, "documents"))
    toks = tokenize(F.col("text"))
    parts = [
        d.select(
            "doc_id",
            F.lit(k).cast("long").alias("k"),
            F.posexplode(shingles(toks, k)).alias("pos", "g"),
        )
        for k in _SPAN_KS
    ]
    grams = parts[0]
    for p in parts[1:]:
        grams = grams.unionByName(p)
    # Three consumers (gram frequency, per-doc totals, dup join) read
    # this stream — persist it ONCE, with grams reduced to xxhash64
    # longs (identity-only use; counts are hash-invariant), so the
    # corpus is tokenized/exploded once instead of three times and
    # every downstream shuffle carries 8-byte keys.
    grams = defer_unpersist(
        grams.select(
            "doc_id", "k", "pos", F.xxhash64("g").alias("g")
        ).persist()
    )
    nd = grams.groupBy("k", "g").agg(
        F.countDistinct("doc_id").alias("ndocs")
    )
    tot = grams.groupBy("doc_id", "k").agg(
        F.count(F.lit(1)).alias("n_windows")
    )
    dupw = (
        grams.join(nd, ["k", "g"])
        .where(F.col("ndocs") >= 2)
        .select("doc_id", "k", "pos")
    )
    wrun = (
        Window.partitionBy("doc_id", "k")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wcum = (
        Window.partitionBy("doc_id", "k")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = dupw.withColumn(
        "prev_end", F.max(F.col("pos") + F.col("k") - 1).over(wrun)
    ).withColumn(
        "gid",
        F.sum(
            F.when(
                F.col("prev_end").isNull()
                | (F.col("pos") > F.col("prev_end")),
                1,
            ).otherwise(0)
        ).over(wcum),
    )
    isl = grp.groupBy("doc_id", "k", "gid").agg(
        F.min("pos").alias("s"),
        F.max(F.col("pos") + F.col("k") - 1).alias("e"),
    )
    dstat = isl.groupBy("doc_id", "k").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("e") - F.col("s") + 1)
        .cast("long")
        .alias("covered_tokens"),
        F.max(F.col("e") - F.col("s") + 1)
        .cast("long")
        .alias("max_span_tokens"),
    )
    ndup = dupw.groupBy("doc_id", "k").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_windows")
    )
    return (
        tot.join(ndup, ["doc_id", "k"])
        .join(dstat, ["doc_id", "k"])
        .select(
            "doc_id",
            "k",
            "n_windows",
            "n_dup_windows",
            "covered_tokens",
            "max_span_tokens",
        )
    )


@query(
    "h17_dsir_weights",
    section="H11,H17,D1",
    tags=("llm-pipeline",),
    oracle="""
WITH t AS (
  SELECT doc_id, source IN ('src0', 'src1', 'src2', 'src3') AS tgt,
         string_split(text, ' ') AS toks
  FROM documents
),
b AS (
  SELECT doc_id, tgt,
         array_to_string(list_slice(toks, i, i + 1), ' ') AS bg
  FROM (SELECT doc_id, tgt, toks, unnest(range(1, len(toks))) AS i
        FROM t WHERE len(toks) >= 2)
),
st AS (
  SELECT bg,
         count(*) FILTER (WHERE tgt) AS ct,
         count(*) FILTER (WHERE NOT tgt) AS cr
  FROM b GROUP BY bg
),
tot AS (
  SELECT sum(ct) AS nt, sum(cr) AS nr, count(*) AS v FROM st
)
SELECT b.doc_id, count(*) AS n_bigrams,
       round(avg(ln(((st.ct + 1) / (tot.nt + tot.v))
                    / ((st.cr + 1) / (tot.nr + tot.v)))), 6)
           AS dsir_weight
FROM b JOIN st USING (bg), tot
WHERE NOT b.tgt
GROUP BY b.doc_id
""",
)
def h17_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling" — public paper):
    score each RAW-pool document by the mean log-likelihood ratio of
    its bigrams under add-1-smoothed unigram-of-bigrams models of a
    TARGET corpus (sources src0-src3 stand in for the high-quality
    target) vs the raw pool. Resampling raw data ∝ exp(weight) shifts
    the pretraining mix toward the target distribution — the standard
    domain-upweighting step of an LLM data pipeline.

    Plan: ONE corpus scan fans out to bigrams (linear transform +
    explode, no join); the bigram-stats aggregate is vocabulary-
    bounded and joins back to the raw docs' occurrences by bigram
    hash — candidates ∝ corpus tokens, never corpus². The two grand
    totals ride a broadcast crossJoin (scalar row). The paper hashes
    bigrams into 2^20 buckets to bound V; here V fits and strings
    keep the oracle exact — the hashed variant only changes the
    grouping key.
    """
    d = table(spark, sf_dir, "documents")
    tgt = F.col("source").isin("src0", "src1", "src2", "src3")
    bg = d.select(
        "doc_id",
        tgt.alias("tgt"),
        F.explode(shingles(tokenize(F.col("text")), 2)).alias("bg"),
    )
    bg = defer_unpersist(bg.persist())
    st = bg.groupBy("bg").agg(
        F.count(F.when(F.col("tgt"), 1)).alias("ct"),
        F.count(F.when(~F.col("tgt"), 1)).alias("cr"),
    )
    st = defer_unpersist(st.persist())
    tot = st.agg(
        F.sum("ct").alias("nt"),
        F.sum("cr").alias("nr"),
        F.count(F.lit(1)).alias("v"),
    )
    scored = (
        bg.where(~F.col("tgt"))
        .join(st, "bg")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "llr",
            F.log(
                ((F.col("ct") + 1) / (F.col("nt") + F.col("v")))
                / ((F.col("cr") + 1) / (F.col("nr") + F.col("v")))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("llr"), 6).alias("dsir_weight"),
    )


@query(
    "c11_fuzzy_join",
    section="C2,G3,H13",
    tags=("similarity",),
    oracle="""
WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 10 = 0)
SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM c a JOIN c b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
""",
)
def c11_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance <= 1) self-join on customer names via
    SymSpell-style deletion-neighborhood blocking: each name emits
    itself plus its |name| single-character deletions; two names
    within edit distance 1 ALWAYS share a variant (substitution ->
    same deletion at the differing position; insert/delete -> the
    shorter name is literally a deletion of the longer), so an
    equi-join on the variant yields a complete candidate set sized by
    collisions — never the n^2 of the naive theta-join the oracle
    runs (kept tractable there by the deterministic custkey%10
    restriction). Exact levenshtein then prunes the false candidates.
    At 100 TB the variant join is an ordinary hash join whose cost
    scales with names x length; deletion distance d covers edit
    distance d at (|name| choose d) variants per name.
    """
    c = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 10 == 0)
        .select("c_custkey", "c_name")
    )
    v = c.select(
        "c_custkey",
        "c_name",
        F.explode_outer(
            F.array_distinct(
                F.expr(
                    "concat(array(c_name), transform("
                    "sequence(1, length(c_name)), i -> "
                    "concat(substring(c_name, 1, i - 1),"
                    " substring(c_name, i + 1, 1000))))"
                )
            )
        ).alias("v"),
    )
    a = v.alias("a")
    b = v.alias("b")
    cand = (
        a.join(b, F.col("a.v") == F.col("b.v"))
        .where(F.col("a.c_custkey") < F.col("b.c_custkey"))
        .select(
            F.col("a.c_custkey").alias("key_a"),
            F.col("b.c_custkey").alias("key_b"),
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_name").alias("name_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "dist", F.levenshtein("name_a", "name_b").cast("long")
        )
        .where(F.col("dist") <= 1)
        .select("key_a", "key_b", "dist")
    )


_LR_ITERS = 10
_LR_RATE = 0.5
_LR_TARGETS = "('src0', 'src1', 'src2', 'src3')"


def _lr_oracle() -> str:
    """Unrolled-CTE twin of the logistic-regression training loop
    (same technique as the PageRank oracle): each iteration is one
    5-gradient aggregate CTE + one weight-update CTE, chained 10
    times, with expression shapes kept structurally identical to the
    Spark side so the float paths agree to ~1e-13."""
    feats = f"""
WITH f AS (
  SELECT doc_id,
         CASE WHEN source IN {_LR_TARGETS} THEN 1.0 ELSE 0.0 END AS y,
         ln(len(string_split(text, ' '))) AS x1,
         len(list_filter(string_split(text, ' '),
             t -> t IN ('a', 'the'))) / len(string_split(text, ' ')) AS x2,
         len(list_distinct(string_split(text, ' ')))
             / len(string_split(text, ' ')) AS x3,
         length(replace(text, ' ', '')) / len(string_split(text, ' ')) AS x4
  FROM documents
),
w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4)"""
    ctes = [feats]
    for k in range(_LR_ITERS):
        z = (
            f"(w{k}.w0 + w{k}.w1 * f.x1 + w{k}.w2 * f.x2"
            f" + w{k}.w3 * f.x3 + w{k}.w4 * f.x4)"
        )
        sig = f"(1.0 / (1.0 + exp(-{z})))"
        gs = ", ".join(
            f"avg(({sig} - f.y) * {x}) AS g{j}"
            for j, x in enumerate(["1.0", "f.x1", "f.x2", "f.x3", "f.x4"])
        )
        ctes.append(f"g{k} AS (SELECT {gs} FROM f, w{k})")
        ws = ", ".join(
            f"w{k}.w{j} - {_LR_RATE} * g{k}.g{j} AS w{j}" for j in range(5)
        )
        ctes.append(f"w{k + 1} AS (SELECT {ws} FROM w{k}, g{k})")
    wn = f"w{_LR_ITERS}"
    zf = (
        f"({wn}.w0 + {wn}.w1 * f.x1 + {wn}.w2 * f.x2"
        f" + {wn}.w3 * f.x3 + {wn}.w4 * f.x4)"
    )
    return (
        ",\n".join(ctes)
        + f"""
SELECT f.doc_id, CAST(f.y AS BIGINT) AS label,
       round(1.0 / (1.0 + exp(-{zf})), 4) AS score
FROM f, {wn}
"""
    )


@query(
    "h17_quality_classifier",
    section="H17,D2,J2",
    tags=("llm-pipeline", "training"),
    oracle=_lr_oracle(),
)
def h17_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FastText-style linear quality classifier, trained distributed:
    full-batch logistic regression (10 iterations, lr=0.5) on four
    cheap text statistics (log token count, stopword ratio, distinct
    ratio, mean token length), labels = membership in the DSIR target
    sources. Per iteration the 5-dim gradient is ONE map-side-
    combinable aggregate over the persisted feature table — the
    weights are driver-held scalars folded back in as literals, so
    the loop does 10 bounded scans with NO shuffle beyond the final
    combine and NO vocab-sized joins (this is the d<<n regime; the
    GloVe trainer covers the big-parameter regime). Oracle: the loop
    unrolled as 10 chained CTEs, hash-matched end to end — the
    distributed gradient path is verified, not just plausible.

    The fixture corpus is source-homogeneous, so the classifier
    honestly learns ~the base rate (bias -> logit(0.2)); the verified
    mechanics, not fixture separability, are the point.
    """
    d = table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    n = F.size(toks)
    f = d.select(
        "doc_id",
        F.when(
            F.col("source").isin("src0", "src1", "src2", "src3"), 1.0
        )
        .otherwise(0.0)
        .alias("y"),
        F.log(n.cast("double")).alias("x1"),
        (
            F.size(F.filter(toks, lambda t: t.isin("a", "the"))) / n
        ).alias("x2"),
        (F.size(F.array_distinct(toks)) / n).alias("x3"),
        (F.length(F.regexp_replace("text", " ", "")) / n).alias("x4"),
    )
    f = defer_unpersist(f.persist())
    w = [0.0] * 5
    xs = [F.lit(1.0), F.col("x1"), F.col("x2"), F.col("x3"), F.col("x4")]
    for _ in range(_LR_ITERS):
        z = (
            F.lit(w[0])
            + F.lit(w[1]) * F.col("x1")
            + F.lit(w[2]) * F.col("x2")
            + F.lit(w[3]) * F.col("x3")
            + F.lit(w[4]) * F.col("x4")
        )
        sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        row = f.agg(
            *[
                F.avg((sig - F.col("y")) * x).alias(f"g{j}")
                for j, x in enumerate(xs)
            ]
        ).collect()[0]
        w = [w[j] - _LR_RATE * row[f"g{j}"] for j in range(5)]
    zf = (
        F.lit(w[0])
        + F.lit(w[1]) * F.col("x1")
        + F.lit(w[2]) * F.col("x2")
        + F.lit(w[3]) * F.col("x3")
        + F.lit(w[4]) * F.col("x4")
    )
    return f.select(
        "doc_id",
        F.col("y").cast("long").alias("label"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-zf)), 4).alias("score"),
    )


# Champion-list size for h10_tfidf_doc_sim: each word's posting list
# is truncated to its top-M docs by weight for CANDIDATE GENERATION
# (scoring stays exact over candidates). Bounds per-probe fan-out to
# vocab * M regardless of df — the guard against the quadratic regime
# when posting lists are corpus-length.
_DOC_SIM_CHAMP_M = 128


@query(
    "h10_tfidf_doc_sim",
    section="H10,H15,C2",
    tags=("similarity",),
    oracle="""
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
tf AS (SELECT doc_id, word, count(*) AS tf FROM t GROUP BY 1, 2),
df AS (SELECT word, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
v AS (
  SELECT tf.doc_id, tf.word,
         tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS w
  FROM tf JOIN df USING (word) CROSS JOIN n
),
nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nm FROM v GROUP BY 1),
champ AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, word, row_number() OVER (
        PARTITION BY word ORDER BY round(w, 6) DESC, doc_id) AS rn
    FROM v
  ) WHERE rn <= {champ_m}
),
cands AS (
  SELECT DISTINCT p.doc_id AS probe_id, ch.doc_id AS cand_id
  FROM v p JOIN champ ch USING (word)
  WHERE p.doc_id % 100 = 0 AND ch.doc_id <> p.doc_id
),
dots AS (
  SELECT ca.probe_id, ca.cand_id, sum(p.w * c.w) AS dot
  FROM cands ca
  JOIN v p ON p.doc_id = ca.probe_id
  JOIN v c ON c.doc_id = ca.cand_id AND c.word = p.word
  GROUP BY 1, 2
),
scored AS (
  SELECT probe_id, cand_id,
         round(dot / (np.nm * nc.nm), 6) AS cos
  FROM dots
  JOIN nrm np ON np.doc_id = probe_id
  JOIN nrm nc ON nc.doc_id = cand_id
)
SELECT probe_id, cand_id, cos FROM (
  SELECT *, row_number() OVER (
      PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rn
  FROM scored
) WHERE rn <= 5
""".format(champ_m=_DOC_SIM_CHAMP_M),
)
def h10_tfidf_doc_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF document similarity — h15's SPARSE counterpart,
    the lexical retrieval workhorse: cosine between tf-idf vectors
    computed as an inverted-index join (terms meet on the word key,
    partial products sum per pair), never as dense vectors. Top-5
    neighbors per probe doc, cosine ROUNDED BEFORE ranking so rank
    order is immune to sub-1e-6 float drift (the fixture's planted
    exact dups make rank-boundary ties real; doc_id breaks them).

    Scale guard (the round-3 finding: raw inverted-index join is
    quadratic when posting lists are corpus-length, measured 20.2x on
    10x data): candidate generation goes through CHAMPION LISTS —
    each word keeps only its top-M (=128) docs by tf-idf weight
    (impact-ordered posting truncation, Manning IR ch.7; subsumes a
    df-cap because the fan-out of ANY posting list is bounded by M
    regardless of df). Exact cosine is then computed only over the
    candidate pairs, so per-probe work is <= vocab * M instead of
    O(corpus). Champion ordering rounds w to 6 dp before ranking
    (doc_id tiebreak) so both engines pick identical lists. One token
    scan feeds tf, df, norms, champions, and the join via a persisted
    (doc, word) aggregate — same exchange-reuse discipline as
    h10_tfidf/bm25.
    """
    d = table(spark, sf_dir, "documents")
    words = token_positions(d).select("doc_id", "word")
    tf = defer_unpersist(
        words.groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    df_ = tf.groupBy("word").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    v = defer_unpersist(
        tf.join(df_, "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            (
                F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
            ).alias("w"),
        )
        .persist()
    )
    nrm = v.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nm")
    )
    p = v.where(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("probe_id"), "word", F.col("w").alias("pw")
    )
    # Champion lists: per-word top-M postings by rounded weight.
    # WindowGroupLimit keeps this map-side bounded; the list total is
    # <= vocab * M rows, small enough to broadcast into candidate gen.
    wch = Window.partitionBy("word").orderBy(
        F.round(F.col("w"), 6).desc(), "doc_id"
    )
    champ = (
        v.withColumn("rn", F.row_number().over(wch))
        .where(F.col("rn") <= _DOC_SIM_CHAMP_M)
        .select(F.col("doc_id").alias("cand_id"), "word")
    )
    cands = (
        p.select("probe_id", "word")
        .join(F.broadcast(champ), "word")
        .where(F.col("cand_id") != F.col("probe_id"))
        .select("probe_id", "cand_id")
        .distinct()
    )
    # Exact dot product over candidate pairs only: re-join each pair
    # with the probe's postings, then meet the candidate's postings on
    # (cand_id, word). Work per pair is the vocabulary overlap.
    dots = (
        cands.join(p, "probe_id")
        .join(
            v.select(F.col("doc_id").alias("cand_id"), "word", "w"),
            ["cand_id", "word"],
        )
        .groupBy("probe_id", "cand_id")
        .agg(F.sum(F.col("pw") * F.col("w")).alias("dot"))
    )
    np_ = nrm.select(
        F.col("doc_id").alias("probe_id"), F.col("nm").alias("pnm")
    )
    nc = nrm.select(
        F.col("doc_id").alias("cand_id"), F.col("nm").alias("cnm")
    )
    scored = (
        dots.join(np_, "probe_id")
        .join(nc, "cand_id")
        .select(
            "probe_id",
            "cand_id",
            F.round(
                F.col("dot") / (F.col("pnm") * F.col("cnm")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos").desc(), "cand_id"
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("probe_id", "cand_id", "cos")
    )


@query(
    "h17_novelty_score",
    section="H17,H11,D1",
    tags=("llm-pipeline", "dedup"),
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(len(t) - 2),
                i -> list_aggregate(t[i + 1:i + 3], 'string_agg', ' ')))
             AS gram
  FROM toks WHERE len(t) >= 3
),
fst AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1)
SELECT g.doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN fst.first_doc = g.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       round(CAST(sum(CASE WHEN fst.first_doc = g.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS novelty_ratio
FROM g JOIN fst USING (gram)
GROUP BY 1
""",
)
def h17_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty per document — ingestion-order contribution
    accounting: a doc's distinct 3-grams are NOVEL if this doc is
    their first corpus occurrence (min doc_id). Curation pipelines use
    exactly this to rank candidate sources by marginal new content
    (a 0.05-novelty shard adds almost nothing to a trained model) and
    to pick which member of a near-dup cluster "owns" shared text.

    Plan: one shingle explode → per-doc distinct → a min-aggregate on
    the gram key → join back on the gram — the h17_span_dedup shape
    with min(doc_id) instead of a frequency. At 100 TB grams hash to
    xxhash64 keys before the shuffle and both aggregates map-side
    combine; nothing is quadratic because the join key is the gram,
    never the doc pair.
    """
    d = parallelized(table(spark, sf_dir, "documents"))
    g = d.select(
        "doc_id",
        F.explode(shingles(tokenize(F.col("text")), 3)).alias("gram"),
    ).distinct()
    fst = g.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        g.join(fst, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            novel.cast("long").alias("n_novel"),
            F.round(
                novel.cast("double") / F.count(F.lit(1)), 6
            ).alias("novelty_ratio"),
        )
    )


_BOILERPLATE_DF = 20  # lines in >= this many docs are boilerplate


@query(
    "h17_boilerplate_lines",
    section="H17,H11,D1",
    tags=("llm-pipeline", "dedup"),
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
built AS (
  SELECT doc_id,
         list_aggregate(
           list_transform(range(len(t)), i ->
             t[i + 1] ||
             CASE WHEN i = len(t) - 1 THEN '.'
                  WHEN i % 7 = 6 THEN
                    CASE CAST(floor(i / 7.0) AS BIGINT) % 3
                      WHEN 0 THEN '. ' WHEN 1 THEN '! ' ELSE '? ' END
                  ELSE ' ' END),
           'string_agg', '') AS prose
  FROM toks
),
paged AS (
  SELECT b.doc_id,
         'Shared navigation menu for ' || d.source || '. '
           || b.prose || ' Global copyright footer.' AS page
  FROM built b JOIN documents d ON d.doc_id = b.doc_id
),
lines AS (
  SELECT doc_id, unnest(string_split_regex(page, '[.!?] ')) AS line
  FROM paged
),
freq AS (
  SELECT line, count(DISTINCT doc_id) AS ndocs FROM lines GROUP BY 1
)
SELECT l.doc_id,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN f.ndocs >= {_BOILERPLATE_DF}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
       CAST(sum(CASE WHEN f.ndocs >= {_BOILERPLATE_DF} THEN 0
                     ELSE len(string_split(l.line, ' ')) END) AS BIGINT)
           AS kept_tokens
FROM lines l JOIN freq f USING (line)
GROUP BY 1
""",
)
def h17_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate removal — the CCNet/RefinedWeb stage
    that strips nav menus, cookie banners, and footers: a LINE
    (sentence unit here, from the deterministic prose synthesis
    shared with h17_sentence_split) repeated across >= 20 documents
    is boilerplate, and the doc keeps only its other lines' tokens.
    Differs from span dedup in unit (whole line, not k-gram window)
    and in policy (cross-doc frequency threshold, not any-duplicate).
    The synthesis injects the boilerplate a crawl would carry: a
    per-source navigation header (shared by every doc of that source
    — 25+ docs at every SF, above threshold) and a global copyright
    footer (all docs) around each doc's unique content lines, so the
    detector has real positives AND real negatives to separate and
    the oracle hash proves it flags exactly the injected lines.

    Plan: one line explode feeds the distinct-doc frequency agg and
    the per-doc rollup; the join back is an equi-join on the line.
    100 TB shape: lines hash to xxhash64 keys before the shuffle and
    the frequency side is heavy-hitter-bounded — boilerplate is BY
    DEFINITION the head of the frequency distribution, so a count-min
    sketch (d12) can replace the exact agg without changing policy.
    """
    d = parallelized(table(spark, sf_dir, "documents"))
    t = F.split(F.col("text"), " ")
    n = F.size(t)
    term = F.array(F.lit(". "), F.lit("! "), F.lit("? "))

    def piece(tok, i):
        cyc = F.element_at(term, (F.floor(i / 7.0) % 3 + 1).cast("int"))
        return F.concat(
            tok,
            F.when(i == n - 1, F.lit("."))
            .when(i % 7 == 6, cyc)
            .otherwise(F.lit(" ")),
        )

    prose = F.array_join(F.transform(t, piece), "")
    page = F.concat(
        F.lit("Shared navigation menu for "),
        F.col("source"),
        F.lit(". "),
        prose,
        F.lit(" Global copyright footer."),
    )
    lines = d.select(
        "doc_id", F.explode(F.split(page, "[.!?] ")).alias("line")
    )
    freq = lines.groupBy("line").agg(
        F.countDistinct("doc_id").alias("ndocs")
    )
    is_bp = F.col("ndocs") >= _BOILERPLATE_DF
    return (
        lines.join(freq, "line")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(is_bp, 1).otherwise(0))
            .cast("long")
            .alias("n_boilerplate"),
            F.sum(
                F.when(is_bp, 0).otherwise(
                    F.size(F.split(F.col("line"), " "))
                )
            )
            .cast("long")
            .alias("kept_tokens"),
        )
    )


@query(
    "h17_chat_template",
    section="H17,G9,G1",
    tags=("llm-pipeline",),
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
msg AS (
  SELECT doc_id,
         '[{"role":"system","content":"You are a helpful assistant."},'
         || '{"role":"user","content":"'
         || list_aggregate(toks[1:greatest(len(toks) // 2, 1)],
                           'string_agg', ' ')
         || '"},{"role":"assistant","content":"'
         || list_aggregate(toks[greatest(len(toks) // 2, 1) + 1:len(toks)],
                           'string_agg', ' ')
         || '"}]' AS j
  FROM t WHERE len(toks) >= 2
),
parsed AS (
  SELECT doc_id,
         json_extract_string(j, '$[1].content') AS user_c,
         json_extract_string(j, '$[2].content') AS asst_c,
         CAST(len(json_extract(j, '$')::JSON[]) AS BIGINT) AS n_turns
  FROM msg
)
SELECT doc_id, n_turns,
       CAST(len(string_split(user_c, ' ')) AS BIGINT) AS user_tokens,
       CAST(len(string_split(asst_c, ' ')) AS BIGINT) AS asst_tokens,
       md5('system: You are a helpful assistant.' || chr(10)
           || 'user: ' || user_c || chr(10)
           || 'assistant: ' || asst_c) AS flat_md5
FROM parsed
""",
)
def h17_chat_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template flattening — the SFT-data assembly step: a JSON
    message array (system/user/assistant, synthesized
    deterministically by splitting each doc's tokens into a
    user/assistant pair) is PARSED back through the engine's real
    JSON stack (from_json with an array<struct> schema) and flattened
    to the training text "role: content\\n..." form, reported as
    per-role token counts plus an md5 of the flattened text so the
    hash covers the exact rendered bytes. The oracle builds the
    identical JSON and parses it with DuckDB's json_extract — both
    engines' JSON parse/extract paths are what's actually compared.

    Plan: pure codegen string/JSON expressions, one scan, no shuffle.
    At 100 TB this is a map-only pass — the same shape real SFT
    pipelines run over conversation dumps, where from_json's
    schema-pruned parse beats regex surgery on the raw string.
    """
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    half = F.greatest((F.size(toks) / 2).cast("int"), F.lit(1))
    user_c = F.array_join(F.slice(toks, 1, half), " ")
    asst_c = F.array_join(
        F.slice(toks, half + 1, F.size(toks) - half), " "
    )
    j = F.concat(
        F.lit(
            '[{"role":"system","content":"You are a helpful'
            ' assistant."},{"role":"user","content":"'
        ),
        user_c,
        F.lit('"},{"role":"assistant","content":"'),
        asst_c,
        F.lit('"}]'),
    )
    msgs = F.from_json(
        j, "array<struct<role:string,content:string>>"
    )
    flat = F.array_join(
        F.transform(
            msgs, lambda m: F.concat(m["role"], F.lit(": "), m["content"])
        ),
        "\n",
    )
    return (
        d.where(F.size(toks) >= 2)
        .select(
            "doc_id",
            msgs.alias("msgs"),
            flat.alias("flat"),
        )
        .select(
            "doc_id",
            F.size("msgs").cast("long").alias("n_turns"),
            F.size(F.split(F.element_at("msgs", 2)["content"], " "))
            .cast("long")
            .alias("user_tokens"),
            F.size(F.split(F.element_at("msgs", 3)["content"], " "))
            .cast("long")
            .alias("asst_tokens"),
            F.md5("flat").alias("flat_md5"),
        )
    )


# ---------------------------------------------------------------------------
# Exact maximal duplicated spans (VERDICT r4 item 5 — closing the
# variable-length gap the k-ladder brackets).


_SPX_K = 8  # window size: spans >= _SPX_K tokens are recovered EXACTLY
_SPX_DF_CAP = 32  # gram-occurrence cap bounding the pair join fan-out


def _spx_oracle() -> str:
    k, cap = _SPX_K, _SPX_DF_CAP
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
w AS (
    SELECT doc_id, unnest(range(len(t) - {k - 1})) AS pos, t
    FROM toks WHERE len(t) >= {k}
),
g2 AS (
    SELECT doc_id, pos,
           list_aggregate(t[pos + 1:pos + {k}], 'string_agg', ' ') AS g
    FROM w
),
cap AS (SELECT g FROM g2 GROUP BY g HAVING count(*) BETWEEN 2 AND {cap}),
gc AS (SELECT g2.* FROM g2 JOIN cap USING (g)),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.pos AS pos_a, b.pos AS pos_b, a.pos - b.pos AS diag
    FROM gc a JOIN gc b ON a.g = b.g
    WHERE a.doc_id < b.doc_id
       OR (a.doc_id = b.doc_id AND a.pos < b.pos)
),
lagged AS (
    SELECT doc_a, doc_b, diag, pos_a, pos_b,
           lag(pos_a) OVER (
               PARTITION BY doc_a, doc_b, diag ORDER BY pos_a
           ) AS prev
    FROM pairs
),
grp AS (
    SELECT doc_a, doc_b, diag, pos_a, pos_b,
           sum(CASE WHEN prev IS NULL OR pos_a > prev + 1
                    THEN 1 ELSE 0 END) OVER (
               PARTITION BY doc_a, doc_b, diag ORDER BY pos_a
               ROWS UNBOUNDED PRECEDING
           ) AS gid
    FROM lagged
),
runs AS (
    SELECT doc_a, doc_b, diag, gid, count(*) AS nwin,
           min(pos_a) AS sa, min(pos_b) AS sb
    FROM grp GROUP BY 1, 2, 3, 4
),
spans AS (
    SELECT doc_a AS doc_id, doc_b AS partner_doc,
           nwin + {k - 1} AS span, sa AS start_pos
    FROM runs
    UNION ALL
    SELECT doc_b, doc_a, nwin + {k - 1}, sb FROM runs
),
best AS (
    SELECT doc_id, partner_doc, span, start_pos,
           row_number() OVER (
               PARTITION BY doc_id
               ORDER BY span DESC, partner_doc, start_pos
           ) AS rn
    FROM spans
)
SELECT doc_id, CAST(partner_doc AS BIGINT) AS partner_doc,
       CAST(span AS BIGINT) AS max_span_tokens,
       CAST(start_pos AS BIGINT) AS start_pos
FROM best WHERE rn = 1
"""


def max_dup_spans(
    docs: DataFrame, k: int = _SPX_K, df_cap: int = _SPX_DF_CAP
) -> DataFrame:
    """EXACT maximal duplicated-span length per document, for spans of
    at least ``k`` tokens: a duplicated substring of length L >= k
    produces exactly L - k + 1 consecutive matching k-gram windows on
    ONE alignment diagonal (pos_a - pos_b constant) between the two
    occurrences, so the longest consecutive diagonal run r recovers
    the true length as r + k - 1 — the matching-statistics form of
    the Lee et al. 2022 suffix-array result, expressed as a gram
    equi-join plus a gaps-and-islands window. Within-doc repeats
    (same doc, different positions) participate like cross-doc pairs.

    ``df_cap`` bounds the pair fan-out: grams occurring more than
    df_cap times corpus-wide are boilerplate-class (handled by
    h17_boilerplate_lines) and are excluded, so each gram contributes
    at most df_cap^2 pairs — the same heavy-hitter discipline as the
    similarity join's prefix filter. Spans whose EVERY window clears
    the cap are exact; a span crossing an over-cap gram splits into
    its exact sub-spans."""
    grams = docs.select(
        "doc_id",
        F.posexplode(shingles(tokenize(F.col("text")), k)).alias("pos", "gs"),
    ).select("doc_id", "pos", F.xxhash64("gs").alias("g"))
    occ = grams.groupBy("g").agg(F.count(F.lit(1)).alias("n_occ"))
    # localCheckpoint: both pair sides re-expand the persisted subtree
    # in the printed plan (planlint); the capped gram stream is small
    gc = (
        grams.join(
            occ.where((F.col("n_occ") >= 2) & (F.col("n_occ") <= df_cap)), "g"
        )
        .select("doc_id", "pos", "g")
        .localCheckpoint(eager=True)
    )
    a = gc.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "g"
    )
    b = gc.select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"), "g"
    )
    pairs = (
        a.join(b, "g")
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            | ((F.col("doc_a") == F.col("doc_b")) & (F.col("pos_a") < F.col("pos_b")))
        )
        .select(
            "doc_a", "doc_b", "pos_a", "pos_b",
            (F.col("pos_a") - F.col("pos_b")).alias("diag"),
        )
    )
    wlag = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    wcum = wlag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grp = pairs.withColumn("prev", F.lag("pos_a").over(wlag)).withColumn(
        "gid",
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("pos_a") > F.col("prev") + 1), 1
            ).otherwise(0)
        ).over(wcum),
    )
    runs = grp.groupBy("doc_a", "doc_b", "diag", "gid").agg(
        F.count(F.lit(1)).alias("nwin"),
        F.min("pos_a").alias("sa"),
        F.min("pos_b").alias("sb"),
    )
    spans = _run_spans(runs, k)
    wbest = Window.partitionBy("doc_id").orderBy(
        F.col("span").desc(), "partner_doc", "start_pos"
    )
    return (
        spans.withColumn("rn", F.row_number().over(wbest))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            "partner_doc",
            F.col("span").alias("max_span_tokens"),
            F.col("start_pos").cast("long").alias("start_pos"),
        )
    )


def _run_spans(runs: DataFrame, k: int) -> DataFrame:
    """Emit each diagonal run once per participating document.

    A union of two projections over ``runs`` re-executes the whole
    pair-join + window subtree per branch (column pruning splits the
    aggregate into a min(pos_a) plan and a min(pos_b) plan, so Spark
    cannot reuse it); exploding a 2-struct array keeps one subtree and
    produces the identical row multiset."""
    span = (F.col("nwin") + F.lit(k - 1)).cast("long")
    return runs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("doc_id"),
                    F.col("doc_b").alias("partner_doc"),
                    span.alias("span"),
                    F.col("sa").alias("start_pos"),
                ),
                F.struct(
                    F.col("doc_b").alias("doc_id"),
                    F.col("doc_a").alias("partner_doc"),
                    span.alias("span"),
                    F.col("sb").alias("start_pos"),
                ),
            )
        ).alias("s")
    ).select("s.doc_id", "s.partner_doc", "s.span", "s.start_pos")


@query(
    "h17_span_dedup_exact",
    section="H17,H11,H12",
    tags=("dedup", "llm-pipeline"),
    oracle=_spx_oracle(),
)
def h17_span_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact maximal duplicated-span length per document (the query
    form of :func:`max_dup_spans` — see its docstring for the
    diagonal-run construction and the df_cap exactness contract).
    Reports, for every document with a duplicated span of >= _SPX_K
    tokens, the TRUE maximal span length (no ladder bracketing), the
    partner document containing the other occurrence, and the span's
    start position. tests/test_dedup.py injects a 100-token duplicate
    and asserts it is recovered at exactly 100.

    100 TB shape: grams hash to xxhash64 longs before any shuffle;
    the pair join is bounded by df_cap^2 per gram; the island merge
    state per (doc_a, doc_b, diag) key is one lag value. The heavy
    tail (grams over the cap) is excluded deterministically, never
    sampled."""
    return max_dup_spans(parallelized(table(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# Content-defined chunking (the windowed form of h17_rolling_fingerprint's
# recurrence, as that docstring promises).


_CDC_WIN = 4  # rolling window (tokens)
_CDC_MASK = 16  # boundary when window-hash % _CDC_MASK == 0 (~16-token chunks)
_CDC_P = 1_000_000_007


def _cdc_oracle() -> str:
    w, m, p = _CDC_WIN, _CDC_MASK, _CDC_P
    terms = " + ".join(
        f"coalesce(lag(v, {w - 1 - j}) OVER wpos, 0) * {31 ** j}"
        for j in range(w)
    )
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
pos AS (
  SELECT doc_id, unnest(range(0, len(toks))) AS pos, toks
  FROM t WHERE len(toks) > 0
),
tok AS (
  SELECT doc_id, pos, toks[pos + 1] AS tk,
         ('0x' || substr(md5(toks[pos + 1]), 1, 8))::BIGINT AS v
  FROM pos
),
h AS (
  SELECT doc_id, pos, tk,
         ({terms}) % {p} AS wh
  FROM tok
  WINDOW wpos AS (PARTITION BY doc_id ORDER BY pos)
),
b AS (
  SELECT doc_id, pos, tk,
         CASE WHEN pos >= {w - 1} AND wh % {m} = 0 THEN 1 ELSE 0 END AS bnd
  FROM h
),
cid AS (
  SELECT doc_id, pos, tk,
         coalesce(sum(bnd) OVER (
             PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS chunk_id
  FROM b
),
chunks AS (
  SELECT doc_id, chunk_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         md5(string_agg(tk, ' ' ORDER BY pos)) AS key
  FROM cid GROUP BY 1, 2
),
nd AS (SELECT key, count(DISTINCT doc_id) AS ndocs FROM chunks GROUP BY 1)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN nd.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_chunks,
       CAST(max(c.n_tokens) AS BIGINT) AS max_chunk_tokens
FROM chunks c JOIN nd ON nd.key = c.key
GROUP BY 1
"""


@query(
    "h17_cdc_chunking",
    section="H17,H12,G7",
    tags=("dedup", "llm-pipeline"),
    oracle=_cdc_oracle(),
)
def h17_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking + chunk-level dedup (the FastCDC /
    Rabin-boundary idea, public; the windowed form of
    h17_rolling_fingerprint's recurrence, as promised there): a
    4-token rolling polynomial hash over engine-portable md5 token
    values cuts a chunk boundary wherever hash % 16 == 0, so chunk
    boundaries depend only on LOCAL content — an insertion early in a
    document shifts at most one chunk, and identical passages chunk
    identically wherever they appear (the property fixed-stride
    chunking lacks, and the reason dedup at chunk level survives
    edits). Chunks are then content-hashed and any chunk occurring in
    more than one document is flagged. Output per doc: chunk count,
    cross-doc duplicated-chunk count, max chunk length — all
    hash-checked, boundaries included, against the DuckDB twin.

    100 TB shape: one explode + two windows per doc (hash, chunk id),
    then a chunk-key groupBy — shuffle keys are 16-byte md5 chunk
    keys, volume ∝ corpus/expected-chunk-size; no pair structure
    anywhere."""
    d = parallelized(table(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id", F.posexplode(tokenize(F.col("text"))).alias("pos", "tk")
    ).withColumn(
        "v",
        F.conv(F.substring(F.md5("tk"), 1, 8), 16, 10).cast("long"),
    )
    wpos = Window.partitionBy("doc_id").orderBy("pos")
    # h_i = sum_j 31^j * v_{i-(W-1-j)}: j=0 is the OLDEST window token
    # (weight 1), j=W-1 the current token (weight 31^(W-1)) — the same
    # orientation the generated oracle SQL uses
    wh = sum(
        (
            F.coalesce(F.lag("v", _CDC_WIN - 1 - j).over(wpos), F.lit(0))
            * F.lit(31 ** j).cast("long")
            for j in range(1, _CDC_WIN)
        ),
        start=F.coalesce(F.lag("v", _CDC_WIN - 1).over(wpos), F.lit(0)),
    ) % _CDC_P
    b = tok.withColumn(
        "bnd",
        F.when(
            (F.col("pos") >= _CDC_WIN - 1) & (wh % _CDC_MASK == 0), 1
        ).otherwise(0),
    )
    wprev = wpos.rowsBetween(Window.unboundedPreceding, -1)
    cid = b.withColumn(
        "chunk_id", F.coalesce(F.sum("bnd").over(wprev), F.lit(0))
    )
    chunks = cid.groupBy("doc_id", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tk"))),
                    lambda s: s["tk"],
                ),
            )
        ).alias("key"),
    )
    nd = chunks.groupBy("key").agg(F.countDistinct("doc_id").alias("ndocs"))
    return (
        chunks.join(nd, "key")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("ndocs") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_chunks"),
            F.max("n_tokens").alias("max_chunk_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Round 7: MinHash-bucketed exact-span dedup (VERDICT r6 item 4) — the
# Lee et al. 2022 production composition: block with the sketch, run the
# exact suffix-style span pass only WITHIN candidate buckets.


def _spb_oracle() -> str:
    from spark_glove_spark.operators.dedup import mh_pair_ctes

    k = _SPX_K
    return f"""
WITH {mh_pair_ctes('documents')},
toks2 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
w2 AS (
    SELECT doc_id, unnest(range(len(t) - {k - 1})) AS pos, t
    FROM toks2 WHERE len(t) >= {k}
),
g2 AS (
    SELECT doc_id, pos,
           list_aggregate(t[pos + 1:pos + {k}], 'string_agg', ' ') AS gg
    FROM w2
),
p0 AS (
    SELECT c.doc_a, c.doc_b, ga.pos AS pos_a, gb.pos AS pos_b,
           ga.pos - gb.pos AS diag
    FROM cand c
    JOIN g2 ga ON ga.doc_id = c.doc_a
    JOIN g2 gb ON gb.doc_id = c.doc_b AND gb.gg = ga.gg
),
lag2 AS (
    SELECT doc_a, doc_b, diag, pos_a, pos_b,
           lag(pos_a) OVER (
               PARTITION BY doc_a, doc_b, diag ORDER BY pos_a
           ) AS prev
    FROM p0
),
grp2 AS (
    SELECT doc_a, doc_b, diag, pos_a, pos_b,
           sum(CASE WHEN prev IS NULL OR pos_a > prev + 1
                    THEN 1 ELSE 0 END) OVER (
               PARTITION BY doc_a, doc_b, diag ORDER BY pos_a
               ROWS UNBOUNDED PRECEDING
           ) AS gid
    FROM lag2
),
runs2 AS (
    SELECT doc_a, doc_b, diag, gid, count(*) AS nwin,
           min(pos_a) AS sa, min(pos_b) AS sb
    FROM grp2 GROUP BY 1, 2, 3, 4
),
spans2 AS (
    SELECT doc_a AS doc_id, doc_b AS partner_doc,
           nwin + {k - 1} AS span, sa AS start_pos
    FROM runs2
    UNION ALL
    SELECT doc_b, doc_a, nwin + {k - 1}, sb FROM runs2
),
best2 AS (
    SELECT doc_id, partner_doc, span, start_pos,
           row_number() OVER (
               PARTITION BY doc_id
               ORDER BY span DESC, partner_doc, start_pos
           ) AS rn
    FROM spans2
)
SELECT doc_id, CAST(partner_doc AS BIGINT) AS partner_doc,
       CAST(span AS BIGINT) AS max_span_tokens,
       CAST(start_pos AS BIGINT) AS start_pos
FROM best2 WHERE rn = 1
"""


@query(
    "h17_span_dedup_bucketed",
    section="H17,H13,H11",
    tags=("dedup", "llm-pipeline"),
    oracle=_spb_oracle(),
)
def h17_span_dedup_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-BUCKETED exact-span dedup — the production composition
    of the two hash-matched pieces (Lee et al. 2022's deployed shape):
    the portable LSH banding (h13_minhash_portable's block step,
    shared code via dedup.portable_band_candidates) proposes
    candidate DOC PAIRS, and the exact diagonal-run span pass
    (h17_span_dedup_exact's machinery) runs ONLY between those pairs
    — the gram join is keyed per candidate pair, never corpus-global,
    so the quadratic-risk stage is bounded by |candidates| x grams
    per doc instead of df_cap^2 x |grams|. Output per doc: the true
    maximal duplicated span (>= _SPX_K tokens) against any BUCKETED
    partner, with position — fully hash-checked, banding included,
    against the DuckDB twin.

    Contract difference from the exact query, stated not hidden:
    recall is bounded by LSH (a shared span between docs with low
    OVERALL similarity may not share a band bucket), which is the
    production tradeoff — the sketch pays for candidate discovery,
    the span pass pays only within buckets. Within-doc repeats are
    out of scope here (cross-doc pairs only); h17_span_dedup_exact
    keeps them.

    100 TB: candidates ∝ band collisions (near-dup pairs), span work
    ∝ candidate grams; neither stage touches n² or a corpus-global
    gram join — this is the variant that survives when the exact
    pass's df_cap join is still too hot."""
    from spark_glove_spark.operators.dedup import portable_band_candidates

    docs = parallelized(table(spark, sf_dir, "documents"))
    k = _SPX_K
    cand = portable_band_candidates(docs).localCheckpoint(eager=True)
    grams = docs.select(
        "doc_id",
        F.posexplode(shingles(tokenize(F.col("text")), k)).alias("pos", "gs"),
    ).select("doc_id", "pos", F.xxhash64("gs").alias("g"))
    grams = defer_unpersist(grams.persist())
    ga = grams.join(
        cand, grams["doc_id"] == cand["doc_a"]
    ).select("doc_a", "doc_b", F.col("pos").alias("pos_a"), "g")
    gb = grams.select(
        F.col("doc_id").alias("doc_b2"),
        F.col("pos").alias("pos_b"),
        F.col("g").alias("g2"),
    )
    pairs = ga.join(
        gb, (ga["g"] == gb["g2"]) & (ga["doc_b"] == gb["doc_b2"])
    ).select(
        "doc_a", "doc_b", "pos_a", "pos_b",
        (F.col("pos_a") - F.col("pos_b")).alias("diag"),
    )
    wlag = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    wcum = wlag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grp = pairs.withColumn("prev", F.lag("pos_a").over(wlag)).withColumn(
        "gid",
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("pos_a") > F.col("prev") + 1), 1
            ).otherwise(0)
        ).over(wcum),
    )
    runs = grp.groupBy("doc_a", "doc_b", "diag", "gid").agg(
        F.count(F.lit(1)).alias("nwin"),
        F.min("pos_a").alias("sa"),
        F.min("pos_b").alias("sb"),
    )
    spans = _run_spans(runs, k)
    wbest = Window.partitionBy("doc_id").orderBy(
        F.col("span").desc(), "partner_doc", "start_pos"
    )
    return (
        spans.withColumn("rn", F.row_number().over(wbest))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            "partner_doc",
            F.col("span").alias("max_span_tokens"),
            F.col("start_pos").cast("long").alias("start_pos"),
        )
    )


# ---------------------------------------------------------------------------
# Round 7: corpus-quality rule sets and language statistics.


_GOPHER_STOPS = ("a", "the")  # the fixture's function words
_GOPHER_MIN_WORDS = 50
_GOPHER_MWL_LO, _GOPHER_MWL_HI = 3.0, 10.0
_GOPHER_STOP_MIN = 0.02
_GOPHER_TOP_MAX = 0.10


@query(
    "h17_gopher_rules",
    section="H17,B5,D1",
    tags=("llm-pipeline", "quality"),
    oracle=f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
base AS (
  SELECT doc_id, len(toks) AS n_words,
         list_aggregate(list_transform(toks, x -> len(x)), 'sum')
           / CAST(len(toks) AS DOUBLE) AS mwl,
         len(list_filter(toks, x -> x IN {_GOPHER_STOPS}))
           / CAST(len(toks) AS DOUBLE) AS stop_frac
  FROM t WHERE len(toks) > 0
),
tc AS (
  SELECT doc_id, max(c) AS top_c FROM (
    SELECT doc_id, count(*) AS c
    FROM (SELECT doc_id, unnest(toks) AS w FROM t)
    GROUP BY doc_id, w
  ) GROUP BY doc_id
),
j AS (
  SELECT b.doc_id, b.n_words, b.mwl, b.stop_frac,
         tc.top_c / CAST(b.n_words AS DOUBLE) AS top_frac
  FROM base b JOIN tc USING (doc_id)
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       round(mwl, 6) AS mean_word_len,
       round(stop_frac, 6) AS stop_frac,
       round(top_frac, 6) AS top_token_frac,
       CAST(CASE WHEN n_words >= {_GOPHER_MIN_WORDS} THEN 1 ELSE 0 END
            AS BIGINT) AS pass_wordcount,
       CAST(CASE WHEN mwl BETWEEN {_GOPHER_MWL_LO} AND {_GOPHER_MWL_HI}
            THEN 1 ELSE 0 END AS BIGINT) AS pass_wordlen,
       CAST(CASE WHEN stop_frac >= {_GOPHER_STOP_MIN} THEN 1 ELSE 0 END
            AS BIGINT) AS pass_stopwords,
       CAST(CASE WHEN top_frac <= {_GOPHER_TOP_MAX} THEN 1 ELSE 0 END
            AS BIGINT) AS pass_repetition,
       CAST(CASE WHEN n_words >= {_GOPHER_MIN_WORDS}
                  AND mwl BETWEEN {_GOPHER_MWL_LO} AND {_GOPHER_MWL_HI}
                  AND stop_frac >= {_GOPHER_STOP_MIN}
                  AND top_frac <= {_GOPHER_TOP_MAX}
            THEN 1 ELSE 0 END AS BIGINT) AS pass_all
FROM j
""",
)
def h17_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rule set (Rae et al. 2021's document
    filters, public — the rule battery most open-data pipelines ship
    some variant of): per document, the measured statistics AND the
    individual rule verdicts — word count >= min, mean word length in
    [3, 10], stop-word fraction >= min (gibberish has none), top-token
    fraction <= max (the repetition rule) — plus the conjunction.
    Emitting per-rule flags rather than one boolean is the production
    shape: pipelines track WHICH rule kills a document (rule-kill
    histograms catch both data regressions and rule bugs).

    Thresholds are constants shared between body and oracle via one
    f-string source. The fixture's synthetic docs discriminate on
    every rule (length spread 10..110 words, two function words).

    100 TB: map-only expressions except the top-token count — one
    (doc, word) aggregate whose key domain is the token stream;
    everything else never leaves the scan stage."""
    d = parallelized(table(spark, sf_dir, "documents"))
    toks = tokenize(F.col("text"))
    base = d.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        (
            F.aggregate(
                F.transform(toks, lambda x: F.length(x)),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            / F.size(toks).cast("double")
        ).alias("mwl"),
        (
            F.size(F.filter(toks, lambda x: x.isin(*_GOPHER_STOPS)))
            / F.size(toks).cast("double")
        ).alias("stop_frac"),
    ).where(F.col("n_words") > 0)
    tc = (
        d.select("doc_id", F.explode(toks).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    j = base.join(tc, "doc_id").withColumn(
        "top_frac", F.col("top_c") / F.col("n_words").cast("double")
    )
    flag = lambda c: c.cast("long")  # noqa: E731
    p_wc = F.col("n_words") >= _GOPHER_MIN_WORDS
    p_mwl = F.col("mwl").between(_GOPHER_MWL_LO, _GOPHER_MWL_HI)
    p_stop = F.col("stop_frac") >= _GOPHER_STOP_MIN
    p_rep = F.col("top_frac") <= _GOPHER_TOP_MAX
    return j.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.round("mwl", 6).alias("mean_word_len"),
        F.round("stop_frac", 6).alias("stop_frac"),
        F.round("top_frac", 6).alias("top_token_frac"),
        flag(p_wc).alias("pass_wordcount"),
        flag(p_mwl).alias("pass_wordlen"),
        flag(p_stop).alias("pass_stopwords"),
        flag(p_rep).alias("pass_repetition"),
        flag(p_wc & p_mwl & p_stop & p_rep).alias("pass_all"),
    )


@query(
    "h17_bigram_lm_perplexity",
    section="H17,H11,D1",
    tags=("llm-pipeline", "quality"),
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
bi AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t)
),
c12 AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c FROM bi GROUP BY 1),
v AS (SELECT count(DISTINCT w2) AS vs FROM bi)
SELECT bi.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(exp(-avg(ln((c12.c + 1.0) / (c1.c + (SELECT vs FROM v))))), 6)
         AS perplexity
FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
GROUP BY 1
""",
)
def h17_bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model perplexity per document — the step up
    from h17_lm_quality_score's unigram proxy and the cheap stand-in
    for the KenLM filter CCNet-style pipelines run: train an add-one-
    smoothed bigram LM on the corpus itself (counts c(w1,w2), c(w1),
    successor vocabulary V), then score each document as
    exp(-mean ln P(w2|w1)). Formulaic/templated text scores low
    perplexity, gibberish high — the two-sided cut quality pipelines
    apply.

    100 TB: the model IS two aggregates (bigram counts — vocab²-
    bounded, unigram counts); scoring joins the bigram stream to the
    broadcast count tables and reduces per doc. One corpus scan feeds
    train and score (self-scoring; a held-out split is the same plan
    with a filter)."""
    d = parallelized(table(spark, sf_dir, "documents"))
    t = d.select("doc_id", tokenize(F.col("text")).alias("toks"))
    n = F.size("toks")
    bi = t.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("toks", 1, n - 1).alias("w1"),
                F.slice("toks", 2, n - 1).alias("w2"),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    bi = defer_unpersist(bi.persist())
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vs = bi.select("w2").distinct().count()
    return (
        bi.join(F.broadcast(c12), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.exp(
                    -F.avg(
                        F.log(
                            (F.col("c12") + 1.0) / (F.col("c1") + F.lit(vs))
                        )
                    )
                ),
                6,
            ).alias("perplexity"),
        )
    )


@query(
    "h17_zipf_slope",
    section="H17,D8,G5",
    tags=("llm-pipeline", "quality"),
    oracle="""
WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
w AS (SELECT source, unnest(toks) AS word FROM t),
f AS (SELECT source, word, count(*) AS c FROM w GROUP BY 1, 2),
r AS (
  SELECT source, c,
         row_number() OVER (PARTITION BY source
                            ORDER BY c DESC, word) AS rnk
  FROM f
),
m AS (
  SELECT source, count(*) AS vocab,
         sum(ln(rnk)) AS sx, sum(ln(c)) AS sy,
         sum(ln(rnk) * ln(rnk)) AS sxx, sum(ln(rnk) * ln(c)) AS sxy
  FROM r GROUP BY 1
)
SELECT source, CAST(vocab AS BIGINT) AS vocab,
       round((vocab * sxy - sx * sy) / (vocab * sxx - sx * sx), 6)
         AS zipf_slope
FROM m
""",
)
def h17_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency slope per source — the corpus-linguistics
    health check (natural language sits near slope -1; machine-
    generated or templated shards drift off): per source, rank words
    by frequency (deterministic word tiebreak) and fit
    ln(freq) ~ ln(rank) by closed-form least squares. A data-sourcing
    team reads this per-shard to spot collapsed vocabularies before
    training does.

    100 TB: word frequencies are one aggregate; the rank window and
    the 5-moment regression run on the VOCABULARY (per source), not
    the token stream — the same d<<n collapse as ml_linear_regression."""
    d = parallelized(table(spark, sf_dir, "documents"))
    w = d.select("source", F.explode(tokenize(F.col("text"))).alias("word"))
    f = w.groupBy("source", "word").agg(F.count(F.lit(1)).alias("c"))
    win = Window.partitionBy("source").orderBy(F.col("c").desc(), "word")
    r = f.select("source", "c", F.row_number().over(win).alias("rnk"))
    lx, ly = F.log("rnk"), F.log("c")
    m = r.groupBy("source").agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * lx).alias("sxx"),
        F.sum(lx * ly).alias("sxy"),
    )
    return m.select(
        "source",
        F.col("vocab").cast("long").alias("vocab"),
        F.round(
            (F.col("vocab") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("vocab") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("zipf_slope"),
    )


@query(
    "h17_self_overlap",
    section="H17,H11,C4",
    tags=("llm-pipeline", "dedup"),
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(toks, i, i + 3), ' ') AS gram
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 2)) AS i FROM t)
),
occ AS (SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN occ.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared,
       round(sum(CASE WHEN occ.nd >= 2 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS self_overlap
FROM g JOIN occ USING (gram)
GROUP BY 1
""",
)
def h17_self_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-BLEU-style corpus overlap per document: the fraction of a
    document's distinct 4-grams that ALSO occur in at least one other
    document — the diversity metric generated-corpus evaluations
    report (high self-overlap = mode-collapsed or templated data),
    and the order-free complement to h17_novelty_score's first-
    occurrence accounting (novelty credits the FIRST doc; overlap
    charges every doc symmetrically).

    100 TB: one distinct-gram explode, one gram-keyed count-distinct
    aggregate, one join back on the gram — no doc-pair structure, the
    h17_span_dedup cost shape."""
    d = parallelized(table(spark, sf_dir, "documents"))
    g = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles(tokenize(F.col("text")), 4))
        ).alias("gram"),
    )
    g = defer_unpersist(g.persist())
    occ = g.groupBy("gram").agg(F.countDistinct("doc_id").alias("nd"))
    shared = F.when(F.col("nd") >= 2, 1).otherwise(0)
    return (
        g.join(occ, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(shared).alias("n_shared"),
            F.round(
                F.sum(shared) / F.count(F.lit(1)).cast("double"), 6
            ).alias("self_overlap"),
        )
    )


_BURST_TOP = 20


@query(
    "h17_word_burstiness",
    section="H17,D2,D8",
    tags=("llm-pipeline", "quality"),
    oracle=f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
w AS (SELECT doc_id, unnest(toks) AS word FROM t),
nd AS (SELECT count(*) AS docs FROM t),
top AS (
  SELECT word, count(*) AS total
  FROM w GROUP BY 1 ORDER BY total DESC, word LIMIT {_BURST_TOP}
),
per AS (
  SELECT w.word, w.doc_id, count(*) AS c
  FROM w JOIN top USING (word) GROUP BY 1, 2
),
stats AS (
  SELECT word,
         sum(c) AS s, sum(c * c) AS ss, count(*) AS present
  FROM per GROUP BY 1
)
SELECT word,
       CAST((SELECT total FROM top WHERE top.word = stats.word) AS BIGINT)
         AS total,
       CAST(present AS BIGINT) AS n_docs_present,
       round((CAST(ss AS DOUBLE) / (SELECT docs FROM nd)
              - pow(CAST(s AS DOUBLE) / (SELECT docs FROM nd), 2))
             / (CAST(s AS DOUBLE) / (SELECT docs FROM nd)), 6)
         AS burstiness
FROM stats
""",
)
def h17_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word burstiness (Church–Gale): variance-to-mean ratio of
    per-document counts for the top-20 corpus words — the classic
    content/function-word separator (function words ≈ Poisson, VMR
    near 1; topical words burst, VMR >> 1) that term-weighting and
    stop-list induction build on. Absent docs count as zero
    occurrences: the moments divide by the TOTAL doc count, computed
    from per-present-doc integer sums so no zero rows materialize.

    100 TB: a (word, doc) aggregate restricted to the top-k word set
    (broadcast), then a k-row moment reduce — cost one scan after the
    frequency pass."""
    d = parallelized(table(spark, sf_dir, "documents"))
    w = d.select("doc_id", F.explode(tokenize(F.col("text"))).alias("word"))
    w = defer_unpersist(w.persist())
    docs = d.count()
    top = (
        w.groupBy("word")
        .agg(F.count(F.lit(1)).alias("total"))
        .orderBy(F.col("total").desc(), "word")
        .limit(_BURST_TOP)
    )
    per = (
        w.join(F.broadcast(top.select("word")), "word")
        .groupBy("word", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = per.groupBy("word").agg(
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
        F.count(F.lit(1)).alias("present"),
    )
    mean = F.col("s").cast("double") / docs
    var = F.col("ss").cast("double") / docs - mean * mean
    return (
        stats.join(F.broadcast(top), "word")
        .select(
            "word",
            F.col("total").cast("long").alias("total"),
            F.col("present").cast("long").alias("n_docs_present"),
            F.round(var / mean, 6).alias("burstiness"),
        )
    )


_LID_TOP = 20  # profile size (top trigrams per language / per doc)


@query(
    "h17_langid_trigrams",
    section="H17,H11,E2",
    tags=("llm-pipeline", "quality"),
    oracle=f"""
WITH tri AS (
  SELECT doc_id, lang, substr(text, i, 3) AS tri
  FROM (SELECT doc_id, lang, text,
               unnest(range(1, len(text) - 1)) AS i
        FROM documents)
),
lang_prof AS (
  SELECT lang, tri FROM (
    SELECT lang, tri,
           row_number() OVER (PARTITION BY lang
                              ORDER BY count(*) DESC, tri) AS rn
    FROM tri GROUP BY lang, tri
  ) WHERE rn <= {_LID_TOP}
),
doc_prof AS (
  SELECT doc_id, lang AS true_lang, tri FROM (
    SELECT doc_id, lang, tri,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY count(*) DESC, tri) AS rn
    FROM tri GROUP BY doc_id, lang, tri
  ) WHERE rn <= {_LID_TOP}
),
overlap AS (
  SELECT d.doc_id, d.true_lang, lp.lang AS cand, count(*) AS hits
  FROM doc_prof d JOIN lang_prof lp USING (tri)
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT doc_id, true_lang, cand,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, cand) AS rn
  FROM overlap
)
SELECT true_lang AS lang, cand AS predicted,
       CAST(count(*) AS BIGINT) AS n
FROM pred WHERE rn = 1 GROUP BY 1, 2
""",
)
def h17_langid_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language ID (the Cavnar–Trenkle 1994 textcat
    shape, public — what langid tools reduce to before neural models):
    each language gets a profile of its top-20 character trigrams by
    corpus frequency; each document gets its own top-20; the predicted
    language maximizes profile OVERLAP — an all-integer score (count
    of shared trigrams), so unlike the naive-Bayes log-prob path there
    is no floating point anywhere before the confusion-matrix output.
    Complements h17_language_id (function-word hits) and
    ml_naive_bayes (token likelihoods): three independent methods a
    production pipeline ensembles, each oracle-checked.

    100 TB: trigram counts are two bounded aggregates (vocab of char
    trigrams ≪ tokens); profiles are top-k windows over the per-key
    count domains; the scoring join is doc-top-k × lang-top-k on the
    trigram key — every stage map-side combined, nothing scans text
    twice (the explode feeds both profile builds)."""
    d = parallelized(table(spark, sf_dir, "documents"))
    tri = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 2),"
                   " i -> substring(text, i, 3))")
        ).alias("tri"),
    )
    tri = defer_unpersist(tri.persist())
    wl = Window.partitionBy("lang").orderBy(F.col("c").desc(), "tri")
    lang_prof = (
        tri.groupBy("lang", "tri")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(wl))
        .where(F.col("rn") <= _LID_TOP)
        .select(F.col("lang").alias("cand"), "tri")
    )
    wd = Window.partitionBy("doc_id").orderBy(F.col("c").desc(), "tri")
    doc_prof = (
        tri.groupBy("doc_id", "lang", "tri")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(wd))
        .where(F.col("rn") <= _LID_TOP)
        .select("doc_id", F.col("lang").alias("true_lang"), "tri")
    )
    overlap = doc_prof.join(F.broadcast(lang_prof), "tri").groupBy(
        "doc_id", "true_lang", "cand"
    ).agg(F.count(F.lit(1)).alias("hits"))
    wp = Window.partitionBy("doc_id").orderBy(F.col("hits").desc(), "cand")
    pred = overlap.withColumn("rn", F.row_number().over(wp)).where(
        F.col("rn") == 1
    )
    return pred.groupBy(
        F.col("true_lang").alias("lang"), F.col("cand").alias("predicted")
    ).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Semantic chunking — the 2024+ RAG preprocessing op: split a document
# where the embedding similarity of ADJACENT text windows drops, so
# chunk boundaries follow topic shifts instead of fixed offsets.

_SC_SEG = 8  # tokens per scored segment
_SC_DIMS = 4  # pseudo-embedding dims (the h15_maxsim discipline)


def _sc_vec_sql(d: int) -> str:
    """One segment-vector coordinate: the sum over the segment's words
    of an exact-integer md5 word embedding — engine-identical."""
    return (
        f"list_aggregate(list_transform(words, w ->"
        f" (('0x' || substr(md5('sc{d}|' || w), 1, 8))::BIGINT % 2001) - 1000),"
        f" 'sum')"
    )


@query(
    "h17_semantic_chunking",
    section="H17,E3,G8",
    tags=("llm-pipeline",),
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
segs AS (
  SELECT doc_id, s,
         list_slice(t, s * {_SC_SEG} + 1, s * {_SC_SEG} + {_SC_SEG}) AS words
  FROM toks, unnest(range(len(t) // {_SC_SEG})) u(s)
),
vecs AS (
  SELECT doc_id, s,
         [{", ".join(_sc_vec_sql(d) for d in range(_SC_DIMS))}] AS v
  FROM segs
),
dots AS (
  SELECT doc_id, s, v,
         lag(v) OVER (PARTITION BY doc_id ORDER BY s) AS pv
  FROM vecs
),
brk AS (
  SELECT doc_id, s,
         CASE WHEN pv IS NOT NULL
                   AND list_dot_product(v, pv) < 0 THEN 1 ELSE 0 END AS b
  FROM dots
),
chunks AS (
  SELECT doc_id, s,
         sum(b) OVER (PARTITION BY doc_id ORDER BY s
                      ROWS UNBOUNDED PRECEDING) AS chunk_id
  FROM brk
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(min(s) AS BIGINT) AS start_seg
FROM chunks GROUP BY 1, 2
""",
)
def h17_semantic_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic chunking, fully ORACLE-checked: documents split into
    fixed _SC_SEG(=8)-token segments, each segment gets an exact-integer
    pseudo-embedding (sum of md5-derived word vectors — a
    deterministic stand-in for a learned encoder; the SEARCH ALGEBRA
    is what this certifies, the h15_maxsim treatment), and a chunk
    boundary falls wherever the integer dot product of ADJACENT
    segment vectors goes negative — a topic shift. Chunk ids are the
    running breakpoint count (per-doc prefix sum), output is one row
    per (doc, chunk) with its segment count and start offset.

    The boundary rule compares the SIGN of an int64 dot, so no float
    threshold can split differently across engines; lag + prefix-sum
    windows partition by doc_id (bounded by segments-per-doc, never a
    global sort). Docs shorter than one segment have no scored window
    and drop out, as in the oracle. 100 TB: one scan, per-doc windows,
    all expression work — embarrassingly parallel; with a real encoder
    the segment vectors arrive from a batch-inference column and the
    chunking algebra is IDENTICAL."""
    d = parallelized(table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    nseg = F.floor(F.size("t") / _SC_SEG).cast("long")
    segs = toks.where(nseg >= 1).select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("long"), nseg - 1)).alias("s"),
        "t",
    )
    words = F.slice("t", (F.col("s") * _SC_SEG + 1).cast("int"), _SC_SEG)
    zero = F.lit(0).cast("long")

    def coord(dd: int):
        return F.aggregate(
            words,
            zero,
            lambda acc, w: acc
            + (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"sc{dd}|"), w)), 1, 8),
                    16,
                    10,
                ).cast("long")
                % 2001
                - 1000
            ),
        )

    vecs = segs.select(
        "doc_id", "s", F.array(*[coord(dd) for dd in range(_SC_DIMS)]).alias("v")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("s")
    dots = vecs.withColumn("pv", F.lag("v").over(w_doc))
    dot = F.aggregate(
        F.zip_with("v", "pv", lambda x, y: x * y), zero, lambda a, x: a + x
    )
    brk = dots.select(
        "doc_id",
        "s",
        F.when(F.col("pv").isNotNull() & (dot < 0), F.lit(1))
        .otherwise(F.lit(0))
        .alias("b"),
    )
    chunks = brk.withColumn(
        "chunk_id",
        F.sum("b").over(
            w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return chunks.groupBy("doc_id", F.col("chunk_id").cast("long").alias("chunk_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.min("s").cast("long").alias("start_seg"),
    )
