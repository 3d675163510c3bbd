"""Near-duplicate detection (SURVEY.md §2 H13; north-star dedup suite).

The 100 TB shape for every operator here is block-then-verify:
cheap sketch → bucket shuffle → candidate pairs (tiny fraction of n²)
→ exact verification only on candidates. Nothing ever materializes the
full pair space.

MinHash/SimHash bucket contents are hash-function-specific, so these
queries are rows-only to the driver (SURVEY §5.2); their correctness
teeth are tests/test_dedup.py (injected near-dups must be found;
recall vs exact Jaccard). The embedding near-dup variant is exact math
and fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_glove_spark.functions.hashing import (
    band_buckets,
    hamming64,
    minhash_signature,
    simhash64_fast,
)
from spark_glove_spark.functions.text import shingles, tokenize
from spark_glove_spark.functions.vector import dot, dot_sql
from spark_glove_spark.registry import defer_unpersist, query
from spark_glove_spark.sources import parallelized, table

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = 4


def shingle_sets(
    docs: DataFrame, shingle_k: int = 3, text_col: str = "text"
) -> DataFrame:
    """(doc_id, shingles): distinct k-shingle set per document — the
    shared input of both the MinHash sketch and the exact-Jaccard
    verify. Callers that use it twice should persist it; shingling is
    the dominant per-document cost."""
    return parallelized(docs.select("doc_id", text_col)).select(
        "doc_id",
        F.array_distinct(shingles(tokenize(F.col(text_col)), shingle_k)).alias(
            "shingles"
        ),
    ).where(F.size("shingles") > 0)


def hashed_shingle_sets(
    docs: DataFrame, shingle_k: int = 3, text_col: str = "text"
) -> DataFrame:
    """(doc_id, shingles array<bigint>): distinct k-shingle set per
    document with each shingle hashed ONCE to xxhash64. The MinHash
    path's input: the persisted sets and every downstream shuffle
    carry 8-byte longs instead of ~20-byte strings, the signature
    seed-hashes longs, and the exact-Jaccard verify intersects long
    arrays. Local sf0.1 timing is flat vs the string form (the
    pipeline is scan/persist-bound there); the win is bytes — persist
    and shuffle volume drop ~2.5×, which is what matters at corpus
    scale. Identity collisions are 64-bit (~n²/2⁶⁴ — irrelevant at
    any corpus size we can hold). h14's prefix-filter join keeps the
    STRING form (its oracle's prefix order ties break on the shingle
    text)."""
    hashed = F.array_distinct(
        F.transform(
            shingles(tokenize(F.col(text_col)), shingle_k),
            lambda s: F.xxhash64(s),
        )
    )
    return (
        parallelized(docs.select("doc_id", text_col))
        .select("doc_id", hashed.alias("shingles"))
        .where(F.size("shingles") > 0)
    )


def minhash_candidates(
    sh: DataFrame,
) -> DataFrame:
    """H13 candidate generation from shingle_sets(): MinHash(16) →
    4 bands × 4 rows → docs sharing any band bucket. Returns
    (doc_a, doc_b) with doc_a < doc_b, deduped across bands."""
    sig = sh.select(
        "doc_id", minhash_signature(F.col("shingles"), N_HASHES).alias("sig")
    )
    buckets = sig.select(
        "doc_id",
        F.explode(band_buckets(F.col("sig"), N_BANDS, ROWS_PER_BAND)).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_neardups(
    docs: DataFrame, threshold: float = 0.5, shingle_k: int = 3
) -> DataFrame:
    """H13 full pipeline: candidates → exact shingle-Jaccard verify →

    pairs ≥ threshold. (n-gram Jaccard dedup: the verify step IS the
    exact n-gram Jaccard, computed only on the candidate set.)

    The shingle sets feed three plan branches (sketch + both verify
    sides); persisted so shingling runs once, not 3× — at 100 TB this
    is the difference between one corpus scan and three. Shingles are
    the HASHED form (see hashed_shingle_sets): same Jaccard, ~35%
    less pipeline time than string shingles."""
    sets = defer_unpersist(hashed_shingle_sets(docs, shingle_k).persist())
    cand = minhash_candidates(sets)
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("set_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("set_b"))
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size("set_a") + F.size("set_b") - inter
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


@query("h13_minhash_neardup", section="H13,H11,G7")
def h13_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H13: MinHash-LSH near-dup pairs at Jaccard ≥ 0.5. The fixture

    corpus contains PLANTED near-duplicates (28 pairs at J≈0.99 at
    sf0.001, measured) — tests assert the pipeline recovers exactly
    the brute-force ground-truth set."""
    return minhash_neardups(table(spark, sf_dir, "documents"), threshold=0.5)


@query("h13_simhash_fingerprints", section="H13,G7")
def h13_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash 64-bit fingerprints per document (rows-only: xxhash64 is

    engine-specific). Deterministic across runs; tests assert
    near-identical docs land within small Hamming distance."""
    d = parallelized(table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id", simhash64_fast(tokenize(F.col("text"))).alias("simhash")
    )


@query("h13_simhash_neardup", section="H13", tags=("dedup",))
def h13_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: block on the top-16 bits (cheap bucket —

    near-dups almost always agree there), verify full Hamming ≤ 6
    within blocks. On the fixture corpus this recovers the planted
    near-duplicate pairs (38 pairs at sf0.01)."""
    d = parallelized(table(spark, sf_dir, "documents"))
    # Persisted: the block self-join below consumes fp on BOTH sides,
    # and unpersisted each side re-paid the ArrowEvalPython
    # fingerprint pass (tokenize + per-token hashes across the Python
    # boundary, the numpy vote fold, and the return trip) over the
    # whole corpus. The cache is 3 longs/doc; one Python-boundary
    # corpus pass instead of two (r14 optimization round, guide
    # §4.1/§2.4).
    fp = defer_unpersist(
        d.select(
            "doc_id", simhash64_fast(tokenize(F.col("text"))).alias("simhash")
        )
        .withColumn("block", F.shiftright("simhash", 48))
        .persist()
    )
    a = fp.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("fp_a"),
        F.col("block").alias("block_a"),
    )
    b = fp.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("fp_b"),
        F.col("block").alias("block_b"),
    )
    return (
        a.join(
            b,
            (F.col("block_a") == F.col("block_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .withColumn("hamming", hamming64(F.col("fp_a"), F.col("fp_b")).cast("long"))
        .where(F.col("hamming") <= 6)
        .select("doc_a", "doc_b", "hamming")
    )


@query(
    "h13_embedding_neardup",
    section="H13,H15",
    oracle=f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
       round({dot_sql('a.embedding', 'b.embedding')}, 6) AS cos
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {dot_sql('a.embedding', 'b.embedding')} >= 0.4
""",
)
def h13_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: label-blocked pairs with cos ≥ 0.4.

    Exact math → fully oracle-checked. The label block stands in for
    an LSH bucket (same block-then-verify shape, deterministic
    blocking so the oracle can replicate it)."""
    e = table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"), "label"
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("vb"),
        F.col("label").alias("label_b"),
    )
    cos = dot(F.col("va"), F.col("vb"))
    return (
        a.join(
            b,
            (F.col("label") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")),
        )
        .where(cos >= 0.4)
        .select("vec_a", "vec_b", "label", F.round(cos, 6).alias("cos"))
    )


# Shared by h13_url_dedup and h13_quality_keep: deterministic messy
# URLs (variant class = doc_id % 5, path key = doc_id % 97) and their
# canonical form, as one oracle CTE pair.
URL_CANON_CTE = """
raw AS (
  SELECT doc_id,
         CASE doc_id % 5
           WHEN 0 THEN 'https://cdn.example.com/docs/'
                       || CAST(doc_id % 97 AS VARCHAR)
           WHEN 1 THEN 'HTTP://CDN.EXAMPLE.COM/docs/'
                       || CAST(doc_id % 97 AS VARCHAR)
           WHEN 2 THEN 'https://www.cdn.example.com/docs/'
                       || CAST(doc_id % 97 AS VARCHAR) || '/'
           WHEN 3 THEN 'https://cdn.example.com/docs/'
                       || CAST(doc_id % 97 AS VARCHAR)
                       || '?utm_source=feed&utm_campaign=x'
           ELSE 'https://cdn.example.com/docs/'
                       || CAST(doc_id % 97 AS VARCHAR) || '?lang=en'
         END AS url
  FROM documents
),
canon AS (
  SELECT doc_id,
         'https://'
         || regexp_replace(
              lower(regexp_extract(
                  regexp_replace(url, '^[A-Za-z]+://', ''),
                  '^([^/?]+)', 1)),
              '^www\\.', '')
         || regexp_replace(
              regexp_replace(
                  regexp_extract(
                      regexp_replace(url, '^[A-Za-z]+://', ''),
                      '^[^/?]+(.*)$', 1),
                  '[?&]utm_[a-z]+=[^&]*', '', 'g'),
              '/$', '')
             AS canonical_url
  FROM raw
)
"""


def canonicalize_url(url):
    """Canonical form of a raw URL column: https scheme, lowercase
    host without leading www., trailing slash and utm_* params
    dropped. Regex chain stays in the Java/RE2 common subset so the
    DuckDB oracle twin (URL_CANON_CTE) is expression-for-expression
    identical. Property-tested in tests/test_properties.py:
    every scheme-case/www/slash/utm variant of a URL collapses to one
    canonical string, and canonicalization is idempotent."""
    noscheme = F.regexp_replace(url, "^[A-Za-z]+://", "")
    host = F.regexp_replace(
        F.lower(F.regexp_extract(noscheme, "^([^/?]+)", 1)),
        "^www\\.",
        "",
    )
    rest = F.regexp_replace(
        F.regexp_replace(
            F.regexp_extract(noscheme, "^[^/?]+(.*)$", 1),
            "[?&]utm_[a-z]+=[^&]*",
            "",
        ),
        "/$",
        "",
    )
    return F.concat(F.lit("https://"), host, rest)


def canonical_url_col():
    """Spark twin of URL_CANON_CTE: (raw url, canonical url) column
    expressions over the documents table."""
    key = (F.col("doc_id") % 97).cast("string")
    raw = (
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("https://cdn.example.com/docs/"), key),
        )
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(F.lit("HTTP://CDN.EXAMPLE.COM/docs/"), key),
        )
        .when(
            F.col("doc_id") % 5 == 2,
            F.concat(
                F.lit("https://www.cdn.example.com/docs/"),
                key,
                F.lit("/"),
            ),
        )
        .when(
            F.col("doc_id") % 5 == 3,
            F.concat(
                F.lit("https://cdn.example.com/docs/"),
                key,
                F.lit("?utm_source=feed&utm_campaign=x"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://cdn.example.com/docs/"),
                key,
                F.lit("?lang=en"),
            )
        )
    )
    return canonicalize_url(raw)


@query(
    "h13_url_dedup",
    section="H12,G2,G13",
    tags=("dedup", "llm-pipeline"),
    oracle=f"""
WITH {URL_CANON_CTE}
SELECT canonical_url,
       min(doc_id) AS rep_doc_id,
       count(*) AS n_docs
FROM canon GROUP BY 1
""",
)
def h13_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the cheapest, highest-yield dedup
    pass in any web-corpus pipeline, run BEFORE content hashing: the
    same page arrives as scheme/case variants, www-prefixed,
    trailing-slashed, and tracking-parameter-tagged copies. URLs are
    synthesized deterministically from the fixture: variant class =
    doc_id mod 5, path key = doc_id mod 97 — 97 is coprime to 5, so
    docs sharing a path key span DIFFERENT variant classes and the
    canonicalizer must genuinely merge scheme/case/www/slash/utm
    variants into one group. Fully oracle-checked; real params
    (?lang=en) survive canonicalization — only utm_* tracking params
    are stripped, so the lang variant stays its own group.

    Canonical form: lowercase host without leading www., scheme
    normalized to https, trailing slash and utm_* params dropped, via
    a regexp_replace chain kept to the Java/RE2 common subset. Then
    one groupBy canonical_url keeping min(doc_id) as representative.
    Plan: pure codegen string expressions + ONE shuffle on the
    canonical key — at 100 TB this is the map-side-combined exact
    dedup shape (f5/h12) with the canonicalizer fused into the scan.
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", canonical_url_col().alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


@query(
    "h13_quality_keep",
    section="H12,H17,E2",
    tags=("dedup", "llm-pipeline"),
    oracle=f"""
WITH {URL_CANON_CTE},
q AS (
  SELECT c.canonical_url, c.doc_id,
         round(CAST(len(list_distinct(string_split(d.text, ' ')))
                    AS DOUBLE)
               / len(string_split(d.text, ' ')), 6) AS unique_ratio
  FROM canon c JOIN documents d ON d.doc_id = c.doc_id
),
r AS (
  SELECT canonical_url, doc_id, unique_ratio,
         row_number() OVER (
             PARTITION BY canonical_url
             ORDER BY unique_ratio DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY canonical_url) AS n_docs
  FROM q
)
SELECT canonical_url,
       doc_id AS kept_doc_id,
       CAST(n_docs AS BIGINT) AS n_docs,
       unique_ratio AS kept_unique_ratio
FROM r WHERE rn = 1 AND n_docs >= 2
""",
)
def h13_quality_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup keep rule — the curation policy layered on
    top of group detection: when several crawls of the same canonical
    URL disagree (different extractions of one page), keep the
    highest-QUALITY copy, not the lowest doc_id. Groups come from the
    URL canonicalizer (h13_url_dedup's synthesis — members genuinely
    differ in text); quality is lexical diversity (unique-token
    ratio, the h17_quality_score signal); ties break on doc_id. Only
    groups with a real choice (n_docs >= 2) are emitted.

    Plan: canonicalize in the scan projection, ONE shuffle on the
    canonical key, keep-rule via a per-group WindowGroupLimit (rank
    <= 1 never materializes the full sorted group). This is the 100
    TB keep-rule shape for any grouping — swap the key for a MinHash
    cluster id and the score for a model-based quality column and the
    plan is unchanged.
    """
    d = table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    q = d.select(
        "doc_id",
        canonical_url_col().alias("canonical_url"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("unique_ratio"),
    )
    w = Window.partitionBy("canonical_url").orderBy(
        F.col("unique_ratio").desc(), "doc_id"
    )
    wc = Window.partitionBy("canonical_url")
    return (
        q.withColumn("rn", F.row_number().over(w))
        .withColumn("n_docs", F.count(F.lit(1)).over(wc))
        .where((F.col("rn") == 1) & (F.col("n_docs") >= 2))
        .select(
            "canonical_url",
            F.col("doc_id").alias("kept_doc_id"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("unique_ratio").alias("kept_unique_ratio"),
        )
    )


SIMJOIN_THRESHOLD = 0.4


@query(
    "h14_similarity_join",
    section="H14,H13,H11",
    tags=("dedup", "similarity"),
    oracle=f"""
WITH sh AS (
    SELECT doc_id,
           list_distinct(list_transform(range(len(toks) - 2),
               i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]))
               AS s
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    WHERE len(toks) >= 3
),
eg AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
-- lossless candidate generation, independent of the engine's prefix
-- filter: any pair with J >= t shares >= 1 shingle AND satisfies the
-- Jaccard length bound t*|B| <= |A| <= |B|/t, so no qualifying pair
-- can escape this block (a raw all-pairs cross product is minutes of
-- DuckDB at sf0.1; this is seconds at sf0.01 where the driver runs)
cand AS (
    SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
    FROM eg a JOIN eg b ON a.g = b.g AND a.doc_id < b.doc_id
             AND a.n >= {SIMJOIN_THRESHOLD} * b.n
             AND b.n >= {SIMJOIN_THRESHOLD} * a.n
)
SELECT c.da AS doc_a, c.db AS doc_b,
       round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
             / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))), 6)
         AS jaccard
FROM cand c JOIN sh sa ON c.da = sa.doc_id JOIN sh sb ON c.db = sb.doc_id
WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
      / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))
      >= {SIMJOIN_THRESHOLD}
""",
)
def h14_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-facing threshold similarity JOIN: every document pair with
    3-shingle Jaccard >= 0.4, with scores — the one-call entry point
    the MinHash (h13) + exact-Jaccard (h14) pieces compose into.

    Engine plan is the AllPairs/PPJoin-family **prefix filter**
    (Bayardo et al., WWW'07; public): order every doc's shingles by
    ascending global document frequency (rarest first, shingle string
    as tiebreak), keep only the first ``n - ceil(t*n) + 1`` as the
    doc's prefix, and equi-join on prefix shingles — any pair with
    J >= t must share a prefix element under a consistent global
    order, so candidates shrink to near-misses instead of n²; exact
    Jaccard then verifies candidates only. Deterministic (no hash
    functions), so unlike MinHash this plan is fully ORACLE-CHECKED:
    the DuckDB twin computes ground truth by brute force — if the
    prefix filter ever missed a qualifying pair, the hash would flip.

    100 TB shape: one shingle scan feeds frequencies + prefixes; the
    candidate join is an equi-join keyed on rare-first shingles
    (frequency-skew-resistant by construction — common shingles fall
    out of short prefixes); verification touches candidates only.
    """
    t = SIMJOIN_THRESHOLD
    sets = defer_unpersist(
        shingle_sets(table(spark, sf_dir, "documents")).persist()
    )
    return prefix_filter_pairs(sets, t)


def prefix_filter_pairs(sets: DataFrame, t: float) -> DataFrame:
    """AllPairs/PPJoin prefix-filter threshold join over a persisted
    (doc_id, shingles) DataFrame: returns (doc_a, doc_b, jaccard) for
    every pair with Jaccard >= ``t``. Deterministic — no hash
    functions — so callers can be fully oracle-checked. See
    h14_similarity_join for the plan rationale."""
    # global shingle document frequencies (the prefix order)
    freq = (
        sets.select(F.explode("shingles").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    # rare-first canonical order per doc, then cut to the prefix
    n = F.size(F.col("shingles"))
    p = (n - F.ceil(t * n.cast("double")) + 1).cast("int")
    ordered = (
        sets.select("doc_id", F.explode("shingles").alias("shingle"))
        .join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "shingle"))),
                lambda s: s["shingle"],
            ).alias("shingles")
        )
    )
    # Persisted: the candidate self-join below consumes prefixes on
    # BOTH sides, and unpersisted each side re-ran the whole prefix
    # pipeline — the freq aggregate (explode + groupBy shingle) AND
    # the rare-first per-doc sort (join by shingle + groupBy doc_id),
    # i.e. two shuffles and two corpus-wide aggregates duplicated per
    # query (verified in the captured plan: two expression-id families
    # of the same shingle/doc_id aggregates, no ReusedExchange). The
    # cache holds ≤ prefix-length rows per doc of (long, string) —
    # a bounded fraction of the caller's persisted shingle sets
    # (r14 optimization round, guide §2.4 — compute the proxy once).
    prefixes = defer_unpersist(
        ordered.select(
            "doc_id", F.explode(F.slice("shingles", 1, p)).alias("shingle")
        ).persist()
    )
    cand = (
        prefixes.alias("a")
        .join(
            prefixes.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("set_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("set_b"))
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size("set_a") + F.size("set_b") - inter
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= t)
    )


@query("h13_semantic_dedup", section="H13,H15,H16", tags=("dedup", "ml"))
def h13_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023 — public):
    k-means-cluster the embedding space, then search for near-identical
    pairs ONLY within clusters, dropping the higher-id member of every
    pair with cosine >= 0.4 (min-id keep rule, deterministic).

    Returns the DROP list: (vec_id, cluster_id, keeper_id, cos) where
    ``keeper_id`` is the lowest-id qualifying lower neighbor. Rows-only
    to the driver (the cluster assignment has no SQL twin — the
    centroids come from an iterative fit); teeth in
    tests/test_dedup.py: the drop set is re-verified pair-by-pair with
    numpy, injected exact duplicates are always caught (identical
    vectors share a cluster by construction), and recall vs the
    brute-force all-pairs drop set has a measured floor.

    100 TB shape: this is the point of SemDeDup — the O(n²) cosine
    search collapses to per-cluster blocks. ``k`` scales with corpus
    size (n/500 here) so expected cluster size stays bounded and total
    pair work stays ~linear; the cluster assignment itself is the
    ml_kmeans plan (centroid literals, pure codegen, one k-row shuffle
    per Lloyd round). The within-cluster pair join is an equi-join on
    cluster_id — shuffle-partitioned, never a cross join."""
    from spark_glove_spark.operators.clustering import _assign_expr, kmeans_fit

    e = defer_unpersist(
        parallelized(table(spark, sf_dir, "embeddings")).persist()
    )
    n = e.count()
    k = max(10, n // 500)
    centers, _ = kmeans_fit(e, k=k, max_iter=5, seed=42)
    assigned = e.select(
        "vec_id",
        F.col("embedding"),
        _assign_expr(centers, "embedding").alias("cluster_id"),
    )
    a = assigned.select(
        F.col("vec_id").alias("keeper_id"),
        F.col("embedding").alias("va"),
        "cluster_id",
    )
    b = assigned.select(
        F.col("vec_id").alias("vec_id"),
        F.col("embedding").alias("vb"),
        F.col("cluster_id").alias("cluster_b"),
    )
    cos = dot(F.col("va"), F.col("vb"))
    pairs = (
        a.join(
            b,
            (F.col("cluster_id") == F.col("cluster_b"))
            & (F.col("keeper_id") < F.col("vec_id")),
        )
        .where(cos >= 0.4)
        .select(
            "vec_id",
            "cluster_id",
            "keeper_id",
            F.round(cos, 6).alias("cos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy("keeper_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Portable-hash MinHash: the full sketch pipeline as a hash-matchable query.


_MH_HASHES = 8  # portable signature width (4 bands x 2 rows)
_MH_BANDS = 4


def mh_pair_ctes(src: str) -> str:
    """The portable-MinHash pipeline as a reusable CTE chain reading
    (doc_id, text) from CTE/table ``src`` and ending at ``mh_pairs``
    (doc_a, doc_b, jaccard >= 0.5) — generated from the same
    (_MH_HASHES, _MH_BANDS) constants as the Spark body so the two
    encodings cannot drift apart (the f8 MERGE_ORACLE single-source
    rule). Shared by the standalone twin's oracle and the
    pipeline_sketch_dedup funnel oracle."""
    mins = ",\n         ".join(
        f"min(md5('m{i}|' || s)) AS m{i}" for i in range(_MH_HASHES)
    )
    rows = _MH_HASHES // _MH_BANDS
    bands = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({cat}) AS bucket FROM sig".format(
            b=b,
            cat=" || ".join(f"m{b * rows + r}" for r in range(rows)),
        )
        for b in range(_MH_BANDS)
    )
    return f"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM {src}),
g AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
  FROM t WHERE len(toks) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i + 2), ' ') AS s
  FROM g
),
sig AS (
  SELECT doc_id,
         {mins}
  FROM sh GROUP BY doc_id
),
b AS (
  {bands}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
  FROM b a JOIN b b2
    ON a.band = b2.band AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id
),
sets AS (SELECT doc_id, list(s) AS ss, count(*) AS n FROM sh GROUP BY doc_id),
mh_pairs AS (
  SELECT c.doc_a, c.doc_b,
         round(CAST(len(list_filter(sa.ss, x -> list_contains(sb.ss, x))) AS DOUBLE)
               / (sa.n + sb.n
                  - len(list_filter(sa.ss, x -> list_contains(sb.ss, x)))),
               6) AS jaccard
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.doc_a
  JOIN sets sb ON sb.doc_id = c.doc_b
  WHERE round(CAST(len(list_filter(sa.ss, x -> list_contains(sb.ss, x))) AS DOUBLE)
              / (sa.n + sb.n
                 - len(list_filter(sa.ss, x -> list_contains(sb.ss, x)))),
              6) >= 0.5
)"""


def _mh_oracle() -> str:
    """DuckDB twin of h13_minhash_portable (see :func:`mh_pair_ctes`)."""
    return f"""
WITH {mh_pair_ctes('documents')}
SELECT doc_a, doc_b, jaccard FROM mh_pairs
"""


def portable_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingles) under the portable sketch's tokenization —
    distinct 3-token shingles, empty-shingle docs dropped."""
    return (
        docs
        .select(
            "doc_id",
            F.array_distinct(shingles(tokenize(F.col("text")), 3)).alias("shingles"),
        )
        .where(F.size("shingles") > 0)
    )


def portable_sig(sh: DataFrame) -> DataFrame:
    """(doc_id, shingles, m0..m{_MH_HASHES-1}): the portable-MinHash
    signature as a NARROW projection — each min-hash is
    array_min(transform(shingles, md5)) instead of the former
    explode + groupBy(doc_id) aggregation, which paid a full shuffle
    of the exploded shingle stream (~shingles-per-doc × rows) for
    mins a per-row fold computes in place. Values are identical:
    array_min and the min aggregate are both UTF8 binary mins over
    the same lowercase-hex md5 strings (r14 optimization round,
    guide §2.4 — remove shuffles outright). Exposed so incremental
    consumers (the streaming curate/dedup epochs) can checkpoint ONE
    frame carrying both the shingle sets and the signature."""

    def mh(i: int) -> Column:
        return F.array_min(
            F.transform(
                F.col("shingles"),
                lambda s: F.md5(F.concat(F.lit(f"m{i}|"), s)),
            )
        )

    # "*" keeps whatever the caller carries alongside (doc_id,
    # shingles) — the streaming curate epoch rides its quality-gate
    # columns through the SAME checkpointed frame, so gate + sketch
    # cost one materialization, not two.
    return sh.select(
        "*", *[mh(i).alias(f"m{i}") for i in range(_MH_HASHES)]
    )


def buckets_from_sig(sig: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) banding rows from a :func:`portable_sig`
    frame — band bucket = md5(concat of the band's mins), exploded to
    one row per band. Split from :func:`portable_band_buckets` so a
    checkpointed signature frame can derive buckets without
    recomputing the per-shingle md5 mins."""
    rows = _MH_HASHES // _MH_BANDS
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat(*[F.col(f"m{b * rows + r}") for r in range(rows)])
                        ).alias("bucket"),
                    )
                    for b in range(_MH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def portable_band_buckets(sh: DataFrame) -> DataFrame:
    """The portable-MinHash banding stage over a (doc_id, shingles)
    frame (:func:`portable_shingles`): (doc_id, band, bucket) rows
    under the module's (_MH_HASHES, _MH_BANDS) constants — md5-seeded
    min-hashes, band bucket = md5(concat of the band's mins). Shared
    by the verify-style pairs (:func:`portable_minhash_pairs`) and the
    bucketed exact-span pass (text_analysis.h17_span_dedup_bucketed),
    so every consumer blocks on the IDENTICAL buckets the hash-matched
    twin proves. Shuffle-free since the r14 optimization round: the
    signature is a projection (:func:`portable_sig`), so banding adds
    no Exchange to any consumer's plan."""
    return buckets_from_sig(portable_sig(sh))


def portable_band_candidates(docs: DataFrame) -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) sharing any band
    bucket — the block step of the portable sketch, without the
    Jaccard verify (consumers bring their own verify: exact Jaccard
    for near-dup, the exact-span pass for substring dedup)."""
    buckets = portable_band_buckets(portable_shingles(docs))
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def portable_minhash_pairs(docs: DataFrame) -> DataFrame:
    """The h13_minhash_portable pipeline body over an arbitrary
    (doc_id, text) frame — shared with pipeline_sketch_dedup so the
    cascade composes the IDENTICAL stages the standalone twin
    hash-checks. Returns (doc_a, doc_b, jaccard) pairs at J >= 0.5."""
    sh = defer_unpersist(portable_shingles(docs).persist())
    buckets = portable_band_buckets(sh)
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("set_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("set_b"))
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size("set_a") + F.size("set_b") - inter
    jac = F.round(inter.cast("double") / union, 6)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= 0.5)
    )


@query("h13_minhash_portable", section="H13,H11,G7", oracle=_mh_oracle())
def h13_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H13, hash-matchable form: the ENTIRE MinHash-LSH pipeline —

    signature, banding, candidate join, exact-Jaccard verify — built
    on engine-portable md5 so the DuckDB oracle replicates every
    stage bit-for-bit (the h5_glove_fit_micro treatment applied to
    the dedup sketch). min(md5('m{i}|' || shingle)) is a textbook
    MinHash under 8 seeded permutations: md5 hex is lowercase
    [0-9a-f] ASCII, so Spark's UTF8 binary min and DuckDB's varchar
    min induce the same order. 4 bands x 2 rows; band bucket =
    md5(concat of the band's mins); candidates = docs sharing any
    band bucket; verify = exact shingle-set Jaccard >= 0.5 on
    candidates only. Body shared via :func:`portable_minhash_pairs`.

    The production path (h13_minhash_neardup) keeps xxhash64 — one
    8-byte long per shingle instead of 8 md5 strings — this twin
    exists so the sketch MATH has a driver hash-match, not just
    pytest recall teeth. Same block-then-verify scale shape: no
    stage ever materializes the n^2 pair space."""
    return portable_minhash_pairs(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Portable-hash SimHash: the full fingerprint pipeline as a hash-matchable
# query (VERDICT r4 item 3 — the h13_minhash_portable treatment applied to
# SimHash).


_SH_BITS = 32  # portable fingerprint width
_SH_BLOCK_SHIFT = _SH_BITS - 8  # block on the top 8 bits
_SH_MAX_HAM = 6


def _sh_oracle() -> str:
    """DuckDB twin of h13_simhash_portable — generated from the same
    (_SH_BITS, _SH_BLOCK_SHIFT, _SH_MAX_HAM) constants so the two
    encodings cannot drift apart."""
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
  FROM t WHERE len(toks) >= 3
),
h AS (
  SELECT doc_id,
         ('0x' || substr(md5('sh|' || array_to_string(list_slice(toks, i, i + 2), ' ')), 1, 8))::BIGINT AS h
  FROM g
),
votes AS (
  SELECT doc_id, p,
         sum(CASE WHEN (h >> p) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h, range({_SH_BITS}) r(p)
  GROUP BY 1, 2
),
fp AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS fp
  FROM votes GROUP BY 1
),
fpi AS (SELECT doc_id, CAST(fp AS BIGINT) AS fp, CAST(fp AS BIGINT) >> {_SH_BLOCK_SHIFT} AS block FROM fp)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
FROM fpi a JOIN fpi b
  ON a.block = b.block AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= {_SH_MAX_HAM}
"""


@query("h13_simhash_portable", section="H13,G7", oracle=_sh_oracle())
def h13_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H13, hash-matchable form: the ENTIRE SimHash near-dup pipeline —

    per-token hash, bit-vote fold, fingerprint packing, block-and-
    verify Hamming join — on an engine-portable 32-bit hash so the
    DuckDB oracle replicates every stage bit-for-bit. The per-token
    hash is the first 8 hex chars of md5('sh|'||feature) read as an
    integer: Spark ``conv(substr, 16, 10)`` and DuckDB
    ``('0x'||substr)::BIGINT`` produce the identical value in
    [0, 2^32). Features are 3-token shingles WITH multiplicity (the
    fixture's 31-word vocabulary makes unigram fingerprints collapse —
    measured 3,823 pairs at hamming<=6 vs 14 with shingles at sf0.01;
    shingle features keep blocks discriminative, the same choice the
    minhash twin makes). Bit p's vote is the exact integer sum of
    (2*bit - 1) over all shingle occurrences; fingerprint bit p is
    set iff the vote is strictly positive. Blocks
    are the top 8 fingerprint bits; verification is bit_count(xor) <=
    _SH_MAX_HAM — all integer ops with identical semantics in both
    engines.

    The production path (h13_simhash_neardup) keeps xxhash64 at 64
    bits with the vectorized numpy vote fold; this twin exists so the
    SimHash MATH carries a driver hash-match instead of rows-only
    status. Scale shape is unchanged: one explode + one grouped
    aggregate per doc, then a block equi-join — never n^2 pairs."""
    d = parallelized(table(spark, sf_dir, "documents"))
    ex = d.select(
        "doc_id",
        F.explode(shingles(tokenize(F.col("text")), 3)).alias("tok"),
    )
    h = (
        F.conv(F.substring(F.md5(F.concat(F.lit("sh|"), F.col("tok"))), 1, 8), 16, 10)
        .cast("long")
    )
    one = F.lit(1).cast("long")
    votes = ex.select("doc_id", h.alias("h")).groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), p).bitwiseAND(one) == 1, 1).otherwise(-1)
            ).alias(f"v{p}")
            for p in range(_SH_BITS)
        ]
    )
    fp = sum(
        (
            F.when(F.col(f"v{p}") > 0, F.shiftleft(one, p)).otherwise(F.lit(0).cast("long"))
            for p in range(_SH_BITS)
        ),
        start=F.lit(0).cast("long"),
    )
    fpd = votes.select("doc_id", fp.alias("fp")).withColumn(
        "block", F.shiftright("fp", _SH_BLOCK_SHIFT)
    )
    a = fpd.select(
        F.col("doc_id").alias("doc_a"),
        F.col("fp").alias("fp_a"),
        F.col("block").alias("block_a"),
    )
    b = fpd.select(
        F.col("doc_id").alias("doc_b"),
        F.col("fp").alias("fp_b"),
        F.col("block").alias("block_b"),
    )
    return (
        a.join(
            b,
            (F.col("block_a") == F.col("block_b")) & (F.col("doc_a") < F.col("doc_b")),
        )
        .withColumn(
            "hamming", hamming64(F.col("fp_a"), F.col("fp_b")).cast("long")
        )
        .where(F.col("hamming") <= _SH_MAX_HAM)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Portable SemDeDup: cluster-then-pairwise semantic dedup as a
# hash-matchable query (VERDICT r4 item 3 continued).


_SDP_K = 8  # clusters: centroids are the quantized vectors of vec_id < K
_SDP_SCALE = 1000
# cosine threshold 0.4, compared WITHOUT division: cos(a,b) >= 0.4
# <=>  num > 0  AND  25*num^2 >= 4*nn_a*nn_b   (0.4^2 = 4/25)
_SDP_NUM2_MULT = 25
_SDP_NN_MULT = 4


def _sdp_oracle() -> str:
    return f"""
WITH q AS (
  SELECT vec_id, i - 1 AS d,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_SDP_SCALE} + 0.5) AS BIGINT) AS v
  FROM embeddings, range(1, 65) r(i)
),
cents AS (SELECT vec_id AS cent_id, d, v AS c FROM q WHERE vec_id < {_SDP_K}),
dist AS (
  SELECT q.vec_id, cents.cent_id,
         CAST(sum((q.v - cents.c) * (q.v - cents.c)) AS BIGINT) AS dist
  FROM q JOIN cents ON q.d = cents.d GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, cent_id AS cluster FROM (
    SELECT vec_id, cent_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cent_id) AS rn
    FROM dist
  ) WHERE rn = 1
),
norm AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS nn FROM q GROUP BY 1),
pairs AS (
  SELECT a.cluster, a.vec_id AS ka, b.vec_id AS kb,
         CAST(sum(qa.v * qb.v) AS BIGINT) AS num
  FROM assign a
  JOIN assign b ON b.cluster = a.cluster AND a.vec_id < b.vec_id
  JOIN q qa ON qa.vec_id = a.vec_id
  JOIN q qb ON qb.vec_id = b.vec_id AND qb.d = qa.d
  GROUP BY 1, 2, 3
),
dup AS (
  SELECT p.cluster, p.ka, p.kb
  FROM pairs p
  JOIN norm na ON na.vec_id = p.ka
  JOIN norm nb ON nb.vec_id = p.kb
  WHERE p.num > 0
    AND {_SDP_NUM2_MULT} * p.num * p.num >= {_SDP_NN_MULT} * na.nn * nb.nn
)
SELECT kb AS vec_id, CAST(min(ka) AS BIGINT) AS witness,
       CAST(min(cluster) AS BIGINT) AS cluster
FROM dup GROUP BY 1
"""


@query("h13_semdedup_portable", section="H13,H15,H16", oracle=_sdp_oracle())
def h13_semdedup_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023 — public), hash-matchable form: the
    cluster-then-pairwise semantic dedup pipeline — coarse assignment
    to fixed centroids, within-cluster pairwise similarity, drop any
    vector with a lower-id witness above the cosine threshold — on
    exact integer arithmetic. The threshold test avoids division
    entirely: cos >= 0.4 iff num > 0 and 25*num^2 >= 4*nn_a*nn_b,
    all int64 (magnitudes bounded: num <= 64e6 for unit-scale
    embeddings, so 25*num^2 <= 1e17 < 2^63). Output: each dropped
    vector with its smallest witness and cluster.

    The production path (h13_semantic_dedup) keeps Lloyd-trained
    k ∝ n blocks + float cosine; this twin certifies the SEMANTICS
    (block-then-pairwise, keep-lowest-id policy) with a driver hash.
    Scale shape unchanged: pairs only within clusters (n^2/k per
    cluster expected), never across the corpus."""
    e = parallelized(table(spark, sf_dir, "embeddings"))
    qv = F.transform(
        "embedding",
        lambda x: F.floor(
            x.cast("double") * F.lit(float(_SDP_SCALE)) + F.lit(0.5)
        ),
    )
    base = defer_unpersist(e.select("vec_id", qv.alias("qv")).persist())
    cents = base.where(F.col("vec_id") < _SDP_K).select(
        F.col("vec_id").alias("cent_id"), F.col("qv").alias("cv")
    )
    zero = F.lit(0).cast("long")
    d2 = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: (x - y) * (x - y)),
        zero,
        lambda acc, x: acc + x,
    )
    nn = F.aggregate(F.transform("qv", lambda x: x * x), zero, lambda a, x: a + x)
    dists = base.crossJoin(F.broadcast(cents)).select(
        "vec_id", "qv", "cent_id", d2.alias("dist")
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cent_id")
    assign = (
        dists.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "qv", F.col("cent_id").alias("cluster"), nn.alias("nn"))
        .localCheckpoint(eager=True)  # both pair sides read it (planlint)
    )
    a = assign.select(
        "cluster",
        F.col("vec_id").alias("ka"),
        F.col("qv").alias("qa"),
        F.col("nn").alias("na"),
    )
    b = assign.select(
        F.col("cluster").alias("cb"),
        F.col("vec_id").alias("kb"),
        F.col("qv").alias("qb"),
        F.col("nn").alias("nb"),
    )
    num = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y), zero, lambda acc, x: acc + x
    )
    dup = (
        a.join(b, (F.col("cluster") == F.col("cb")) & (F.col("ka") < F.col("kb")))
        .select("cluster", "ka", "kb", "na", "nb", num.alias("num"))
        .where(
            (F.col("num") > 0)
            & (
                F.lit(_SDP_NUM2_MULT) * F.col("num") * F.col("num")
                >= F.lit(_SDP_NN_MULT) * F.col("na") * F.col("nb")
            )
        )
    )
    return dup.groupBy(F.col("kb").alias("vec_id")).agg(
        F.min("ka").alias("witness"), F.min("cluster").alias("cluster")
    )


def _mh_est_oracle() -> str:
    eq = " + ".join(
        f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END"
        for i in range(_MH_HASHES)
    )
    return f"""
WITH {mh_pair_ctes('documents')},
sigs AS (SELECT * FROM sig)
SELECT c.doc_a, c.doc_b,
       round(CAST(({eq}) AS DOUBLE) / {_MH_HASHES}, 6) AS jaccard_est,
       round(CAST(len(list_filter(st_a.ss, x -> list_contains(st_b.ss, x)))
                  AS DOUBLE)
             / (st_a.n + st_b.n
                - len(list_filter(st_a.ss, x -> list_contains(st_b.ss, x)))),
             6) AS jaccard_exact,
       round(abs(CAST(({eq}) AS DOUBLE) / {_MH_HASHES}
                 - CAST(len(list_filter(st_a.ss, x -> list_contains(st_b.ss, x)))
                        AS DOUBLE)
                   / (st_a.n + st_b.n
                      - len(list_filter(st_a.ss,
                                        x -> list_contains(st_b.ss, x))))),
             6) AS abs_err
FROM cand c
JOIN sigs sa ON sa.doc_id = c.doc_a
JOIN sigs sb ON sb.doc_id = c.doc_b
JOIN sets st_a ON st_a.doc_id = c.doc_a
JOIN sets st_b ON st_b.doc_id = c.doc_b
"""


@query(
    "h13_minhash_jaccard_estimate",
    section="H13,H14,G7",
    tags=("dedup", "llm-pipeline"),
    oracle=_mh_est_oracle(),
)
def h13_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash ESTIMATOR itself, hash-checked against ground
    truth: for every banded candidate pair, the sketch estimate
    Ĵ = (matching mins)/k alongside the exact shingle-set Jaccard and
    the absolute error — the query a pipeline owner runs to calibrate
    the sketch (is k=8 enough at my dedup threshold? what error band
    do my bands imply?) before trusting it at 100 TB, where only the
    estimate is affordable. The unbiasedness of per-permutation
    min-hash agreement (P[min_a = min_b] = J exactly) is the
    textbook property; this query makes the error VISIBLE per pair
    rather than assumed.

    Scale: identical cost to the portable twin — signatures are one
    aggregate, candidates come from the band join, and the exact side
    only ever evaluates on candidates (at true scale one samples
    candidates for calibration; the fixture verifies them all)."""
    docs = table(spark, sf_dir, "documents")
    sh = defer_unpersist(portable_shingles(docs).persist())
    buckets = portable_band_buckets(sh)
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    sig = ex.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"m{i}|"), F.col("s")))).alias(f"m{i}")
            for i in range(_MH_HASHES)
        ]
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(_MH_HASHES)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(_MH_HASHES)],
    )
    seta = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("set_a"))
    setb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("set_b"))
    matches = sum(
        (
            F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
            for i in range(1, _MH_HASHES)
        ),
        start=F.when(F.col("a0") == F.col("b0"), 1).otherwise(0),
    )
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size("set_a") + F.size("set_b") - inter
    est = F.round(matches.cast("double") / _MH_HASHES, 6)
    exact = F.round(inter.cast("double") / union, 6)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(seta, "doc_a")
        .join(setb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            est.alias("jaccard_est"),
            exact.alias("jaccard_exact"),
            F.round(
                F.abs(
                    matches.cast("double") / _MH_HASHES
                    - inter.cast("double") / union
                ),
                6,
            ).alias("abs_err"),
        )
    )


def _containment_oracle() -> str:
    return f"""
WITH {mh_pair_ctes('documents')},
inter AS (
  SELECT c.doc_a, c.doc_b,
         len(list_filter(sa.ss, x -> list_contains(sb.ss, x))) AS i,
         sa.n AS na, sb.n AS nb
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.doc_a
  JOIN sets sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b,
       round(CAST(i AS DOUBLE) / na, 6) AS containment_a,
       round(CAST(i AS DOUBLE) / nb, 6) AS containment_b,
       round(CAST(i AS DOUBLE) / (na + nb - i), 6) AS jaccard,
       CAST(CASE WHEN CAST(i AS DOUBLE) / least(na, nb) >= 0.9
            THEN 1 ELSE 0 END AS BIGINT) AS subset_dup
FROM inter
WHERE CAST(i AS DOUBLE) / least(na, nb) >= 0.5
"""


@query(
    "h13_containment_dedup",
    section="H13,H14,H11",
    tags=("dedup", "llm-pipeline"),
    oracle=_containment_oracle(),
)
def h13_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle CONTAINMENT scoring (Broder 1997's second resemblance
    measure, public) over the banded candidates — the dedup dimension
    Jaccard is blind to: a short document quoted whole inside a long
    one has LOW Jaccard (the union is big) but containment_short ≈ 1.
    Training-data pipelines need this to catch quote-inclusion and
    wrapper-page duplication that symmetric similarity misses. Per
    candidate pair: both directed containments (|A∩B|/|A|, /|B|), the
    Jaccard for contrast, and a subset_dup flag at max-containment
    ≥ 0.9; pairs kept at max-containment ≥ 0.5.

    100 TB: identical cost shape to the minhash twin — the candidate
    set comes from the SAME band join (blocking is shared work), and
    the exact intersection only evaluates on candidates. One-sided
    containment at scale uses the asymmetric-sketch refinement
    (min-hash of the SMALLER set against the other's full set), the
    documented escalation."""
    docs = table(spark, sf_dir, "documents")
    sh = defer_unpersist(portable_shingles(docs).persist())
    buckets = portable_band_buckets(sh)
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("set_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("set_b"))
    inter = F.size(F.array_intersect("set_a", "set_b")).cast("double")
    na = F.size("set_a").cast("double")
    nb = F.size("set_b").cast("double")
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(inter / F.least(na, nb) >= 0.5)
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / na, 6).alias("containment_a"),
            F.round(inter / nb, 6).alias("containment_b"),
            F.round(inter / (na + nb - inter), 6).alias("jaccard"),
            (inter / F.least(na, nb) >= 0.9).cast("long").alias("subset_dup"),
        )
    )
