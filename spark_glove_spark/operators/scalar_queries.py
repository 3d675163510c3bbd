"""Scalar function surface — declared queries for SURVEY.md §2.G.

All pure Column expressions (JVM-side, whole-stage codegen). The
oracle SQL uses DuckDB's spelling of the same function where names
differ (ln/log, strftime/date_format, list_*/array_*) — semantics are
matched, not syntax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_glove_spark.registry import query
from spark_glove_spark.sources import table


@query(
    "g1_string_core",
    section="G1",
    oracle="""
SELECT c_custkey AS custkey,
       lower(c_name) AS name_lower,
       CAST(length(c_name) AS BIGINT) AS name_len,
       substring(c_name, 10, 9) AS key_digits,
       replace(c_name, 'Customer#', 'CUST-') AS renamed,
       concat_ws('|', c_mktsegment, c_name) AS tagged,
       trim(concat('  ', c_mktsegment, ' ')) AS trimmed
FROM customer
""",
)
def g1_string_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: lower/length/substring/replace/concat_ws/trim."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.lower("c_name").alias("name_lower"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 10, 9).alias("key_digits"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("CUST-")).alias(
            "renamed"
        ),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "trimmed"
        ),
    )


@query(
    "g2_regex",
    section="G2",
    oracle=r"""
SELECT p_partkey,
       regexp_extract(p_name, '^(\w+) (\w+)$', 1) AS color,
       regexp_extract(p_name, '^(\w+) (\w+)$', 2) AS item,
       regexp_replace(p_brand, '#\d+$', '') AS brand_stem,
       CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS BIGINT) AS brand_num
FROM part
""",
)
def g2_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: regexp_extract groups + regexp_replace."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+) (\w+)$", 1).alias("color"),
        F.regexp_extract("p_name", r"^(\w+) (\w+)$", 2).alias("item"),
        F.regexp_replace("p_brand", r"#\d+$", "").alias("brand_stem"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("long").alias("brand_num"),
    )


@query(
    "g3_edit_distance",
    section="G3",
    oracle="""
SELECT a.n_name AS name_a, b.n_name AS name_b,
       CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS dist
FROM nation a
JOIN nation b ON a.n_nationkey < b.n_nationkey
WHERE levenshtein(a.n_name, b.n_name) <= 2
""",
)
def g3_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3: Levenshtein fuzzy-match over name pairs (self-join keyed

    a<b so each unordered pair appears once)."""
    n = table(spark, sf_dir, "nation")
    a = n.select(F.col("n_nationkey").alias("ka"), F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_nationkey").alias("kb"), F.col("n_name").alias("name_b"))
    return (
        a.join(b, F.col("ka") < F.col("kb"))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .where(F.col("dist") <= 2)
        .select("name_a", "name_b", "dist")
    )


@query(
    "g4_datetime",
    section="G4",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mth,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m
FROM orders
WHERE o_orderkey % 10 = 0
""",
)
def g4_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: year/month/quarter/date_trunc/datediff/add_months. Dates are

    rendered as strings so the comparison is type- and TZ-proof."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mth"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).cast("long").alias(
            "days_since_epoch_start"
        ),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus_3m"),
    )


@query(
    "g5_math",
    section="G5",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(abs(l_discount - l_tax), 6) AS abs_diff,
       round(ln(l_extendedprice), 6) AS log_price,
       round(pow(l_quantity, 2), 6) AS qty_sq,
       round(sqrt(l_extendedprice), 6) AS sqrt_price,
       round(exp(l_discount), 6) AS exp_disc,
       round(least(l_discount, l_tax), 6) AS lo,
       round(greatest(l_discount, l_tax), 6) AS hi
FROM lineitem
WHERE l_orderkey % 20 = 0
""",
)
def g5_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: the math kernel needed by f(x) and the training loss —

    abs/log/pow/sqrt/exp/least/greatest (deterministic IEEE ops, no
    accumulation, so round(6) is belt-and-braces)."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 20 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - F.col("l_tax")), 6).alias("abs_diff"),
        F.round(F.log("l_extendedprice"), 6).alias("log_price"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.least("l_discount", "l_tax"), 6).alias("lo"),
        F.round(F.greatest("l_discount", "l_tax"), 6).alias("hi"),
    )


@query(
    "g6_array_core",
    section="G6",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       toks[1] AS first_token,
       toks[-1] AS last_token,
       array_to_string(list_slice(toks, 1, 3), ' ') AS first3,
       CAST(list_contains(toks, 'spark') AS BIGINT) AS has_spark,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique,
       array_to_string(list_sort(list_distinct(list_slice(toks, 1, 5))), ',')
         AS first5_sorted,
       array_to_string(flatten([list_slice(toks, 1, 2), list_slice(toks, 3, 4)]), ' ')
         AS first4_via_flatten,
       CAST(list_sum(generate_series(1, len(toks))) AS BIGINT) AS pos_sum
FROM t
""",
)
def g6_array_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6: element_at/slice/contains/distinct/sort_array/flatten/
    sequence — the token-stream toolkit. Arrays are folded to strings
    or exact ints for hash-stable output."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
        F.concat_ws(" ", F.slice(toks, 1, 3)).alias("first3"),
        F.array_contains(toks, "spark").cast("long").alias("has_spark"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
        F.concat_ws(
            " ", F.flatten(F.array(F.slice(toks, 1, 2), F.slice(toks, 3, 2)))
        ).alias("first4_via_flatten"),
        F.aggregate(
            F.sequence(F.lit(1), F.size(toks)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("pos_sum"),
        F.concat_ws(",", F.sort_array(F.array_distinct(F.slice(toks, 1, 5)))).alias(
            "first5_sorted"
        ),
    )


@query(
    "g7_content_hash",
    section="G7,H12",
    oracle="""
SELECT doc_id, sha256(trim(lower(text))) AS content_sha
FROM documents
WHERE doc_id % 7 = 0
""",
)
def g7_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7: stable cross-engine content hash (sha256 of normalized text)

    — the exact-dedup key (H12). xxhash64 is the cheap in-engine
    variant but engine-specific, so sha2 is the declared one."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0)
    return d.select(
        "doc_id", F.sha2(F.trim(F.lower(F.col("text"))), 256).alias("content_sha")
    )


@query(
    "g8_higher_order",
    section="G8",
    oracle="""
SELECT vec_id,
       round(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                         (a, b) -> a + b), 6) AS vec_sum,
       round(sqrt(list_reduce(list_transform(embedding,
                                             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                              (a, b) -> a + b)), 6) AS l2_norm,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
FROM embeddings
WHERE vec_id % 5 = 0
""",
)
def g8_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G8: transform/filter/aggregate over vectors — vector arithmetic

    with zero UDFs. Both engines left-fold the array in order with
    double accumulation, so sums match bit-for-bit before rounding."""
    e = table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 5 == 0)
    vec = F.col("embedding")
    dsum = F.aggregate(
        vec, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    sq_sum = F.aggregate(
        vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return e.select(
        "vec_id",
        F.round(dsum, 6).alias("vec_sum"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.size(F.filter(vec, lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@query(
    "g9_json",
    section="G9",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       count(*) AS n,
       count(*) AS n_struct_parse_match,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1
""",
)
def g9_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G9: JSON extraction both ways — path-at-a-time
    (get_json_object) and schema-full parse (from_json, the 100 TB
    route: ONE parse per row however many fields you read). The two
    must agree on every row (n_struct_parse_match == n, oracle-checked
    against a plain count)."""
    e = table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k LONG")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .withColumn("k_struct", parsed.getField("k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("k_struct").eqNullSafe(F.col("k")), 1)).alias(
                "n_struct_parse_match"
            ),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "g10_map_ops",
    section="G10",
    oracle="""
SELECT event_id,
       event_type AS type_from_map,
       CAST(2 AS BIGINT) AS n_keys
FROM events
WHERE event_id % 13 = 0
""",
)
def g10_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G10: build a map, read it back via element_at/map_keys. The

    oracle states the expected RESULT (round-trip identity) — DuckDB's
    map syntax differs but the semantics under check are Spark's."""
    e = table(spark, sf_dir, "events").where(F.col("event_id") % 13 == 0)
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("type_from_map"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
    )


@query(
    "g11_struct_ops",
    section="G11",
    oracle="""
SELECT o_orderkey,
       o_orderstatus AS status,
       round(o_totalprice, 2) AS price
FROM orders
WHERE o_orderkey % 17 = 0
""",
)
def g11_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G11: pack into a struct and project nested fields back out

    (round-trip identity as the checkable result)."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 17 == 0)
    s = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.round("o_totalprice", 2).alias("price"),
    )
    return o.withColumn("s", s).select(
        "o_orderkey",
        F.col("s.status").alias("status"),
        F.col("s.price").alias("price"),
    )


@query(
    "g13_url_functions",
    section="G1,G2",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/'
             || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
  FROM documents
)
SELECT doc_id,
       regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
       regexp_extract(url, '^([a-z]+):', 1) AS scheme
FROM u
""",
)
def g13_url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition — the first step of every web-corpus pipeline
    (host-level dedup, domain quality lists, path routing): Spark's
    native ``parse_url`` (HOST / PATH / QUERY param / PROTOCOL, all
    codegen'd) over deterministically synthesized URLs; the oracle
    decomposes the same URLs with equivalent regexes, proving the
    built-in's semantics on this grammar. At 100 TB the host column
    becomes the partition/dedup key (one groupBy host feeds domain
    blocklists and per-site rate stats).
    """
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias(
            "lang_param"
        ),
        F.lower(F.parse_url("url", F.lit("PROTOCOL"))).alias("scheme"),
    )


@query(
    "g14_bitwise_agg",
    section="G5,D1",
    oracle="""
SELECT CAST(user_id % 8 AS BIGINT) AS grp,
       bit_and(event_id) AS all_bits,
       bit_or(event_id) AS any_bits,
       bit_xor(event_id) AS parity_bits,
       CAST(sum(bit_count(event_id)) AS BIGINT) AS total_popcount
FROM events
GROUP BY 1
""",
)
def g14_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AGGREGATES (bit_and / bit_or / bit_xor per group, plus
    summed popcounts) — the flag-mask rollup primitive: presence
    masks union with bit_or, required-capability masks intersect with
    bit_and, xor gives parity/checksum semantics. All are
    single-pass, map-side-combinable, and associative-commutative, so
    they merge like sums at any scale — the same mergeability story
    as the CMS but for bit lattices.
    """
    e = table(spark, sf_dir, "events")
    return e.groupBy(
        (F.col("user_id") % 8).cast("long").alias("grp")
    ).agg(
        F.bit_and("event_id").alias("all_bits"),
        F.bit_or("event_id").alias("any_bits"),
        F.bit_xor("event_id").alias("parity_bits"),
        F.sum(F.bit_count("event_id")).cast("long").alias(
            "total_popcount"
        ),
    )


@query(
    "g15_try_semantics",
    section="G1,G5,B4",
    oracle="""
SELECT doc_id,
       TRY_CAST(lang AS INTEGER) AS lang_as_int,
       TRY_CAST(CAST(n_chars AS VARCHAR) AS INTEGER) AS chars_roundtrip,
       n_chars / nullif(doc_id % 5, 0) AS safe_ratio,
       CASE WHEN n_chars % 3 = 0 THEN NULL
            ELSE CAST(n_chars AS DOUBLE) / (n_chars % 3) END AS mixed_div
FROM documents
""",
)
def g15_try_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_* semantics — the ANSI-mode safety valves (Spark 4 runs
    ANSI ON by default, where a bad cast or division by zero KILLS
    the job): ``try_cast`` turns unparseable input into NULL instead
    of an exception, ``try_divide`` nulls division by zero. A 100 TB
    ingest keeps strict ANSI for the math that must not silently
    corrupt, and wraps exactly the columns fed by untrusted input in
    TRY_* — per-expression opt-out, not a global ANSI off. The oracle
    mirrors with DuckDB's TRY_CAST and nullif-guarded division.
    """
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr("try_cast(lang AS int)").alias("lang_as_int"),
        F.expr(
            "try_cast(cast(n_chars AS string) AS int)"
        ).alias("chars_roundtrip"),
        F.try_divide(F.col("n_chars"), F.col("doc_id") % 5).alias(
            "safe_ratio"
        ),
        F.try_divide(
            F.col("n_chars").cast("double"), F.col("n_chars") % 3
        ).alias("mixed_div"),
    )


@query(
    "g16_json_construct",
    section="G9,E2,D7",
    oracle="""
WITH r AS (
  SELECT event_type, event_id,
         row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
  FROM events
),
top3 AS (
  SELECT event_type, to_json(list_sort(list(event_id))) AS ids_json
  FROM r WHERE rn <= 3 GROUP BY 1
),
agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS ksum
  FROM events GROUP BY 1
)
SELECT a.event_type, a.n, a.ksum,
       to_json({'event_type': a.event_type, 'n': a.n, 'ksum': a.ksum})
         AS payload,
       t.ids_json
FROM agg a JOIN top3 t USING (event_type)
""",
)
def g16_json_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G9 outbound: JSON CONSTRUCTION — ``to_json`` over a struct (the
    event-summary envelope an export/API sink would emit) and over an
    array (the compact id-list form). Spark's JSON rendering
    (``{"k":v}``, no spaces, field order = struct order) matches
    DuckDB's ``to_json`` byte-for-byte on integer/string fields, so
    the construction itself is oracle-checked, not just the parse
    path (g9_json). Integers only in the payload — float rendering is
    engine-specific and stays out of string-compared JSON.

    100 TB shape: the struct render is per-row codegen; the id-list
    arrays are bounded to the per-group top-3 BEFORE collect_list
    (WindowGroupLimit prunes the rest), so no unbounded array ever
    materializes."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum(k).alias("ksum")
    )
    w = Window.partitionBy("event_type").orderBy("event_id")
    top3 = (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .groupBy("event_type")
        .agg(
            F.to_json(F.array_sort(F.collect_list("event_id"))).alias(
                "ids_json"
            )
        )
    )
    return agg.join(top3, "event_type").select(
        "event_type",
        "n",
        "ksum",
        F.to_json(F.struct("event_type", "n", "ksum")).alias("payload"),
        "ids_json",
    )
