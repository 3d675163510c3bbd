"""Relational substrate — declared queries for SURVEY.md §2.B–§2.F.

Each query is the idiomatic Catalyst-friendly formulation: filters and
projections sit directly on the scan (pushdown), dimension joins are
explicitly broadcast, aggregations rely on partial+final HashAggregate,
global top-k on TakeOrderedAndProject. Doubles that accumulate across
rows are rounded (money sums to 2 — fp error at sf0.1 is ~1e-4 on 1e8
magnitudes; averages to 4) so order-insensitive hashing is stable.

Scale notes are inline per query: what shuffles, what broadcasts, what
would change at 100 TB (usually: nothing — these shapes are the ones
AQE + whole-stage codegen already execute well).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_glove_spark.registry import query
from spark_glove_spark.sources import table


# --------------------------------------------------------------------------
# B. Projection / filter / predicates
# --------------------------------------------------------------------------


@query(
    "b1_projection",
    section="B1",
    oracle="""
SELECT c_custkey AS custkey,
       upper(c_name) AS name_upper,
       round(c_acctbal * 2, 2) AS doubled_bal
FROM customer
""",
)
def b1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: select / derive / rename. Column pruning reaches the parquet

    scan — ReadSchema lists exactly three columns. (The derived column
    doubles rather than scales by 1.1: a 2-decimal value × 1.1 lands
    exactly on .xx5 rounding ties, where Spark HALF_UPs and DuckDB
    HALF_EVENs — ×2 is exact in binary, so no tie can occur.)"""
    return table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.upper("c_name").alias("name_upper"),
        F.round(F.col("c_acctbal") * 2, 2).alias("doubled_bal"),
    )


@query(
    "b2_filter_comparisons",
    section="B2",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20
  AND l_extendedprice > 20000
  AND l_returnflag IN ('A', 'R')
""",
)
def b2_filter_comparisons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: <,BETWEEN,IN conjunctions — all pushed to parquet row-group

    filters (PushedFilters in explain)."""
    li = table(spark, sf_dir, "lineitem")
    return li.where(
        F.col("l_quantity").between(10, 20)
        & (F.col("l_extendedprice") > 20000)
        & F.col("l_returnflag").isin("A", "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "b3_filter_patterns",
    section="B3,G2",
    oracle="""
SELECT p_partkey, p_name, p_brand, p_type
FROM part
WHERE p_type LIKE '%AND%'
   OR p_name LIKE 'red%'
   OR regexp_matches(p_brand, '^Brand#1[0-9]$')
""",
)
def b3_filter_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: LIKE / prefix / regex predicates."""
    p = table(spark, sf_dir, "part")
    return p.where(
        F.col("p_type").like("%AND%")
        | F.col("p_name").like("red%")
        | F.col("p_brand").rlike(r"^Brand#1[0-9]$")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@query(
    "b4_null_handling",
    section="B4",
    oracle="""
SELECT l_orderkey, l_linenumber,
       nullif(l_discount, 0.0) AS disc_or_null,
       coalesce(nullif(l_discount, 0.0), -1.0) AS disc_defaulted,
       CAST(nullif(l_discount, 0.0) IS NULL AS BIGINT) AS is_free,
       CAST((nullif(l_discount, 0.0) IS NOT DISTINCT FROM nullif(l_tax, 0.0)) AS BIGINT)
         AS disc_eq_tax_nullsafe
FROM lineitem
WHERE l_quantity < 3
""",
)
def b4_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: nullif / coalesce / IS NULL / null-safe equality. Fixtures

    carry no physical NULLs, so nulls are derived (nullif) — the
    operator surface is exercised identically."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_quantity") < 3)
    disc = F.nullif(F.col("l_discount"), F.lit(0.0))
    tax = F.nullif(F.col("l_tax"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc.alias("disc_or_null"),
        F.coalesce(disc, F.lit(-1.0)).alias("disc_defaulted"),
        disc.isNull().cast("long").alias("is_free"),
        disc.eqNullSafe(tax).cast("long").alias("disc_eq_tax_nullsafe"),
    )


@query(
    "b5_case_when",
    section="B5",
    oracle="""
SELECT CASE WHEN o_orderstatus = 'F' THEN 'finished'
            WHEN o_orderstatus = 'O' THEN 'open'
            ELSE 'pending' END AS status_label,
       CASE WHEN o_totalprice >= 300000 THEN 'big'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'small' END AS size_bucket,
       count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY 1, 2
""",
)
def b5_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: CASE WHEN buckets feeding an aggregation."""
    o = table(spark, sf_dir, "orders")
    status = (
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("pending")
    )
    size = (
        F.when(F.col("o_totalprice") >= 300000, "big")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("small")
    )
    return (
        o.groupBy(status.alias("status_label"), size.alias("size_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# --------------------------------------------------------------------------
# C. Joins
# --------------------------------------------------------------------------


@query(
    "c1_broadcast_dim_join",
    section="C1",
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation,
       count(*) AS n_customers,
       round(sum(c.c_acctbal), 2) AS total_bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
""",
)
def c1_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: fact ⋈ broadcast dims. nation/region are tiny forever (25/5

    rows at every sf) — explicit broadcast() makes the plan shuffle-free
    on the build side at any scale; only the final groupBy shuffles."""
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "c2_shuffle_join",
    section="C2",
    oracle="""
SELECT o.o_orderpriority AS priority,
       count(*) AS n_lines,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderstatus = 'F'
GROUP BY 1
""",
)
def c2_shuffle_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: large ⋈ large on the natural key. Both sides shuffle on

    orderkey (SMJ/SHJ — AQE decides, and converts to broadcast at small
    sf); the o_orderstatus filter is pushed below the join so the
    shuffled build side is ~1/3 of orders. At 100 TB this is the
    bucketing candidate: co-locating both tables on orderkey removes
    the shuffle entirely."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@query(
    "c3_left_outer_join",
    section="C3",
    oracle="""
SELECT c.c_custkey AS custkey,
       count(o.o_orderkey) AS n_orders,
       round(coalesce(sum(o.o_totalprice), 0.0), 2) AS spend
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY 1
""",
)
def c3_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: left outer preserving order-less customers (count=0 rows)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(F.col("c_custkey").alias("custkey"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("spend"),
        )
    )


@query(
    "c3_full_outer_join",
    section="C3",
    oracle="""
WITH a AS (SELECT c_nationkey AS k, count(*) AS n_cust
           FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS k, count(*) AS n_supp
           FROM supplier GROUP BY 1)
SELECT coalesce(a.k, s.k) AS nationkey,
       coalesce(n_cust, 0) AS n_cust,
       coalesce(n_supp, 0) AS n_supp
FROM a FULL OUTER JOIN s ON a.k = s.k
""",
)
def c3_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: full outer — nations present on either side survive."""
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, "k", "full").select(
        F.col("k").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "c4_semi_join",
    section="C4",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
)
def c4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: EXISTS as left-semi — no row multiplication, build side only

    carries the join key."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "c5_anti_join",
    section="C5",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2001-01-01'
)
""",
)
def c5_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: NOT EXISTS as left-anti. The anti join targets RECENT
    orders: every fixture customer has some order, so the unfiltered
    form returns the empty set — which would only verify that both
    engines find nothing, never that the anti join KEEPS non-matching
    rows. With the date filter both directions are exercised."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= "2001-01-01"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "c7_cross_join",
    section="C7",
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation,
       CAST(r.r_regionkey = n.n_regionkey AS BIGINT) AS is_home
FROM region r CROSS JOIN nation n
""",
)
def c7_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: all-pairs (the basis of brute-force kNN H15 — there the left

    side is a small probe set, so the cross is broadcast × corpus)."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        F.col("r_name").alias("region"),
        F.col("n_name").alias("nation"),
        (F.col("r_regionkey") == F.col("n_regionkey")).cast("long").alias("is_home"),
    )


# --------------------------------------------------------------------------
# D. Aggregations
# --------------------------------------------------------------------------


@query(
    "d1_pricing_summary",
    section="D1",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def d1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: TPC-H Q1 shape — the canonical partial+final hash aggregate.

    8 aggregates over 6 groups; map-side combine collapses everything
    before the shuffle, so data movement is O(groups), not O(rows)."""
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "d2_global_agg",
    section="D2",
    oracle="""
SELECT count(*) AS n,
       round(sum(l_extendedprice), 2) AS total_price,
       round(min(l_quantity), 2) AS min_qty,
       round(max(l_quantity), 2) AS max_qty,
       round(avg(l_discount), 6) AS avg_disc
FROM lineitem
""",
)
def d2_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: keyless aggregation → single-row result."""
    return table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )


@query(
    "d3_count_distinct",
    section="D3",
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events
GROUP BY 1
""",
)
def d3_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: exact distinct per group (expand+two-phase under the hood)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query("d4_approx_count_distinct", section="D4")
def d4_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: HLL++ approximate distinct — rows-only check (sketch results

    are engine-specific); tests assert ±5% of exact. At 100 TB this is
    the right default: no expand, constant memory per group."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))
    )


@query(
    "d5_filtered_agg",
    section="D5",
    oracle="""
SELECT l_returnflag,
       count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
       round(sum(l_extendedprice) FILTER (WHERE l_quantity >= 25), 2)
         AS big_qty_price,
       count(*) AS n
FROM lineitem
GROUP BY 1
""",
)
def d5_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5: FILTER(WHERE) via conditional aggregation."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.round(
            F.sum(F.when(F.col("l_quantity") >= 25, F.col("l_extendedprice"))), 2
        ).alias("big_qty_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "d6_rollup",
    section="D6",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def d6_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: rollup — (status, priority), (status), () granularities in

    one pass (Expand operator)."""
    return (
        table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "d6_cube",
    section="D6",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def d6_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: cube — all four granularities."""
    return (
        table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "d7_collect_set",
    section="D7",
    oracle="""
SELECT c_nationkey AS nationkey,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments
FROM customer
GROUP BY 1
""",
)
def d7_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7: array-valued aggregate (collect_set + sort_array), serialized
    to a comma-joined string so the driver's pandas comparator — which
    cannot hash list-valued cells — can canonicalize the result. The
    array aggregate is still what executes; only the output is flat."""
    return (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_set("c_mktsegment"))
            ).alias("segments")
        )
    )


@query(
    "d7_collect_list",
    section="D7",
    oracle="""
SELECT o_custkey AS custkey,
       array_to_string(list(o_orderkey ORDER BY o_orderdate, o_orderkey), ',')
         AS orderkeys
FROM orders
WHERE o_custkey < 100
GROUP BY 1
""",
)
def d7_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 bag variant: per-customer order history in date order.

    collect_list over a window'd sort is NOT order-stable across
    shuffles in general; the deterministic form aggregates structs and
    sorts inside the array — order lives in the data, not the plan.
    Output is comma-joined (driver's comparator can't hash lists)."""
    return (
        table(spark, sf_dir, "orders")
        .where(F.col("o_custkey") < 100)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("o_orderdate", "o_orderkey"))
                    ),
                    lambda s: s["o_orderkey"].cast("string"),
                ),
            ).alias("orderkeys")
        )
    )


# --------------------------------------------------------------------------
# E. Window functions
# --------------------------------------------------------------------------


@query(
    "e1_ranking",
    section="E1",
    oracle="""
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS BIGINT)
         AS status_rank,
       CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS BIGINT)
         AS status_dense_rank,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey)
""",
)
def e1_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: row_number / rank / dense_rank / ntile. One shuffle on the

    partition key serves all four (window spec reuse)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey")
    )
    ws = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(ws).cast("long").alias("status_rank"),
        F.dense_rank().over(ws).cast("long").alias("status_dense_rank"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "e2_topk_per_group",
    section="E2",
    oracle="""
SELECT custkey, orderkey, totalprice FROM (
  SELECT o_custkey AS custkey, o_orderkey AS orderkey,
         round(o_totalprice, 2) AS totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def e2_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: top-3 orders per customer — the findSynonyms result shape.

    At 100 TB swap in the bounded-heap mapInPandas pre-reduction
    (SURVEY §4.3.5); same output."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


@query(
    "e3_lag_lead",
    section="E3",
    oracle="""
SELECT user_id, event_id,
       lag(event_type) OVER w AS prev_type,
       lead(event_type) OVER w AS next_type,
       epoch_ms(ts) - epoch_ms(lag(ts) OVER w) AS ms_since_prev,
       first_value(event_type) OVER wf AS first_type,
       last_value(event_type) OVER wf AS last_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       wf AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def e3_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: lag/lead/first/last over per-user event time. Millisecond

    epochs on both sides: integer-typed, TZ-proof, and floor-consistent
    between Spark (µs-truncated timestamps) and DuckDB (ns). first/last
    use the explicit full-partition frame — the default frame ends at
    CURRENT ROW, which silently turns last_value into "current"."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ts_ms = F.unix_millis("ts")
    return e.select(
        "user_id",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (ts_ms - F.lag(ts_ms).over(w)).alias("ms_since_prev"),
        F.first("event_type").over(wf).alias("first_type"),
        F.last("event_type").over(wf).alias("last_type"),
    )


@query(
    "e4_running_aggs",
    section="E4",
    oracle="""
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING), 2) AS running_spend,
       round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
         AS moving_avg_3,
       CAST(count(*) OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice
                           RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_within_10k_below
FROM orders
""",
)
def e4_running_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: cumulative (ROWS UNBOUNDED PRECEDING), moving (ROWS 2
    PRECEDING), and value-range (RANGE 10000 PRECEDING) frames — the
    RANGE frame is peer-inclusive so it is deterministic under ties."""
    o = table(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.round(
            F.sum("o_totalprice").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
            2,
        ).alias("running_spend"),
        F.round(
            F.avg("o_totalprice").over(wo.rowsBetween(-2, 0)), 4
        ).alias("moving_avg_3"),
        F.count(F.lit(1))
        .over(wr.rangeBetween(-10000, 0))
        .alias("n_within_10k_below"),
    )


@query(
    "e5_distribution",
    section="E5",
    oracle="""
SELECT c_custkey AS custkey, c_mktsegment AS segment,
       round(percent_rank() OVER w, 6) AS bal_pct_rank,
       round(cume_dist() OVER w, 6) AS bal_cume_dist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
)
def e5_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: percent_rank / cume_dist within segment."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
    )


# --------------------------------------------------------------------------
# F. Sort / limit / set ops / dedup
# --------------------------------------------------------------------------


@query(
    "f1_multikey_sort",
    section="F1",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, round(l_extendedprice, 2) AS price
FROM lineitem
ORDER BY l_returnflag ASC, l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 100
""",
)
def f1_multikey_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2: multi-key sort with full deterministic tiebreak, then

    limit → TakeOrderedAndProject (per-partition heaps, no global
    sort)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_returnflag").asc(),
            F.col("l_extendedprice").desc(),
            "l_orderkey",
            "l_linenumber",
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.round("l_extendedprice", 2).alias("price"),
        )
        .limit(100)
    )


@query(
    "f2_global_topk",
    section="F2",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def f2_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: global top-10 — TakeOrderedAndProject."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .limit(10)
    )


@query(
    "f3_union",
    section="F3",
    oracle="""
SELECT custkey, count(*) AS n FROM (
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
  UNION ALL
  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
) GROUP BY 1
""",
)
def f3_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: bag union (duplicates preserved, then counted)."""
    c = table(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("custkey")
    )
    b = c.where(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("custkey"))
    return a.unionByName(b).groupBy("custkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "f4_intersect",
    section="F4",
    oracle="""
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def f4_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: set intersection (building-segment customers with urgent
    orders)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b)


@query(
    "f4_except_all",
    section="F4",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def f4_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: EXCEPT ALL — multiset difference keeps multiplicity."""
    o = table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b)


@query(
    "f5_exact_dedup",
    section="F5",
    oracle="""
SELECT lang, source, doc_id FROM (
  SELECT lang, source, doc_id,
         row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
""",
)
def f5_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: keep exactly one row per (lang, source) — the deterministic

    row_number()=1 formulation. ``dropDuplicates`` picks an ARBITRARY
    survivor (first seen per partition), which is non-reproducible
    across runs/engines — never use it where the survivor matters."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("lang", "source", "doc_id")
    )


@query(
    "d2_percentiles",
    section="D2,D1",
    oracle="""
SELECT lang,
       round(quantile_cont(n_chars, 0.5), 4) AS p50,
       round(quantile_cont(n_chars, 0.9), 4) AS p90,
       round(quantile_cont(n_chars, 0.99), 4) AS p99
FROM documents
GROUP BY 1
""",
)
def d2_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length quantiles — the length-distribution
    profile every training-data pipeline needs. F.percentile is the
    EXACT (sort-based) aggregate, matching DuckDB quantile_cont; at
    100 TB switch to percentile_approx (GK sketch: constant memory,
    rows-only vs an oracle)."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        *[
            F.round(
                F.percentile("n_chars", F.lit(q)), 4
            ).alias(f"p{int(q * 100)}")
            for q in (0.5, 0.9, 0.99)
        ]
    )


@query(
    "d6_pivot",
    section="D6",
    oracle="""
SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
       round(coalesce(sum(value) FILTER (event_type = 'click'), 0), 2) AS click,
       round(coalesce(sum(value) FILTER (event_type = 'purchase'), 0), 2) AS purchase,
       round(coalesce(sum(value) FILTER (event_type = 'view'), 0), 2) AS view
FROM events
GROUP BY 1
""",
)
def d6_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: weekly value totals spread across event-type columns.

    The pivot values are EXPLICIT — without them Spark runs an extra
    distinct scan to discover columns (a full pass at 100 TB) and the
    output schema becomes data-dependent, which breaks both Catalyst
    caching and the oracle contract."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week")
        )
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2))
        .na.fill(0.0, ["click", "purchase", "view"])
    )


@query(
    "f6_unpivot",
    section="F3,B1",
    oracle="""
SELECT o_orderkey, 'totalprice' AS measure, o_totalprice AS v FROM orders WHERE o_orderkey < 500
UNION ALL
SELECT o_orderkey, 'custkey' AS measure, CAST(o_custkey AS DOUBLE) AS v
FROM orders WHERE o_orderkey < 500
""",
)
def f6_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide columns → (key, measure, value) rows — the
    inverse reshaping (Spark 4 native `unpivot`; linear, no shuffle)."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    ).unpivot("o_orderkey", ["totalprice", "custkey"], "measure", "v")


@query(
    "c2_sql_tpch_q3",
    section="C2,C1,D1,F2",
    oracle="""
SELECT l.l_orderkey AS orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY 1, 3
ORDER BY revenue DESC, orderkey
LIMIT 10
""",
)
def c2_sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape through the pure-SQL entry point (`spark.sql`
    over registered views) — same Catalyst plan as the DataFrame API,
    proving the engine's full SQL surface. LIMIT is deterministic via
    the unique (revenue, orderkey) sort key."""
    for t in ("customer", "orders", "lineitem"):
        table(spark, sf_dir, t).createOrReplaceTempView(f"sgs_{t}")
    return spark.sql(
        """
        SELECT l.l_orderkey AS orderkey,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               date_format(o.o_orderdate, 'yyyy-MM-dd') AS orderdate
        FROM sgs_customer c
        JOIN sgs_orders o ON c.c_custkey = o.o_custkey
        JOIN sgs_lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY 1, 3
        ORDER BY revenue DESC, orderkey
        LIMIT 10
        """
    )


@query(
    "c4_correlated_subquery",
    section="C4,D1",
    oracle="""
SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS totalprice
FROM orders o
WHERE o.o_totalprice > (
    SELECT 1.5 * avg(o2.o_totalprice)
    FROM orders o2
    WHERE o2.o_custkey = o.o_custkey
)
""",
)
def c4_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — orders 1.5× above their customer's
    own average. Catalyst decorrelates this into an aggregate + join
    (RewriteCorrelatedScalarSubquery, SURVEY §4.1): the subquery runs
    ONCE as a grouped aggregate, not per outer row — which is the only
    viable plan at 100 TB. Declared through `spark.sql` so the
    decorrelation rule itself is exercised."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("sgs_orders_c4")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS totalprice
        FROM sgs_orders_c4 o
        WHERE o.o_totalprice > (
            SELECT 1.5 * avg(o2.o_totalprice)
            FROM sgs_orders_c4 o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "d2_stats_agg",
    section="D2,D1,G5",
    oracle="""
SELECT l_returnflag,
       round(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
       round(stddev_samp(l_extendedprice), 2) AS price_stddev,
       round(covar_samp(l_extendedprice, l_quantity), 2) AS price_qty_covar
FROM lineitem
GROUP BY 1
""",
)
def d2_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr / stddev / covariance) per group —
    single-pass streaming moments (partial+final like any hash agg), so
    they scale exactly like sum/avg."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias(
            "price_qty_covar"
        ),
    )


@query(
    "d6_grouping_sets",
    section="D6",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def d6_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: explicit GROUPING SETS — per-status totals, per-priority
    totals, and the grand total in ONE pass (Expand + single shuffle),
    instead of three scans unioned. Fixture columns are never NULL, so
    coalesce labels the super-aggregate rows unambiguously."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("sgs_orders_d6")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM sgs_orders_d6
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "skew_salted_join",
    section="C2",
    oracle="""
WITH dim(event_type, weight) AS (
    VALUES ('click', 1.0), ('view', 0.25), ('purchase', 5.0),
           ('signup', 3.0), ('error', 0.0)
)
SELECT e.event_type,
       count(*) AS n_events,
       round(sum(e.value * d.weight), 4) AS weighted_value
FROM events e
JOIN dim d USING (event_type)
GROUP BY 1
""",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated dimension join (SURVEY.md §4.3): event_type has
    only 5 distinct values, so a plain shuffle join lands each hot key
    on ONE reducer. functions.skew.salted_join scatters each hot key
    across 8 salts (small side replicated 8×, big side salted
    uniformly) — bag-identical results, verified here by aggregating
    the joined stream back to per-type totals against the unsalted
    oracle. Manual fallback for the skew cases AQE's sort-merge
    splitter can't touch (stateful consumers, no-AQE configs)."""
    from spark_glove_spark.functions.skew import salted_join

    e = table(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [
            ("click", 1.0),
            ("view", 0.25),
            ("purchase", 5.0),
            ("signup", 3.0),
            ("error", 0.0),
        ],
        "event_type string, weight double",
    )
    return (
        salted_join(e, dim, on="event_type", n_salts=8)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value") * F.col("weight")), 4).alias(
                "weighted_value"
            ),
        )
    )


@query(
    "e9_interval_range_frame",
    section="E4,D1,G4",
    tags=("window",),
    oracle="""
WITH daily AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT)
             AS day_idx,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1
)
SELECT day_idx, revenue,
       round(sum(revenue) OVER (
           ORDER BY day_idx RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ), 2) AS trailing_7d
FROM daily
""",
)
def e9_interval_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: daily order revenue with a trailing
    7-day windowed sum — the period-over-period rollup shape. The
    RANGE frame is over the day INDEX (value-based, gap-aware: a
    missing day still shrinks the window, unlike ROWS 6 PRECEDING),
    computed on the pre-aggregated daily series — so the window runs
    over ~thousands of rows regardless of fact-table scale, and the
    only fact-sized work is the first map-side-combinable aggregate.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")
        )
        .cast("long")
        .alias("day_idx")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("day_idx").rangeBetween(-6, 0)
    return daily.select(
        "day_idx",
        "revenue",
        F.round(F.sum("revenue").over(w), 2).alias("trailing_7d"),
    )


@query(
    "c13_lateral_topk",
    section="C4,E2",
    oracle="""
SELECT n.n_name AS nation, t.c_name AS name, t.bal
FROM nation n,
LATERAL (
  SELECT c_name, round(c_acctbal, 2) AS bal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 3
) t
""",
)
def c13_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — the SQL:2016 spelling of
    top-k-per-group: for each nation, its 3 highest-balance customers
    via a per-row correlated derived table. Catalyst DECORRELATES
    this into the same window/WindowGroupLimit plan as e2 (run
    ``.explain`` — no nested-loop re-execution per outer row), which
    is the point: users write the lateral form, the engine runs the
    bounded-heap form. DuckDB executes the identical SQL text, so the
    oracle doubles as a cross-engine semantics check of LATERAL
    itself."""
    table(spark, sf_dir, "nation").createOrReplaceTempView("sgs_nation_c13")
    table(spark, sf_dir, "customer").createOrReplaceTempView("sgs_cust_c13")
    return spark.sql("""
SELECT n.n_name AS nation, t.c_name AS name, t.bal
FROM sgs_nation_c13 n,
LATERAL (
  SELECT c_name, round(c_acctbal, 2) AS bal
  FROM sgs_cust_c13 c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 3
) t
""")


@query(
    "c12_null_safe_join",
    section="C2,B4",
    tags=("relational",),
    oracle="""
WITH a AS (
  SELECT nullif(CAST(floor(l_discount * 100) AS BIGINT), 0) AS k
  FROM lineitem WHERE l_quantity < 3
),
b AS (
  SELECT DISTINCT nullif(CAST(floor(l_discount * 100) AS BIGINT), 0) AS k
  FROM lineitem WHERE l_quantity >= 48
),
ns AS (
  SELECT a.k FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
),
pl AS (
  SELECT a.k FROM a JOIN b ON a.k = b.k
)
SELECT coalesce(k, -1) AS key,
       CAST(count(*) AS BIGINT) AS n_nullsafe,
       CAST((SELECT count(*) FROM pl WHERE pl.k IS NOT DISTINCT FROM ns.k)
            AS BIGINT) AS n_plain
FROM ns GROUP BY ns.k
""",
)
def c12_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM) — the join
    semantics SCD merge keys and sentinel-free dimension lookups need:
    NULL keys MATCH each other instead of silently dropping. Both
    sides derive a nullable key (discount cents, zero → NULL); the
    output counts each key's matches under null-safe AND plain
    equality side by side, so the exact rows plain equality loses
    (the NULL group, key = -1, n_plain = 0) are visible in the
    hash-checked result.

    100 TB: Spark plans ``<=>`` as a genuine hash join (the null
    bucket hashes like any value) — NOT a nested loop; semantically
    equivalent coalesce-to-sentinel tricks corrupt real sentinel
    values, which is why the operator exists."""
    li = table(spark, sf_dir, "lineitem")
    key = F.nullif(F.floor(F.col("l_discount") * 100).cast("long"), F.lit(0))
    a = li.where(F.col("l_quantity") < 3).select(key.alias("ka"))
    b = (
        li.where(F.col("l_quantity") >= 48)
        .select(key.alias("kb"))
        .distinct()
    )
    ns = a.join(F.broadcast(b), a["ka"].eqNullSafe(b["kb"])).select("ka")
    pl_counts = (
        a.join(F.broadcast(b), a["ka"] == b["kb"])
        .groupBy("ka")
        .agg(F.count(F.lit(1)).alias("n_plain"))
    )
    return (
        ns.groupBy("ka")
        .agg(F.count(F.lit(1)).alias("n_nullsafe"))
        .join(pl_counts, ns["ka"].eqNullSafe(pl_counts["ka"]), "left")
        .select(
            F.coalesce(ns["ka"], F.lit(-1)).alias("key"),
            "n_nullsafe",
            F.coalesce("n_plain", F.lit(0)).cast("long").alias("n_plain"),
        )
    )
