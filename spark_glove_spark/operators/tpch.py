"""Classic TPC-H query shapes beyond the §2-mandated Q1/Q3 twins.

Extra SQL-surface coverage (SURVEY.md §2 C1–C3/D1/D5 composites): the
multi-way join + aggregate patterns every reference-engine user runs
daily, re-expressed once through the DataFrame API and once through
``spark.sql`` to prove both entry points produce the same Catalyst
plans. The fixture schema is TPC-H-ish but trimmed (TESTDATA.md): no
``l_shipmode``/``l_commitdate``, so Q12 is adapted to the columns that
exist while keeping its filtered-conditional-aggregate shape.

Scale notes (100 TB): every dimension chain here (region → nation →
supplier/customer) is tiny and explicitly broadcast, so the only
shuffles are the fact-side aggregates; Catalyst reorders the join
chain and pushes the date/flag filters into the parquet scans
(verified via .explain("formatted") — see PLANS.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_glove_spark.registry import defer_unpersist, query
from spark_glove_spark.sources import table


@query(
    "sql_tpch_q05",
    section="C1,C2,D1",
    oracle="""
SELECT n.n_name AS nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o    ON c.c_custkey = o.o_custkey
JOIN lineitem l  ON o.o_orderkey = l.l_orderkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n    ON s.s_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
ORDER BY revenue DESC, nation
""",
)
def sql_tpch_q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: local-supplier revenue by nation — the canonical
    6-table star join. The c_nationkey = s_nationkey condition makes
    the customer→supplier relationship THETA on the dimension chain;
    expressed as an extra equi-key on the supplier join so Catalyst
    keeps every join hash-based. region/nation/supplier/customer are
    all broadcast; lineitem→orders is the one shuffle."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "nation")
    )


@query(
    "sql_tpch_q10",
    section="C2,C1,D1,F2",
    oracle="""
SELECT c.c_custkey AS custkey,
       c.c_name AS name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       round(c.c_acctbal, 2) AS acctbal,
       n.n_name AS nation
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate < TIMESTAMP '1996-10-01'
GROUP BY 1, 2, 4, 5
ORDER BY revenue DESC, custkey
LIMIT 20
""",
)
def sql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by lost revenue on returned items in
    a quarter. The returnflag filter pushes into the lineitem scan;
    nation broadcasts; the top-20 runs as TakeOrderedAndProject (no
    global sort materialization)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    l = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("custkey", "name", "revenue", "acctbal", "nation")
        .orderBy(F.desc("revenue"), "custkey")
        .limit(20)
    )


@query(
    "sql_tpch_q12_shape",
    section="D5,C2",
    oracle="""
SELECT CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1999-01-01'
GROUP BY 1
ORDER BY ship_year
""",
)
def sql_tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-priority split), adapted to the
    trimmed fixture schema: the fixture has no l_shipmode/l_commitdate
    (TESTDATA.md), so the groups are ship years and the CASE split is
    order priority — same filtered-conditional-aggregate pattern. The
    shipdate range filter reaches the lineitem scan as PushedFilters."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1999-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


@query(
    "sql_tpch_q18",
    section="C4,D1,F2",
    oracle="""
WITH big AS (
    SELECT l_orderkey
    FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(l_quantity) > 250
)
SELECT c.c_name AS name,
       c.c_custkey AS custkey,
       o.o_orderkey AS orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o.o_totalprice, 2) AS totalprice,
       round(sum(l.l_quantity), 2) AS sum_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY 1, 2, 3, 4, 5
ORDER BY totalprice DESC, orderkey
LIMIT 100
""",
)
def sql_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-quantity orders — aggregate-HAVING feeding a
    semi-join back into the fact table. The `big` order list is tiny
    after the HAVING, so it broadcasts into the semi join; only the
    per-order quantity rollups shuffle."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        l.join(
            F.broadcast(big).withColumnRenamed("l_orderkey", "big_orderkey"),
            F.col("l_orderkey") == F.col("big_orderkey"),
            "left_semi",
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.desc("totalprice"), "orderkey")
        .limit(100)
    )


@query(
    "sql_tpch_q07",
    section="C2,C1,D1",
    oracle="""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
)
def sql_tpch_q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade revenue between two
    nations by ship year. The disjunctive nation-pair predicate sits
    ON the joined dimensions, so Catalyst pushes each side's nation
    filter into the broadcast hash joins; the lineitem→orders shuffle
    is the only exchange."""
    s = table(spark, sf_dir, "supplier")
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "sql_tpch_q13",
    section="C3,D1",
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                      AND o.o_orderpriority <> '5-LOW'
    GROUP BY 1
)
GROUP BY 1
ORDER BY custdist DESC, c_count DESC
""",
)
def sql_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): orders-per-customer histogram
    including zero-order customers — the LEFT join with the filter in
    the JOIN condition (not WHERE, which would turn it inner) is the
    point of this shape. Adapted to the trimmed fixture: the original
    o_comment NOT LIKE filter becomes an order-priority exclusion
    (no o_comment column; TESTDATA.md). Double aggregate: per-customer
    count, then histogram of counts."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "sql_tpch_q14",
    section="D5,C1",
    oracle="""
SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
  AND l.l_shipdate < TIMESTAMP '1997-10-01'
""",
)
def sql_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): share of a month's revenue from
    promo parts — conditional aggregate over a fact→dimension join.
    The date range pushes into the lineitem scan; part broadcasts.
    The fixture's p_type is a plain category ('PROMO'), so the LIKE
    'PROMO%%' of the original is an equality here."""
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "sql_tpch_q15",
    section="C4,D1",
    oracle="""
WITH rev AS (
    SELECT l_suppkey AS suppkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY 1
)
SELECT s.s_suppkey AS suppkey, s.s_name AS name, r.total_revenue
FROM supplier s
JOIN rev r ON s.s_suppkey = r.suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY suppkey
""",
)
def sql_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
    the max. The scalar-subquery max is a 1-row broadcast back onto
    the aggregate (no second scan of lineitem — the rev aggregate is
    reused for both sides). Revenue is rounded BEFORE the max
    comparison on both engines so float accumulation order cannot
    split ties."""
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = table(spark, sf_dir, "supplier")
    rev = (
        l.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
        .persist()
    )
    rev = defer_unpersist(rev)
    top = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.join(F.broadcast(top), F.col("total_revenue") == F.col("m"))
        .join(F.broadcast(s), F.col("suppkey") == F.col("s_suppkey"))
        .select("suppkey", F.col("s_name").alias("name"), "total_revenue")
        .orderBy("suppkey")
    )


@query(
    "sql_tpch_q16",
    section="D3,C5",
    oracle="""
SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, brand, type, size
""",
)
def sql_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct-supplier
    count per part attribute triple. The fixture has no partsupp
    table, so lineitem serves as the part↔supplier bridge — same
    join + count(DISTINCT) over an exclusion filter. The distinct agg
    expands to a two-phase plan (dedup shuffle, then count) — the
    scale-safe form of COUNT DISTINCT."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "brand", "type", "size")
    )


@query(
    "sql_tpch_q17",
    section="C4,D1",
    oracle="""
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
    SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
    FROM lineitem
    GROUP BY 1
) t ON t.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < t.half_avg_qty
""",
)
def sql_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lineitems below half
    their part's average quantity — the correlated AVG subquery
    decorrelated into a per-part aggregate joined back to the fact
    (exactly what Catalyst does to the correlated form; written
    explicitly so the plan is deterministic). Threshold 0.5·avg
    instead of the spec's 0.2 so the trimmed fixture yields rows."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    avg_q = l.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_q, F.col("t_partkey") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "sql_tpch_q19",
    section="B2,C1,D1",
    oracle="""
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def sql_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): disjunction of brand/size/
    quantity conjuncts spanning BOTH join sides. Catalyst extracts the
    common part-side implications (brand ∈ {...}, size ≤ 15) below the
    join while keeping the cross-side OR as a post-join filter — the
    shape that breaks naive pushdown engines."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "sql_tpch_q22",
    section="C5,D1",
    oracle="""
SELECT CAST(c.c_nationkey AS INTEGER) AS nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c.c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
ORDER BY 1
""",
)
def sql_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): rich customers with
    no RECENT orders — a scalar AVG subquery (1-row broadcast) plus an
    ANTI join against the filtered orders, then a per-nation rollup.
    Adapted to the trimmed fixture twice over: no c_phone column (the
    country-code IN list becomes the nation key itself), and the anti
    join is against post-2000 orders because every fixture customer
    has SOME order — the spec's "never ordered" predicate returns the
    empty set here, which would make the oracle check vacuous."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= "2000-01-01"
    )
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("threshold")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("threshold"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("nationkey")
    )


@query(
    "sql_tpch_q04",
    section="C4,D1",
    oracle="""
SELECT o.o_orderpriority AS orderpriority,
       CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY 1
ORDER BY 1
""",
)
def sql_tpch_q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking): orders in a quarter with at
    least one LATE lineitem — an EXISTS whose inner predicate
    correlates with an OUTER column (l_shipdate vs o_orderdate), which
    a plain equi-semi-join can't express; Spark plans it as a left-semi
    with the cross-side condition in the join. Adapted to the trimmed
    fixture: no l_commitdate/l_receiptdate, so 'late' means shipped
    more than 90 days after the order date."""
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    )
    l = table(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(l, late, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("orderpriority")
    )


@query(
    "sql_tpch_q06",
    section="B2,D2",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def sql_tpch_q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (faithful): the forecast-revenue-change scan-agg. No
    join at all — the whole query is three pushed predicates and one
    partial+final agg; the parquet scan should show all three in
    PushedFilters and zero Exchanges beyond the final single-row
    merge."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue")
        )
    )


@query(
    "sql_tpch_q08",
    section="C1,C2,D1,D5",
    oracle="""
SELECT year(o.o_orderdate) AS o_year,
       round(sum(CASE WHEN sn.n_name = 'NATION_1'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS mkt_share
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
JOIN region r    ON cn.n_regionkey = r.r_regionkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
JOIN part p      ON l.l_partkey = p.p_partkey
WHERE r.r_name = 'AMERICA'
  AND p.p_type = 'ECONOMY'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY 1
""",
)
def sql_tpch_q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (faithful on the trimmed schema): national market
    share — NATION_1's fraction of ECONOMY-part revenue sold into
    AMERICA-region customers, by order year. Two independent uses of
    the nation dimension (customer side for the region gate, supplier
    side for the share test) — aliased broadcasts; the conditional
    numerator rides the same aggregate as the denominator (D5)."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("sn_name") == "NATION_1", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "sql_tpch_q02_shape",
    section="C1,E1,E2,F1",
    oracle="""
WITH offers AS (
    SELECT l_partkey AS partkey, l_suppkey AS suppkey,
           min(l_extendedprice / l_quantity) AS unit_price
    FROM lineitem
    GROUP BY 1, 2
),
eu AS (
    SELECT o.partkey, o.suppkey, o.unit_price,
           s.s_acctbal, s.s_name, n.n_name,
           row_number() OVER (PARTITION BY o.partkey
                              ORDER BY o.unit_price, o.suppkey) AS rn
    FROM offers o
    JOIN supplier s ON o.suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
)
SELECT round(e.s_acctbal, 2) AS s_acctbal, e.s_name, e.n_name,
       p.p_partkey AS partkey,
       floor(e.unit_price * 10000 + 0.5) / 10000 AS unit_price
FROM eu e
JOIN part p ON e.partkey = p.p_partkey
WHERE e.rn = 1 AND p.p_type = 'SMALL'
ORDER BY s_acctbal DESC, n_name, s_name, partkey
LIMIT 100
""",
)
def sql_tpch_q02_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape, adapted (the fixture has no partsupp table):
    the cheapest EUROPEAN supplier per part, where 'offer price' is
    the min observed unit price in lineitem. Keeps Q2's essence — a
    per-group MIN resolved back to the row achieving it — expressed
    as row_number()=1 with a deterministic (price, suppkey) tiebreak
    instead of Q2's correlated-min equality join: float-equality
    joins are an engine-portability hazard, ranking is not."""
    from pyspark.sql.window import Window

    l = table(spark, sf_dir, "lineitem")
    offers = l.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "SMALL")
    w = Window.partitionBy("partkey").orderBy("unit_price", "suppkey")
    eu = (
        offers.join(F.broadcast(s), F.col("suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return (
        eu.join(F.broadcast(p), F.col("partkey") == F.col("p_partkey"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "partkey",
            # floor(x*1e4+0.5)/1e4: bit-identical half-up rounding in
            # both engines (round() half-even ties split at sf0.1 —
            # one supplier's unit price lands exactly on .xxxx5)
            (F.floor(F.col("unit_price") * 10000 + 0.5) / 10000).alias(
                "unit_price"
            ),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "partkey")
        .limit(100)
    )


@query(
    "sql_tpch_q09_shape",
    section="C1,C2,D1",
    oracle="""
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)
                 - 0.6 * p.p_retailprice * l.l_quantity), 2) AS profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
""",
)
def sql_tpch_q09_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape, adapted (no partsupp → supply cost proxied as
    60% of p_retailprice): product-line profit by supplier nation and
    order year for parts named like 'red'. The p_name LIKE pushes
    into the part scan; part/supplier/nation broadcast; the only
    shuffles are lineitem⋈orders and the final (nation, year) agg."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "sql_tpch_q20_shape",
    section="C4,D1,C1",
    oracle="""
WITH shipped AS (
    SELECT l_partkey AS partkey, l_suppkey AS suppkey,
           sum(l_quantity) AS qty
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'red%'
    GROUP BY 1, 2
),
tot AS (
    SELECT partkey, sum(qty) AS total_qty FROM shipped GROUP BY 1
)
SELECT DISTINCT s.s_name AS name, n.n_name AS nation
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE EXISTS (
    SELECT 1 FROM shipped sh JOIN tot t ON sh.partkey = t.partkey
    WHERE sh.suppkey = s.s_suppkey AND sh.qty > 0.05 * t.total_qty
)
ORDER BY name
""",
)
def sql_tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape, adapted (no partsupp availqty → 'dominant
    shipper' test): suppliers who shipped more than 5% of the total
    shipped quantity of some red part, as (name, nation). Keeps Q20's
    nested structure — an aggregate-derived correlated EXISTS feeding
    a semi join into the supplier dimension."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    shipped = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.sum("l_quantity").alias("qty"))
    )
    tot = shipped.groupBy("partkey").agg(F.sum("qty").alias("total_qty"))
    qualifying = (
        shipped.join(tot, "partkey")
        .where(F.col("qty") > 0.05 * F.col("total_qty"))
        .select("suppkey")
    )
    return (
        s.join(qualifying, F.col("s_suppkey") == F.col("suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("s_name").alias("name"), F.col("n_name").alias("nation"))
        .distinct()
        .orderBy("name")
    )


@query(
    "sql_tpch_q21_shape",
    section="C4,C5,D1,F2",
    oracle="""
WITH base AS (
    SELECT l.l_orderkey AS orderkey, l.l_suppkey AS suppkey,
           max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END) AS late
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY 1, 2
),
per_order AS (
    SELECT orderkey, count(*) AS n_supps, sum(late) AS n_late
    FROM base GROUP BY 1
)
SELECT s.s_name AS name, count(*) AS numwait
FROM base b
JOIN per_order po ON b.orderkey = po.orderkey
JOIN supplier s ON b.suppkey = s.s_suppkey
WHERE b.late = 1 AND po.n_supps > 1 AND po.n_late = 1
GROUP BY 1
ORDER BY numwait DESC, name
LIMIT 20
""",
)
def sql_tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape, adapted (no receipt/commit dates → 'late' =
    shipped more than 60 days after the order date): suppliers who
    were the SOLE late shipper on a finished multi-supplier order.
    Q21's double-correlated EXISTS ('another supplier exists') /
    NOT-EXISTS ('no other late supplier') collapses into per-order
    counts joined back — same semantics, one aggregate instead of two
    correlated subqueries, no repeated lineitem scans."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    late_flag = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        1,
    ).otherwise(0)
    base = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.max(late_flag).alias("late"))
    )
    per_order = base.groupBy("orderkey").agg(
        F.count(F.lit(1)).alias("n_supps"), F.sum("late").alias("n_late")
    )
    return (
        base.join(per_order, "orderkey")
        .where((F.col("late") == 1) & (F.col("n_supps") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "name")
        .limit(20)
    )


@query(
    "sql_tpch_q11_shape",
    section="D1,C1,C4",
    oracle="""
WITH val AS (
  SELECT l.l_partkey AS partkey,
         sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT)) AS cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_7'
  GROUP BY 1
),
tot AS (SELECT sum(cents) AS t FROM val)
SELECT partkey, round(cents / 100.0, 2) AS value
FROM val
WHERE cents > 0.001 * (SELECT t FROM tot)
ORDER BY value DESC, partkey
""",
)
def sql_tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification), adapted —
    the fixture has no partsupp, so lineitem revenue through one
    nation's suppliers stands in for supplycost×availqty. The
    query's SIGNATURE construct survives intact: a grouped aggregate
    filtered by a SCALAR SUBQUERY over the SAME aggregate (HAVING
    sum(...) > fraction × Σ_total) — the decorrelation pattern that
    separates real optimizers from naive ones. Money is folded in
    exact integer cents (floor-cent rule) so the 0.1% threshold
    compares integers against one scalar.

    This closes the last TPC-H gap: all 22 queries now have a
    declared, oracle-checked form.

    100 TB: Catalyst evaluates the total ONCE (the subquery becomes
    a broadcast scalar), dims broadcast, and the per-part aggregate
    is the only fact shuffle — the same two-pass shape a petabyte
    HAVING-fraction query needs."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    val = (
        l.join(
            F.broadcast(
                s.join(
                    F.broadcast(n),
                    s["s_nationkey"] == n["n_nationkey"],
                ).select("s_suppkey")
            ),
            l["l_suppkey"] == F.col("s_suppkey"),
        )
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(cents).alias("cents"))
    )
    val = defer_unpersist(val.persist())
    tot = val.agg(F.sum("cents").alias("t"))
    return (
        val.crossJoin(F.broadcast(tot))
        .where(F.col("cents") > 0.001 * F.col("t"))
        .select("partkey", F.round(F.col("cents") / 100.0, 2).alias("value"))
        .orderBy(F.col("value").desc(), "partkey")
    )
