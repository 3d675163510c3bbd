"""Temporal join operators (SURVEY.md §2: C8 as-of join, C9 interval join).

Spark has no native ASOF JOIN; C8 is implemented with the
union-and-carry-forward window — the scale-correct formulation: one
shuffle on user_id, no range join, state bounded by one row per
stream. The naive alternative (inequality join + max per key)
re-materializes every (purchase × earlier click) pair — quadratic per
hot user; never do that at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_glove_spark.registry import query
from spark_glove_spark.sources import table


@query(
    "c8_asof_join",
    section="C8",
    oracle="""
SELECT p.event_id, p.user_id,
       epoch_ms(p.ts) - epoch_ms(c.ts) AS ms_since_click
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def c8_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8: for each purchase, time since the user's latest click at or

    before it (NULL when none). Implementation: tag both streams,
    union, carry the last click timestamp forward with a window —
    equal timestamps sort click-first so `ts >= c.ts` inclusive
    semantics match DuckDB's ASOF. Output gap in ms: when several
    clicks share the as-of timestamp the gap is still unique, so the
    result is engine-independent."""
    e = table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("kind"), F.lit(None).cast("long").alias("event_id")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("kind"), "event_id"
    )
    merged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    click_ts = F.last(
        F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        merged.withColumn("last_click_ts", click_ts)
        .where(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            (F.unix_millis("ts") - F.unix_millis("last_click_ts")).alias(
                "ms_since_click"
            ),
        )
    )


@query(
    "c9_interval_join",
    section="C9",
    oracle="""
SELECT s.event_id AS signup_id, e.event_id AS error_id, s.user_id,
       epoch_ms(e.ts) - epoch_ms(s.ts) AS ms_after_signup
FROM (SELECT * FROM events WHERE event_type = 'signup') s
JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON s.user_id = e.user_id
 AND e.ts >= s.ts
 AND e.ts < s.ts + INTERVAL 1 HOUR
""",
)
def c9_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9: errors within [signup, signup + 1h) per user. The equi-key

    (user_id) drives the join; the range predicates filter inside each
    key group — so this is a hash join + filter, not a nested-loop.
    For keyless interval joins at scale, bucketize ts to turn the
    range into an equi-key first."""
    e = table(spark, sf_dir, "events")
    s = e.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("s_ts"),
    )
    err = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    return (
        s.join(
            err,
            (F.col("user_id") == F.col("e_user"))
            & (F.col("e_ts") >= F.col("s_ts"))
            & (F.col("e_ts") < F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "signup_id",
            "error_id",
            "user_id",
            (F.unix_millis("e_ts") - F.unix_millis("s_ts")).alias("ms_after_signup"),
        )
    )


def interval_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_start,
    left_end,
    right_ts,
    bin_width_ms: int = 3_600_000,
) -> DataFrame:
    """Keyless interval join at scale: right rows whose ``right_ts``
    falls in the left row's [start, end).

    Spark plans a keyless range predicate as BroadcastNestedLoopJoin —
    O(|L|·|R|). This form manufactures an equi-key: left intervals
    explode to every time bin they overlap (bounded fan-out when
    interval length is bounded), right rows land in exactly one bin,
    and the join becomes a hash join on bin + a precise range filter.
    Each (interval, event) pair meets in exactly one bin, so no dedup
    is needed. Pick bin_width ≈ the typical interval length: fan-out
    stays ≤ 2 and bin cardinality ∝ time span / width.
    """
    w = F.lit(bin_width_ms)
    # Guard empty/negative intervals: F.sequence runs DESCENDING when
    # end < start, emitting spurious bins (the precise range filter
    # below removes them, but the fan-out is wasted work).
    lo = F.floor(F.unix_millis(left_start) / w)
    hi = F.floor((F.unix_millis(left_end) - 1) / w)
    lb = left.withColumn(
        "__bin",
        F.explode(
            F.when(hi >= lo, F.sequence(lo, hi)).otherwise(
                F.array().cast("array<bigint>")
            )
        ),
    )
    rb = right.withColumn("__bin", F.floor(F.unix_millis(right_ts) / w))
    return (
        lb.join(rb, "__bin")
        .where((right_ts >= left_start) & (right_ts < left_end))
        .drop("__bin")
    )


@query(
    "c9_interval_join_binned",
    section="C9,C2",
    tags=("temporal", "scale"),
    oracle="""
SELECT s.event_id AS signup_id, e.event_id AS error_id,
       CAST(epoch_ms(e.ts) - epoch_ms(s.ts) AS BIGINT)
           AS ms_after_signup
FROM events s JOIN events e
  ON e.event_type = 'error'
 AND s.event_type = 'signup'
 AND e.ts >= s.ts
 AND e.ts < s.ts + INTERVAL 1 HOUR
""",
)
def c9_interval_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS interval join as a declared query — c9_interval_join
    drops its user_id equi-key: every error within one hour of ANY
    signup. Spark plans a bare range predicate as
    BroadcastNestedLoopJoin (O(|L|·|R|)); this runs through
    ``interval_join_binned``, which manufactures an equi-key by
    exploding each interval onto the hour bins it overlaps (fan-out
    ≤ 2 at bin width = interval length) so the physical plan is a
    hash join on the bin plus a precise range filter. The oracle is
    the naive range join — DuckDB's IEJoin handles it at fixture
    scale, and any divergence between the binned plan and the naive
    semantics flips the hash.
    """
    e = table(spark, sf_dir, "events")
    s = e.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), F.col("ts").alias("s_ts")
    )
    err = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts").alias("e_ts")
    )
    joined = interval_join_binned(
        s,
        err,
        F.col("s_ts"),
        F.col("s_ts") + F.expr("INTERVAL 1 HOUR"),
        F.col("e_ts"),
    )
    return joined.select(
        "signup_id",
        "error_id",
        (F.unix_millis("e_ts") - F.unix_millis("s_ts")).alias(
            "ms_after_signup"
        ),
    )


@query(
    "f10_windowed_dedup",
    section="F5,E1,G4",
    tags=("dedup",),
    oracle="""
SELECT event_id, user_id, event_type,
       date_trunc('hour', ts) AS hour
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, event_type, date_trunc('hour', ts)
      ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
""",
)
def f10_windowed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed keep-first dedup — F5's time-bucketed form and the
    batch twin of streaming dropDuplicates-within-watermark (i5):
    keep the earliest event per (user, type, hour), the standard
    collapse for at-least-once ingestion where retries land in the
    same reporting bucket. Deterministic keep rule: (ts, event_id)
    ordering inside each bucket.

    Plan: ONE sort shuffle on the bucket key and a WindowGroupLimit
    (rank <= 1 is applied map-side before the full sort materializes)
    — never a self-join against the history. State per bucket is one
    row; at 100 TB the bucket key is also the natural partition key
    for the sink.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", "event_type", F.date_trunc("hour", F.col("ts"))
    ).orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour"),
        )
    )


@query(
    "c9_gap_fill",
    section="C9,E3,G4",
    tags=("temporal",),
    oracle="""
WITH hourly AS (
    SELECT user_id, date_trunc('hour', ts) AS h,
           count(*) AS n_events, round(sum(value), 6) AS hour_sum
    FROM events WHERE user_id <= 20 GROUP BY 1, 2
),
spans AS (
    SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1
),
calendar AS (
    SELECT s.user_id, unnest(generate_series(s.h0, s.h1,
                                             INTERVAL 1 HOUR)) AS h
    FROM spans s
)
SELECT c.user_id,
       epoch_ms(c.h) AS hour_ms,
       coalesce(hy.n_events, 0) AS n_events,
       last_value(hy.hour_sum IGNORE NULLS)
           OVER (PARTITION BY c.user_id ORDER BY c.h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS filled_sum
FROM calendar c LEFT JOIN hourly hy
  ON c.user_id = hy.user_id AND c.h = hy.h
""",
)
def c9_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill + forward-fill — the temporal operator that
    turns an irregular event stream into a dense regular series: per
    user, materialize every hour between their first and last event
    (``sequence`` + explode — an expression, not a calendar-table
    join), left-join the observed hourly aggregates, and carry the
    last observed value forward with ``last(ignorenulls=True)`` over
    an UNBOUNDED PRECEDING row frame.

    Scale shape: the calendar fan-out is bounded by span-hours per
    user (state: one row per user before the explode), the join is
    co-partitioned on user_id, and the fill window never leaves the
    user partition — no global sort anywhere. Hourly sums are rounded
    BEFORE the fill so both engines carry identical quantities."""
    e = table(spark, sf_dir, "events").where(F.col("user_id") <= 20)
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("hour_sum"),
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    calendar = spans.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        calendar.join(hourly, ["user_id", "h"], "left")
        .select(
            "user_id",
            F.unix_millis("h").alias("hour_ms"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("hour_sum", ignorenulls=True).over(w).alias("filled_sum"),
        )
    )


@query(
    "c9_ohlc_resample",
    section="C9,E1,D1",
    tags=("timeseries",),
    oracle="""
WITH x AS (
    SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms, event_type,
           ts, event_id, value
    FROM events
),
r AS (
    SELECT bucket_ms, event_type, value,
           row_number() OVER (PARTITION BY bucket_ms, event_type
                              ORDER BY ts, event_id) AS rn_a,
           row_number() OVER (PARTITION BY bucket_ms, event_type
                              ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM x
)
SELECT bucket_ms, event_type,
       count(*) AS n,
       round(max(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
       round(max(value), 6) AS high,
       round(min(value), 6) AS low,
       round(max(CASE WHEN rn_d = 1 THEN value END), 6) AS close,
       round(sum(value), 2) AS total
FROM r GROUP BY 1, 2
""",
)
def c9_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample/downsample to OHLC bars — the canonical
    "hypertable rollup" shape: per (hour, event_type), the opening and
    closing value (first/last by (ts, event_id) — the tiebreak makes
    the bar deterministic even with equal timestamps), high, low,
    count, and volume.

    Plan: ONE shuffle on the (bucket, series) key does everything —
    the two row_number windows and the final agg share the same
    partitioning, so Catalyst plans window→window→agg in a single
    Exchange's scope. At 100 TB this is the right layout: bars
    partition by time bucket (append-friendly), no per-row Python, no
    join; late data re-aggregates only the affected bucket."""
    e = table(spark, sf_dir, "events")
    x = e.select(
        F.unix_millis(F.date_trunc("hour", F.col("ts"))).alias("bucket_ms"),
        "event_type",
        "ts",
        "event_id",
        "value",
    )
    wa = Window.partitionBy("bucket_ms", "event_type").orderBy("ts", "event_id")
    wd = Window.partitionBy("bucket_ms", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = x.select(
        "bucket_ms",
        "event_type",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return r.groupBy("bucket_ms", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 6).alias("close"),
        F.round(F.sum("value"), 2).alias("total"),
    )


@query(
    "c9_sessionize",
    section="C9,E3,E4",
    tags=("temporal",),
    oracle="""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 43200000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
             AS session_idx
  FROM g
)
SELECT user_id, session_idx, count(*) AS n_events,
       (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_s
FROM s GROUP BY 1, 2
""",
)
def c9_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the gap-cut twin of I3's streaming
    session window: a new session starts when a user's inter-event
    gap exceeds 12 h. Classic two-window formulation: ``lag`` marks
    session starts, a running ``sum`` of the marks numbers them —
    ONE shuffle on user_id serves both windows and the final
    per-session aggregate (same-key partial agg), so the whole
    pipeline is a single Exchange. Per-user state in each window is
    one row; no per-key materialization — the formulation that holds
    for billions of users.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond precision end to end: flooring each endpoint to
    # seconds first (unix_timestamp) disagrees with flooring the
    # DIFFERENCE by up to 1 s — both sides floor the us-difference.
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    marked = e.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > 43_200_000_000), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    s = marked.withColumn(
        "session_idx", F.sum("is_new").over(w).cast("long")
    )
    return s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(
            "(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000"
        ).alias("duration_s"),
    )


@query(
    "c9_ewma",
    section="C9,J4",
    tags=("temporal",),
    oracle="""
WITH r AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       floor(sum(CASE WHEN rn = 1 THEN power(0.7, n - 1) * value
                      ELSE 0.3 * power(0.7, n - rn) * value END)
             * 1e4 + 0.5) / 1e4
           AS ewma
FROM r GROUP BY user_id, n
""",
)
def c9_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of ``value`` per user
    (alpha=0.3, adjust-free recursion ``y_t = 0.7*y_{t-1} + 0.3*x_t``,
    seeded with the first observation), reporting each user's final
    smoothed level — the stateful time-series smoother every metrics
    pipeline carries.

    The recursion is inherently sequential per key, so it runs in an
    ``applyInPandas`` kernel over per-user groups: ONE shuffle on
    user_id, carried state = a single running double per key — the
    exact shape of its streaming twin (I6 flatMapGroupsWithState).
    The oracle is the closed form (sum of geometrically-decayed
    terms), which a SQL engine can express but only at O(n) pow calls
    per row — the recursion is the scale path. Quantized to 4 dp with
    the repo's floor(x*1e4+0.5)/1e4 half-up idiom in BOTH engines
    (Python round() is banker's half-to-even, SQL round() is half
    away from zero — a tie-adjacent value could flip between them);
    the two formulations agree to ~1e-13 relative, far inside the
    quantum. Deep histories underflow the oracle's pow() to zero
    gracefully; the recursion never overflows by construction.
    """
    import math
    e = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )

    def kernel(pdf):
        pdf = pdf.sort_values(["ts", "event_id"])
        y = (
            pdf["value"]
            .ewm(alpha=0.3, adjust=False)
            .mean()
            .iloc[-1]
        )
        import pandas as pd

        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "ewma": [math.floor(float(y) * 1e4 + 0.5) / 1e4],
            }
        )

    return e.groupBy("user_id").applyInPandas(
        kernel, "user_id long, n_events long, ewma double"
    )


@query(
    "c9_interpolate",
    section="C9,E3,G5",
    tags=("temporal",),
    oracle="""
WITH hourly AS (
    SELECT user_id, date_trunc('hour', ts) AS h,
           round(sum(value), 6) AS v
    FROM events WHERE user_id <= 20 GROUP BY 1, 2
),
spans AS (
    SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1
),
calendar AS (
    SELECT s.user_id, unnest(generate_series(s.h0, s.h1,
                                             INTERVAL 1 HOUR)) AS h
    FROM spans s
),
g AS (
    SELECT c.user_id, c.h, hy.v,
           CASE WHEN hy.v IS NULL THEN NULL ELSE c.h END AS kh
    FROM calendar c LEFT JOIN hourly hy
      ON c.user_id = hy.user_id AND c.h = hy.h
),
w AS (
    SELECT user_id, h, v,
           last_value(v IGNORE NULLS) OVER wb AS pv,
           last_value(kh IGNORE NULLS) OVER wb AS pt,
           first_value(v IGNORE NULLS) OVER wf AS nv,
           first_value(kh IGNORE NULLS) OVER wf AS nt
    FROM g
    WINDOW wb AS (PARTITION BY user_id ORDER BY h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wf AS (PARTITION BY user_id ORDER BY h
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, epoch_ms(h) AS hour_ms,
       CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS interpolated,
       floor((CASE
           WHEN v IS NOT NULL THEN v
           WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv)
                  * (epoch_ms(h) - epoch_ms(pt))
                  / (epoch_ms(nt) - epoch_ms(pt))
           WHEN pv IS NOT NULL THEN pv
           ELSE nv END) * 10000 + 0.5) / 10000 AS value
FROM w
""",
)
def c9_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the regular hourly grid — gap_fill's
    numeric twin (forward-fill answers 'carry the reading', interp
    answers 'estimate between readings' — the hypertable
    ``interpolate()`` primitive). Two windows per key, both riding
    the SAME user_id shuffle as the grid join: backward last-known
    (value, time) and forward next-known; missing hours get the
    time-weighted blend, edges degrade to nearest-known. All
    expression-level arithmetic on epoch-ms integers, so both engines
    compute the identical IEEE blend.
    """
    e = table(spark, sf_dir, "events").where(F.col("user_id") <= 20)
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    spans = hourly.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    calendar = spans.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    g = calendar.join(hourly, ["user_id", "h"], "left").withColumn(
        "kh", F.when(F.col("v").isNotNull(), F.col("h"))
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    w = (
        g.withColumn("pv", F.last("v", ignorenulls=True).over(wb))
        .withColumn("pt", F.last("kh", ignorenulls=True).over(wb))
        .withColumn("nv", F.first("v", ignorenulls=True).over(wf))
        .withColumn("nt", F.first("kh", ignorenulls=True).over(wf))
    )
    ms = F.unix_millis
    blend = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        ms(F.col("h")) - ms(F.col("pt"))
    ) / (ms(F.col("nt")) - ms(F.col("pt")))
    return w.select(
        "user_id",
        ms(F.col("h")).alias("hour_ms"),
        F.when(F.col("v").isNotNull(), 0).otherwise(1).alias("interpolated"),
        # floor-based half-up rounding: midpoint blends (exact 1/2
        # fractions) land on exact .00005 ties where Spark's round and
        # DuckDB's disagree; floor(x*1e4 + 0.5)/1e4 is the same
        # expression in both engines (the f8 cent-math rule).
        (
            F.floor(
                F.when(F.col("v").isNotNull(), F.col("v"))
                .when(
                    F.col("pv").isNotNull() & F.col("nv").isNotNull(),
                    blend,
                )
                .when(F.col("pv").isNotNull(), F.col("pv"))
                .otherwise(F.col("nv"))
                * 10000
                + 0.5
            )
            / 10000
        ).alias("value"),
    )


@query(
    "c8_asof_tolerance",
    section="C8,E3",
    tags=("temporal",),
    oracle="""
SELECT p.event_id, p.user_id,
       CAST(epoch_ms(p.ts) - epoch_ms((
           SELECT max(c.ts) FROM events c
           WHERE c.event_type = 'click' AND c.user_id = p.user_id
             AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 2 HOUR
       )) AS BIGINT) AS ms_since_click_2h,
       CAST(epoch_ms((
           SELECT min(er.ts) FROM events er
           WHERE er.event_type = 'error' AND er.user_id = p.user_id
             AND er.ts >= p.ts AND er.ts < p.ts + INTERVAL 1 HOUR
       )) - epoch_ms(p.ts) AS BIGINT) AS ms_to_error_1h
FROM events p WHERE p.event_type = 'purchase'
""",
)
def c8_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8's full semantics matrix — pandas merge_asof's other modes:
    per purchase, the latest click AT OR BEFORE it but only within a
    2-hour TOLERANCE (stale state must not match — the difference
    between "last known price" and "price from last Tuesday"), and
    the FORWARD as-of: the first error within 1 hour after. NULL when
    nothing qualifies.

    Plan: both directions ride ONE union + ONE (user_id | ts, kind)
    sort shuffle — backward = running max of click ts over the
    preceding frame, forward = running min of error ts over the
    following frame; tolerance is a post-filter expression. Kind
    ordering (click 0 < purchase 1 < error 2) makes both boundaries
    inclusive exactly like the oracle's correlated subqueries, which
    express the same semantics declaratively (fine at fixture scale;
    the union-window IS the scale path — one shuffle, state = one
    timestamp per direction per key).
    """
    e = table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("kind"), "event_id"
    )
    errors = e.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.lit(2).alias("kind"),
        F.lit(None).cast("long").alias("event_id"),
    )
    u = clicks.unionByName(purchases).unionByName(errors)
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = u.select(
        "user_id",
        "ts",
        "kind",
        "event_id",
        F.max(F.when(F.col("kind") == 0, F.col("ts"))).over(wb).alias("last_click"),
        F.min(F.when(F.col("kind") == 2, F.col("ts"))).over(wf).alias("next_error"),
    ).where(F.col("kind") == 1)
    since_click = F.unix_millis("ts") - F.unix_millis("last_click")
    to_error = F.unix_millis("next_error") - F.unix_millis("ts")
    return carried.select(
        "event_id",
        "user_id",
        F.when(since_click <= 2 * 3600 * 1000, since_click).alias(
            "ms_since_click_2h"
        ),
        F.when(to_error < 3600 * 1000, to_error).alias("ms_to_error_1h"),
    )
