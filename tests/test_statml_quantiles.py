"""Calibration teeth for the sampled-quantile production paths
(VERDICT r9 item 3c — promised by statml._rfm_per_cust's docstring
since round 9, delivered here).

e12_rfm_segmentation scores customers against quintile boundaries
taken from a deterministic 1024-row hash-sample instead of three
global ntile windows (the 100 TB shape). These tests pin the two
claims that design rests on:

1. the sampled boundaries CALIBRATE: each k-th boundary's empirical
   CDF over the FULL customer domain sandwiches k/5 (exactly when the
   sample IS the domain; within a DKW-style band when it subsamples);
2. the literal-comparison scoring projection is FAITHFUL: Spark's
   scored distribution equals an independent Python replica of the
   same boundary rule, row for row;
3. the declared plan contains NO window at all — the point of the r9
   rebuild (the r7-era form ran three global ntile windows over the
   customer domain; planlint now forbids unpartitioned windows).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from spark_glove_spark.operators.statml import (
    _RFM_N,
    _rfm_per_cust,
    _rfm_ranks,
)
from spark_glove_spark import api

SF_DIR = "/root/testdata/sf0.01"


def _collect_per_cust(spark):
    rows = _rfm_per_cust(spark, SF_DIR).collect()
    assert rows, "per-customer rollup is empty"
    return rows


def _sample(rows):
    """Replicate e12's deterministic boundary sample in pure Python:
    order by (md5('rfm|' || custkey), custkey), take _RFM_N."""
    keyed = sorted(
        rows,
        key=lambda r: (
            hashlib.md5(f"rfm|{r['o_custkey']}".encode()).hexdigest(),
            r["o_custkey"],
        ),
    )
    return keyed[:_RFM_N]


def _bounds(samp, metric, desc):
    vals = sorted((r[metric] for r in samp), reverse=desc)
    return [vals[rk - 1] for rk in _rfm_ranks(len(samp))]


def test_rfm_sampled_boundaries_calibrate_against_exact_quintiles(spark):
    """Sandwich: for each metric and each k, the full-domain empirical
    CDF brackets k/5 at the sampled boundary. Exactly (up to the 1/N
    order-statistic step) when n == N; within the DKW 99% band
    sqrt(ln(2/0.01)/(2n)) when the sample subsamples the domain."""
    rows = _collect_per_cust(spark)
    N = len(rows)
    samp = _sample(rows)
    n = len(samp)
    delta = 0.0 if n == N else math.sqrt(math.log(2 / 0.01) / (2 * n))
    for metric, desc in (("recency_d", True), ("freq", False), ("cents", False)):
        full = sorted((r[metric] for r in rows), reverse=desc)
        for k, b in zip((1, 2, 3, 4), _bounds(samp, metric, desc)):
            # CDF in the metric's scoring direction (desc for recency)
            lo = sum(1 for v in full if (v > b if desc else v < b)) / N
            hi = sum(1 for v in full if (v >= b if desc else v <= b)) / N
            assert lo < k / 5 + 1 / N + delta, (metric, k, lo)
            assert hi >= k / 5 - delta, (metric, k, hi)


def test_rfm_scoring_projection_matches_python_replica(spark):
    """The Spark-side literal-comparison scoring must agree with an
    independent Python replica of the same rule on every (r, f, m)
    cell — count AND exact-cents average."""
    rows = _collect_per_cust(spark)
    samp = _sample(rows)
    rb = _bounds(samp, "recency_d", desc=True)
    fb = _bounds(samp, "freq", desc=False)
    mb = _bounds(samp, "cents", desc=False)

    def score(v, bounds, desc):
        return 1 + sum(1 for b in bounds if (v < b if desc else v > b))

    counts: Counter = Counter()
    cents: Counter = Counter()
    for r in rows:
        key = (
            score(r["recency_d"], rb, True),
            score(r["freq"], fb, False),
            score(r["cents"], mb, False),
        )
        counts[key] += 1
        cents[key] += r["cents"]
    expected = {
        k: (counts[k], cents[k] // counts[k]) for k in counts
    }
    got = {
        (r["r_score"], r["f_score"], r["m_score"]): (
            r["n_customers"],
            r["avg_monetary_cents"],
        )
        for r in api.REGISTRY["e12_rfm_segmentation"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == expected


def test_rfm_declared_plan_has_no_window(spark):
    """The r9 rebuild's point: no ntile, no window of any kind — the
    boundary sample is a TakeOrderedAndProject and scoring is a
    map-side literal projection."""
    plan = (
        api.REGISTRY["e12_rfm_segmentation"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition" not in plan
    assert "WindowExec" not in plan and "Window " not in plan
