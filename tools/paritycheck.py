"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every declared query through Spark AND its oracle SQL through
DuckDB on the same sf dir, then compares row count, normalized schema,
and order-insensitive values (SURVEY.md §5.3.3: never ship a query
whose oracle we haven't matched locally).

Usage:
    python tools/paritycheck.py [sf_dir] [query_name ...]
Defaults to /root/testdata/sf0.01 and all registered queries.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_glove_spark import api  # noqa: E402
from spark_glove_spark.schemas import TABLES  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402


def _normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # final guard only — queries are expected to round explicitly
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_normalize_cell(x) for x in v)
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None) if v.tzinfo is not None else v
    if hasattr(v, "tolist"):  # numpy scalars/arrays
        return _normalize_cell(v.tolist())
    return v


def _canonical(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_normalize_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def driver_shape_problems(df: pd.DataFrame, side: str) -> list[str]:
    """Replicate the driver comparator's canonicalization step: pandas
    ``sort_values`` over the raw columns. The driver crashes with
    ``TypeError: unhashable type`` on array/map/struct cells (observed
    round 1 on d7_*), so any oracle-checked query whose output can't
    survive this step will read as FAILED driver-side even when the
    values match. Strict check is always on: it's cheap and there is no
    legitimate reason for an oracle query to emit complex cells."""
    try:
        cols = sorted(df.columns)
        df[cols].sort_values(by=cols, kind="mergesort")
        for c in cols:  # factorize is the other crash site driver-side
            pd.factorize(df[c])
    except TypeError as e:
        return [f"strict: driver comparator would crash on {side} ({e})"]
    return []


def dtype_kind_problems(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Replicate the driver's dtype-sensitive value hash (VERDICT r4
    item 2): DuckDB ``sum()`` over integers returns HUGEINT, which
    pandas materializes as float64/object, so the driver hashes
    ``14523.0`` against Spark's ``14523`` and reads FAIL even though
    ``14523.0 == 14523`` — invisible to the equality-normalizing value
    compare below. Flag any column whose pandas dtype *kind* is
    integral on one side and float on the other (repr differs ->
    driver hash differs). Integer-vs-object is flagged too when the
    object cells are floats."""
    problems = []
    INT, FLT = set("iu"), set("f")
    for c in set(spark_df.columns) & set(oracle_df.columns):
        sk, ok = spark_df[c].dtype.kind, oracle_df[c].dtype.kind
        pair = {sk, ok}
        if pair & INT and pair & FLT:
            problems.append(
                f"strict: dtype kind mismatch on '{c}' (spark {spark_df[c].dtype}"
                f" vs oracle {oracle_df[c].dtype}) — driver hash would differ;"
                " CAST the oracle aggregate (HUGEINT->BIGINT?)"
            )
        elif "O" in pair and pair & (INT | FLT):
            obj = oracle_df[c] if ok == "O" else spark_df[c]
            if any(isinstance(v, float) for v in obj.dropna().head(50)):
                problems.append(
                    f"strict: object-vs-numeric dtype on '{c}' with float cells"
                    f" (spark {spark_df[c].dtype} vs oracle {oracle_df[c].dtype})"
                )
    return problems


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    problems += driver_shape_problems(spark_df, "spark side")
    problems += driver_shape_problems(oracle_df, "oracle side")
    problems += dtype_kind_problems(spark_df, oracle_df)
    if problems:
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count {len(spark_df)} vs oracle {len(oracle_df)}")
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        problems.append(f"columns {sc} vs oracle {oc}")
        return problems
    a, b = _canonical(spark_df), _canonical(oracle_df)
    if a != b:
        n_diff = sum(1 for x, y in zip(a, b) if x != y) + abs(len(a) - len(b))
        problems.append(f"values differ ({n_diff} rows); first diff:")
        for x, y in zip(a, b):
            if x != y:
                problems.append(f"  spark : {x}")
                problems.append(f"  oracle: {y}")
                break
    return problems


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    # Sweep the DRIVER view (priority-windowed keys), i.e. exactly the
    # contract __spark_entry__ exposes — so the a0_NN_* remap itself is
    # exercised, not just the underlying queries. CLI args may use either
    # the driver key or the original registry name.
    qs, oracles = api.driver_queries(), api.driver_oracle_sql()
    by_original = {api.original_name(k): k for k in qs}
    requested = [a for a in args if not os.path.isdir(a)]
    names = [by_original.get(a, a) for a in requested] or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark("paritycheck")
    failed, rows_only = [], []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            # The driver canonicalizes rows-only results too (r6: the
            # ml_pca_project red row came from a rows-only query whose
            # array column crashed pandas sort_values) — so the strict
            # shape check applies to EVERY registered query, oracle or
            # not.
            shape = driver_shape_problems(sdf, "spark side")
            if shape:
                failed.append(name)
                print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
                for p in shape:
                    print(f"      {p}")
                continue
            rows_only.append(name)
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failed.append(name)
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"OK    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")

    print(
        f"\n{len(names) - len(failed)}/{len(names)} passed"
        + (f", {len(rows_only)} rows-only" if rows_only else "")
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
