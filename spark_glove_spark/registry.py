"""Query registry — the single contract between operators and the driver.

Every capability in SURVEY.md §2 is declared here as a named query:
a callable ``(SparkSession, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) the equivalent DuckDB oracle SQL. The
driver hash-compares both sides at sf0.01; ``tools/paritycheck.py``
replicates that comparison locally.

Determinism rules enforced by convention here (SURVEY.md §4.3.6):
  * alias every computed column identically in Spark and SQL;
  * round doubles that are accumulation-order sensitive;
  * integer/string grouping keys preferred; arrays sorted before output.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB SQL, or None -> rows-only check
    section: str  # SURVEY.md §2 operator id(s), e.g. "D1" or "H3,D9"
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, DeclaredQuery] = {}


def query(
    name: str,
    *,
    oracle: Optional[str] = None,
    section: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query. ``oracle=None`` -> rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver owns the SparkSession; pin the two session confs
            # that change result *values* so Spark and the DuckDB oracle
            # agree regardless of driver defaults (timestamps are
            # rendered in session TZ; DuckDB parquet timestamps are
            # UTC-naive).
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = DeclaredQuery(
            name=name,
            fn=wrapped,
            oracle=oracle,
            section=section,
            doc=(fn.__doc__ or "").strip(),
            tags=tuple(tags),
        )
        return wrapped

    return deco


def queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in sorted(REGISTRY.items()) if q.oracle is not None}
