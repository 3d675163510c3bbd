"""Vector expression builders (SURVEY.md §2 G8/H7) — no UDFs.

Everything is built-in higher-order functions (zip_with / transform /
aggregate): JVM-side, codegen'd, Arrow-free. Precision contract: all
arithmetic is promoted to DOUBLE per element and folded left-to-right
in array order — the DuckDB oracles use the exact same fold, so dot
products match bit-for-bit (float32 shortcuts like DuckDB's
list_cosine_similarity shift the 6th decimal ~3% of the time — never
use them for oracle-checked results).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity. The fixture embeddings are unit-norm
    (FIXTURES.md) so this equals ``dot`` there; normalization kept for
    general inputs."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def vec_add(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x.cast("double") + y.cast("double"))


def vec_sub(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))


def vec_scale(a: Column, s: Column | float) -> Column:
    s = F.lit(s) if not isinstance(s, Column) else s
    return F.transform(a, lambda x: x.cast("double") * s)


def dot_sql(a: str, b: str) -> str:
    """DuckDB spelling of the same double-precision in-order fold."""
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


def lit_long_array(vals) -> Column:
    """Array-of-long literal built as ONE parsed SQL expression.

    Per-element ``F.array(*[F.lit(v) ...])`` costs one JVM round trip
    per element; a 64-dim coefficient vector built that way spends
    ~20 ms of DRIVER time per use and the graph-index bucket builders
    compose hundreds of them (measured 1.26 s per bucket column at
    r14). The single ``F.expr`` call carries the same literal values
    in one parse. Values must be exact ints (the ``L`` suffix makes
    each element a BIGINT literal, matching ``F.lit(int).cast("long")``).
    """
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in vals) + ")")


def lit_double_array(vals) -> Column:
    """Array-of-double literal as ONE parsed SQL expression (see
    :func:`lit_long_array`). ``repr(float)`` is the shortest
    round-tripping decimal form, so the parsed DOUBLE is bit-identical
    to ``F.lit(float(v))``; the ``D`` suffix forces DoubleType (bare
    decimals parse as DECIMAL in Spark SQL). Finite values only."""
    import math

    out = []
    for v in vals:
        f = float(v)
        if not math.isfinite(f):
            raise ValueError(f"non-finite literal {v!r} in array literal")
        out.append(f"{f!r}D")
    return F.expr("array(" + ",".join(out) + ")")
