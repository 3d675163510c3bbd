"""Skew mitigation: salted joins (SURVEY.md §4.3, north-star scale item).

AQE's OptimizeSkewedJoin splits oversized *sort-merge* partitions
automatically — prefer it. Salting is the manual fallback for the
cases AQE can't touch: skewed keys feeding stateful/custom operators,
hot keys in streaming joins, or engines/configs without AQE. The
technique: replicate the small side once per salt value, scatter the
big side uniformly across salts, join on (key, salt) — a hot key's
rows land on n_salts reducers instead of one.

Cost model: small side is replicated n_salts× (keep n_salts ≤ ~32 and
the small side genuinely small); big side gets one extra int column.
Results are bag-identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the big side's
    hot keys scattered across ``n_salts`` shuffle partitions.

    ``how`` supports 'inner' and 'left' (outer semantics on the small
    side would need per-salt null handling — use AQE for those)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_big = big.withColumn(
        _SALT, (F.rand(seed) * n_salts).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(_SALT)
    salted_small = small.select("*", salts)
    joined = salted_big.join(salted_small, [on, _SALT], how)
    return joined.drop(_SALT)
