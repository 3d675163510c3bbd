"""Hash-sketch expression builders: MinHash, SimHash, random-hyperplane
LSH (SURVEY.md §2 H13/H16; north-star dedup + similarity search).

All sketches are built from seeded, literal parameters (seed strings
baked into the plan; hyperplanes generated driver-side from a fixed
PRNG) so every run — and every engine executing the same plan — gets
identical buckets (SURVEY §4.3.6). Everything is expression-only:
xxhash64 + higher-order array functions; no UDFs, no shuffle until the
bucket groupBy.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def minhash_signature(shingles: Column, n_hashes: int = 16) -> Column:
    """MinHash signature: for each seed s, min over shingles of
    xxhash64(seed_s, shingle). Approximates Jaccard: P[sig_s(A) =
    sig_s(B)] = J(A, B). Returns array<bigint> of length n_hashes.

    Seeds are baked in as literal strings — xxhash64's own seed
    parameter isn't exposed as a column function, so the seed is mixed
    in as a prefix column, which is equivalent for independence."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda sh: F.xxhash64(F.lit(f"mh{s}"), sh))
            )
            for s in range(n_hashes)
        ]
    )


def band_buckets(signature: Column, n_bands: int, rows_per_band: int) -> Column:
    """LSH banding: split the signature into bands and hash each band.
    Returns array<struct<band:int, bucket:bigint>> to explode; docs
    sharing any (band, bucket) become candidate pairs. With b bands of
    r rows, P[candidate] = 1 − (1 − J^r)^b — the classic S-curve."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.lit(f"band{b}"),
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(signature, b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                    ),
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash fingerprint of a token multiset.

    For each bit position p, sum ±1 votes (weighted by occurrence)
    across token hashes; bit p of the fingerprint is the vote's sign.
    Near-identical documents differ in few bits (small Hamming
    distance). Expression-only: fold the token array once per bit —
    64 aggregate expressions, all fused by codegen in one pass."""
    def bit_vote(p: int) -> Column:
        return F.aggregate(
            tokens,
            F.lit(0).cast("long"),
            lambda acc, t: acc
            + F.when(
                F.shiftright(F.xxhash64(F.lit("sh"), t), p).bitwiseAND(F.lit(1)) == 1,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )

    fp = F.lit(0).cast("long")
    for p in range(64):
        fp = fp + F.when(bit_vote(p) > 0, F.lit(1).cast("long") * (2**p if p < 63 else -(2**63))).otherwise(F.lit(0))
    return fp


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))


def random_hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH, generated from a
    fixed PRNG and baked into the plan as literals."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit p = sign(vec · plane_p). Vectors within
    a bucket are cos-similar with high probability; collision prob for
    angle θ is (1 − θ/π)^n_planes."""
    from spark_glove_spark.functions.vector import lit_double_array

    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lits = lit_double_array(plane)
        d = F.aggregate(
            F.zip_with(vec, lits, lambda x, h: x.cast("double") * h),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(d > 0, F.lit(2**p).cast("long")).otherwise(F.lit(0))
    return bucket


def simhash64_hashes(tokens: Column) -> Column:
    """Per-token xxhash64 values (JVM-side, one hash per token) — the
    input to the vectorized SimHash vote fold below."""
    return F.transform(tokens, lambda t: F.xxhash64(F.lit("sh"), t))


def simhash64_fast(tokens: Column) -> Column:
    """simhash64 with the 64-bit vote fold in a vectorized numpy kernel
    instead of 64 codegen'd aggregates.

    Identical fingerprints (same per-token xxhash64 inputs, same
    arithmetic-shift bit votes, same two's-complement packing) —
    measured 3-4× faster end-to-end at sf0.1 because the O(tokens × 64)
    vote arithmetic runs as numpy bit-ops on an Arrow batch instead of
    interpreted/codegen'd Catalyst aggregates.
    """
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def fold(hash_arrays: pd.Series) -> pd.Series:
        shifts = np.arange(64, dtype=np.int64)
        out = np.zeros(len(hash_arrays), dtype=np.int64)
        for i, hs in enumerate(hash_arrays):
            if hs is None or len(hs) == 0:
                continue
            arr = np.asarray(hs, dtype=np.int64)
            bits = (arr[:, None] >> shifts) & np.int64(1)   # arithmetic shift = Spark shiftright
            votes = (2 * bits - 1).sum(axis=0)
            fp = np.uint64(0)
            set_bits = np.nonzero(votes > 0)[0]
            for p in set_bits:
                fp |= np.uint64(1) << np.uint64(p)
            out[i] = fp.astype(np.int64)
        return pd.Series(out)

    return fold(simhash64_hashes(tokens))
