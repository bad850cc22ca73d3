"""Vector column expressions for embedding similarity.

Pure Catalyst (zip_with + aggregate) — sequential left-fold sums, which
match DuckDB's list_sum fold order bit-for-bit, so rounded cosines are
cross-engine deterministic. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column | str) -> Column:
    vec = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(vec, lambda x: x.cast("double"))


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def norm2(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x * x)))


def cosine(a: Column, b: Column) -> Column:
    """dot(a,b) / sqrt(|a|^2 * |b|^2) — single sqrt, mirrored exactly in the
    SQL oracles (sqrt(na)*sqrt(nb) would round differently)."""
    na = _fold_sum(F.transform(a, lambda x: x * x))
    nb = _fold_sum(F.transform(b, lambda x: x * x))
    return dot(a, b) / F.sqrt(na * nb)


def quantized(vec: Column, factor: int = 1000) -> Column:
    """Fixed-point int quantization: round(x*factor) as long. Integer dot
    products over these are *exact*, making LSH signatures engine-portable
    (float sums could flip a sign bit near zero)."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * factor).cast("long"))


def lsh_signature(vec: Column, planes: list[list[int]]) -> Column:
    """Random-hyperplane LSH bucket id from a fixed ±1 sign matrix.

    bit_i = (sum_d round(x_d*1000) * planes[i][d]) >= 0; bucket = Σ 2^i bit_i.
    All-integer arithmetic -> deterministic across engines.
    """
    q = quantized(vec)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        s = F.array(*[F.lit(v).cast("long") for v in plane])
        acc = F.aggregate(
            F.zip_with(q, s, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(acc >= 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))
    return bucket


def hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix (LCG — no RNG library variance)."""
    planes = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (2**31)
            row.append(1 if state & 1 else -1)
        planes.append(row)
    return planes
