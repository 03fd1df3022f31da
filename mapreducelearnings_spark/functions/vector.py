"""Vector math over ``array<float>`` embedding columns — pure column
expressions (F.zip_with / F.aggregate fold), no UDFs, so the arithmetic
stays in whole-stage codegen and is bit-identical to DuckDB's
sequential list folds (verified in tests).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    """Cast array<float> → array<double> before arithmetic: float math
    is engine-specific, double folds are bit-portable."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right fold — same operation order as DuckDB's
    list_dot_product, hence bit-exact parity."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def quantize8(unit_vec: Column) -> Column:
    """Symmetric int8 scalar quantization of a UNIT vector: component →
    floor(x·127 + 0.5), i.e. round-half-up into [−127, 127]. floor(+0.5)
    instead of round() because Spark rounds HALF_UP while DuckDB rounds
    half-to-even — the explicit form is bit-identical in both engines.
    Kept as array<long> (values fit int8; the storage win is realized by
    the parquet INT8 physical type at write time)."""
    return F.transform(unit_vec, lambda x: F.floor(x * 127.0 + 0.5))


def dot_int(a: Column, b: Column) -> Column:
    """Integer dot product — EXACT (no float summation-order noise at
    all: 64 products bounded by 127² sum far below 2⁵³), so quantized
    scores need no rounding for cross-engine parity."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def normalize_with(a: Column, norm_col: Column) -> Column:
    """Unit-normalize against a PRE-MATERIALIZED norm column so pairwise
    cosine collapses to a single dot fold — O(pairs·d) instead of
    O(3·pairs·d). The norm must be a plain column, not the norm() fold
    inline: expressions captured in HOF lambdas re-evaluate per element,
    which would recompute the fold d times per row."""
    return F.transform(a, lambda x: x / norm_col)


def dot_fixed(a: Column, b: Column, dims: int) -> Column:
    """:func:`dot` with a STATICALLY KNOWN length, unrolled into a
    left-to-right codegen add chain: a[0]·b[0] + a[1]·b[1] + … — the
    exact same IEEE addition order as the fold (the fold's leading
    0.0 + p₀ is exact), hence bit-identical results, but whole-stage
    codegen instead of per-row fold interpretation. Lesson 5 applied
    to the PQ encode/ADC hot paths: use this where the dot runs per
    CANDIDATE row (n×m×k encode argmin, ADC scans); keep the compact
    fold where volume is linear and plan width matters (Lesson 6)."""
    acc = None
    for i in range(dims):
        term = a.getItem(i) * b.getItem(i)
        acc = term if acc is None else acc + term
    return acc
