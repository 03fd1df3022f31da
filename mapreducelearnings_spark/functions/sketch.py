"""Mergeable distinct-count sketches (KMV / k-minimum-values).

The reference's aggregation surface is exact (COUNT DISTINCT plans as
Catalyst's two-phase expand/aggregate — see query
``distinct_users_per_type``); at 100 TB the production substitute is a
SKETCH: a bounded per-group state that partials merge exactly, so the
distinct count of a petabyte group costs one k-row state instead of a
per-value shuffle. Spark ships HyperLogLog (``approx_count_distinct``),
but HLL register layouts differ across engines, so an HLL estimate can
never be oracle-compared value-for-value against DuckDB.

KMV (Bar-Yossef et al., RANDOM'02; the DataSketches "theta sketch"
family's simplest member) has none of that problem: the sketch IS the
k smallest values of a deterministic 60-bit hash of the ids, and the
estimator is one arithmetic expression over them —

    E[distinct] = (k - 1) / h_(k)        (h_(k) = k-th smallest hash,
                                          normalized to (0, 1])

Both sides here derive the hash from md5 (bit-identical in Spark and
DuckDB — the repo-wide determinism convention, `functions/text.md5_long`),
so the estimate is EXACTLY reproducible across engines: a sketch query
can sit in the driver's hash-compared correctness gate, which no HLL
can. Standard error is 1/sqrt(k-2) (~12.6% at k=64).

Scale shape: one distinct shuffle on (group, hash), then a SALTED
two-level top-k — per (group, hash % salt_mod) ranks first, so a group
with billions of distinct hashes never sorts through one task; the
final per-group rank sees at most k·salt_mod survivors. Merging two
sketches is the union of their value sets re-ranked to k — associative,
commutative, idempotent (pytest-pinned: merge(sketch(A), sketch(B)) ==
sketch(A ∪ B) exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import text as X

#: Hash domain: md5_long keeps 15 hex digits = 60 bits.
KMV_HASH_BASE = 1 << 60

#: Default sketch size. Standard error 1/sqrt(k-2) ≈ 12.6%.
KMV_K = 64


def _k_smallest(
    hashed: DataFrame, group_col: str, k: int, salt_mod: int
) -> DataFrame:
    """k smallest DISTINCT ``u`` per group, via the salted two-level
    rank: level 1 ranks within (group, u % salt_mod) — each a 1/salt_mod
    slice of the group, so no single task sorts a whole hot group —
    level 2 ranks the ≤ k·salt_mod survivors. Identical results to a
    single per-group rank (u is unique within a group after distinct)."""
    w1 = Window.partitionBy(group_col, "_salt").orderBy("u")
    pruned = (
        hashed.select(group_col, "u")
        .distinct()
        .withColumn("_salt", F.col("u") % salt_mod)
        .withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_salt", "_rn")
    )
    w2 = Window.partitionBy(group_col).orderBy("u")
    return (
        pruned.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int = KMV_K,
    salt_mod: int = 8,
) -> DataFrame:
    """Per-group KMV sketch: (group_col, u) rows, the ≤ k smallest
    distinct 60-bit md5 hashes of ``id_col`` — the bounded mergeable
    state a 100 TB distinct-count job ships between stages."""
    # NULL ids are dropped explicitly: a null hashes to null, which the
    # two engines then ORDER differently (Spark ranks nulls FIRST,
    # DuckDB LAST) — and a null contributes nothing to a distinct count
    # anyway. The guard keeps the sketch engine-deterministic even on
    # corpora with null keys (the fixtures have none).
    u = X.md5_long(F.col(id_col).cast("string")).alias("u")
    return _k_smallest(
        df.where(F.col(id_col).isNotNull()).select(group_col, u),
        group_col,
        k,
        salt_mod,
    )


def kmv_merge(
    s1: DataFrame, s2: DataFrame, group_col: str, k: int = KMV_K
) -> DataFrame:
    """Merge two sketches: union of their hash sets, re-ranked to the k
    smallest. The salted prune is skipped — inputs are ≤ k rows per
    group each by construction. ``k`` must equal the build-time k of
    BOTH inputs (see :func:`kmv_estimate` on why a mismatch cannot be
    fully detected from the rows alone)."""
    w = Window.partitionBy(group_col).orderBy("u")
    return (
        s1.unionByName(s2)
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def _estimate_expr(m: Column, umax: Column, k: int) -> Column:
    """(k-1)/h_k with h_k = (umax+1)/2^60, quantized to 4 decimals via
    the cross-engine-exact IEEE floor form; a sketch that never filled
    (m < k) has seen every distinct hash, so the exact m is returned.
    Every operand is an exactly-representable double (k-1 and 2^60 are
    small-mantissa; umax+1 rounds identically in both engines), so the
    single division is bit-identical to the DuckDB oracle's."""
    est = (F.lit(float(k - 1)) * F.lit(float(KMV_HASH_BASE))) / (
        umax + F.lit(1)
    ).cast("double")
    return F.when(m < k, m.cast("double")).otherwise(
        F.floor(est * 10000 + F.lit(0.5)) / 10000
    )


def kmv_estimate(
    sketch: DataFrame, group_col: str, k: int = KMV_K
) -> DataFrame:
    """Distinct-count estimate from a sketch frame: one partial-agg
    shuffle over ≤ k rows per group. Columns: (group_col, sketch_size,
    est_distinct).

    ``k`` MUST equal the ``k`` the sketch was built (and merged) with —
    both the m<k exact branch and the (k-1) numerator depend on it
    (ADVICE r10). A too-small ``k`` is caught at runtime: any group
    whose sketch holds more than ``k`` rows raises instead of silently
    mis-estimating. A too-LARGE ``k`` is undetectable from the rows
    alone (a full k=64 sketch looks like an unfilled k=128 one and
    takes the exact branch, underestimating) — callers that ship
    sketches between jobs should carry k out-of-band, as the registry
    queries do via the module constant :data:`KMV_K`."""
    agg = sketch.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("sketch_size"),
        F.max("u").alias("_umax"),
    )
    guarded = F.when(
        F.col("sketch_size") > k,
        F.raise_error(
            F.concat(
                F.lit(
                    f"kmv_estimate(k={k}) saw a sketch with more rows "
                    "than k — built with a larger k? group="
                ),
                F.col(group_col).cast("string"),
            )
        ).cast("double"),
    ).otherwise(
        _estimate_expr(F.col("sketch_size"), F.col("_umax"), k)
    )
    return agg.select(
        group_col,
        "sketch_size",
        guarded.alias("est_distinct"),
    )
