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
    """Per-group KMV sketch: (group_col, u, k) rows, the ≤ k smallest
    distinct 60-bit md5 hashes of ``id_col`` — the bounded mergeable
    state a 100 TB distinct-count job ships between stages.

    The build-time ``k`` is CARRIED with the sketch as a constant
    column (VERDICT r11 #2): both the m<k exact branch and the (k-1)
    estimator numerator depend on it, and a sketch shipped between
    jobs (parquet, a message bus) would otherwise rely on out-of-band
    agreement. :func:`kmv_merge` and :func:`kmv_estimate` read k from
    the rows and RAISE on any mismatch — including the previously
    undetectable too-large case (a full k=64 sketch estimated at
    k=128 would silently take the not-full exact branch)."""
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
    ).withColumn("k", F.lit(int(k)))


def _checked_k(group_col: str, caller: str) -> Column:
    """Column expression: the carried per-group k, validated consistent
    WITHIN each group at runtime — min(k) over the group must equal
    max(k), else the rows came from sketches built with different k and
    any merge/estimate over them is meaningless; raise instead of
    silently mixing. The window is over ≤ a few k rows per group
    (sketch frames only)."""
    wk = Window.partitionBy(group_col)
    kmin, kmax = F.min("k").over(wk), F.max("k").over(wk)
    return F.when(
        kmin != kmax,
        F.raise_error(
            F.concat(
                F.lit(
                    f"{caller}: mixed build-time k within group "
                    "(sketches built with different k cannot be "
                    "combined) — group="
                ),
                F.col(group_col).cast("string"),
            )
        ).cast("int"),
    ).otherwise(F.col("k"))


def kmv_merge(
    s1: DataFrame, s2: DataFrame, group_col: str, k: int | None = None
) -> DataFrame:
    """Merge two sketches: union of their hash sets, re-ranked to the k
    smallest. The salted prune is skipped — inputs are ≤ k rows per
    group each by construction. ``k`` is read from the CARRIED column
    of the rows themselves and validated consistent across both inputs
    per group (VERDICT r11 #2); passing ``k`` explicitly additionally
    asserts the carried value equals it (raises at runtime otherwise)."""
    w = Window.partitionBy(group_col).orderBy("u")
    merged = (
        s1.unionByName(s2)
        .distinct()
        .withColumn("k", _checked_k(group_col, "kmv_merge"))
    )
    kcol = F.col("k")
    if k is not None:
        kcol = F.when(
            F.col("k") != int(k),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"kmv_merge(k={k}) does not match the sketch's "
                        "carried build-time k="
                    ),
                    F.col("k").cast("string"),
                )
            ).cast("int"),
        ).otherwise(F.col("k"))
    return (
        merged.withColumn("k", kcol)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.col("k"))
        .drop("_rn")
    )


def _estimate_expr(m: Column, umax: Column, kcol: Column) -> Column:
    """(k-1)/h_k with h_k = (umax+1)/2^60, quantized to 4 decimals via
    the cross-engine-exact IEEE floor form; a sketch that never filled
    (m < k) has seen every distinct hash, so the exact m is returned.
    Every operand is an exactly-representable double (k-1 is a small
    int, 2^60 a power of two, and their product exact for every k the
    sketch can carry; umax+1 rounds identically in both engines), so
    the single division is bit-identical to the DuckDB oracle's."""
    est = (
        (kcol - F.lit(1)).cast("double") * F.lit(float(KMV_HASH_BASE))
    ) / (umax + F.lit(1)).cast("double")
    return F.when(m < kcol, m.cast("double")).otherwise(
        F.floor(est * 10000 + F.lit(0.5)) / 10000
    )


def kmv_estimate(
    sketch: DataFrame, group_col: str, k: int | None = None
) -> DataFrame:
    """Distinct-count estimate from a sketch frame: one partial-agg
    shuffle over ≤ k rows per group. Columns: (group_col, sketch_size,
    est_distinct).

    The estimator's ``k`` comes from the sketch's CARRIED column
    (VERDICT r11 #2), validated consistent per group, so a mismatched
    estimate is impossible by construction: the previously
    undetectable too-LARGE case (a full k=64 sketch estimated at
    k=128 silently taking the not-full exact branch) now raises, as
    does the too-small case. Passing ``k`` explicitly asserts the
    carried value equals it — the migration path for callers that
    used to pass the build-time k by hand."""
    agg = sketch.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("sketch_size"),
        F.max("u").alias("_umax"),
        F.min("k").alias("_kmin"),
        F.max("k").alias("_kmax"),
    )
    kcol = F.when(
        F.col("_kmin") != F.col("_kmax"),
        F.raise_error(
            F.concat(
                F.lit(
                    "kmv_estimate: mixed build-time k within group "
                    "(sketches built with different k cannot be "
                    "combined) — group="
                ),
                F.col(group_col).cast("string"),
            )
        ).cast("int"),
    ).otherwise(F.col("_kmax"))
    if k is not None:
        kcol = F.when(
            F.col("_kmax") != int(k),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"kmv_estimate(k={k}) does not match the "
                        "sketch's carried build-time k="
                    ),
                    F.col("_kmax").cast("string"),
                )
            ).cast("int"),
        ).otherwise(kcol)
    guarded = F.when(
        F.col("sketch_size") > kcol,
        F.raise_error(
            F.concat(
                F.lit(
                    "kmv_estimate saw a sketch with more rows than its "
                    "carried k — corrupted sketch rows? group="
                ),
                F.col(group_col).cast("string"),
            )
        ).cast("double"),
    ).otherwise(
        _estimate_expr(F.col("sketch_size"), F.col("_umax"), kcol)
    )
    return agg.select(
        group_col,
        "sketch_size",
        guarded.alias("est_distinct"),
    )


def kmv_jaccard(
    s1: DataFrame, s2: DataFrame, group_col: str
) -> DataFrame:
    """Set-OVERLAP estimation from two KMV sketches (r13) — the
    theta-sketch intersection trick (Dasgupta et al., "Theta-Sketch
    Framework", and the KMV original Bar-Yossef et al. RANDOM'02 §4):
    the k smallest hashes of A ∪ B are a uniform sample of the union,
    so the fraction of them present in BOTH input sketches is an
    unbiased Jaccard estimate, and intersection ≈ jaccard × |A ∪ B|.
    This is the decontamination-at-scale primitive: "how much does my
    training corpus overlap that benchmark / yesterday's crawl?"
    answered by exchanging two k-row sketches — never joining the
    corpora (the exact answer at 100 TB is a full co-shuffle of both).

    Inputs are per-group sketch frames from :func:`kmv_sketch` /
    :func:`kmv_merge` (columns group, u, k; ≤ k rows per group; k
    carried and validated — mixed-k groups raise, same contract as
    merge/estimate). Output per group: sketch_size (|U_k|), jaccard,
    est_union, est_intersection. When the union sketch never filled
    (sketch_size < k) the union sample IS the whole union, so jaccard
    and est_intersection are EXACT, not estimates — the same exact
    small-regime degradation the point estimator has.

    Determinism: membership joins are over md5-derived hashes (both
    engines identical), jaccard is one IEEE division of two small
    ints, est_union the shared :func:`_estimate_expr`, and the product
    is 4-dp floor-quantized — every step bit-reproducible in DuckDB,
    so the whole surface is exactly oracle-checkable (pytest pins it
    against an inline DuckDB twin).

    Scale shape: both inputs are ≤ k rows per group by construction;
    the merge, the two membership joins and the final aggregate all
    run on k-bounded frames — the only corpus-sized work happened at
    sketch build time, once per corpus, reused by every overlap
    question asked afterwards."""
    u = kmv_merge(s1, s2, group_col)
    in_a = s1.select(
        group_col, "u", F.lit(1).alias("_in_a")
    ).distinct()
    in_b = s2.select(
        group_col, "u", F.lit(1).alias("_in_b")
    ).distinct()
    joined = (
        u.join(in_a, [group_col, "u"], "left")
        .join(in_b, [group_col, "u"], "left")
    )
    agg = joined.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("sketch_size"),
        F.max("u").alias("_umax"),
        F.min("k").alias("_kmin"),
        F.max("k").alias("_kmax"),
        F.sum(
            F.when(
                F.col("_in_a").isNotNull() & F.col("_in_b").isNotNull(), 1
            ).otherwise(0)
        ).alias("_both"),
    )
    kcol = F.when(
        F.col("_kmin") != F.col("_kmax"),
        F.raise_error(
            F.concat(
                F.lit(
                    "kmv_jaccard: mixed build-time k within group — "
                    "group="
                ),
                F.col(group_col).cast("string"),
            )
        ).cast("int"),
    ).otherwise(F.col("_kmax"))
    est_union = _estimate_expr(F.col("sketch_size"), F.col("_umax"), kcol)
    jacc = (
        F.floor(
            (
                F.col("_both").cast("double")
                / F.col("sketch_size").cast("double")
            )
            * 10000
            + F.lit(0.5)
        )
        / 10000
    )
    return agg.select(
        group_col,
        "sketch_size",
        jacc.alias("jaccard"),
        est_union.alias("est_union"),
        (F.floor(jacc * est_union * 10000 + F.lit(0.5)) / 10000).alias(
            "est_intersection"
        ),
    )


def kmv_containment(
    s1: DataFrame, s2: DataFrame, group_col: str
) -> DataFrame:
    """DIRECTIONAL overlap from two KMV sketches (r13): containment
    C(A in B) = |A ∩ B| / |A| — the question decontamination actually
    asks ("what fraction of the BENCHMARK is inside my training
    set?"), which Jaccard blurs whenever the two corpora differ in
    size (a 100-doc benchmark fully contained in a 1B-doc corpus has
    J ≈ 0 but C = 1). Estimated from the same sketch algebra as
    :func:`kmv_jaccard`: intersection ≈ J × est|A ∪ B| over the union
    sample, each side's cardinality from its own sketch — so the whole
    row is derived from two k-row frames, EXACT whenever the union
    sketch never fills, and deterministic end-to-end (every factor is
    an already-pinned expression: the union estimator, the membership
    fraction, the per-side estimators; the divisions are IEEE over
    identical operands, 4-dp floor-quantized).

    Output per group: est_a, est_b, est_intersection, and both
    directions —

    - ``containment_a_in_b`` = est_intersection / est_a: the fraction
      of A's distinct ids also present in B.
    - ``containment_b_in_a`` = est_intersection / est_b: the fraction
      of B's distinct ids also present in A.

    Both ratios are clamped to [0, 1] before quantization (ADVICE
    r13): est_intersection = J × est_union and each side's estimator
    carry independent error, so in the estimator regime the raw ratio
    can exceed 1.0 — out of range for a containment metric. The clamp
    is a LEAST against 1.0 over already-deterministic operands, so it
    stays bit-reproducible in DuckDB (oracle mirrors it).

    Scale shape: identical to kmv_jaccard — k-bounded frames only."""
    j = kmv_jaccard(s1, s2, group_col).select(
        group_col, "est_intersection"
    )
    ea = kmv_estimate(s1, group_col).select(
        group_col, F.col("est_distinct").alias("est_a")
    )
    eb = kmv_estimate(s2, group_col).select(
        group_col, F.col("est_distinct").alias("est_b")
    )
    q = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return (
        j.join(ea, group_col)
        .join(eb, group_col)
        .select(
            group_col,
            "est_a",
            "est_b",
            "est_intersection",
            q(
                F.least(
                    F.lit(1.0),
                    F.when(F.col("est_a") > 0,
                           F.col("est_intersection") / F.col("est_a"))
                    .otherwise(F.lit(0.0)),
                )
            ).alias("containment_a_in_b"),
            q(
                F.least(
                    F.lit(1.0),
                    F.when(F.col("est_b") > 0,
                           F.col("est_intersection") / F.col("est_b"))
                    .otherwise(F.lit(0.0)),
                )
            ).alias("containment_b_in_a"),
        )
    )
