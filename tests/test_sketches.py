"""Approximate-aggregate (sketch) surface with bounded-error contracts.

The ENGINE-NATIVE operators here (HyperLogLog++, KLL/GK quantiles,
Count-Min) are deliberately NOT in the oracle registry: their outputs
are estimator-dependent, so a DuckDB value-hash comparison would pin
implementation details rather than semantics. The correct contract is
an error bound against the exact answer computed by the engine itself
— the same shape the reference's counter-based approximations would
need. The KMV sketch (functions/sketch.py) is the one EXCEPTION
(ADVICE r10): its estimate is a single arithmetic expression over
md5-derived hashes, bit-identical across engines, so it IS
oracle-registered (`distinct_kmv_sketch`, `distinct_kmv_incremental`)
while HLL/KLL/CMS remain error-bound-only; its merge/associativity
invariants are pinned below.

At 100 TB these are the *default* forms: exact COUNT(DISTINCT) is a
full shuffle of every key, while HLL++ is a fixed 2^p-byte sketch per
partition merged associatively (one tiny shuffle); approx_percentile
replaces a full sort with a mergeable quantile sketch; count_min_sketch
replaces a per-key hash table with a fixed-size matrix. Each test
asserts the documented error envelope so a regression in how we call
them (wrong rsd, wrong accuracy knob) fails loudly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mapreducelearnings_spark.catalog import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


def test_hll_distinct_within_rsd(events):
    """approx_count_distinct(rsd=0.02) lands within 3*rsd of exact —
    global and per-group (the grouped form is the one that matters at
    scale: one 2^p sketch per (group, partition), merged)."""
    exact = events.select(
        F.countDistinct("user_id").alias("d")
    ).collect()[0]["d"]
    approx = events.select(
        F.approx_count_distinct("user_id", rsd=0.02).alias("d")
    ).collect()[0]["d"]
    assert abs(approx - exact) <= max(1, 3 * 0.02 * exact)

    ex = {
        r["event_type"]: r["d"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    ap = {
        r["event_type"]: r["d"]
        for r in events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("d"))
        .collect()
    }
    assert set(ex) == set(ap)
    for k in ex:
        assert abs(ap[k] - ex[k]) <= max(2, 3 * 0.02 * ex[k]), k


def test_approx_percentile_rank_error_bounded(lineitem):
    """approx_percentile(accuracy=a) guarantees rank error <= n/a: the
    returned value's true rank must sit within that window of the
    target rank."""
    accuracy = 1000
    n = lineitem.count()
    vals = [
        r["l_extendedprice"]
        for r in lineitem.select("l_extendedprice").collect()
    ]
    vals.sort()
    for q in (0.1, 0.5, 0.9, 0.99):
        est = lineitem.select(
            F.percentile_approx("l_extendedprice", q, accuracy).alias("p")
        ).collect()[0]["p"]
        # true rank window of the estimate
        import bisect

        lo = bisect.bisect_left(vals, est)
        hi = bisect.bisect_right(vals, est)
        target = q * n
        slack = n / accuracy + 1
        assert lo - slack <= target <= hi + slack, (q, est, lo, hi, target)


def test_count_min_sketch_overestimates_within_bound(events):
    """Count-Min never under-counts, and over-counts by at most
    eps*n with probability 1-delta (eps=0.01, delta=0.001 here; the
    fixture is far under the bound so a hard assert is safe)."""
    n = events.count()
    exact = {
        r["event_type"]: r["c"]
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    sketch_bytes = events.select(
        F.count_min_sketch(
            F.col("event_type"), F.lit(0.005), F.lit(0.001), F.lit(42)
        ).alias("s")
    ).collect()[0]["s"]
    # read the sketch back through the JVM helper
    spark = events.sparkSession
    jvm = spark._sc._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytes(sketch_bytes))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    eps_bound = 0.005 * 2.718281828 * n  # eps is relative to total count
    for k, c in exact.items():
        est = cms.estimateCount(k)
        assert est >= c, (k, est, c)
        assert est - c <= max(1, eps_bound), (k, est, c)


def test_approx_top_k_matches_exact_on_small_domain(spark, sf_dir, duck):
    """approx_top_k (Spark 4 sketch aggregate): with the domain (5
    event types) far under maxItemsTracked the sketch tracks every
    item exactly, so its top-3 must EQUAL the exact top-3 counts —
    the same contract style as the HLL/percentile/CMS entries
    (engine-specific sketch => pytest contract, not a value oracle)."""
    rows = spark.sql(
        "SELECT approx_top_k(event_type, 3) AS tk FROM {ev}",
        ev=spark.read.parquet(f"{sf_dir}/events.parquet"),
    ).collect()
    got = [(e["item"], e["count"]) for e in rows[0]["tk"]]
    exact = duck.execute(
        "SELECT event_type, COUNT(*) AS c FROM events "
        "GROUP BY 1 ORDER BY c DESC, event_type LIMIT 3"
    ).fetchall()
    assert [(i, c) for i, c in got] == [(i, int(c)) for i, c in exact]


def test_kmv_sketch_merge_is_exact(spark, sf_dir):
    """KMV is the one sketch in the family whose estimate IS
    cross-engine deterministic (md5-derived hashes, one IEEE division),
    so unlike HLL it carries a full value oracle (query
    `distinct_kmv_sketch`). What the oracle can't see is the MERGE
    algebra — the property that makes it a sketch at all. Pin it:
    merging the sketches of two disjoint halves equals the sketch of
    the whole, exactly (associativity/idempotence of union→re-rank-k),
    and estimates follow."""
    from mapreducelearnings_spark.functions import sketch as SK

    ev = load_table(spark, sf_dir, "events")
    a = SK.kmv_sketch(ev.where(F.col("event_id") % 2 == 0), "event_type", "user_id")
    b = SK.kmv_sketch(ev.where(F.col("event_id") % 2 == 1), "event_type", "user_id")
    merged = SK.kmv_merge(a, b, "event_type")
    whole = SK.kmv_sketch(ev, "event_type", "user_id")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    # idempotence: merging a sketch with itself is the sketch
    self_merged = SK.kmv_merge(a, a, "event_type")
    assert sorted(map(tuple, self_merged.collect())) == sorted(
        map(tuple, a.collect())
    )


def test_kmv_estimate_error_and_salt_invariance(spark):
    """Estimator contract on a domain big enough to fill the sketch
    (k=64): |est - n| within 4 standard errors (SE = 1/sqrt(k-2)), and
    the salted two-level top-k is an implementation detail — any
    salt_mod yields the identical sketch."""
    from mapreducelearnings_spark.functions import sketch as SK

    n = 5000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    sk8 = SK.kmv_sketch(df, "g", "v", salt_mod=8)
    sk1 = SK.kmv_sketch(df, "g", "v", salt_mod=1)
    assert sorted(r["u"] for r in sk8.collect()) == sorted(
        r["u"] for r in sk1.collect()
    )
    est = SK.kmv_estimate(sk8, "g").collect()[0]
    assert est["sketch_size"] == SK.KMV_K
    se = 1.0 / (SK.KMV_K - 2) ** 0.5
    assert abs(est["est_distinct"] - n) <= 4 * se * n


def test_kmv_estimate_rejects_mismatched_k(spark, sf_dir):
    """The sketch CARRIES its build-time k (VERDICT r11 #2), so an
    estimate declared with a different k raises at runtime in BOTH
    directions — too-small (k=1 over a k=64 sketch) and the previously
    undetectable too-LARGE case (k=128 over a full k=64 sketch, which
    without the carried column silently took the not-full exact branch
    and underestimated)."""
    from mapreducelearnings_spark.functions import sketch as SK

    ev = load_table(spark, sf_dir, "events")
    sk = SK.kmv_sketch(ev, "event_type", "user_id")  # k = 64
    with pytest.raises(Exception, match="kmv_estimate"):
        SK.kmv_estimate(sk, "event_type", k=1).collect()
    with pytest.raises(Exception, match="kmv_estimate"):
        SK.kmv_estimate(sk, "event_type", k=128).collect()
    # the carried k is authoritative: the declared-k form and the
    # default (read-from-rows) form agree exactly when they match
    a = sorted(map(tuple, SK.kmv_estimate(sk, "event_type").collect()))
    b = sorted(
        map(tuple, SK.kmv_estimate(sk, "event_type", k=SK.KMV_K).collect())
    )
    assert a == b


def test_kmv_merge_rejects_mixed_k(spark):
    """Merging sketches built with DIFFERENT k is meaningless (the
    re-rank bound and the estimator numerator disagree) — the carried
    k column makes the mix detectable, and kmv_merge raises instead of
    silently combining. Explicitly declared k that contradicts the
    carried value raises too."""
    from mapreducelearnings_spark.functions import sketch as SK

    df = spark.range(1000).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    sk64 = SK.kmv_sketch(df, "g", "v", k=64)
    sk32 = SK.kmv_sketch(df, "g", "v", k=32)
    with pytest.raises(Exception, match="kmv_merge"):
        SK.kmv_merge(sk64, sk32, "g").collect()
    with pytest.raises(Exception, match="kmv_merge"):
        SK.kmv_merge(sk64, sk64, "g", k=32).collect()
    # matching declared k passes and equals the undeclared form
    assert sorted(map(tuple, SK.kmv_merge(sk64, sk64, "g", k=64).collect())) == sorted(
        map(tuple, SK.kmv_merge(sk64, sk64, "g").collect())
    )


def test_kmv_sketch_drops_null_ids(spark):
    """NULL ids must not reach the rank: a null hashes to null, which
    Spark orders FIRST and DuckDB LAST — the one engine-divergent value
    in an otherwise bit-deterministic pipeline. The sketch over a
    corpus with nulls equals the sketch over the null-free corpus."""
    from mapreducelearnings_spark.functions import sketch as SK

    clean = spark.range(100).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    dirty = clean.unionByName(
        spark.range(5).select(
            F.lit("g").alias("g"), F.lit(None).cast("long").alias("v")
        )
    )
    assert sorted(r["u"] for r in SK.kmv_sketch(dirty, "g", "v").collect()) == sorted(
        r["u"] for r in SK.kmv_sketch(clean, "g", "v").collect()
    )


def test_kmv_jaccard_exact_in_small_regime(spark):
    """When the union sketch never fills (|A ∪ B| < k), the Jaccard is
    EXACT — the same exact-regime degradation the point estimator has.
    Crafted overlap: A = 0..29, B = 20..49 → |A∩B| = 10, |A∪B| = 50,
    J = 0.2."""
    from mapreducelearnings_spark.functions import sketch as K

    a = spark.range(0, 30).selectExpr("'g' AS grp", "id AS v")
    b = spark.range(20, 50).selectExpr("'g' AS grp", "id AS v")
    sa = K.kmv_sketch(a, "grp", "v")
    sb = K.kmv_sketch(b, "grp", "v")
    row = K.kmv_jaccard(sa, sb, "grp").collect()[0]
    assert row["sketch_size"] == 50
    assert row["jaccard"] == 0.2
    assert row["est_union"] == 50.0
    assert row["est_intersection"] == 10.0
    # commutative (the merge is a set union, membership is symmetric)
    row2 = K.kmv_jaccard(sb, sa, "grp").collect()[0]
    assert tuple(row) == tuple(row2)
    # self-overlap is exactly 1.0 x the union estimate
    srow = K.kmv_jaccard(sa, sa, "grp").collect()[0]
    assert srow["jaccard"] == 1.0
    assert srow["est_intersection"] == srow["est_union"]


def test_kmv_jaccard_matches_duckdb_exactly(spark, sf_dir, duck):
    """The whole overlap surface — union sketch, membership, jaccard,
    est_union, est_intersection — recomputed independently in DuckDB
    from the same parquet must match the Spark result VALUE-FOR-VALUE
    (the registry-grade determinism contract, held without a registry
    slot: per-event-type audience overlap against the 'purchase'
    cohort)."""
    from mapreducelearnings_spark.functions import sketch as K

    ev = load_table(spark, sf_dir, "events")
    sa = K.kmv_sketch(ev, "event_type", "user_id")
    ref = K.kmv_sketch(
        ev.where(F.col("event_type") == "purchase").withColumn(
            "event_type", F.lit("_ref")
        ),
        "event_type",
        "user_id",
    ).drop("event_type")
    groups = ev.select("event_type").distinct()
    sb = groups.crossJoin(ref)
    got = {
        r["event_type"]: (
            r["sketch_size"],
            r["jaccard"],
            r["est_union"],
            r["est_intersection"],
        )
        for r in K.kmv_jaccard(sa, sb, "event_type").collect()
    }
    kk = K.KMV_K
    base = float(K.KMV_HASH_BASE)
    sql = f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS UBIGINT) AS BIGINT) AS u
      FROM events WHERE user_id IS NOT NULL),
    sa AS (SELECT event_type, u FROM
           (SELECT event_type, u,
                   row_number() OVER (PARTITION BY event_type ORDER BY u)
                     AS rn FROM h)
           WHERE rn <= {kk}),
    refh AS (SELECT u FROM
             (SELECT u, row_number() OVER (ORDER BY u) AS rn
              FROM h WHERE event_type = 'purchase')
             WHERE rn <= {kk}),
    sb AS (SELECT g.event_type, refh.u
           FROM (SELECT DISTINCT event_type FROM events) g
           CROSS JOIN refh),
    un AS (SELECT event_type, u FROM
           (SELECT event_type, u,
                   row_number() OVER (PARTITION BY event_type ORDER BY u)
                     AS rn
            FROM (SELECT event_type, u FROM sa
                  UNION SELECT event_type, u FROM sb))
           WHERE rn <= {kk}),
    m AS (SELECT un.event_type,
                 COUNT(*) AS sketch_size,
                 MAX(un.u) AS umax,
                 SUM(CASE WHEN sa.u IS NOT NULL AND sb.u IS NOT NULL
                          THEN 1 ELSE 0 END) AS n_both
          FROM un
          LEFT JOIN sa ON un.event_type = sa.event_type AND un.u = sa.u
          LEFT JOIN sb ON un.event_type = sb.event_type AND un.u = sb.u
          GROUP BY un.event_type)
    SELECT event_type, sketch_size,
           FLOOR((CAST(n_both AS DOUBLE) / CAST(sketch_size AS DOUBLE))
                 * 10000 + 0.5) / 10000 AS jaccard,
           CASE WHEN sketch_size < {kk}
                THEN CAST(sketch_size AS DOUBLE)
                ELSE FLOOR(({float(kk - 1)} * {base}
                            / CAST(umax + 1 AS DOUBLE)) * 10000 + 0.5)
                     / 10000
           END AS est_union
    FROM m
    """
    want = {}
    for et, size, jac, eu in duck.sql(sql).fetchall():
        import math

        want[et] = (
            size,
            jac,
            eu,
            math.floor(jac * eu * 10000 + 0.5) / 10000,
        )
    assert got == want
    # the reference cohort overlapped with itself estimates J = 1
    assert got["purchase"][1] == 1.0


def test_kmv_containment_exact_and_asymmetric(spark):
    """Directional overlap: a small set fully inside a big one has
    containment 1.0 in that direction while Jaccard is far below — the
    distinction that makes containment (not Jaccard) the
    decontamination metric. Exact regime (union sketch never fills):
    A = 0..9 ⊂ B = 0..49 → C(A in B) = 1.0, C(B in A) = 0.2, J = 0.2."""
    from mapreducelearnings_spark.functions import sketch as K

    a = spark.range(0, 10).selectExpr("'g' AS grp", "id AS v")
    b = spark.range(0, 50).selectExpr("'g' AS grp", "id AS v")
    sa = K.kmv_sketch(a, "grp", "v")
    sb = K.kmv_sketch(b, "grp", "v")
    row = K.kmv_containment(sa, sb, "grp").collect()[0]
    assert row["est_a"] == 10.0 and row["est_b"] == 50.0
    assert row["est_intersection"] == 10.0
    assert row["containment_a_in_b"] == 1.0
    assert row["containment_b_in_a"] == 0.2
    jrow = K.kmv_jaccard(sa, sb, "grp").collect()[0]
    assert jrow["jaccard"] == 0.2


def test_kmv_containment_consistent_with_pinned_parts(spark, sf_dir):
    """On real data in the estimator regime, every containment column
    must equal the 4-dp-quantized ratio of the ALREADY-PINNED parts
    (kmv_jaccard's est_intersection over kmv_estimate's per-side
    estimates) — i.e. the function introduces no arithmetic of its
    own beyond the documented quantized divisions."""
    import math

    from mapreducelearnings_spark.functions import sketch as K

    ev = load_table(spark, sf_dir, "events")
    sa = K.kmv_sketch(ev, "event_type", "user_id")
    ref = K.kmv_sketch(
        ev.where(F.col("event_type") == "purchase").withColumn(
            "event_type", F.lit("_ref")
        ),
        "event_type",
        "user_id",
    ).drop("event_type")
    sb = ev.select("event_type").distinct().crossJoin(ref)
    inter = {
        r["event_type"]: r["est_intersection"]
        for r in K.kmv_jaccard(sa, sb, "event_type").collect()
    }
    ea = {
        r["event_type"]: r["est_distinct"]
        for r in K.kmv_estimate(sa, "event_type").collect()
    }
    eb = {
        r["event_type"]: r["est_distinct"]
        for r in K.kmv_estimate(sb, "event_type").collect()
    }
    got = K.kmv_containment(sa, sb, "event_type").collect()
    assert len(got) == len(inter)
    for r in got:
        et = r["event_type"]
        assert r["est_a"] == ea[et] and r["est_b"] == eb[et]
        assert r["est_intersection"] == inter[et]
        # the r14 clamp (ADVICE r13): ratio capped at 1.0 BEFORE the
        # 4-dp quantization — estimator error on independent sides can
        # push the raw ratio above 1
        assert r["containment_a_in_b"] == math.floor(
            min(1.0, inter[et] / ea[et]) * 10000 + 0.5
        ) / 10000
        assert r["containment_b_in_a"] == math.floor(
            min(1.0, inter[et] / eb[et]) * 10000 + 0.5
        ) / 10000
        assert 0.0 <= r["containment_a_in_b"] <= 1.0
        assert 0.0 <= r["containment_b_in_a"] <= 1.0


def test_kmv_containment_clamps_estimator_overshoot(spark):
    """The ADVICE-r13 clamp must ENGAGE: est_intersection = J × est_union
    and est_a carry independent estimator error, so the raw ratio can
    exceed 1.0. Hand-built sketch frames force that regime — side A's
    k-th hash is far larger than the union sample's (A saw a sparse
    hash tail, so est_a is small), while the union sample overlaps A
    almost entirely (J high, est_union large). The raw
    est_intersection/est_a is ≈2.2; the column must read exactly 1.0."""
    import math

    from mapreducelearnings_spark.functions import sketch as K

    B = K.KMV_HASH_BASE
    mk = lambda us: spark.createDataFrame(  # noqa: E731
        [("g", u, 4) for u in us], "grp string, u long, k int"
    )
    # k=4, both sketches full → estimator branch everywhere
    sa = mk([B // 10, B // 5, (3 * B) // 10, (9 * B) // 10])
    sb = mk([B // 10, B // 5, (3 * B) // 10, (31 * B) // 100])
    row = K.kmv_containment(sa, sb, "grp").collect()[0]
    # raw overshoot is real: intersection estimate exceeds est_a
    assert row["est_intersection"] > row["est_a"]
    # ... and the published metric is clamped into range
    assert row["containment_a_in_b"] == 1.0
    # the un-clamped direction still equals the quantized ratio of parts
    assert row["containment_b_in_a"] == math.floor(
        min(1.0, row["est_intersection"] / row["est_b"]) * 10000 + 0.5
    ) / 10000
    assert row["containment_b_in_a"] < 1.0
