"""Property-based tests (hypothesis): random inputs, algebraic
invariants. Complements the fixture tests — the k-means cluster-id bug
showed that one data distribution is not enough.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from mapreducelearnings_spark.functions import skew as SK
from mapreducelearnings_spark.operators import graph as G
from mapreducelearnings_spark.operators import relational as R
from mapreducelearnings_spark.operators.asof import asof_join

edge_lists = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=1, max_size=40
)


@settings(max_examples=8, deadline=None)
@given(edges=edge_lists)
def test_salted_count_equals_direct_on_random_edges(spark, edges):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    direct = sorted(map(tuple, R.follower_count(df).collect()))
    salted = sorted(map(tuple, SK.salted_count(df, "dst").collect()))
    assert salted == direct


@settings(max_examples=6, deadline=None)
@given(edges=edge_lists)
def test_triangle_plans_agree_on_random_graphs(spark, edges):
    df = (
        spark.createDataFrame(edges, "src: long, dst: long")
        .where("src <> dst")
        .distinct()
    )
    if df.count() == 0:
        return
    a = G.triangle_count(df, broadcast_probe=False).first()["triangles"]
    b = G.triangle_count(df, broadcast_probe=True).first()["triangles"]
    assert a == b


@settings(max_examples=6, deadline=None)
@given(edges=edge_lists)
def test_star_cc_agrees_with_union_find_on_random_graphs(spark, edges):
    """Property form of the star-vs-union-find agreement: on arbitrary
    multigraphs (self-loops, duplicates, both directions) every
    star_rounds depth yields the identical labeling."""
    df = spark.createDataFrame(edges, "src: long, dst: long")
    base = {
        r["vertex"]: r["component"]
        for r in G.connected_components(spark, df).collect()
    }
    star = {
        r["vertex"]: r["component"]
        for r in G.connected_components_star(spark, df, star_rounds=2).collect()
    }
    assert star == base


@settings(max_examples=6, deadline=None)
@given(
    counts=st.lists(st.integers(0, 50), min_size=1, max_size=30),
    shards=st.integers(1, 8),
)
def test_two_phase_prefix_sum_matches_sequential(spark, counts, shards):
    """The distributed two-phase prefix sum equals the sequential
    cumulative sum for any value list and shard count (including
    n_shards > n_rows and zero values)."""
    from mapreducelearnings_spark.pipeline import packing as PK

    rows = [(i, c) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id: long, n_tokens: long")
    got = {
        r["doc_id"]: r["cum"]
        for r in PK._global_prefix_sum(spark, df, n_shards=shards).collect()
    }
    acc, want = 0, {}
    for i, c in enumerate(counts):
        acc += c
        want[i] = acc
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(0, 99)),
        min_size=1,
        max_size=15,
    ),
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=1, max_size=10
    ),
)
def test_asof_join_matches_python_reference(spark, rights, lefts):
    """asof_join ≡ the obvious per-row Python computation: latest right
    (by ts, then id) with same key and ts ≤ left ts."""
    rdf = spark.createDataFrame(rights, "k: long, t: long, rid: long")
    lefts_id = [(k, t, i) for i, (k, t) in enumerate(lefts)]
    ldf = spark.createDataFrame(lefts_id, "k: long, t: long, lid: long")
    out = {
        r["lid"]: r["rid"]
        for r in asof_join(
            ldf, rdf, "k", "t", "t", right_payload=["rid"], tiebreak="rid"
        ).collect()
    }
    for k, t, lid in lefts_id:
        cands = [(rt, rid) for (rk, rt, rid) in rights if rk == k and rt <= t]
        expect = max(cands)[1] if cands else None
        assert out[lid] == expect, (lid, k, t, cands)


@settings(max_examples=6, deadline=None)
@given(
    points=st.lists(st.integers(0, 200), min_size=1, max_size=15),
    intervals=st.lists(
        st.tuples(st.integers(0, 200), st.integers(1, 60)),
        min_size=1,
        max_size=10,
    ),
    band=st.integers(1, 80),
)
def test_banded_interval_join_property(spark, points, intervals, band):
    """banded_interval_join ≡ brute-force lo<=x<hi for arbitrary point
    sets, interval lengths, and band widths (including bands smaller
    AND larger than every interval)."""
    from mapreducelearnings_spark.operators.rangejoin import (
        banded_interval_join,
    )

    pdf = spark.createDataFrame(
        [(i, x) for i, x in enumerate(points)], "pid long, x long"
    )
    ivs = [(i, lo, lo + ln) for i, (lo, ln) in enumerate(intervals)]
    idf = spark.createDataFrame(ivs, "iid long, lo long, hi long")
    got = sorted(
        (r["pid"], r["iid"])
        for r in banded_interval_join(pdf, idf, "x", "lo", "hi", band).collect()
    )
    want = sorted(
        (pi, ii)
        for pi, x in enumerate(points)
        for ii, lo, hi in ivs
        if lo <= x < hi
    )
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=50,
        unique=True,
    )
)
def test_morton_spread_is_injective_and_orders_locally(pairs):
    """The mask-ladder bit spread is the Morton interleave: zvals are
    unique per (ux,tx) pair and decode back exactly (pure-Python mirror
    of the column expression / SQL ladder)."""

    def spread(x):
        for shift, mask in [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]:
            x = (x | (x << shift)) & mask
        return x

    def unspread(x):
        for shift, mask in [(1, 0x33333333), (2, 0x0F0F0F0F), (4, 0x00FF00FF), (8, 0x0000FFFF)]:
            x = (x | (x >> shift)) & mask
        return x

    zvals = {}
    for ux, tx in pairs:
        z = spread(ux) | (spread(tx) << 1)
        assert unspread(z & 0x55555555) == ux
        assert unspread((z >> 1) & 0x55555555) == tx
        zvals[z] = (ux, tx)
    assert len(zvals) == len(pairs)  # injective
