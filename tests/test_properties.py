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
