"""Named query registry: every SURVEY.md §2 operator as a (Spark, oracle)
pair.

Each :class:`QuerySpec` binds a PySpark implementation ``(spark, sf_dir)
-> DataFrame`` to the ANSI-SQL string a DuckDB oracle runs on the same
parquet tables. The driver compares row count + schema + order-insensitive
value hash, sorting columns by name — so every computed column is aliased
identically on both sides, doubles produced by accumulation are rounded
on both sides (kills summation-order ulp noise), and every LIMIT carries
a unique tiebreaker.

Oracle-free specs (``oracle=None``) are genuinely non-SQL-expressible
(engine-specific hashing, stateful streaming); the driver records a
rows-only check for those.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import (
    FOLLOWER_EDGES_SQL,
    GRAPH_EDGES_SQL,
    follower_edges,
    graph_edges,
    load_table,
)
from .operators import graph as G
from .operators import kmeans as KM
from .operators import relational as R

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# Runtime SQL confs every query needs regardless of who built the
# SparkSession (the driver passes its own). Both are runtime-settable.
_REQUIRED_CONFS = {
    # events.parquet carries TIMESTAMP(NANOS); without this the scan throws
    # PARQUET_TYPE_ILLEGAL. The catalog converts the long nanos back.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # parquet NTZ timestamps must mean the same instant as DuckDB's naive
    # timestamps (oracle parity), so pin the session zone.
    "spark.sql.session.timeZone": "UTC",
}


def _ensure_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: SparkQuery) -> SparkQuery:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(name=name, spark=wrapped, oracle=oracle, doc=doc)
        return fn

    return deco


# ===========================================================================
# §2.3 Aggregations
# ===========================================================================


@register(
    "follower_count",
    f"SELECT dst, COUNT(*) AS cnt FROM ({FOLLOWER_EDGES_SQL}) GROUP BY dst",
    doc="Flagship grouped count (ReduceByKey/.../FollowersCount.scala:26-28).",
)
def q_follower_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.follower_count(follower_edges(spark, sf_dir))


@register(
    "follower_sum",
    """
    SELECT l_suppkey AS dst, ROUND(SUM(l_quantity), 4) AS val_sum
    FROM lineitem GROUP BY l_suppkey
    """,
    doc="foldByKey/aggregateByKey twin: grouped sum "
    "(FoldByKey/.../FollowersCount.scala:27).",
)
def q_follower_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(F.col("l_suppkey").alias("dst"), F.col("l_quantity").alias("qty"))
    out = R.follower_sum(edges, "dst", "qty")
    return out.select("dst", F.round("val_sum", 4).alias("val_sum"))


@register(
    "pricing_summary",
    """
    SELECT
      l_returnflag, l_linestatus,
      ROUND(SUM(l_quantity), 4) AS sum_qty,
      ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
      ROUND(AVG(l_quantity), 4) AS avg_qty,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Multi-aggregate grouped scan (filter pushdown + partial agg in one "
    "pass — the pattern the reference's counter piggybacking approximates, "
    "K-means/.../CountFollowers.java:56-63).",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "grouped_sum",
    """
    SELECT o_custkey, ROUND(SUM(o_totalprice), 4) AS total_spent,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
    doc="Grouped sum (PageRankDataSet/.../FollowerCount.scala:64).",
)
def q_grouped_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 4).alias("total_spent"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "grouped_min_max",
    """
    SELECT l_suppkey, MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_suppkey
    """,
    doc="Grouped min/max (SingleSourceShortestPathDataSet/.../FollowerCount."
    "scala:46; reduceByKey(min) twin at SingleSourceShortestPathRDD:40).",
)
def q_grouped_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.min("l_quantity").alias("min_qty"), F.max("l_quantity").alias("max_qty")
    )


@register(
    "global_agg",
    """
    SELECT MIN(l_quantity) AS min_q, MAX(l_quantity) AS max_q,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           ROUND(SUM(POW(l_quantity - 25.0, 2)), 2) AS sse,
           COUNT(*) AS cnt
    FROM lineitem
    """,
    doc="One-pass global multi-aggregate — replaces the reference's "
    "MIN/MAX/SSE Hadoop counters (K-means/.../CountFollowers.java:56-63,"
    "133-140); Catalyst fuses all five into one scan.",
)
def q_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.min("l_quantity").alias("min_q"),
        F.max("l_quantity").alias("max_q"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum(F.pow(F.col("l_quantity") - 25.0, F.lit(2))), 2).alias("sse"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "grouped_collect",
    """
    SELECT l_orderkey, list_sort(list(DISTINCT l_suppkey)) AS suppliers
    FROM lineitem GROUP BY l_orderkey
    """,
    doc="Adjacency-list build: grouped collect to array "
    "(SingleSourceShortestPathDataSet/.../FollowerCount.scala:30; dedup per "
    "RepJoin/.../CountFollowers.java:59-61). Sorted so the hash is "
    "order-stable.",
)
def q_grouped_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_suppkey")).alias("suppliers")
    )


# ===========================================================================
# §2.2 Projections / filters / predicates  +  §2.7 scalar functions
# ===========================================================================


@register(
    "max_filter",
    f"SELECT src, dst FROM ({FOLLOWER_EDGES_SQL}) WHERE src <= 1000 AND dst <= 1000",
    doc="Dataset down-sampling by id cap, pushed to the scan "
    "(RepJoin/.../CountFollowers.java:55,90).",
)
def q_max_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.max_filter(follower_edges(spark, sf_dir), 1000)


@register(
    "case_when",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS size_class
    FROM orders
    """,
    doc="Conditional expression (when/otherwise init at "
    "SingleSourceShortestPathDataSet/.../FollowerCount.scala:33).",
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_class"),
    )


@register(
    "scalar_gauntlet",
    """
    SELECT p_partkey,
           concat_ws('-', p_brand, p_type) AS brand_type,
           string_split(p_type, ' ')[1] AS type_head,
           ROUND(ABS(p_retailprice - 1000.0), 4) AS abs_diff,
           ROUND(POW(p_size, 2), 1) AS size_sq,
           LEAST(p_size, 25) AS lsize,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor
    FROM part
    """,
    doc="Scalar function parity set: split/concat_ws/abs/pow/least/cast "
    "(SURVEY.md §2.7 inventory).",
)
def q_scalar_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.round(F.abs(F.col("p_retailprice") - 1000.0), 4).alias("abs_diff"),
        F.round(F.pow(F.col("p_size"), F.lit(2)), 1).alias("size_sq"),
        F.least(F.col("p_size"), F.lit(25)).alias("lsize"),
        F.floor(F.col("p_retailprice")).cast("long").alias("price_floor"),
    )


@register(
    "distinct_pairs",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    doc="Distinct-ify (RepJoin/.../CountFollowers.java:59-61 value dedup).",
)
def q_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@register(
    "explode_tokens",
    r"""
    SELECT lower(tok) AS token, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split_regex(text, '\s+')) AS tok FROM documents)
    WHERE tok <> ''
    GROUP BY lower(tok)
    """,
    doc="Tokenize + explode + grouped count: flatMap analogue "
    "(SingleSourceShortestPathRDD/.../FollowerCount.scala:39; explode at "
    "SingleSourceShortestPathDataSet:44).",
)
def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return R.word_count(docs)


# ===========================================================================
# §2.4 Joins
# ===========================================================================


@register(
    "inner_join",
    """
    SELECT o_orderkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    doc="Shuffle equi-join (PageRankRDD/.../FollowerCount.scala:59; "
    "reduce-side join ReduceSideJoin/.../CountFollowers.java:26-90).",
)
def q_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@register(
    "right_outer_join",
    """
    SELECT c_custkey, c_name, o_orderkey
    FROM orders RIGHT OUTER JOIN customer ON o_custkey = c_custkey
    """,
    doc="Right-outer join keeps row-less keys "
    "(SingleSourceShortestPathRDD/.../FollowerCount.scala:38).",
)
def q_right_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right_outer").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@register(
    "semi_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
    doc="Left-semi join — existence probe, the reference emulates it with "
    "an inner join + counting (ReduceSideJoin/.../CountFollowers.java:92-164).",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "broadcast_join",
    """
    SELECT c_custkey, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
    doc="Replicated/broadcast dimension join — zero shuffle of the fact "
    "side (RepJoin/.../CountFollowers.java:31-77,146).",
)
def q_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return R.broadcast_join(
        R.broadcast_join(c, n, c.c_nationkey == n.n_nationkey),
        r,
        F.col("n_regionkey") == r.r_regionkey,
    ).select("c_custkey", "n_name", "r_name")


@register(
    "two_hop_paths",
    f"""
    WITH e AS ({GRAPH_EDGES_SQL})
    SELECT a.src AS src, b.dst AS dst, COUNT(*) AS n_paths
    FROM e a JOIN e b ON a.dst = b.src
    GROUP BY a.src, b.dst
    """,
    doc="Two-hop self-join: paths of length 2 "
    "(ReduceSideJoin/.../CountFollowers.java:79-89).",
)
def q_two_hop_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.two_hop_paths(graph_edges(spark, sf_dir))


# ===========================================================================
# §2.5 Sorts / top-k   §2.6 Set operations
# ===========================================================================


@register(
    "top_k",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
    """,
    doc="Top-k via TakeOrderedAndProject — per-partition heaps, k-row "
    "driver merge, no global sort (PageRankDataSet/.../FollowerCount."
    "scala:76). o_orderkey tiebreak makes the row set deterministic.",
)
def q_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return R.top_k(
        o.select("o_orderkey", "o_totalprice"),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        100,
    )


@register(
    "union_reagg",
    """
    SELECT k, ROUND(SUM(v), 4) AS v FROM (
        SELECT o_custkey AS k, o_totalprice AS v FROM orders
        UNION ALL
        SELECT c_custkey AS k, c_acctbal AS v FROM customer
    ) GROUP BY k
    """,
    doc="Union + re-aggregate: the reference's outer-join-by-union idiom "
    "(PageRankRDD/.../FollowerCount.scala:66; DF twin PageRankDataSet:70).",
)
def q_union_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    left = o.select(F.col("o_custkey").alias("k"), F.col("o_totalprice").alias("v"))
    right = c.select(F.col("c_custkey").alias("k"), F.col("c_acctbal").alias("v"))
    out = R.union_reaggregate(left, right, "k", "v")
    return out.select("k", F.round("v", 4).alias("v"))


# ===========================================================================
# §2.10 Windowed event aggregation (batch twin of the streaming surface)
# ===========================================================================


@register(
    "window_events",
    """
    SELECT CAST(FLOOR(epoch(ts) / 600) * 600 AS BIGINT) AS window_start,
           event_type,
           COUNT(*) AS cnt,
           ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="Tumbling 10-minute window aggregation over events; same F.window "
    "expression works under Structured Streaming (SURVEY.md §2.10). Window "
    "start exported as epoch seconds to sidestep cross-engine timestamp "
    "hashing.",
)
def q_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


# ===========================================================================
# §2.8 Iterative / graph algorithms — oracles are the same computation
# unrolled into ANSI SQL (chain generation via range(), PageRank as 10
# chained CTEs, SSSP as a bounded recursive CTE, k-means as unrolled
# assign/update rounds), so DuckDB independently recomputes the fixpoint.
# ===========================================================================

_PR_K = 100
_PR_ITERS = 10


def _pagerank_oracle(k: int, iterations: int, final_select: str) -> str:
    n = k * k
    parts = [
        f"WITH verts AS (SELECT CAST(range AS BIGINT) AS v FROM range(1, {n + 1})),",
        f"edges AS (SELECT v AS src, CASE WHEN v % {k} = 0 THEN 0 ELSE v + 1 END AS dst FROM verts),",
        f"r0 AS (SELECT v, 1.0/{n} AS r FROM verts UNION ALL SELECT 0, 0.0),",
    ]
    # MATERIALIZED: each level is referenced 2-3× by the next; DuckDB
    # would otherwise inline CTEs and the plan grows exponentially.
    for i in range(1, iterations + 1):
        parts.append(
            f"t{i} AS MATERIALIZED (SELECT e.dst AS v, SUM(r.r) AS m FROM edges e "
            f"JOIN r{i - 1} r ON e.src = r.v GROUP BY e.dst),"
        )
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT b.v AS v, CASE WHEN b.v = 0 THEN 0.0 ELSE "
            f"COALESCE(t{i}.m, 0.0) + "
            f"(SELECT COALESCE(MAX(m), 0.0) FROM t{i} WHERE v = 0) / {n}.0 END AS r "
            f"FROM r{i - 1} b LEFT JOIN t{i} ON b.v = t{i}.v),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(final_select.format(last=f"r{iterations}"))
    return "\n".join(parts)


@register(
    "pagerank_idfilter",
    _pagerank_oracle(
        _PR_K,
        _PR_ITERS,
        "SELECT v AS vertex, ROUND(r, 9) AS rank FROM {last} WHERE v <= 100",
    ),
    doc="PageRank on the k=100 chain graph, 10 iterations, RDD-variant "
    "output: vertices with id <= 100 (PageRankRDD/.../FollowerCount."
    "scala:72-73; dummy vertex 0 included at rank 0).",
)
def q_pagerank_idfilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks = G.pagerank_chain(spark, k=_PR_K, iterations=_PR_ITERS)
    return ranks.where(F.col("vertex") <= 100).select(
        "vertex", F.round("rank", 9).alias("rank")
    )


@register(
    "pagerank_topk",
    _pagerank_oracle(
        _PR_K,
        _PR_ITERS,
        "SELECT v AS vertex, ROUND(r, 9) AS rank FROM {last} "
        "ORDER BY ROUND(r, 9) DESC, v ASC LIMIT 100",
    ),
    doc="PageRank, DataFrame-variant output: top-100 by rank "
    "(PageRankDataSet/.../FollowerCount.scala:76). Chain symmetry makes "
    "ranks k-way tied; vertex-id tiebreak keeps the row set deterministic.",
)
def q_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks = G.pagerank_chain(spark, k=_PR_K, iterations=_PR_ITERS)
    return R.top_k(
        ranks.select("vertex", F.round("rank", 9).alias("rank")),
        [F.desc("rank"), F.asc("vertex")],
        100,
    )


@register(
    "sssp_distances",
    f"""
    WITH RECURSIVE e AS ({GRAPH_EDGES_SQL}),
    -- no top-level UNION here: under WITH RECURSIVE, DuckDB would treat
    -- its branches as anchor/recursive and skip the distinct
    verts AS (SELECT DISTINCT v FROM
              (SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e)),
    bfs AS (
        SELECT CAST(1 AS BIGINT) AS v, 0 AS d
        UNION
        SELECT e.dst AS v, b.d + 1 AS d FROM bfs b JOIN e ON e.src = b.v
        WHERE b.d < 128
    ),
    md AS (SELECT v, MIN(d) AS d FROM bfs GROUP BY v)
    SELECT verts.v AS vertex, CAST(md.d AS DOUBLE) AS distance
    FROM verts LEFT JOIN md ON verts.v = md.v
    """,
    doc="SSSP hop distances from vertex 1 over the derived cyclic graph "
    "(SingleSourceShortestPathRDD/.../FollowerCount.scala:36-51). "
    "Unreachable vertices surface as NULL here (engine-internal +inf is "
    "not hash-portable); the library keeps the reference's +inf.",
)
def q_sssp_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    dist = G.sssp(spark, graph_edges(spark, sf_dir), source=1)
    return dist.select(
        "vertex",
        F.when(F.col("dist") == G.INF, F.lit(None).cast("double"))
        .otherwise(F.col("dist"))
        .alias("distance"),
    )


_TRIANGLE_ORACLE = f"""
    WITH e AS ({GRAPH_EDGES_SQL})
    SELECT COUNT(*) // 3 AS triangles
    FROM e a JOIN e b ON a.dst = b.src JOIN e c
      ON b.dst = c.src AND c.dst = a.src
"""


@register(
    "triangle_count",
    _TRIANGLE_ORACLE,
    doc="Triangle count, shuffle-join plan (ReduceSideJoin/.../"
    "CountFollowers.java:79-164; count/3 per RepJoin:119).",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.triangle_count(graph_edges(spark, sf_dir), broadcast_probe=False)


@register(
    "triangle_count_broadcast",
    _TRIANGLE_ORACLE,
    doc="Triangle count, broadcast-probe plan (RepJoin/.../CountFollowers."
    "java:92-122) — same result as triangle_count by construction; the "
    "pair reproduces the reference's cross-implementation oracle "
    "(SURVEY.md §5).",
)
def q_triangle_count_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.triangle_count(graph_edges(spark, sf_dir), broadcast_probe=True)


_KM_K = 4
_KM_ROUNDS = 5


def _kmeans_oracle(k: int, rounds: int) -> str:
    parts = [
        "WITH pts AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS w FROM "
        "(SELECT o_totalprice AS x FROM orders) GROUP BY x),",
        f"c0 AS (SELECT CAST(j AS BIGINT) AS cid, (SELECT MAX(x) FROM pts) / {k}.0 * j AS c "
        f"FROM range(1, {k + 1}) t(j)),",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"a{i} AS (SELECT p.x, p.w, "
            f"(MIN({{'d': abs(p.x - c.c), 'cid': c.cid}})).cid AS cid "
            f"FROM pts p CROSS JOIN c{i - 1} c GROUP BY p.x, p.w),"
        )
        parts.append(
            f"c{i} AS (SELECT cid, SUM(x * w) / SUM(w) AS c FROM a{i} GROUP BY cid),"
        )
    parts.append(
        f"afin AS (SELECT p.x, p.w, "
        f"(MIN({{'d': abs(p.x - c.c), 'cid': c.cid}})).cid AS cid "
        f"FROM pts p CROSS JOIN c{rounds} c GROUP BY p.x, p.w)"
    )
    parts.append(
        f"SELECT a.cid AS cluster_id, ROUND(c.c, 4) AS centroid, "
        f"SUM(a.w) AS n_points FROM afin a JOIN c{rounds} c ON a.cid = c.cid "
        f"GROUP BY a.cid, c.c"
    )
    return "\n".join(parts)


@register(
    "kmeans_centroids",
    _kmeans_oracle(_KM_K, _KM_ROUNDS),
    doc="1-D k-means over o_totalprice, k=4, 5 fixed assign/update rounds "
    "(K-means/.../CountFollowers.java:172-203; seeding max/k·j per "
    ":224-236, nearest-by-abs-distance assignment per :272-274). The "
    "convergence-tested variant is exercised in pytest; fixed rounds keep "
    "the oracle SQL-unrollable.",
)
def q_kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    out = KM.kmeans_1d(
        orders, "o_totalprice", k=_KM_K, fixed_iterations=_KM_ROUNDS
    )
    return out.select(
        "cluster_id", F.round("centroid", 4).alias("centroid"), "n_points"
    )
