"""Graph algorithm layer: PageRank, SSSP, triangle counting — the
reference's signature iterative capability (SURVEY.md §2.8), expressed
as DataFrame loop bodies under the :mod:`..plans.iterate` runner.

Reference parity cites (behavior studied, no code taken):
- chain-graph generator + PageRank w/ dummy-vertex dangling mass:
  PageRankRDD/src/main/scala/wc/FollowerCount.scala:33-70 (the RDD
  variant's semantics — vertex 0 pinned to rank 0 — are the
  mathematically intended ones; the DF twin PageRankDataSet:70 has a
  when/otherwise quirk that also credits vertex 0, documented not
  reproduced, per SURVEY.md §4 item 2).
- SSSP (parallel BFS with min-relaxation):
  SingleSourceShortestPathRDD/src/main/scala/wc/FollowerCount.scala:36-51.
- triangle counting, shuffle and broadcast variants:
  ReduceSideJoin/src/main/java/wc/CountFollowers.java:79-164;
  RepJoin/src/main/java/wc/CountFollowers.java:92-122 (count/3 at :119).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.iterate import iterate, loop_conf, loop_width

INF = float("inf")

# scoped small-state loop tuning (partitions + AQE); see plans.iterate
_loop_shuffle_partitions = loop_conf

# r15 NEGATIVE RESULT (VERDICT r14 Next #1, examined and REJECTED): the
# PageRank dangling delta is read back per iteration with a 1-row
# collect() — a driver barrier, one sequential job per iteration — and
# the obvious fix (fold delta/N into the plan as a 1-row broadcast over
# the SAME cached mass, keeping the loop lazy so each 4-iteration
# checkpoint window materializes in one job) measured a 2.03–2.14×
# REGRESSION on all three bench entries (ABBA min: idfilter 2.56→5.48 s,
# general 2.65→5.36 s, df_quirk 2.51→5.30 s). Root cause: the share
# branch embeds the mass subtree a SECOND time in the ANALYZED logical
# plan, so plan size doubles per iteration within a checkpoint window
# (2⁴ by the 4th) — per-iteration persist() dedupes EXECUTION (the
# CacheManager substitutes InMemoryRelation at physical planning) but
# not ANALYSIS, and analyzer/optimizer time dominates at small state.
# The r2 exponential-plan warning in pagerank's docstring therefore
# holds even with per-iteration caching; the collect IS the optimum: it
# pins the plan linear AND materializes the cache in the same job.


# ---------------------------------------------------------------------------
# Synthetic chain graph (distributed — the reference builds it in a
# driver-side Map, capping k; spark.range scales to any k).
# ---------------------------------------------------------------------------


def chain_graph(spark: SparkSession, k: int) -> tuple[DataFrame, DataFrame]:
    """k linear chains of k vertices (ids 1..k²); chain tails link to the
    dangling dummy vertex 0 (PageRankRDD/.../FollowerCount.scala:33-50).

    Returns (edges(src,dst), ranks0(vertex, rank)) with rank 1/k² for
    real vertices and 0.0 for the dummy.
    """
    n = k * k
    verts = spark.range(1, n + 1).select(F.col("id").alias("v"))
    edges = verts.select(
        F.col("v").alias("src"),
        F.when(F.col("v") % k == 0, F.lit(0)).otherwise(F.col("v") + 1).alias("dst"),
    )
    ranks0 = verts.select(
        F.col("v").alias("vertex"), F.lit(1.0 / n).alias("rank")
    ).unionByName(
        spark.createDataFrame([(0, 0.0)], "vertex: long, rank: double")
    )
    return edges, ranks0


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    ranks0: DataFrame,
    n_vertices: int,
    iterations: int = 10,
    loop_partitions: int | None = None,
    credit_dummy: bool = False,
) -> DataFrame:
    """PageRank with the reference's no-damping, dummy-vertex dangling-mass
    semantics (PageRankRDD/.../FollowerCount.scala:58-70):

    per iteration: mass(v) = Σ rank(u) over edges u→v  (join + group-sum);
    delta = mass at dummy vertex 0; every real vertex gets
    mass + delta/|V| (vertices without in-edges get 0 + delta/|V| via the
    union-with-zeroed-ranks idiom, here a left join + coalesce); vertex 0
    is pinned to 0.

    Scale design: ``mass`` is persisted per iteration and the dangling
    delta is a 1-row collect from that cache (the Spark-native form of
    the reference's ``lookup(0)``) embedded back as a literal — a k-row
    driver round-trip is negligible at any scale, and it keeps the
    Catalyst plan LINEAR per iteration. (The tempting alternative — a
    broadcast 1-row crossJoin — duplicates the mass subtree in the plan
    each iteration, so plan size and optimizer time grow exponentially;
    measured 26 s → 6 s on the k=100 bench when replaced with this in
    r2, and RE-measured 2.1× worse in r15 even with the mass cached —
    see the _PR_INPLAN_DELTA negative result above the function.)
    Lineage is truncated by localCheckpoint every 4 iterations.

    ``credit_dummy=True`` reproduces the DF variant's operator-precedence
    quirk (PageRankDataSet/.../FollowerCount.scala:70): the
    ``when(vertex===0, 0).otherwise(rank) + delta/N`` there binds the
    ``+`` OUTSIDE the when/otherwise, so vertex 0 is zeroed and then
    credited delta/N like everyone else (its rank never propagates — 0
    has no out-edges — so that mass leaks each iteration and ranks no
    longer sum to 1). Default False = the RDD variant's mathematically
    intended pin-to-0 (SURVEY.md §4 item 2, now implemented both ways).
    """
    # scoped conf inside with: an exception mid-loop must still restore
    # AQE + shuffle partitions for the shared session
    with _loop_shuffle_partitions(spark, loop_partitions):
        # co-partition the loop-invariant sides on their join keys at the
        # loop width: every iteration's join then reuses the cached
        # partitioning instead of re-exchanging the edge list (the durable
        # form of the reference's partitionBy(HashPartitioner(3)).cache(),
        # PageRankRDD/.../FollowerCount.scala:53-55; measured 9.7 s → 3.5 s
        # on the k=100 bench).
        if loop_partitions:
            edges = edges.repartition(loop_partitions, "src")
            vertices = ranks0.select("vertex").repartition(
                loop_partitions, "vertex"
            )
        else:
            vertices = ranks0.select("vertex")
        edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
        vertices = vertices.persist(StorageLevel.MEMORY_AND_DISK)

        ranks = ranks0
        prev_mass = None
        try:
            for i in range(iterations):
                mass = (
                    edges.join(ranks, edges.src == ranks.vertex)
                    .groupBy(edges.dst.alias("vertex"))
                    .agg(F.sum("rank").alias("mass"))
                    .persist(StorageLevel.MEMORY_AND_DISK)
                )
                delta_row = (
                    mass.where(F.col("vertex") == 0).select("mass").collect()
                )  # materializes the cached mass; 1-row driver round-trip
                delta = float(delta_row[0]["mass"]) if delta_row else 0.0
                share = F.lit(delta / float(n_vertices))
                zero_or_mass = F.when(F.col("vertex") == 0, 0.0).otherwise(
                    F.coalesce(F.col("mass"), F.lit(0.0))
                )
                new_rank = (
                    (zero_or_mass + share)  # quirk: + binds outside the when
                    if credit_dummy
                    else F.when(F.col("vertex") == 0, 0.0).otherwise(
                        F.coalesce(F.col("mass"), F.lit(0.0)) + share
                    )
                )
                new_ranks = vertices.join(mass, "vertex", "left").select(
                    "vertex", new_rank.alias("rank")
                )
                if (i + 1) % 4 == 0 or i == iterations - 1:
                    new_ranks = new_ranks.localCheckpoint(eager=True)
                if prev_mass is not None:
                    prev_mass.unpersist()
                prev_mass = mass
                ranks = new_ranks
        finally:
            if prev_mass is not None:
                prev_mass.unpersist()
            edges.unpersist()
            vertices.unpersist()
    return ranks


def pagerank_chain(
    spark: SparkSession,
    k: int = 100,
    iterations: int = 10,
    credit_dummy: bool = False,
) -> DataFrame:
    edges, ranks0 = chain_graph(spark, k)
    # Size the loop shuffles to the STATE (guide §2.1: partitions ∝ data,
    # not cluster): k² rank rows are ~16 B each, so even one partition
    # holds fixture-scale state with orders of magnitude to spare — the
    # width only buys parallelism for the per-stage fixed costs, which
    # stop paying back almost immediately on k-row tables. r15 ABBA
    # (order-balanced, min over 4): width 8→4 = 0.84–0.90× across every
    # graph-loop entry; 4→2 bought little more and REGRESSED sssp_paths
    # 1.11×, so 4 is the floor. The formula keeps the default
    # scale-adaptive (≈1 partition per 250k state rows); callers with
    # web-scale graphs pass their own pagerank(...) invocation with
    # loop_partitions=None to inherit the session width.
    return pagerank(
        spark, edges, ranks0, n_vertices=k * k, iterations=iterations,
        loop_partitions=loop_width(k * k), credit_dummy=credit_dummy,
    )


# ---------------------------------------------------------------------------
# Single-source shortest path (parallel BFS, min-relaxation)
# ---------------------------------------------------------------------------


def sssp(
    spark: SparkSession,
    edges: DataFrame,
    source,
    max_iter: int = 64,
    loop_partitions: int | None = 4,
) -> DataFrame:
    """Unweighted SSSP: hop distance from ``source``; unreachable stays
    +inf (SingleSourceShortestPathRDD/.../FollowerCount.scala:29,36-51).

    Loop body: relax every edge whose tail has a finite distance
    (join → project dist+1), take the per-vertex min of old and relaxed
    distances, stop when no distance changed (diff-count join — the
    reference's convergence test, :42-44).

    ``loop_partitions`` defaults to the state-sized width 4 (r15 — see
    pagerank_chain's sizing note: 8→4 measured 0.84×/0.87× on the two
    sssp entries, width 2 regressed the path unroll); big-graph callers
    pass their own ∝|V| width or None to inherit the session's.
    """
    # co-partition the loop-invariant edge list on the join key at loop
    # width (same rationale and measurement as pagerank above)
    if loop_partitions:
        edges = edges.repartition(loop_partitions, "src")
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    vertices = (
        edges.select(F.col("src").alias("vertex"))
        .unionByName(edges.select(F.col("dst").alias("vertex")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dist0 = vertices.select(
        "vertex",
        F.when(F.col("vertex") == source, 0.0).otherwise(F.lit(INF)).alias("dist"),
    )

    def step(dist: DataFrame, _i: int) -> DataFrame:
        relaxed = (
            edges.join(dist, edges.src == dist.vertex)
            .where(F.col("dist") != INF)
            .select(edges.dst.alias("vertex"), (F.col("dist") + 1).alias("dist"))
        )
        return (
            dist.unionByName(relaxed)
            .groupBy("vertex")
            .agg(F.min("dist").alias("dist"))
        )

    def converged(old: DataFrame, new: DataFrame) -> bool:
        changed = (
            new.alias("n")
            .join(old.alias("o"), "vertex")
            .where(F.col("n.dist") != F.col("o.dist"))
            .count()
        )
        return changed == 0

    with _loop_shuffle_partitions(spark, loop_partitions):
        # check_every=2 (r14): min-relax is a monotone fixpoint, so a
        # late convergence check returns the identical distance table —
        # it only halves the per-iteration diff-count control jobs
        # (each a full job of scheduling overhead on this k-row state)
        # at the cost of at most one no-op extra step.
        out = iterate(
            dist0, step, converged=converged, max_iter=max_iter, check_every=2
        )
    edges.unpersist()
    vertices.unpersist()
    return out


# ---------------------------------------------------------------------------
# Triangle counting (directed 3-cycles / 3, per the reference)
# ---------------------------------------------------------------------------


def triangle_count(edges: DataFrame, broadcast_probe: bool = False) -> DataFrame:
    """Count directed 3-cycles and divide by 3 — each cycle is found once
    per starting vertex (RepJoin/.../CountFollowers.java:119 divides by 3;
    ReduceSideJoin runs the same two-join plan shuffle-side).

    ``broadcast_probe=True`` replicates the closing edge set to every
    task (RepJoin's distributed-cache hash map); False lets the joins
    shuffle (ReduceSideJoin). Same result, two physical strategies —
    the reference's own cross-implementation test oracle (SURVEY.md §5).
    Input must be self-loop-free and deduplicated.
    """
    a, b, c = edges.alias("a"), edges.alias("b"), edges.alias("c")
    if broadcast_probe:
        b, c = F.broadcast(b), F.broadcast(c)
    cycles = a.join(b, F.col("a.dst") == F.col("b.src")).join(
        c, (F.col("b.dst") == F.col("c.src")) & (F.col("c.dst") == F.col("a.src"))
    )
    return cycles.agg(F.expr("count(1) div 3").alias("triangles"))


def triangle_count_ordered(edges: DataFrame) -> DataFrame:
    """Directed 3-cycle count via degree-ordered anchoring — same result
    as :func:`triangle_count` (cross-implementation equality tested), but
    skew-safe at scale.

    The plain plan's ``a.dst == b.src`` wedge join is quadratic in hub
    degree on power-law graphs; the reference only survives hubs through
    its id caps (RepJoin/.../CountFollowers.java:55,90). Here every cycle
    ``a→b→c→a`` is counted exactly once, anchored at its MINIMUM vertex
    under the total order ``rank(v) = (degree(v), v)``: wedges are pairs
    (anchor→b, c→anchor) where BOTH b and c out-rank the anchor. A
    vertex's effective wedge fan-out therefore counts only higher-degree
    neighbours, which is O(sqrt(|E|)) for any vertex — hubs anchor no
    wedges at all — giving the classic O(|E|^1.5) bound with no per-key
    blowup, and no /3 correction (each cycle has one minimum).

    Two shuffles on vertex keys (degree agg + wedge join) plus one
    two-column equi-join to close the wedge; degree table joins are
    broadcast-eligible when small. The ``edges`` input appears in four
    subtrees (degree union ×2, annotation, closing edge set) — AQE's
    runtime exchange reuse dedupes the repeated derivations (measured:
    7 ReusedExchange in the adaptive plan at sf0.01), so callers need
    not pre-materialize; persist ``edges`` anyway when it is itself an
    expensive derivation and AQE is off.
    """
    deg = (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )

    def annotate(e: DataFrame) -> DataFrame:
        return (
            e.join(deg.withColumnRenamed("v", "src"), "src")
            .withColumnRenamed("deg", "sdeg")
            .join(deg.withColumnRenamed("v", "dst"), "dst")
            .withColumnRenamed("deg", "ddeg")
        )

    ann = annotate(edges)
    outranks_src = (F.col("ddeg") > F.col("sdeg")) | (
        (F.col("ddeg") == F.col("sdeg")) & (F.col("dst") > F.col("src"))
    )
    # anchor→b edges (b out-ranks anchor) and c→anchor edges (c out-ranks
    # anchor); the wedge join key is the anchor — the low-rank vertex.
    ab = ann.where(outranks_src).select(
        F.col("src").alias("anchor"), F.col("dst").alias("b")
    )
    ca = ann.where(~outranks_src).select(
        F.col("dst").alias("anchor"), F.col("src").alias("c")
    )
    wedges = ab.join(ca, "anchor")
    closing = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    return wedges.join(closing, ["b", "c"]).agg(
        F.count(F.lit(1)).alias("triangles")
    )


# ---------------------------------------------------------------------------
# SSSP with path reconstruction (ShortestPathMR parity)
# ---------------------------------------------------------------------------


def sssp_with_paths(
    spark: SparkSession,
    edges: DataFrame,
    source,
    max_iter: int = 64,
    loop_partitions: int | None = 4,
) -> DataFrame:
    """SSSP distances + one canonical shortest path per reachable vertex
    (vertex, dist, path) — the capability of ShortestPathMR's
    predecessor-string tracking (ShortestPathMR/src/main/java/wc/
    CountFollowers.java:81-112), with a cleaner deterministic spec:

    the path is taken through the MIN-PREDECESSOR tree — pred(v) is the
    smallest vertex u with an edge u→v and dist(u) = dist(v) − 1. This
    pins tie-breaking among equal-length paths (the reference's outcome
    depends on reducer iteration order), making the result reproducible
    and oracle-checkable. Cost: the distance fixpoint, one join to build
    the predecessor forest, then depth-many tiny joins to unroll paths —
    all linear in |V| + |E|.
    """
    dist = sssp(spark, edges, source, max_iter, loop_partitions).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    reach = dist.where(F.col("dist") != INF)
    dsrc = reach.select(
        F.col("vertex").alias("p_src"), F.col("dist").alias("d_src")
    )
    ddst = reach.select(
        F.col("vertex").alias("p_dst"), F.col("dist").alias("d_dst")
    )
    pred = (
        edges.join(dsrc, edges.src == dsrc.p_src)
        .join(ddst, edges.dst == ddst.p_dst)
        .where(F.col("d_src") == F.col("d_dst") - 1)
        .groupBy(F.col("dst").alias("vertex"))
        .agg(F.min("src").alias("pred"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    max_d = reach.agg(F.max("dist")).first()[0] or 0.0

    paths = reach.where(F.col("vertex") == source).select(
        "vertex", "dist", F.array(F.col("vertex")).alias("path")
    )
    frontier = paths
    with _loop_shuffle_partitions(spark, loop_partitions):
        # pure-lazy unroll: depth is bounded by max_d (small for real
        # graphs' diameters), frontiers persist lazily, and the whole
        # forest materializes in ONE job at the caller's action — no
        # per-depth checkpoint/isEmpty round-trips.
        for _d in range(int(max_d)):
            nxt = (
                pred.join(
                    frontier.select(
                        F.col("vertex").alias("pred"), F.col("path").alias("ppath")
                    ),
                    "pred",
                )
                .join(reach, "vertex")
                .select(
                    "vertex",
                    "dist",
                    F.concat(F.col("ppath"), F.array(F.col("vertex"))).alias("path"),
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            paths = paths.unionByName(nxt)
            frontier = nxt
        out = paths.localCheckpoint(eager=True)
    dist.unpersist()
    pred.unpersist()
    return out


# ---------------------------------------------------------------------------
# Connected components (two-phase distributed union-find)
# ---------------------------------------------------------------------------


# Diagnostics from the most recent connected_components call (driver-side
# observability for tests and ops: how big was the residual the driver
# union-find actually read, and how many extra/star rounds fired).
CC_LAST_STATS: dict[str, int] = {}


def _forest_contract(edges: DataFrame) -> DataFrame:
    """One distributed contraction pass: per-partition UNION-FIND over
    the edge stream (Arrow batches via mapInPandas), emitting the local
    spanning forest (vertex → min vertex of its local tree). The union
    of the per-partition forests preserves exact connectivity: a vertex
    whose edges land in several partitions appears in several local
    trees and bridges them."""
    import pandas as pd

    def uf(batches):
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for pdf in batches:
            for a, b in zip(pdf["src"].values, pdf["dst"].values):
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    # union-by-MIN, not by rank: the root must stay the
                    # smallest id so component = min vertex id exactly
                    if ra < rb:
                        parent[rb] = ra
                    else:
                        parent[ra] = rb
        if parent:
            verts = list(parent)
            yield pd.DataFrame(
                {"src": verts, "dst": [find(v) for v in verts]}
            )

    return edges.mapInPandas(uf, "src long, dst long")


def _root_graph(forest: DataFrame) -> DataFrame:
    """Edges among local roots: a vertex with k>1 local roots bridges
    them — emit (min_root, other_root) per extra root. Size is bounded
    by the number of partition-boundary vertices, orders of magnitude
    below |V|."""
    return (
        forest.groupBy("src")
        .agg(
            F.min("dst").alias("r0"),
            F.collect_set("dst").alias("rs"),
        )
        .select(F.col("r0").alias("src"), F.explode("rs").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


# r15 (guide §1.2 / VERDICT r14 Next #4): fuse connected_components'
# per-round residual-size count() and the final residual collect() into
# ONE bounded take per round. Toggle exists for A/B measurement only.
_CC_FUSED_RESIDUAL = True


def _residual_rows(spark: SparkSession, g: DataFrame, cap: int) -> list:
    """ONE control job instead of count()-then-collect() (r15, guide
    §1.2 / VERDICT r14 Next #4): take ``cap + 1`` rows of the residual
    root graph — ≤ cap rows means the list IS the complete residual
    (feed it straight to the driver union-find), cap + 1 means "still
    too big, contract another round" and the rows are discarded. The
    driver never holds more than cap + 1 narrow rows, exactly the
    bound the old count-guarded collect enforced. initialNumPartitions
    is raised for the take so the common small-residual case scans all
    (≤ loop-width) partitions in one job instead of CollectLimit's
    1 → 4 → … escalation rounds, which would cost MORE jobs than the
    count it replaces."""
    if not _CC_FUSED_RESIDUAL:
        n = g.count()
        return g.collect() if n <= cap else [None] * (cap + 1)
    key = "spark.sql.limit.initialNumPartitions"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "64")
    try:
        return g.take(cap + 1)
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 8,
    loop_partitions: int | None = 8,
    driver_edge_cap: int = 100_000,
    star_budget: int = 12,
    label_partitions: int | None = 4,
) -> DataFrame:
    """Undirected connected components — the SURVEY.md §2.11 near-dedup
    clustering step (candidate PAIRS become duplicate CLUSTERS).

    Two-phase distributed union-find, NOT a min-label fixpoint loop
    (O(diameter) shuffle rounds; measured 33 s on a 1 k-vertex sf0.1
    graph purely in per-round job overhead):

    1. one ``mapInPandas`` pass runs union-find per partition and emits
       the local spanning forest (vertex → local min root) — exact
       connectivity, |V| narrow rows, embarrassingly parallel;
    2. the ROOT GRAPH (edges among local roots, bounded by
       partition-boundary vertices, ≪ |V|) is contracted again while it
       exceeds ``driver_edge_cap``: first up to ``max_iter`` plain
       forest rounds, then — if a hostile partition layout keeps the
       per-partition union-find from making progress — each further
       round prepends one alternating large-/small-star contraction
       (:func:`_star_round`, pure JVM, layout-independent label
       progress; Kiveris et al. SoCC 2014) before the forest pass, up
       to ``star_budget`` rounds. Star rounds preserve both components
       and the vertex set (every non-isolated vertex reappears), so
       the (root → contracted-root) composition below is unchanged.
       The residual handed to the driver-side union-find is therefore
       bounded by ``driver_edge_cap`` REGARDLESS of partition layout
       (up to the star budget, which converges in O(log²) rounds per
       the paper) — a k-row control read like the centroid collect;
    3. one broadcast join + min-agg maps every vertex to its component.

    Returns (vertex, component) with component = min vertex id in the
    component (union-by-min keeps every local root the minimum of its
    tree, and every vertex ≥ its root, so the global min survives both
    phases). At 100 TB: phase 1 scales with edge partitions, phase 2
    touches only boundary vertices, phase 3 is one shuffle on (vertex)
    — no O(diameter) loop ever runs.
    """
    e = edges.select("src", "dst")
    if loop_partitions:
        e = e.repartition(loop_partitions, "src")
    # Two widths for two concerns (r15): ``loop_partitions`` keeps the
    # CONTRACTION width (it gates the per-partition Python union-find's
    # parallelism over edge rows — compute-bound, wants cores), while
    # the root-graph groupBys and label joins are k-row shuffles that
    # want the small state-sized width (``label_partitions``; the
    # pagerank_chain sizing note and loop_width() carry the ABBA
    # evidence — 0.93–0.94× on the dedup-clusters entries with the
    # contraction width left at 8, vs mixed results when the
    # contraction width was shrunk too).
    with _loop_shuffle_partitions(spark, label_partitions):
        forest = _forest_contract(e).persist(StorageLevel.MEMORY_AND_DISK)
        g = _root_graph(forest)
        rounds = 0
        extra = []  # (root → contracted-root) maps from extra rounds
        rows = _residual_rows(spark, g, driver_edge_cap)
        n = len(rows)
        while n > driver_edge_cap and rounds < max_iter + star_budget:
            src = g
            if rounds >= max_iter:
                # forest-only budget exhausted above the cap: the
                # adversarial case where consecutive path vertices
                # never co-locate, so partition-local union-find
                # stalls. One star round contracts toward component
                # minima independent of layout; the forest pass then
                # folds the contraction into a composable root map.
                src = _star_round(
                    g, large=((rounds - max_iter) % 2 == 0)
                ).localCheckpoint(eager=True)
            f2 = _forest_contract(
                src.repartition(loop_partitions or 8, "src")
            ).persist(StorageLevel.MEMORY_AND_DISK)
            extra.append(f2)
            g = _root_graph(f2)
            rows = _residual_rows(spark, g, driver_edge_cap)
            n = len(rows)
            rounds += 1
        if n > driver_edge_cap:
            # round budget exhausted while still above the cap
            # (adversarial layouts only): the truncated take is NOT the
            # full residual — fall back to the exact full collect the
            # pre-fusion code always did.
            rows = g.collect()
            n = len(rows)
        CC_LAST_STATS["residual_edges"] = n
        CC_LAST_STATS["rounds"] = rounds
        CC_LAST_STATS["star_rounds"] = max(0, rounds - max_iter)

        # driver union-find over the residual root graph (small by
        # construction; a k-row control read like the centroid collect)
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in rows:
            ra, rb = find(r.src), find(r.dst)
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        mapping = [(v, find(v)) for v in parent]
        labels = forest
        for f2 in extra:
            # compose: vertex → root → contracted root (left join: roots
            # untouched by the extra round keep their label).
            # DEDUPE the map to one row per vertex first: the forest
            # emits a vertex once per partition it appears in (that
            # duplication is what lets _root_graph discover bridges),
            # so joining the raw forest multiplies labels rows per
            # round — exponential growth over many residual rounds
            # (measured: 244M rows by round 15 on the hostile-layout
            # fixture). Taking the MIN root per vertex is exact: the
            # dropped alternative roots are still bridged to the kept
            # one through _root_graph's edges (which read the full
            # duplicated forest), so every label still reaches its
            # component minimum through later maps or the driver
            # union-find; the join becomes 1:1 and labels stay
            # |forest|-sized for any number of rounds.
            m = f2.groupBy("src").agg(F.min("dst").alias("_c")).select(
                F.col("src").alias("_r"), F.col("_c")
            )
            labels = (
                labels.join(m, labels.dst == m._r, "left")
                .select(
                    "src",
                    F.coalesce(F.col("_c"), F.col("dst")).alias("dst"),
                )
            )
        if mapping:
            mdf = spark.createDataFrame(mapping, "_r long, _c long")
            labels = (
                labels.join(F.broadcast(mdf), labels.dst == mdf._r, "left")
                .select(
                    "src", F.coalesce(F.col("_c"), F.col("dst")).alias("dst")
                )
            )
        out = (
            labels.groupBy("src")
            .agg(F.min("dst").alias("component"))
            .select(F.col("src").alias("vertex"), "component")
        )
        out = out.localCheckpoint(eager=True)
    forest.unpersist()
    for f2 in extra:
        f2.unpersist()
    return out


def contract_delta(base_labels: DataFrame, delta_edges: DataFrame) -> DataFrame:
    """Delta edges with endpoints contracted onto their existing
    component labels (unknown endpoints pass through). The result is
    the ONLY graph :func:`incremental_components` ever clusters — its
    size is bounded by |delta|, which is what the touched-only-work
    test asserts."""
    lab_src = base_labels.select(
        F.col("vertex").alias("src"), F.col("component").alias("csrc")
    )
    lab_dst = base_labels.select(
        F.col("vertex").alias("dst"), F.col("component").alias("cdst")
    )
    return (
        delta_edges.select("src", "dst")
        .join(lab_src, "src", "left")
        .join(lab_dst, "dst", "left")
        .select(
            F.coalesce("csrc", "src").alias("src"),
            F.coalesce("cdst", "dst").alias("dst"),
        )
        # a delta edge internal to one existing component contracts to a
        # self-loop — it merges nothing, so drop it here (delta-sized
        # filter) instead of letting it ride as a clustered row
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def incremental_components(
    spark: SparkSession,
    base_labels: DataFrame,
    delta_edges: DataFrame,
    materialize: bool = True,
    **cc_kwargs,
) -> DataFrame:
    """Merge a DELTA batch of edges into existing component labels
    without recomputing components from scratch — the streaming-dedup
    maintenance step (a new document batch's LSH pairs arrive against
    an already-clustered corpus).

    ``base_labels`` is (vertex, component) with component = min vertex
    id of the component (the :func:`connected_components` contract).
    Because each label is itself the minimum of its component, the
    delta can be CONTRACTED before any clustering happens:

    1. map each delta endpoint to its existing label (left join;
       endpoints the base has never seen pass through as themselves);
    2. run :func:`connected_components` on the resulting COMPONENT
       GRAPH — its size is bounded by |delta|, not |base|, and its
       min-label outputs are exactly the merged components' new labels;
    3. apply the (old label → new label) remap to the base with one
       broadcast join (labels of untouched components miss the remap
       and survive unchanged — no base shuffle), and union in the
       delta-only vertices with their labels from step 2.

    Result is IDENTICAL to from-scratch clustering on base ∪ delta
    edges (oracle + test), but the clustering work touches only
    delta-adjacent components: at 100 TB the base is a label table
    scanned once map-side, never re-clustered.
    """
    d = delta_edges.select("src", "dst")
    comp_edges = contract_delta(base_labels, d)
    # already materialized: connected_components eagerly localCheckpoints
    # its output, so both uses below share one computed table.
    merged = connected_components(spark, comp_edges, **cc_kwargs)
    # merged: (vertex = old label | delta-only vertex id, component = new
    # label). As an old-label → new-label remap it is delta-sized.
    remap = merged.select(
        F.col("vertex").alias("component"), F.col("component").alias("_nc")
    )
    rebased = base_labels.join(F.broadcast(remap), "component", "left").select(
        "vertex", F.coalesce("_nc", "component").alias("component")
    )
    delta_only = (
        d.select(F.col("src").alias("vertex"))
        .unionAll(d.select(F.col("dst").alias("vertex")))
        .distinct()
        .join(base_labels.select("vertex"), "vertex", "left_anti")
        .join(merged, "vertex")
        .select("vertex", "component")
    )
    out = rebased.unionByName(delta_only)
    # Steady-state use folds batch after batch through this function
    # (labels are maintained forever, never rebuilt). The fold scans
    # its input labels four times (contract ×2, remap, delta_only), so
    # without truncation each fold would replay every prior fold's
    # plan — geometric recompute in the number of batches. Eager
    # localCheckpoint (the same loop discipline connected_components
    # ends with) pins each generation of labels to one materialized
    # table. ``materialize=False`` returns the lazy plan (plan tests).
    return out.localCheckpoint(eager=True) if materialize else out


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One LARGE-STAR (or SMALL-STAR) round of the alternating
    min-label contraction from Kiveris et al., "Connected Components in
    MapReduce and Beyond" (SoCC 2014) — entirely JVM-side (groupBy +
    collect_set + explode + codegen comparisons), no Python.

    For each vertex u with (symmetrized) neighborhood Γ(u) and
    m = min(Γ(u) ∪ {u}):

    - large-star emits (v, m) for every neighbor v > u;
    - small-star emits (v, m) for every neighbor v ≤ u, plus (u, m).

    Both operations preserve the connected components of the graph and
    the vertex set (every non-isolated vertex reappears in the output),
    while monotonically pulling edges toward each component's minimum —
    so a fixed number of rounds is a CORRECT pre-contraction for any
    exact finisher. One shuffle per round (the groupBy on u; the
    explode is map-side). Known caveat at scale: the min label of a big
    component accumulates degree round over round (the paper's skew),
    so this phase is bounded to a few rounds and an exact finisher
    (union-find) handles the residual.
    """
    sym = edges.where(F.col("src") != F.col("dst"))
    sym = sym.union(sym.select(F.col("dst"), F.col("src")))
    grouped = sym.groupBy("src").agg(
        F.collect_set("dst").alias("nbrs"),
        F.min("dst").alias("mn"),
    )
    m = F.least(F.col("mn"), F.col("src"))
    ex = grouped.select(
        F.col("src").alias("u"), m.alias("m"), F.explode("nbrs").alias("v")
    )
    if large:
        out = ex.where(F.col("v") > F.col("u")).select(
            F.col("v").alias("src"), F.col("m").alias("dst")
        )
    else:
        out = (
            ex.where(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("src"), F.col("m").alias("dst"))
            .union(grouped.select(F.col("src"), m.alias("dst")))
        )
    return out.where(F.col("src") != F.col("dst"))


def connected_components_star(
    spark: SparkSession,
    edges: DataFrame,
    star_rounds: int = 2,
    **kwargs,
) -> DataFrame:
    """Connected components with a pure-JVM pre-contraction: a few
    alternating large-star/small-star rounds (all codegen — see
    :func:`_star_round`) collapse most of each component onto its
    minimum label BEFORE the exact :func:`connected_components`
    union-find finisher sees the edges. Same (vertex, component) output
    contract, component = min vertex id.

    Why both paths exist: the two-phase union-find's phase 1 iterates
    edge rows in Python inside Arrow batches — exact and
    partition-parallel, but the engine's one Python-speed inner loop.
    Star rounds keep the whole contraction JVM-side at one shuffle per
    round; after 2 rounds the residual graph is mostly stars, so the
    Python loop touches near-trivial state. At 100 TB pick by edge
    volume: star rounds win when Python-batch throughput is the
    bottleneck; straight union-find wins when the extra star shuffles
    dominate (measured at sf0.1 in bench.py: `dedup_clusters` vs
    `dedup_clusters_star`).
    """
    e = edges.select("src", "dst")
    # Self-loops carry no connectivity but DO carry vertex existence
    # (a vertex seen only as (v, v) must still get a singleton label,
    # matching connected_components' contract); star rounds drop them,
    # so re-attach after contraction for the finisher to register.
    selfs = e.where(F.col("src") == F.col("dst")).distinct()
    for i in range(star_rounds):
        # localCheckpoint between rounds keeps the loop plan linear
        # (same reason as the PageRank runner): round k+1's groupBy
        # otherwise re-plans k stacked shuffles.
        e = _star_round(e, large=(i % 2 == 0)).localCheckpoint(eager=True)
    return connected_components(spark, e.union(selfs), **kwargs)


# ---------------------------------------------------------------------------
# Standard (damped, out-degree-normalized) PageRank — generalizes the
# reference's chain-only variant to arbitrary graphs.
# ---------------------------------------------------------------------------


def pagerank_standard(
    spark: SparkSession,
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    loop_partitions: int | None = 4,
) -> DataFrame:
    """Textbook PageRank: rank'(v) = (1−d)/N + d·(Σ_{u→v} rank(u)/deg(u)
    + dangling/N). The reference's variant (PageRankRDD) forwards FULL
    rank per edge (its chains have out-degree 1, so the two coincide
    there); this operator handles arbitrary out-degrees and dangling
    vertices, which the engine needs for real graphs.

    Scale shape identical to :func:`pagerank`: the edge list is
    pre-weighted ONCE with 1/deg(src) (loop-invariant — the division
    never re-runs inside the loop), co-partitioned on src, and the
    dangling scalar folds into the SAME mass aggregation: dangling
    vertices get one synthetic edge to a NULL sink, so each iteration is
    a single join+group-sum job whose NULL row IS the dangling mass
    (read back as a 1-row collect from the cached result) — halving the
    per-iteration job count vs a separate left_anti aggregation.
    ``loop_partitions`` defaults to the state-sized width 4 (r15, ABBA
    0.85× — pagerank_chain's sizing note has the derivation).
    """
    # a genuine NULL dst in unclean input would otherwise be folded into
    # the synthetic NULL-sink group and silently counted as dangling mass
    edges = edges.where(F.col("dst").isNotNull())
    with _loop_shuffle_partitions(spark, loop_partitions):
        verts = (
            edges.select(F.col("src").alias("v"))
            .unionByName(edges.select(F.col("dst").alias("v")))
            .distinct()
        )
        if loop_partitions:
            verts = verts.repartition(loop_partitions, "v")
        verts = verts.persist(StorageLevel.MEMORY_AND_DISK)
        n = verts.count()

        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("dg"))
        dst_t = dict(edges.dtypes)["dst"]
        weighted = (
            edges.join(deg, "src")
            .select("src", "dst", (F.lit(1.0) / F.col("dg")).alias("w"))
            .unionByName(
                # dangling v → ⊥ sink, weight 1: its whole rank lands in
                # the NULL group of the mass aggregation
                verts.join(
                    deg.select(F.col("src").alias("v")), "v", "left_anti"
                ).select(
                    F.col("v").alias("src"),
                    F.lit(None).cast(dst_t).alias("dst"),
                    F.lit(1.0).alias("w"),
                )
            )
        )
        if loop_partitions:
            weighted = weighted.repartition(loop_partitions, "src")
        weighted = weighted.persist(StorageLevel.MEMORY_AND_DISK)

        ranks = verts.select("v", F.lit(1.0 / n).alias("r"))
        prev = None
        try:
            for i in range(iterations):
                mass = (
                    weighted.join(ranks, weighted.src == ranks.v)
                    .groupBy(weighted.dst.alias("v"))
                    .agg(F.sum(F.col("r") * F.col("w")).alias("m"))
                    .persist(StorageLevel.MEMORY_AND_DISK)
                )
                drow = mass.where(F.col("v").isNull()).select("m").collect()
                dangling = float(drow[0]["m"]) if drow else 0.0
                new_ranks = verts.join(mass, "v", "left").select(
                    "v",
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("m"), F.lit(0.0))
                            + F.lit(dangling / n)
                        )
                    ).alias("r"),
                )
                if (i + 1) % 4 == 0 or i == iterations - 1:
                    new_ranks = new_ranks.localCheckpoint(eager=True)
                if prev is not None:
                    prev.unpersist()
                prev = mass
                ranks = new_ranks
        finally:
            for df in (prev, weighted, verts):
                if df is not None:
                    df.unpersist()
    return ranks.select(F.col("v").alias("vertex"), F.col("r").alias("rank"))
