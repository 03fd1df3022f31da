"""1-D k-means — the reference's Hadoop-MR clustering workload
(K-means/src/main/java/wc/CountFollowers.java) re-expressed Spark-first.

Semantics reproduced (behavior studied, no code taken):
- centroid seeding: c_j = max/k · j for j = 1..k
  (createGoodCentroids, K-means/.../CountFollowers.java:224-236).
- assignment: nearest centroid by absolute distance
  (euclideanDistance, :272-274), ties → lowest centroid id.
- update: cluster mean. The reference truncates the mean to a long
  (:130-131, `(long) average`); we compute the true floating mean by
  default with ``compat_truncate`` for exact parity.
- loop: ≤ ``max_iter`` iterations or centroid-list stability (:177-200).
- SSE: Σ (centroid − x)² per cluster (:133-140), computed as a metric.

Scale design: k is tiny, data is huge — so centroids travel INTO the
plan as literals (the Spark-native form of the reference's
distributed-cache centroid file, :73-89), assignment is a pure
whole-stage-codegen expression (array_min over (distance, cid) structs —
no UDF, no crossJoin shuffle), and the per-iteration reduction is one
groupBy over k groups. Points are pre-aggregated to (value, weight)
pairs — at 100 TB the distinct-value table is orders of magnitude
smaller than the row count, and the weighted mean is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def seed_centroids(points: DataFrame, value_col: str, k: int) -> list[float]:
    """Evenly spaced seeds: max/k · j (K-means/.../CountFollowers.java:224-236)."""
    mx = points.agg(F.max(value_col)).first()[0]
    first = mx / k
    return [first * j for j in range(1, k + 1)]


def _assign_expr(centroids: dict[int, float]) -> F.Column:
    """argmin over literal (cid → centroid) pairs: array_min of
    (|x−c|, cid) structs — lexicographic struct ordering gives the
    lowest-cid tiebreak. Centroids travel as a dict so cluster ids stay
    STABLE when a cluster loses all members and vanishes (a positional
    list silently re-numbers the survivors — a real bug caught by the
    follower-count oracle)."""
    pairs = [
        F.struct(
            F.abs(F.col("x") - F.lit(float(c))).alias("d"),
            F.lit(cid).cast("long").alias("cid"),
        )
        for cid, c in sorted(centroids.items())
    ]
    return F.array_min(F.array(*pairs))["cid"]


def kmeans_1d(
    points: DataFrame,
    value_col: str,
    k: int = 4,
    max_iter: int = 10,
    fixed_iterations: int | None = None,
    compat_truncate: bool = False,
) -> DataFrame:
    """Cluster a 1-D column; returns (cluster_id, centroid, n_points).

    ``fixed_iterations`` disables the convergence test and runs exactly
    that many assign+update rounds (used by the SQL-oracle query, which
    unrolls the same rounds). Otherwise: stop early when the centroid
    list is exactly stable, like the reference's file comparison
    (K-means/.../CountFollowers.java:192-197).
    """
    from ..plans.iterate import loop_conf

    weighted = (
        points.select(F.col(value_col).cast("double").alias("x"))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    centroids = {
        j + 1: c for j, c in enumerate(seed_centroids(weighted, "x", k))
    }

    rounds = fixed_iterations if fixed_iterations is not None else max_iter
    # loop width 4 (r15): the per-round aggregate collapses to k rows,
    # so the shuffle width only amortizes fixed stage cost — the same
    # state-size sizing as the graph loops (graph.pagerank_chain's note;
    # ABBA kmeans_centroids 0.90×, kmeans_followers wash)
    with loop_conf(points.sparkSession, 4):
        for _ in range(rounds):
            updated = (
                weighted.select("x", "w", _assign_expr(centroids).alias("cid"))
                .groupBy("cid")
                .agg((F.sum(F.col("x") * F.col("w")) / F.sum("w")).alias("c"))
                .collect()
            )
            new_centroids = {
                int(r["cid"]): (
                    float(r["c"]) if not compat_truncate else float(int(r["c"]))
                )
                for r in updated
            }
            if fixed_iterations is None and new_centroids == centroids:
                break
            centroids = new_centroids

    final = (
        weighted.select("x", "w", _assign_expr(centroids).alias("cid"))
        .groupBy("cid")
        .agg(F.sum("w").alias("n_points"))
    )
    expr = F.lit(None).cast("double")
    for cid, c in centroids.items():
        expr = F.when(F.col("cid") == cid, F.lit(c)).otherwise(expr)
    out = final.select(
        F.col("cid").alias("cluster_id"), expr.alias("centroid"), "n_points"
    )
    weighted.unpersist()
    return out


def kmeans_sse(points: DataFrame, value_col: str, centroids: list[float]) -> float:
    """Σ (centroid_assigned − x)² — the reference's SSE counter
    (K-means/.../CountFollowers.java:133-140) as a one-pass aggregate."""
    df = points.select(F.col(value_col).cast("double").alias("x"))
    pairs = [
        F.struct(
            F.abs(F.col("x") - F.lit(float(c))).alias("d"),
            F.lit(float(c)).alias("c"),
        )
        for c in centroids
    ]
    nearest = F.array_min(F.array(*pairs))["c"]
    return df.agg(F.sum(F.pow(nearest - F.col("x"), F.lit(2)))).first()[0]
