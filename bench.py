"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count() over the result — full
materialization without driver-side row transfer, so the measurement is
engine time, not collect bandwidth).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one representative per workload family; grows with the
# engine. Keep in sync with SURVEY.md §2 coverage.
HEADLINE = [
    "follower_count",
    "pricing_summary",
    "grouped_collect",
    "inner_join",
    "broadcast_join",
    "semi_join",
    "two_hop_paths",
    "top_k",
    "union_reagg",
    "window_events",
    "explode_tokens",
    # iterative / graph workloads (BASELINE.md bench set)
    "pagerank_idfilter",
    "sssp_distances",
    "triangle_count",
    "triangle_count_broadcast",
    "kmeans_centroids",
]


def main() -> None:
    from mapreducelearnings_spark.queries import REGISTRY
    from mapreducelearnings_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        df = spec.spark(spark, sf_dir)
        df.count()  # warm: file index + plan; first run pays JVM warmup
        t0 = time.perf_counter()
        df.count()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
