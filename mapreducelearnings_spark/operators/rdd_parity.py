"""RDD-level parity demos for the reference's four *ByKey modules
(SURVEY.md §2.3): the SAME grouped count under four RDD aggregation
strategies — reduceByKey / groupByKey / foldByKey / aggregateByKey
(ReduceByKey, GroupByKey, FoldByKey, AggregateByKey modules, each
~30 LoC around one operator call).

The engine's real path is ``operators.relational.follower_count`` —
a DataFrame groupBy whose HashAggregate ALWAYS does the partial+final
split the four modules exist to compare (SURVEY.md §4 row 1). These RDD
twins are kept as executable documentation of that equivalence and of
the RDD escape hatch; tests assert all four equal the DataFrame result.
``groupByKey`` in particular is the reference's own anti-pattern demo
(shuffles every row, no map-side combine) — reproduced here ONLY as a
demo; never use it for aggregation at scale.
"""

from __future__ import annotations

from operator import add

from pyspark.sql import DataFrame, SparkSession

STRATEGIES = ("reduceByKey", "groupByKey", "foldByKey", "aggregateByKey")


def follower_count_rdd(
    spark: SparkSession, edges: DataFrame, strategy: str = "reduceByKey"
) -> DataFrame:
    """Grouped in-edge count via a chosen RDD aggregation strategy.
    Semantics identical across all four (and to the DataFrame path);
    they differ only in shuffle behavior."""
    pairs = edges.rdd.map(lambda r: (r["dst"], 1))
    if strategy == "reduceByKey":
        counted = pairs.reduceByKey(add)
    elif strategy == "groupByKey":  # anti-pattern demo: no map-side combine
        counted = pairs.groupByKey().mapValues(lambda vs: sum(vs))
    elif strategy == "foldByKey":
        counted = pairs.foldByKey(0, add)
    elif strategy == "aggregateByKey":
        counted = pairs.aggregateByKey(0, lambda acc, v: acc + v, add)
    else:
        raise ValueError(f"unknown strategy {strategy!r}; one of {STRATEGIES}")
    return spark.createDataFrame(counted, "dst: long, cnt: long")
