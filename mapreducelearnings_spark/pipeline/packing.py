"""Sequence packing (SURVEY.md §2.11 — NEW layer; no reference
counterpart): lay a curated corpus out into fixed token-budget training
sequences, concat-then-chunk style — documents are concatenated in
doc_id order and cut every ``budget`` tokens, so a document can span a
chunk boundary (the standard LLM pretraining data layout).

The core primitive is a GLOBAL prefix sum over the corpus order, which
is exactly the thing a naive window (``Window.orderBy`` with no
partition) cannot do at scale: Spark plans it as a single-partition
sort — one task owns 100 TB. This module uses the distributed two-phase
prefix-sum pattern instead:

1. range-shard the order key into contiguous shards;
2. local prefix sum per shard (window partitioned BY SHARD — parallel);
3. per-shard totals (one tiny aggregate, ≤ n_shards rows) are
   prefix-summed on the driver and rejoined as broadcast offsets.

global_prefix = shard_offset + local_prefix. The only driver state is
n_shards rows — the same k-row control-channel shape as the k-means
centroid collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..functions import text as X

N_SHARDS = 32
PACK_BUDGET = 512


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens) with the engine's canonical whitespace-ish
    tokenizer (functions.text.tokens — same regex the oracle mirrors)."""
    return docs.select(
        "doc_id", F.size(X.tokens(text_col)).cast("long").alias("n_tokens")
    )


def _global_prefix_sum(
    spark: SparkSession,
    counts: DataFrame,
    order_col: str = "doc_id",
    value_col: str = "n_tokens",
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """counts + a ``cum`` column = inclusive prefix sum of ``value_col``
    in global ``order_col`` order, via the two-phase shard pattern
    (module docstring). Shards are contiguous ranges of the order key,
    so shard-local order + shard offsets compose to the global order."""
    lo, hi = counts.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).first()
    if lo is None:  # empty input: empty prefix sum
        return counts.withColumn("cum", F.lit(0).cast("long"))
    span = max(int(hi) - int(lo) + 1, 1)
    width = -(-span // n_shards)  # ceil
    # Integral `div`, NOT float `/`: (x / width).cast('long') routes
    # through a double, and for order-key spans beyond 2^53 the mantissa
    # truncation can misassign boundary rows, silently corrupting the
    # global prefix sum. Keys are non-negative after the lo shift, so
    # truncating div == floor div here.
    sharded = counts.withColumn(
        "_shard",
        F.expr(
            f"(cast({order_col} as bigint) - {int(lo)}L) div {width}L"
        ).cast("long"),
    )
    w = Window.partitionBy("_shard").orderBy(order_col)
    local = sharded.withColumn("_local_cum", F.sum(value_col).over(w))
    totals = sorted(
        (r["_shard"], r["t"])
        for r in sharded.groupBy("_shard")
        .agg(F.sum(value_col).alias("t"))
        .collect()
    )
    offsets, acc = [], 0
    for shard, t in totals:
        offsets.append((shard, acc))
        acc += int(t)
    odf = spark.createDataFrame(offsets, "_shard long, _off long")
    return (
        local.join(F.broadcast(odf), "_shard")
        .withColumn("cum", F.col("_local_cum") + F.col("_off"))
        .drop("_shard", "_local_cum", "_off")
    )


def pack_sequences(
    spark: SparkSession,
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, start_offset, chunk_first, chunk_last): each
    document's token span in the concatenated corpus stream and the
    range of ``budget``-token training chunks it lands in (a document
    crossing a boundary spans several). Zero-token documents carry no
    span and are dropped, matching the concat semantics."""
    counts = token_counts(docs, text_col).where(F.col("n_tokens") > 0)
    with_cum = _global_prefix_sum(spark, counts)
    start = F.col("cum") - F.col("n_tokens")
    return with_cum.select(
        "doc_id",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / budget).cast("long").alias("chunk_first"),
        F.floor((F.col("cum") - 1) / budget).cast("long").alias("chunk_last"),
    )
