"""Skew mitigation helpers.

First line of defense is AQE (``spark.sql.adaptive.skewJoin`` splits
oversized join partitions at runtime — enabled by the session factory).
Salting is the manual fallback for skewed AGGREGATIONS, where AQE's
skew-join does not apply: a hot group key (the celebrity followee, the
empty-string token) funnels its entire group through one task.

``salted_count`` re-expresses a grouped count as a two-level
aggregation: partial counts over (key, salt) — spreading the hot key
over ``n_salts`` tasks — then a final sum over the key. Results are
identical to the direct groupBy; only the shuffle distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Grouped count with salting: two shuffles, neither skewed. The
    salt is random-per-row (count is insensitive to salt placement)."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_pc"))
    return partial.groupBy(key).agg(F.sum("_pc").alias("cnt"))


def salted_sum(df: DataFrame, key: str, value: str, n_salts: int = 16) -> DataFrame:
    """Grouped sum with salting — same two-level shape (sum is
    associative, so per-salt partials merge exactly)."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(F.sum(value).alias("_ps"))
    return partial.groupBy(key).agg(F.sum("_ps").alias("val_sum"))
