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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skewed shuffle JOIN via two-sided salting — the manual fallback
    when AQE's skew-join can't apply (e.g., the skewed side feeds a
    non-splittable operator, or the planner lands on a broadcast the
    dim side is too big for): the fact side gets a random salt in
    [0, n_salts), the dim side is REPLICATED once per salt value, and
    the join key becomes (key, salt) — a hot fact key now spreads over
    ``n_salts`` tasks instead of funneling through one.

    Cost model: dim-side rows × n_salts extra shuffle volume buys
    fact-side parallelism on the hot keys; size n_salts to the skew
    factor, not higher. Result is EXACTLY the plain join (salts match
    by construction); only the shuffle distribution changes."""
    salted_fact = fact.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    cond = (salted_fact[fact_key] == replicated_dim[dim_key]) & (
        salted_fact["_salt"] == replicated_dim["_salt"]
    )
    return salted_fact.join(replicated_dim, cond).drop("_salt")
