"""As-of (point-in-time) join — a custom operator Spark's built-ins
don't provide (SURVEY.md "custom operators" note): for every left row,
match the LATEST right row with the same key and right.ts ≤ left.ts.

Implementation is the scalable union+window pattern, not a correlated
lookup:

1. tag both inputs and union them on (key, ts) — one shuffle total;
2. sort within each key partition by (ts, tag, tiebreak) so every right
   row precedes the left rows it may match, and equal-ts right rows
   order deterministically (latest tiebreak last);
3. ``last(right_payload, ignorenulls=True)`` over an unbounded-preceding
   running window forward-fills the most recent right row onto every
   left row;
4. keep the left rows.

Cost at 100 TB: one hash shuffle on the key + one sort — the same shape
as a sort-merge join, with no range-explosion (a naive
``left.ts >= right.ts`` theta-join is quadratic per key). Deterministic
tie-breaking (latest ts, then highest tiebreak column) is part of the
operator contract so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak: str,
) -> DataFrame:
    """Left as-of join. Returns all left columns plus ``right_payload``
    columns from the matched right row (NULL when no right row at or
    before the left timestamp)."""
    payload = F.struct(
        F.col(right_ts).alias("__ts"),
        F.col(tiebreak).alias("__tb"),
        *[F.col(c) for c in right_payload],
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),  # right rows sort before left at equal ts
        payload.alias("__p"),
        F.col(tiebreak).alias("__order_tb"),
    )
    lcols = left.columns
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        F.lit(None).cast(r.schema["__order_tb"].dataType).alias("__order_tb"),
        *[F.col(c) for c in lcols],
    )
    u = r.select(
        "__k", "__t", "__tag", "__p", "__order_tb",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    ).unionByName(l)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.asc("__t"), F.asc("__tag"), F.asc_nulls_first("__order_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    out = filled.where(F.col("__tag") == 1).select(
        *lcols, *[F.col("__m")[c].alias(c) for c in right_payload]
    )
    return out
