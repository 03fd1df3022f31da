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


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Physical TWIN of :func:`asof_join` on the cogroup-applyInPandas
    surface (SURVEY.md §2.9): both sides hash-shuffle on the key, each
    key's two row groups meet in ONE Arrow-batched pandas callback, and
    ``pd.merge_asof`` does the per-key backward match. Same contract as
    the union+window operator — latest right row with ts ≤ left ts,
    equal-ts ties broken by highest ``tiebreak`` — so the two plans are
    interchangeable and are agreement-tested against each other.

    Same single-shuffle cost shape as the union+window path; the
    difference is where the work lands (JVM window codegen vs Arrow
    transfer + pandas C merge). Exists to prove the cogroup surface on
    a real operator, not as the preferred plan: the union+window twin
    stays entirely JVM-side.

    ``num_partitions`` (default 2× the cluster's default parallelism)
    pins the cogroup stage width with an EXPLICIT repartition on the
    key, which AQE honors: left alone, AQE's byte-based partition
    coalescing sees a few MB of shuffle and folds a pandas stage whose
    cost is per GROUP (Arrow round-trip ≈ tens of ms each) down to a
    handful of tasks — measured 35 s → 13 s at sf0.1 just from
    restoring the stage width (PERFORMANCE.md lesson 16).
    """
    import pandas as pd
    from pyspark.sql import types as T

    lfields = [left.schema[c] for c in left.columns]
    rschema = right.schema
    pfields = [
        T.StructField(c, rschema[c].dataType, True) for c in right_payload
    ]
    out_schema = T.StructType(lfields + pfields)
    lcols = list(left.columns)
    # pandas dtype that survives Arrow conversion for NULLable matches
    _nullable = {
        T.LongType(): "Int64",
        T.IntegerType(): "Int32",
    }

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        # sort right by (ts, tiebreak): merge_asof takes the LAST row at
        # or before the left ts, so ascending tiebreak = highest wins —
        # the same tie order as the window twin's forward fill.
        rsel = rpdf[[right_ts, tiebreak] + [
            c for c in right_payload if c not in (right_ts, tiebreak)
        ]].sort_values([right_ts, tiebreak], kind="mergesort")
        merged = pd.merge_asof(
            lpdf,
            rsel,
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
            suffixes=("", "__r"),
        )
        # .copy() so the dtype fix below is a plain column write, not a
        # chained assignment (pandas' SettingWithCopy detection walks gc
        # referrers PER CALL — measurable at one callback per group).
        out = merged[lcols + right_payload].copy()
        for f in pfields:
            pd_t = _nullable.get(f.dataType)
            if pd_t is not None:
                out[f.name] = out[f.name].astype(pd_t)
        return out

    if num_partitions is None:
        num_partitions = 2 * left.sparkSession.sparkContext.defaultParallelism
    left = left.repartition(num_partitions, key)
    right = right.repartition(num_partitions, key)
    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(merge, out_schema)
    )
