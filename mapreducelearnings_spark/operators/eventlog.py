"""Event-log modeling operators (round 6): gap sessionization and SCD2
change-log compaction.

Both are single-shuffle plans by construction: every window pass and the
final rollup cluster on the same key, so Catalyst plans ONE
HashPartitioning exchange and reuses it (asserted in
tests/test_plans.py). At 100 TB that is the property that matters —
per-key event modeling without per-user collect loops, state bounded by
the window frame, skew bounded by the busiest single key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_sec: int,
    key_col: str = "user_id",
    ts_col: str = "ts_sec",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-session rollup with gap-based session assignment: a new
    session starts when the key's previous event is more than
    ``gap_sec`` older (or absent). Output: (key, session_idx, n_events,
    duration_sec, sum_value) with session_idx 1-based in event order.

    The lag-flag + running-sum assignment is the standard declarative
    replacement for per-user collect-and-loop ETL; ties are broken by
    ``tiebreak_col`` so boundaries are deterministic. ``sum_value`` is
    computed in the lesson-14 exact-integer form (values quantized to
    1e-6 as BIGINT, summed exactly, one floor-quantized division at
    the end) — never ROUND over an accumulated double, whose
    summation-order ulp and tie mode diverge across engines.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull() | (F.col(ts_col) - prev > gap_sec), 1
    ).otherwise(0)
    v6 = (
        F.floor(F.col(value_col) * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("_v6")
    )
    sessions = (
        events.select("*", v6)
        .withColumn("is_new", is_new)
        .withColumn(
            "session_idx",
            F.sum("is_new")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"),
        )
    )
    return sessions.groupBy(key_col, "session_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration_sec"),
        (
            F.floor(F.sum("_v6").cast("double") / F.lit(100.0) + F.lit(0.5))
            / F.lit(10000.0)
        ).alias("sum_value"),
    )


def scd2_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts_sec",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """SCD2 change-log compaction: keep only the rows where the key's
    state CHANGES, then assign [valid_from, valid_to) validity via LEAD
    (NULL valid_to = current state). Output: (key, state,
    valid_from_sec, valid_to_sec, is_current)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev_state = F.lag(state_col).over(w)
    changes = events.withColumn("_prev", prev_state).where(
        F.col("_prev").isNull() | (F.col("_prev") != F.col(state_col))
    )
    valid_to = F.lead(ts_col).over(w)
    return changes.select(
        key_col,
        state_col,
        F.col(ts_col).alias("valid_from_sec"),
        valid_to.alias("valid_to_sec"),
        valid_to.isNull().alias("is_current"),
    )
