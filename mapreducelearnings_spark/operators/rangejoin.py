"""Banded range (interval) join — the scale-safe plan for joins whose
ONLY predicate is an inequality/range condition.

Spark has no native interval-join physical operator: a join with a pure
range predicate plans as BroadcastNestedLoopJoin (O(|L|·|R|) work, and
an outright driver OOM once neither side fits in a broadcast). The
classic fix — the same banding trick Flink's interval join and the
DBMS literature (e.g. Bouros & Mamoulis, SIGMOD'17 forward-scan
interval joins) build on — is to quantize the range dimension into
fixed-width bands:

1. each POINT lands in exactly one band: ``floor(x / band)``;
2. each INTERVAL is exploded to every band it overlaps
   (``sequence(floor(lo/band), floor((hi-1)/band))`` — amplification is
   ``1 + ceil(len/band)`` rows, bounded when band ≈ typical length);
3. an ordinary EQUI-join on the band key co-locates every point with
   every interval that could contain it — shuffle-partitioned,
   AQE-planned, skew-salting-compatible like any other equi-join;
4. the exact predicate ``lo <= x < hi`` refines band collisions.

At 100 TB both sides shuffle-partition on the band key; no broadcast,
no nested loop, no single fat partition (band width tunes fan-out vs
collision rate exactly like an LSH bucket width).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BAND = "_rj_band"


def banded_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    band: int,
) -> DataFrame:
    """Inner-join ``points`` to every interval with
    ``lo_col <= point_col < hi_col`` (hi exclusive), as an equi-join on
    a band key instead of a nested loop.

    ``point_col`` / ``lo_col`` / ``hi_col`` must be integral (e.g.
    epoch-microsecond longs — exact arithmetic, no float banding).
    ``band`` is the band width in the same unit; choose it near the
    typical interval length so each interval explodes to ~2 bands.
    """
    if band <= 0:
        raise ValueError("band must be a positive integer")
    p = points.withColumn(_BAND, F.floor(F.col(point_col) / F.lit(band)))
    iv = intervals.withColumn(
        _BAND,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(band)),
                # hi is exclusive: a point at hi-1 is the last member,
                # so the last covered band is floor((hi-1)/band)
                F.floor((F.col(hi_col) - F.lit(1)) / F.lit(band)),
            )
        ),
    )
    return (
        p.join(iv, _BAND)
        .where(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) < F.col(hi_col))
        )
        .drop(_BAND)
    )
