"""Banded range (interval) join — the scale-safe plan for joins whose
ONLY predicate is an inequality/range condition.

Spark has no native interval-join physical operator: a join with a pure
range predicate plans as BroadcastNestedLoopJoin (O(|L|·|R|) work, and
an outright driver OOM once neither side fits in a broadcast). The
classic fix — the same banding trick Flink's interval join and the
DBMS literature (e.g. Bouros & Mamoulis, SIGMOD'17 forward-scan
interval joins) build on — is to quantize the range dimension into
fixed-width bands:

1. each POINT lands in exactly one band: ``floordiv(x, band)``;
2. each INTERVAL is exploded to every band it overlaps
   (``sequence(floordiv(lo,band), floordiv(hi-1,band))`` — amplification
   is ``1 + ceil(len/band)`` rows, bounded when band ≈ typical length);
3. an ordinary EQUI-join on the band key co-locates every point with
   every interval that could contain it — shuffle-partitioned,
   AQE-planned, skew-salting-compatible like any other equi-join;
4. the exact predicate ``lo <= x < hi`` refines band collisions.

At 100 TB both sides shuffle-partition on the band key; no broadcast,
no nested loop, no single fat partition (band width tunes fan-out vs
collision rate exactly like an LSH bucket width).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BAND = "_rj_band"
_X = "_rj_x"


def _floor_div(col: Column, band: int) -> Column:
    """Exact integer floor-division band key.

    ``F.floor(col / band)`` routes through DOUBLE division, which is
    only exact below ~2^52 — fine for epoch-microseconds, silently
    wrong for nanosecond keys or other large integral domains. This
    stays in 64-bit integer arithmetic at every magnitude:
    ``pmod(x, b)`` is the nonnegative remainder, so ``x - pmod(x, b)``
    is an exact multiple of ``b``, and integer ``div`` of an exact
    multiple equals floor(x / b) for negative x too — matching
    Python's ``//`` (``div`` alone would truncate toward zero:
    -5 div 3 = -1, while floor(-5/3) = -2). The band key is internal
    to the join — any monotone quantization yields a correct cover —
    but floor keeps bands uniform-width across zero, where
    truncate-toward-zero would double-width the band at the origin.

    Precondition (documented, not runtime-checked — a check would cost
    a full scan of every input): ``x ≥ LONG_MIN + band``. Within
    ``band`` of Long.MIN_VALUE the subtraction ``x - pmod(x, b)`` can
    underflow and wrap (non-ANSI long arithmetic); the property test
    covers ±2^62, far beyond any physical key domain (epoch
    nanoseconds are < 2^63 only past year 2262; 2^62 is ~146 years of
    nanos), and the wraparound strip occupies the last ``band`` values
    above −2^63 — unreachable for real time/offset keys.
    """
    x = col.cast("long")
    b = F.lit(int(band)).cast("long")
    exact_multiple = x - F.pmod(x, b)
    # IntegralDivide has no pyspark.sql.functions wrapper; route the
    # already-exact multiple through `div` via expr on staged inputs.
    return F.call_function("div", exact_multiple, b)


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
    epoch-microsecond longs) and at least ``band`` above
    Long.MIN_VALUE (see :func:`_floor_div`'s precondition; any
    physical time/offset domain satisfies this by ~19 orders of
    magnitude); banding is then exact 64-bit integer floor division at
    every magnitude (no double rounding). ``band`` is the band width
    in the same unit; choose it near the typical interval length so
    each interval explodes to ~2 bands.
    """
    if band <= 0:
        raise ValueError("band must be a positive integer")
    p = points.withColumn(_BAND, _floor_div(F.col(point_col), band))
    iv = intervals.withColumn(
        _BAND,
        F.explode(
            F.sequence(
                _floor_div(F.col(lo_col), band),
                # hi is exclusive: a point at hi-1 is the last member,
                # so the last covered band is floordiv(hi-1, band)
                _floor_div(F.col(hi_col) - F.lit(1), band),
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
