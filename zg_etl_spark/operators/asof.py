"""As-of (point-in-time) join: each left row picks up the most recent
right-side values with ``right_ts <= left_ts`` per key.

The reference resolves "current property value at event time" by reading
mutable KV state as events flow (service/OneIdService.java-style lookups);
batch engines need the explicit as-of join instead. Spark has no native
ASOF JOIN, and the naive translation (theta-join on ``r.ts <= l.ts`` +
latest-per-pair aggregation) explodes to O(events x updates) per key.

This implementation is the scalable merge formulation:

1. union both sides tagged with a sort flag (right rows sort BEFORE left
   rows at equal timestamps -> inclusive ``<=`` semantics, matching
   DuckDB's ASOF JOIN which the oracle uses);
2. one window per key ordered by (ts, flag, tiebreak) forward-fills the
   right-side values with ``last(..., ignorenulls=True)``;
3. keep the left rows.

Cost at any scale: ONE shuffle on the key (both inputs co-partitioned),
then a per-partition sort — no pair explosion, no broadcast requirement,
exactly the plan shape a 100 TB event table needs. Keys are the shuffle
unit, so skewed keys can reuse operators/skew.py salting upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_T = "_asof_t"
_IS_LEFT = "_asof_is_left"
_TIE = "_asof_tie"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join; returns left's columns + ``value_cols`` filled from
    the latest right row at-or-before ``left_ts``.

    ``value_cols`` must not collide with left's columns (alias on the right
    beforehand). When several right rows share (key, ts), pass
    ``right_tiebreak`` (a monotonically increasing column, e.g. a sequence
    number) to make the winner deterministic — the LARGEST tiebreak wins.
    """
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {overlap}")

    carry = [c for c in left.columns if c not in on]
    tie_r = (
        F.col(right_tiebreak)
        if right_tiebreak is not None
        else F.lit(0)
    )
    l_side = left.select(
        *on,
        *carry,
        F.col(left_ts).alias(_T),
        F.lit(1).alias(_IS_LEFT),
        F.lit(None).cast("long").alias(_TIE),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in value_cols
        ],
    )
    r_side = right.select(
        *on,
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in carry
        ],
        F.col(right_ts).alias(_T),
        F.lit(0).alias(_IS_LEFT),
        tie_r.cast("long").alias(_TIE),
        *value_cols,
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(_T, _IS_LEFT, F.col(_TIE).asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_side.unionByName(r_side).select(
        *on,
        *carry,
        F.col(_IS_LEFT),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.filter(F.col(_IS_LEFT) == 1).drop(_IS_LEFT)
