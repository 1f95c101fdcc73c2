"""Interval (range) join: each left row matches right-side intervals
containing its timestamp, per key.

The reference's analog is session attribution: events carry a session id
assigned as state flows (operator/id/SessionIdProcessOperator.java:26-95)
and the per-session/user rollups are declared downstream
(resources/sql/1.sql:396-657). A batch engine joining raw points to
derived interval tables needs the explicit range join instead.

Spark has no native range join; the naive translation is a theta-join
(``l.ts BETWEEN r.lo AND r.hi``) which Catalyst can only execute as a
BroadcastNestedLoopJoin — O(points × intervals) per key and undistributable
when neither side fits in memory. This is the bucket-decomposition
formulation:

1. pick a bucket width W; each interval is exploded to the (few) W-sized
   buckets it overlaps — interval rows grow by ~(len/W + 1)×, a bounded,
   tunable factor;
2. each point computes its single bucket ``floor(ts / W)`` map-side;
3. equi-join on (key..., bucket) — ONE hash shuffle, AQE-skew-handled —
   then the exact containment predicate filters bucket-grain false hits.

A point has exactly one bucket, so no post-join dedup is needed; a point
inside k overlapping intervals yields k rows (join semantics, same as the
theta-join oracle). Cost at any scale: one shuffle of points + inflated
intervals on an 8-byte-extended key, instead of a nested loop. Width W
trades interval inflation (small W) against false-hit filtering (large W);
set it near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_BUCKET = "_iv_bucket"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to the interval rows (same ``on`` key) with
    ``start_col <= ts_col <= end_col`` (inclusive both ends).

    Returns points' columns + intervals' non-key columns. ``bucket_width``
    is in the timestamp's own unit. ``how`` is 'inner' or 'left_outer'
    ('left_outer' keeps unmatched points with NULL interval columns).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported how: {how}")
    overlap = (set(points.columns) - set(on)) & (set(intervals.columns) - set(on))
    if overlap:
        raise ValueError(f"column collision between sides: {overlap}")

    # floor(ts / W) via double division: exact for |ts| < 2^53, which
    # covers epoch-millis until year ~287396; floors (not truncates) so
    # negative timestamps bucket consistently on both sides
    def bucket_of(c: str):
        return F.floor(F.col(c) / F.lit(bucket_width)).cast("long")

    iv = intervals.withColumn(
        _BUCKET, F.explode(F.sequence(bucket_of(start_col), bucket_of(end_col)))
    )
    pt = points.withColumn(_BUCKET, bucket_of(ts_col))
    contained = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) <= F.col(end_col)
    )
    if how == "inner":
        return pt.join(iv, [*on, _BUCKET]).where(contained).drop(_BUCKET)
    # left_outer: inner-match first (cheap), then union the never-matched
    # points back with NULL interval columns — a plain left join on the
    # bucketed key would duplicate a point across its false-hit buckets
    matched = pt.join(iv, [*on, _BUCKET]).where(contained).drop(_BUCKET)
    iv_cols = [c for c in intervals.columns if c not in on]
    # null-safe anti-join: a name-list anti-join uses plain equality, so a
    # matched point carrying a NULL in any payload column would re-emit as
    # "unmatched" (NULL = NULL is not true); eqNullSafe closes that hole
    left, right = pt.drop(_BUCKET).alias("_ivl"), matched.select(*points.columns).alias("_ivr")
    cond = None
    for c in points.columns:
        eq = F.col(f"_ivl.{c}").eqNullSafe(F.col(f"_ivr.{c}"))
        cond = eq if cond is None else cond & eq
    unmatched = left.join(right, cond, "left_anti").select(
        *[F.col(f"_ivl.{c}") for c in points.columns]
    )
    for c in iv_cols:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(intervals.schema[c].dataType)
        )
    return matched.unionByName(unmatched)
