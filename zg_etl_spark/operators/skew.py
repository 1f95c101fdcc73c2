"""Skew-mitigation helpers for hot keys at 100 TB.

AQE's skew-join splitting (on in session.py) covers sort-merge joins, but
two shapes still need manual salting at scale:

1. aggregation on a skewed key (one app producing 50% of events): a
   two-stage salted aggregate spreads the hot key across `salt` reducers
   before the final combine;
2. joining a skewed fact key against a non-broadcastable dimension:
   replicate the dim rows `salt`× and scatter the fact rows, turning one
   hot partition into `salt` even ones.

Both are pure DataFrame rewrites — results are exactly equal to the
unsalted forms (tests assert it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_SALT = 16


def _row_salt(df: DataFrame, salt: int) -> Column:
    """Deterministic per-row salt derived from ROW CONTENT, never from
    monotonically_increasing_id(): a shuffle fetch-failure retry recomputes
    the map side, and a nondeterministic grouping key there can duplicate
    or drop rows when already-fetched reducer output is kept (the
    SPARK-23207 class of bug). Content-derived salts recompute identically,
    so the salted plans are retry-safe on a multi-executor cluster."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """groupBy(keys).agg(...) with a salt pre-aggregation.

    aggs maps output name → (partial_expr, final_expr) is not needed for
    the algebraic aggregates this supports: COUNT and SUM (the DQ-counter
    shapes, GateProcessFunction.java:106-124). COUNT becomes SUM of
    partial counts; SUM re-sums.
    """
    salted = df.withColumn("_salt", _row_salt(df, salt))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[a.alias(f"_p_{name}") for name, a in aggs.items()]
    )
    finals = []
    for name in aggs:
        finals.append(F.sum(f"_p_{name}").alias(name))
    return partial.groupBy(*keys).agg(*finals)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Inner equi-join where `fact` is heavily skewed on `keys` and `dim`
    is too big to broadcast: dim rows are replicated salt×, fact rows get
    a deterministic salt from row identity, and the join key becomes
    (keys..., salt) — one hot partition becomes `salt` even ones."""
    fact_s = fact.withColumn("_salt", _row_salt(fact, salt).cast("int"))
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = fact_s.join(dim_s, [*keys, "_salt"], "inner").drop("_salt")
    return out
