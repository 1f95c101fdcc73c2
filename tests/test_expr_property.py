"""Randomized cross-engine conformance for the expression compiler.

The hand-written corpus (test_expr_compiler.py) covers each function once;
this sweeps the grammar with seeded random expression trees — arithmetic
precedence chains, nested CASE, string nesting, null plumbing — and
requires Spark and DuckDB to agree on every one. All expressions are
evaluated in ONE query per engine (each as a select column), so the test
costs two queries, not 2N.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from zg_etl_spark.functions.expr_compiler import ExprCompiler

FIELDS = {
    "price": "1500.5",
    "qty": "3",
    "name_s": "Alice",
    "status": "ok",
    "maybe_null": None,
    "ct_s": "1722470400",      # 2024-08-01 00:00:00 UTC, seconds
    "ct_ms": "1735689600123",  # 2025-01-01 00:00:00.123 UTC, millis
}


def _resolver(name: str, hint: str) -> str:
    assert name in FIELDS, name
    if hint == "number":
        return f"try_cast({name} AS DOUBLE)"
    return name


COMPILER = ExprCompiler(spark_field_resolver=_resolver, duck_field_resolver=_resolver)


def _gen_num(rng: random.Random, depth: int) -> str:
    if depth <= 0:
        return rng.choice(["price", "qty", str(rng.randrange(1, 100)),
                           f"{rng.randrange(1, 1000)}.{rng.randrange(10, 99)}"])
    a = _gen_num(rng, depth - 1)
    b = _gen_num(rng, depth - 1)
    op = rng.choice(["+", "-", "*", "/", "%"])
    if op in ("/", "%"):
        b = str(rng.randrange(2, 9))  # literal non-zero denominator
    pick = rng.random()
    if pick < 0.15:
        return f"abs({a} - {b})"
    if pick < 0.3:
        return f"round({a} {op} {b}, {rng.randrange(0, 4)})"
    if pick < 0.4:
        return rng.choice([f"ceil({a})", f"floor({a})"])
    return f"({a} {op} {b})"


def _gen_str(rng: random.Random, depth: int) -> str:
    if depth <= 0:
        return rng.choice(["name_s", "status", f"'{rng.choice(['x', 'yy', 'zzz'])}'"])
    a = _gen_str(rng, depth - 1)
    pick = rng.random()
    if pick < 0.25:
        return f"upper({a})"
    if pick < 0.5:
        return f"lower({a})"
    if pick < 0.7:
        return f"substring({a}, {rng.randrange(1, 3)}, {rng.randrange(1, 5)})"
    return f"concat({a}, '-', {_gen_str(rng, depth - 1)})"


def _gen_bool(rng: random.Random, depth: int) -> str:
    if depth <= 0:
        if rng.random() < 0.5:
            return f"{_gen_num(rng, 1)} {rng.choice(['>', '<', '>=', '<=', '=', '!='])} {rng.randrange(0, 2000)}"
        return f"{_gen_str(rng, 1)} {rng.choice(['=', '!='])} 'ok'"
    a = _gen_bool(rng, depth - 1)
    b = _gen_bool(rng, depth - 1)
    return rng.choice([f"({a} AND {b})", f"({a} OR {b})", f"NOT {a}"])


_DATE_FMTS = ["yyyy-MM-dd", "yyyyMMdd", "yyyy-MM-dd HH:mm:ss", "HH:mm"]


def _gen_date(rng: random.Random) -> str:
    ts = rng.choice(["ct_s", "ct_ms", "'2024-08-10'", "'2025-02-28 13:45:00'"])
    pick = rng.random()
    if pick < 0.4:
        return f"date_format({ts}, '{rng.choice(_DATE_FMTS)}')"
    if pick < 0.6:
        fld = rng.choice(["ct_s", "ct_ms"])
        return (f"from_unixtime({fld}, '{rng.choice(_DATE_FMTS)}')"
                if rng.random() < 0.5 else f"from_unixtime({fld})")
    other = rng.choice(["ct_s", "'2024-07-15'", "'2024-12-31'"])
    return f"datediff({ts}, {other})"


def _gen_expr(rng: random.Random) -> str:
    pick = rng.random()
    if pick < 0.3:
        return _gen_num(rng, rng.randrange(1, 4))
    if pick < 0.45:
        return _gen_str(rng, rng.randrange(1, 4))
    if pick < 0.6:
        return _gen_date(rng)
    if pick < 0.75:
        # branches share one type: mixed string/number branches diverge
        # across engines' coercion lattices (Spark ANSI casts the string
        # branch to DOUBLE and throws; DuckDB unifies to VARCHAR) — and
        # real virtual-attribute rules are written type-consistent
        gen = _gen_str if rng.random() < 0.5 else _gen_num
        tail = f" ELSE {gen(rng, 1)}" if rng.random() < 0.7 else ""
        return f"CASE WHEN {_gen_bool(rng, 1)} THEN {gen(rng, 1)}{tail} END"
    if pick < 0.9:
        return f"coalesce(maybe_null, {_gen_str(rng, 1)})"
    return f"nullif({_gen_str(rng, 1)}, 'ok')"


N_EXPRS = 250


def test_random_expressions_agree(spark):
    rng = random.Random(20260813)
    exprs = [_gen_expr(rng) for _ in range(N_EXPRS)]

    s_cols, d_cols = [], []
    for i, e in enumerate(exprs):
        s_cols.append(f"CAST(({COMPILER.to_spark_sql(e)}) AS STRING) AS c{i}")
        d_cols.append(f"CAST(({COMPILER.to_duckdb_sql(e)}) AS VARCHAR) AS c{i}")

    row_cols = [
        f"CAST(NULL AS STRING) AS {k}" if v is None else f"'{v}' AS {k}"
        for k, v in FIELDS.items()
    ]
    s_row = spark.sql(
        "SELECT " + ",\n".join(s_cols)
        + " FROM (SELECT " + ", ".join(row_cols) + ")"
    ).collect()[0]

    duck_row_cols = [
        f"NULL AS {k}" if v is None else f"'{v}' AS {k}"
        for k, v in FIELDS.items()
    ]
    d_row = duckdb.sql(
        "SELECT " + ",\n".join(d_cols)
        + " FROM (SELECT " + ", ".join(duck_row_cols) + ")"
    ).fetchone()

    mismatches = []
    for i, e in enumerate(exprs):
        s_val, d_val = s_row[i], d_row[i]
        if s_val is None and d_val is None:
            continue
        if (s_val is None) != (d_val is None):
            mismatches.append((e, s_val, d_val))
            continue
        try:  # numeric: tolerate representation (e.g. '214.0' vs '214')
            if abs(float(s_val) - float(d_val)) > 1e-9:
                mismatches.append((e, s_val, d_val))
        except ValueError:
            if s_val != d_val:
                mismatches.append((e, s_val, d_val))
    assert not mismatches, mismatches[:5]
