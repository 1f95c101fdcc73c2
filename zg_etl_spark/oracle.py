"""Local mirror of the driver's DuckDB-oracle correctness check.

Runs a declared Spark query and its oracle SQL side-by-side and compares
row count, column names, and order-insensitive values (columns sorted by
name, rows sorted, values normalized). Used by tests/test_oracle_parity.py
so the per-round CORRECTNESS gate is verified before the driver runs it.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
from pyspark.sql import SparkSession

from zg_etl_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # tolerate last-ULP drift; exact-decimal paths are unaffected
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _canon(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare(
    spark: SparkSession, sf_dir: str, query_fn, oracle_sql: str
) -> tuple[bool, str]:
    sdf = query_fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    res = con.execute(oracle_sql)
    d_cols = [d[0].lower() for d in res.description]
    d_rows = res.fetchall()
    con.close()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    sc, dc = _canon(s_rows, s_cols), _canon(d_rows, d_cols)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
