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


# DuckDB logical type -> comparison family. Families must agree with the
# Spark column family or the driver's value hash (which stringifies after
# an arrow/pandas conversion) drifts even when python fetchall() values
# compare equal — e.g. HUGEINT -> float64 in pandas, DOUBLE 1.5e9 vs
# BIGINT 1500000000. Caught r01: p13 (SUM->HUGEINT), q16 (epoch->DOUBLE).
_DUCK_FAMILY = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "UBIGINT": "int",
    "DOUBLE": "float",
    "FLOAT": "float",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "ts",
    "TIMESTAMP_NS": "ts",
    "BLOB": "bytes",
}

_SPARK_FAMILY = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "double": "float",
    "float": "float",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "binary": "bytes",
}


def _spark_family(type_name: str) -> str:
    t = type_name.split("(")[0].strip().lower()
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith("array"):
        return "array"
    return _SPARK_FAMILY.get(t, f"other:{t}")


def _duck_family(type_name) -> str:
    t = str(type_name).upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    # LIST types print as ELEM[] (BIGINT[]) or LIST(ELEM)
    if t.endswith("[]") or t.startswith("LIST("):
        return "array"
    return _DUCK_FAMILY.get(t, f"other:{t}")


def type_families(
    spark_dtypes: list[tuple[str, str]], duck_cols: list[str], duck_types: list
) -> list[str]:
    """Per-column family mismatches between a Spark schema and a DuckDB
    relation (matched by lower-cased column name)."""
    duck = {c.lower(): _duck_family(t) for c, t in zip(duck_cols, duck_types)}
    errs = []
    for name, dt in spark_dtypes:
        sfam = _spark_family(dt)
        dfam = duck.get(name.lower())
        if dfam is None:
            continue  # column-name mismatch reported separately
        if sfam != dfam:
            errs.append(f"{name}: spark={dt}({sfam}) duck={dfam}")
    return errs


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
    rel = con.sql(oracle_sql)
    d_cols = [c.lower() for c in rel.columns]
    d_types = list(rel.types)
    d_rows = rel.fetchall()
    con.close()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    tf = type_families(sdf.dtypes, d_cols, d_types)
    if tf:
        return False, f"type-family mismatch (driver hash would drift): {tf}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    sc, dc = _canon(s_rows, s_cols), _canon(d_rows, d_cols)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
