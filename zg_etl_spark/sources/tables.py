"""Parquet table loaders for the driver testdata star schema.

The reference consumes Kafka topics (main/GateJob.java:95-109); in this
engine the batch source is columnar parquet and the streaming source is
``readStream`` (see zg_etl_spark.streaming). Loading stays declarative so
Catalyst keeps predicate pushdown + column pruning into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables that should always be broadcast in joins.
BROADCAST_TABLES = {"region", "nation"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_session_confs(spark: SparkSession) -> None:
    """Confs the engine's RESULTS depend on, set defensively at query time:
    the driver harness constructs its own SparkSession, so correctness
    cannot ride on zg_etl_spark.session defaults.

    - session timezone UTC: every date_format/CAST-to-DATE bucket and
      timestamp-literal comparison must agree with the DuckDB oracle's
      naive-UTC timestamps;
    - parquet nanos-as-long: older driver testdata stored events.ts as
      TIMESTAMP(NANOS); harmless no-op on µs data / newer Spark;
    - shuffle partitions: lowered from the 200 default only (never
      overriding a deliberate setting) — at oracle scale 200-partition
      shuffles are pure task-launch overhead.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
        )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_events_ts(df)
    return df


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Pin the engine-internal contract events.ts = epoch-NANOS BIGINT.

    The driver testdata has shipped both TIMESTAMP(NANOS) (read as a nanos
    BIGINT under nanosAsLong) and timestamp[us] (read as TIMESTAMP_NTZ —
    Spark ≥4.1 ignores nanosAsLong for µs data). Every downstream stage
    derives `ct` as `ts DIV 1_000_000`, so convert the NTZ reading to
    nanos here. Map-side column arithmetic — no shuffle, stays inside
    whole-stage codegen; the µs→ns widening is exact (int64 covers ±292y).
    Session TZ is pinned UTC so the NTZ→TIMESTAMP cast is identity.
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get("ts")
    if dt in ("timestamp_ntz", "timestamp"):
        df = df.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
