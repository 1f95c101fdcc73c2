"""Table writers — the Doris-sink role re-expressed as partitioned parquet.

The reference stream-loads into per-app Doris tables with UNIQUE KEY
merge-on-write upsert and RANGE(begin_day_id) week partitions
(common/sink/DorisSinkFactory.java:33-206, resources/sql/schema.sql:96-398).
Spark mapping (SURVEY.md §1.3): ONE table per kind with an `app_id`
partition column (not 10k per-app tables), `partitionBy` for pruning, and
UNIQUE KEY upsert as keep-latest row_number dedup + merge with the existing
table (Delta MERGE stand-in; this module stays parquet-only so it runs
anywhere).

Scale notes: dynamic partition overwrite touches only the partitions
present in the incoming batch — at 100 TB an upsert rewrites days, not the
table. The keep-latest dedup shuffles on the unique key once; with AQE the
skewed-app partitions split automatically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

NULL_TOKEN = r"\N"  # Doris stream-load null literal (EventAttrRow.java:49)


def keep_latest(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """UNIQUE KEY merge-on-write semantics: one row per key, highest
    order_col wins (deterministic — the reference relies on arrival order,
    which batch mode replaces with the seq column)."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    dynamic: bool = True,
) -> None:
    """Partitioned write with dynamic partition overwrite (only partitions
    present in df are replaced — the RANGE-partition analog)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    if dynamic:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def upsert_table(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    keys: list[str],
    order_col: str,
    partition_cols: list[str] | None = None,
) -> None:
    """Merge-on-write upsert into a parquet table: union with existing,
    keep-latest per key, write back. On Delta this is MERGE INTO; the
    logical contract (last writer per UNIQUE KEY wins) is identical
    (DorisSinkFactory.java:60,96,137 partial-update mode).

    Partitioned tables are upserted PARTITION-SCOPED: only the partitions
    the incoming batch touches are read, merged, and dynamically
    overwritten — at 100 TB a daily batch rewrites its days, never the
    table. Contract (same as Doris RANGE partitioning): ``partition_cols``
    must be functionally dependent on ``keys`` (begin_day_id / app_id are
    part of the UNIQUE KEY), so a key's existing row always lives in a
    partition the incoming batch touches.
    """
    incoming = df
    touched = None
    if os.path.exists(path):
        # materialize once: the touched-partition collect below and the
        # merge both consume df — without this the whole upstream plan
        # (often an expensive pipeline projection) executes twice
        df = df.localCheckpoint(eager=True)
        existing = spark.read.parquet(path)
        if partition_cols:
            # bounded collect: distinct (day, app) tuples, not data rows
            touched = df.select(*partition_cols).distinct().collect()
            pred = None
            for row in touched:
                t = None
                for c in partition_cols:
                    # eqNullSafe: a NULL partition value must still select
                    # its existing rows (plain == yields NULL → the null
                    # partition would be overwritten with only the incoming
                    # rows, silently dropping other keys there)
                    eq = F.col(c).eqNullSafe(F.lit(row[c]))
                    t = eq if t is None else (t & eq)
                pred = t if pred is None else (pred | t)
            existing = existing.filter(pred) if pred is not None else existing.limit(0)
        incoming = existing.unionByName(df, allowMissingColumns=True)
    merged = keep_latest(incoming, keys, order_col).localCheckpoint(eager=True)
    if partition_cols:
        # dynamic: untouched partitions keep their files
        write_partitioned(merged, path, partition_cols, mode="overwrite", dynamic=True)
    else:
        merged.write.mode("overwrite").parquet(path)
    spark.catalog.refreshByPath(path)


def export_stream_load_csv(df: DataFrame, path: str, sep: str = "\t") -> None:
    """Compat export in the reference's stream-load shape: flat CSV,
    nulls as \\N (transfer/EventAttrTransfer.java:32), tab-separated
    (the Doris stream-load default the sinks configure)."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit(NULL_TOKEN)).alias(c) for c in df.columns]
    df.select(cols).write.mode("overwrite").option("sep", sep).option(
        "emptyValue", ""
    ).csv(path)


def partial_upsert_table(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    keys: list[str],
    order_col: str,
    update_cols: list[str],
) -> None:
    """Partial-column update upsert: incoming rows carry only
    ``keys + update_cols (+ order_col)``; matched rows take the incoming
    values for ``update_cols`` and KEEP every other column from the
    existing row — Doris's partial_columns stream-load mode
    (DorisSinkFactory.java:60,96,137), i.e. Delta's
    ``MERGE ... UPDATE SET <subset>``. Unmatched incoming keys insert
    with NULLs for the non-updated columns.
    """
    latest = keep_latest(df, keys, order_col).drop(order_col)
    if not os.path.exists(path):
        latest.write.mode("overwrite").parquet(path)
        spark.catalog.refreshByPath(path)
        return
    existing = spark.read.parquet(path)
    # presence flag, not per-column coalesce: an incoming explicit NULL
    # must overwrite (the \N stream-load semantics), which coalesce would
    # silently keep as the old value
    e = existing.alias("e")
    i = latest.withColumn("_i_present", F.lit(True)).alias("i")
    hit = F.coalesce(F.col("_i_present"), F.lit(False))
    other_cols = [c for c in existing.columns if c not in keys and c not in update_cols]
    merged = e.join(i, keys, "full_outer").select(
        *[F.coalesce(f"e.{k}", f"i.{k}").alias(k) for k in keys],
        *[
            F.when(hit, F.col(f"i.{c}")).otherwise(F.col(f"e.{c}")).alias(c)
            for c in update_cols
        ],
        *[F.col(f"e.{c}").alias(c) for c in other_cols],
    ).localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(path)
    spark.catalog.refreshByPath(path)
