"""Kafka source/sink wiring (S1-S3 parity).

The reference consumes SDK topics and produces inter-stage/side-channel
topics (main/GateJob.java:95-109,132-168; sink/CustomKafkaSink.java). In
this engine the streaming pipeline is source-agnostic — every stage is a
DataFrame transform — so Kafka is exactly one `format("kafka")` swap from
the file source the tests use. These builders carry the reference's
consumer/producer posture: earliest offsets on fresh checkpoints, value =
JSON payload, key = app routing key, snappy-equivalent batching left to
the sink defaults (ArchiveKafkaService.java:17-30 uses acks=0
fire-and-forget for archives; exactly-once stages use the checkpointed
sink).

Requires the spark-sql-kafka package on the cluster classpath (not bundled
in this environment — construction fails with a clear error at start()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def envelope_projection(raw: DataFrame, payload_schema: str) -> DataFrame:
    """Kafka-record shape (topic/partition/offset/key/value) → parsed
    envelope columns. This IS the deserializer (kafka/ZGMsgSchema.java):
    the Kafka metadata rides along as columns the way ZGMessage carries
    them, and the binary value parses as JSON. Pure transform — works on
    the streaming reader's output AND on any batch DataFrame with the
    same shape (how the tests exercise it without a broker)."""
    return raw.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("key").cast("string").alias("msg_key"),
        F.from_json(F.col("value").cast("string"), payload_schema).alias("data"),
    ).select("topic", "partition", "offset", "msg_key", "data.*")


def kafka_source(
    spark: SparkSession,
    servers: str,
    topic: str,
    payload_schema: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """readStream from a topic → parsed envelope columns."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return envelope_projection(raw, payload_schema)


def kafka_sink(
    df: DataFrame,
    servers: str,
    topic: str,
    checkpoint_dir: str,
    key_col: str | None = None,
):
    """writeStream JSON-serialized rows to a topic (the inter-stage hop /
    side-channel producer). Returns the unstarted writer so callers pick
    the trigger."""
    cols = [F.to_json(F.struct(*df.columns)).alias("value")]
    if key_col:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return (
        df.select(*cols)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
