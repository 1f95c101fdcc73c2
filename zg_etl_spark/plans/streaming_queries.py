"""Streaming queries exposed on the declared-query surface.

The streaming engine (zg_etl_spark/streaming/engine.py) is deterministic:
get-or-create device-ID assignment over seq-ordered micro-batches produces
exactly the IDs the batch pipeline assigns (dense_rank over first-seen
order per app — proven equivalent in tests/test_streaming.py). That lets a
REAL Structured Streaming run be checked against a plain SQL oracle: the
stream's merged mapping table must equal the batch `did_ids` stage.

s1 runs readStream (file source, maxFilesPerTrigger=1, availableNow) over
gate-ok events split into two seq-ordered files → foreachBatch incremental
identity → the final mapping store, and the DuckDB oracle is just
`SELECT app_id, did, zg_did FROM did_ids`.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from zg_etl_spark.operators.domain import (
    VALID_PAST_MS,
    duck_pipeline_sql,
    spark_pipeline_df,
)

QUERIES: dict = {}
ORACLE: dict = {}


def _write_split_files(parts: list[DataFrame], src_dir: str) -> None:
    """Write each part as ONE plain parquet file ``b{i}.parquet`` with
    strictly increasing mtimes so the file stream source (which orders
    by modification time) replays them in part order. The single-task
    part-writes are independent — they run as concurrent jobs instead
    of back-to-back."""
    from concurrent.futures import ThreadPoolExecutor

    def write_one(i_and_df) -> None:
        i, part_df = i_and_df
        stage = os.path.join(src_dir, f"_stage{i}")
        part_df.coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(src_dir, f"b{i}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))
        shutil.rmtree(stage)

    with ThreadPoolExecutor(max_workers=max(len(parts), 1)) as ex:
        list(ex.map(write_one, enumerate(parts)))


def _await_done(q, timeout_s: int = 300) -> None:
    """availableNow runs MUST finish inside the timeout: ignoring the
    False return would read a partial result from the sink and delete
    the checkpoint under a live query."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise RuntimeError(f"streaming query did not finish in {timeout_s}s")


def _write_seq_ordered_files(df: DataFrame, src_dir: str) -> None:
    """Split into two seq-ordered files (b0 < b1 by seq)."""
    mid = df.selectExpr("percentile_approx(seq, 0.5) AS m").first().m
    _write_split_files([df.filter(df.seq <= mid), df.filter(df.seq > mid)], src_dir)


# Each s-query streams a projection of the same spine; the seq-split
# source files are deterministic per (session, sf_dir, sql), so write them
# once and reuse across queries/reruns (dirs removed at process exit — a
# deployment's source topic persists the same way).
_SRC_MEMO: dict = {}

# One state shard per this many bytes of stream-source input. Every
# micro-batch pays a near-constant store-commit cost PER SHARD (load,
# watermark-evict, delta write, commit — measured ~85 ms/shard/batch on
# this host, including the trailing zero-row finalization batch), so the
# shard count must track state volume, not the core count: guide §2.2's
# fewer-larger-partitions rule applied to state stores. Derived from the
# source directory's actual bytes and capped at the session parallelism,
# the same value scales from a sub-MB local replay (2 shards) to a
# cluster topic (cap) without retuning.
_STATE_SHARD_BYTES = 8 << 20


def _stream_shards(spark: SparkSession, src: str) -> str:
    try:
        total = sum(
            os.path.getsize(os.path.join(src, f))
            for f in os.listdir(src)
            if f.endswith(".parquet")
        )
    except OSError:
        total = 0
    cap = spark.sparkContext.defaultParallelism
    return str(max(2, min(total // _STATE_SHARD_BYTES + 1, cap)))

# One SUPERSET source serves every per-projection s-query: `resolved` is
# row-for-row gate_ok (inner joins against mappings built FROM gate_ok),
# and a parquet file stream read with a SUBSET schema prunes columns at
# the reader — so five per-query source builds collapse into one write.
# k/value/pl ride along for the in-stream virtual-event fan-out (the
# rule match predicate reads the custom bag + envelope, domain.py
# vtl_match_any)
_SUPERSET_SQL = (
    "SELECT event_id, app_id, did, cuid, dt, owner, event_name, "
    "event_type, k, value, pl, ct, seq, zg_did FROM resolved"
)


def _seq_ordered_source(spark: SparkSession, sf_dir: str, sql: str) -> str:
    from zg_etl_spark.session import session_key

    key = (session_key(spark), sf_dir, sql)
    if key in _SRC_MEMO:
        return _SRC_MEMO[key]
    import atexit

    src = tempfile.mkdtemp(prefix="zg_stream_src_")
    _write_seq_ordered_files(spark_pipeline_df(spark, sf_dir, sql), src)
    atexit.register(shutil.rmtree, src, ignore_errors=True)
    _SRC_MEMO[key] = src
    return src


def _s1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zg_etl_spark.streaming.engine import start_identity_stream

    src = _seq_ordered_source(spark, sf_dir, _SUPERSET_SQL)
    work = tempfile.mkdtemp(prefix="zg_stream_")

    # the per-batch shuffles here touch only distinct NEW devices (the
    # event-side joins are broadcast) — a handful of shards beats paying
    # 32-task scheduling overhead per micro-batch job on tiny state
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _stream_shards(spark, src))
    try:
        q = start_identity_stream(
            spark,
            source_dir=src,
            schema="event_id BIGINT, app_id BIGINT, did STRING, ct BIGINT, seq BIGINT",
            store_path=os.path.join(work, "store"),
            output_path=os.path.join(work, "out"),
            checkpoint_dir=os.path.join(work, "ckpt"),
        )
        _await_done(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # the merged mapping store IS the result; localCheckpoint detaches it
    # from the temp dir before cleanup
    from zg_etl_spark.streaming.engine import MappingStore

    result = (
        MappingStore(
            spark, os.path.join(work, "store"), key_col="did", id_col="zg_did"
        )
        .read()
        .select("app_id", "did", "zg_did")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(work, ignore_errors=True)
    return result


QUERIES["s1_streaming_identity"] = _s1
ORACLE["s1_streaming_identity"] = duck_pipeline_sql(
    "SELECT app_id, did, zg_did FROM did_ids"
)


# ---------------------------------------------------------------------------
# s2: the custom stateful operator (applyInPandasWithState sessionization)
# must reproduce declarative batch sessionization exactly — the oracle is
# the classic LAG + cumulative-sum session assignment, which DuckDB runs.
# The sink is a foreachBatch CHANGELOG STORE, not a memory sink: update
# mode emits only the sessions a batch changed, each append is O(changed),
# and the read is keep-latest per session key — the same store-backed
# pattern as s1/s4/s5 and the parquet rendering of the Doris UNIQUE-KEY
# session table the reference writes (driver memory holds nothing).
# ---------------------------------------------------------------------------
_SESSION_GAP_MS = 3_600_000  # 1 hour

_S2_ORACLE_BODY = f"""
, sess_events AS (
  SELECT app_id, zg_did, ct FROM resolved
),
marked AS (
  SELECT app_id, zg_did, ct,
         CASE WHEN ct - LAG(ct) OVER (PARTITION BY app_id, zg_did ORDER BY ct)
                   > {_SESSION_GAP_MS} THEN 1 ELSE 0 END AS brk
  FROM sess_events
),
assigned AS (
  SELECT app_id, zg_did, ct,
         SUM(brk) OVER (PARTITION BY app_id, zg_did ORDER BY ct
                        ROWS UNBOUNDED PRECEDING) AS sess_idx
  FROM marked
)
SELECT app_id, zg_did, MIN(ct) AS session_start, MAX(ct) AS session_end,
       COUNT(*) AS n_events
FROM assigned GROUP BY app_id, zg_did, sess_idx"""


def _s2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from zg_etl_spark.sinks import keep_latest
    from zg_etl_spark.streaming.sessions import sessionize

    src = _seq_ordered_source(spark, sf_dir, _SUPERSET_SQL)
    work = tempfile.mkdtemp(prefix="zg_s2_")
    store = os.path.join(work, "session_store")

    stream = (
        spark.readStream.schema("app_id BIGINT, zg_did BIGINT, ct BIGINT, seq BIGINT")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # O(changed-sessions) append per batch — never a store rewrite
        batch_df.withColumn("_b", F.lit(batch_id)).write.mode("append").parquet(store)

    # the state-store partition count is frozen from shuffle.partitions at
    # query start; per-partition store commit cost dominates at this volume,
    # so the stateful query runs with a handful of state shards (a real
    # deployment sizes this to active-entity count / executor count)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _stream_shards(spark, src))
    try:
        q = (
            sessionize(stream, gap_ms=_SESSION_GAP_MS)
            .writeStream.outputMode("update")
            .foreachBatch(_sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        _await_done(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # final state per session = the latest batch's emission (sessions only
    # grow, so last write wins) — UNIQUE-KEY read-time merge
    result = (
        keep_latest(
            spark.read.parquet(store),
            ["app_id", "zg_did", "session_start"],
            "_b",
        )
        .select("app_id", "zg_did", "session_start", "session_end", "n_events")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(work, ignore_errors=True)
    return result


QUERIES["s2_streaming_sessions"] = _s2
ORACLE["s2_streaming_sessions"] = duck_pipeline_sql(_S2_ORACLE_BODY)


# ---------------------------------------------------------------------------
# s3: watermarked tumbling-window gate counters (the event-time upgrade of
# GateProcessFunction.java:106-124) — append-mode emission is deterministic
# for ordered replay, so the DuckDB oracle states the emission rule exactly:
# a window is emitted iff window_end <= final_watermark, and the final
# watermark is max(ct) - delay (the trailing no-data micro-batch flushes).
# ---------------------------------------------------------------------------
_S3_WINDOW_MS = 3_600_000      # 1 hour tumbling
_S3_DELAY_MS = 7_200_000       # 2 hour watermark delay


def _s3(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    from pyspark.sql import functions as F

    from zg_etl_spark.streaming.engine import start_event_counts_stream

    src = _seq_ordered_source(spark, sf_dir, _SUPERSET_SQL)
    work = tempfile.mkdtemp(prefix="zg_s3_")

    name = "s3_mem_" + _uuid.uuid4().hex[:8]
    # windowed-agg state is (windows × apps × event types) — a few
    # thousand rows; 8 state shards, not 32 (same sizing rule as s1/s2)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _stream_shards(spark, src))
    try:
        q = start_event_counts_stream(
            spark,
            source_dir=src,
            schema="app_id BIGINT, event_type STRING, ct BIGINT, seq BIGINT",
            checkpoint_dir=os.path.join(work, "ckpt"),
            query_name=name,
            window_duration="1 hour",
            watermark_delay="2 hours",
        )
        _await_done(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    result = (
        spark.table(name)
        .select(
            (F.unix_millis(F.col("win.start"))).alias("win_start"),
            "app_id",
            "event_type",
            F.col("count").alias("n"),
        )
        .localCheckpoint(eager=True)
    )
    # the memory sink holds every emitted row on the driver until the
    # table is dropped; the checkpointed result no longer needs it
    spark.catalog.dropTempView(name)
    shutil.rmtree(work, ignore_errors=True)
    return result


QUERIES["s3_streaming_counts"] = _s3
ORACLE["s3_streaming_counts"] = duck_pipeline_sql(f"""
, s3_feed AS (SELECT app_id, event_type, ct FROM gate_ok),
s3_mx AS (SELECT MAX(ct) AS max_ct FROM s3_feed)
SELECT (ct // {_S3_WINDOW_MS}) * {_S3_WINDOW_MS} AS win_start,
       app_id, event_type, COUNT(*) AS n
FROM s3_feed CROSS JOIN s3_mx
GROUP BY 1, app_id, event_type, s3_mx.max_ct
HAVING win_start + {_S3_WINDOW_MS} <= max_ct - {_S3_DELAY_MS}""")


# ---------------------------------------------------------------------------
# s4: the streaming ROUTE stage (Dw step of AllJob in streaming form) —
# two persistent dictionaries (device IDs + event dictionary) get-or-create
# per micro-batch, routed rows appended per batch. The event-dictionary id
# scheme matches the batch pipeline (1000*app_id + first-seen dense rank),
# and the stream consumes seq-ordered files, so the streamed output must
# equal the batch events_typed ⋈ did_ids ⋈ event_dict join — which is the
# DuckDB oracle, verbatim.
# ---------------------------------------------------------------------------
def _s4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zg_etl_spark.streaming.engine import start_route_stream

    src = _seq_ordered_source(spark, sf_dir, _SUPERSET_SQL)
    work = tempfile.mkdtemp(prefix="zg_s4_")

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _stream_shards(spark, src))
    try:
        q = start_route_stream(
            spark,
            source_dir=src,
            schema=(
                "event_id BIGINT, app_id BIGINT, did STRING, dt STRING, "
                "owner STRING, event_name STRING, event_type STRING, "
                "k BIGINT, value DOUBLE, pl STRING, ct BIGINT, seq BIGINT"
            ),
            dev_store_path=os.path.join(work, "dev_store"),
            event_store_path=os.path.join(work, "ev_store"),
            output_path=os.path.join(work, "out"),
            checkpoint_dir=os.path.join(work, "ckpt"),
        )
        _await_done(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    result = (
        spark.read.parquet(os.path.join(work, "out"))
        .select(
            "event_id", "app_id", "did", "zg_did", "owner", "event_name",
            "zg_eid", "ct",
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(work, ignore_errors=True)
    return result


QUERIES["s4_streaming_route"] = _s4
ORACLE["s4_streaming_route"] = duck_pipeline_sql("""
SELECT e.event_id, e.app_id, e.did, d.zg_did, e.owner_e AS owner,
       e.event_name_t AS event_name, ed.zg_eid, e.ct
FROM events_typed e
JOIN did_ids d ON d.app_id = e.app_id AND d.did = e.did
JOIN event_dict ed ON ed.app_id = e.app_id AND ed.owner = e.owner_e
                  AND ed.event_name = e.event_name_t""")


# ---------------------------------------------------------------------------
# s5: streaming one-ID (zgid) binding — the order-sensitive I5 merge over
# seq-ordered micro-batches with three persistent stores (device ids, user
# ids, first-cuid bindings). The first-binding-wins rule composes across
# batches to the global first-cuid rule, so the assembled stores must equal
# the batch device_zgid relation exactly — the oracle states it verbatim.
# ---------------------------------------------------------------------------
def _s5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zg_etl_spark.streaming.engine import start_zgid_stream, zgid_result

    src = _seq_ordered_source(spark, sf_dir, _SUPERSET_SQL)
    work = tempfile.mkdtemp(prefix="zg_s5_")

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _stream_shards(spark, src))
    try:
        q, dev_store, uid_store, bind_store = start_zgid_stream(
            spark,
            source_dir=src,
            schema="event_id BIGINT, app_id BIGINT, did STRING, cuid STRING, seq BIGINT",
            dev_store_path=os.path.join(work, "dev"),
            uid_store_path=os.path.join(work, "uid"),
            bind_store_path=os.path.join(work, "bind"),
            checkpoint_dir=os.path.join(work, "ckpt"),
        )
        _await_done(q)
        result = zgid_result(dev_store, uid_store, bind_store).localCheckpoint(
            eager=True
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    shutil.rmtree(work, ignore_errors=True)
    return result


QUERIES["s5_streaming_zgid"] = _s5
ORACLE["s5_streaming_zgid"] = duck_pipeline_sql(
    "SELECT app_id, did, zg_did, bound_cuid, zg_id FROM device_zgid"
)


# ---------------------------------------------------------------------------
# s6: streaming duplicate suppression — the reference relies on the Doris
# UNIQUE KEY (…, uuid, …) to absorb Kafka re-deliveries (schema.sql:96-398,
# $uuid minted at SessionIdProcessOperator.java:26-95). The streaming form
# is stateful dropDuplicates on the uuid: batch 2 REPLAYS a slice of batch
# 1's rows (cross-batch re-delivery, the case intra-batch dedup can't
# catch), and the emitted stream must equal the batch relation exactly —
# every replay suppressed by dedup state, none by accident of batching.
#
# State-size note: the DECLARED path is dropDuplicatesWithinWatermark on
# event time with the SAME validity bound the gate enforces
# (VALID_PAST_MS = 21d, the configured TimeValidator subtime,
# dataquality/TimeValidator.java:39-56 + config.properties:98-99) —
# plain dropDuplicates would keep every uuid forever and is the state
# store that OOMs at 100 TB × months. Because G7 rejects any delivery
# older than that bound, the watermark evicts only state no legitimate
# replay can ever match; a replay older than the watermark is dropped as
# late data — suppressed either way, so the emitted stream still equals
# the batch relation exactly and the oracle is unchanged. The two
# constants MUST move together: a watermark shorter than the gate window
# would re-emit a legitimately-late replay after its state evicted.
# tests/test_streaming.py::test_dedup_within_watermark_bounds_state pins
# both halves (in-window suppression, post-eviction re-emit) and that
# the state metric stays bounded.
# ---------------------------------------------------------------------------
def _s6(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    from pyspark.sql import functions as F

    from zg_etl_spark.session import session_key

    body = (
        "SELECT app_id, did, seq, md5(CAST(seq AS STRING)) AS uuid FROM gate_ok"
    )
    key = (session_key(spark), sf_dir, "s6_src")
    if key not in _SRC_MEMO:
        import atexit

        src = tempfile.mkdtemp(prefix="zg_s6_src_")
        base = spark_pipeline_df(spark, sf_dir, body)
        mid = base.selectExpr("percentile_approx(seq, 0.5) AS m").first().m
        first_half = base.filter(base.seq <= mid)
        # batch 1 = first half; batch 2 = second half PLUS a replay of
        # every 5th row of batch 1 (the Kafka re-delivery)
        _write_split_files(
            [
                first_half,
                base.filter(base.seq > mid).unionByName(
                    first_half.filter(first_half.seq % 5 == 0)
                ),
            ],
            src,
        )
        atexit.register(shutil.rmtree, src, ignore_errors=True)
        _SRC_MEMO[key] = src

    src = _SRC_MEMO[key]
    name = "s6_mem_" + _uuid.uuid4().hex[:8]
    work = tempfile.mkdtemp(prefix="zg_s6_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _stream_shards(spark, src))
    try:
        q = (
            spark.readStream.schema(
                "app_id BIGINT, did STRING, seq BIGINT, uuid STRING"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            # seq = ct_ms * 1e6 + event_id (operators/domain.py feed), so
            # seq DIV 1e6 recovers the event time the watermark rides on
            .withColumn(
                "event_ts", F.timestamp_millis(F.expr("seq DIV 1000000"))
            )
            .withWatermark("event_ts", f"{VALID_PAST_MS // 86_400_000} days")
            .dropDuplicatesWithinWatermark(["uuid"])
            .select("app_id", "did", "seq", "uuid")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        _await_done(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    result = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)  # free the driver-held sink rows
    shutil.rmtree(work, ignore_errors=True)
    return result


QUERIES["s6_streaming_dedup"] = _s6
ORACLE["s6_streaming_dedup"] = duck_pipeline_sql(
    "SELECT app_id, did, seq, md5(CAST(seq AS VARCHAR)) AS uuid FROM gate_ok"
)

# ---------------------------------------------------------------------------
# s7: watermarked STREAM-STREAM interval join — the Spark-native answer to
# the reference's async state lookups pairing related events (the claim
# store that AdvAsyncOperator keeps so a later conversion can find its
# click, AdvAsyncOperator.java:60-130): both sides are unbounded streams,
# each watermarked, joined on key + time-range. Spark bounds the join
# state with the watermark and the range condition (clicks are dropped
# from state once no future purchase can reach them) — exactly the piece
# the foreachBatch store queries (s1-s5) cannot express, and the reason
# stream-stream join belongs on the declared surface. The batch oracle is
# the same inequality join over the full relation; split files are cut by
# EVENT TIME so batch-2 purchases genuinely reach across the micro-batch
# boundary into batch-1 click state.
# ---------------------------------------------------------------------------
def _s7(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    from pyspark.sql import functions as F

    from zg_etl_spark.session import session_key
    from zg_etl_spark.sources.tables import load_table

    key = (session_key(spark), sf_dir, "s7_src")
    if key not in _SRC_MEMO:
        import atexit

        src = tempfile.mkdtemp(prefix="zg_s7_src_")
        # engine contract: load_table normalizes events.ts to epoch-NANOS
        # BIGINT (sources/tables.py) — the split key and the source files
        # carry that; the stream derives a TIMESTAMP view for watermarks
        base = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type"
        )
        base.createOrReplaceTempView("s7_events")
        # The cut must STRADDLE at least one join pair or the test proves
        # nothing about cross-batch state (a median cut misses every pair
        # at the driver SFs — pairs span ≤2 h of a 30-day range). Cut at
        # the click of the qualifying pair nearest the median: that click
        # lands in b0 (ts <= cut), its purchase in b1 (ts > cut).
        mid = spark.sql(
            """
            WITH m AS (SELECT CAST(percentile_approx(ts, 0.5) AS BIGINT) AS c
                       FROM s7_events)
            SELECT COALESCE(
              (SELECT c.ts
               FROM s7_events c JOIN s7_events p
                 ON p.user_id = c.user_id
                AND c.event_type = 'click' AND p.event_type = 'purchase'
                AND p.ts > c.ts
                AND p.ts <= c.ts + 2 * 3600 * CAST(1e9 AS BIGINT)
               CROSS JOIN m
               ORDER BY abs(c.ts - m.c), c.ts, p.ts LIMIT 1),
              (SELECT c FROM m)) AS cut
            """
        ).first().cut
        _write_split_files(
            [base.filter(base.ts <= mid), base.filter(base.ts > mid)], src
        )
        atexit.register(shutil.rmtree, src, ignore_errors=True)
        _SRC_MEMO[key] = src

    src = _SRC_MEMO[key]
    ev = (
        spark.readStream.schema(
            "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # s7's semantics are defined at MICROsecond precision end-to-end
    # (join bounds AND delay from the same truncated micros): the oracle
    # runs over the parquet timestamp[us] column, so any nano-grain
    # comparison here could admit/reject pairs the oracle can't even
    # represent — truncate once, derive everything from it
    clicks = (
        ev.filter("event_type = 'click'")
        .selectExpr(
            "event_id AS click_id",
            "user_id",
            "ts DIV 1000 AS click_us",
            "timestamp_micros(ts DIV 1000) AS click_ts",
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.filter("event_type = 'purchase'")
        .selectExpr(
            "event_id AS purchase_id",
            "user_id AS p_user",
            "ts DIV 1000 AS p_us",
            "timestamp_micros(ts DIV 1000) AS p_ts",
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "user_id = p_user AND p_ts >= click_ts "
            "AND p_ts <= click_ts + INTERVAL 2 HOURS"
        ),
    ).selectExpr(
        "click_id",
        "purchase_id",
        "user_id",
        "p_us - click_us AS delay_us",
    )

    name = "s7_mem_" + _uuid.uuid4().hex[:8]
    work = tempfile.mkdtemp(prefix="zg_s7_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _stream_shards(spark, src))
    try:
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        _await_done(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    result = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)  # free the driver-held sink rows
    shutil.rmtree(work, ignore_errors=True)
    return result


QUERIES["s7_stream_stream_join"] = _s7
ORACLE["s7_stream_stream_join"] = """
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
FROM events c JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR"""


# ---------------------------------------------------------------------------
# s8: streaming upsert sink WITH DELETE SIGNS — the reference's dw job
# stream-loads every micro-batch into Doris UNIQUE-KEY tables where
# __DORIS_DELETE_SIGN__ rows remove keys (DorisSinkFactory.java:33-206,
# EventAttrRow.java:51-53); the Spark rendering is foreachBatch →
# sinks.upsert_table with delete_col, partition-scoped per batch. Batch 2
# carries delete markers (newest seq) for the zg_id % 7 key slice —
# including keys whose only rows landed in batch 1, so the delete must
# reach rows already ON DISK from an earlier micro-batch. The final table
# must equal the batch dedup relation minus the deleted slice.
# ---------------------------------------------------------------------------
def _s8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from zg_etl_spark.session import session_key
    from zg_etl_spark.sinks import upsert_table

    key = (session_key(spark), sf_dir, "s8_src")
    if key not in _SRC_MEMO:
        import atexit

        from zg_etl_spark.operators.domain import SPARK
        from zg_etl_spark.plans.pipeline import b_user_rows_sql

        src = tempfile.mkdtemp(prefix="zg_s8_src_")
        base = spark_pipeline_df(
            spark, sf_dir, b_user_rows_sql(SPARK)
        ).localCheckpoint(eager=True)
        stats = base.selectExpr(
            "percentile_approx(seq, 0.5) AS m", "max(seq) AS mx"
        ).first()
        live = base.withColumn("_ds", F.lit(False))
        dels = (
            base.filter(F.col("zg_id") % 7 == 0)
            .select("app_id", "device_id", "zg_id")
            .distinct()
            .selectExpr(
                "app_id", "device_id", "zg_id",
                "CAST(NULL AS BIGINT) AS user_id",
                "CAST(NULL AS BIGINT) AS begin_date",
                "CAST(NULL AS INT) AS platform",
                f"CAST({stats.mx} + 1 AS BIGINT) AS seq",
                "TRUE AS _ds",
            )
        )
        _write_split_files(
            [
                live.filter(F.col("seq") <= stats.m),
                live.filter(F.col("seq") > stats.m).unionByName(dels),
            ],
            src,
        )
        atexit.register(shutil.rmtree, src, ignore_errors=True)
        _SRC_MEMO[key] = src

    src = _SRC_MEMO[key]
    work = tempfile.mkdtemp(prefix="zg_s8_")
    path = os.path.join(work, "b_user_stream")

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        upsert_table(
            spark, batch_df, path,
            keys=["app_id", "device_id", "zg_id"], order_col="seq",
            partition_cols=["app_id"], delete_col="_ds",
        )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _stream_shards(spark, src))
    try:
        q = (
            spark.readStream.schema(
                "app_id BIGINT, device_id BIGINT, zg_id BIGINT, "
                "user_id BIGINT, begin_date BIGINT, platform INT, "
                "seq BIGINT, _ds BOOLEAN"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(_SRC_MEMO[key])
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        _await_done(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    result = (
        spark.read.parquet(path)
        .select("app_id", "device_id", "zg_id", "user_id",
                "begin_date", "platform")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(work, ignore_errors=True)
    return result


def _s8_oracle() -> str:
    from zg_etl_spark.operators.domain import DUCK
    from zg_etl_spark.plans.pipeline import _p10

    return duck_pipeline_sql(
        f"SELECT * FROM ({_p10(DUCK)}) t WHERE zg_id % 7 <> 0"
    )


QUERIES["s8_stream_upsert_delete"] = _s8
ORACLE["s8_stream_upsert_delete"] = _s8_oracle()


# ---------------------------------------------------------------------------
# s9: streaming PARTIAL-COLUMN sink — the reference's b_device /
# b_user_property lanes stream-load every micro-batch in Doris
# partial_columns mode (DorisSinkFactory.java:60,96,137): incoming rows
# carry only the key + a fixed column subset, matched rows keep every
# other column, delete signs remove whole rows. Spark rendering:
# foreachBatch → sinks.partial_upsert_table, partition-scoped per batch.
# The table is seeded with full columns (even-seq observations, carrying
# device_model); the stream then applies odd-seq partial updates
# (language/timezone/last_update_date only — device_model must SURVIVE
# on disk through every micro-batch) and a trailing delete-marker file.
# Per-key, later micro-batches overwrite the same column subset, so the
# final state equals w9's three-call batch composition — the oracle is
# w9's verbatim.
# ---------------------------------------------------------------------------
def _s9(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from zg_etl_spark.operators.domain import SPARK
    from zg_etl_spark.plans.pipeline import _w9_obs_sql
    from zg_etl_spark.session import session_key
    from zg_etl_spark.sinks import partial_upsert_table

    key = (session_key(spark), sf_dir, "s9_src")
    if key not in _SRC_MEMO:
        import atexit

        src = tempfile.mkdtemp(prefix="zg_s9_src_")
        obs = spark_pipeline_df(
            spark, sf_dir, _w9_obs_sql(SPARK)
        ).localCheckpoint(eager=True)
        part = (
            obs.filter(F.col("seq") % 2 == 1)
            .select("app_id", "device_id", "language", "timezone",
                    "last_update_date", "seq")
            .withColumn("_ds", F.lit(False))
        )
        mid = part.selectExpr("percentile_approx(seq, 0.5) AS m").first().m
        dels = (
            obs.filter(F.col("device_id") % 5 == 0)
            .select("app_id", "device_id")
            .distinct()
            .selectExpr(
                "app_id", "device_id",
                "CAST(NULL AS STRING) AS language",
                "CAST(NULL AS STRING) AS timezone",
                "CAST(NULL AS BIGINT) AS last_update_date",
                "CAST(9000000000000000000 AS BIGINT) AS seq",
                "TRUE AS _ds",
            )
        )
        _write_split_files(
            [part.filter(part.seq <= mid), part.filter(part.seq > mid), dels],
            src,
        )
        _SRC_MEMO[key] = (src, obs)
        atexit.register(shutil.rmtree, src, ignore_errors=True)

    src, obs = _SRC_MEMO[key]
    work = tempfile.mkdtemp(prefix="zg_s9_")
    path = os.path.join(work, "b_device_stream")
    # seed: the full-column creation write (w9 batch 1)
    partial_upsert_table(
        spark, obs.filter(F.col("seq") % 2 == 0), path,
        keys=["app_id", "device_id"], order_col="seq",
        update_cols=["device_model", "language", "timezone",
                     "last_update_date"],
        partition_cols=["app_id"],
    )

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        partial_upsert_table(
            spark, batch_df, path,
            keys=["app_id", "device_id"], order_col="seq",
            update_cols=["language", "timezone", "last_update_date"],
            delete_col="_ds", partition_cols=["app_id"],
        )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _stream_shards(spark, src))
    try:
        q = (
            spark.readStream.schema(
                "app_id BIGINT, device_id BIGINT, language STRING, "
                "timezone STRING, last_update_date BIGINT, seq BIGINT, "
                "_ds BOOLEAN"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        _await_done(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    result = (
        spark.read.parquet(path)
        .select("app_id", "device_id", "device_model", "language",
                "timezone", "last_update_date")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(work, ignore_errors=True)
    return result


QUERIES["s9_stream_partial_upsert"] = _s9


def _s9_oracle() -> str:
    from zg_etl_spark.plans.pipeline import ORACLE as _PIPE_ORACLE

    # identical final state to the three-call batch composition
    return _PIPE_ORACLE["w9_partial_upsert"]


ORACLE["s9_stream_partial_upsert"] = _s9_oracle()


# ---------------------------------------------------------------------------
# s10: the deep-conversion status-key gate as it ACTUALLY runs in the
# reference — per-(eid, lid) TTL'd keys updated event-by-event
# (AdvConvertEventFlatMapFunction.java:247-275) — as a custom stateful
# operator (streaming/deep_convert.py, applyInPandasWithState keyed by
# (app_id, lid), event-time TTL, own key refreshed before the check).
# The candidate stream is p49's shared candidate relation
# (plans/pipeline.py p49_candidates_sql) replayed in seq order (seq is
# ct-monotone, so arrival order = event-time order, the Kafka contract);
# the final per-rule aggregate is p49's shared envelope/aggregate SQL
# over the emitted decisions. Oracle: p49's batch forward-fill verbatim —
# the sequential state machine and the set-based window formulation must
# land on identical aggregates.
# ---------------------------------------------------------------------------
def _s10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zg_etl_spark.operators.domain import SPARK
    from zg_etl_spark.plans.pipeline import p49_candidates_sql, p49_final_sql
    from zg_etl_spark.streaming.deep_convert import deep_convert_gate

    src = _seq_ordered_source(
        spark, sf_dir,
        "SELECT app_id, lid, event_name, event_type, is_multi, "
        "CAST(purchase_window AS BIGINT) AS purchase_window, "
        "CAST(click_window AS BIGINT) AS click_window, "
        "ct, seq, touch_ct, touch_k "
        f"FROM ({p49_candidates_sql(SPARK)}) q",
    )
    work = tempfile.mkdtemp(prefix="zg_s10_")
    store = os.path.join(work, "decisions")

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(store)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _stream_shards(spark, src))
    try:
        q = (
            spark.readStream.schema(
                "app_id BIGINT, lid BIGINT, event_name STRING, "
                "event_type STRING, is_multi BOOLEAN, "
                "purchase_window BIGINT, click_window BIGINT, "
                "ct BIGINT, seq BIGINT, touch_ct BIGINT, touch_k BIGINT"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            deep_convert_gate(q)
            .writeStream.outputMode("append")
            .foreachBatch(_sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        _await_done(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    spark.read.parquet(store).createOrReplaceTempView("s10_decisions")
    result = spark.sql(
        p49_final_sql(SPARK, "SELECT * FROM s10_decisions")
    ).localCheckpoint(eager=True)
    spark.catalog.dropTempView("s10_decisions")
    shutil.rmtree(work, ignore_errors=True)
    return result


QUERIES["s10_streaming_deep_convert"] = _s10


def _s10_oracle() -> str:
    from zg_etl_spark.plans.pipeline import ORACLE as _PIPE_ORACLE

    # identical aggregate to the batch forward-fill gate
    return _PIPE_ORACLE["p49_adv_deep_convert"]


ORACLE["s10_streaming_deep_convert"] = _s10_oracle()
