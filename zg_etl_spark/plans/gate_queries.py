"""Wire-decode queries on the declared surface (G1/G2).

g1 round-trips the events table through the reference wire format:
each event is wrapped in the `{Ip, Now, Header, Args{event, compress}}`
envelope (service/MsgResolver.java:33-98), odd event_ids zlib+base64
compressed (MsgResolver.java:140), then decoded by resolve_wire's
Arrow-batched UDF. The DuckDB oracle recomputes the expected decoded
fields directly from events — if the encode/decode plumbing corrupts
anything, hashes diverge.
"""

from __future__ import annotations

import base64
import json
import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf

QUERIES: dict = {}
ORACLE: dict = {}


def _wire_encode(event_id: pd.Series, event_type: pd.Series) -> pd.Series:
    out = []
    for eid, etype in zip(event_id, event_type):
        eid = int(eid)
        cls = eid % 101
        if cls == 5:  # whole message not JSON -> 1020001
            out.append("definitely not json {{{")
            continue
        payload = json.dumps({"eid": eid, "etype": etype}, sort_keys=True)
        compress = eid % 2
        if compress:
            payload = base64.b64encode(zlib.compress(payload.encode())).decode()
        env = {
            "Ip": f"10.0.{eid % 256}.1",
            "Now": eid * 1000,
            "Header": "{}",
            "Args": {"event": payload, "compress": compress,
                     "encrypt": 0, "type": 1, "key": None},
        }
        # per-field ResolveException classes (MsgResolver.java:33-98)
        if cls == 6:
            del env["Ip"]       # -> 1010003 IP_NONE
        elif cls == 7:
            del env["Now"]      # -> 1010004 NOW_NONE
        elif cls == 8:
            del env["Header"]   # -> 1010005 HEADER_NONE
        out.append(json.dumps(env))
    return pd.Series(out)


def _g1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zg_etl_spark.operators.decode import resolve_wire
    from zg_etl_spark.sources.tables import load_table

    # events.ts is parquet TIMESTAMP(NANOS); must be readable as bigint
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    enc = pandas_udf(_wire_encode, "string")
    events = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    raw = events.select(enc("event_id", "event_type").alias("raw"))
    resolved = resolve_wire(raw)
    return resolved.select(
        F.get_json_object("payload", "$.eid").cast("bigint").alias("event_id"),
        F.get_json_object("payload", "$.etype").alias("event_type"),
        "ip",
        "server_ts",
        "result",
        "error_code",
    )


QUERIES["g1_wire_roundtrip"] = _g1
ORACLE["g1_wire_roundtrip"] = """
SELECT CASE WHEN event_id % 101 = 5 THEN NULL ELSE event_id END AS event_id,
       CASE WHEN event_id % 101 = 5 THEN NULL ELSE event_type END AS event_type,
       CASE WHEN event_id % 101 IN (5, 6) THEN NULL
            ELSE '10.0.' || CAST(event_id % 256 AS VARCHAR) || '.1' END AS ip,
       CASE WHEN event_id % 101 IN (5, 7) THEN NULL
            ELSE event_id * 1000 END AS server_ts,
       CASE WHEN event_id % 101 IN (5, 6, 7, 8) THEN -1 ELSE 0 END AS result,
       CASE WHEN event_id % 101 = 5 THEN 1020001
            WHEN event_id % 101 = 6 THEN 1010003
            WHEN event_id % 101 = 7 THEN 1010004
            WHEN event_id % 101 = 8 THEN 1010005
            ELSE 0 END AS error_code
FROM events"""
