"""Multimodal column operators: opaque binary payloads + typed metadata.

Design for a 100 TB media corpus: media lives as ``binary`` columns (or
object-store URIs) beside typed metadata; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched Pandas UDFs via
``mapInPandas`` so bytes never take the row-at-a-time Python path. The
actual image/audio decode libraries are not in this container, so the
decode step is STUBBED (`decode_image` raises NotImplementedError; the
deterministic fake extractor stands in for tests) — the Spark-side
plumbing (schema, batch iteration, partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.StructType(
            [
                T.StructField("mime", T.StringType(), True),
                T.StructField("width", T.IntegerType(), True),
                T.StructField("height", T.IntegerType(), True),
                T.StructField("n_bytes", T.LongType(), True),
            ]
        ), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, byte_mean double, byte_histogram array<long>, "
    "n_frames long"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text bytes as an opaque payload
    with typed metadata — the schema a real image/audio table would have."""
    payload = F.encode("text", "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """Real decoder entry point — requires an image library not present in
    this environment. The pipeline plumbing calls extract_features instead."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; wire a decoder here on a cluster "
        "image that ships one"
    )


def extract_features(df: DataFrame, n_bins: int = 16, frame_size: int = 256) -> DataFrame:
    """Deterministic fake feature extraction over binary payloads:
    byte-level stats + histogram + fixed-size frame count. Arrow-batched via
    mapInPandas — the exact shape a real decode+embed stage has."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # worker-side import (closure is cloudpickled)

        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n = len(b)
                # vectorized byte stats: a per-byte Python loop costs
                # ~100x more than bincount over the same Arrow buffer
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                hist = np.bincount(arr * n_bins // 256, minlength=n_bins)
                out.append(
                    {
                        "media_id": int(media_id),
                        "n_bytes": n,
                        "byte_mean": (int(arr.sum()) / n) if n else 0.0,
                        "byte_histogram": hist.tolist(),
                        "n_frames": (n + frame_size - 1) // frame_size,
                    }
                )
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(op, FEATURE_SCHEMA)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: same schema in and out (payload + meta), target
    dims recorded in meta, payload re-emitted at the decoded-image byte
    budget. The pixel resample itself needs a decoder (decode_image stub);
    the deterministic stand-in crops/cycle-pads the payload to
    width*height bytes so output sizes — and therefore downstream
    partition/memory budgets — behave exactly like a real resize stage.
    Arrow-batched via mapInPandas; one output row per input row, so the
    stage preserves partitioning (no shuffle)."""
    target = width * height

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                b = bytes(payload) if payload is not None else b""
                resized = (
                    (b * (target // max(len(b), 1) + 1))[:target] if b else b""
                )
                out.append(
                    {
                        "media_id": int(media_id),
                        "payload": resized,
                        "meta": {
                            "mime": meta["mime"] if meta is not None else None,
                            "width": width,
                            "height": height,
                            "n_bytes": len(resized),
                        },
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(op, MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling: explode fixed-size chunks of the payload, keep every
    n-th — the plumbing of video frame-sampling with the decode stubbed to
    byte-slicing. Pure built-in ops (no Python in the row path)."""
    chunks = F.expr(
        "transform(sequence(0, CAST((length(payload) - 1) / 256 AS INT)), "
        "i -> named_struct('frame_idx', i, 'frame', substring(payload, i * 256 + 1, 256)))"
    )
    return (
        df.select("media_id", F.explode(chunks).alias("f"))
        .select("media_id", F.col("f.frame_idx").alias("frame_idx"), F.col("f.frame").alias("frame"))
        .filter(F.col("frame_idx") % every_n == 0)
    )
