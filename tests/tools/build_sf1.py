"""Build /tmp/sf1 — the 10x scale-rehearsal dataset (sf0.1 -> ~sf1).

Recipe (same shape as the round-9 rehearsal recorded in BASELINE.md,
now committed instead of ad hoc): replicate events / documents /
embeddings 10x with SHIFTED ids so every copy mints new entities, and
per-copy TEXT PERTURBATION on documents so the dedup family sees real
near-duplicate families (10-way clones at ~5% token divergence), not
exact dupes the exact-hash lane would collapse for free. The TPC-H
tables copy through unchanged — the rehearsal's target queries are the
pipeline spine (events) and the LLM family (documents/embeddings).

    python tests/tools/build_sf1.py [/tmp/sf1]

Pure pyarrow — no Spark session, runs in ~1 min.
"""
from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10
# shifts stay SMALL: sf0.1 ids are < 2M, so 2e6/1e6 strides mint
# disjoint copies while keeping event_id within the envelope's
# synthetic ip_hash domain ((event_id * 2654435761) must fit a long —
# a 1e9 stride overflowed it)
EVENT_SHIFT = 2_000_003          # new event ids per copy
USER_SHIFT = 1_000_003           # new user cohorts per copy
DOC_SHIFT = 10_000_019
VEC_SHIFT = 10_000_019

PASSTHROUGH = ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem")


def _perturb_column(texts, copy: int):
    """Deterministic ~1-in-20 token rewrite, keyed by (row, copy) — the
    10 copies of a doc form a near-dup family at ~95% similarity."""
    out = []
    for i, t in enumerate(texts):
        if t is None:
            out.append(None)
            continue
        words = t.split(" ")
        for j in range(len(words)):
            if (i * 31 + j * 7 + copy * 13) % 20 == 0:
                words[j] = f"v{copy}w{(i + j) % 97}"
        out.append(" ".join(words))
    return out


def build(dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in PASSTHROUGH:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")

    ev = pq.read_table(f"{SRC}/events.parquet")
    parts = []
    for c in range(COPIES):
        tb = ev
        if c:
            tb = tb.set_column(
                tb.schema.get_field_index("event_id"), "event_id",
                pc.add(tb["event_id"], c * EVENT_SHIFT))
            tb = tb.set_column(
                tb.schema.get_field_index("user_id"), "user_id",
                pc.add(tb["user_id"], c * USER_SHIFT))
        parts.append(tb)
    pq.write_table(pa.concat_tables(parts), f"{dst}/events.parquet")

    dc = pq.read_table(f"{SRC}/documents.parquet")
    texts = dc["text"].to_pylist()
    parts = []
    for c in range(COPIES):
        tb = dc
        if c:
            tb = tb.set_column(
                tb.schema.get_field_index("doc_id"), "doc_id",
                pc.add(tb["doc_id"], c * DOC_SHIFT))
            newt = _perturb_column(texts, c)
            tb = tb.set_column(
                tb.schema.get_field_index("text"), "text",
                pa.array(newt, type=tb.schema.field("text").type))
            tb = tb.set_column(
                tb.schema.get_field_index("n_chars"), "n_chars",
                pa.array([len(x) if x is not None else None
                          for x in newt], type=pa.int64()))
        parts.append(tb)
    pq.write_table(pa.concat_tables(parts), f"{dst}/documents.parquet")

    em = pq.read_table(f"{SRC}/embeddings.parquet")
    parts = []
    for c in range(COPIES):
        tb = em
        if c:
            tb = tb.set_column(
                tb.schema.get_field_index("vec_id"), "vec_id",
                pc.add(tb["vec_id"], c * VEC_SHIFT))
        parts.append(tb)
    pq.write_table(pa.concat_tables(parts), f"{dst}/embeddings.parquet")
    for t in ("events", "documents", "embeddings"):
        print(t, pq.read_metadata(f"{dst}/{t}.parquet").num_rows, "rows")


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
