"""Custom stateful streaming operator: the deep-conversion status-key
gate (AdvConvertEventFlatMapFunction.java:247-275) as it actually runs in
the reference — TTL'd Redis keys updated per event — re-expressed as an
applyInPandasWithState operator.

The reference keeps one key `ad:convert:status:{zgEid}:{lid}` per rule
member, set with TTL = that member's windowTime whenever a qualifying
event passes the attribution gate, its OWN key refreshed BEFORE the
all-members-alive check. The batch twin (plans/pipeline.py p49) models
the key timeline as a lid-partitioned forward fill; here the state is
literal: per (app_id, lid) group, the last qualifying ct of each member
event, carried across micro-batches. TTL is event-time (row.ct against
the stored ct and the member's window), so replay is deterministic —
no wall clock.

State per key: (purchase_last_ct, click_last_ct) — the fixture group
members (P49_DEEP_RULES). Single-member rules bypass the state entirely
(the reference only touches the status keys when eventIds has >1 entry,
:251-253).

Scale: state size ∝ distinct (app, lid) pairs — the GLOBAL per-link
keys, tiny by construction (the reference holds them in one Redis).
Rows within a micro-batch are processed in (ct, seq) order, matching
Kafka arrival order; the seq-ordered replay source guarantees order
across batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "app_id BIGINT, lid BIGINT, event_name STRING, event_type STRING, "
    "ct BIGINT, seq BIGINT, touch_ct BIGINT, touch_k BIGINT, sent INT"
)
STATE_SCHEMA = "purchase_last_ct BIGINT, click_last_ct BIGINT"

_MEMBER_IDX = {"purchase": 0, "click": 1}


def _gate_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    app_id, lid = key
    last = list(state.get) if state.exists else [None, None]

    rows = []
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["ct", "seq"], kind="stable")
    for r in batch.itertuples(index=False):
        if r.is_multi:
            # own key refreshed BEFORE the check (:251-253)
            last[_MEMBER_IDX[r.event_name]] = int(r.ct)
            windows = (r.purchase_window, r.click_window)
            sent = int(all(
                last[i] is not None and r.ct - last[i] <= windows[i] * 1000
                for i in range(2)
            ))
        else:
            sent = 1
        rows.append((app_id, lid, r.event_name, r.event_type,
                     int(r.ct), int(r.seq), int(r.touch_ct),
                     int(r.touch_k), sent))
    state.update(tuple(last))

    yield pd.DataFrame(
        rows,
        columns=["app_id", "lid", "event_name", "event_type",
                 "ct", "seq", "touch_ct", "touch_k", "sent"],
    )


def deep_convert_gate(candidates: DataFrame) -> DataFrame:
    """candidates: streaming DataFrame with the p49 candidate columns
    (app_id, lid, event_name, event_type, is_multi, purchase_window,
    click_window, ct, seq, touch_ct, touch_k). Returns one row per
    candidate with the `sent` decision."""
    return candidates.groupBy("app_id", "lid").applyInPandasWithState(
        _gate_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
