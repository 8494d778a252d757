"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming at all; this is the M6 extension's "custom
stateful operator" slot: a running per-user accumulator that survives
across micro-batches in the state store. The same pattern carries any
user-defined state machine (fraud counters, session enrichment, CDC merge)
that watermarked windows can't express.

State layout: one (count, sum) pair per user_id - state size is O(active
users), partitioned by the grouping key across executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, events_so_far bigint, value_so_far double"
STATE_SCHEMA = "n bigint, v double"


def _accumulate(key: tuple, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    (n, v) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        v += float(pdf["value"].sum())
    state.update((n, v))
    yield pd.DataFrame({"user_id": [key[0]], "events_so_far": [n],
                        "value_so_far": [round(v, 2)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum), updated every micro-batch."""
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _accumulate,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))


# --- streaming SCD2: the changelog collapse (operators/scd.py) as a live
# CDC-apply. State per key = (cursor ts+id, current segment, version); each
# micro-batch is sorted per key and replayed through the state machine,
# emitting one row per NEW version. Contract: per-key monotone cursor —
# rows at-or-behind the cursor (replays, late arrivals) are dropped, the
# standard CDC-apply semantics; a reorder buffer (watermark-delayed apply)
# would slot in front of this operator for out-of-order sources.

SCD2_OUTPUT_SCHEMA = ("user_id bigint, version int, segment string, "
                      "effective_from timestamp")
SCD2_STATE_SCHEMA = "last_us bigint, last_eid bigint, seg string, ver int"


def _scd2_apply(key: tuple, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_us, last_eid, seg, ver = state.get
    else:
        last_us, last_eid, seg, ver = -1, -1, None, 0
    out_user, out_ver, out_seg, out_from = [], [], [], []
    for pdf in pdfs:
        for r in pdf.sort_values(["ts", "event_id"]).itertuples():
            ts_us = r.ts.value // 1000
            if (ts_us, r.event_id) <= (last_us, last_eid):
                continue  # replay or late arrival behind the cursor
            if seg is None or r.event_type != seg:
                ver += 1
                seg = r.event_type
                out_user.append(key[0])
                out_ver.append(ver)
                out_seg.append(seg)
                out_from.append(r.ts)
            last_us, last_eid = ts_us, r.event_id
    state.update((last_us, last_eid, seg, ver))
    yield pd.DataFrame({"user_id": out_user, "version": out_ver,
                        "segment": out_seg, "effective_from": out_from})


def scd2_stream(events: DataFrame) -> DataFrame:
    """Live SCD2 version emission: one output row per (user, new version),
    matching the batch scd2_from_changelog's opens (the open version has
    no effective_to yet by definition — close it downstream with the next
    version's effective_from, exactly like the batch lead())."""
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _scd2_apply,
                outputStructType=SCD2_OUTPUT_SCHEMA,
                stateStructType=SCD2_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))


# --- streaming SCD2 with a reorder buffer (ROADMAP 14): admits bounded
# out-of-order CDC. Incoming rows park in per-key state; only rows at or
# behind the event-time watermark (no earlier row can still arrive, by the
# watermark contract) are replayed through the SCD machine, in (ts, id)
# order. Keys with parked rows register an EventTimeTimeout at their
# earliest parked timestamp, so the flush fires even when no new data
# arrives for the key. State = cursor + O(delay-window) parked rows per
# key — bounded by the disorder horizon, not the stream length.

SCD2_REORDER_STATE_SCHEMA = (
    "last_us bigint, last_eid bigint, seg string, ver int, "
    "buf_us array<bigint>, buf_eid array<bigint>, buf_seg array<string>")


def _scd2_reorder_apply(key: tuple, pdfs: Iterator[pd.DataFrame],
                        state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_us, last_eid, seg, ver, buf_us, buf_eid, buf_seg = state.get
        buf = list(zip(buf_us, buf_eid, buf_seg))
    else:
        last_us, last_eid, seg, ver = -1, -1, None, 0
        buf = []
    if not state.hasTimedOut:
        for pdf in pdfs:
            for r in pdf.itertuples():
                buf.append((r.ts.value // 1000, r.event_id, r.event_type))
    wm_us = state.getCurrentWatermarkMs() * 1000
    buf.sort()
    ready = [b for b in buf if b[0] <= wm_us]
    buf = [b for b in buf if b[0] > wm_us]

    out_user, out_ver, out_seg, out_from = [], [], [], []
    for ts_us, eid, etype in ready:
        if (ts_us, eid) <= (last_us, last_eid):
            continue  # replay behind the cursor (exactly-once under retry)
        if seg is None or etype != seg:
            ver += 1
            seg = etype
            out_user.append(key[0])
            out_ver.append(ver)
            out_seg.append(seg)
            out_from.append(pd.Timestamp(ts_us * 1000))
        last_us, last_eid = ts_us, eid

    state.update((last_us, last_eid, seg, ver,
                  [b[0] for b in buf], [b[1] for b in buf],
                  [b[2] for b in buf]))
    if buf:
        # fire once the watermark passes the earliest parked row (+1 ms:
        # the timeout timestamp must lie strictly beyond the watermark)
        state.setTimeoutTimestamp(buf[0][0] // 1000 + 1)
    yield pd.DataFrame({"user_id": out_user, "version": out_ver,
                        "segment": out_seg, "effective_from": out_from})


def scd2_stream_reordered(events: DataFrame,
                          delay: str = "30 minutes") -> DataFrame:
    """SCD2 CDC-apply tolerating out-of-order arrival within `delay`.

    Same output contract as scd2_stream, but rows may arrive in any order
    as long as their disorder stays inside the watermark delay: emission
    waits for the watermark, so version numbering matches the batch
    scd2_from_changelog on the same (eventually-complete) log. Rows later
    than the watermark are dropped by Spark's stateful-operator late-row
    filter — the same contract as every watermarked aggregation.
    """
    return (events
            .withWatermark("ts", delay)
            .groupBy("user_id")
            .applyInPandasWithState(
                _scd2_reorder_apply,
                outputStructType=SCD2_OUTPUT_SCHEMA,
                stateStructType=SCD2_REORDER_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            ))
