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
    # applyInPandasWithState delivers a group's rows as MULTIPLE Arrow
    # chunks with no intra-group order guarantee — sorting per chunk
    # would let a later chunk's earlier rows fall behind the cursor and
    # be dropped as late (r7 review). Concatenate, sort ONCE.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        whole = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        for r in whole.sort_values(["ts", "event_id"]).itertuples():
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


def _buf_rows(*cols) -> list:
    """Parked-buffer state columns -> row tuples: the LOAD half of the
    state marshalling every reorder-buffer applier shares (item 52's
    acknowledged structural duplication, extracted r8)."""
    return list(zip(*cols))


def _buf_cols(buf: list, n: int) -> tuple:
    """Row tuples -> n column lists for state.update (the STORE half)."""
    return tuple([row[i] for row in buf] for i in range(n))


def _park_and_split(pdfs: "Iterator[pd.DataFrame]", state: GroupState,
                    buf: list, row_of) -> tuple[list, list]:
    """The reorder-buffer mechanics every watermark-delayed applier
    shares (extracted r7): park this batch's rows (unless the call is a
    timeout firing), then split the sorted buffer into rows FINALIZED by
    the watermark and rows still parked. Finalization is STRICTLY below
    the watermark — Spark's late filter keeps ts == wm, so such a row
    can still arrive in a later batch (see _scd2_reorder_apply)."""
    if not state.hasTimedOut:
        for pdf in pdfs:
            for r in pdf.itertuples():
                buf.append(row_of(r))
    wm_us = state.getCurrentWatermarkMs() * 1000
    buf.sort(key=lambda b: (b[0], b[1]))
    ready = [b for b in buf if b[0] < wm_us]
    parked = [b for b in buf if b[0] >= wm_us]
    return ready, parked


def _schedule_flush(state: GroupState, parked: list) -> None:
    """Fire once the watermark passes the earliest parked row (+1 ms:
    the timeout timestamp must lie strictly beyond the watermark)."""
    if parked:
        state.setTimeoutTimestamp(parked[0][0] // 1000 + 1)


SCD2_REORDER_STATE_SCHEMA = (
    "last_us bigint, last_eid bigint, seg string, ver int, "
    "buf_us array<bigint>, buf_eid array<bigint>, buf_seg array<string>")


def _scd2_reorder_apply(key: tuple, pdfs: Iterator[pd.DataFrame],
                        state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_us, last_eid, seg, ver, buf_us, buf_eid, buf_seg = state.get
        buf = _buf_rows(buf_us, buf_eid, buf_seg)
    else:
        last_us, last_eid, seg, ver = -1, -1, None, 0
        buf = []
    ready, buf = _park_and_split(
        pdfs, state, buf,
        lambda r: (r.ts.value // 1000, r.event_id, r.event_type))

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
                  *_buf_cols(buf, 3)))
    _schedule_flush(state, buf)
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


# --- streaming gap-fill + LOCF (the batch operators/timeseries.gapfill_locf
# as a live hypertable view): one output row per (key, hour bucket), gaps
# carrying the last observation forward, emitted as the event-time
# watermark CLOSES each bucket. State per key = the emission cursor + the
# carried value + observations parked beyond the watermark — bounded by
# the disorder horizon plus one bucket, never the stream length. A bucket
# with no observation emits on the timeout that fires when the watermark
# passes its end, PROVIDED a later observation exists (the spine contract
# matches batch: min..max observed bucket, trailing gaps never emit).

HOUR_US = 3_600_000_000

GAPFILL_STATE_SCHEMA = (
    "cursor_us bigint, cur_val double, max_bucket_us bigint, "
    "buf_us array<bigint>, buf_eid array<bigint>, buf_val array<double>")

GAPFILL_OUTPUT_SCHEMA = (
    "user_id bigint, bucket timestamp, value_filled double, "
    "is_observed boolean")


def _gapfill_apply(key: tuple, pdfs: "Iterator[pd.DataFrame]",
                   state: GroupState) -> "Iterator[pd.DataFrame]":
    if state.exists:
        cursor_us, cur_val, max_bucket_us, buf_us, buf_eid, buf_val = state.get
        buf = _buf_rows(buf_us, buf_eid, buf_val)
    else:
        cursor_us, cur_val, max_bucket_us = -1, float("nan"), -1
        buf = []
    if not state.hasTimedOut:
        for pdf in pdfs:
            for r in pdf.itertuples():
                ts_us = r.ts.value // 1000
                buf.append((ts_us, r.event_id, r.value))
                b = ts_us - ts_us % HOUR_US
                max_bucket_us = max(max_bucket_us, b)

    wm_us = state.getCurrentWatermarkMs() * 1000
    # a bucket is closed once the watermark passes its END; the spine
    # never extends past the latest observed bucket
    closed_until = (wm_us - wm_us % HOUR_US) - HOUR_US if wm_us > 0 else -1
    bound = min(closed_until, max_bucket_us)

    # fold ready observations into per-bucket last value, (ts, eid) order
    ready = sorted(b for b in buf if (b[0] - b[0] % HOUR_US) <= bound)
    buf = [b for b in buf if (b[0] - b[0] % HOUR_US) > bound]
    last_in_bucket: dict = {}
    for ts_us, _eid, val in ready:
        last_in_bucket[ts_us - ts_us % HOUR_US] = val

    if cursor_us < 0 and last_in_bucket:
        cursor_us = min(last_in_bucket) - HOUR_US  # spine starts at 1st obs

    out_b, out_v, out_o = [], [], []
    if cursor_us >= 0:
        b = cursor_us + HOUR_US
        while b <= bound:
            if b in last_in_bucket:
                cur_val = last_in_bucket[b]
                out_o.append(True)
            else:
                out_o.append(False)
            out_b.append(pd.Timestamp(b * 1000))
            out_v.append(cur_val)
            cursor_us = b
            b += HOUR_US

    state.update((cursor_us, cur_val, max_bucket_us,
                  *_buf_cols(buf, 3)))
    if cursor_us < max_bucket_us or buf:
        # more spine to emit (or parked rows): wake when the watermark can
        # have closed the NEXT bucket (+1 ms strictly beyond its end)
        if cursor_us >= 0:
            nxt_end_us = cursor_us + 2 * HOUR_US
        else:
            first = min(b[0] for b in buf)
            nxt_end_us = first - first % HOUR_US + HOUR_US
        state.setTimeoutTimestamp(nxt_end_us // 1000 + 1)
    yield pd.DataFrame({"user_id": [key[0]] * len(out_b),
                        "bucket": out_b, "value_filled": out_v,
                        "is_observed": out_o})


def gapfill_stream(events: DataFrame, delay: str = "2 hours") -> DataFrame:
    """Streaming hourly gap-fill + LOCF per user.

    Emits each (user, hour) row exactly once, when the event-time
    watermark closes the bucket — observed buckets carry their last
    event's value, interior gaps carry the previous value forward, and
    the emitted relation equals the batch gapfill_locf over the same
    (eventually-complete) stream (equivalence-tested under shuffled
    micro-batch arrival). Late rows beyond `delay` are dropped by the
    watermark contract, like every stateful operator here.
    """
    return (events
            .withWatermark("ts", delay)
            .groupBy("user_id")
            .applyInPandasWithState(
                _gapfill_apply,
                outputStructType=GAPFILL_OUTPUT_SCHEMA,
                stateStructType=GAPFILL_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            ))


# --- streaming EWMA (the incremental form operators/timeseries.ewma_last
# points at): the recursive fold carries ONE number of state per key, so
# the stream is where EWMA naturally lives — no series is ever collected.
# Out-of-order arrival uses the same reorder-buffer discipline as
# scd2_stream_reordered: rows park until the event-time watermark passes
# them, then fold in (ts, id) order, so the emitted values equal the
# batch fold over the same (eventually-complete) log.

EWMA_STATE_SCHEMA = ("last_us bigint, last_eid bigint, ewma double, "
                     "n_obs bigint, buf_us array<bigint>, "
                     "buf_eid array<bigint>, buf_val array<double>")

# --- streaming last-touch attribution (the batch
# sessionize.last_touch_attribution as a live view): one output row per
# conversion, credited to the most recent touch within the lookback
# window, emitted once the event-time watermark confirms no earlier
# event can still arrive. State per key = the replay cursor + ONE carried
# (touch ts, touch type) + the parked disorder window — the carried touch
# is a single value however long the stream runs (the same
# one-number-of-state claim as the streaming EWMA).

ATTR_STATE_SCHEMA = (
    "last_us bigint, last_eid bigint, t_us bigint, t_type string, "
    "buf_us array<bigint>, buf_eid array<bigint>, "
    "buf_type array<string>, buf_val array<double>")

ATTR_OUTPUT_SCHEMA = (
    "user_id bigint, event_id bigint, ts timestamp, "
    "attributed_type string, lag_us bigint, value double")

ATTR_TOUCH_TYPES = ("click", "view")
ATTR_CONVERSION_TYPE = "purchase"
ATTR_WINDOW_US = 24 * 3600 * 1_000_000


def _attr_apply(key: tuple, pdfs: "Iterator[pd.DataFrame]",
                state: GroupState) -> "Iterator[pd.DataFrame]":
    if state.exists:
        last_us, last_eid, t_us, t_type, bu, be, bt, bv = state.get
        buf = _buf_rows(bu, be, bt, bv)
    else:
        last_us, last_eid, t_us, t_type = -1, -1, -1, None
        buf = []
    ready, buf = _park_and_split(
        pdfs, state, buf,
        lambda r: (r.ts.value // 1000, r.event_id, r.event_type, r.value))

    out_eid, out_ts, out_type, out_lag, out_val = [], [], [], [], []
    for ts_us, eid, etype, val in ready:
        if (ts_us, eid) <= (last_us, last_eid):
            continue  # replay behind the cursor (exactly-once under retry)
        if etype == ATTR_CONVERSION_TYPE:
            in_window = t_us >= 0 and (ts_us - t_us) <= ATTR_WINDOW_US
            out_eid.append(eid)
            out_ts.append(pd.Timestamp(ts_us * 1000))
            out_type.append(t_type if in_window else "none")
            out_lag.append(ts_us - t_us if in_window else None)
            out_val.append(val)
        elif etype in ATTR_TOUCH_TYPES:
            t_us, t_type = ts_us, etype
        last_us, last_eid = ts_us, eid

    state.update((last_us, last_eid, t_us, t_type,
                  *_buf_cols(buf, 4)))
    _schedule_flush(state, buf)
    yield pd.DataFrame({"user_id": [key[0]] * len(out_eid),
                        "event_id": out_eid, "ts": out_ts,
                        "attributed_type": out_type,
                        "lag_us": pd.array(out_lag, dtype="Int64"),
                        "value": out_val})


def attribution_stream(events: DataFrame,
                       delay: str = "30 minutes") -> DataFrame:
    """Streaming last-touch attribution: per conversion, the most recent
    qualifying touch within the 24h lookback, or 'none'. Same output
    contract as the batch last_touch_attribution — tested equal under
    content-hash-shuffled micro-batch arrival. Rows later than the
    watermark are dropped by Spark's stateful late-row filter, the
    standard watermarked contract."""
    return (events
            .withWatermark("ts", delay)
            .groupBy("user_id")
            .applyInPandasWithState(
                _attr_apply,
                outputStructType=ATTR_OUTPUT_SCHEMA,
                stateStructType=ATTR_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            ))


EWMA_OUTPUT_SCHEMA = ("user_id bigint, ts timestamp, event_id bigint, "
                      "ewma double, n_obs bigint")

EWMA_ALPHA = 0.5


def _ewma_apply(key: tuple, pdfs: "Iterator[pd.DataFrame]",
                state: GroupState) -> "Iterator[pd.DataFrame]":
    if state.exists:
        last_us, last_eid, ewma, n_obs, bu, be, bv = state.get
        buf = _buf_rows(bu, be, bv)
    else:
        last_us, last_eid, ewma, n_obs = -1, -1, None, 0
        buf = []
    ready, buf = _park_and_split(
        pdfs, state, buf,
        lambda r: (r.ts.value // 1000, r.event_id, r.value))

    out_ts, out_eid, out_e, out_n = [], [], [], []
    for ts_us, eid, val in ready:
        if (ts_us, eid) <= (last_us, last_eid):
            continue  # replay behind the cursor
        ewma = (val if ewma is None
                else EWMA_ALPHA * val + (1.0 - EWMA_ALPHA) * ewma)
        n_obs += 1
        last_us, last_eid = ts_us, eid
        out_ts.append(pd.Timestamp(ts_us * 1000))
        out_eid.append(eid)
        out_e.append(ewma)
        out_n.append(n_obs)

    state.update((last_us, last_eid, ewma, n_obs,
                  *_buf_cols(buf, 3)))
    _schedule_flush(state, buf)
    yield pd.DataFrame({"user_id": [key[0]] * len(out_ts), "ts": out_ts,
                        "event_id": out_eid, "ewma": out_e,
                        "n_obs": out_n})


ZSCORE_STATE_SCHEMA = ("last_us bigint, last_eid bigint, "
                       "ring array<bigint>, buf_us array<bigint>, "
                       "buf_eid array<bigint>, buf_val array<double>")

ZSCORE_OUTPUT_SCHEMA = ("user_id bigint, event_id bigint, ts timestamp, "
                        "value double, baseline_n bigint, zscore double")

Z_LOOKBACK = 10
Z_MIN_OBS = 5
Z_THRESHOLD = 3.0


def _zscore_apply(key: tuple, pdfs: "Iterator[pd.DataFrame]",
                  state: GroupState) -> "Iterator[pd.DataFrame]":
    if state.exists:
        last_us, last_eid, ring, bu, be, bv = state.get
        ring = list(ring)
        buf = _buf_rows(bu, be, bv)
    else:
        last_us, last_eid, ring = -1, -1, []
        buf = []
    ready, buf = _park_and_split(
        pdfs, state, buf,
        lambda r: (r.ts.value // 1000, r.event_id, r.value))

    out = {"user_id": [], "event_id": [], "ts": [], "value": [],
           "baseline_n": [], "zscore": []}
    for ts_us, eid, val in ready:
        if (ts_us, eid) <= (last_us, last_eid):
            continue  # replay behind the cursor
        c = int(round(val * 100))          # exact for 2dp inputs
        n = len(ring)
        if n >= Z_MIN_OBS:
            s = sum(ring)
            s2 = sum(x * x for x in ring)
            # the batch operator's exact double expression tree
            # (math.sqrt, not ** 0.5: sqrt is correctly rounded on both
            # runtimes, pow(x, 0.5) is not guaranteed to be)
            import math

            nd = float(n)
            sd = math.sqrt((float(s2) - float(s) * float(s) / nd)
                           / (nd - 1.0))
            if sd > 0:
                z = (float(c) - float(s) / nd) / sd
                if abs(z) > Z_THRESHOLD:
                    out["user_id"].append(key[0])
                    out["event_id"].append(eid)
                    out["ts"].append(pd.Timestamp(ts_us * 1000))
                    out["value"].append(val)
                    out["baseline_n"].append(n)
                    out["zscore"].append(round(z, 6))
        ring.append(c)
        if len(ring) > Z_LOOKBACK:
            ring.pop(0)
        last_us, last_eid = ts_us, eid

    state.update((last_us, last_eid, ring,
                  *_buf_cols(buf, 3)))
    _schedule_flush(state, buf)
    yield pd.DataFrame(out)


def zscore_stream(events: DataFrame,
                  delay: str = "30 minutes") -> DataFrame:
    """Streaming rolling z-score anomaly gate: each event judged
    against its key's trailing `Z_LOOKBACK` observations, emitted once
    the watermark confirms order — the live twin of
    timeseries.rolling_zscore_anomalies, flagging exactly the rows the
    batch operator flags over the complete log (tested under shuffled
    arrival). State per key = cursor + a lookback-sized ring of int64
    cents + the parked disorder window — bounded however long the
    stream runs."""
    return (events
            .withWatermark("ts", delay)
            .groupBy("user_id")
            .applyInPandasWithState(
                _zscore_apply,
                outputStructType=ZSCORE_OUTPUT_SCHEMA,
                stateStructType=ZSCORE_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            ))


HOLT_STATE_SCHEMA = ("last_us bigint, last_eid bigint, level double, "
                     "trend double, n_obs bigint, buf_us array<bigint>, "
                     "buf_eid array<bigint>, buf_val array<double>")

HOLT_OUTPUT_SCHEMA = ("user_id bigint, ts timestamp, event_id bigint, "
                      "level double, trend double, n_obs bigint")

HOLT_ALPHA = 0.5
HOLT_BETA = 0.5


def _holt_apply(key: tuple, pdfs: "Iterator[pd.DataFrame]",
                state: GroupState) -> "Iterator[pd.DataFrame]":
    if state.exists:
        last_us, last_eid, level, trend, n_obs, bu, be, bv = state.get
        buf = _buf_rows(bu, be, bv)
    else:
        last_us, last_eid, level, trend, n_obs = -1, -1, None, 0.0, 0
        buf = []
    ready, buf = _park_and_split(
        pdfs, state, buf,
        lambda r: (r.ts.value // 1000, r.event_id, r.value))

    out_ts, out_eid, out_l, out_t, out_n = [], [], [], [], []
    for ts_us, eid, val in ready:
        if (ts_us, eid) <= (last_us, last_eid):
            continue  # replay behind the cursor
        if level is None:
            level, trend = val, 0.0
        else:
            # the exact batch fold arithmetic (holt_last) on IEEE doubles
            new_l = HOLT_ALPHA * val + (1.0 - HOLT_ALPHA) * (level + trend)
            trend = HOLT_BETA * (new_l - level) + (1.0 - HOLT_BETA) * trend
            level = new_l
        n_obs += 1
        last_us, last_eid = ts_us, eid
        out_ts.append(pd.Timestamp(ts_us * 1000))
        out_eid.append(eid)
        out_l.append(level)
        out_t.append(trend)
        out_n.append(n_obs)

    state.update((last_us, last_eid, level, trend, n_obs,
                  *_buf_cols(buf, 3)))
    _schedule_flush(state, buf)
    yield pd.DataFrame({"user_id": [key[0]] * len(out_ts), "ts": out_ts,
                        "event_id": out_eid, "level": out_l,
                        "trend": out_t, "n_obs": out_n})


def holt_stream(events: DataFrame, delay: str = "30 minutes") -> DataFrame:
    """Streaming Holt level+trend: one output row per event (its
    post-update smoothed level and trend), emitted once the watermark
    confirms its order. Equals the batch sequential fold (holt_last)
    over the complete log — tested under shuffled micro-batch arrival.
    State per key = cursor + TWO carried values + the parked disorder
    window."""
    return (events
            .withWatermark("ts", delay)
            .groupBy("user_id")
            .applyInPandasWithState(
                _holt_apply,
                outputStructType=HOLT_OUTPUT_SCHEMA,
                stateStructType=HOLT_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            ))


def ewma_stream(events: DataFrame, delay: str = "30 minutes") -> DataFrame:
    """Streaming per-key EWMA: one output row per event (its post-update
    smoothed value), emitted once the watermark confirms its order.
    Equals the batch sequential fold over the complete log — tested
    under shuffled micro-batch arrival. State per key = cursor + ONE
    carried value + the parked disorder window."""
    return (events
            .withWatermark("ts", delay)
            .groupBy("user_id")
            .applyInPandasWithState(
                _ewma_apply,
                outputStructType=EWMA_OUTPUT_SCHEMA,
                stateStructType=EWMA_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            ))
