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
