"""Custom stateful streaming operator via applyInPandasWithState:
per-user session counting with a gap timeout, state carried across
micro-batches (the arbitrary-state API the engine uses wherever
built-in windows can't express the semantics).

State per user: (last_ts epoch, n_sessions, n_events). Each batch's
rows are sorted in-group, sessions split on gaps > gap_s, and the
running totals are emitted in update mode — a session spanning a
micro-batch boundary is bridged by the stored last_ts, never double
counted (asserted against the batch sessionize oracle in
tests/test_stateful_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
        StructField("last_ts", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_ts", DoubleType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)


def streaming_sessionize(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """events must carry (user_id long, ts timestamp)."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        for pdf in pdfs:
            for ts in sorted(pdf["ts"]):
                epoch = ts.timestamp()
                if last_ts is None or epoch - last_ts > gap_s:
                    n_sessions += 1
                n_events += 1
                last_ts = epoch
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_sessions": n_sessions,
                    "n_events": n_events,
                    "last_ts": last_ts,
                }
            ]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
