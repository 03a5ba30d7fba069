"""Custom stateful streaming operator: per-user session tracking with
applyInPandasWithState (SURVEY.md §2.10 / north-star 'custom stateful
operators').

State per user: (n_events, total_value, last_ts_epoch).  A new event
more than `gap_s` after the last one closes the session and emits a
session row; state survives across micro-batches via the streaming
state store (checkpointed, exactly-once)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_events long, session_value double, closed boolean"
)
STATE_SCHEMA = "n long, total double, last_epoch long"


GAP_S = 1800


def _track(key, pdfs, state: GroupState):
    (user_id,) = key
    if state.exists:
        n, total, last_epoch = state.get
        if n == 0:
            last_epoch = None
    else:
        n, total, last_epoch = 0, 0.0, None

    out = []
    rows = [pdf for pdf in pdfs]
    if rows:
        allr = pd.concat(rows).sort_values("epoch")
        for t in allr.itertuples(index=False):
            if last_epoch is not None and t.epoch - last_epoch > GAP_S:
                out.append((user_id, n, total, True))  # close session
                n, total = 0, 0.0
            n += 1
            total += float(t.value)
            last_epoch = int(t.epoch)
    state.update((n, total, last_epoch if last_epoch is not None else 0))
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "session_events", "session_value", "closed"]
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events stream (user_id, ts, value) → closed-session rows
    (gap = GAP_S).  Works on both streams and batch frames (batch:
    one 'micro-batch')."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id", F.unix_timestamp(F.col("ts").cast("timestamp")).alias("epoch"), "value"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
