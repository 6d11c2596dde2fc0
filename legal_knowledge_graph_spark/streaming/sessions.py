"""Custom stateful streaming operator: event sessionization via
``applyInPandasWithState``.

The reference has no streaming surface (SURVEY.md §2.9); this is the
engine-side capability for event-stream inputs: group a user's events
into sessions separated by a gap, carrying (session_start, last_ts,
n_events, value_sum) as typed state per user across micro-batches.

Semantics (deterministic, batch-equivalent):
- events of a user arriving within ``gap_seconds`` of the previous one
  extend the current session;
- a larger gap CLOSES the previous session (emitted) and starts a new
  one;
- sessions still open when the state times out (processing-time
  timeout after the stream goes idle) are emitted by the timeout
  branch, so a closed (availableNow) input eventually yields every
  session except those the final micro-batch leaves open — the test
  compares against the batch sessionization restricted to closed
  sessions.

The equivalent BATCH sessionization (:func:`sessionize_batch`) is the
classic gap-and-island: session id = running count of gap-breaks per
user (one window pass) — used as the oracle.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.DoubleType(), False),
        T.StructField("session_end", T.DoubleType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("value_sum_x100", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start", T.DoubleType(), False),
        T.StructField("last_ts", T.DoubleType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("value_sum_x100", T.LongType(), False),
    ]
)


def _session_fn(gap_seconds: float, flush_timeout_ms: int):
    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                s0, last, n, v = state.get
                closed.append((user_id, s0, last, n, v))
                state.remove()
            yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])
            return

        if state.exists:
            s0, last, n, v = state.get
        else:
            s0, last, n, v = None, None, 0, 0

        events = pd.concat(list(pdfs), ignore_index=True).sort_values("ts_sec")
        for ts, val in zip(events["ts_sec"], events["vx100"]):
            ts = float(ts)
            if s0 is None:
                s0, last, n, v = ts, ts, 1, int(val)
            elif ts - last <= gap_seconds:
                last, n, v = ts, n + 1, v + int(val)
            else:
                closed.append((user_id, s0, last, n, v))
                s0, last, n, v = ts, ts, 1, int(val)
        state.update((float(s0), float(last), int(n), int(v)))
        # idle-timeout flushes the open session once the stream drains;
        # decoupled from the gap — it is processing-time plumbing, not
        # session semantics (a long gap must not keep the query alive)
        state.setTimeoutDuration(flush_timeout_ms)
        yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])

    return fn


def sessionize_stream(events, gap_seconds: float = 1800.0, flush_timeout_ms: int = 2000):
    """events stream (user_id, ts, value) -> session rows. Pre-projects
    epoch seconds + integer-scaled value so the stateful function works
    on plain numerics."""
    prepared = events.select(
        "user_id",
        F.unix_timestamp("ts").cast("double").alias("ts_sec"),
        F.floor(F.col("value") * 100).cast("long").alias("vx100"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_seconds, flush_timeout_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def sessionize_batch(events: DataFrame, gap_seconds: float = 1800.0) -> DataFrame:
    """Batch oracle: gap-and-island sessionization in one window pass.
    Returns ALL sessions (including each user's final one)."""
    prepared = events.select(
        "user_id",
        F.unix_timestamp("ts").cast("double").alias("ts_sec"),
        F.floor(F.col("value") * 100).cast("long").alias("vx100"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_sec")
    marked = prepared.withColumn("prev_ts", F.lag("ts_sec").over(w)).withColumn(
        "new_session",
        (F.col("prev_ts").isNull() | (F.col("ts_sec") - F.col("prev_ts") > gap_seconds)).cast("int"),
    )
    sessioned = marked.withColumn(
        "session_idx",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessioned.groupBy("user_id", "session_idx").agg(
        F.min("ts_sec").alias("session_start"),
        F.max("ts_sec").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("vx100").alias("value_sum_x100"),
    )
