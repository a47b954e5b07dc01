"""Custom stateful streaming operator: event-time sessionization via
``applyInPandasWithState``.

This is the pattern for operators Structured Streaming lacks natively
(SURVEY.md §2.10 stretch; the batch analog is
``queries.user_sessions``): per-key mutable state carried across
micro-batches, Arrow-batched into Python, with event-time timeouts
driven by the watermark so idle sessions close and state cannot grow
unboundedly.

Semantics: events for a user belong to one session while consecutive
gaps stay within ``gap``; a closed session is emitted as
(user_id, session_start, session_end, n_events). Sessions close two
ways: a larger gap arrives in-stream, or the watermark passes
last_event + gap (state timeout) — both exactly-once per session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.LongType()),  # epoch ms
        T.StructField("session_end", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_stream(
    stream: DataFrame,
    gap_minutes: float = 30.0,
    event_time_col: str = "event_time",
    key_col: str = "user_id",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Watermarked per-key sessionization; returns a streaming
    DataFrame of CLOSED sessions (append mode)."""
    gap_ms = int(gap_minutes * 60_000)

    def fn(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        closed: list[tuple[int, int, int, int]] = []

        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            closed.append((user_id, start_ms, last_ms, n))
            state.remove()
        else:
            ts = (
                pd.concat(list(pdfs))[event_time_col]
                .astype("datetime64[ms]")
                .astype("int64")
                .sort_values()
            )
            cur = state.get if state.exists else None
            for t in ts:
                t = int(t)
                if cur is None:
                    cur = (t, t, 1)
                elif t - cur[1] > gap_ms:
                    closed.append((user_id, cur[0], cur[1], cur[2]))
                    cur = (t, t, 1)
                else:
                    # a LATE event (t within the watermark but behind
                    # state from an earlier micro-batch) must never
                    # regress session_end or re-arm the timeout
                    # earlier — it joins the session without moving
                    # its bounds backwards
                    cur = (min(cur[0], t), max(cur[1], t), cur[2] + 1)
            state.update(cur)
            # close via watermark: when event time passes last + gap
            state.setTimeoutTimestamp(cur[1] + gap_ms)

        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    return (
        stream.withWatermark(event_time_col, watermark_delay)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
