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

from pyspark.sql import DataFrame, SparkSession
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
        import numpy as np
        import pandas as pd

        (user_id,) = key
        closed: list[tuple[int, int, int, int]] = []

        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            closed.append((user_id, start_ms, last_ms, n))
            state.remove()
        else:
            # Vectorized within-batch fold (the cross-batch dependency
            # lives in the state object; within a batch the gap splits
            # are a pure array computation — no per-event Python).
            ts = np.sort(
                pd.concat(list(pdfs))[event_time_col]
                .astype("datetime64[ms]")
                .astype("int64")
                .to_numpy()
            )
            cur = state.get if state.exists else None
            if ts.size == 0:  # defensive: no data and no timeout
                if cur is not None:
                    state.update(cur)
                    state.setTimeoutTimestamp(cur[1] + gap_ms)
                return
            if cur is not None:
                s0, l0, n0 = cur
                # Effective "previous event" for each gap check is
                # max(carried last, previous batch event): a LATE
                # event behind the carried state must never regress
                # session_end or split on its raw predecessor. Once
                # any event exceeds l0 (sorted order ⇒ all later ones
                # do too) the max reduces to the plain predecessor, so
                # this one expression is faithful across splits.
                prev = np.maximum(
                    l0, np.concatenate(([np.int64(l0)], ts[:-1]))
                )
            else:
                prev = np.concatenate((ts[:1], ts[:-1]))
            splits = np.flatnonzero(ts - prev > gap_ms)
            bounds = np.concatenate(([0], splits, [len(ts)]))
            segments = [
                (int(ts[a]), int(ts[b - 1]), int(b - a))
                for a, b in zip(bounds[:-1], bounds[1:])
                if b > a
            ]
            if cur is not None:
                if splits.size and splits[0] == 0:
                    # the whole batch is beyond the carried session's
                    # gap: it closes untouched
                    closed.append((user_id, s0, l0, n0))
                else:
                    first = segments[0]
                    segments[0] = (
                        min(s0, first[0]),
                        max(l0, first[1]),
                        n0 + first[2],
                    )
            for start, end, n in segments[:-1]:
                closed.append((user_id, start, end, n))
            cur = segments[-1]
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


def sessionize_events_available_now(
    spark: SparkSession,
    events_path: str,
    gap_minutes: float = 30.0,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Run the streaming sessionizer over an events parquet path with
    ``trigger(availableNow=True)`` and return the CLOSED sessions as a
    batch DataFrame — the driver-checkable face of the streaming
    surface (reference design.pdf p.1-2's real-time pipeline, proven
    against the batch SQL oracle).

    Exact closure semantics (what the batch oracle must mirror):

    - ts is first normalized to integer nanos (``ensure_ts_nanos`` —
      robust to TIMESTAMP(NANOS)-as-long and TIMESTAMP(MICROS)/ntz
      testdata alike), then event_time is
      ``timestamp_micros(ts div 1000)`` — integral division from
      nanos, so session bounds are exact ``floor(ns/1e6)`` millis
      (the state fn floors micros→ms; no float timestamp math
      anywhere).
    - a session closes IN-STREAM when a later event for the same user
      arrives with a gap > ``gap_minutes`` — in batch terms, every
      session except each user's last;
    - a user's LAST session closes only via event-time timeout: the
      final watermark is ``max(event_time_ms) - delay_ms`` and Spark
      fires timeouts strictly below the watermark, so it is emitted
      iff ``session_end + gap_ms < max_ms - delay_ms`` (Spark runs a
      final no-data micro-batch under availableNow precisely so these
      watermark-driven timeouts flush before termination).

    The sink is an in-memory table (bounded: one row per closed
    session, not per event); the checkpoint is a throwaway tempdir.
    """
    from parquet_combiner_spark.streaming.run import (
        run_events_stream_available_now,
    )

    return run_events_stream_available_now(
        spark,
        events_path,
        lambda stream: sessionize_stream(
            stream,
            gap_minutes=gap_minutes,
            event_time_col="event_time",
            key_col="user_id",
            watermark_delay=watermark_delay,
        ),
        prefix="sessionize",
        event_time=F.timestamp_micros(F.expr("ts div 1000")),
    )


def sessionize_stream_native(
    stream: DataFrame,
    gap_minutes: float = 30.0,
    event_time_col: str = "event_time",
    key_col: str = "user_id",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """JVM-native gap sessionization: ``groupBy(session_window(...))``
    — Spark's built-in streaming session aggregation, zero Python in
    the loop (reference design.pdf p.1-2's 10K events/s target; the
    ``applyInPandasWithState`` operator above stays as the
    custom-state-semantics extensibility demo).

    ``session_window`` merges INCLUSIVELY at the gap — two events
    exactly ``gap`` apart share a session, the same ``t - last <=
    gap`` boundary as the custom operator (verified empirically,
    pinned by
    test_streaming.py::test_native_session_window_exact_gap_boundary).
    The intended divergence is emission: append mode evicts a session
    once ``end <= watermark`` (inclusive), while the custom
    operator's event-time timeout fires strictly below the watermark
    (pinned by test_native_emission_boundary_at_watermark_equality).
    The emitted window's end is ``last_event + gap``; subtracting the
    gap recovers the custom operator's (session_start, session_end =
    first/last event time) contract exactly when event times are
    whole millis."""
    gap_ms = int(gap_minutes * 60_000)
    win = F.session_window(F.col(event_time_col), f"{gap_ms // 1000} seconds")
    return (
        stream.withWatermark(event_time_col, watermark_delay)
        .groupBy(win.alias("session"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.expr("unix_micros(session.start) div 1000").alias(
                "session_start"
            ),
            (F.expr("unix_micros(session.end) div 1000") - gap_ms).alias(
                "session_end"
            ),
            "n_events",
        )
    )


def sessionize_events_available_now_native(
    spark: SparkSession,
    events_path: str,
    gap_minutes: float = 30.0,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """The native ``session_window`` sessionizer run to completion
    over an events parquet path — the driver-checkable face of the
    JVM-native streaming path, sharing the custom operator's output
    contract (user_id, session_start, session_end, n_events; integral
    epoch millis).

    Event time is ms-FLOORED before windowing
    (``timestamp_millis(ts div 1e6)``) so session bounds live in the
    same integral-millis space as the custom operator and the batch
    oracle; the only intended divergence is the exact-gap boundary
    (see :func:`sessionize_stream_native`)."""
    from parquet_combiner_spark.streaming.run import (
        run_events_stream_available_now,
    )

    return run_events_stream_available_now(
        spark,
        events_path,
        lambda stream: sessionize_stream_native(
            stream,
            gap_minutes=gap_minutes,
            watermark_delay=watermark_delay,
        ),
        prefix="sessnative",
        event_time=F.timestamp_millis(F.expr("ts div 1000000")),
    )
