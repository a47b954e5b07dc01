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

import tempfile
import uuid

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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_path).schema
    # FileStreamSource requires a DIRECTORY; the testdata ships single
    # .parquet files, so stage one into a throwaway dir (a real
    # deployment streams from a directory/bucket prefix already).
    import os
    import shutil

    stage = None
    if os.path.isfile(events_path):
        stage = tempfile.mkdtemp(prefix="pcs-sessionize-src-")
        shutil.copy(events_path, stage)
        events_path = stage
    from parquet_combiner_spark.sources.io import ensure_ts_nanos

    stream = ensure_ts_nanos(
        spark.readStream.schema(schema).parquet(events_path)
    ).withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
    sessions = sessionize_stream(
        stream,
        gap_minutes=gap_minutes,
        event_time_col="event_time",
        key_col="user_id",
        watermark_delay=watermark_delay,
    )
    name = f"sessions_{uuid.uuid4().hex}"
    ckpt = tempfile.mkdtemp(prefix="pcs-sessionize-ckpt-")
    try:
        query = (
            sessions.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        # the memory sink holds the rows; neither the staged source
        # copy nor the checkpoint is needed after termination (or a
        # failed start), and a bench session runs this repeatedly
        shutil.rmtree(ckpt, ignore_errors=True)
        if stage is not None:
            shutil.rmtree(stage, ignore_errors=True)
    return spark.table(name)
