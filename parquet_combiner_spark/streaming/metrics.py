"""Streaming observability: per-batch metrics via
``StreamingQueryListener`` — the ops surface a production stream
needs next to the data path (watermark lag, state growth, rows
dropped as too-late), collected WITHOUT touching the query plan.

The listener receives Spark's own progress events on the driver's
listener bus; nothing is added to the executor hot path (contrast a
metrics-collecting transformation, which would cost per-row). This
is the streaming counterpart of the batch ``DataFrame.observe``
wrapper (`tools/observe.py`).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetrics:
    """One micro-batch's vitals, flattened from the progress event."""

    query_id: str
    batch_id: int
    num_input_rows: int
    state_rows_total: int
    state_rows_updated: int
    rows_dropped_by_watermark: int
    watermark: str


@dataclass
class StreamMetricsCollector(StreamingQueryListener):
    """Collects :class:`BatchMetrics` for every progressing query.

    Use::

        collector = StreamMetricsCollector()
        collector.attach(spark)
        ... run streaming queries ...
        collector.detach(spark)
        assert max(m.state_rows_total for m in collector.batches) < CAP

    The collector is additive-only and driver-side; at production
    scale the same events feed a metrics sink instead of a list (the
    ``onQueryProgress`` body is the integration point).
    """

    batches: list[BatchMetrics] = field(default_factory=list)

    def attach(self, spark: SparkSession) -> "StreamMetricsCollector":
        spark.streams.addListener(self)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)

    # --- StreamingQueryListener contract ---

    def onQueryStarted(self, event) -> None:  # noqa: D102
        pass

    def onQueryProgress(self, event) -> None:  # noqa: D102
        p = json.loads(event.progress.json)
        states = p.get("stateOperators") or []
        self.batches.append(
            BatchMetrics(
                query_id=p.get("id", ""),
                batch_id=p.get("batchId", -1),
                num_input_rows=p.get("numInputRows", 0),
                state_rows_total=sum(
                    s.get("numRowsTotal", 0) for s in states
                ),
                state_rows_updated=sum(
                    s.get("numRowsUpdated", 0) for s in states
                ),
                rows_dropped_by_watermark=sum(
                    s.get("numRowsDroppedByWatermark", 0) for s in states
                ),
                watermark=p.get("eventTime", {}).get("watermark", ""),
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: D102
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: D102
        pass
