from parquet_combiner_spark.streaming.sessionize import (  # noqa: F401
    sessionize_stream,
    sessionize_stream_native,
)
from parquet_combiner_spark.streaming.pipeline import (  # noqa: F401
    archive_stream,
    dedup_stream,
    enrich_with_locations,
    stream_detections,
    top_items_per_window,
    windowed_item_counts,
    windowed_top_events_available_now,
)
