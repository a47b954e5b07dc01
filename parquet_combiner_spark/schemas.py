"""Explicit schemas (SURVEY.md §1).

The reference keeps schemas implicit in case classes and fails at task
runtime on a bad column (reference utils/DataReader.scala:14-36). Here
every table gets an explicit StructType so reads fail fast at plan
time, and the Parquet reader can prune columns/rows against a known
schema.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Reference domain tables (reference models/Models.scala:12-24) ---

DATA_A_SCHEMA = T.StructType(
    [
        T.StructField("geographical_location_oid", T.LongType()),
        T.StructField("video_camera_oid", T.LongType()),
        T.StructField("detection_oid", T.LongType()),
        T.StructField("item_name", T.StringType()),
        T.StructField("timestamp_detected", T.LongType()),
    ]
)

DATA_B_SCHEMA = T.StructType(
    [
        T.StructField("geographical_location_oid", T.LongType()),
        T.StructField("geographical_location", T.StringType()),
    ]
)

# Output of the flagship query: 3 nullable strings, rank is a *string*
# (reference ParquetCombinerRDD.scala:194-200).
TOP_ITEMS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("geographical_location", T.StringType()),
        T.StructField("item_rank", T.StringType()),
        T.StructField("item_name", T.StringType()),
    ]
)

# --- Driver testdata tables (TESTDATA.md) ---

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Duck-typed table detection, generalizing the reference inspector's
# column-name sniffing (reference tools/ReadParquet.scala:137-160).
_TABLE_SIGNATURES: dict[str, frozenset[str]] = {
    "dataA": frozenset(
        {
            "geographical_location_oid",
            "video_camera_oid",
            "detection_oid",
            "item_name",
            "timestamp_detected",
        }
    ),
    "dataB": frozenset({"geographical_location_oid", "geographical_location"}),
    "top_items_output": frozenset(
        {"geographical_location", "item_rank", "item_name"}
    ),
    "events": frozenset({"event_id", "ts", "user_id", "event_type", "value"}),
    "documents": frozenset({"doc_id", "text", "lang", "source"}),
    "embeddings": frozenset({"vec_id", "embedding", "label"}),
}


def infer_table_kind(columns: list[str]) -> str:
    """Classify a table by its column names; 'unknown' if nothing fits."""
    cols = {c.lower() for c in columns}
    for kind, sig in _TABLE_SIGNATURES.items():
        if sig <= cols:
            return kind
    return "unknown"
