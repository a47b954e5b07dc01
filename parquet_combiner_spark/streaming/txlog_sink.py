"""Streaming sink into the versioned table layer: each micro-batch
becomes ONE atomic table version, and replays are absorbed by the
commit log itself.

``foreachBatch`` delivers batches AT-LEAST-ONCE (a crash after the
sink ran but before the checkpoint advanced replays the same epoch).
The standard exactly-once recipe is an idempotent sink keyed on the
epoch id — here the key rides the commit record's ``meta``: before
committing, the sink scans the log for the epoch; a replayed batch
finds its own earlier commit and returns without writing. Because
the log publish is atomic (O_EXCL create, `tools/txlog.py`), there is
no window where a batch is half-visible — a crashed commit attempt
leaves only unreferenced data files for ``vacuum``.

This is the integration story the CDC sink (`apply_cdc.py`) notes it
wants from a real table format ("atomic commits and time travel"):
with txlog underneath, streaming ingestion gets BOTH — every batch is
a version, so downstream consumers can read a consistent snapshot
while ingestion runs, and time travel reproduces the table as of any
batch.
"""

from __future__ import annotations

import tempfile
import shutil

from pyspark.sql import DataFrame, SparkSession

from parquet_combiner_spark.tools import txlog


def txlog_append_batch(batch: DataFrame, epoch_id: int, table: str) -> bool:
    """Idempotently commit one micro-batch as a table version.
    Returns True if a commit happened, False for a replayed epoch."""
    for c in txlog._read_log(table):
        if c.get("meta", {}).get("epoch") == epoch_id:
            return False
    txlog.commit(batch, table, meta={"epoch": epoch_id})
    return True


def stream_to_txlog_available_now(
    spark: SparkSession,
    source_dir: str,
    table: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Stream parquet files from ``source_dir`` into versioned table
    ``table`` (one commit per micro-batch) to completion; returns the
    final snapshot."""
    ckpt = tempfile.mkdtemp(prefix="pcs-txsink-ckpt-")
    try:
        query = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir)
            .writeStream.foreachBatch(
                lambda df, eid: txlog_append_batch(df, eid, table)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return txlog.read_table(spark, table)
