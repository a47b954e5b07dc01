"""Streaming CDC apply: maintain a compacted current-state table from
an event stream — ``foreachBatch`` + the batch ``merge_upsert``.

This is the streaming MERGE INTO pattern: each micro-batch is treated
as a CDC update batch and merged into the persisted state snapshot
(latest version per key wins, arrivals beat the snapshot on ties).
Because the merge is the engine's own batch operator, stream and
batch compaction share ONE implementation — the
``current_user_state_stream`` registry query is checked by the BATCH
query's oracle verbatim.

Scale/semantics notes:

* ``foreachBatch`` runs the merge as a normal batch job per trigger;
  state size bounds the merge cost (key cardinality, not stream
  history), and the shuffle carries one pre-combined row per key
  (see operators/merge.py).
* The snapshot is plain parquet swapped via write-temp → rename. A
  production deployment uses a table format (Delta/Iceberg) whose
  MERGE gives atomic commits and time travel; the rename swap is the
  no-dependency demo of the same semantics, and is crash-safe up to
  the swap window.
* Replays are harmless: merging a batch that was already applied is
  a no-op (latest-version-wins is idempotent — pinned by the
  merge_upsert property test), which is exactly why MERGE-based
  sinks tolerate foreachBatch's at-least-once delivery.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_combiner_spark.operators.merge import merge_upsert


def apply_cdc_available_now(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    keys: list[str],
    version_cols: list[str],
    schema,
    max_files_per_trigger: int = 1,
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Stream parquet files from ``source_dir`` (one micro-batch per
    ``max_files_per_trigger`` files) and merge each batch into the
    ``state_dir`` snapshot; returns the final state as a DataFrame.

    ``op_col`` (see :func:`merge_upsert`): the stream's rows carry a
    change op, ``delete_op`` rows are tombstones — a delete arriving
    in any micro-batch removes the key from the returned state unless
    a later-VERSIONED upsert reinstates it. The persisted snapshot
    RETAINS tombstones (``__tombstone`` boolean, merge_upsert's
    ``retain_col``): micro-batch boundaries are arbitrary, so a
    delete must keep its version in state or an out-of-order
    lower-versioned upsert in a later batch would resurrect the key —
    the returned DataFrame filters tombstones out, and compacting
    them away once no older change can arrive is the deployment's
    CDC low-watermark policy. With tombstones retained, the merge is
    associative and the multi-batch stream converges to the
    single-batch compaction however the changes are split (pinned by
    the batch oracle and pytest)."""
    tmp_dir = state_dir.rstrip("/") + "__tmp"
    retain = "__tombstone" if op_col is not None else None

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        cols = [c for c in batch.columns if op_col is None or c != op_col]
        state_cols = [*cols, retain] if retain else cols
        if os.path.isdir(state_dir):
            base = spark.read.parquet(state_dir).select(*state_cols)
        elif retain:
            base = (
                spark.createDataFrame([], batch.select(*cols).schema)
                .withColumn(retain, F.lit(False))
            )
        else:
            base = spark.createDataFrame([], batch.select(*cols).schema)
        merged = merge_upsert(
            base, batch, keys, version_cols, op_col=op_col,
            delete_op=delete_op, retain_col=retain,
        )
        merged.write.mode("overwrite").parquet(tmp_dir)
        # swap: the tmp write is complete before the old snapshot goes
        shutil.rmtree(state_dir, ignore_errors=True)
        os.rename(tmp_dir, state_dir)

    ckpt = tempfile.mkdtemp(prefix="pcs-cdc-ckpt-")
    try:
        query = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir)
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    state = spark.read.parquet(state_dir)
    if retain and retain in state.columns:
        # retained tombstones are state bookkeeping, not live rows
        state = state.where(~F.col(retain)).drop(retain)
    return state


def apply_cdc_txlog_available_now(
    spark: SparkSession,
    source_dir: str,
    state_table: str,
    keys: list[str],
    version_cols: list[str],
    schema,
    max_files_per_trigger: int = 1,
    op_col: str | None = None,
    delete_op: str = "D",
    query_id: str = "cdc",
) -> DataFrame:
    """:func:`apply_cdc_available_now` with the state in a VERSIONED
    TABLE instead of a parquet rename-swap: each micro-batch's merge
    commits as one atomic txlog version carrying ``(query_id, epoch)``
    in its meta, which closes the two gaps of the swap variant —
    (1) no crash window (the O_EXCL publish is atomic; a torn run
    leaves only vacuum-garbage), and (2) exactly-once without relying
    on merge idempotence alone: a REPLAYED epoch finds its own commit
    and skips, so even non-idempotent extensions (additive columns)
    would be safe. Bonus: the state is time-travelable — version k is
    the state after micro-batch k, the debugging surface a plain
    directory can never give you. Tombstones are retained in state
    (see the base function) and filtered from the returned frame."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    retain = "__tombstone" if op_col is not None else None
    seen: set = set()

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if not seen:
            seen.update(
                (c["meta"].get("query_id"), c["meta"]["epoch"])
                for c in txlog._read_log(state_table)
                if "epoch" in c.get("meta", {})
            )
            seen.add("__warm")  # non-empty ⇒ cold load happened
        if (query_id, epoch_id) in seen:
            return
        cols = [c for c in batch.columns if op_col is None or c != op_col]
        state_cols = [*cols, retain] if retain else cols
        version = txlog.current_version(state_table)
        if version >= 0:
            base = txlog.read_table(spark, state_table, version).select(
                *state_cols
            )
        elif retain:
            base = spark.createDataFrame(
                [], batch.select(*cols).schema
            ).withColumn(retain, F.lit(False))
        else:
            base = spark.createDataFrame([], batch.select(*cols).schema)
        merged = merge_upsert(
            base, batch, keys, version_cols, op_col=op_col,
            delete_op=delete_op, retain_col=retain,
        )
        txlog.commit(
            merged,
            state_table,
            action="overwrite" if version >= 0 else "append",
            meta={"query_id": query_id, "epoch": epoch_id},
            expected_version=version if version >= 0 else None,
        )
        seen.add((query_id, epoch_id))

    ckpt = tempfile.mkdtemp(prefix="pcs-cdctx-ckpt-")
    try:
        query = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir)
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    state = txlog.read_table(spark, state_table)
    if retain and retain in state.columns:
        state = state.where(~F.col(retain)).drop(retain)
    return state
