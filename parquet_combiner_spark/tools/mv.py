"""Incremental materialized-view maintenance over append-only
versioned tables — the warehouse MV refresh, composed from the
engine's own kernels.

A *count/sum MV* is a per-key additive aggregate of a base table.
Because additive aggregates are MERGEABLE (operators/merge.py
``merge_additive``), refreshing the MV after new base commits does
NOT re-scan history: the delta is exactly the rows appended since
the last refresh — which the commit log resolves to the NEW data
files alone (``txlog.read_appends``, O(delta) bytes) — aggregated
and folded into the stored MV with one key-bounded shuffle.

Exactly-once refresh: the MV table's commit ``meta`` records the
base version each refresh incorporated (``base_version`` — the
Delta txn pattern again), so a re-run after a crash sees the base
unchanged and commits nothing; a racing refresh loses the
``expected_version`` O_EXCL arbitration and retries against the
advanced MV.

An ``overwrite`` commit on the base makes "appended rows" undefined
(``read_appends`` raises), so refresh falls back to a FULL recompute
— correct for any history, merely not incremental, exactly Delta's
CDF rule for rewritten commits.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_combiner_spark.operators.merge import merge_additive
from parquet_combiner_spark.tools import txlog


def _aggregate(base_rows: DataFrame, keys: Sequence[str]) -> DataFrame:
    return base_rows.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("n")
    )


def refresh_count_mv(
    spark: SparkSession,
    base_table: str,
    mv_table: str,
    keys: Sequence[str],
    max_retries: int = 3,
) -> int:
    """Bring the per-``keys`` count MV up to the base table's latest
    version. Returns the MV version after the call (committing a new
    one only when the base advanced). Incremental when every new base
    commit is an append; full recompute across overwrites."""
    base_version = txlog.current_version(base_table)
    if base_version < 0:
        raise FileNotFoundError(f"{base_table} has no transaction log")
    for attempt in range(max(1, max_retries)):
        mv_version = txlog.current_version(mv_table)
        last_base = -1
        if mv_version >= 0:
            last = txlog.history(mv_table)[0]
            last_base = last["meta"].get("base_version", -1)
        if last_base == base_version:
            return mv_version  # already current: no commit, no churn
        try:
            if last_base < 0:
                fresh = _aggregate(
                    txlog.read_table(spark, base_table, base_version), keys
                )
            else:
                try:
                    delta = txlog.read_appends(
                        spark, base_table, last_base, base_version
                    )
                    fresh = merge_additive(
                        txlog.read_table(spark, mv_table, mv_version),
                        _aggregate(delta, keys),
                        keys=list(keys),
                        sum_cols=["n"],
                    )
                except ValueError:
                    # overwrite in range: append-delta undefined
                    fresh = _aggregate(
                        txlog.read_table(spark, base_table, base_version),
                        keys,
                    )
            return txlog.commit(
                fresh,
                mv_table,
                action="overwrite" if mv_version >= 0 else "append",
                meta={"base_version": base_version},
                expected_version=mv_version if mv_version >= 0 else None,
            )
        except txlog.CommitConflict:
            if attempt == max(1, max_retries) - 1:
                raise
            continue  # another refresher advanced the MV: re-read
    raise AssertionError("unreachable")
