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


def _aggregate_sums(
    base_rows: DataFrame, keys: Sequence[str], sum_cols: Sequence[str]
) -> DataFrame:
    return base_rows.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(c).alias(c) for c in sum_cols],
    )


def refresh_agg_mv(
    spark: SparkSession,
    base_table: str,
    mv_table: str,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    max_retries: int = 3,
) -> int:
    """Bring a per-``keys`` count+sum MV up to the base table's
    latest version, INCREMENTALLY across row-level DML — the CDF
    extension of :func:`refresh_count_mv` (which is append-only and
    falls back to a full recompute the moment any DML touches the
    base).

    The delta source is :func:`txlog.table_changes_cdf`: appends
    contribute their rows as ``insert``; CDF-recorded DML (DELETE /
    UPDATE / MERGE run with ``cdf=True``) contributes row-level
    pre/post images. Each change row folds with a SIGN — +1 for
    ``insert``/``update_postimage``, −1 for
    ``delete``/``update_preimage`` — so the per-key delta is one
    O(changed rows) aggregation, and :func:`merge_additive` folds it
    into the stored view with one key-bounded shuffle. Count and
    sums are mergeable under signed folding (an update contributes
    −pre +post, a delete −pre), and a group whose count reaches 0
    VANISHED from the base — its row is dropped, not kept at zero.
    A data-changing commit in the range without recorded change
    files raises inside the CDF reader, and the refresh degrades to
    the full recompute — correct for any history, merely not
    incremental (Delta's "change data not recorded" rule).

    At 100 TB: the base is never re-scanned on the incremental path
    — the refresh reads O(changed rows) change files + the stored
    view. The commit is an overwrite of the VIEW (aggregate-sized,
    ≪ base) because exactly-once needs the incorporated
    ``base_version`` to land atomically WITH the data (the commit
    ``meta``, Delta's txn pattern, same as refresh_count_mv): a
    re-run after a crash sees the watermark and commits nothing; a
    racing refresh loses the ``expected_version`` arbitration and
    retries against the advanced view. For a view so large that the
    overwrite dominates, compose the same signed delta with
    ``txlog.merge_into`` instead (O(changed keys) file rewrites) at
    the cost of watermark atomicity."""
    base_version = txlog.current_version(base_table)
    if base_version < 0:
        raise FileNotFoundError(f"{base_table} has no transaction log")
    cols = ["n", *sum_cols]
    for attempt in range(max(1, max_retries)):
        mv_version = txlog.current_version(mv_table)
        last_base = -1
        if mv_version >= 0:
            last = txlog.history(mv_table)[0]
            last_base = last["meta"].get("base_version", -1)
        if last_base == base_version:
            return mv_version  # already current: no commit, no churn
        fresh = None
        if last_base >= 0:
            try:
                changes = txlog.table_changes_cdf(
                    spark, base_table, last_base, base_version
                )
                sign = (
                    F.when(
                        F.col("_change_type").isin(
                            "insert", "update_postimage"
                        ),
                        F.lit(1),
                    )
                    .when(
                        F.col("_change_type").isin(
                            "delete", "update_preimage"
                        ),
                        F.lit(-1),
                    )
                    .otherwise(
                        # a fifth change type would silently skew the
                        # fold via NULL-skipping sums — fail the job
                        F.raise_error(
                            F.concat(
                                F.lit("unknown _change_type: "),
                                F.col("_change_type"),
                            )
                        ).cast("int")
                    )
                )
                delta = (
                    changes.withColumn("_sign", sign)
                    .groupBy(*[F.col(k) for k in keys])
                    .agg(
                        F.sum("_sign").cast("long").alias("n"),
                        *[
                            F.sum(F.col("_sign") * F.col(c)).alias(c)
                            for c in sum_cols
                        ],
                    )
                )
                fresh = merge_additive(
                    txlog.read_table(spark, mv_table, mv_version),
                    delta,
                    keys=list(keys),
                    sum_cols=cols,
                ).where(F.col("n") != 0)
            except (ValueError, FileNotFoundError):
                fresh = None  # CDF gap in range: full recompute below
        if fresh is None:
            fresh = _aggregate_sums(
                txlog.read_table(spark, base_table, base_version),
                keys,
                sum_cols,
            )
        try:
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
