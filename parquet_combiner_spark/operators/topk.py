"""Per-group top-K ranking (SURVEY.md §2.5 A2, §2.6).

The reference hand-rolls this with ``groupByKey`` + in-memory sort +
``take(topX)`` (reference services/Aggregations.scala:53-69), which
materializes whole groups on one executor — the thing that OOMs on a
skewed group at scale. The window-function form below ranks with a
spillable sort and never materializes a group; with AQE skew handling
it survives pathological key distributions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top-``k`` rows per group under ``order_by``, with a
    1-based dense sequential ``rank_col`` (row_number semantics: ties
    broken by the order spec, so make it total for determinism).
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).where(
        F.col(rank_col) <= k
    )


def top_k_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    item_cols: Sequence[str],
    k: int,
    count_col: str = "count",
    rank_col: str = "rank",
) -> DataFrame:
    """Count items within groups, then rank and keep top-``k`` per
    group — the generic form of the reference's flagship (A1 + A2).

    Deterministic tiebreak: count desc, then item columns asc
    (SURVEY.md §7.4 risk 1 — the reference left ties arbitrary).
    """
    counts = df.groupBy(*group_cols, *item_cols).agg(
        F.count(F.lit(1)).alias(count_col)
    )
    order = [F.desc(count_col)] + [F.asc(c) for c in item_cols]
    return top_k_per_group(counts, group_cols, order, k, rank_col=rank_col)
