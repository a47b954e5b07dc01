"""Deduplication operators (SURVEY.md §2.4).

The reference's signature semantic: each ``detection_oid`` counts once
(reference README.md:33), implemented as
``map(k -> payload).reduceByKey((a, _) => a)`` — an *arbitrary*
first-wins pick (reference services/Aggregations.scala:41-46).

Two variants here:

- :func:`dedup_first_wins` — same arbitrary-representative semantics,
  as ``dropDuplicates``; cheapest plan (partial aggregate both sides of
  the shuffle — the exact-dedup scale path for 100 TB).
- :func:`dedup_deterministic` — window ``row_number() == 1`` with an
  explicit tiebreak order, for oracle-hash reproducibility when the
  surviving payload matters (SURVEY.md §7.4 risk 1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_first_wins(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """One arbitrary surviving row per key (reference D1 semantics).

    Plan shape: partial-aggregate → shuffle on keys → final aggregate;
    Catalyst inserts the map-side combine the reference hand-wrote with
    ``reduceByKey`` (reference considerations.txt:36-38).
    """
    return df.dropDuplicates(list(keys))


def dedup_deterministic(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """One deterministic surviving row per key.

    Keeps the first row under ``order_by`` within each key group —
    e.g. ``order_by=["timestamp_detected", "video_camera_oid"]``
    reproduces "earliest detection wins" regardless of partitioning.

    Supports arbitrary ``order_by`` expressions (desc, nulls-last, …).
    When the order is plain ascending columns, prefer
    :func:`dedup_keep_min`: it aggregates instead of sorting, so the
    shuffle carries one pre-combined row per key per map partition
    rather than every row.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_keep_min(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """One deterministic surviving row per key: the minimum under the
    lexicographic order of ``order_cols`` (ascending, nulls first —
    struct comparison semantics).

    Scale path for deterministic dedup: ``min_by`` compiles to partial
    + final HashAggregate, so each map task pre-combines to one row
    per key BEFORE the exchange — same map-side-combine shape as
    :func:`dedup_first_wins`, but with a deterministic winner. The
    window formulation in :func:`dedup_deterministic` must instead
    shuffle and sort every input row. Column order in the output
    matches ``df``.
    """
    payload = [c for c in df.columns if c not in keys]
    picked = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.min_by(
            F.struct(*payload), F.struct(*[F.col(c) for c in order_cols])
        ).alias("__p")
    )
    return picked.select(
        *[c if c in keys else F.col(f"__p.{c}").alias(c) for c in df.columns]
    )
