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
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
