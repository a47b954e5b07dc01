"""Dimension joins (SURVEY.md §2.3).

The reference avoids ``.join()`` entirely: it collects the dimension
table to the driver, broadcasts a hash map, and does a map-side
``getOrElse(..., "Unknown")`` lookup
(reference ParquetCombinerRDD.scala:177-191). Semantically that is a
left-outer broadcast equi-join with a default for misses — which is
exactly what ``join(broadcast(dim), key, "left")`` + ``coalesce``
declares, letting Spark ship the dim table executor-to-executor as a
torrent broadcast instead of round-tripping it through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    defaults: dict[str, object] | None = None,
    how: str = "left",
) -> DataFrame:
    """Equi-join ``fact`` with a broadcast ``dim`` on ``key``.

    ``defaults`` maps dim-column → value substituted when the key has
    no match (reference's "Unknown" at ParquetCombinerRDD.scala:189).
    """
    joined = fact.join(F.broadcast(dim), on=key, how=how)
    for col_name, default in (defaults or {}).items():
        joined = joined.withColumn(
            col_name, F.coalesce(F.col(col_name), F.lit(default))
        )
    return joined
