"""Dimension joins (SURVEY.md §2.3).

The reference avoids ``.join()`` entirely: it collects the dimension
table to the driver, broadcasts a hash map, and does a map-side
``getOrElse(..., "Unknown")`` lookup
(reference ParquetCombinerRDD.scala:177-191). Semantically that is a
left-outer broadcast equi-join with a default for misses — which is
exactly what ``join(broadcast(dim), key, "left")`` declares, letting
Spark ship the dim table executor-to-executor as a torrent broadcast
instead of round-tripping it through the driver.

Two reference semantics deliberately preserved here:

- ``collectAsMap()`` implicitly keeps ONE row per dim key, so a
  non-unique dimension must not fan out fact rows → the dim side is
  deduplicated (deterministically) on the join key before joining.
- ``getOrElse`` substitutes the default only when the KEY is absent —
  a matched row whose attribute is genuinely NULL keeps its NULL. The
  default is therefore gated on a join-miss marker, not ``coalesce``
  over the payload column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MATCH = "__dim_matched"


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    defaults: dict[str, object] | None = None,
    how: str = "left",
    dedup_dim: bool = True,
) -> DataFrame:
    """Equi-join ``fact`` with a broadcast ``dim`` on ``key``.

    ``defaults`` maps dim-column → value substituted when the key has
    no match (reference's "Unknown" at ParquetCombinerRDD.scala:189).
    ``dedup_dim`` keeps one deterministic row per dim key (lowest
    payload values win), matching the reference's collectAsMap()
    last-write-wins map semantics without its nondeterminism.
    """
    if dedup_dim:
        payload = [c for c in dim.columns if c != key]
        if payload:
            w = Window.partitionBy(key).orderBy(*[F.asc_nulls_last(c) for c in payload])
            dim = (
                dim.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            dim = dim.dropDuplicates([key])
    dim = dim.withColumn(_MATCH, F.lit(True))
    joined = fact.join(F.broadcast(dim), on=key, how=how)
    for col_name, default in (defaults or {}).items():
        joined = joined.withColumn(
            col_name,
            F.when(F.col(_MATCH).isNull(), F.lit(default)).otherwise(
                F.col(col_name)
            ),
        )
    return joined.drop(_MATCH)
