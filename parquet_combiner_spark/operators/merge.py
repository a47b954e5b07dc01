"""Merge/upsert (CDC apply) — latest-version-wins key compaction.

The reference engine has no mutation surface at all (its pipeline is
read → aggregate → write, reference services/Aggregations.scala), but
any table the engine maintains incrementally needs the MERGE step a
lakehouse runs on every CDC batch: base snapshot + update batch →
one surviving row per key, highest version wins, updates beating the
snapshot on version ties. This is the kernel of Delta/Iceberg MERGE
INTO restricted to whole-row upserts — expressed here as a pure
DataFrame computation so it works on plain parquet.

Plan shape: union (no shuffle) → groupBy(keys).max_by(payload,
version) — ONE exchange carrying one pre-combined row per key per
map partition. ``max_by`` over a struct ordering runs as
SortAggregate (struct buffers cannot hash-aggregate), but both
halves still partial-aggregate, so the shuffle volume is bounded by
the key cardinality, not the input size — the property that matters
at 100 TB, where the update batch is small but the base is not. The
window (``row_number() = 1``) formulation would shuffle and sort
EVERY row of base+updates; see operators/dedup.py for the same
tradeoff measured on the dedup family.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PRIORITY = "__src_priority"


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    version_cols: Sequence[str],
) -> DataFrame:
    """One surviving row per ``keys``: the row with the greatest
    ``version_cols`` tuple across ``base`` ∪ ``updates``; on an exact
    version tie the update wins (CDC convention — the incoming batch
    is newer knowledge). Column order matches ``base``. Keys deleted
    upstream are NOT handled (no tombstone column in the contract);
    rows present only in ``base`` pass through unchanged.

    Deterministic iff no two rows of the same source share both key
    and version tuple — make ``version_cols`` end in a unique id when
    the version itself can tie.
    """
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            "merge_upsert needs identical columns; got "
            f"base={base.columns} updates={updates.columns}"
        )
    missing = [c for c in (*keys, *version_cols) if c not in base.columns]
    if missing:
        raise ValueError(f"key/version columns absent from inputs: {missing}")
    tagged = base.withColumn(_PRIORITY, F.lit(0)).unionByName(
        updates.withColumn(_PRIORITY, F.lit(1))
    )
    payload = [c for c in base.columns if c not in keys]
    order = F.struct(
        *[F.col(c) for c in version_cols], F.col(_PRIORITY)
    )
    picked = tagged.groupBy(*[F.col(k) for k in keys]).agg(
        F.max_by(F.struct(*payload), order).alias("__p")
    )
    return picked.select(
        *[c if c in keys else F.col(f"__p.{c}").alias(c) for c in base.columns]
    )
