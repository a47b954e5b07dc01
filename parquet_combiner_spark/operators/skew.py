"""Salted two-phase aggregation — skew escape hatch (SURVEY.md §2.5 A7).

The reference hand-splits a known-skewed location into a salted
pipeline and unions it back (reference utils/SkewedDataHandler.scala:
26-65). On Spark ≥3.2, AQE skew-join splitting plus partial
aggregation makes this unnecessary for every query in this engine —
session.py enables it. This module keeps the generic two-phase salted
*group-by* for the one case AQE doesn't cover: a single giant group in
a hand-written aggregation whose final combine must see every row of
the group on one task.

Correctness note carried over from the reference: when dedup and
salting coexist, the salt MUST be a pure function of the dedup key
(reference salts with ``detection_oid % n`` — SkewedDataHandler.scala:55)
so a dedup group is never split across salt buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame,
    group_cols: Sequence[str],
    salt_col: str,
    num_salts: int = 32,
    count_col: str = "count",
) -> DataFrame:
    """Count per group via salt → partial count → de-salt → sum.

    Phase 1 shuffles on (group_cols, salt) — skewed keys spread over
    ``num_salts`` tasks; phase 2 shuffles ``num_salts``× fewer rows.
    Equivalent to ``groupBy(group_cols).count()`` for any data.

    ``salt_col`` must vary WITHIN a group — if it is one of the group
    columns (or constant per group) the salt is constant inside each
    group and the skew is not mitigated at all, so that is rejected.
    """
    if salt_col in set(group_cols):
        raise ValueError(
            f"salt_col {salt_col!r} is a group column: the salt would be "
            "constant within each group and the skew would not be split"
        )
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(salt_col), F.lit(num_salts)))
    partial = salted.groupBy(*group_cols, "__salt").agg(
        F.count(F.lit(1)).alias("__partial")
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("__partial").cast("long").alias(count_col)
    )
