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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_source_col: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew JOIN escape hatch — for when the hot key lives in a
    shuffle join neither side can broadcast and AQE's skew split
    cannot fully absorb (one monster key still lands on one task
    after splitting, because every split of the big side must meet
    the SAME small-side partition).

    The classic replicate-and-salt: the big side's key is salted with
    a pure function of ``salt_source_col`` (a row-varying column —
    rand() would break task-retry determinism), the small side is
    replicated across ALL ``num_salts`` values via an executor-side
    ``explode(sequence(...))`` (no driver loop, no cross join node),
    and the join runs on (key, salt) — the hot key's probe rows now
    spread over ``num_salts`` tasks. Cost: the small side shuffles
    ``num_salts``× its size; the dial trades that against the hot
    task's size. Result is EXACTLY the unsalted equi-join (inner or
    left on the big side) — pinned by a parity pytest.

    Like the salted aggregation above: if dedup or any per-key
    invariant rides on the join key downstream, ``salt_source_col``
    must be a pure function of that key's dedup unit.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    if salt_source_col == key:
        raise ValueError(
            "salt_source_col must vary within a join key; salting by the "
            "key itself leaves every hot-key row in one bucket"
        )
    overlap = set(big.columns) & set(small.columns) - {key}
    if overlap:
        raise ValueError(
            f"ambiguous output columns {sorted(overlap)}: rename before "
            "joining"
        )
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_source_col), F.lit(num_salts))
    )
    replicated = small.withColumn(
        "__salt",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"), F.lit(num_salts - 1).cast("bigint")
            )
        ),
    )
    joined = salted_big.join(replicated, on=[key, "__salt"], how=how)
    return joined.drop("__salt")
