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

    Aggregation form for deterministic dedup: each map task combines
    to one row per key BEFORE the exchange — same map-side-combine
    shape as :func:`dedup_first_wins`, but with a deterministic
    winner; the window formulation in :func:`dedup_deterministic`
    must instead shuffle every input row. Caveat: ``min_by`` over
    STRUCT buffers cannot hash-aggregate, so both aggregate halves
    run as SortAggregate (an in-partition sort, though still with the
    map-side combine). When the ordering columns are two non-negative
    32-bit ints that form the entire payload, prefer
    :func:`dedup_keep_min_packed` — pure HashAggregate, measured
    ~1.6x faster. Column order in the output matches ``df``.
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


def dedup_keep_min_packed(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """:func:`dedup_keep_min` fast path: lexicographic-min dedup where
    the two ordering columns ARE the entire payload.

    Packs ``(a, b)`` into one long (``a << 32 | b`` — monotone w.r.t.
    the lexicographic order for non-negative values < 2^31) so the
    aggregate is a plain ``min(long)``: partial + final HashAggregate,
    no sort anywhere. ``min_by`` on a struct ordering falls back to
    SortAggregate (sorts every partition on both sides of the
    exchange) — measured ~1.6x slower at sf0.1 on the flagship
    lineitem dedup. Because the survivors are recovered by unpacking
    the minimum itself, ties cannot tear rows the way independent
    per-column ``min_by`` calls could. Column order matches ``df``.

    Requires: exactly two ordering columns of integer type holding
    non-negative values < 2^31, and ``order_cols`` == payload (every
    non-key column). Shape/dtype violations raise ``ValueError`` at
    plan time; VALUE violations (negative, null, or >= 2^31 — which
    int64 parquet columns CAN hold) would silently break the pack's
    lexicographic monotonicity and pick the wrong survivor, so they
    raise at execution time via ONE extra aggregate buffer per key:
    ``bit_or(a | b)``. Any value outside [0, 2^31) has a bit set
    above bit 30 (negatives via sign extension, large values
    directly), the OR-accumulator preserves every bit ever seen
    (unlike ``max``, where a positive valid value outranks a negative
    violator), and nulls are coalesced to all-ones first. The
    ``when/raise_error`` branch then runs once per POST-shuffle key,
    not once per input row — the per-row guard this replaces measured
    +10-13% on the flagship at sf0.1; the bit_or buffer is in the
    noise (±3%).
    """
    payload = [c for c in df.columns if c not in keys]
    if len(order_cols) != 2 or set(payload) != set(order_cols):
        raise ValueError(
            "dedup_keep_min_packed needs exactly two order_cols that "
            f"form the whole payload; got order_cols={list(order_cols)} "
            f"payload={payload}"
        )
    dtypes = dict(df.dtypes)
    bad = [
        c for c in order_cols
        if dtypes[c] not in ("tinyint", "smallint", "int", "bigint")
    ]
    if bad:
        raise ValueError(
            "dedup_keep_min_packed order_cols must be integer-typed; "
            f"got {[(c, dtypes[c]) for c in bad]}"
        )
    a, b = order_cols
    a_l, b_l = F.col(a).cast("long"), F.col(b).cast("long")
    packed = F.shiftleft(a_l, 32) + b_l
    # nulls are out of contract: bit_or skips them, so coalesce to
    # all-ones first — a null ordering value then trips the mask check
    seen_bits = F.bit_or(F.coalesce(a_l.bitwiseOR(b_l), F.lit(-1)))
    agg = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.min(packed).alias("__pk"),
        seen_bits.alias("__or"),
    )
    pk_checked = F.when(
        F.col("__or").bitwiseAND(F.lit(-(1 << 31))) == 0,
        F.col("__pk"),
    ).otherwise(
        F.raise_error(
            F.lit(
                "dedup_keep_min_packed: ordering value null or out of "
                f"[0, 2^31) range in column '{a}' or '{b}' - the "
                "packed-long order would be wrong; use dedup_keep_min "
                "instead"
            )
        )
    )
    unpack = {
        a: F.shiftright(pk_checked, 32).cast(dict(df.dtypes)[a]),
        b: pk_checked.bitwiseAND(F.lit((1 << 32) - 1)).cast(
            dict(df.dtypes)[b]
        ),
    }
    return agg.select(
        *[
            F.col(c) if c in keys else unpack[c].alias(c)
            for c in df.columns
        ]
    )
