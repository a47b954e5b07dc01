"""Temporal joins Spark has no native operator for (driver brief's
canonical custom-operator examples; the reference's surface has no
temporal join either, SURVEY.md §2.3): the as-of (point-in-time)
join and the bucketed range/interval join.

For each fact row, attach the dimension row with the LARGEST dim time
at-or-before the fact's time, per key — the attribution/feature-
lookup join every event-sourced training pipeline needs ("state of X
when Y happened").

Scale design — union + window, NO join node at all:

- A sort-merge or broadcast range join on ``(key, dim.t <= fact.t)``
  degenerates: the range predicate makes every equi-join a partial
  cross product per key. Instead both sides are TAGGED and UNIONED,
  shuffled ONCE on the key, and a per-key ordered window propagates
  the last dim payload forward onto each fact row (``last(...,
  ignorenulls=True)``).
- Cost: one hash exchange + one in-partition sort — identical shape
  to the sessionization window, skew-bounded by per-key row counts.
- The dim payload rides as ONE struct, so a dim row whose payload
  columns are legitimately NULL still wins over an older dim row
  (per-column ``last(ignorenulls)`` would silently fall through to
  stale values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SRC = "__asof_src"
_T = "__asof_t"
_PAYLOAD = "__asof_payload"


def asof_join_backward(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    fact_time: str,
    dim_time: str,
    value_cols: list[str],
    tolerance=None,
) -> DataFrame:
    """Left as-of join: every fact row, plus ``value_cols`` from the
    dim row with the greatest ``dim_time`` <= ``fact_time`` for the
    same ``on`` key (NULLs when no such row — left-join semantics).

    ``tolerance`` (same integer time unit as the columns, like
    ``pandas.merge_asof``'s): a match STALER than it — the picked dim
    row more than ``tolerance`` behind the fact — attributes NULLs
    instead, the freshness bound every attribution/pricing as-of
    eventually needs (a view from last year should not claim this
    morning's purchase). Implemented as a mask on the carried payload
    (which records its own dim time), so the plan is unchanged: one
    union, one key shuffle, one ordered window, no join node.

    ``dim`` must be unique per (``on``, ``dim_time``) — pre-dedup it
    (e.g. ``max_by``) if it is not; with duplicate timestamps "the"
    as-of row is not well defined. Time columns must be the same
    orderable type on both sides (use integer epoch units for
    exactness). ``value_cols`` must not collide with fact columns.
    """
    missing = [c for c in value_cols if c not in dim.columns]
    if missing:
        raise ValueError(f"value_cols {missing} not in dim columns")
    collisions = [c for c in value_cols if c in fact.columns]
    if collisions:
        raise ValueError(
            f"value_cols {collisions} collide with fact columns"
        )
    d = dim.select(
        *on,
        F.col(dim_time).alias(_T),
        F.lit(0).alias(_SRC),
        F.struct(
            *value_cols, F.col(dim_time).alias("__asof_t")
        ).alias(_PAYLOAD),
    )
    # the fact side carries a typed-NULL payload so unionByName lines
    # up; allowMissingColumns null-fills fact-only columns on dim rows
    f = (
        fact.withColumn(_T, F.col(fact_time))
        .withColumn(_SRC, F.lit(1))
        .withColumn(
            _PAYLOAD, F.lit(None).cast(d.schema[_PAYLOAD].dataType)
        )
    )
    u = f.unionByName(d, allowMissingColumns=True)
    # dim sorts BEFORE fact at equal time (_SRC 0 < 1): at-or-before
    # is inclusive, matching e.g. DuckDB's ASOF ON fact.t >= dim.t
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_T), F.col(_SRC))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )
    out = carried.where(F.col(_SRC) == 1)
    fresh_enough = (
        F.col(_PAYLOAD)["__asof_t"]
        >= F.col(fact_time) - F.lit(tolerance)
        if tolerance is not None
        else F.lit(True)
    )
    for c in value_cols:
        out = out.withColumn(
            c, F.when(fresh_enough, F.col(_PAYLOAD)[c])
        )
    return out.drop(_SRC, _T, _PAYLOAD)


def interval_join(
    fact: DataFrame,
    intervals: DataFrame,
    on: list[str],
    fact_time: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Range join: every (fact, interval) pair with the same ``on``
    key and ``start <= fact_time <= end`` (inclusive both ends) —
    a fact matching k intervals yields k rows, none yields zero
    (inner semantics).

    Scale design — BUCKETED equi-join, never a raw range predicate:
    Catalyst plans a bare ``t BETWEEN start AND end`` join condition
    as a per-key cross product (broadcast-nested-loop or worse).
    Instead each interval EXPLODES into the time buckets it covers
    (``sequence(start div w, end div w)``), each fact row computes its
    single bucket, and the join is a plain equi-join on
    (key..., bucket) with the exact BETWEEN as a post-filter.

    ``bucket_width`` (same integer time unit as the columns) is the
    scale knob: an interval spanning L time units explodes into
    ~L/width + 1 rows, while a wider bucket co-locates more
    non-matching pairs for the post-filter to discard. Pick it near
    the TYPICAL interval length (each interval then lands in 1-2
    buckets); unbounded-length intervals need capping upstream.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    w = int(bucket_width)
    # `div` (integral), never `/` (float in Spark SQL): bucket ids
    # must be exact longs on both sides
    d = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.expr(f"CAST({start_col} AS LONG) div {w}"),
                F.expr(f"CAST({end_col} AS LONG) div {w}"),
            )
        ),
    )
    f = fact.withColumn("__bkt", F.expr(f"CAST({fact_time} AS LONG) div {w}"))
    joined = f.join(d, on=[*on, "__bkt"]).where(
        F.col(fact_time).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("__bkt")


def asof_join_cogrouped(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    fact_time: str,
    dim_time: str,
    value_cols: list[str],
    num_buckets: int = 64,
    tolerance=None,
) -> DataFrame:
    """:func:`asof_join_backward` on the COGROUPED-MAP path — the
    Arrow custom-operator formulation of the same semantics
    (inclusive at-or-before, NULL on no-match; ``tolerance`` maps
    straight onto ``pandas.merge_asof``'s native knob, same inclusive
    bound as the JVM operator — parity pinned by pytest), and the
    extensibility template for per-key temporal logic window
    functions cannot express (interpolation, nearest).

    Scale shape: cogrouping on the raw key would invoke Python once
    per key — measured 7.3s vs the JVM operator's 0.65s at sf0.1,
    where ~1.5K tiny user groups pay per-call overhead. Instead both
    sides cogroup on a COARSE HASH BUCKET of the key (``num_buckets``
    groups total) and ``pandas.merge_asof(by=on)`` performs the
    per-key as-of WITHIN each bucket in one vectorized call — same
    semantics, bounded group count, 0.9s at sf0.1 (~8x better than
    naive cogrouping, still behind the all-JVM union+window plan,
    which remains the default).

    Same contract as the union+window operator: ``dim`` unique per
    (on, time), orderable same-typed time columns, no value/fact
    column collisions — and the same DuckDB ASOF oracle checks both.
    """
    import pandas as pd
    from pyspark.sql import types as T

    missing = [c for c in value_cols if c not in dim.columns]
    if missing:
        raise ValueError(f"value_cols {missing} not in dim columns")
    collisions = [c for c in value_cols if c in fact.columns]
    if collisions:
        raise ValueError(f"value_cols {collisions} collide with fact columns")

    dim_fields = {f.name: f for f in dim.schema.fields}
    out_schema = T.StructType(
        list(fact.schema.fields)
        + [
            T.StructField(c, dim_fields[c].dataType, True)
            for c in value_cols
        ]
    )
    fact_cols = list(fact.columns)
    # pandas nullable dtypes for value columns that Arrow must emit
    # as null (NaN would fail a long column)
    _NULLABLE = {"bigint": "Int64", "int": "Int32", "boolean": "boolean"}
    nullable_casts = {
        c: _NULLABLE[dim_fields[c].dataType.simpleString()]
        for c in value_cols
        if dim_fields[c].dataType.simpleString() in _NULLABLE
    }

    dim_cols = [*on, dim_time, *value_cols]

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # defensive: Spark has been observed delivering a cogrouped
        # side WITHOUT one of its columns when the cogroup key is a
        # strict subset of an upstream groupBy's keys (the raw-key
        # formulation hit this at sf0.1: dim built by
        # groupBy(user, t).agg(...) cogrouped on user arrived missing
        # t). The explicit pre-selects below pin the shape; if a plan
        # change ever reintroduces it, fail loudly instead of a
        # cryptic pandas KeyError.
        missing_l = [c for c in fact_cols if c not in left.columns]
        missing_r = [
            c for c in dim_cols if len(right) and c not in right.columns
        ]
        if missing_l or missing_r:
            raise RuntimeError(
                "cogrouped as-of received frames missing columns: "
                f"left-missing={missing_l} right-missing={missing_r}"
            )
        left = left.drop(columns=["__bkt"])
        if not len(left):
            return pd.DataFrame(columns=fact_cols + value_cols)
        if not len(right):
            out = left.copy()
            for c in value_cols:
                out[c] = None
        else:
            out = pd.merge_asof(
                left.sort_values(fact_time, kind="mergesort"),
                right[[*on, dim_time, *value_cols]].sort_values(
                    dim_time, kind="mergesort"
                ),
                left_on=fact_time,
                right_on=dim_time,
                by=list(on),
                direction="backward",
                allow_exact_matches=True,
                tolerance=tolerance,
            )
        for c, dtype in nullable_casts.items():
            out[c] = out[c].astype(dtype)
        return out[fact_cols + value_cols]

    bkt = F.pmod(F.xxhash64(*[F.col(c) for c in on]), F.lit(num_buckets))
    # explicit projections pin each side's delivered column set (see
    # the defensive note in merge)
    f_b = fact.select(*fact_cols, bkt.alias("__bkt"))
    # The dim side is additionally pinned through a LAZY local
    # checkpoint: in long sessions that executed plans sharing the
    # dim's aggregation subtree, the cogroup's right side has been
    # observed arriving WITHOUT the aggregation's grouping-key
    # columns (the guard above catches it). The checkpoint replaces
    # the agg lineage with a fresh scan — new attributes, nothing for
    # the reuse/pruning interaction to key on. Lazy: materialized by
    # the first action, blocks managed by the ContextCleaner. The
    # dim side of an as-of join is the aggregated/smaller side by
    # construction; the (large) fact side is never checkpointed.
    d_b = dim.select(*dim_cols, bkt.alias("__bkt")).localCheckpoint(
        eager=False
    )
    return (
        f_b.groupBy("__bkt")
        .cogroup(d_b.groupBy("__bkt"))
        .applyInPandas(merge, schema=out_schema)
    )
