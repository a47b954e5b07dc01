"""Physical-plan shape checks.

The reference *claims* its optimizations in prose (manual broadcast,
map-side combine, projection pushdown — reference considerations.txt:
36-59); on the DataFrame path those properties are Catalyst's job, so
here they are ASSERTABLE: tests call these helpers to pin the plan
shape that makes a query scale (broadcast join chosen, partial
aggregation present, no cartesian product, filters reaching the
parquet scan). A regression that silently turns a broadcast join into
a sort-merge join — or worse, a cross join — fails CI instead of
failing at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (what ``df.explain(mode)`` prints)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def assert_in_plan(df: DataFrame, *needles: str) -> str:
    """Assert every ``needle`` appears in the physical plan; returns
    the plan text for chaining/debug."""
    plan = plan_text(df)
    for needle in needles:
        assert needle in plan, f"expected {needle!r} in plan:\n{plan}"
    return plan


def assert_not_in_plan(df: DataFrame, *needles: str) -> str:
    plan = plan_text(df)
    for needle in needles:
        assert needle not in plan, f"unexpected {needle!r} in plan:\n{plan}"
    return plan


def assert_no_cartesian_product(df: DataFrame) -> str:
    """The scale-killer check: no O(n*m) join anywhere in the plan."""
    return assert_not_in_plan(
        df, "CartesianProduct", "BroadcastNestedLoopJoin"
    )


def assert_broadcast_join(df: DataFrame) -> str:
    """Dim joins must broadcast (no shuffle of the fact side)."""
    return assert_in_plan(df, "BroadcastHashJoin")


def assert_partial_aggregate(df: DataFrame) -> str:
    """Aggregations must pre-combine map-side: a partial HashAggregate
    (or partial SortAggregate) before the exchange — the property the
    reference hand-built with reduceByKey."""
    plan = plan_text(df)
    assert ("HashAggregate" in plan) or ("SortAggregate" in plan), (
        f"no hash/sort aggregate in plan:\n{plan}"
    )
    # "partial_" marks the map-side half in formatted explain output
    assert "partial_" in plan or "Partial" in plan, (
        f"no partial (map-side) aggregation in plan:\n{plan}"
    )
    return plan


def assert_pushed_filters(df: DataFrame) -> str:
    """At least one predicate reached a parquet scan (a non-empty
    PushedFilters list) — reading then filtering is wrong at 100 TB."""
    import re

    plan = plan_text(df)
    assert re.search(r"PushedFilters: \[[^\]]", plan), (
        f"no non-empty PushedFilters in plan:\n{plan}"
    )
    return plan
