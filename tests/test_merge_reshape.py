"""merge_upsert (CDC compaction) and the pivot/unpivot reshapes."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from parquet_combiner_spark.operators.merge import merge_upsert
from parquet_combiner_spark.plans import (
    assert_not_in_plan,
    assert_partial_aggregate,
    plan_text,
)


@pytest.fixture(scope="module")
def cdc(spark):
    base = spark.createDataFrame(
        [
            Row(k="a", v=10, val="base-a"),
            Row(k="b", v=10, val="base-b"),
            Row(k="c", v=10, val="base-c"),  # untouched by updates
        ]
    )
    updates = spark.createDataFrame(
        [
            Row(k="a", v=20, val="upd-a"),   # newer version: replaces
            Row(k="b", v=10, val="upd-b"),   # SAME version: update wins
            Row(k="b", v=5, val="upd-b-old"),  # older: ignored
            Row(k="d", v=1, val="upd-d"),    # new key: inserted
        ]
    )
    return base, updates


def test_merge_upsert_latest_wins_and_tie_prefers_update(spark, cdc):
    base, updates = cdc
    out = {r["k"]: r for r in merge_upsert(base, updates, ["k"], ["v"]).collect()}
    assert len(out) == 4
    assert out["a"]["val"] == "upd-a" and out["a"]["v"] == 20
    assert out["b"]["val"] == "upd-b" and out["b"]["v"] == 10
    assert out["c"]["val"] == "base-c"  # base-only key passes through
    assert out["d"]["val"] == "upd-d"  # update-only key inserted


def test_merge_upsert_output_columns_match_base(spark, cdc):
    base, updates = cdc
    out = merge_upsert(base, updates, ["k"], ["v"])
    assert out.columns == base.columns  # priority tag never leaks


def test_merge_upsert_rejects_schema_drift(spark, cdc):
    base, _ = cdc
    with pytest.raises(ValueError, match="identical columns"):
        merge_upsert(base, base.withColumnRenamed("val", "other"), ["k"], ["v"])
    with pytest.raises(ValueError, match="absent"):
        merge_upsert(base, base, ["nope"], ["v"])


def test_merge_upsert_aggregates_before_exchange(spark, cdc):
    """The compaction must shuffle pre-combined rows (partial
    aggregate), never every input row through a window sort."""
    base, updates = cdc
    out = merge_upsert(base, updates, ["k"], ["v"])
    assert_partial_aggregate(out)
    assert "Window" not in plan_text(out)


def test_conditional_pivot_is_single_exchange(spark):
    """The conditional-aggregate pivot must plan exactly ONE exchange
    (the .pivot() API plans two: pre-count, then pivotfirst)."""
    import re

    ev = spark.createDataFrame(
        [Row(user_id=1, event_type="click"), Row(user_id=1, event_type="view"),
         Row(user_id=2, event_type="click")]
    )
    wide = ev.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(t)
            for t in ["click", "view"]
        ]
    )
    # plan inspected BEFORE execution: post-AQE explain repeats every
    # node in both the final and the original plan listing
    plan = plan_text(wide)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "pivotfirst" not in plan
    assert_partial_aggregate(wide)
    rows = {r["user_id"]: r for r in wide.collect()}
    assert rows[1]["click"] == 1 and rows[1]["view"] == 1
    assert rows[2]["click"] == 1 and rows[2]["view"] == 0  # zero, not null


def test_unpivot_is_narrow(spark):
    """unpivot is a per-row expansion: no exchange in the plan."""
    df = spark.createDataFrame([Row(id=1, a=1.0, b=2.0)])
    long = df.unpivot(["id"], ["a", "b"], "measure", "val")
    got = {(r["id"], r["measure"], r["val"]) for r in long.collect()}
    assert got == {(1, "a", 1.0), (1, "b", 2.0)}
    assert_not_in_plan(long, "Exchange")


def test_semi_anti_partition_customers(spark):
    """The semi and anti formulations over the same predicate must
    PARTITION the customer table: disjoint, union = all customers."""
    from parquet_combiner_spark.queries import (
        customers_with_high_value_orders,
        customers_without_high_value_orders,
    )

    sf = "/root/testdata/sf0.001"
    with_hv = {
        r["c_custkey"]
        for r in customers_with_high_value_orders(spark, sf).collect()
    }
    without_hv = {
        r["c_custkey"]
        for r in customers_without_high_value_orders(spark, sf).collect()
    }
    assert with_hv.isdisjoint(without_hv)
    n_cust = spark.read.parquet(f"{sf}/customer.parquet").count()
    assert len(with_hv) + len(without_hv) == n_cust
