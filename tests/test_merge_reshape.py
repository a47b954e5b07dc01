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


@pytest.fixture(scope="module")
def cdc_ops(spark):
    """Base state + an op-carrying change batch covering the delete
    matrix: delete-wins, stale-delete-loses, delete-then-reinsert,
    delete-of-absent-key, plain upsert."""
    base = spark.createDataFrame(
        [
            Row(k="a", v=10, val="base-a"),   # deleted by newer D
            Row(k="b", v=10, val="base-b"),   # stale D ignored
            Row(k="c", v=10, val="base-c"),   # untouched
            Row(k="d", v=10, val="base-d"),   # deleted then re-upserted
        ]
    )
    changes = spark.createDataFrame(
        [
            Row(k="a", v=20, val=None, op="D"),      # newer: deletes a
            Row(k="b", v=5, val=None, op="D"),       # older: b survives
            Row(k="d", v=20, val=None, op="D"),      # deletes base-d...
            Row(k="d", v=30, val="upd-d", op="U"),   # ...but newer U wins
            Row(k="e", v=1, val=None, op="D"),       # delete absent key
            Row(k="f", v=1, val="upd-f", op="U"),    # plain insert
        ]
    )
    return base, changes


def test_merge_upsert_deletes_latest_wins(spark, cdc_ops):
    base, changes = cdc_ops
    out = {
        r["k"]: r
        for r in merge_upsert(
            base, changes, ["k"], ["v"], op_col="op"
        ).collect()
    }
    assert set(out) == {"b", "c", "d", "f"}
    assert out["b"]["val"] == "base-b"   # stale tombstone lost the race
    assert out["c"]["val"] == "base-c"
    assert out["d"]["val"] == "upd-d"    # reinsert after delete
    assert out["f"]["val"] == "upd-f"
    # op column never leaks into the output
    assert "op" not in merge_upsert(
        base, changes, ["k"], ["v"], op_col="op"
    ).columns


def test_merge_upsert_delete_replay_idempotent(spark, cdc_ops):
    """Applying the same op-carrying batch twice (foreachBatch's
    at-least-once delivery) must be a no-op the second time —
    including for deletes."""
    base, changes = cdc_ops
    once = merge_upsert(base, changes, ["k"], ["v"], op_col="op")
    twice = merge_upsert(
        once, changes, ["k"], ["v"], op_col="op"
    )
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_merge_upsert_retained_tombstones_block_stale_resurrect(
    spark, cdc_ops
):
    """The incremental-apply form (retain_col): a delete applied in
    batch 1 must keep its version in state so a LOWER-versioned upsert
    arriving in batch 2 cannot resurrect the key — and the final
    retained state, filtered, equals the one-shot compaction of all
    changes (associativity)."""
    base, _ = cdc_ops
    b1 = spark.createDataFrame(
        [("a", 20, None, "D")], "k string, v bigint, val string, op string"
    )
    b2 = spark.createDataFrame(
        [Row(k="a", v=15, val="stale-upd-a", op="U")]  # older than the D
    )
    seeded = base.withColumn("__dead", F.lit(False))
    s1 = merge_upsert(
        seeded, b1, ["k"], ["v"], op_col="op", retain_col="__dead"
    )
    s2 = merge_upsert(
        s1, b2, ["k"], ["v"], op_col="op", retain_col="__dead"
    )
    live = {r["k"]: r for r in s2.where(~F.col("__dead")).collect()}
    assert "a" not in live  # the stale upsert did NOT resurrect the key
    # one-shot compaction over the union of both batches agrees
    oneshot = merge_upsert(
        base, b1.unionByName(b2), ["k"], ["v"], op_col="op"
    )
    assert sorted(
        map(tuple, s2.where(~F.col("__dead")).drop("__dead").collect())
    ) == sorted(map(tuple, oneshot.collect()))
    # WITHOUT retention the stale upsert would wrongly resurrect: the
    # hazard the retained state exists to prevent
    naive1 = merge_upsert(base, b1, ["k"], ["v"], op_col="op")
    naive2 = merge_upsert(naive1, b2, ["k"], ["v"], op_col="op")
    assert "a" in {r["k"] for r in naive2.collect()}


def test_merge_upsert_null_op_is_upsert_not_delete(spark, cdc_ops):
    """A NULL op value must behave as a plain upsert (r8 ADVICE): the
    raw `op == 'D'` comparison is NULL for it, and the tombstone
    filter `where(~flag)` would silently DROP the key — a null-op
    change row acting as a DELETE. In retain_col mode the flag must
    come out a real False, not NULL (reader filters `~flag` would
    drop it there too)."""
    base, _ = cdc_ops
    changes = spark.createDataFrame(
        [("b", 99, "null-op-upd", None)],
        "k string, v bigint, val string, op string",
    )
    out = {
        r["k"]: r
        for r in merge_upsert(
            base, changes, ["k"], ["v"], op_col="op"
        ).collect()
    }
    assert "b" in out and out["b"]["val"] == "null-op-upd"
    seeded = base.withColumn("__dead", F.lit(False))
    kept = merge_upsert(
        seeded, changes, ["k"], ["v"], op_col="op", retain_col="__dead"
    )
    flags = {r["k"]: r["__dead"] for r in kept.collect()}
    assert flags["b"] is False  # real False, never NULL


def test_merge_upsert_retain_requires_op(spark, cdc_ops):
    base, changes = cdc_ops
    with pytest.raises(ValueError, match="retain_col requires op_col"):
        merge_upsert(base, changes.drop("op"), ["k"], ["v"], retain_col="__d")


def test_merge_upsert_deletes_still_partial_aggregate(spark, cdc_ops):
    """Tombstone handling must not change the plan shape: still one
    partial-aggregated exchange, no window sort, filter after the
    aggregate."""
    base, changes = cdc_ops
    out = merge_upsert(base, changes, ["k"], ["v"], op_col="op")
    assert_partial_aggregate(out)
    assert "Window" not in plan_text(out)


def test_compact_tombstones_low_watermark(spark):
    """Tombstones at or below the CDC low-watermark compact away;
    newer tombstones and ALL live rows survive — and compaction never
    changes what a post-compaction merge computes for changes newer
    than the watermark."""
    from parquet_combiner_spark.operators.merge import (
        compact_tombstones,
        merge_upsert,
    )

    state = spark.createDataFrame(
        [
            ("a", 5, "live-a", False),
            ("b", 5, None, True),    # old tombstone: compacted
            ("c", 20, None, True),   # new tombstone: kept
            ("d", 3, "live-d", False),
        ],
        "k string, v bigint, val string, __dead boolean",
    )
    compacted = compact_tombstones(state, ["v"], (10,), "__dead")
    got = {(r["k"], r["__dead"]) for r in compacted.collect()}
    assert got == {("a", False), ("c", True), ("d", False)}

    # a change NEWER than the watermark merges identically against
    # the compacted and the uncompacted state
    batch = spark.createDataFrame(
        [("c", 15, "resurrect-too-old", "U"), ("d", 25, None, "D")],
        "k string, v bigint, val string, op string",
    )
    full = merge_upsert(state, batch, ["k"], ["v"], op_col="op",
                        retain_col="__dead")
    comp = merge_upsert(compacted, batch, ["k"], ["v"], op_col="op",
                        retain_col="__dead")
    live = lambda df: sorted(  # noqa: E731
        map(tuple, df.where("NOT __dead").drop("__dead").collect())
    )
    assert live(full) == live(comp)
    # the v=20 tombstone still blocks the stale v=15 resurrect
    assert ("c",) not in {(r["k"],) for r in comp.where("NOT __dead").collect()}

    with pytest.raises(ValueError, match="arity"):
        compact_tombstones(state, ["v"], (1, 2), "__dead")


def test_scd2_intervals_and_incremental_apply(spark):
    """SCD2: intervals are half-open [from, next_from), the latest row
    per key is open-ended + current, out-of-order and multi-change
    batches resolve by TIMESTAMP (not arrival), and incremental
    scd2_apply over any batch split equals the one-shot derivation
    (associativity)."""
    from pyspark.sql import Row

    from parquet_combiner_spark.operators.merge import (
        scd2_apply,
        scd2_intervals,
    )

    pts = [
        Row(k="a", attr="v1", ts=10),
        Row(k="a", attr="v2", ts=20),
        Row(k="a", attr="v3", ts=30),
        Row(k="b", attr="x", ts=15),
    ]
    df = spark.createDataFrame(pts)
    full = scd2_intervals(df, ["k"], "ts", ["attr"])
    got = {
        (r["k"], r["attr"]): (r["valid_from"], r["valid_to"], r["is_current"])
        for r in full.collect()
    }
    assert got == {
        ("a", "v1"): (10, 20, False),
        ("a", "v2"): (20, 30, False),
        ("a", "v3"): (30, None, True),
        ("b", "x"): (15, None, True),
    }
    # incremental: first batch {v1, v3} (v3 arrives EARLY), second
    # batch {v2, b} arrives later but is timestamped BETWEEN them
    b1 = spark.createDataFrame([pts[0], pts[2]])
    b2 = spark.createDataFrame([pts[1], pts[3]])
    dim1 = scd2_intervals(b1, ["k"], "ts", ["attr"])
    dim2 = scd2_apply(
        dim1, b2.withColumnRenamed("ts", "valid_from"), ["k"]
    )
    assert sorted(map(tuple, dim2.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_scd2_apply_broadcast_size_gate_parity(spark):
    """The batch key set is size-gated: above max_broadcast_keys (or
    with None) the semi/anti pruning joins run as plain shuffle joins
    instead of broadcasting a backfill-sized key set at the driver —
    and BOTH paths produce the identical dimension. The gate's probe
    is LIMIT-bounded (_broadcastable), pinned directly."""
    from pyspark.sql import Row

    from parquet_combiner_spark.operators.merge import (
        _broadcastable,
        scd2_apply,
        scd2_intervals,
    )

    pts = [
        Row(k=f"k{i}", attr=f"v{i}-{j}", ts=10 * j)
        for i in range(20)
        for j in range(1, 3)
    ]
    dim = scd2_intervals(spark.createDataFrame(pts), ["k"], "ts", ["attr"])
    batch = spark.createDataFrame(
        [Row(k=f"k{i}", attr=f"new{i}", valid_from=100) for i in range(0, 20, 2)]
    )
    paths = [
        scd2_apply(dim, batch, ["k"], max_broadcast_keys=cap)
        for cap in (1_000_000, 3, None)  # broadcast / exceeded / forced-off
    ]
    rows = [sorted(map(tuple, p.collect())) for p in paths]
    assert rows[0] == rows[1] == rows[2]
    # the forced-shuffle plan carries no broadcast of the key set
    plan = paths[2]._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in plan

    # probed on the PRE-distinct projection (a distinct under the
    # limit would shuffle the whole batch before the limit fired)
    assert _broadcastable(batch.select("k"), 10)
    assert not _broadcastable(batch.select("k"), 9)
    assert not _broadcastable(batch.select("k"), None)
    probe_plan = (
        batch.select("k")
        .limit(10)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Aggregate" not in probe_plan and "Exchange" not in probe_plan
