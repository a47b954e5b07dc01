"""Storage-partitioned co-bucketed join (tools/txlog.py
``join_cobucketed`` — VERDICT r13 'Next round' #3): two txtables with
the identical ``bucket(N, key)`` hidden-partition spec join by mapping
bucket directories PAIRWISE — per-bucket BroadcastHashJoins unioned —
so neither side rides a shuffle Exchange. Equal non-NULL keys provably
share a bucket (same ``pmod(crc32(cast(key as string)), N)`` writer
arithmetic both sides), so the union of per-bucket joins IS the global
join; these tests pin result parity against the plain shuffle join,
the no-shuffle plan shape, and the loud refusals for layouts where
pairwise directory mapping would be unsound."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from parquet_combiner_spark.plans import plan_text
from parquet_combiner_spark.tools import txlog

pytestmark = pytest.mark.txlifecycle


def _rows(side, n, step):
    # keys 0..n step `step`, with one NULL-key row per side: NULL
    # never equi-joins, and the NULL directory only pairs with the
    # NULL directory
    out = [Row(k=i, **{f"{side}_v": i * 10}) for i in range(0, n, step)]
    out.append(Row(k=None, **{f"{side}_v": -1}))
    return out


def _build(spark, root, side, n, step, buckets=4):
    table = f"{root}/{side}"
    df = spark.createDataFrame(
        _rows(side, n, step), f"k long, {side}_v long"
    )
    txlog.commit(df, table, partition_by=[f"bucket({buckets}, k)"])
    return table


def _collected(df):
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_join_cobucketed_matches_plain_join(spark, tmp_path):
    root = str(tmp_path)
    left = _build(spark, root, "l", 40, 1)
    right = _build(spark, root, "r", 40, 3)  # sparse: misses keys
    for how in ("inner", "left"):
        got = txlog.join_cobucketed(spark, left, right, "k", how=how)
        want = txlog.read_table(spark, left).join(
            txlog.read_table(spark, right), on="k", how=how
        )
        assert got.columns == ["k", "l_v", "r_v"]
        assert _collected(got) == _collected(want), how
    # NULL keys: dropped on inner, null-extended on left — exactly
    # like the plain join (checked above); pin the counts explicitly
    inner = txlog.join_cobucketed(spark, left, right, "k")
    assert inner.where(F.col("k").isNull()).count() == 0
    left_j = txlog.join_cobucketed(spark, left, right, "k", how="left")
    assert left_j.count() == 41  # 40 keys + the NULL-key left row


def test_join_cobucketed_plan_has_no_shuffle_exchange(spark, tmp_path):
    """The whole point: N BroadcastHashJoins unioned, ZERO shuffle
    Exchange nodes — the 100 TB fact side is consumed at scan
    parallelism (\\bExchange\\b excludes BroadcastExchange, same
    tripwire as test_shuffle_exchange_budgets)."""
    root = str(tmp_path)
    left = _build(spark, root, "l", 60, 1)
    right = _build(spark, root, "r", 60, 2)
    out = txlog.join_cobucketed(spark, left, right, "k")
    plan = plan_text(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert not re.findall(r"\bExchange\b", plan), plan
    # and it still computes the right thing
    assert out.count() == 30


def test_join_cobucketed_compatible_eras_fold(spark, tmp_path):
    """bucket(4) ⋈ bucket(8): fine directories fold losslessly onto
    the coarse modulus ((x mod 8) mod 4 = x mod 4), so the
    post-re-bucketing shape joins shuffle-free instead of refusing —
    result parity with the plain join, still zero shuffle
    Exchanges."""
    root = str(tmp_path)
    left = _build(spark, root, "l", 40, 1, buckets=4)
    right8 = _build(spark, root, "r8", 40, 2, buckets=8)
    for how in ("inner", "left"):
        got = txlog.join_cobucketed(spark, left, right8, "k", how=how)
        want = txlog.read_table(spark, left).join(
            txlog.read_table(spark, right8), on="k", how=how
        )
        assert _collected(got) == _collected(want), how
    plan = plan_text(txlog.join_cobucketed(spark, left, right8, "k"))
    assert not re.findall(r"\bExchange\b", plan)


def test_join_cobucketed_refuses_unsound_layouts(spark, tmp_path):
    root = str(tmp_path)
    left = _build(spark, root, "l", 20, 1, buckets=4)
    # incommensurable moduli: bucket(6) shares no common grouping
    # with bucket(4) — (x mod 6) mod 4 != x mod 4 in general
    right6 = _build(spark, root, "r6", 20, 1, buckets=6)
    with pytest.raises(ValueError, match="divisible bucket eras"):
        txlog.join_cobucketed(spark, left, right6, "k")
    # flat table: no bucket segment to pair on
    flat = f"{root}/flat"
    txlog.commit(
        spark.createDataFrame([Row(k=1, r_v=1)], "k long, r_v long"),
        flat,
    )
    with pytest.raises(ValueError, match="not .uniformly. bucket"):
        txlog.join_cobucketed(spark, left, flat, "k")
    # mixed eras WITHIN one table: evolution commits land a second
    # modulus — pairwise mapping refuses
    evolved = f"{root}/evolved"
    df = spark.createDataFrame(
        [Row(k=i, r_v=i) for i in range(10)], "k long, r_v long"
    )
    txlog.commit(df, evolved, partition_by=["bucket(4, k)"])
    txlog.set_partition_spec(evolved, ["bucket(8, k)"])
    txlog.commit(
        spark.createDataFrame(
            [Row(k=i, r_v=i) for i in range(10, 20)],
            "k long, r_v long",
        ),
        evolved,
    )
    with pytest.raises(ValueError, match="ONE bucket era"):
        txlog.join_cobucketed(spark, left, evolved, "k")
    with pytest.raises(ValueError, match="inner.*left|how"):
        txlog.join_cobucketed(spark, left, left, "k", how="outer")


def test_join_cobucketed_applies_deletion_vectors(spark, tmp_path):
    """Merge-on-read DVs resolve per side inside the per-bucket scans
    before the join — a DV-deleted dim row must not match."""
    root = str(tmp_path)
    left = _build(spark, root, "l", 20, 1)
    right = _build(spark, root, "r", 20, 1)
    txlog.delete_where(spark, right, "k", 5, 9, mode="dv")
    got = txlog.join_cobucketed(spark, left, right, "k")
    ks = {r["k"] for r in got.collect()}
    assert ks == set(range(0, 5)) | set(range(10, 20))
