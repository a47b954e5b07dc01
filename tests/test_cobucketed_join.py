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
    # mixed INCOMMENSURABLE eras within one table: a bucket(6) commit
    # among bucket(4) files can't fold onto any common modulus
    evolved6 = f"{root}/evolved6"
    txlog.commit(
        spark.createDataFrame(
            [Row(k=i, r_v=i) for i in range(10)], "k long, r_v long"
        ),
        evolved6,
        partition_by=["bucket(4, k)"],
    )
    txlog.set_partition_spec(evolved6, ["bucket(6, k)"])
    txlog.commit(
        spark.createDataFrame(
            [Row(k=i, r_v=i) for i in range(10, 20)],
            "k long, r_v long",
        ),
        evolved6,
    )
    with pytest.raises(ValueError, match="divisible bucket eras"):
        txlog.join_cobucketed(spark, left, evolved6, "k")
    with pytest.raises(ValueError, match="inner.*left|how"):
        txlog.join_cobucketed(spark, left, left, "k", how="outer")


def test_join_cobucketed_mixed_divisible_eras_fold(spark, tmp_path):
    """A side holding MIXED divisible eras (bucket(4) files alongside
    bucket(8), mid-re-bucketing) folds onto the coarse modulus and
    joins shuffle-free (r15; previously refused): a key's era-8 and
    era-4 directories collapse onto the same folded bucket because
    (x mod 8) mod 4 = x mod 4."""
    root = str(tmp_path)
    left = _build(spark, root, "l", 40, 1, buckets=4)
    evolved = f"{root}/evolved"
    txlog.commit(
        spark.createDataFrame(
            [Row(k=i, r_v=i * 10) for i in range(0, 40, 2)],
            "k long, r_v long",
        ),
        evolved,
        partition_by=["bucket(4, k)"],
    )
    txlog.set_partition_spec(evolved, ["bucket(8, k)"])
    txlog.commit(
        spark.createDataFrame(
            [Row(k=i, r_v=i * 10) for i in range(1, 40, 2)],
            "k long, r_v long",
        ),
        evolved,
    )
    for how in ("inner", "left", "left_semi", "left_anti"):
        got = txlog.join_cobucketed(spark, left, evolved, "k", how=how)
        want = txlog.read_table(spark, left).join(
            txlog.read_table(spark, evolved), on="k", how=how
        )
        assert _collected(got) == _collected(want), how
    plan = plan_text(txlog.join_cobucketed(spark, left, evolved, "k"))
    assert not re.findall(r"\bExchange\b", plan)


def test_join_cobucketed_semi_anti_match_plain_join(spark, tmp_path):
    """left_semi / left_anti (VERDICT r14 #5 — the GDPR subject-lookup
    and NOT-EXISTS shapes): same pairwise bucket mapping, output is
    the left columns only. The right side is deliberately SPARSE over
    8 buckets so some buckets are right-EMPTY — the case where anti
    must KEEP every left row (the inverse of inner's skip) while semi
    skips the bucket wholesale."""
    root = str(tmp_path)
    left = _build(spark, root, "l", 40, 1, buckets=8)
    # only two right keys → most of the 8 bucket dirs are empty
    right = _build(spark, root, "r", 6, 3, buckets=8)
    for how in ("left_semi", "left_anti"):
        got = txlog.join_cobucketed(spark, left, right, "k", how=how)
        want = txlog.read_table(spark, left).join(
            txlog.read_table(spark, right), on="k", how=how
        )
        assert got.columns == ["k", "l_v"], how
        assert _collected(got) == _collected(want), how
    semi = txlog.join_cobucketed(spark, left, right, "k", how="left_semi")
    anti = txlog.join_cobucketed(spark, left, right, "k", how="left_anti")
    # right holds keys {0, 3}; NULL never matches → semi drops the
    # NULL-key left row, anti keeps it (unmatched is what anti means)
    assert {r["k"] for r in semi.collect()} == {0, 3}
    assert anti.count() == 39  # 38 unmatched keys + the NULL-key row
    assert anti.where(F.col("k").isNull()).count() == 1
    # disjoint + complete: semi ∪ anti = left, semi ∩ anti = ∅
    assert semi.count() + anti.count() == 41
    # plan shape: broadcast semi/anti per bucket, zero shuffle
    for df in (semi, anti):
        plan = plan_text(df)
        assert "BroadcastHashJoin" in plan
        assert not re.findall(r"\bExchange\b", plan), plan


def test_join_cobucketed_fused_aggregation(spark, tmp_path):
    """aggs= fuses enrich-then-aggregate into the zero-exchange plan:
    per-bucket broadcast join → coalesce(1)'d groupBy → union. Parity
    with the plain join+groupBy (grouping on a RIGHT-side column too
    — joined rows inherit the left row's bucket residency, so those
    groups are complete per bucket), and not a single shuffle
    Exchange for a query that normally pays two."""
    root = str(tmp_path)
    left = _build(spark, root, "l", 40, 1, buckets=8)
    right = _build(spark, root, "r", 40, 2, buckets=8)
    aggs = lambda: [  # noqa: E731 — fresh Columns per plan
        F.count(F.lit(1)).alias("n"),
        F.sum("l_v").alias("sv"),
        F.countDistinct("r_v").alias("nr"),
    ]
    got = txlog.join_cobucketed(
        spark, left, right, "k", how="left",
        aggs=aggs(), group_cols=["r_v"],
    )
    want = (
        txlog.read_table(spark, left)
        .join(txlog.read_table(spark, right), on="k", how="left")
        .groupBy("k", "r_v")
        .agg(*aggs())
    )
    assert got.columns == ["k", "r_v", "n", "sv", "nr"]
    assert _collected(got) == _collected(want)
    plan = plan_text(got)
    assert "BroadcastHashJoin" in plan and "HashAggregate" in plan
    assert not re.findall(r"\bExchange\b", plan), plan


# --- agg_bucketed: the aggregate sibling (VERDICT r14 #4) ----------------


def _agg_rows(n):
    out = [
        Row(k=i % 17, g=("even" if i % 2 == 0 else "odd"), v=i)
        for i in range(n)
    ]
    out.append(Row(k=None, g="even", v=-1))
    out.append(Row(k=None, g="odd", v=-2))
    return out


def _agg_table(spark, root, n=120, buckets=4, name="t"):
    table = f"{root}/{name}"
    df = spark.createDataFrame(
        _agg_rows(n), "k long, g string, v long"
    )
    txlog.commit(df, table, partition_by=[f"bucket({buckets}, k)"])
    return table


_AGGS = lambda: [  # noqa: E731 - fresh Columns per call
    F.count(F.lit(1)).alias("n"),
    F.sum("v").alias("sv"),
    F.countDistinct("g").alias("ng"),
]


def test_agg_bucketed_matches_plain_groupby(spark, tmp_path):
    """Per-bucket groups are complete (every key lives in exactly one
    bucket directory, NULLs in the NULL directory), so the union of
    per-bucket aggregates equals the global groupBy — including the
    NULL-key group and a non-decomposable count-distinct."""
    table = _agg_table(spark, str(tmp_path))
    got = txlog.agg_bucketed(spark, table, "k", _AGGS())
    want = txlog.read_table(spark, table).groupBy("k").agg(*_AGGS())
    assert got.columns == ["k", "n", "sv", "ng"]
    assert _collected(got) == _collected(want)
    # the NULL group is present, complete, and counted once
    null_rows = [r for r in got.collect() if r["k"] is None]
    assert len(null_rows) == 1 and null_rows[0]["n"] == 2


def test_agg_bucketed_extra_group_cols(spark, tmp_path):
    """(key, extra) groups can't span buckets either — the bucket id
    is a function of the key alone — so grouping columns beyond the
    bucket key stay exchange-free and exact."""
    table = _agg_table(spark, str(tmp_path))
    aggs = [F.count(F.lit(1)).alias("n"), F.max("v").alias("mx")]
    got = txlog.agg_bucketed(
        spark, table, "k", aggs, group_cols=["g"]
    )
    want = (
        txlog.read_table(spark, table).groupBy("k", "g").agg(*aggs)
    )
    assert got.columns == ["k", "g", "n", "mx"]
    assert _collected(got) == _collected(want)
    assert not re.findall(r"\bExchange\b", plan_text(got))


def test_agg_bucketed_plan_has_no_exchange(spark, tmp_path):
    """The whole point: HashAggregates over coalesce(1)'d bucket
    scans, ZERO shuffle Exchange — even the count-distinct (normally
    two extra exchanges: expand partial + final) plans exchange-free
    because single-partition children satisfy every clustering
    requirement."""
    table = _agg_table(spark, str(tmp_path), buckets=8)
    out = txlog.agg_bucketed(spark, table, "k", _AGGS())
    plan = plan_text(out)
    assert "HashAggregate" in plan
    assert not re.findall(r"\bExchange\b", plan), plan
    assert out.count() == 18  # 17 keys + the NULL group


def test_agg_bucketed_mixed_divisible_eras_fold(spark, tmp_path):
    """A table mid-re-bucketing (bucket(4) files alongside bucket(8))
    folds losslessly onto the coarse modulus — (x mod 8) mod 4 =
    x mod 4 — so groups stay complete per folded bucket; parity and
    the exchange-free plan both hold. (The join refuses this shape
    because PAIRWISE mapping needs one era per side; a single-table
    aggregate only needs a consistent fold.)"""
    root = str(tmp_path)
    table = f"{root}/evolving"
    df1 = spark.createDataFrame(
        _agg_rows(60), "k long, g string, v long"
    )
    txlog.commit(df1, table, partition_by=["bucket(4, k)"])
    txlog.set_partition_spec(table, ["bucket(8, k)"])
    df2 = spark.createDataFrame(
        [Row(k=i % 17, g="late", v=1000 + i) for i in range(60)],
        "k long, g string, v long",
    )
    txlog.commit(df2, table)
    got = txlog.agg_bucketed(spark, table, "k", _AGGS())
    want = txlog.read_table(spark, table).groupBy("k").agg(*_AGGS())
    assert _collected(got) == _collected(want)
    assert not re.findall(r"\bExchange\b", plan_text(got))


def test_agg_bucketed_refuses_unsound_layouts(spark, tmp_path):
    root = str(tmp_path)
    # incommensurable mixed eras: bucket(6) files don't fold onto
    # bucket(4) — (x mod 6) mod 4 != x mod 4 in general
    table = f"{root}/incomm"
    txlog.commit(
        spark.createDataFrame(_agg_rows(30), "k long, g string, v long"),
        table,
        partition_by=["bucket(4, k)"],
    )
    txlog.set_partition_spec(table, ["bucket(6, k)"])
    txlog.commit(
        spark.createDataFrame(
            [Row(k=i, g="x", v=i) for i in range(30)],
            "k long, g string, v long",
        ),
        table,
    )
    with pytest.raises(ValueError, match="divisible bucket eras"):
        txlog.agg_bucketed(spark, table, "k", _AGGS())
    # flat table: no bucket segment — per-directory groups unsound
    flat = f"{root}/flat"
    txlog.commit(
        spark.createDataFrame([Row(k=1, g="x", v=1)],
                              "k long, g string, v long"),
        flat,
    )
    with pytest.raises(ValueError, match="not .uniformly. bucket"):
        txlog.agg_bucketed(spark, flat, "k", _AGGS())


def test_bucketed_ops_on_emptied_tables(spark, tmp_path):
    """A delete-all replace commit leaves a bucketed table with ZERO
    data files — both agg_bucketed and join_cobucketed (plain and
    fused) must return empty results with the right schema, not trip
    over an empty era set."""
    root = str(tmp_path)
    table = _agg_table(spark, root, n=20)
    txlog.delete_where(spark, table, "v", -10, 10_000)
    got = txlog.agg_bucketed(spark, table, "k", _AGGS())
    assert got.columns == ["k", "n", "sv", "ng"] and got.count() == 0
    left = _build(spark, root, "l", 10, 1)
    txlog.delete_where(spark, left, "l_v", -10, 10_000)
    for other in (left,):  # both sides emptied
        out = txlog.join_cobucketed(spark, left, other, "k")
        assert out.count() == 0
        fused = txlog.join_cobucketed(
            spark, left, other, "k",
            aggs=[F.count(F.lit(1)).alias("n")],
        )
        assert fused.columns == ["k", "n"] and fused.count() == 0


def test_agg_bucketed_applies_deletion_vectors(spark, tmp_path):
    """Merge-on-read DVs resolve inside the per-bucket scans, so
    DV-deleted rows never reach the aggregates."""
    root = str(tmp_path)
    table = _agg_table(spark, root, n=60)
    txlog.delete_where(spark, table, "k", 5, 9, mode="dv")
    got = txlog.agg_bucketed(spark, table, "k", _AGGS())
    want = txlog.read_table(spark, table).groupBy("k").agg(*_AGGS())
    assert _collected(got) == _collected(want)
    ks = {r["k"] for r in got.collect()}
    assert ks.isdisjoint(set(range(5, 10)))


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
