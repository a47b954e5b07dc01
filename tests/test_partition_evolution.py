"""Partition spec EVOLUTION (VERDICT r10 order #9, Iceberg-style):
``set_partition_spec`` changes the layout for future writes in one
metadata-only commit; existing files stay put and keep reading under
the layout they were written with. Mixed-era snapshots resolve
partition columns PER FILE — from the path when the ``col=value``
segment exists, from the data stored in the file otherwise — and
listing-based pruning skips only files whose own path proves a
mismatch."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from parquet_combiner_spark.tools import txlog


def _flat_then_partitioned(spark, table):
    """Era 1: 30 flat rows (day in data). Era 2: spec=['day'], 30
    partitioned rows (day in path). Returns the expected (k, day)
    set."""
    df1 = spark.createDataFrame(
        [Row(k=i, day=i % 3, v=f"a{i}") for i in range(30)],
        "k int, day int, v string",
    )
    txlog.commit(df1, table, stats_cols=["k"])
    txlog.set_partition_spec(table, ["day"])
    df2 = spark.createDataFrame(
        [Row(k=100 + i, day=i % 3, v=f"b{i}") for i in range(30)],
        "k int, day int, v string",
    )
    txlog.commit(df2, table)
    return {(i, i % 3) for i in range(30)} | {
        (100 + i, i % 3) for i in range(30)
    }


def test_mixed_era_read_resolves_partition_values_per_file(
    spark, tmp_path
):
    table = str(tmp_path / "t")
    want = _flat_then_partitioned(spark, table)
    got = txlog.read_table(spark, table)
    assert {(r["k"], r["day"]) for r in got.collect()} == want
    # schema order preserved, column typed from the declared schema
    assert got.columns == ["k", "day", "v"]
    assert dict(got.dtypes)["day"] == "int"


def test_mixed_era_partitioned_read_prunes_new_era_only(spark, tmp_path):
    """Old-era files don't encode day in their paths → conservatively
    kept (row filter exact); new-era files prune from the LISTING."""
    table = str(tmp_path / "t")
    _flat_then_partitioned(spark, table)
    pr = txlog.read_table_partitioned(spark, table, {"day": 1})
    assert pr.count() == 20
    assert {r["day"] for r in pr.collect()} == {1}
    all_n = len(txlog.read_table(spark, table).inputFiles())
    assert 0 < len(pr.inputFiles()) < all_n


def test_spec_evolution_is_metadata_only_and_time_travels(
    spark, tmp_path
):
    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [Row(k=i, day=i % 2) for i in range(10)], "k int, day int"
    )
    txlog.commit(df, table)
    mt = {
        f: os.path.getmtime(f)
        for f in txlog._snapshot(table, None)[0]
    }
    pre = txlog.current_version(table)
    v = txlog.set_partition_spec(table, ["day"])
    assert v == pre + 1
    assert txlog.partition_by_of(table) == ["day"]
    assert all(os.path.getmtime(f) == t for f, t in mt.items())
    assert txlog._last_commit(table)["add"]  # same files re-referenced
    # no-op re-set publishes nothing
    assert txlog.set_partition_spec(table, ["day"]) == v
    # RESTORE across the boundary restores the old (flat) spec
    txlog.restore(table, pre)
    assert txlog.partition_by_of(table) == []
    assert txlog.read_table(spark, table).count() == 10


def test_appends_follow_the_active_spec_and_conflicts_raise(
    spark, tmp_path
):
    table = str(tmp_path / "t")
    _flat_then_partitioned(spark, table)
    more = spark.createDataFrame(
        [Row(k=500, day=7, v="x")], "k int, day int, v string"
    )
    with pytest.raises(ValueError, match="partitioned by"):
        txlog.commit(more, table, partition_by=["v"])
    v = txlog.commit(more, table)  # inherits ['day']
    rec = txlog._last_commit(table)
    assert all("day=7" in rel for rel in rec["add"])
    assert txlog.read_table(spark, table, v).count() == 61


def test_dml_and_optimize_across_mixed_eras(spark, tmp_path):
    table = str(tmp_path / "t")
    want = _flat_then_partitioned(spark, table)
    txlog.delete_where_expr(spark, table, "day = 2", mode="dv")
    txlog.update_where_expr(
        spark, table, "day = 0", {"v": "'z'"}, mode="dv"
    )
    got = txlog.read_table(spark, table)
    assert got.where("day = 2").count() == 0
    assert got.where("v = 'z'").count() == 20
    assert got.count() == 40
    # OPTIMIZE materializes the ACTIVE spec: afterwards every data
    # file encodes day in its path (incremental Iceberg migration)
    txlog.optimize(spark, table, target_file_mb=64)
    rec = txlog._last_commit(table)
    assert rec["add"] and all("day=" in rel for rel in rec["add"])
    got2 = txlog.read_table(spark, table)
    assert {(r["k"], r["day"]) for r in got2.collect()} == {
        (k, d) for (k, d) in want if d != 2
    }


def test_set_partition_spec_guards(spark, tmp_path):
    table = str(tmp_path / "t")
    txlog.commit(
        spark.createDataFrame([Row(k=1, day=2)], "k int, day int"),
        table,
    )
    with pytest.raises(ValueError, match="not in"):
        txlog.set_partition_spec(table, ["nope"])
    with pytest.raises(ValueError, match="duplicate"):
        txlog.set_partition_spec(table, ["day", "DAY"])
    with pytest.raises(FileNotFoundError):
        txlog.set_partition_spec(str(tmp_path / "ghost"), ["day"])
