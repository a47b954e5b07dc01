"""Auto-checkpoint cadence as a TABLE PROPERTY (VERDICT r13 'Next
round' #5 — Delta's ``checkpointInterval``): once
``set_checkpoint_interval(table, N)`` lands, EVERY write path that
mints a version (appends, DML replaces, merge-on-read DV commits)
writes a checkpoint at each multiple of N, so a long-lived table
whose operator never calls ``checkpoint()`` still resolves snapshots
in O(N) JSON reads instead of O(lifetime). Also pins the property
carriage fixes that rode along: ``clone`` and ``restore`` used to
silently drop the write-side properties (bloom_cols / stats_cols /
checkpoint_interval)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import Row

from parquet_combiner_spark.tools import txlog

pytestmark = pytest.mark.txlifecycle


def _mk(spark, path, n0=0, n1=50):
    df = spark.createDataFrame(
        [Row(k=i, v=i * 2) for i in range(n0, n1)], "k long, v long"
    )
    return df


def _ckpt_versions(table):
    d = txlog._ckpt_dir(table)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f.split(".")[0])
        for f in os.listdir(d)
        if f.endswith(".json")
    )


def test_auto_checkpoint_every_n_commits(spark, tmp_path):
    table = str(tmp_path / "t")
    txlog.commit(_mk(spark, table), table)  # v0
    v = txlog.set_checkpoint_interval(table, 5)  # v1
    assert txlog.checkpoint_interval_of(table) == 5
    for i in range(2, 13):  # v2..v12, no checkpoint verb anywhere
        txlog.commit(
            _mk(spark, table, 100 * i, 100 * i + 10), table
        )
    assert _ckpt_versions(table) == [5, 10]
    # snapshot resolution seeds from the newest checkpoint: the
    # replay suffix is bounded by the cadence
    ck = txlog._checkpoint_at_or_below(table, 12)
    assert ck is not None and ck["version"] == 10
    # and the checkpoint-seeded state is EXACT
    assert txlog.read_table(spark, table).count() == 50 + 11 * 10
    assert txlog.fast_count(table) == 50 + 11 * 10
    # the property survived eleven argless appends
    assert txlog.checkpoint_interval_of(table) == 5
    assert v == 1


def test_auto_checkpoint_rides_dml_and_dv_paths(spark, tmp_path):
    table = str(tmp_path / "t")
    txlog.commit(_mk(spark, table), table, stats_cols=["k"])  # v0
    txlog.set_checkpoint_interval(table, 2)  # v1
    txlog.delete_where(spark, table, "k", 0, 4)  # v2 (cow replace)
    txlog.delete_where(spark, table, "k", 5, 7, mode="dv")  # v3 (dv)
    txlog.delete_where_expr(spark, table, "k IN (8, 9)")  # v4
    assert _ckpt_versions(table) == [2, 4]
    got = txlog.read_table(spark, table)
    assert got.count() == 40
    assert got.where("k < 10").count() == 0


def test_clear_interval_stops_auto_checkpoints(spark, tmp_path):
    table = str(tmp_path / "t")
    txlog.commit(_mk(spark, table), table)  # v0
    txlog.set_checkpoint_interval(table, 2)  # v1
    txlog.commit(_mk(spark, table, 50, 60), table)  # v2 → ckpt
    assert _ckpt_versions(table) == [2]
    txlog.set_checkpoint_interval(table, 0)  # v3: clear
    assert txlog.checkpoint_interval_of(table) == 0
    for i in range(4):  # v4..v7: no new checkpoints
        txlog.commit(_mk(spark, table, 70 + i, 71 + i), table)
    assert _ckpt_versions(table) == [2]
    with pytest.raises(ValueError):
        txlog.set_checkpoint_interval(table, -3)


def test_cli_set_checkpoint_interval(spark, tmp_path, capsys):
    table = str(tmp_path / "t")
    txlog.commit(_mk(spark, table), table)
    assert txlog.main([table, "--set-checkpoint-interval", "3"]) == 0
    out = capsys.readouterr().out
    assert "checkpoint interval -> 3" in out
    assert "version:" not in out  # the verb IS the action
    assert txlog.checkpoint_interval_of(table) == 3
    for i in range(2):  # v2, v3 → ckpt at 3
        txlog.commit(_mk(spark, table, 50 + i, 51 + i), table)
    assert _ckpt_versions(table) == [3]


def test_clone_carries_write_side_properties(spark, tmp_path):
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    txlog.commit(
        _mk(spark, src), src,
        stats_cols=["k"], bloom_cols={"k": 1000},
    )
    txlog.set_stats_cols(src, ["k"])
    txlog.set_checkpoint_interval(src, 7)
    txlog.clone(src, tgt)
    assert txlog.bloom_cols_of(tgt) == {"k": 1000}
    assert txlog.stats_cols_of(tgt) == ["k"]
    assert txlog.checkpoint_interval_of(tgt) == 7
    # ...and the clone's own appends honor them (stats recorded)
    txlog.commit(_mk(spark, tgt, 50, 60), tgt)
    rec = txlog._last_commit(tgt)
    assert all(
        "k" in rec["stats"].get(r, {}) for r in rec["add"]
    )


def test_restore_preserves_write_side_properties(spark, tmp_path):
    table = str(tmp_path / "t")
    txlog.commit(_mk(spark, table), table)  # v0: property-less era
    txlog.commit(_mk(spark, table, 50, 60), table)  # v1
    txlog.set_stats_cols(table, ["k"])  # v2
    txlog.set_checkpoint_interval(table, 9)  # v3
    txlog.restore(table, 0)  # data rewound to v0...
    assert txlog.read_table(spark, table).count() == 50
    # ...but write-side properties are PRESERVED, not rewound
    assert txlog.stats_cols_of(table) == ["k"]
    assert txlog.checkpoint_interval_of(table) == 9
