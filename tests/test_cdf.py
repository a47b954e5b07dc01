"""Change data feed from RECORDED change files (Delta's CDF): DML
verbs called with ``cdf=True`` write (rows + ``_change_type``) files
under ``changes/`` and reference them from the commit record;
``table_changes_cdf`` then serves row-level deltas — insert /
delete / update_preimage / update_postimage, stamped
``_commit_version`` — reading O(changed rows) instead of diffing two
full snapshots. Maintenance (dataChange=false) and ALTER commits
contribute nothing; a data-changing commit without change files
refuses loudly."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from parquet_combiner_spark.tools import txlog


def _base(spark, table, n=20):
    txlog.commit(
        spark.createDataFrame(
            [Row(k=i, v=f"v{i}") for i in range(n)], "k int, v string"
        ).coalesce(1),
        table,
        stats_cols=["k"],
    )


def _feed(spark, table, after=0, to=None):
    return sorted(
        (
            r["k"],
            r["v"],
            r["_change_type"],
            r["_commit_version"],
        )
        for r in txlog.table_changes_cdf(
            spark, table, after, to
        ).collect()
    )


def test_cdf_delete_update_insert_roundtrip(spark, tmp_path):
    table = str(tmp_path / "t")
    _base(spark, table)
    txlog.delete_where_expr(spark, table, "k BETWEEN 3 AND 5", cdf=True)
    txlog.update_where_expr(
        spark, table, "k >= 18", {"v": "upper(v)"}, mode="dv", cdf=True
    )
    txlog.commit(
        spark.createDataFrame([Row(k=100, v="new")], "k int, v string"),
        table,
    )
    got = _feed(spark, table)
    assert [r for r in got if r[3] == 1] == [
        (3, "v3", "delete", 1),
        (4, "v4", "delete", 1),
        (5, "v5", "delete", 1),
    ]
    ups = [r for r in got if r[3] == 2]
    assert len(ups) == 4
    assert (18, "v18", "update_preimage", 2) in ups
    assert (18, "V18", "update_postimage", 2) in ups
    assert [r for r in got if r[3] == 3] == [(100, "new", "insert", 3)]
    # to_version bounds the feed; after_version skips the prefix
    assert len(_feed(spark, table, after=1, to=2)) == 4


def test_cdf_cow_and_dv_modes_agree(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for t in (a, b):
        _base(spark, t)
    txlog.update_where(
        spark, a, "k", 7, 9, {"v": "'x'"}, cdf=True
    )
    txlog.update_where(
        spark, b, "k", 7, 9, {"v": "'x'"}, mode="dv", cdf=True
    )
    txlog.delete_where(spark, a, "k", 0, 1, cdf=True)
    txlog.delete_where(spark, b, "k", 0, 1, mode="dv", cdf=True)
    assert _feed(spark, a) == _feed(spark, b)
    assert len(_feed(spark, a)) == 6 + 2


def test_cdf_skips_maintenance_and_alters(spark, tmp_path):
    table = str(tmp_path / "t")
    _base(spark, table)
    txlog.delete_where_expr(spark, table, "k < 2", cdf=True)
    txlog.optimize(spark, table, target_file_mb=64)  # dataChange=false
    txlog.add_constraint(spark, table, "k_pos", "k >= 0")  # ALTER
    txlog.commit(
        spark.createDataFrame([Row(k=50, v="a")], "k int, v string"),
        table,
    )
    got = _feed(spark, table)
    assert {r[2] for r in got} == {"delete", "insert"}
    assert len(got) == 3


def test_cdf_refuses_unrecorded_dml_and_real_overwrites(
    spark, tmp_path
):
    table = str(tmp_path / "t")
    _base(spark, table)
    txlog.delete_where(spark, table, "k", 0, 0)  # cdf NOT requested
    with pytest.raises(ValueError, match="cdf=True"):
        txlog.table_changes_cdf(spark, table, 0)
    # bounded reads before the gap still work
    assert _feed(spark, table, after=0, to=0) == []
    t2 = str(tmp_path / "t2")
    _base(spark, t2)
    txlog.commit(
        spark.createDataFrame([Row(k=55, v="x")], "k int, v string"),
        t2,
    )
    txlog.restore(t2, 0)  # real rollback: the file list changes
    with pytest.raises(ValueError, match="cdf=True"):
        txlog.table_changes_cdf(spark, t2, 0)
    # (a restore TO the current state would be a metadata-only
    # re-reference and is correctly skipped, not refused)


def test_cdf_under_column_mapping_and_partition_layout(spark, tmp_path):
    """Change files hold PHYSICAL names; the feed resolves them back
    through each commit's own mapping, and partitioned appends
    materialize their path values in the insert rows."""
    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [Row(k=i, day=i % 2, v=f"v{i}") for i in range(10)],
        "k int, day int, v string",
    )
    txlog.commit(df, table, partition_by=["day"], stats_cols=["k"])
    txlog.rename_column(table, "v", "val")
    txlog.update_where_expr(
        spark, table, "k = 4", {"val": "'upd'"}, mode="dv", cdf=True
    )
    txlog.commit(
        spark.createDataFrame(
            [Row(k=77, day=1, val="n")], "k int, day int, val string"
        ),
        table,
    )
    got = txlog.table_changes_cdf(spark, table, after_version=1)
    rows = sorted(
        (r["k"], r["day"], r["val"], r["_change_type"])
        for r in got.collect()
    )
    assert rows == [
        (4, 0, "upd", "update_postimage"),
        (4, 0, "v4", "update_preimage"),
        (77, 1, "n", "insert"),
    ]


def test_cdf_change_files_survive_vacuum_until_expiry(spark, tmp_path):
    table = str(tmp_path / "t")
    _base(spark, table)
    txlog.delete_where_expr(spark, table, "k < 3", cdf=True)
    rec = txlog._last_commit(table)
    assert rec["change_files"]
    ch = rec["change_files"][0]
    assert txlog.vacuum(table, min_age_seconds=0) == []  # referenced
    assert os.path.isfile(os.path.join(table, ch))
    # expiry drops the referencing record → the change file is garbage
    v = txlog.optimize(spark, table, target_file_mb=64)
    txlog.expire_versions(table, keep_from=v)
    gone = txlog.vacuum(table, min_age_seconds=0)
    assert ch in gone
    assert not os.path.exists(os.path.join(table, ch))
