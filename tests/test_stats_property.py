"""Zone maps as a TABLE PROPERTY (VERDICT r12 order #1): per-file
min/max statistics used to be per-call opt-in (``commit(stats_cols=
...)``) that every caller could forget — and BOTH streaming ingest
paths did forget, making streamed files invisible to every pruned
read and rendering the benign-conflict rebase inert for exactly the
streaming-sink-mid-DML race it was built for. ``set_stats_cols``
makes the column set table metadata (Delta's
``dataSkippingStatsColumns``): every write path — plain appends, DML
survivors, the ``foreachBatch`` sink, the native ``format("txtable")``
sink's ``publish_files`` — records zone maps automatically, and the
property backfills the existing snapshot from parquet footers."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from parquet_combiner_spark.streaming.txlog_sink import txlog_append_batch
from parquet_combiner_spark.tools import txlog

# the slow build-mutate-read half of the gate (see pytest.ini)
pytestmark = pytest.mark.txlifecycle


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, k=k, v=v) for i, k, v in rows],
        "id long, k long, v long",
    )


BASE = [(0, 1, 10), (1, 2, 20), (2, 8, 80), (3, 9, 90)]
DISJOINT = [(100, 500, 1), (101, 501, 2)]


def _rec(table, v):
    return json.load(open(txlog._log_path(table, v)))


def test_property_backfills_and_covers_every_write_path(spark, tmp_path):
    table = str(tmp_path / "t")
    # v0: committed with NO stats at all
    txlog.commit(_df(spark, BASE), table)
    assert "stats" not in _rec(table, 0)
    # the property lands in one commit, backfilling v0's file from
    # its parquet footer — the whole snapshot prunes immediately
    v = txlog.set_stats_cols(table, ["k"])
    assert txlog.stats_cols_of(table) == ["k"]
    rec = _rec(table, v)
    assert rec["stats_cols"] == ["k"]
    assert all("k" in e for e in rec["stats"].values())
    lo = txlog.read_table_pruned(spark, table, "k", 1000, 2000)
    assert lo.count() == 0 and lo.inputFiles() == []
    # a plain append (no stats_cols argument anywhere) records stats
    txlog.commit(_df(spark, DISJOINT), table)
    rec = _rec(table, txlog.current_version(table))
    assert rec["action"] == "append" and rec["stats_cols"] == ["k"]
    assert all("k" in e for e in rec["stats"].values())
    # ...and so does a DML's survivor rewrite
    txlog.delete_where(spark, table, "k", 8, 9)
    rec = _rec(table, txlog.current_version(table))
    assert rec["action"] == "replace"
    assert all("k" in e for e in rec["stats"].values())
    # pruned read across all eras: only the matching append's files
    # scan (base-survivor files are excluded by their zone maps)
    append_dir = _rec(table, 2)["add"][0].split("/")[1]  # v2: the append
    pr = txlog.read_table_pruned(spark, table, "k", 500, 501)
    assert pr.count() == 2
    kept = pr.inputFiles()
    assert kept and all(f"/{append_dir}/" in f for f in kept)
    assert len(kept) < len(txlog.read_table(spark, table).inputFiles())
    # the foreachBatch sink inherits the property (no stats_cols arg)
    txlog_append_batch(_df(spark, [(200, 900, 5)]), 0, table, set())
    rec = _rec(table, txlog.current_version(table))
    assert rec["meta"]["epoch"] == 0
    assert all("k" in e for e in rec["stats"].values())
    # clearing the property stops automatic stats on future writes
    txlog.set_stats_cols(table, [])
    assert txlog.stats_cols_of(table) == []
    txlog.commit(_df(spark, [(300, 901, 6)]), table)
    rec = _rec(table, txlog.current_version(table))
    assert "stats" not in rec and "stats_cols" not in rec
    with pytest.raises(ValueError, match="not in"):
        txlog.set_stats_cols(table, ["nope"])


def test_property_survives_alters_and_expiry(spark, tmp_path):
    table = str(tmp_path / "t")
    txlog.commit(_df(spark, BASE), table)
    txlog.set_stats_cols(table, ["k"])
    txlog.add_constraint(spark, table, "v_pos", "v >= 0")
    assert txlog.stats_cols_of(table) == ["k"]
    txlog.commit(_df(spark, DISJOINT), table)
    txlog.commit(_df(spark, [(201, 700, 7)]), table)
    keep = txlog.current_version(table)
    txlog.expire_versions(table, keep)
    # the rebased base record carries the property (and bloom, were
    # one set) — expiry must not silently disarm automatic stats
    assert txlog.stats_cols_of(table) == ["k"]
    txlog.commit(_df(spark, [(202, 701, 8)]), table)
    rec = _rec(table, txlog.current_version(table))
    assert all("k" in e for e in rec["stats"].values())


def test_native_sink_staged_files_record_property_stats(spark, tmp_path):
    """The native ``format("txtable")`` sink publishes through
    ``publish_files``, which had NO stats parameter at all — under
    the property, every streamed file lands with footer-derived zone
    maps and prunes from the listing immediately (no OPTIMIZE
    needed)."""
    from parquet_combiner_spark.sources.txtable_source import (
        TxTableDataSource,
    )

    spark.dataSource.register(TxTableDataSource)
    root = str(tmp_path)
    table = os.path.join(root, "sink")
    txlog.commit(
        spark.createDataFrame([Row(id=-1, k=-1)], "id long, k long"),
        table,
    )
    txlog.set_stats_cols(table, ["k"])
    src = os.path.join(root, "src")
    spark.range(60).select(
        "id", (F.col("id") % 6).alias("k")
    ).repartition(3).write.parquet(src)
    q = (
        spark.readStream.schema("id long, k long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.format("txtable")
        .option("path", table)
        .option("query_id", "t1")
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert txlog.fast_count(table) == 61
    # every streamed append carries per-file zone maps for k
    streamed = [
        r
        for r in txlog.history(table)
        if r["action"] == "append" and r.get("meta", {}).get("epoch")
        is not None
    ]
    assert streamed
    for r in streamed:
        full = _rec(table, r["version"])
        assert full["stats_cols"] == ["k"]
        assert full["add"] and all(
            "k" in full["stats"][rel] for rel in full["add"]
        )
    # ...and the streamed files prune: k ∈ [10, 20] matches nothing
    pr = txlog.read_table_pruned(spark, table, "k", 10, 20)
    assert pr.count() == 0 and pr.inputFiles() == []


def test_foreachbatch_sink_append_mid_dml_rebases(
    spark, tmp_path, monkeypatch
):
    """THE motivating workload, end to end with the REAL sink: a
    ``txlog_append_batch`` commit (no stats_cols argument — exactly
    what a user's foreachBatch lambda does) lands mid-DML on a table
    with the stats property; the DML's benign-conflict rebase PROVES
    band-disjointness against the sink's automatic zone maps and
    republishes its staged files at head+1 — zero re-executed jobs."""
    table = str(tmp_path / "t")
    txlog.commit(_df(spark, BASE), table)
    txlog.set_stats_cols(table, ["k"])

    class InjectingArbiter(txlog.CommitArbiter):
        def __init__(self):
            self.inner = txlog.FilesystemArbiter()
            self.busy = False
            self.fired = False

        def publish(self, path, payload):
            if (
                not self.fired
                and not self.busy
                and json.loads(payload).get("action") == "replace"
            ):
                self.fired = True
                self.busy = True
                try:
                    # the real sink entry point, stats-arg-free
                    txlog_append_batch(
                        _df(spark, DISJOINT), 7, table, set()
                    )
                finally:
                    self.busy = False
            self.inner.publish(path, payload)

    arb = InjectingArbiter()
    prev = txlog.set_arbiter(arb)
    try:
        v = txlog.delete_where(spark, table, "k", 1, 3)
    finally:
        txlog.set_arbiter(prev)
    assert arb.fired
    # base v0, property v1, sink append won v2, delete REBASED to v3
    assert v == 3
    data = os.path.join(table, "data")
    # zero re-execution: one data dir per data commit — base, sink
    # append, the delete's single staged write (a re-run would have
    # orphaned a fourth)
    assert len(os.listdir(data)) == 3
    got = sorted(
        map(tuple, txlog.read_table(spark, table).collect())
    )
    want = sorted(
        [(i, k, v_) for i, k, v_ in BASE if not (1 <= k <= 3)]
        + [(i, k, v_) for i, k, v_ in DISJOINT]
    )
    assert got == want
