"""Benign-conflict reconciliation (VERDICT r11 'What's missing' #3):
a long DML losing its commit race to a concurrent PURE APPEND that is
provably disjoint from the DML's predicate bands must REBASE its
already-staged commit onto the new head — zero extra Spark jobs —
instead of re-running the whole read-filter-write. Anything
unprovable (matching append, schema evolution, non-append commit,
missing stats) must fall back to the full re-execution, never to a
silent anomaly. Delta calls this conflict reconciliation; the
advertised concurrent pattern (streaming sink appending every few
seconds under a nightly DML) needs it to avoid starving the DML.

The appends here simulate the concurrent writer with
``commit(..., stats_cols=["k"])`` — batch appends with recorded
stats. The REAL-SINK version of the race (a stats-arg-free
``txlog_append_batch`` under the ``set_stats_cols`` table property)
is pinned end-to-end in ``test_stats_property.py``.
"""

import pytest
import json
import os

# the slow build-mutate-read half of the gate (see pytest.ini)
pytestmark = pytest.mark.txlifecycle

import pytest
from pyspark.sql import Row

from parquet_combiner_spark.tools import txlog


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, k=k, v=v) for i, k, v in rows], "id long, k long, v long"
    )


def _rows(spark, table, version=None):
    return sorted(
        map(tuple, txlog.read_table(spark, table, version).collect())
    )


def _data_dirs(table):
    d = os.path.join(table, "data")
    return sorted(os.listdir(d)) if os.path.isdir(d) else []


class InjectingArbiter(txlog.CommitArbiter):
    """Deterministically forces the publish-loss race: the first time
    a replace/dv record is published, runs ``inject()`` (which appends
    to the same table through this arbiter — the ``busy`` flag stops
    recursion) so the DML's O_EXCL create loses to a real concurrent
    commit, exactly the streaming-sink-mid-DML interleaving."""

    def __init__(self, inject, actions=("replace", "dv"), times=1):
        self.inner = txlog.FilesystemArbiter()
        self.inject = inject
        self.actions = actions
        self.remaining = times
        self.busy = False

    def publish(self, path, payload):
        if (
            self.remaining > 0
            and not self.busy
            and json.loads(payload).get("action") in self.actions
        ):
            self.remaining -= 1
            self.busy = True
            try:
                self.inject()
            finally:
                self.busy = False
        self.inner.publish(path, payload)


@pytest.fixture()
def arbiter_guard(request):
    """Restore the default arbiter after each test."""
    installed = []

    def install(arb):
        prev = txlog.set_arbiter(arb)
        installed.append(prev)
        return arb

    yield install
    for prev in reversed(installed):
        txlog.set_arbiter(prev)


BASE = [(0, 1, 10), (1, 2, 20), (2, 8, 80), (3, 9, 90)]
DISJOINT = [(100, 500, 1), (101, 501, 2)]  # k far outside any band
MATCHING = [(100, 2, 999)]  # k inside the delete band


def test_cow_delete_rebases_past_disjoint_append(
    spark, tmp_path, arbiter_guard
):
    """The headline contract: one streaming append mid-DML costs the
    DML ZERO extra Spark jobs — the staged survivors are republished
    at head+1, no orphan data directory, serializable outcome."""
    table = str(tmp_path / "t")
    txlog.commit(_df(spark, BASE), table, stats_cols=["k"])

    def inject():
        txlog.commit(_df(spark, DISJOINT), table, stats_cols=["k"])

    arbiter_guard(InjectingArbiter(inject))
    v = txlog.delete_where(spark, table, "k", 1, 3, stats_cols=["k"])
    # base=v0; delete staged at v1; injected append won v1; rebase → v2
    assert v == 2
    assert txlog.current_version(table) == 2
    # zero re-execution: exactly one data dir per commit — base,
    # injected append, the delete's single staged write. A re-run
    # would have left a fourth (orphaned) directory.
    assert len(_data_dirs(table)) == 3
    assert _rows(spark, table) == sorted(
        [r for r in BASE if not (1 <= r[1] <= 3)] + DISJOINT
    )
    rec = json.load(open(txlog._log_path(table, 2)))
    assert rec["action"] == "replace"
    assert rec["meta"]["delete"]["col"] == "k"


def test_dv_delete_rebases_past_disjoint_append(
    spark, tmp_path, arbiter_guard
):
    """Merge-on-read DELETE publishes a metadata-only dv record
    directly (not via commit()); its rebase loop must behave the
    same: positions computed against the base files stay valid
    because a pure append never touches them."""
    table = str(tmp_path / "t")
    txlog.commit(_df(spark, BASE), table, stats_cols=["k"])

    def inject():
        txlog.commit(_df(spark, DISJOINT), table, stats_cols=["k"])

    arbiter_guard(InjectingArbiter(inject))
    v = txlog.delete_where(
        spark, table, "k", 1, 3, stats_cols=["k"], mode="dv"
    )
    assert v == 2
    # dv commit adds no data dir: base + injected append only
    assert len(_data_dirs(table)) == 2
    assert _rows(spark, table) == sorted(
        [r for r in BASE if not (1 <= r[1] <= 3)] + DISJOINT
    )


def test_dv_update_rebases_past_disjoint_append(
    spark, tmp_path, arbiter_guard
):
    table = str(tmp_path / "t")
    txlog.commit(_df(spark, BASE), table, stats_cols=["k"])

    def inject():
        txlog.commit(_df(spark, DISJOINT), table, stats_cols=["k"])

    arbiter_guard(InjectingArbiter(inject))
    v = txlog.update_where(
        spark, table, "k", 1, 3, {"v": "v + 1000"},
        stats_cols=["k"], mode="dv",
    )
    assert v == 2
    # base + injected append + the update's appended-rows half
    assert len(_data_dirs(table)) == 3
    want = sorted(
        [
            (i, k, v + 1000) if 1 <= k <= 3 else (i, k, v)
            for i, k, v in BASE
        ]
        + DISJOINT
    )
    assert _rows(spark, table) == want


def test_cow_update_expr_rebases_past_disjoint_append(
    spark, tmp_path, arbiter_guard
):
    """Expression-predicate UPDATE: the Catalyst-extracted conjunct
    bands drive the disjointness proof."""
    table = str(tmp_path / "t")
    txlog.commit(_df(spark, BASE), table, stats_cols=["k"])

    def inject():
        txlog.commit(_df(spark, DISJOINT), table, stats_cols=["k"])

    arbiter_guard(InjectingArbiter(inject))
    v = txlog.update_where_expr(
        spark, table, "k BETWEEN 1 AND 3 AND id >= 0",
        {"v": "v + 1000"}, stats_cols=["k"],
    )
    assert v == 2
    assert len(_data_dirs(table)) == 3  # no orphaned re-run
    want = sorted(
        [
            (i, k, v + 1000) if 1 <= k <= 3 else (i, k, v)
            for i, k, v in BASE
        ]
        + DISJOINT
    )
    assert _rows(spark, table) == want


def test_rebase_refused_when_append_matches_band(
    spark, tmp_path, arbiter_guard
):
    """An append whose zone map INTERSECTS the delete band cannot be
    ordered after the delete — the verb must re-execute against the
    advanced snapshot, so the appended matching rows are deleted too
    (serializability by re-run, Delta's conflict-abort path)."""
    table = str(tmp_path / "t")
    txlog.commit(_df(spark, BASE), table, stats_cols=["k"])

    def inject():
        txlog.commit(_df(spark, MATCHING), table, stats_cols=["k"])

    arbiter_guard(InjectingArbiter(inject))
    v = txlog.delete_where(spark, table, "k", 1, 3, stats_cols=["k"])
    assert v == 2
    # re-execution leaves the loser's staged directory as vacuum
    # garbage: base + append + orphan + re-run = 4
    assert len(_data_dirs(table)) == 4
    # the appended k=2 row is gone: the delete logically ran LAST
    assert _rows(spark, table) == [
        r for r in BASE if not (1 <= r[1] <= 3)
    ]


def test_rebase_refused_without_stats_on_append(
    spark, tmp_path, arbiter_guard
):
    """An append with no zone maps can't prove disjointness: fall
    back to re-execution (correct either way, never silent)."""
    table = str(tmp_path / "t")
    txlog.commit(_df(spark, BASE), table, stats_cols=["k"])

    def inject():
        txlog.commit(_df(spark, DISJOINT), table)  # no stats_cols

    arbiter_guard(InjectingArbiter(inject))
    v = txlog.delete_where(spark, table, "k", 1, 3, stats_cols=["k"])
    assert v == 2
    assert len(_data_dirs(table)) == 4  # re-run, orphan left behind
    assert _rows(spark, table) == sorted(
        [r for r in BASE if not (1 <= r[1] <= 3)] + DISJOINT
    )


def test_appends_disjoint_proof_surface(spark, tmp_path):
    """Unit pins on the benign-conflict proof itself."""
    table = str(tmp_path / "t")
    txlog.commit(_df(spark, BASE), table, stats_cols=["k"])
    txlog.commit(_df(spark, DISJOINT), table, stats_cols=["k"])
    ok = txlog._appends_disjoint(table, 0, 1, {"k": (1, 3)})
    assert ok is True
    # empty bands (unextractable predicate): never provable
    assert txlog._appends_disjoint(table, 0, 1, {}) is False
    # intersecting band: the append may hold matching rows
    assert (
        txlog._appends_disjoint(table, 0, 1, {"k": (400, 600)}) is False
    )
    # an intervening REPLACE (concurrent DML): benign only when its
    # removed AND added files are band-disjoint and its write set
    # doesn't intersect the staged commit's (r13 — 'What's missing'
    # #4: two concurrent DMLs with provably disjoint bands no longer
    # pay full re-execution)
    txlog.delete_where(spark, table, "k", 500, 501, stats_cols=["k"])
    assert (
        txlog._appends_disjoint(table, 0, 2, {"k": (1, 3)}) is True
    )
    # ...but a band that REACHES the replaced files refuses
    assert (
        txlog._appends_disjoint(table, 0, 2, {"k": (400, 600)}) is False
    )
    # ...and a staged write set overlapping the replace's refuses too
    removed = txlog._read_log(table, after=1, through=2)[-1]["remove"]
    assert removed
    assert (
        txlog._appends_disjoint(
            table, 0, 2, {"k": (1, 3)}, frozenset(removed[:1])
        )
        is False
    )
    # schema evolution mid-range: a rebased record would narrow it
    txlog.commit(
        spark.createDataFrame(
            [Row(id=200, k=600, v=1, extra=7)],
            "id long, k long, v long, extra long",
        ),
        table,
        merge_schema=True,
        stats_cols=["k"],
    )
    head = txlog.current_version(table)
    assert (
        txlog._appends_disjoint(table, 2, head, {"k": (1, 3)}) is False
    )


def test_commit_early_staleness_rebases(spark, tmp_path):
    """The OTHER conflict path: the table advanced between the verb's
    snapshot read and commit() (staleness detected BEFORE the data
    write). With rebase_bands and a provably-benign gap the commit
    re-targets head+1 instead of raising."""
    table = str(tmp_path / "t")
    txlog.commit(_df(spark, BASE), table, stats_cols=["k"])
    txlog.commit(_df(spark, DISJOINT), table, stats_cols=["k"])  # v1
    add = _df(spark, [(300, 700, 3)])
    with pytest.raises(txlog.CommitConflict):
        txlog.commit(add, table, expected_version=0, stats_cols=["k"])
    v = txlog.commit(
        add,
        table,
        expected_version=0,
        stats_cols=["k"],
        rebase_bands={"k": (1, 3)},
    )
    assert v == 2
    assert txlog.current_version(table) == 2


def test_rebased_dml_rides_cdf_and_time_travel(
    spark, tmp_path, arbiter_guard
):
    """A rebased cdf=True DELETE keeps its recorded change files
    (written before the publish; still exactly the deleted rows) and
    every version — including the injected append's — time-travels."""
    from pyspark.sql import functions as F

    table = str(tmp_path / "t")
    txlog.commit(_df(spark, BASE), table, stats_cols=["k"])

    def inject():
        txlog.commit(_df(spark, DISJOINT), table, stats_cols=["k"])

    arbiter_guard(InjectingArbiter(inject))
    txlog.delete_where(spark, table, "k", 1, 3, stats_cols=["k"], cdf=True)
    feed = txlog.table_changes_cdf(spark, table, after_version=0)
    deleted = sorted(
        (r["id"], r["k"], r["v"])
        for r in feed.where(F.col("_change_type") == "delete").collect()
    )
    assert deleted == [r for r in BASE if 1 <= r[1] <= 3]
    # the feed also carries the injected append as inserts at v1
    ins = feed.where(
        (F.col("_change_type") == "insert")
        & (F.col("_commit_version") == 1)
    ).count()
    assert ins == len(DISJOINT)
    assert _rows(spark, table, 0) == sorted(BASE)
    assert _rows(spark, table, 1) == sorted(BASE + DISJOINT)


@pytest.mark.parametrize("arb_kind", ["fs", "condput", "lease"])
def test_fuzz_dml_under_concurrent_appender(
    spark, tmp_path, arbiter_guard, arb_kind
):
    """Model fuzz arm (VERDICT r11 order #5): random DML verbs racing
    a concurrent appender that fires inside the publish window. Every
    injected append is band-disjoint (k >= 500 vs bands < 200), so
    rebases and re-runs must BOTH converge to the same model state at
    every step. Parametrized over the commit arbiters: the rebase
    loop's loss-then-republish must behave identically under POSIX
    O_EXCL, S3-style conditional PUT, and the lock-lease claim
    table."""
    import random

    rng = random.Random(7)
    table = str(tmp_path / "t")
    model = [(i, rng.randrange(100), rng.randrange(1000)) for i in range(30)]
    txlog.commit(_df(spark, model), table, stats_cols=["k"])
    next_id = 1000

    def inject():
        nonlocal next_id, model
        rows = [(next_id, 500 + rng.randrange(50), rng.randrange(9))]
        next_id += 1
        txlog.commit(_df(spark, rows), table, stats_cols=["k"])
        model = model + rows

    arb = arbiter_guard(InjectingArbiter(inject, times=0))
    if arb_kind != "fs":
        from parquet_combiner_spark.tools import object_store as obs

        store = obs.MockObjectStore()
        arb.inner = (
            obs.ConditionalPutArbiter(store)
            if arb_kind == "condput"
            else obs.LockLeaseArbiter(store, obs.LeaseLockService())
        )
    for step in range(8):
        # 0–2 appender firings inside this verb's publish window (a
        # real sink has a cadence; an appender that races EVERY
        # publish attempt forever is the give-up-after-20 path)
        arb.remaining = rng.choice([0, 1, 1, 2])
        lo = rng.randrange(90)
        hi = lo + rng.randrange(1, 25)
        mode = rng.choice(["cow", "dv"])
        op = rng.choice(["delete", "update", "expr_delete"])
        if op == "delete":
            txlog.delete_where(
                spark, table, "k", lo, hi, stats_cols=["k"], mode=mode
            )
            model = [r for r in model if not (lo <= r[1] <= hi)]
        elif op == "update":
            txlog.update_where(
                spark, table, "k", lo, hi, {"v": "v + 1000"},
                stats_cols=["k"], mode=mode,
            )
            model = [
                (i, k, v + 1000) if lo <= k <= hi else (i, k, v)
                for i, k, v in model
            ]
        else:
            txlog.delete_where_expr(
                spark, table, f"k BETWEEN {lo} AND {hi} AND id % 2 = 0",
                stats_cols=["k"], mode=mode,
            )
            model = [
                r
                for r in model
                if not (lo <= r[1] <= hi and r[0] % 2 == 0)
            ]
        assert _rows(spark, table) == sorted(model), f"step {step} diverged"
    # the appender really fired: the log holds more commits than verbs
    assert txlog.current_version(table) > 8


def test_compaction_rebases_past_any_append(
    spark, tmp_path, arbiter_guard
):
    """compact_small_files is ROW-PRESERVING: it rebases past a
    concurrent append even when the appended rows would have been in
    its scope (they just wait for the next cadence) — the streaming
    sink appending every few seconds must not starve its own
    compaction into N re-packs."""
    table = str(tmp_path / "t")
    # several small files → compactable
    for i in range(3):
        txlog.commit(
            _df(spark, [(10 * i + j, j, j) for j in range(3)]), table
        )

    def inject():
        txlog.commit(_df(spark, [(900, 1, 1)]), table)  # tiny, in-scope

    arbiter_guard(InjectingArbiter(inject))
    v = txlog.compact_small_files(
        spark, table, target_file_mb=1, small_file_mb=0.5
    )
    head = txlog.current_version(table)
    assert v == head  # the compaction IS the head: rebased, not lost
    rec = json.load(open(txlog._log_path(table, head)))
    assert rec["action"] == "replace"
    assert rec.get("data_change") is False
    # every row present exactly once: 9 originals + the injected one
    rows = _rows(spark, table)
    assert len(rows) == 10 and (900, 1, 1) in rows
    # data dirs: 3 bases + 1 injected append + 1 staged compaction —
    # no orphaned re-pack directory
    assert len(_data_dirs(table)) == 5


def test_scoped_optimize_rebases_past_matching_append(
    spark, tmp_path, arbiter_guard
):
    """Scoped OPTIMIZE uses the row-preserving proof: an append whose
    rows MATCH the scope band still rebases (nothing those appends
    hold is changed by the rewrite)."""
    table = str(tmp_path / "t")
    txlog.commit(_df(spark, BASE), table, stats_cols=["k"])

    def inject():
        txlog.commit(_df(spark, MATCHING), table, stats_cols=["k"])

    arbiter_guard(InjectingArbiter(inject))
    v = txlog.optimize(
        spark, table, target_file_mb=64, where=("k", 0, 10),
        stats_cols=["k"],
    )
    assert v == txlog.current_version(table)
    rows = _rows(spark, table)
    assert len(rows) == len(BASE) + len(MATCHING)
    assert len(_data_dirs(table)) == 3  # base + append + one rewrite


def test_merge_into_rebases_past_key_disjoint_append(
    spark, tmp_path, arbiter_guard
):
    """MERGE INTO rebases when the concurrent append's files are
    provably outside the batch's key band: no appended row can be a
    match base OR collide with an inserted key (every batch key lies
    inside [lo, hi] on prune_col)."""
    table = str(tmp_path / "t")
    base = spark.createDataFrame(
        [Row(k=i, ver=1, v=f"a{i}") for i in range(10)],
        "k long, ver int, v string",
    )
    txlog.commit(base, table, stats_cols=["k"])

    def inject():
        txlog.commit(
            spark.createDataFrame(
                [Row(k=500, ver=1, v="late")],
                "k long, ver int, v string",
            ),
            table,
            stats_cols=["k"],
        )

    arbiter_guard(InjectingArbiter(inject))
    batch = spark.createDataFrame(
        [Row(k=3, ver=2, v="upd"), Row(k=20, ver=1, v="ins")],
        "k long, ver int, v string",
    )
    v = txlog.merge_into(
        spark, table, batch, keys=["k"], version_cols=["ver"],
        stats_cols=["k"],
    )
    assert v == 2  # staged at 1, lost to the append, rebased to 2
    # base + injected append + ONE staged merge write (no re-merge)
    assert len(_data_dirs(table)) == 3
    rows = {(r["k"], r["v"]) for r in txlog.read_table(spark, table).collect()}
    assert (3, "upd") in rows and (20, "ins") in rows
    assert (500, "late") in rows
    assert len(rows) == 12


def test_merge_into_rerun_when_append_keys_overlap(
    spark, tmp_path, arbiter_guard
):
    """An append INSIDE the batch's key band forces the re-merge: the
    appended row must participate in latest-wins, not ride past it."""
    table = str(tmp_path / "t")
    txlog.commit(
        spark.createDataFrame(
            [Row(k=i, ver=1, v=f"a{i}") for i in range(10)],
            "k long, ver int, v string",
        ),
        table,
        stats_cols=["k"],
    )

    def inject():
        txlog.commit(
            spark.createDataFrame(
                [Row(k=3, ver=3, v="newer")],
                "k long, ver int, v string",
            ),
            table,
            stats_cols=["k"],
        )

    arbiter_guard(InjectingArbiter(inject))
    batch = spark.createDataFrame(
        [Row(k=3, ver=2, v="upd")], "k long, ver int, v string"
    )
    txlog.merge_into(
        spark, table, batch, keys=["k"], version_cols=["ver"],
        stats_cols=["k"],
    )
    rows = {(r["k"], r["v"]) for r in txlog.read_table(spark, table).collect()}
    # latest-wins saw BOTH: the appended ver=3 row beats the batch's
    # ver=2 — a rebase here would have produced (3, 'upd') + a
    # duplicate key
    assert (3, "newer") in rows and (3, "upd") not in rows
    assert len([k for k, _ in rows if k == 3]) == 1


def test_row_preserving_sentinel_compares_by_equality(spark, tmp_path):
    """ADVICE r12 (low): the documented sentinel VALUE
    ('row-preserving', e.g. round-tripped through config) must behave
    like the module constant, and a malformed rebase_bands must fail
    loudly in commit() BEFORE any data file is written."""
    table = str(tmp_path / "t")
    txlog.commit(_df(spark, BASE), table, stats_cols=["k"])
    txlog.commit(_df(spark, DISJOINT), table, stats_cols=["k"])
    # a fresh, equal-but-not-identical string: same verdict as the
    # constant (True past a pure append, no band proof needed)
    sentinel = "row-" + "preserving"
    assert sentinel is not txlog.ROW_PRESERVING or True
    assert txlog._appends_disjoint(table, 0, 1, sentinel) is True
    # malformed values refuse instead of raising mid-publish
    assert txlog._appends_disjoint(table, 0, 1, "bogus") is False
    assert txlog._appends_disjoint(table, 0, 1, ["k"]) is False
    with pytest.raises(ValueError, match="rebase_bands"):
        txlog.commit(
            _df(spark, [(900, 900, 1)]),
            table,
            expected_version=0,
            rebase_bands="bogus",
        )


def test_cow_delete_rebases_past_band_disjoint_dml(
    spark, tmp_path, arbiter_guard
):
    """Two concurrent DMLs with provably disjoint bands (r13, VERDICT
    r12 'What's missing' #4): the loser's staged replace rebases past
    the winner's replace instead of re-executing — the winner removed
    files the loser never touched, whose rows its band can't reach."""
    table = str(tmp_path / "t")
    txlog.commit(_df(spark, BASE), table, stats_cols=["k"])
    txlog.commit(_df(spark, DISJOINT), table, stats_cols=["k"])

    def inject():
        # a REAL concurrent DML on the far band
        txlog.delete_where(spark, table, "k", 500, 500, stats_cols=["k"])

    arbiter_guard(InjectingArbiter(inject))
    v = txlog.delete_where(spark, table, "k", 1, 3, stats_cols=["k"])
    # base v0, appends v1, winner's delete v2, loser REBASED to v3
    assert v == 3
    # zero re-execution: base + append + winner's rewrite + loser's
    # single staged rewrite = 4 data dirs
    assert len(_data_dirs(table)) == 4
    assert _rows(spark, table) == sorted(
        [r for r in BASE if not (1 <= r[1] <= 3)]
        + [r for r in DISJOINT if r[1] != 500]
    )


def test_dml_rebases_past_dv_only_commit(
    spark, tmp_path, arbiter_guard
):
    """A DV-only commit on band-disjoint files (merge-on-read DELETE
    racing a cow DML) is benign: the vectors ride files the staged
    replace never touches, and the rebased snapshot keeps both."""
    table = str(tmp_path / "t")
    txlog.commit(_df(spark, BASE), table, stats_cols=["k"])
    txlog.commit(_df(spark, DISJOINT), table, stats_cols=["k"])

    def inject():
        txlog.delete_where(
            spark, table, "k", 501, 501, stats_cols=["k"], mode="dv"
        )

    arbiter_guard(InjectingArbiter(inject))
    v = txlog.delete_where(spark, table, "k", 1, 3, stats_cols=["k"])
    assert v == 3
    # the dv commit added no data dir: base + append + loser's rewrite
    assert len(_data_dirs(table)) == 3
    assert _rows(spark, table) == sorted(
        [r for r in BASE if not (1 <= r[1] <= 3)]
        + [r for r in DISJOINT if r[1] != 501]
    )
    # ...but a DV whose vectors ride the files the staged DML removes
    # refuses (the staged survivors would resurrect deleted rows)
    def inject2():
        txlog.delete_where(
            spark, table, "k", 8, 8, stats_cols=["k"], mode="dv"
        )

    arbiter_guard(InjectingArbiter(inject2))
    n_dirs = len(_data_dirs(table))
    v2 = txlog.delete_where(spark, table, "k", 8, 9, stats_cols=["k"])
    # refusal → full re-execution (one orphaned staged dir) at v+2
    assert v2 == v + 2
    assert len(_data_dirs(table)) == n_dirs + 2
    assert _rows(spark, table) == sorted(
        [r for r in BASE if not (1 <= r[1] <= 3) and not (8 <= r[1] <= 9)]
        + [r for r in DISJOINT if r[1] != 501]
    )


def test_rebase_refuses_property_change_mid_race(
    spark, tmp_path, arbiter_guard
):
    """ADVICE r12 (low): a concurrent pure append that ALSO changes a
    table property (bloom_cols) must refuse the rebase — the staged
    record carries its base's properties verbatim and would silently
    revert the change at the new head."""
    table = str(tmp_path / "t")
    txlog.commit(_df(spark, BASE), table, stats_cols=["k"])

    def inject():
        txlog.commit(
            _df(spark, DISJOINT),
            table,
            stats_cols=["k"],
            bloom_cols={"id": 1000},
        )

    arbiter_guard(InjectingArbiter(inject))
    v = txlog.delete_where(spark, table, "k", 1, 3, stats_cols=["k"])
    # refusal → re-execution: head v1 (append), delete lands at v2
    # with an orphaned first attempt
    assert v == 2
    assert len(_data_dirs(table)) == 4
    # the property survives at the head
    assert txlog.bloom_cols_of(table) == {"id": 1000}
    assert _rows(spark, table) == sorted(
        [r for r in BASE if not (1 <= r[1] <= 3)] + DISJOINT
    )


@pytest.mark.parametrize("arb_kind", ["fs", "condput"])
def test_fuzz_dml_under_concurrent_dml_writer(
    spark, tmp_path, arbiter_guard, arb_kind
):
    """r13 fuzz arm (VERDICT r12 order #5): a second DML WRITER — cow
    and dv deletes on the disjoint high band — fires inside the
    primary verb's publish window. Band-disjoint replaces and DV-only
    commits now REBASE; anything unprovable re-runs; both paths must
    converge to the same model state at every step, under the POSIX
    and conditional-PUT arbiters alike."""
    import random

    rng = random.Random(13)
    table = str(tmp_path / "t")
    low = [(i, rng.randrange(100), rng.randrange(1000)) for i in range(30)]
    high = [
        (500 + i, 500 + rng.randrange(100), rng.randrange(1000))
        for i in range(20)
    ]
    # two commits so the low/high bands live in disjoint FILES —
    # mixed files would (correctly) refuse every rebase and this fuzz
    # would only ever exercise the re-run path
    txlog.commit(_df(spark, low), table, stats_cols=["k"])
    txlog.commit(_df(spark, high), table, stats_cols=["k"])
    model = low + high

    def inject():
        nonlocal model
        lo = 500 + rng.randrange(90)
        hi = lo + rng.randrange(1, 8)
        mode = rng.choice(["cow", "dv"])
        txlog.delete_where(
            spark, table, "k", lo, hi, stats_cols=["k"], mode=mode
        )
        model = [r for r in model if not (lo <= r[1] <= hi)]

    arb = arbiter_guard(InjectingArbiter(inject, times=0))
    if arb_kind == "condput":
        from parquet_combiner_spark.tools import object_store as obs

        arb.inner = obs.ConditionalPutArbiter(obs.MockObjectStore())
    for step in range(6):
        arb.remaining = rng.choice([0, 1, 1, 2])
        lo = rng.randrange(90)
        hi = lo + rng.randrange(1, 25)
        mode = rng.choice(["cow", "dv"])
        if rng.random() < 0.5:
            txlog.delete_where(
                spark, table, "k", lo, hi, stats_cols=["k"], mode=mode
            )
            model = [r for r in model if not (lo <= r[1] <= hi)]
        else:
            txlog.update_where(
                spark, table, "k", lo, hi, {"v": "v + 1000"},
                stats_cols=["k"], mode=mode,
            )
            model = [
                (i, k, v + 1000) if lo <= k <= hi else (i, k, v)
                for i, k, v in model
            ]
        assert _rows(spark, table) == sorted(model), f"step {step} diverged"
