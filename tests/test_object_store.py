"""Object-store commit arbitration (VERDICT r10 order #4): the mock
store's plain PUT is honestly last-writer-wins (no O_EXCL to lean
on), and each arbiter — conditional PUT, DynamoDB-style lock lease —
must still produce exactly one winner per commit key under a real
thread race. The full model-based fuzz also runs under both arbiters
(tests/test_tools.py::test_txlog_randomized_model_parity)."""

from __future__ import annotations

import threading
import time

import pytest

from parquet_combiner_spark.tools import txlog
from parquet_combiner_spark.tools.object_store import (
    ConditionalPutArbiter,
    LeaseLockService,
    LockLeaseArbiter,
    MockObjectStore,
    PreconditionFailed,
)

# the slow build-mutate-read half of the gate (see pytest.ini)
pytestmark = pytest.mark.txlifecycle


def _race(arbiter_of, path, n=8):
    """n threads publish distinct payloads to one key through their
    own arbiter instance; returns (winners, conflicts)."""
    results: list[str] = [""] * n
    barrier = threading.Barrier(n)

    def run(i):
        arb = arbiter_of()
        barrier.wait()
        try:
            arb.publish(path, f"payload-{i}")
            results[i] = "won"
        except txlog.CommitConflict:
            results[i] = "conflict"

    threads = [threading.Thread(target=run, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return results.count("won"), results.count("conflict")


def test_plain_put_is_last_writer_wins(tmp_path):
    """The mock is honest about object-store semantics: without the
    precondition, BOTH writers succeed and the later one silently
    wins — the exact failure mode that makes O_EXCL-style arbitration
    unsound on S3 and the arbiters necessary."""
    store = MockObjectStore()
    key = str(tmp_path / "00000000.json")
    store.put(key, "first")
    store.put(key, "second")  # no error — and first is gone
    assert open(key).read() == "second"
    with pytest.raises(PreconditionFailed):
        store.put(key, "third", if_none_match=True)


def test_conditional_put_exactly_one_winner(tmp_path):
    store = MockObjectStore()
    key = str(tmp_path / "00000001.json")
    won, lost = _race(lambda: ConditionalPutArbiter(store), key)
    assert (won, lost) == (1, 7)
    assert open(key).read().startswith("payload-")


def test_lock_lease_exactly_one_winner(tmp_path):
    store = MockObjectStore()
    locks = LeaseLockService()
    key = str(tmp_path / "00000002.json")
    won, lost = _race(lambda: LockLeaseArbiter(store, locks), key)
    assert (won, lost) == (1, 7)
    assert open(key).read().startswith("payload-")


def test_lock_lease_rechecks_record_inside_lease(tmp_path):
    """A previous holder may have published and crashed before this
    writer looked: the record existing under a freshly-acquired lease
    is a conflict, never an overwrite."""
    store = MockObjectStore()
    locks = LeaseLockService()
    key = str(tmp_path / "00000003.json")
    store.put(key, "published-by-crashed-holder")
    with pytest.raises(txlog.CommitConflict, match="under the lease"):
        LockLeaseArbiter(store, locks).publish(key, "mine")
    assert open(key).read() == "published-by-crashed-holder"


def test_lease_expiry_allows_takeover():
    locks = LeaseLockService()
    assert locks.acquire("k", "owner-a", ttl=0.05)
    assert not locks.acquire("k", "owner-b", ttl=0.05)  # held
    assert locks.acquire("k", "owner-a", ttl=0.05)  # re-entrant renew
    time.sleep(0.08)
    assert locks.acquire("k", "owner-b", ttl=10.0)  # expired → taken
    locks.release("k", "owner-a")  # stale owner cannot release b's
    assert not locks.acquire("k", "owner-c", ttl=1.0)


def test_commit_round_trip_under_conditional_put(spark, tmp_path):
    """End-to-end: a table whose every publish goes through the
    conditional-PUT arbiter behaves identically — append, DML,
    read-back — and a stale pinned commit still surfaces as
    CommitConflict."""
    from pyspark.sql import Row

    store = MockObjectStore()
    prev = txlog.set_arbiter(ConditionalPutArbiter(store))
    try:
        table = str(tmp_path / "t")
        txlog.commit(
            spark.createDataFrame(
                [Row(k=i, v=i * 10) for i in range(20)], "k int, v int"
            ),
            table,
            stats_cols=["k"],
        )
        txlog.delete_where_expr(spark, table, "k >= 15", mode="dv")
        assert txlog.read_table(spark, table).count() == 15
        base = txlog.current_version(table)
        txlog.commit(
            spark.createDataFrame([Row(k=99, v=0)], "k int, v int"),
            table,
        )
        with pytest.raises(txlog.CommitConflict):
            txlog.commit(
                spark.createDataFrame([Row(k=98, v=0)], "k int, v int"),
                table,
                expected_version=base,
            )
        # 3 publishes (commit, dv delete, append); the stale commit
        # conflicts on the head check before ever reaching the store
        assert store.conditional_puts == 3
    finally:
        txlog.set_arbiter(prev)


def test_lease_expiry_never_loses_a_published_commit(tmp_path):
    """The ADVICE r11 scenario: writer A claims the key then STALLS
    past its TTL (GC pause); writer B recovers. A's already-staged
    commit must be the one published — and A's late, unconditional
    PUT must rewrite identical bytes, never replace a competing
    writer's record. B loses with CommitConflict."""
    store = MockObjectStore()
    locks = LeaseLockService()
    key = str(tmp_path / "00000005.json")
    a = LockLeaseArbiter(store, locks, ttl=0.05)
    b = LockLeaseArbiter(store, locks, ttl=0.05)
    # A runs steps 1-2 (stage + claim) then stalls
    a_tmp = f"{key}.staged-{a._owner}"
    store.put(a_tmp, "payload-A")
    assert locks.claim(key, a._owner, a_tmp, a.ttl) == ("won", None)
    time.sleep(0.08)  # A's lease lapses mid-publish
    # B arrives: must RECOVER A's commit, not publish its own
    with pytest.raises(txlog.CommitConflict, match="recovered"):
        b.publish(key, "payload-B")
    assert open(key).read() == "payload-A"
    # A wakes up and finishes: same bytes, reported as SUCCESS
    # (its commit DID win — a conflict would make its caller retry
    # and double-apply)
    a._finish(key, "payload-A")
    assert open(key).read() == "payload-A"
    # the version is settled: any later writer conflicts
    c = LockLeaseArbiter(store, locks, ttl=10.0)
    with pytest.raises(txlog.CommitConflict, match="complete"):
        c.publish(key, "payload-C")


def test_lease_takeover_when_staged_payload_vanished(tmp_path):
    """If the expired claimant's staged payload is gone (vacuumed),
    the key must not livelock: the next writer CAS-steals the claim
    and publishes its own commit."""
    store = MockObjectStore()
    locks = LeaseLockService()
    key = str(tmp_path / "00000006.json")
    ghost_tmp = f"{key}.staged-ghost"
    assert locks.claim(key, "ghost", ghost_tmp, 0.01) == ("won", None)
    time.sleep(0.03)
    b = LockLeaseArbiter(store, locks, ttl=10.0)
    b.publish(key, "payload-B")  # steals, publishes, succeeds
    assert open(key).read() == "payload-B"
