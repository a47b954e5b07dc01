"""Object-store commit arbitration for the transaction log (VERDICT
r10 order #4): at 100 TB the log lives on S3/GCS/Azure, where POSIX
``O_CREAT|O_EXCL`` — the default :class:`~parquet_combiner_spark.
tools.txlog.FilesystemArbiter`'s primitive — does not exist. This
module supplies the two portable arbitration strategies real
lakehouses use, over a local MOCK with honest object-store semantics
(plain PUT is last-writer-wins replace, never exclusive), so the
whole optimistic-concurrency layer can be exercised and fuzzed
against object-store rules without a cloud dependency:

* :class:`ConditionalPutArbiter` — ``PUT If-None-Match: *`` (S3
  since Nov 2024, ``x-goog-if-generation-match: 0`` on GCS,
  ``If-None-Match: *`` on Azure Blob): the store itself rejects the
  second writer of a key. One round-trip, no external service —
  Delta 3.x's "coordinated commits"-free S3 path and Iceberg's GCS
  commit both reduce to exactly this call.
* :class:`LockLeaseArbiter` — the DynamoDB lock-table recipe
  (Delta's original ``S3DynamoDBLogStore``): acquire a short lease on
  the commit key, check the record absent, plain PUT, release. The
  lease TTL bounds the damage of a crashed holder; correctness never
  depends on the TTL (a lease-holder that lost the race re-checks
  existence INSIDE the lease).

The arbiter interface is the ONLY txlog seam that touches
atomicity — data files are written before ``publish`` and losers
leave unreferenced garbage for ``vacuum`` — so swapping these in
(via ``txlog.set_arbiter`` or per-call ``commit(arbiter=...)``)
ports the whole table layer to object stores unchanged."""

from __future__ import annotations

import os
import threading
import time
import uuid

from parquet_combiner_spark.tools.txlog import CommitArbiter, CommitConflict


class PreconditionFailed(Exception):
    """The conditional PUT's precondition (object must not exist) was
    not met — the object-store analogue of HTTP 412."""


class MockObjectStore:
    """A local object store with S3-class semantics, used to test the
    arbiters against the rules a real store enforces:

    * ``put`` is a FULL-OBJECT, last-writer-wins replace — readers
      never see a partial object (temp file + ``os.replace``), but
      two unconditional writers both "succeed" and the later one
      silently wins. This is exactly why O_EXCL-style arbitration
      cannot be assumed and the default arbiter is wrong on S3.
    * ``put(..., if_none_match=True)`` is the conditional create:
      atomically fails with :class:`PreconditionFailed` when the key
      already exists. Server-side atomicity of the check-and-create
      is emulated with one store-wide mutex (the store plays the
      single service S3 is).

    Keys are paths (absolute or store-relative); the objects
    materialize as real files so every txlog READER — ``_read_log``,
    checkpoints, version listings — works on the "store" unchanged,
    which is what lets the full model-based fuzz run under the
    object-store arbiters."""

    def __init__(self) -> None:
        self._mutex = threading.Lock()
        self.puts = 0
        self.conditional_puts = 0

    def exists(self, key: str) -> bool:
        return os.path.exists(key)

    def put(self, key: str, body: str, if_none_match: bool = False) -> None:
        os.makedirs(os.path.dirname(key), exist_ok=True)
        tmp = f"{key}.put-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(body)
        if not if_none_match:
            self.puts += 1
            os.replace(tmp, key)  # last-writer-wins, by design
            return
        with self._mutex:
            self.conditional_puts += 1
            if os.path.exists(key):
                os.remove(tmp)
                raise PreconditionFailed(key)
            os.replace(tmp, key)


class ConditionalPutArbiter(CommitArbiter):
    """Commit arbitration by conditional PUT: one store round-trip,
    the service arbitrates. Production mapping: S3
    ``PutObject`` + ``If-None-Match: *`` (409/412 → conflict), GCS
    ``ifGenerationMatch=0``, Azure ``If-None-Match: *``."""

    def __init__(self, store: MockObjectStore) -> None:
        self.store = store

    def publish(self, path: str, payload: str) -> None:
        try:
            self.store.put(path, payload, if_none_match=True)
        except PreconditionFailed as e:
            raise CommitConflict(
                f"commit record {path} was published concurrently "
                "(conditional PUT precondition failed)"
            ) from e


class LeaseLockService:
    """An in-process DynamoDB-style lock table: ``acquire`` succeeds
    iff no UNEXPIRED lease exists for the key (a crashed holder's
    lease simply times out); ``release`` is owner-checked. Production
    mapping: one DynamoDB item per commit key with a conditional
    ``PutItem`` (attribute_not_exists(key) OR lease_until < :now) and
    TTL cleanup — Delta's ``S3DynamoDBLogStore`` table."""

    def __init__(self) -> None:
        self._mutex = threading.Lock()
        self._leases: dict[str, tuple[str, float]] = {}

    def acquire(self, key: str, owner: str, ttl: float) -> bool:
        now = time.monotonic()
        with self._mutex:
            held = self._leases.get(key)
            if held is not None and held[1] > now and held[0] != owner:
                return False
            self._leases[key] = (owner, now + ttl)
            return True

    def release(self, key: str, owner: str) -> None:
        with self._mutex:
            if self._leases.get(key, ("", 0.0))[0] == owner:
                del self._leases[key]


class LockLeaseArbiter(CommitArbiter):
    """Commit arbitration by lock-lease over a plain (unconditional)
    object store: acquire the lease on the commit key, re-check the
    record ABSENT inside the lease (a previous holder may have
    published and crashed before this writer looked), plain PUT,
    release. Losing the lease race or finding the record published
    both surface as :class:`CommitConflict` — the caller's
    re-read-and-retry loop handles them identically."""

    def __init__(
        self,
        store: MockObjectStore,
        locks: LeaseLockService,
        ttl: float = 30.0,
    ) -> None:
        self.store = store
        self.locks = locks
        self.ttl = ttl
        self._owner = uuid.uuid4().hex

    def publish(self, path: str, payload: str) -> None:
        if not self.locks.acquire(path, self._owner, self.ttl):
            raise CommitConflict(
                f"commit lease for {path} is held by a concurrent "
                "writer"
            )
        try:
            if self.store.exists(path):
                raise CommitConflict(
                    f"commit record {path} was published concurrently "
                    "(found under the lease)"
                )
            self.store.put(path, payload)
        finally:
            self.locks.release(path, self._owner)
