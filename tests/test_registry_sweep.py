"""Whole-registry sweep in one shared session.

Every ``__spark_entry__.queries()`` entry executes at sf0.001 inside
the SAME SparkSession, back to back — the driver's execution shape.
Per-query tests cannot catch cross-plan session interactions (the
cogrouped as-of's missing-column quirk only reproduced in long
sessions that had executed sibling plans); this sweep runs the whole
surface the way the driver does and fails on the first query that
errors or returns a frameless result.

sf0.001 keeps the sweep ~2 minutes; correctness-vs-oracle is
scripts/check_oracle.py's job — this test is about *executability
under shared session state*.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def test_every_registry_query_runs_in_one_session(spark):
    failures: dict[str, str] = {}
    for name, fn in sorted(entry_mod.queries().items()):
        try:
            df = fn(spark, SF_DIR)
            assert df.columns, "no output columns"
            df.count()
        except Exception as exc:  # noqa: BLE001 — collect all failures
            failures[name] = f"{type(exc).__name__}: {exc}"[:300]
    assert not failures, f"{len(failures)} queries failed: {failures}"
