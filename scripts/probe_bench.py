#!/usr/bin/env python
"""Per-key bench probe for A/B attribution (BASELINE.md protocol):
run a comma-separated key list from a given repo tree (HEAD or a git
worktree of an older round) with bench.py's exact measurement
discipline — sf0.001 warm-up, noop-sink materialization, 3 measured
runs — and print one JSON line {key: [sorted runs]}.

Usage:
    python scripts/probe_bench.py <repo_root> key1,key2[,key3...]

Run the OLD tree and HEAD back-to-back (twice) on an otherwise idle
box; compare per-key medians. Same-direction drift in BOTH trees is
environment; a delta only in the new tree is a code regression."""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo, keys = sys.argv[1], sys.argv[2].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, repo)
    os.chdir(repo)
    import __spark_entry__ as entrymod
    from parquet_combiner_spark.session import get_spark

    spark = get_spark(app_name="probe")
    qs = entrymod.queries()

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    out = {}
    for k in keys:
        try:
            mat(qs[k](spark, warm_dir))
        except Exception as e:  # noqa: BLE001 — warm-up is best-effort
            sys.stderr.write(f"warm-up failed for {k}: {e}\n")
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            mat(qs[k](spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
        out[k] = sorted(runs)
    print(json.dumps({"tree": repo, "probe": out}))
    spark.stop()


if __name__ == "__main__":
    main()
