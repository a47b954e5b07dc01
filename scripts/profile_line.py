#!/usr/bin/env python
"""Per-line bench profiler (guide §1: measure first).

Runs ONE bench line exactly as bench.py does (warm-up at the smallest
SF, then N measured noop-sink runs at the target SF) in a session with
the Spark UI enabled, then dumps the job list (description, duration,
stages) from the UI REST API so wall-clock attributes to jobs instead
of guesses. Driver-side gaps (Python work, FS commits) show up as the
difference between the sum of job durations and the measured wall.

Usage: python scripts/profile_line.py <line> [--runs 3]
         [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("line")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from parquet_combiner_spark.session import get_spark
    from parquet_combiner_spark.tools import txlog

    spark = get_spark(
        app_name=f"profile-{args.line}",
        extra_conf={"spark.ui.enabled": "true"},
    )
    qs = entrymod.queries()
    fn = qs[args.line]

    candidates = sorted(Path(args.sf).resolve().parent.glob("sf*"))
    warm_dir = str(candidates[0]) if candidates else args.sf
    if not args.no_warm:
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()

    runs = []
    marks = []
    for i in range(args.runs):
        txlog.phase_clock_reset()
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"RUN{i}:{args.line}")
        df = fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        runs.append(wall)
        marks.append((t0, wall, txlog.phase_clock_seconds()))
        spark.sparkContext.setJobDescription(None)

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    jobs = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs")
    )
    med = statistics.median(runs)
    print(f"\n=== {args.line}: median {med:.3f}s of "
          f"{[round(r, 3) for r in sorted(runs)]} "
          f"(build phase: {[round(m[2], 3) for m in marks]})\n")
    per_run_job_sum: dict[str, float] = {}
    for j in sorted(jobs, key=lambda j: j["jobId"]):
        desc = j.get("description") or j.get("name", "")
        if not desc.startswith("RUN"):
            continue
        run_tag = desc.split(":", 1)[0]
        t_sub = (
            _ms(j["completionTime"]) - _ms(j["submissionTime"])
            if "completionTime" in j
            else 0.0
        )
        per_run_job_sum[run_tag] = per_run_job_sum.get(run_tag, 0) + t_sub
        if run_tag == f"RUN{args.runs - 1}":
            print(
                f"  job {j['jobId']:>4}  {t_sub:7.3f}s  "
                f"tasks={j.get('numTasks', '?'):>4}  {j.get('name','')[:90]}"
            )
    print()
    for i, (t0, wall, build) in enumerate(marks):
        jsum = per_run_job_sum.get(f"RUN{i}", 0.0)
        print(
            f"  RUN{i}: wall {wall:6.3f}s  job-sum {jsum:6.3f}s  "
            f"driver-gap {wall - jsum:6.3f}s  txlog-build {build:6.3f}s"
        )
    spark.stop()


def _ms(iso: str) -> float:
    from datetime import datetime

    return datetime.strptime(iso, "%Y-%m-%dT%H:%M:%S.%fGMT").timestamp()


if __name__ == "__main__":
    main()
