#!/usr/bin/env python
"""Capture .explain("formatted") for bench headline lines.

Usage: python scripts/capture_plans.py <outdir> <suffix> [name ...]
Writes <outdir>/<name>_<suffix>.txt for each line (default: every
bench.HEADLINE entry). Lifecycle lines execute their in-measurement
builds as a side effect — the captured plan is the RETURNED read
plan, same object the bench's noop sink materializes.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    outdir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:]
    outdir.mkdir(parents=True, exist_ok=True)

    import bench
    import __spark_entry__ as entrymod
    from parquet_combiner_spark.session import get_spark

    spark = get_spark(app_name=f"plans-{suffix}")
    qs = entrymod.queries()
    if not names:
        names = [n for n in bench.HEADLINE if n in qs]
    sf_dir = "/root/testdata/sf0.1"
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"PLAN CAPTURE FAILED: {e}"
        (outdir / f"{name}_{suffix}.txt").write_text(txt)
        print(name, "ok" if "FAILED" not in txt[:30] else "FAILED")
    spark.stop()


if __name__ == "__main__":
    main()
