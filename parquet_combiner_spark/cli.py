"""Command-line entry point for the main pipeline.

Parity with reference ParquetCombinerRDD.scala:26-51 (positional
dataA/dataB/output paths + topX, with the reference's defaults), as a
standard argparse front-end over
:func:`parquet_combiner_spark.pipeline.process_parquet_files`.

Usage::

    python -m parquet_combiner_spark.cli DATA_A DATA_B OUTPUT [TOP_X]
"""

from __future__ import annotations

import argparse
import sys
import time

DEFAULT_TOP_X = 5  # reference ParquetCombinerRDD.scala:22


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="parquet-combiner",
        description=(
            "Read dataA (detections) + dataB (locations), compute per-"
            "location top-X items on deduplicated detections, write "
            "snappy Parquet."
        ),
    )
    p.add_argument("data_a", help="path to dataA Parquet")
    p.add_argument("data_b", help="path to dataB Parquet")
    p.add_argument("output", help="output Parquet path (overwritten)")
    p.add_argument(
        "top_x", nargs="?", type=int, default=DEFAULT_TOP_X,
        help=f"items per location (default {DEFAULT_TOP_X})",
    )
    p.add_argument("--spark-master", default=None)
    p.add_argument(
        "--show", type=int, default=0, metavar="N",
        help="also print the first N result rows",
    )
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)

    from pyspark.sql import SparkSession

    from parquet_combiner_spark.pipeline import process_parquet_files
    from parquet_combiner_spark.session import get_spark

    # Only stop a session this CLI created (embedders/tests may pass
    # an active one in via getOrCreate reuse).
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="parquet-combiner", master=args.spark_master)
    t0 = time.monotonic()
    try:
        result = process_parquet_files(
            spark, args.data_a, args.data_b, args.output, top_x=args.top_x
        )
        if args.show:
            result.show(args.show, truncate=False)
        # Count the *written* output (cheap footer read) instead of
        # recomputing the query lineage like the reference's final
        # resultRDD.count() does (ParquetCombinerRDD.scala:216).
        n = spark.read.parquet(args.output).count()
        print(
            f"Wrote {n} rows to {args.output} "
            f"in {time.monotonic() - t0:.1f}s (topX={args.top_x})"
        )
        return 0
    except Exception as exc:  # noqa: BLE001 — CLI boundary
        # The reference swallows errors and exits 0
        # (ParquetCombinerRDD.scala:98-102); a CLI should fail loudly.
        print(f"error: {exc}", file=sys.stderr)
        return 1
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
