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
    p.add_argument(
        "--input-format", choices=("parquet", "jsonl"), default="parquet",
        help=(
            "jsonl: treat dataA/dataB as JSON-lines exports, ingest "
            "them to staged parquet (schema-enforced, FAILFAST), then "
            "run the pipeline on the staged tables — the "
            "ingest-once-operate-on-parquet flow (default: parquet)"
        ),
    )
    return p.parse_args(argv)


def ingest_jsonl_inputs(
    spark, data_a: str, data_b: str, staging_root: str
) -> tuple[str, str]:
    """JSONL → parquet ingestion for both pipeline inputs: read each
    JSON-lines path under its declared schema (fail-fast on missing
    fields / malformed lines) and land it as snappy parquet under
    ``staging_root``. Returns the staged (data_a, data_b) paths.

    One full JSON parse per input, once — every downstream read is a
    columnar parquet scan (predicate pushdown, column pruning), which
    a repeated-read pipeline never gets from raw JSONL."""
    from parquet_combiner_spark import schemas
    from parquet_combiner_spark.sources.io import read_jsonl, write_parquet

    staged = []
    for name, path, schema in (
        ("dataA", data_a, schemas.DATA_A_SCHEMA),
        ("dataB", data_b, schemas.DATA_B_SCHEMA),
    ):
        out = f"{staging_root.rstrip('/')}/{name}"
        write_parquet(read_jsonl(spark, path, schema=schema), out)
        staged.append(out)
    return staged[0], staged[1]


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
        data_a, data_b = args.data_a, args.data_b
        if args.input_format == "jsonl":
            data_a, data_b = ingest_jsonl_inputs(
                spark, data_a, data_b, f"{args.output.rstrip('/')}_staging"
            )
        result = process_parquet_files(
            spark, data_a, data_b, args.output, top_x=args.top_x
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
