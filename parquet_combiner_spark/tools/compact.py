"""CLI for :func:`parquet_combiner_spark.sources.io.combine_parquet`:
compact small-file Parquet datasets into sensibly-sized files.

Usage::

    python -m parquet_combiner_spark.tools.compact IN [IN...] --out OUT \
        [--target-file-mb 128] [--shuffle] [--partition-by col1,col2]
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(
        description="Combine/compact Parquet datasets into fewer, "
        "evenly-sized files"
    )
    p.add_argument("inputs", nargs="+", help="input Parquet paths")
    p.add_argument("--out", required=True, help="output Parquet path")
    p.add_argument("--target-file-mb", type=int, default=128)
    p.add_argument("--compression", default="snappy")
    p.add_argument(
        "--partition-by", default=None, help="comma-separated columns"
    )
    p.add_argument(
        "--shuffle", action="store_true",
        help="repartition (even file sizes) instead of coalesce (no shuffle)",
    )
    p.add_argument("--spark-master", default=None)
    args = p.parse_args(argv)

    from parquet_combiner_spark.session import get_spark
    from parquet_combiner_spark.sources.io import combine_parquet

    spark = get_spark(app_name="parquet-compact", master=args.spark_master)
    try:
        n = combine_parquet(
            spark,
            args.inputs,
            args.out,
            target_file_mb=args.target_file_mb,
            compression=args.compression,
            partition_by=(
                args.partition_by.split(",") if args.partition_by else None
            ),
            shuffle=args.shuffle,
        )
        print(f"Compacted {len(args.inputs)} input path(s) -> {args.out} "
              f"({n} target file(s))")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
