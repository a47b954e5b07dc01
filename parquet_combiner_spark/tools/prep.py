"""CLI: run the corpus-preparation pipeline on a documents table.

    python -m parquet_combiner_spark.tools.prep DOCS_PARQUET OUT_DIR \
        [--eval-mod 97] [--ngram 3]

Reads a ``documents``-shaped parquet (doc_id, text, ...), runs the
five-stage pipeline (functions/corpus.py: repetition filter → quality
filter → exact dedup → decontamination → split), joins the surviving
ids back to the full rows, and writes snappy parquet PARTITIONED BY
SPLIT — so a training job reading ``split=train`` prunes the val/test
partitions at the file-listing level, no data read.
"""

from __future__ import annotations

import argparse
import sys
import time


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="corpus-prep",
        description="Filter/dedup/decontaminate/split a document corpus.",
    )
    p.add_argument("docs", help="path to documents parquet")
    p.add_argument("output", help="output dir (overwritten, split=... dirs)")
    p.add_argument("--eval-mod", type=int, default=97,
                   help="doc_id %% MOD == 0 is the eval partition")
    p.add_argument("--ngram", type=int, default=3,
                   help="decontamination n-gram size")
    p.add_argument("--spark-master", default=None)
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)

    from pyspark.sql import SparkSession

    from parquet_combiner_spark.functions.corpus import corpus_prep
    from parquet_combiner_spark.session import get_spark
    from parquet_combiner_spark.sources.io import write_parquet

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="corpus-prep", master=args.spark_master)
    t0 = time.monotonic()
    try:
        docs = spark.read.parquet(args.docs)
        verdicts = corpus_prep(
            docs, eval_mod=args.eval_mod, ngram=args.ngram
        )
        # survivors only, full original rows + split label
        out = docs.join(verdicts.select("doc_id", "split"), "doc_id")
        write_parquet(out, args.output, partition_by=["split"])
        n = spark.read.parquet(args.output).count()
        kept = spark.read.parquet(args.output).groupBy("split").count()
        dist = {r["split"]: r["count"] for r in kept.collect()}
        print(
            f"Wrote {n} surviving docs to {args.output} "
            f"in {time.monotonic() - t0:.1f}s (splits: {dist})"
        )
        return 0
    except Exception as exc:  # noqa: BLE001 — CLI boundary
        print(f"error: {exc}", file=sys.stderr)
        return 1
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
