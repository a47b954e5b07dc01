"""Parquet inspector: count / schema / preview / duck-typed analysis.

Capability parity with reference tools/ReadParquet.scala:97-213, with
two scale-minded changes: (a) table-kind detection reuses
:func:`parquet_combiner_spark.schemas.infer_table_kind` (metadata-only,
no scan), and (b) numeric summaries use the engine's single-pass
:func:`summary_stats` instead of ``df.describe()`` (one job, typed
doubles). Row counts use the Parquet footer fast path (count-star
pushdown), not a full scan.

Usage::

    python -m parquet_combiner_spark.tools.inspect dataA --path /tmp/gen
    python -m parquet_combiner_spark.tools.inspect /root/testdata/sf0.001/lineitem.parquet
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_combiner_spark.operators.aggregate import summary_stats
from parquet_combiner_spark.schemas import infer_table_kind

DEFAULT_LIMIT = 20
MAX_ROWS = 100

# Primary-key column per detected table kind, for duplication-rate
# reporting (generalizes reference ReadParquet.scala:186-193, which
# only knew detection_oid).
_KEY_COLS: dict[str, str] = {
    "dataA": "detection_oid",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def numeric_columns(df: DataFrame) -> list[str]:
    return [
        f.name for f in df.schema.fields if isinstance(f.dataType, _NUMERIC_TYPES)
    ]


def inspect(
    spark: SparkSession, path: str, limit: int = DEFAULT_LIMIT, show: bool = True
) -> dict:
    """Inspect one Parquet path; returns a machine-readable summary and
    (optionally) prints the human report the reference tool printed."""
    df = spark.read.parquet(path)
    kind = infer_table_kind(df.columns)
    n_rows = df.count()  # footer-metadata fast path, no full scan
    report: dict = {
        "path": path,
        "kind": kind,
        "rows": n_rows,
        "columns": len(df.columns),
        "schema": df.schema.simpleString(),
    }

    if show:
        print("\n=== BASIC INFORMATION ===")
        print(f"Path: {path}")
        print(f"Detected table kind: {kind}")
        print(f"Number of rows: {n_rows}")
        print(f"Number of columns: {len(df.columns)}")
        print("\n=== SCHEMA ===")
        df.printSchema()
        print(f"\n=== DATA PREVIEW ({min(limit, n_rows)} rows) ===")
        df.show(limit, truncate=False)

    num_cols = numeric_columns(df)
    if num_cols:
        stats = summary_stats(df, num_cols)
        if show:
            print("\n=== NUMERIC SUMMARY (single-pass) ===")
            stats.show(truncate=False)
        report["numeric_summary"] = {
            r["column"]: {k: r[k] for k in ("count", "mean", "stddev", "min", "max")}
            for r in stats.collect()
        }

    key = _KEY_COLS.get(kind)
    if key is not None and n_rows:
        distinct = df.select(key).distinct().count()
        dup_rate = (n_rows - distinct) * 100.0 / n_rows
        report["key_col"] = key
        report["distinct_keys"] = distinct
        report["dup_rate_pct"] = dup_rate
        if show:
            print(f"\nDistinct {key}: {distinct} / {n_rows} rows")
            print(f"Duplicate rate: {dup_rate:.2f}%")

    if kind == "dataA" and show:
        print("\nData distribution by geographical location:")
        df.groupBy("geographical_location_oid").count().orderBy(
            "geographical_location_oid"
        ).show(MAX_ROWS)
        print("Most common detected items:")
        df.groupBy("item_name").count().orderBy(F.desc("count")).show(limit)
    elif kind == "dataB" and show:
        print("\nAll geographical locations:")
        df.orderBy("geographical_location_oid").show(MAX_ROWS, truncate=False)
    elif kind == "top_items_output" and show:
        print("\nTop items by geographical location:")
        df.orderBy("geographical_location", "item_rank").show(
            MAX_ROWS, truncate=False
        )
    return report


def profile_table(df, approx: bool = False):
    """Column completeness/cardinality profile — one row per column:
    (column, n_rows, n_nulls, n_distinct). The first look every data
    contract check starts with (null explosions and cardinality
    collapses are the two commonest upstream breakages), type-
    agnostic so it runs on any table; numeric distribution detail is
    :func:`operators.aggregate.summary_stats`'s job.

    One aggregation pass over the table: null counts come free as
    ``count(*) - count(col)`` (both plain counts — no CASE, no
    HUGEINT drift in oracles); exact per-column ``count(DISTINCT)``
    makes Spark plan ONE Expand (k× row replication before the
    partial aggregate) — the deliberate full-diagnostic cost.
    ``approx=True`` swaps in HLL ``approx_count_distinct`` (no
    Expand, single flat pass) — the 100 TB profiling path. The wide
    1-row aggregate melts to long form via an executor-side
    struct-array explode (no second scan, no unpivot shuffle)."""
    from pyspark.sql import functions as F

    cols = df.columns
    nd = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(nd(F.col(c)).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="Inspect a Parquet file/directory")
    p.add_argument(
        "file",
        help="'dataA', 'dataB', 'output', a table name, or a full path",
    )
    p.add_argument("limit", nargs="?", type=int, default=DEFAULT_LIMIT)
    p.add_argument("--path", default="test-data", help="base directory")
    p.add_argument("--spark-master", default=None)
    args = p.parse_args(argv)

    full = args.file if "/" in args.file else f"{args.path}/{args.file}"

    from parquet_combiner_spark.session import get_spark

    spark = get_spark(app_name="parquet-inspector", master=args.spark_master)
    try:
        inspect(spark, full, args.limit)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
