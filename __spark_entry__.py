"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registries live in :mod:`parquet_combiner_spark.queries`
(reference-parity operators, SURVEY.md §2) and
:mod:`parquet_combiner_spark.functions` (LLM-data-pipeline operators);
this module only re-exports them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parquet_combiner_spark import queries as _q

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: per-supplier top-5 parts by deduped
    lineitem count, broadcast-joined to the supplier dim
    (scan → dedup → agg → window rank → broadcast join → project)."""
    return _q.top_parts_per_supplier(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    registry.update(_q.QUERIES)
    # hard import: a broken functions package must fail loudly here,
    # not silently shrink the contract to the base queries
    from parquet_combiner_spark.functions import PIPELINE_QUERIES

    registry.update(PIPELINE_QUERIES)
    return registry


def oracle_sql() -> dict[str, str]:
    """ANSI-SQL oracle per query key (DuckDB-runnable). Keys absent
    here (LSH/SimHash-style non-SQL-expressible ops) get the driver's
    weaker rows-only check."""
    oracles: dict[str, str] = {}
    oracles.update(_q.ORACLE_SQL)
    from parquet_combiner_spark.functions import PIPELINE_ORACLE_SQL

    oracles.update(PIPELINE_ORACLE_SQL)
    return oracles
