"""Data-contract validation — the dbt-style checks a pipeline runs
before trusting a table, each as ONE aggregate-shaped Spark job.

Every check returns violation COUNTS (not rows): at 100 TB you page a
human with numbers first and sample offending rows second. Shapes:

* uniqueness — one partial-aggregated groupBy on the key; violations
  = rows beyond the first per key.
* not-null — a single conditional-count aggregate over all requested
  columns in ONE pass (no per-column jobs).
* referential integrity — child's DISTINCT keys left-anti parent
  (both sides reduced to key columns before the join), counting
  orphaned key VALUES, then one semi-join counts orphaned child ROWS.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_unique(df: DataFrame, keys: Sequence[str]) -> int:
    """Number of rows in excess of one per ``keys`` tuple (0 = the
    key is unique)."""
    dup = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") - 1).alias("extra"))
        .head()
    )
    return int(dup["extra"] or 0)


def check_not_null(df: DataFrame, cols: Sequence[str]) -> dict[str, int]:
    """Null count per column, computed in one aggregate pass."""
    row = df.agg(
        *[
            F.count(F.when(F.col(c).isNull(), 1)).alias(c)
            for c in cols
        ]
    ).head()
    return {c: int(row[c]) for c in cols}


def check_referential(
    child: DataFrame,
    parent: DataFrame,
    child_keys: Sequence[str],
    parent_keys: Sequence[str],
) -> tuple[int, int]:
    """(orphan_key_values, orphan_child_rows): distinct child keys
    with no parent row, and how many child rows carry them. Both
    sides are projected to their key columns before any join."""
    c = child.select(
        *[F.col(a).alias(b) for a, b in zip(child_keys, parent_keys)]
    )
    p = parent.select(*parent_keys)
    orphan_keys = c.distinct().join(p, list(parent_keys), "left_anti")
    n_keys = orphan_keys.count()
    if n_keys == 0:
        return 0, 0
    n_rows = c.join(orphan_keys, list(parent_keys), "left_semi").count()
    return n_keys, n_rows


def validate_table(
    df: DataFrame,
    unique: Sequence[str] | None = None,
    not_null: Sequence[str] | None = None,
) -> dict:
    """Run the declared checks; returns a report dict
    ``{"unique_violations": int, "nulls": {col: int}, "ok": bool}``."""
    report: dict = {"ok": True}
    if unique:
        extra = check_unique(df, unique)
        report["unique_violations"] = extra
        report["ok"] &= extra == 0
    if not_null:
        nulls = check_not_null(df, not_null)
        report["nulls"] = nulls
        report["ok"] &= all(v == 0 for v in nulls.values())
    return report
