#!/usr/bin/env python
"""Local mimic of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark AND the
matching ``oracle_sql()`` on DuckDB over the same parquet tables,
then compares row count, column names, and an order-insensitive
value hash (columns sorted by name, floats normalized). Queries with
no oracle get a rows-only check (must return >= 0 rows and a stable
schema), mirroring the driver's weaker path.

Usage: python scripts/check_oracle.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
from datetime import date, datetime
from decimal import Decimal
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    """Normalize a cell for hashing across Spark/DuckDB type drift."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, Decimal):
        # Normalized so the local value diff stays useful; the
        # type-level mismatch itself is reported by
        # hugeint_decimal_columns (the oracle SQL must CAST).
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 9 significant digits: kills last-ulp summation noise while
        # still catching real numeric errors
        return f"{v:.9g}"
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def hugeint_decimal_columns(cols: list[str], types: list) -> list[str]:
    """Oracle columns whose DuckDB type exports to Arrow as
    decimal128: HUGEINT (e.g. any window ``sum()`` over integers) and
    DECIMAL. The driver's hash is TYPE-sensitive — these mismatch
    Spark's int64/double even when every value is equal, so they must
    be CAST in the oracle SQL. Detected from the relation's declared
    types (a value scan of the first rows misses columns that are
    NULL or small in the sample — the user_sessions-class drift)."""
    flagged = []
    for c, t in zip(cols, types):
        t = str(t).upper()
        if "HUGEINT" in t or "DECIMAL" in t:
            flagged.append(f"{c}:{t}")
    return flagged


def binary_output_columns(sdf) -> list[str]:
    """Spark output columns the DRIVER's canonicalizer cannot hash:
    raw BINARY collects as ``bytearray``, which pandas ``factorize``
    rejects ("unhashable type") before any comparison happens — the
    r6 ``doc_payload_resize`` failure. The local ``_norm`` hexes
    bytes and would silently pass, so flag at the type level instead."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, T.BinaryType)
    ]


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm(row[i]) for i in order) for row in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from parquet_combiner_spark.session import get_spark

    spark = get_spark(app_name="check-oracle", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)
    failures = []
    for name in names:
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"ERROR    {name}: spark side failed: {e}")
            failures.append(name)
            continue
        bin_cols = binary_output_columns(sdf)
        if bin_cols:
            print(
                f"WARNTYPE {name}: spark columns {', '.join(bin_cols)} "
                "are raw BINARY — the driver canonicalizer cannot hash "
                "bytearray cells; re-encode the query boundary "
                "(decode/hex/md5)"
            )
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWSONLY {name}: rows={len(srows)} cols={scols}")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            otypes = list(rel.types)
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR    {name}: oracle failed: {e}")
            failures.append(name)
            continue
        problems = []
        bad_types = hugeint_decimal_columns(ocols, otypes)
        if bad_types:
            # counted as a failure: the local value hash normalizes
            # Decimals and would pass, but the driver's type-sensitive
            # hash will not — exactly the silent drift this flags.
            print(
                f"WARNTYPE {name}: oracle columns {', '.join(bad_types)} "
                "export to Arrow as decimal128 — the driver's "
                "type-sensitive hash will mismatch Spark even on equal "
                "values; add an explicit CAST in the oracle SQL"
            )
            failures.append(name)
            continue
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        elif value_hash(scols, srows) != value_hash(ocols, orows):
            problems.append("value-hash mismatch")
            sset = {
                tuple(_norm(v) for v in row) for row in
                ([r[i] for i in sorted(range(len(scols)), key=lambda i: scols[i])]
                 for r in srows)
            }
            oset = {
                tuple(_norm(v) for v in row) for row in
                ([r[i] for i in sorted(range(len(ocols)), key=lambda i: ocols[i])]
                 for r in orows)
            }
            for label, diff in (
                ("spark-only", sset - oset),
                ("oracle-only", oset - sset),
            ):
                for row in list(diff)[:3]:
                    problems.append(f"  {label}: {row}")
        if problems:
            print(f"MISMATCH {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"         {p}")
            failures.append(name)
        else:
            print(f"MATCH    {name}: rows={len(srows)}")
    spark.stop()
    print(f"\n{len(names) - len(failures)}/{len(names)} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
