"""Driver-contract and registry tests.

The reference dispatches queries through a string-keyed factory that
throws on unknown names (reference services/AggregationFactory.scala:
29-37, tested at ParquetCombinerRDDUnitTest.scala:380-406); the
engine's registry generalizes that — these tests pin the same
dispatch guarantees plus the driver contract's invariants."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from parquet_combiner_spark.pipeline import item_count
from tests.conftest import make_data_a


def test_registry_dispatch_and_unknown_name():
    qs = entry_mod.queries()
    assert len(qs) >= 26
    assert all(callable(fn) for fn in qs.values())
    with pytest.raises(KeyError):
        qs["no_such_query"]  # unknown name fails fast (factory parity)


def test_every_oracle_has_a_query():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle without query: {missing}"
    # the non-SQL-expressible exceptions are exactly the hash-based
    # estimators (documented rows-only checks)
    # the non-oracle entries are exactly the engine-specific
    # estimators: xxhash64-based LSH families, sketch aggregates
    # (HLL++/GK values differ between engines by design; their error
    # bounds are pinned by pytest instead), and the k-means-backed
    # SemDedup (planted-dup recall pinned by pytest)
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "minhash_near_dup_pairs",
        "simhash_near_dup_pairs",
        "ann_cosine_topk_ivf",
        "distinct_parts_approx",
        "price_percentiles_approx",
        "embedding_semdedup",
        "event_counts_cms",
        # GK-sketch threshold twins: DuckDB's approx_quantile is a
        # t-digest (different estimator); error-bound pytest instead
        "order_price_quartiles_approx",
        "customer_rfm_segments_approx",
        # DataSketches HLL store: estimates differ from exact SQL by
        # design; merge-losslessness + 5% error bound pinned by pytest
        "event_distinct_users_sketch_store",
    }


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "l_suppkey",
        "supplier_name",
        "l_partkey",
        "part_count",
        "part_rank",
    ]
    assert df.schema["part_rank"].dataType.simpleString() == "string"


def test_item_count_exact_values(spark):
    """Port of reference ParquetCombinerRDDUnitTest.scala:409-459: a
    duplicate detection_oid must not double-count (loc 2's item1 = 1,
    not 2)."""
    rows = [
        (1, 101, 1, "item1", 1000),
        (1, 101, 2, "item2", 1001),
        (1, 102, 3, "item1", 1002),
        (2, 201, 4, "item1", 1003),
        (2, 201, 4, "item1", 1004),  # duplicate detection_oid
        (2, 202, 5, "item3", 1005),
    ]
    out = item_count(make_data_a(spark, rows))
    got = {
        (r["geographical_location_oid"], r["item_name"]): r["count"]
        for r in out.collect()
    }
    assert got == {
        (1, "item1"): 2,
        (1, "item2"): 1,
        (2, "item1"): 1,  # deduped: 4 counted once
        (2, "item3"): 1,
    }


def test_check_oracle_flags_hugeint_decimal_at_type_level():
    """The local oracle checker must detect HUGEINT/DECIMAL oracle
    columns from the relation's DECLARED types (a value scan of the
    first rows misses NULL/small samples): a window sum() over
    integers is DuckDB HUGEINT, which the driver's type-sensitive
    hash rejects against Spark's int64 even on equal values."""
    import importlib.util
    from pathlib import Path

    import duckdb

    spec = importlib.util.spec_from_file_location(
        "check_oracle_mod",
        Path(__file__).resolve().parent.parent / "scripts" / "check_oracle.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    con = duckdb.connect()
    rel = con.sql(
        "SELECT g, sum(x) OVER (PARTITION BY g ORDER BY x) AS running "
        "FROM (VALUES (1, 10), (1, 20), (2, 5)) t(g, x)"
    )
    flagged = mod.hugeint_decimal_columns(rel.columns, list(rel.types))
    assert flagged and flagged[0].startswith("running:"), flagged
    assert "HUGEINT" in flagged[0]

    ok = con.sql(
        "SELECT g, CAST(sum(x) OVER (PARTITION BY g ORDER BY x) AS BIGINT)"
        " AS running FROM (VALUES (1, 10), (1, 20), (2, 5)) t(g, x)"
    )
    assert mod.hugeint_decimal_columns(ok.columns, list(ok.types)) == []

    dec = con.sql("SELECT CAST(1.5 AS DECIMAL(10,2)) AS d")
    assert mod.hugeint_decimal_columns(dec.columns, list(dec.types)) == [
        "d:DECIMAL(10,2)"
    ]
