"""Probe-vs-column rendering consistency (ADVICE r13, both mediums +
low): a Python-side point probe is only allowed to prune through a
bucket path segment or a bloom sidecar when its ``str(value)``
rendering provably matches the writer's ``cast(col as string)`` for
the column's DECLARED type. Int probes answer only on integer-family
columns (a double renders '42.0', a decimal(10,2) '42.00' — same
row-level value, different hash input); string probes only on
declared string columns ('042' = 42 is TRUE row-level under Spark's
numeric coercion, but sha1('042') != sha1('42')). And every dtype
lookup goes through a LOWERCASED map, so mixed-case schema columns
resolve instead of silently disabling type-gated pruning."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import Row

from parquet_combiner_spark.tools import txlog

pytestmark = pytest.mark.txlifecycle


# ---------------------------------------------------------------------------
# unit: the gates themselves
# ---------------------------------------------------------------------------


def test_dtype_map_is_case_insensitive():
    m = txlog._dtype_map("UserId bigint, Name string, Amt decimal(10,2)")
    assert m["userid"] == "bigint"
    assert m["name"] == "string"
    assert m["amt"] == "decimal(10,2)"


def test_bucket_point_probe_int_only_on_integer_columns():
    """A bucket(4) segment written from decimal/double values: the
    path holds crc32('42.00')/crc32('42.0') buckets, so the int probe
    42 (which would hash '42') must NOT prune — only integer-family
    columns probe; float/double/decimal conservatively keep."""
    import zlib

    d = txlog._path_band_disjoint
    for rendered, dtype in (("42.00", "decimal(10,2)"), ("42.0", "double")):
        b = zlib.crc32(rendered.encode()) % 4
        rel = f"data/c/k_bucket4={b}/p.parquet"
        # the row-level value 42.00 == 42 matches; pruning would be a
        # wrong skip — the non-integer dtype must keep
        assert d(rel, "k", 42, 42, dtype) is False
        # a WRONG bucket directory still keeps for these types (the
        # probe never runs), while an integer column still prunes
        wrong = f"data/c/k_bucket4={(b + 1) % 4}/p.parquet"
        assert d(wrong, "k", 42, 42, dtype) is False
    int_b = zlib.crc32(b"42") % 4
    assert (
        d(f"data/c/k_bucket4={(int_b + 1) % 4}/p.parquet", "k", 42, 42,
          "bigint")
        is True
    )
    assert (
        d(f"data/c/k_bucket4={int_b}/p.parquet", "k", 42, 42, "bigint")
        is False
    )


def _fake_sidecar(tmp_path, values):
    """Write a real sidecar bitset holding ``values`` and return its
    (table, ref) pair."""
    table = str(tmp_path)
    m = 512
    bits = bytearray(m // 8)
    for v in values:
        for idx in txlog._bloom_hashes(v, m):
            bits[idx >> 3] |= 1 << (idx & 7)
    name = os.path.join(txlog._BLOOM_DIR, "gate-test.bf")
    os.makedirs(os.path.join(table, txlog._BLOOM_DIR), exist_ok=True)
    with open(os.path.join(table, name), "wb") as f:
        f.write(bytes(bits))
    return table, {"sidecar": name, "m": m, "k": txlog._BLOOM_K}


def test_bloom_probe_type_gate(tmp_path):
    mc = txlog._bloom_maybe_contains
    # string column holding '042': the int probe 42 matches row-level
    # ('042' = 42 under coercion) but hashes differently — must keep
    table, ref = _fake_sidecar(tmp_path / "s", ["042"])
    assert mc(table, ref, 42, dtype="string") is True
    # ...while a string probe on the string column still prunes
    assert mc(table, ref, "zzz", dtype="string") is False
    assert mc(table, ref, "042", dtype="string") is True
    # int column holding 42: the string probe '042' matches row-level
    # but hashes differently — must keep
    table2, ref2 = _fake_sidecar(tmp_path / "i", [42])
    assert mc(table2, ref2, "042", dtype="bigint") is True
    # ...while an int probe on the int column still prunes
    assert mc(table2, ref2, 43, dtype="bigint") is False
    assert mc(table2, ref2, 42, dtype="bigint") is True
    # unknown dtype: maximally conservative, never prunes
    assert mc(table2, ref2, 43) is True
    assert mc(table2, ref2, 43, dtype="decimal(10,2)") is True


# ---------------------------------------------------------------------------
# end-to-end: the ADVICE repros through the public verbs
# ---------------------------------------------------------------------------


def test_delete_where_on_decimal_bucket_layout_deletes(spark, tmp_path):
    """ADVICE r13 repro: delete_where(col, 42, 42) on a
    bucket(4, decimal_col) layout used to silently delete NOTHING —
    the Python probe hashed '42' while the writer's paths hold
    crc32('42.00') buckets, so every file 'proved' disjoint."""
    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [Row(k=f"{i}.00", v=i) for i in range(50)],
        "k string, v long",
    ).selectExpr("cast(k as decimal(10,2)) as k", "v")
    txlog.commit(df, table, partition_by=["bucket(4, k)"])
    v = txlog.delete_where(spark, table, "k", 42, 42)
    assert v >= 1  # a real replace commit, not a pruned-to-nothing no-op
    got = txlog.read_table(spark, table)
    assert got.count() == 49
    assert got.where("k = 42").count() == 0


def test_read_pruned_bloom_int_probe_on_string_column(spark, tmp_path):
    """ADVICE r13 repro: an int point probe against a STRING column's
    bloom sidecar used to answer 'definitely absent' for '042' while
    Spark's row-level coercion matches it ('042' = 42 is TRUE)."""
    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [Row(s=f"{i:03d}", v=i) for i in range(50)],
        "s string, v long",
    )
    txlog.commit(df, table, bloom_cols={"s": 1000}, stats_cols=["s"])
    got = txlog.read_table_pruned(spark, table, "s", 42, 42)
    assert [r["s"] for r in got.collect()] == ["042"]
    # the string-rendered probe still PRUNES through the sidecar
    # (type-consistent), proving the gate didn't disable the index
    none = txlog.read_table_pruned(spark, table, "s", "999", "999")
    assert none.count() == 0
    assert not none.inputFiles()  # skipped from the LISTING
