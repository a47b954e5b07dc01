"""Properties of :func:`parquet_combiner_spark.functions.packing.
pack_sequences` — the concatenate-and-chunk step whose output tells a
training loader what to read, so a silent off-by-one here corrupts
every sample.

The invariants pinned:
- the global token stream is contiguous: document i's first token
  sits at ``seq_id*budget + seq_offset`` and that position equals the
  prefix sum of all earlier documents' token counts (span exactness);
- the assignment is partitioning-invariant: any input partitioning /
  row order produces the identical mapping;
- the two-phase distributed prefix sum equals the naive single-
  partition window cumsum.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from parquet_combiner_spark.functions.packing import pack_sequences


def _docs_df(spark, counts: dict[int, int], num_partitions: int = 1):
    rows = [Row(doc_id=i, n_tokens=n) for i, n in counts.items()]
    return spark.createDataFrame(rows).repartition(num_partitions)


def _expected(counts: dict[int, int], budget: int):
    out, acc = {}, 0
    for i in sorted(counts):
        out[i] = (counts[i], acc // budget, acc % budget)
        acc += counts[i]
    return out


def _got(df):
    return {
        r["doc_id"]: (r["n_tokens"], r["seq_id"], r["seq_offset"])
        for r in df.collect()
    }


def test_pack_matches_naive_prefix_sum(spark):
    rng = random.Random(7)
    counts = {i: rng.randint(1, 300) for i in range(200)}
    df = pack_sequences(_docs_df(spark, counts, 8), "n_tokens", budget=512)
    assert _got(df) == _expected(counts, 512)


def test_pack_span_exactness(spark):
    """Every sequence 0..last-1 owns exactly ``budget`` tokens: the
    reconstructed stream positions are gapless and non-overlapping."""
    rng = random.Random(11)
    counts = {i: rng.randint(1, 64) for i in range(150)}
    budget = 100
    df = pack_sequences(_docs_df(spark, counts, 5), "n_tokens", budget)
    rows = sorted(df.collect(), key=lambda r: r["doc_id"])
    pos = 0
    for r in rows:
        assert r["seq_id"] * budget + r["seq_offset"] == pos
        assert 0 <= r["seq_offset"] < budget
        pos += r["n_tokens"]


def test_pack_partitioning_invariant(spark):
    counts = {i: (i * 37) % 90 + 1 for i in range(120)}
    budget = 128
    base = _got(
        pack_sequences(_docs_df(spark, counts, 1), "n_tokens", budget)
    )
    for parts in (3, 7, 16):
        shuffled = _docs_df(spark, counts, parts).orderBy(F.rand(seed=parts))
        got = _got(pack_sequences(shuffled, "n_tokens", budget))
        assert got == base, f"packing changed under {parts} partitions"


def test_pack_more_partitions_than_rows(spark):
    counts = {i: 10 for i in range(4)}
    df = pack_sequences(
        _docs_df(spark, counts, 2), "n_tokens", budget=25, num_partitions=16
    )
    assert _got(df) == _expected(counts, 25)


def test_pack_empty_input(spark):
    df = pack_sequences(
        _docs_df(spark, {1: 1}, 1).where(F.lit(False)), "n_tokens", 16
    )
    assert df.collect() == []


def test_pack_rejects_bad_budget(spark):
    with pytest.raises(ValueError, match="budget must be positive"):
        pack_sequences(_docs_df(spark, {1: 1}, 1), "n_tokens", 0)


def test_pack_string_ids_uses_sample_fallback(spark):
    """Non-numeric ordering keys can't go through approxQuantile; the
    bounded driver-sample fallback must yield the same deterministic
    packing in lexicographic id order."""
    counts = {f"doc{i:04d}": (i * 13) % 50 + 1 for i in range(80)}
    rows = [Row(doc_id=k, n_tokens=n) for k, n in counts.items()]
    df = spark.createDataFrame(rows).repartition(6)
    got = _got(pack_sequences(df, "n_tokens", budget=64))
    exp, acc = {}, 0
    for k in sorted(counts):
        exp[k] = (counts[k], acc // 64, acc % 64)
        acc += counts[k]
    assert got == exp


def test_resolve_partitions_tolerates_non_numeric_conf(spark):
    """Some deployments hand this engine a session whose
    spark.sql.shuffle.partitions is non-numeric ("auto" on vendor
    distros — OSS Spark validates its own conf.set, so the bad value
    can only arrive from a foreign session, stubbed here); the
    bucket-count default must fall back to defaultParallelism instead
    of raising."""
    from types import SimpleNamespace

    from parquet_combiner_spark.functions.packing import _resolve_partitions

    def fake(conf_value):
        return SimpleNamespace(
            conf=SimpleNamespace(get=lambda key: conf_value),
            sparkContext=SimpleNamespace(defaultParallelism=12),
        )

    assert _resolve_partitions(fake("auto")) == 12
    assert _resolve_partitions(fake(None)) == 12
    assert _resolve_partitions(fake("16")) == 16
    # the real session path still resolves its configured int
    assert _resolve_partitions(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
