"""Partition spec EVOLUTION (VERDICT r10 order #9, Iceberg-style):
``set_partition_spec`` changes the layout for future writes in one
metadata-only commit; existing files stay put and keep reading under
the layout they were written with. Mixed-era snapshots resolve
partition columns PER FILE — from the path when the ``col=value``
segment exists, from the data stored in the file otherwise — and
listing-based pruning skips only files whose own path proves a
mismatch."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from parquet_combiner_spark.tools import txlog

# the slow build-mutate-read half of the gate (see pytest.ini)
pytestmark = pytest.mark.txlifecycle


def _flat_then_partitioned(spark, table):
    """Era 1: 30 flat rows (day in data). Era 2: spec=['day'], 30
    partitioned rows (day in path). Returns the expected (k, day)
    set."""
    df1 = spark.createDataFrame(
        [Row(k=i, day=i % 3, v=f"a{i}") for i in range(30)],
        "k int, day int, v string",
    )
    txlog.commit(df1, table, stats_cols=["k"])
    txlog.set_partition_spec(table, ["day"])
    df2 = spark.createDataFrame(
        [Row(k=100 + i, day=i % 3, v=f"b{i}") for i in range(30)],
        "k int, day int, v string",
    )
    txlog.commit(df2, table)
    return {(i, i % 3) for i in range(30)} | {
        (100 + i, i % 3) for i in range(30)
    }


def test_mixed_era_read_resolves_partition_values_per_file(
    spark, tmp_path
):
    table = str(tmp_path / "t")
    want = _flat_then_partitioned(spark, table)
    got = txlog.read_table(spark, table)
    assert {(r["k"], r["day"]) for r in got.collect()} == want
    # schema order preserved, column typed from the declared schema
    assert got.columns == ["k", "day", "v"]
    assert dict(got.dtypes)["day"] == "int"


def test_mixed_era_partitioned_read_prunes_new_era_only(spark, tmp_path):
    """Old-era files don't encode day in their paths → conservatively
    kept (row filter exact); new-era files prune from the LISTING."""
    table = str(tmp_path / "t")
    _flat_then_partitioned(spark, table)
    pr = txlog.read_table_partitioned(spark, table, {"day": 1})
    assert pr.count() == 20
    assert {r["day"] for r in pr.collect()} == {1}
    all_n = len(txlog.read_table(spark, table).inputFiles())
    assert 0 < len(pr.inputFiles()) < all_n


def test_spec_evolution_is_metadata_only_and_time_travels(
    spark, tmp_path
):
    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [Row(k=i, day=i % 2) for i in range(10)], "k int, day int"
    )
    txlog.commit(df, table)
    mt = {
        f: os.path.getmtime(f)
        for f in txlog._snapshot(table, None)[0]
    }
    pre = txlog.current_version(table)
    v = txlog.set_partition_spec(table, ["day"])
    assert v == pre + 1
    assert txlog.partition_by_of(table) == ["day"]
    assert all(os.path.getmtime(f) == t for f, t in mt.items())
    assert txlog._last_commit(table)["add"]  # same files re-referenced
    # no-op re-set publishes nothing
    assert txlog.set_partition_spec(table, ["day"]) == v
    # RESTORE across the boundary restores the old (flat) spec
    txlog.restore(table, pre)
    assert txlog.partition_by_of(table) == []
    assert txlog.read_table(spark, table).count() == 10


def test_appends_follow_the_active_spec_and_conflicts_raise(
    spark, tmp_path
):
    table = str(tmp_path / "t")
    _flat_then_partitioned(spark, table)
    more = spark.createDataFrame(
        [Row(k=500, day=7, v="x")], "k int, day int, v string"
    )
    with pytest.raises(ValueError, match="partitioned by"):
        txlog.commit(more, table, partition_by=["v"])
    v = txlog.commit(more, table)  # inherits ['day']
    rec = txlog._last_commit(table)
    assert all("day=7" in rel for rel in rec["add"])
    assert txlog.read_table(spark, table, v).count() == 61


def test_dml_and_optimize_across_mixed_eras(spark, tmp_path):
    table = str(tmp_path / "t")
    want = _flat_then_partitioned(spark, table)
    txlog.delete_where_expr(spark, table, "day = 2", mode="dv")
    txlog.update_where_expr(
        spark, table, "day = 0", {"v": "'z'"}, mode="dv"
    )
    got = txlog.read_table(spark, table)
    assert got.where("day = 2").count() == 0
    assert got.where("v = 'z'").count() == 20
    assert got.count() == 40
    # OPTIMIZE materializes the ACTIVE spec: afterwards every data
    # file encodes day in its path (incremental Iceberg migration)
    txlog.optimize(spark, table, target_file_mb=64)
    rec = txlog._last_commit(table)
    assert rec["add"] and all("day=" in rel for rel in rec["add"])
    got2 = txlog.read_table(spark, table)
    assert {(r["k"], r["day"]) for r in got2.collect()} == {
        (k, d) for (k, d) in want if d != 2
    }


def test_set_partition_spec_guards(spark, tmp_path):
    table = str(tmp_path / "t")
    txlog.commit(
        spark.createDataFrame([Row(k=1, day=2)], "k int, day int"),
        table,
    )
    with pytest.raises(ValueError, match="not in"):
        txlog.set_partition_spec(table, ["nope"])
    with pytest.raises(ValueError, match="duplicate"):
        txlog.set_partition_spec(table, ["day", "DAY"])
    with pytest.raises(FileNotFoundError):
        txlog.set_partition_spec(str(tmp_path / "ghost"), ["day"])


# ---------------------------------------------------------------------------
# Iceberg-style partition TRANSFORMS (VERDICT r11 'What's missing' #5):
# bucket(N, col) / truncate(W, col) / days(col) as spec entries — the
# shapes a 100 TB table actually partitions by (identity on a
# high-cardinality column is one directory per value).
# ---------------------------------------------------------------------------


def test_bucket_transform_layout_and_pruned_read(spark, tmp_path):
    """bucket(4, user_id): 4 directories regardless of user
    cardinality; the source column STAYS in the data files; the
    listing prune recomputes the bucket in Python and keeps only the
    matching directory; the row filter makes the result exact."""
    import zlib

    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [Row(user_id=i, v=i * 10) for i in range(200)],
        "user_id long, v long",
    )
    txlog.commit(df, table, partition_by=["bucket(4, user_id)"])
    rec = txlog._last_commit(table)
    assert rec["partition_by"] == ["bucket(4, user_id)"]
    buckets = {rel.split("user_id_bucket4=")[1].split("/")[0]
               for rel in rec["add"]}
    assert buckets <= {"0", "1", "2", "3"}
    # JVM bucket == Python bucket, bit for bit
    got = txlog.read_table_partitioned(spark, table, {"user_id": 77})
    assert [(r["user_id"], r["v"]) for r in got.collect()] == [(77, 770)]
    want_bucket = zlib.crc32(b"77") % 4
    kept_dirs = {
        rel.split("user_id_bucket4=")[1].split("/")[0]
        for rel in rec["add"]
        if not txlog._part_value_match(  # reuse: which dirs survive?
            rel.split("user_id_bucket4=")[1].split("/")[0],
            want_bucket,
        ) is False
    }
    assert kept_dirs == {str(want_bucket)}
    # the pruned plan reads ONLY the matching bucket's files
    files = got.inputFiles()
    assert files and all(
        f"user_id_bucket4={want_bucket}" in f for f in files
    )


def test_truncate_and_days_transforms(spark, tmp_path):
    """truncate(3, country) prefixes strings; days(ts) formats
    timestamps to yyyy-MM-dd — and both prune from the listing."""
    import datetime

    table = str(tmp_path / "t")
    rows = [
        Row(
            country=c,
            ts=datetime.datetime(2024, 1, d, 12, 0, 0),
            v=i,
        )
        for i, (c, d) in enumerate(
            [("germany", 1), ("georgia", 1), ("france", 2),
             ("finland", 2), ("germany", 3)]
        )
    ]
    df = spark.createDataFrame(
        rows, "country string, ts timestamp, v int"
    )
    txlog.commit(
        df, table, partition_by=["truncate(3, country)", "days(ts)"]
    )
    rec = txlog._last_commit(table)
    assert any("country_trunc3=ger" in rel for rel in rec["add"])
    assert any("ts_day=2024-01-02" in rel for rel in rec["add"])
    # source columns are IN the files: a plain snapshot read has them
    got = txlog.read_table(spark, table)
    assert got.count() == 5
    assert {r["country"] for r in got.collect()} == {
        "germany", "georgia", "france", "finland"
    }
    # listing prune on the string source
    fr = txlog.read_table_partitioned(spark, table, {"country": "france"})
    assert fr.count() == 1
    assert all("country_trunc3=fra" in f for f in fr.inputFiles())
    # listing prune on the timestamp source
    d2 = txlog.read_table_partitioned(
        spark, table, {"ts": datetime.datetime(2024, 1, 2, 12, 0, 0)}
    )
    assert d2.count() == 2
    assert all("ts_day=2024-01-02" in f for f in d2.inputFiles())


def test_transform_evolution_reparameterized_bucket_stays_sound(
    spark, tmp_path
):
    """bucket(2) era → bucket(4) era: the derived segment name embeds
    the parameter, so the old era answers probes with mod-2 and the
    new with mod-4 — reads stay exact across the boundary and each
    era prunes with its own arithmetic."""
    import zlib

    table = str(tmp_path / "t")
    df1 = spark.createDataFrame(
        [Row(user_id=i, v=i) for i in range(0, 50)],
        "user_id long, v long",
    )
    txlog.commit(df1, table, partition_by=["bucket(2, user_id)"])
    txlog.set_partition_spec(table, ["bucket(4, user_id)"])
    df2 = spark.createDataFrame(
        [Row(user_id=i, v=i) for i in range(50, 100)],
        "user_id long, v long",
    )
    txlog.commit(df2, table)
    got = txlog.read_table(spark, table)
    assert got.count() == 100
    # probe a value from EACH era: result exact, and the kept files
    # from each era live in that era's matching directory
    for probe in (7, 93):
        pr = txlog.read_table_partitioned(
            spark, table, {"user_id": probe}
        )
        assert [r["user_id"] for r in pr.collect()] == [probe]
        files = pr.inputFiles()
        b2 = zlib.crc32(str(probe).encode()) % 2
        b4 = zlib.crc32(str(probe).encode()) % 4
        for f in files:
            if "user_id_bucket2=" in f:
                assert f"user_id_bucket2={b2}" in f
            if "user_id_bucket4=" in f:
                assert f"user_id_bucket4={b4}" in f


def test_transform_spec_guards_and_dml(spark, tmp_path):
    table = str(tmp_path / "t")
    txlog.commit(
        spark.createDataFrame(
            [Row(user_id=i, user_id_bucket4=i, v=i) for i in range(3)],
            "user_id long, user_id_bucket4 long, v long",
        ),
        table,
    )
    # derived name collides with a real column → refuse
    with pytest.raises(ValueError, match="collide"):
        txlog.set_partition_spec(table, ["bucket(4, user_id)"])
    # unknown source inside a transform → refuse
    with pytest.raises(ValueError, match="not in"):
        txlog.set_partition_spec(table, ["bucket(4, nope)"])

    table2 = str(tmp_path / "t2")
    txlog.commit(
        spark.createDataFrame(
            [Row(user_id=i, v=float(i)) for i in range(40)],
            "user_id long, v double",
        ),
        table2,
        partition_by=["bucket(4, user_id)"],
        stats_cols=["v"],
    )
    # renaming/dropping a transform SOURCE is refused (name is baked
    # into the derived segment grammar)
    with pytest.raises(ValueError, match="partition column"):
        txlog.rename_column(table2, "user_id", "uid")
    with pytest.raises(ValueError, match="partition column"):
        txlog.drop_column(table2, "user_id")
    # DML on a transform-partitioned table: replace inherits the spec
    txlog.update_where(
        spark, table2, "v", 10.0, 19.0, {"v": "v + 100"},
        stats_cols=["v"],
    )
    got = txlog.read_table(spark, table2)
    assert got.where("v >= 110 and v <= 119").count() == 10
    assert got.count() == 40
    rec = txlog._last_commit(table2)
    assert all("user_id_bucket4=" in rel for rel in rec["add"])


def test_time_transform_grains(spark, tmp_path):
    """hours/months/years complete the Iceberg time-transform family:
    chronologically-ordered string segments, each a prefix of the
    finer grain, each pruning from the listing via the Python twin."""
    import datetime

    rows = [
        Row(ts=datetime.datetime(2023, 12, 31, 23, 5), v=1),
        Row(ts=datetime.datetime(2024, 1, 2, 13, 45), v=2),
        Row(ts=datetime.datetime(2024, 1, 2, 14, 10), v=3),
        Row(ts=datetime.datetime(2024, 3, 9, 8, 0), v=4),
    ]
    for grain, seg, probe_files in (
        ("hours(ts)", "ts_hour=2024-01-02-13", 1),
        ("months(ts)", "ts_month=2024-01", 2),
        ("years(ts)", "ts_year=2024", 3),
    ):
        table = str(tmp_path / grain.split("(")[0])
        txlog.commit(
            spark.createDataFrame(rows, "ts timestamp, v int"),
            table,
            partition_by=[grain],
        )
        rec = txlog._last_commit(table)
        assert any(seg in rel for rel in rec["add"]), (grain, rec["add"])
        pr = txlog.read_table_partitioned(
            spark, table,
            {"ts": datetime.datetime(2024, 1, 2, 13, 45)},
        )
        assert [r["v"] for r in pr.collect()] == [2]
        files = pr.inputFiles()
        # listing prune kept only the probe's grain-matching files
        assert files and all(seg.split("=")[0] + "=" in f for f in files)
        got_dirs = {
            f.split(seg.split("=")[0] + "=")[1].split("/")[0]
            for f in files
        }
        assert got_dirs == {seg.split("=")[1]}, (grain, got_dirs)


def test_txtable_source_reads_transform_partitioned_table(
    spark, tmp_path
):
    """The Arrow-side Python DataSource reads a transform-partitioned
    table identically to the fast path: transform SOURCE columns live
    in the data files (nothing to resolve from paths), the derived
    segment dirs are just path levels."""
    import datetime

    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            Row(
                user_id=i,
                ts=datetime.datetime(2024, 1, 1 + i % 3, 8),
                v=i,
            )
            for i in range(30)
        ],
        "user_id long, ts timestamp, v int",
    )
    txlog.commit(
        df, table, partition_by=["bucket(4, user_id)", "days(ts)"]
    )
    fast = sorted(
        map(tuple, txlog.read_table(spark, table).collect())
    )
    from parquet_combiner_spark.sources.txtable_source import (
        TxTableDataSource,
    )

    spark.dataSource.register(TxTableDataSource)
    via_source = sorted(
        map(
            tuple,
            spark.read.format("txtable")
            .option("path", table)
            .load()
            .collect(),
        )
    )
    assert via_source == fast and len(fast) == 30


def test_transform_value_rejects_unsafe_time_probes():
    """ADVICE r12 (medium): a tz-aware datetime renders in its OWN tz
    while the path was rendered in the writer session's tz, and a
    non-zero-padded string probe reshapes to a value the writer
    grammar never mints — both must degrade to None (keep the file),
    never to a confident wrong skip."""
    import datetime as dt

    aware = dt.datetime(
        2024, 1, 2, 0, 30, tzinfo=dt.timezone(dt.timedelta(hours=5))
    )
    assert txlog._transform_value("days", None, aware) is None
    assert txlog._transform_value("hours", None, aware) is None
    # non-zero-padded hour: '2024-01-02-9:' fails the grammar
    assert txlog._transform_value("hours", None, "2024-01-02 9:45") is None
    # non-zero-padded month at days grain: '2024-1-02…' fails too
    assert txlog._transform_value("days", None, "2024-1-02 09:45") is None
    # zero-padded probes still transform exactly as the writer does
    assert (
        txlog._transform_value("hours", None, "2024-01-02 09:45")
        == "2024-01-02-09"
    )
    naive = dt.datetime(2024, 1, 2, 9, 45)
    assert txlog._transform_value("days", None, naive) == "2024-01-02"


def test_commit_partition_by_runs_spec_guards(spark, tmp_path):
    """ADVICE r12 (low): commit(partition_by=...) enforces the same
    derived-name collision and duplicate guards as set_partition_spec
    — a data column named like a derived segment would be silently
    overwritten and moved into the path (data loss)."""
    df = spark.createDataFrame(
        [Row(x=1, x_bucket8=9, v="a")],
        "x int, x_bucket8 int, v string",
    )
    with pytest.raises(ValueError, match="collide"):
        txlog.commit(
            df, str(tmp_path / "t1"), partition_by=["bucket(8, x)"]
        )
    df2 = spark.createDataFrame([Row(x=1, v="a")], "x int, v string")
    with pytest.raises(ValueError, match="duplicate"):
        txlog.commit(
            df2,
            str(tmp_path / "t2"),
            partition_by=["bucket(8, x)", "bucket(8, x)"],
        )


# ---------------------------------------------------------------------------
# HIDDEN-PARTITION predicate pruning (VERDICT r12 order #3): plain
# range/equality bands prune transform directories — days(ts) from ts
# ranges, bucket/truncate from equality bands — with zero footer
# reads, inside read_table_pruned* and the DML verbs' _band_touched.
# ---------------------------------------------------------------------------


def test_path_band_disjoint_unit():
    d = txlog._path_band_disjoint
    INF = float("inf")
    # identity segments: typed compares, NULL prunes, junk keeps
    assert d("data/c/day=3/p.parquet", "day", 5, 9) is True
    assert d("data/c/day=7/p.parquet", "day", 5, 9) is False
    assert d("data/c/day=3/p.parquet", "day", -INF, 2) is True
    assert d("data/c/day=3/p.parquet", "day", -INF, 5) is False
    assert d("data/c/day=3/p.parquet", "day", 4, INF) is True
    assert d("data/c/c=de/p.parquet", "c", "fr", "it", "string") is True
    assert d("data/c/c=fr/p.parquet", "c", "fr", "it", "string") is False
    # ...but LEX compares need a DECLARED string/date column: the
    # directory value alone can't reveal the type, and Spark coerces
    # string-literal predicates on numeric columns NUMERICALLY —
    # "999" > "2000" lex would wrongly prune 999 ∈ [100, 2000]
    assert d("data/c/c=de/p.parquet", "c", "fr", "it") is False
    assert (
        d("data/c/k=999/p.parquet", "k", "100", "2000", "bigint")
        is False
    )
    assert (
        d("data/c/c=__HIVE_DEFAULT_PARTITION__/p.parquet", "c", 1, 2)
        is True
    )
    assert d("data/c/day=junk/p.parquet", "day", 5, 9) is False
    # days(ts): monotone prefix — string bands at any finer grain,
    # sound only for DECLARED timestamp/date sources (a string
    # column's raw lex order is not its calendar order)
    assert (
        d(
            "data/c/ts_day=2024-01-05/p.parquet",
            "ts",
            "2024-01-10 00:00:00",
            "2024-01-12 23:59:59",
            "timestamp",
        )
        is True
    )
    assert (
        d(
            "data/c/ts_day=2024-01-11/p.parquet",
            "ts",
            "2024-01-10 00:00:00",
            "2024-01-12 23:59:59",
            "timestamp",
        )
        is False
    )
    assert (
        d(
            "data/c/ts_day=2024-01-05/p.parquet",
            "ts",
            "2024-01-10 00:00:00",
            "2024-01-12 23:59:59",
        )
        is False
    )
    assert (
        d(
            "data/c/ts_day=2024-01-05/p.parquet",
            "ts",
            "2024-01-10 00:00:00",
            "2024-01-12 23:59:59",
            "string",
        )
        is False
    )
    # half-open band: only the bounded edge constrains
    assert (
        d("data/c/ts_day=2024-01-05/p.parquet", "ts", "2024-01-06",
          -0.0, "timestamp")
        is False
    )  # mixed types: keep
    assert (
        d(
            "data/c/ts_day=2024-01-05/p.parquet",
            "ts",
            "2024-01-06 00:00:00",
            INF,
            "timestamp",
        )
        is True
    )
    # grammar-failing segment rendering: keep, never compare
    assert (
        d(
            "data/c/ts_day=05-01-2024/p.parquet",
            "ts",
            "2024-01-06 00:00:00",
            INF,
            "timestamp",
        )
        is False
    )
    # truncate: numeric floor and string prefix are monotone — but
    # the arithmetic family must match the DECLARED column type (a
    # numeric band over a string column's prefix segment would apply
    # floor math to prefixes: "0123"'s 2-char prefix parses as 1,
    # wrongly pruned by a [100, 200] band the row 123 matches)
    assert d("data/c/k_trunc10=40/p.parquet", "k", 55, 78, "bigint") is True
    assert d("data/c/k_trunc10=70/p.parquet", "k", 55, 78, "bigint") is False
    assert d("data/c/k_trunc10=40/p.parquet", "k", 55, 78) is False
    assert d("data/c/k_trunc2=01/p.parquet", "k", 100, 200, "string") is False
    assert (
        d("data/c/s_trunc2=ab/p.parquet", "s", "ba", "bz", "string")
        is True
    )
    assert (
        d("data/c/s_trunc2=ba/p.parquet", "s", "babb", "bb", "string")
        is False
    )
    assert d("data/c/s_trunc2=ab/p.parquet", "s", "ba", "bz") is False
    # bucket: point bands only, type-consistent renderings only
    # (a string column holding '042' hashes differently from the int
    # probe 42 that would match it row-level); range bands keep
    import zlib

    b = zlib.crc32(b"42") % 8
    assert (
        d(f"data/c/u_bucket8={b}/p.parquet", "u", 42, 42, "bigint")
        is False
    )
    assert (
        d(f"data/c/u_bucket8={(b + 1) % 8}/p.parquet", "u", 42, 42,
          "bigint")
        is True
    )
    assert (
        d(f"data/c/u_bucket8={(b + 1) % 8}/p.parquet", "u", 42, 42,
          "string")
        is False
    )
    assert (
        d(f"data/c/u_bucket8={(b + 1) % 8}/p.parquet", "u", "42", "42",
          "string")
        is True
    )
    assert d(f"data/c/u_bucket8={(b + 1) % 8}/p.parquet", "u", 42, 42) is False
    assert (
        d(f"data/c/u_bucket8={(b + 1) % 8}/p.parquet", "u", 40, 45,
          "bigint")
        is False
    )


def test_hidden_partition_days_range_prunes_listing(spark, tmp_path):
    """A plain ts-range pruned read on a days(ts) layout opens only
    the matching day directories — no explicit partition dict, no
    zone maps recorded (stats-free table: the PATH is the only
    metadata), Iceberg's headline trick."""
    import datetime

    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            Row(
                ts=datetime.datetime(2024, 1, 1 + i % 6, 8, 30),
                k=i,
            )
            for i in range(60)
        ],
        "ts timestamp, k int",
    )
    txlog.commit(df, table, partition_by=["days(ts)"])
    pr = txlog.read_table_pruned(
        spark, table, "ts", "2024-01-02 00:00:00", "2024-01-03 23:59:59"
    )
    assert pr.count() == 20
    kept = pr.inputFiles()
    assert kept
    assert all(
        "ts_day=2024-01-02" in f or "ts_day=2024-01-03" in f
        for f in kept
    )
    # multi-band conjunction: days segment AND a k zone... no stats →
    # k contributes nothing, ts still prunes the listing
    pm = txlog.read_table_pruned_multi(
        spark,
        table,
        {"ts": ("2024-01-02 00:00:00", "2024-01-02 23:59:59")},
    )
    assert pm.count() == 10
    assert all("ts_day=2024-01-02" in f for f in pm.inputFiles())


def test_hidden_partition_bucket_point_reads_prune(spark, tmp_path):
    """Equality/IN point bands consult the bucket layout — the
    read_table_pruned_in batch probe opens only the probes' bucket
    directories, era arithmetic per file name."""
    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [Row(u=i, v=i * 10) for i in range(200)], "u long, v long"
    )
    txlog.commit(df, table, partition_by=["bucket(8, u)"])
    pr = txlog.read_table_pruned_in(spark, table, "u", [42, 43])
    assert sorted(r["v"] for r in pr.collect()) == [420, 430]
    import zlib

    want = {zlib.crc32(str(x).encode()) % 8 for x in (42, 43)}
    kept = pr.inputFiles()
    assert kept and all(
        any(f"u_bucket8={b}" in f for b in want) for f in kept
    )
    # a point band through read_table_pruned prunes the same way
    eq = txlog.read_table_pruned(spark, table, "u", 42, 42)
    assert eq.count() == 1
    b42 = zlib.crc32(b"42") % 8
    assert all(f"u_bucket8={b42}" in f for f in eq.inputFiles())


def test_hidden_partition_bands_prune_expression_dml(spark, tmp_path):
    """The DML verbs' shared _band_touched consults transform paths:
    an expression DELETE whose band hits one day touches (and
    rewrites) only that day's files."""
    import datetime

    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            Row(
                ts=datetime.datetime(2024, 1, 1 + i % 6, 8, 30),
                k=i,
            )
            for i in range(60)
        ],
        "ts timestamp, k int",
    )
    txlog.commit(df, table, partition_by=["days(ts)"])
    n_all = len(txlog.read_table(spark, table).inputFiles())
    txlog.delete_where_expr(
        spark,
        table,
        "ts BETWEEN '2024-01-03 00:00:00' AND '2024-01-03 23:59:59'",
    )
    rec = txlog._read_log(table)[-1]
    assert rec["action"] == "replace"
    assert all("ts_day=2024-01-03" in r for r in rec["remove"])
    assert len(rec["remove"]) < n_all
    assert txlog.read_table(spark, table).count() == 50
