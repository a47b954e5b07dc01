"""Property-based invariants (SURVEY.md §5.3) — hypothesis generates
adversarial small tables; each property must hold for ANY input:

- dedup: one survivor per key; survivors are input rows; keep-min and
  window formulations agree.
- top-K: ranks are exactly 1..min(K, distinct items) per group; ranked
  counts are a subset of the full counts.
- salted aggregation: identical to the plain group-count for any data
  and any salt column (reference UnitTest.scala:528-591 generalized).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from parquet_combiner_spark.operators.aggregate import group_counts
from parquet_combiner_spark.operators.dedup import (
    dedup_deterministic,
    dedup_first_wins,
    dedup_keep_min,
)
from parquet_combiner_spark.operators.skew import salted_count
from parquet_combiner_spark.operators.topk import top_k_per_group

# (key, group, item, val) rows from tight domains → many collisions,
# nulls in the item column included deliberately.
ROW = st.tuples(
    st.integers(0, 9),
    st.integers(0, 3),
    st.one_of(st.none(), st.sampled_from(["a", "b", "c", ""])),
    st.integers(-5, 5),
)
ROWS = st.lists(ROW, min_size=1, max_size=30)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "key long, grp long, item string, val long"
    )


@pytest.mark.usefixtures("spark")
class TestProperties:
    @given(rows=ROWS)
    @SETTINGS
    def test_dedup_one_survivor_per_key(self, spark, rows):
        df = _df(spark, rows)
        out = dedup_first_wins(df, ["key"]).collect()
        keys = [r["key"] for r in out]
        assert sorted(set(keys)) == sorted({r[0] for r in rows})
        assert len(keys) == len(set(keys))
        # every survivor is a real input row
        assert all(tuple(r) in set(rows) for r in out)

    @given(rows=ROWS)
    @SETTINGS
    def test_dedup_keep_min_matches_window_form(self, spark, rows):
        df = _df(spark, rows)
        a = dedup_keep_min(df, ["key"], ["val", "grp", "item"])
        b = dedup_deterministic(
            df,
            ["key"],
            [F.asc("val"), F.asc("grp"), F.asc_nulls_first("item")],
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    @given(rows=ROWS, k=st.integers(1, 4))
    @SETTINGS
    def test_topk_ranks_sequential(self, spark, rows, k):
        counts = group_counts(_df(spark, rows), ["grp", "item"], "n")
        ranked = top_k_per_group(
            counts,
            ["grp"],
            [F.desc("n"), F.asc_nulls_first("item")],
            k,
            rank_col="rank",
        )
        per_group: dict = {}
        for r in ranked.collect():
            per_group.setdefault(r["grp"], []).append(r["rank"])
        n_items = {
            g: len({r[2] for r in rows if r[1] == g}) for g in per_group
        }
        for g, ranks in per_group.items():
            assert sorted(ranks) == list(range(1, min(k, n_items[g]) + 1))

    @given(rows=ROWS)
    @SETTINGS
    def test_salted_count_equals_plain(self, spark, rows):
        df = _df(spark, rows)
        plain = {
            (r["grp"],): r["n"]
            for r in group_counts(df, ["grp"], "n").collect()
        }
        salted = {
            (r["grp"],): r["n"]
            for r in salted_count(df, ["grp"], salt_col="key", count_col="n")
            .collect()
        }
        assert plain == salted
