"""Behavioral parity with the reference's test scenarios.

Each test cites the reference scenario it ports (SURVEY.md §5.1-5.2;
files under /root/reference/src/test/scala/com/htx/).
"""

from __future__ import annotations

from conftest import make_data_a, make_data_b

from parquet_combiner_spark.pipeline import (
    all_aggregations,
    item_count,
    location_stats,
    top_items,
)

# Canonical 18-row fixture (ParquetCombinerRDDIntegrationTest.scala:81-105):
# loc1: apple x2, banana x2 (+dup oid 1005), cherry
# loc2: apple x2 (+dup oid 2005), banana, orange, grape
# loc3: watermelon x2, apple, banana, orange, grape
CANONICAL_A = [
    (1, 101, 1001, "apple", 1000),
    (1, 101, 1002, "apple", 1001),
    (1, 102, 1003, "banana", 1002),
    (1, 102, 1004, "banana", 1003),
    (1, 102, 1005, "banana", 1004),
    (1, 103, 1005, "banana", 1005),  # dup oid 1005
    (1, 103, 1006, "cherry", 1006),
    (2, 201, 2001, "apple", 2000),
    (2, 201, 2002, "apple", 2001),
    (2, 202, 2005, "apple", 2002),
    (2, 202, 2003, "banana", 2003),
    (2, 203, 2005, "apple", 2004),  # dup oid 2005
    (2, 203, 2004, "orange", 2005),
    (2, 204, 2006, "grape", 2006),
    (3, 301, 3001, "watermelon", 3000),
    (3, 301, 3002, "watermelon", 3001),
    (3, 302, 3003, "apple", 3002),
    (3, 302, 3004, "banana", 3003),
]
CANONICAL_B = [(1, "New York"), (2, "San Francisco"), (3, "Los Angeles")]


def rows_set(df):
    return {tuple(r) for r in df.collect()}


def test_dedup_and_join_correctness(spark):
    """Duplicate detection_oid counted once (UnitTest.scala:61-102)."""
    a = make_data_a(spark, CANONICAL_A)
    b = make_data_b(spark, CANONICAL_B)
    out = item_count(a, b)
    got = {(r[0], r[1]): r[2] for r in out.collect()}
    # loc1: banana has 4 rows but oid 1005 duplicated -> 3
    assert got[(1, "banana")] == 3
    assert got[(1, "apple")] == 2
    # loc2: apple has 4 rows, oid 2005 duplicated -> 3 distinct oids
    assert got[(2, "apple")] == 3
    assert got[(3, "watermelon")] == 2


def test_rank_order_and_stringness(spark):
    """Ranks are strings '1','2',... in count-desc order
    (UnitTest.scala:105-156; IntegrationTest.scala:188-211)."""
    a = make_data_a(spark, CANONICAL_A)
    b = make_data_b(spark, CANONICAL_B)
    out = top_items(a, b, top_x=5)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "string",
        "string",
        "string",
    ]
    ny = {r["item_rank"]: r["item_name"] for r in out.collect()
          if r["geographical_location"] == "New York"}
    assert ny["1"] == "banana"  # 3 after dedup
    assert ny["2"] == "apple"   # 2
    assert ny["3"] == "cherry"  # 1


def test_topx_parameter(spark):
    """topX=2 on canonical fixture -> exactly 6 rows, ranks sequential
    (IntegrationTest.scala:267-319; UnitTest.scala:307-355)."""
    a = make_data_a(spark, CANONICAL_A)
    b = make_data_b(spark, CANONICAL_B)
    out = top_items(a, b, top_x=2).collect()
    assert len(out) == 6
    for loc in ("New York", "San Francisco", "Los Angeles"):
        ranks = sorted(r["item_rank"] for r in out
                       if r["geographical_location"] == loc)
        assert ranks == ["1", "2"]


def test_empty_input(spark):
    """Empty dataA -> empty result (UnitTest.scala:357-377)."""
    a = make_data_a(spark, [])
    b = make_data_b(spark, CANONICAL_B)
    assert top_items(a, b, 5).count() == 0


def test_unknown_location_and_no_detection_location(spark):
    """Location missing from dataB -> 'Unknown'; location with no
    detections -> absent (UnitTest.scala:594-628; RDD.scala:189)."""
    a = make_data_a(spark, [(7, 701, 7001, "kiwi", 1)])
    b = make_data_b(spark, [(1, "Ghost Town")])  # loc 7 unknown; loc 1 silent
    out = top_items(a, b, 5).collect()
    assert len(out) == 1
    assert out[0]["geographical_location"] == "Unknown"
    assert out[0]["item_name"] == "kiwi"


def test_null_and_empty_item_names_survive(spark):
    """null and '' are legal group keys (UnitTest.scala:667-702)."""
    a = make_data_a(
        spark,
        [
            (1, 101, 1, None, 10),
            (1, 101, 2, None, 11),
            (1, 102, 3, "", 12),
            (1, 102, 4, "apple", 13),
        ],
    )
    b = make_data_b(spark, [(1, "X")])
    out = top_items(a, b, 5).collect()
    items = {r["item_name"] for r in out}
    assert None in items and "" in items and "apple" in items
    by_rank = {r["item_rank"]: r["item_name"] for r in out}
    assert by_rank["1"] is None  # count 2, null sorts first on tiebreak


def test_topx_greater_than_available(spark):
    """topX > distinct items -> all items, ranks still sequential
    (UnitTest.scala:631-664)."""
    a = make_data_a(spark, [(1, 101, 1, "a", 1), (1, 101, 2, "b", 2)])
    b = make_data_b(spark, [(1, "X")])
    out = top_items(a, b, 99).collect()
    assert sorted(r["item_rank"] for r in out) == ["1", "2"]


def test_heavy_duplication_collapses(spark):
    """oids 1001x3 + 1002x2 -> 2 surviving detections
    (IntegrationTest.scala:321-378)."""
    a = make_data_a(
        spark,
        [
            (1, 101, 1001, "apple", 1),
            (1, 102, 1001, "apple", 2),
            (1, 103, 1001, "apple", 3),
            (1, 101, 1002, "banana", 4),
            (1, 102, 1002, "banana", 5),
        ],
    )
    b = make_data_b(spark, [(1, "X")])
    got = {(r[1]): r[2] for r in item_count(a, b).collect()}
    assert got == {"apple": 1, "banana": 1}


def test_location_stats(spark):
    """total=3 / unique=2 / most_active_camera=101
    (UnitTest.scala:462-525)."""
    a = make_data_a(
        spark,
        [
            (1, 101, 1, "apple", 1),
            (1, 101, 2, "banana", 2),
            (1, 102, 3, "apple", 3),
            (2, 201, 4, "cherry", 4),
        ],
    )
    out = {r["geographical_location_oid"]: r for r in
           location_stats(make_data_a(spark, []).unionByName(a)).collect()}
    assert out[1]["total_detections"] == 3
    assert out[1]["unique_items"] == 2
    assert out[1]["most_active_camera"] == 101
    assert out[2]["total_detections"] == 1


def test_all_aggregations_shared_dedup(spark):
    """all_aggregations serves the three reference queries from one
    persisted dedup and agrees with each standalone query."""
    da = make_data_a(spark, CANONICAL_A)
    db = make_data_b(spark, CANONICAL_B)
    res = all_aggregations(da, db, top_x=5)
    try:
        assert sorted(map(tuple, res["top_items"].collect())) == sorted(
            map(tuple, top_items(da, db, 5).collect())
        )
        assert sorted(map(tuple, res["item_count"].collect())) == sorted(
            map(tuple, item_count(da).collect())
        )
        assert sorted(map(tuple, res["location_stats"].collect())) == sorted(
            map(tuple, location_stats(da).collect())
        )
    finally:
        res["_deduped"].unpersist()


def test_dedup_across_locations(spark):
    """Same detection_oid appearing under two locations counts once
    globally — first-wins arbitrary representative
    (UnitTest.scala:158-228: 5 not 6)."""
    a = make_data_a(
        spark,
        [
            (1, 101, 1, "a", 1),
            (1, 101, 2, "a", 2),
            (1, 101, 3, "b", 3),
            (2, 201, 3, "b", 4),  # dup oid crossing locations
            (2, 201, 4, "c", 5),
            (2, 201, 5, "d", 6),
        ],
    )
    total = item_count(a, None).agg({"count": "sum"}).collect()[0][0]
    assert total == 5
