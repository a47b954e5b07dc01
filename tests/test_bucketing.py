"""Bucketed-write tests: the write-once-shuffle-never property that
makes repeatedly-joined 100 TB fact tables tractable."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_combiner_spark.plans import plan_text
from parquet_combiner_spark.sources.io import write_bucketed


def test_bucketed_join_has_no_shuffle(spark):
    orders = spark.range(1000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("status")
    )
    items = spark.range(3000).select(
        (F.col("id") % 1000).alias("o_key"), F.col("id").alias("item_id")
    )
    write_bucketed(orders, "b_orders", ["o_key"], num_buckets=8)
    write_bucketed(items, "b_items", ["o_key"], num_buckets=8)

    a = spark.table("b_orders")
    b = spark.table("b_items")
    # force the shuffle-sensitive path: no broadcast allowed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "o_key")
        plan = plan_text(joined)
        assert "SortMergeJoin" in plan
        # the whole point: bucket layout satisfies the join's
        # distribution requirement — no exchange on either side
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 3000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")


def test_bucketed_aggregation_has_no_shuffle(spark):
    ev = spark.range(2000).select(
        (F.col("id") % 100).alias("user_id"), F.col("id").alias("v")
    )
    write_bucketed(ev, "b_events", ["user_id"], num_buckets=8)
    try:
        agg = spark.table("b_events").groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = plan_text(agg)
        assert "Exchange hashpartitioning" not in plan
        assert agg.count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS b_events")
