from parquet_combiner_spark.plans.checks import (  # noqa: F401
    assert_broadcast_join,
    assert_in_plan,
    assert_no_cartesian_product,
    assert_not_in_plan,
    assert_partial_aggregate,
    assert_pushed_filters,
    plan_text,
)
