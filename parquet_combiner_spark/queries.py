"""Named query registry over the driver testdata tables.

This is the engine's public query surface (SURVEY.md §2.11: the
reference's string-keyed AggregationFactory —
reference services/AggregationFactory.scala:29-37 — generalized to a
``dict[str, Callable[[SparkSession, sf_dir], DataFrame]]``). Each
query exercises one or more operators from SURVEY.md §2 against the
TPC-H-ish testdata, and has a matching ANSI-SQL oracle in
:data:`ORACLE_SQL` (DuckDB-runnable) with IDENTICAL column aliases.

Determinism contract (SURVEY.md §7.4 risk 1): every ranking has a
total tiebreak order, every dedup is deterministic or on a true key,
and every float aggregate is rounded identically on both sides, so an
order-insensitive value hash matches between Spark and DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_combiner_spark.operators.aggregate import (
    distinct_count,
    group_counts,
    group_stats,
    summary_stats,
)
from parquet_combiner_spark.operators.dedup import (
    dedup_keep_min,
    dedup_keep_min_packed,
)
from parquet_combiner_spark.operators.join import broadcast_dim_join
from parquet_combiner_spark.operators.skew import salted_count
from parquet_combiner_spark.operators.topk import top_k_per_group
from parquet_combiner_spark.sources.io import ensure_ts_nanos, table_path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts physical type depends on the testdata generation:
    earlier rounds shipped parquet TIMESTAMP(NANOS) (readable only as
    a long via the legacy conf), current testdata TIMESTAMP(MICROS)
    which Spark reads natively as timestamp_ntz. Normalize to integer
    nanos-since-epoch (:func:`ensure_ts_nanos`) so every downstream
    gap/span computation is exact integer math and agrees with the
    DuckDB oracles' ``epoch_ns(ts)`` under either representation.

    The conf set here is session-wide BY NECESSITY: it is consulted
    lazily at scan time, so a save/restore around the read would break
    the returned (lazy) DataFrame. It is also an engine default
    (session.py) — setting it here covers driver-owned sessions not
    built by our factory. Scope of the side effect: it only changes
    how TIMESTAMP(NANOS) parquet columns are read (long instead of an
    analysis error); timestamps of other precisions are unaffected."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return ensure_ts_nanos(spark.read.parquet(table_path(sf_dir, "events")))


# ---------------------------------------------------------------------------
# Reference-parity queries (SURVEY.md §2) on the testdata domain
# ---------------------------------------------------------------------------


def top_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (A2+A1+J1+D1, reference services/Aggregations.scala:33-76):
    per-supplier top-5 parts by lineitem count, dedup on the fact's
    true key, rank via window, broadcast-left-join the supplier dim
    with "Unknown" default, rank cast to string at the boundary
    (reference ParquetCombinerRDD.scala:194-200 string-rank parity).
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_orderkey", "l_linenumber"
    )
    # The testdata plants ~24% duplicate (orderkey, linenumber) keys —
    # the analog of the reference's 15% duplicate detection_oids. The
    # deterministic dedup keeps the lowest (partkey, suppkey) row per
    # key so the oracle can reproduce the exact surviving payload
    # (SURVEY.md §7.4 risk 1; first-wins D1 semantics are covered by
    # the ported reference tests instead). Packed aggregation form:
    # (partkey, suppkey) ride one long, so the dedup is a plain
    # min — HashAggregate with map-side combine, no sort at all.
    deduped = dedup_keep_min_packed(
        li,
        ["l_orderkey", "l_linenumber"],
        ["l_partkey", "l_suppkey"],
    )
    counts = group_counts(deduped, ["l_suppkey", "l_partkey"], "part_count")
    ranked = top_k_per_group(
        counts,
        ["l_suppkey"],
        [F.desc("part_count"), F.asc("l_partkey")],
        5,
        rank_col="part_rank",
    )
    dim = (
        _t(spark, sf_dir, "supplier")
        .select(F.col("s_suppkey").alias("l_suppkey"), "s_name")
    )
    return broadcast_dim_join(
        ranked, dim, key="l_suppkey", defaults={"s_name": "Unknown"}
    ).select(
        "l_suppkey",
        F.col("s_name").alias("supplier_name"),
        "l_partkey",
        "part_count",
        F.col("part_rank").cast("string").alias("part_rank"),
    )


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A3: grouped sums/avgs/counts (TPC-H Q1 shape). Floats rounded
    identically to the oracle so summation-order noise cancels."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
        ).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


def supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+A4+A5 (reference LocationStats, Aggregations.scala:101-137):
    per-supplier total lineitems, distinct parts, and modal part
    (highest count wins, lowest part key on ties)."""
    li = _t(spark, sf_dir, "lineitem")
    return group_stats(
        li,
        group_col="l_suppkey",
        item_col="l_partkey",
        mode_col="l_partkey",
        total_alias="total_items",
        unique_alias="unique_parts",
        mode_alias="top_part",
    )


def orders_with_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 with real misses: enrich orders with a half-filtered customer
    dim ("Unknown" on miss — reference ParquetCombinerRDD.scala:189),
    then aggregate per customer name."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 2 == 0)
        .select(F.col("c_custkey").alias("o_custkey"), "c_name")
    )
    enriched = broadcast_dim_join(
        orders, dim, key="o_custkey", defaults={"c_name": "Unknown"}
    )
    return enriched.groupBy(F.col("c_name").alias("customer_name")).agg(
        F.count(F.lit(1)).alias("order_count"),
        F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
    )


def returnflag_counts_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: two-phase salted aggregation (reference
    utils/SkewedDataHandler.scala:26-65); must equal a plain group-count."""
    li = _t(spark, sf_dir, "lineitem")
    return salted_count(
        li,
        ["l_returnflag", "l_linestatus"],
        salt_col="l_orderkey",
        count_col="cnt",
    )


def distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: distinct count (reference tools/ReadParquet.scala:187-193)."""
    li = _t(spark, sf_dir, "lineitem")
    return distinct_count(li, "l_partkey", alias="n_distinct")


def distinct_parts_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 scale path: HyperLogLog++ ``approx_count_distinct`` (rsd 1%).
    At 100 TB the exact path's distinct pre-aggregation still shuffles
    every distinct value once; the sketch is fixed-size (~1.5 KB per
    group at 1% rsd), merges map-side, and never shuffles values. The
    sketch estimate is engine-specific, so the driver check is
    rows-only; the relative-error bound vs the exact count is pinned
    by ``test_operators.test_approx_distinct_within_rsd``."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias(
            "n_distinct_approx"
        )
    )


def lineitem_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: single-pass count/mean/stddev/min/max per numeric column
    (reference tools/ReadParquet.scala:165-172 describe())."""
    li = _t(spark, sf_dir, "lineitem")
    wide = summary_stats(li, ["l_quantity", "l_extendedprice", "l_discount"])
    return wide.select(
        "column",
        "count",
        F.round("mean", 4).alias("mean"),
        F.round("stddev", 4).alias("stddev"),
        "min",
        "max",
    )


def earliest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 deterministic variant: first event per user under (ts,
    event_id) order — reproducible regardless of partitioning
    (SURVEY.md §2.4 deterministic dedup)."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "ts"
    )
    first = dedup_keep_min(ev, ["user_id"], ["ts", "event_id"])
    return first.select("user_id", "event_id", "event_type")


def filtered_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P5 + A9: the SQL surface (reference integration tests run
    Spark SQL over temp views — IntegrationTest.scala:243-251; here it
    is a primary path per SURVEY.md §3.4)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_orderstatus, o_totalprice AS total_price
        FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice > 100000
        """
    )


def customers_above_avg_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9+: CORRELATED subqueries through the SQL surface — each
    customer's max order compared against the global average order
    value. Catalyst must decorrelate both subqueries into aggregates
    + joins (one per-customer aggregate, one scalar broadcast) — the
    naive per-row re-execution a correlated subquery literally
    describes would be O(customers × orders) at 100 TB. The plan test
    pins the decorrelation."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               round((SELECT max(o_totalprice) FROM orders o
                      WHERE o.o_custkey = c.c_custkey), 2) AS max_order
        FROM customer c
        WHERE (SELECT max(o_totalprice) FROM orders o
               WHERE o.o_custkey = c.c_custkey)
              > 1.8 * (SELECT avg(o_totalprice) FROM orders)
        """
    )


def order_buckets_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: bag-semantics union of two filtered branches (reference
    utils/SkewedDataHandler.scala:64), then re-aggregate."""
    orders = _t(spark, sf_dir, "orders")
    high = orders.where(F.col("o_totalprice") > 200000).select(
        "o_orderstatus", F.lit("high").alias("bucket")
    )
    low = orders.where(F.col("o_totalprice") < 50000).select(
        "o_orderstatus", F.lit("low").alias("bucket")
    )
    return high.unionByName(low).groupBy("bucket", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )


def top_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O3: global sort + limit with a total tiebreak order."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.col("o_totalprice").alias("total_price"),
            "o_orderstatus",
        )
    )


def events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A6 on the events table."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (W: lag + running sum over per-user windows, the
    training-pipeline workhorse the reference's window surface lacks):
    a new session starts when the gap to the previous event exceeds 30
    minutes; output per (user, session): event count and span.

    ts is nanos-since-epoch (see _events); both sides compute gaps AND
    the output span in integer nanos/millis so there is no float to
    reconcile at all. (Round 2 lesson: a rounded float ``duration_min``
    passed the local 9-sig-digit checker but failed the driver's
    stricter hash — Spark's HALF_UP decimal-string rounding vs DuckDB's
    binary-double rounding can disagree in the last place on halfway
    values. Integer math is the only safe contract for derived spans.)
    """
    from pyspark.sql import Window

    gap_ns = 30 * 60 * 1_000_000_000  # 30 minutes
    ev = _events(spark, sf_dir).select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_gap = ev.withColumn("__prev_ts", F.lag("ts").over(w)).withColumn(
        "__new_session",
        (
            F.col("__prev_ts").isNull()
            | ((F.col("ts") - F.col("__prev_ts")) > gap_ns)
        ).cast("int"),
    )
    sessions = with_gap.withColumn(
        "session_id",
        F.sum("__new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        # integer nanos -> integer millis via integral division (`div`
        # returns LONG); exact on both engines, unlike any float path
        F.expr("(max(ts) - min(ts)) div 1000000").alias("duration_ms"),
    )


def user_sessions_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 under the hard signal: the Structured Streaming
    sessionizer (``applyInPandasWithState``, event-time timeouts) run
    to completion with ``trigger(availableNow=True)`` over the events
    table, returning CLOSED sessions as a batch DataFrame.

    The oracle is the batch sessionization SQL restricted to closed
    sessions: every session but each user's last closes in-stream;
    the last closes iff the final watermark (``max_ms - delay``)
    strictly passed ``session_end + gap``. All outputs are integral
    epoch-millis — same no-floats contract as ``user_sessions``.
    """
    from parquet_combiner_spark.streaming.sessionize import (
        sessionize_events_available_now,
    )

    return sessionize_events_available_now(
        spark, table_path(sf_dir, "events")
    )


def _asof_attribution_inputs(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Shared (fact, dim) preparation for BOTH as-of formulations —
    one definition of the purchase facts and the per-(user, time)
    max_by-deduped view dim, so the two variants (and their shared
    oracle) can never drift."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("ts div 1000000").alias("tms"),
        "value",
    )
    fact = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "tms"
    )
    dim = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "tms")
        .agg(
            F.max("event_id").alias("view_event_id"),
            F.max_by("value", "event_id").alias("view_value"),
        )
    )
    return fact, dim


def purchase_attribution_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) join — the temporal-join family
    (operators/asof.py; driver brief's canonical custom-operator
    example): each 'purchase' event is attributed to the same user's
    most recent at-or-before 'view' event. No join node at all — one
    union, one key shuffle, one ordered window (see the operator
    docstring for why a range join degenerates at scale).

    Dim rows are pre-deduped to one per (user, time) via max_by on
    event_id so "the" as-of row is well defined on both engines; all
    times integral epoch millis; view_value passes through untouched
    (no arithmetic → bit-identical)."""
    from parquet_combiner_spark.operators.asof import asof_join_backward

    fact, dim = _asof_attribution_inputs(spark, sf_dir)
    return asof_join_backward(
        fact,
        dim,
        on=["user_id"],
        fact_time="tms",
        dim_time="tms",
        value_cols=["view_event_id", "view_value"],
    )


_ASOF_TOLERANCE_MS = 3_600_000  # attribution freshness bound: 1 hour


def purchase_attribution_asof_tolerant(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The as-of attribution with a FRESHNESS bound (operators/
    asof.py ``tolerance``, pandas.merge_asof's knob): a view more
    than an hour older than the purchase attributes NULLs — stale
    matches are the silent bug of unbounded as-of joins. Same plan
    (no join node); the oracle wraps the native ASOF result in the
    staleness mask."""
    from parquet_combiner_spark.operators.asof import asof_join_backward

    fact, dim = _asof_attribution_inputs(spark, sf_dir)
    return asof_join_backward(
        fact,
        dim,
        on=["user_id"],
        fact_time="tms",
        dim_time="tms",
        value_cols=["view_event_id", "view_value"],
        tolerance=_ASOF_TOLERANCE_MS,
    )


def purchase_attribution_asof_pandas(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The as-of attribution on the COGROUPED-MAP path
    (`cogroup().applyInPandas` + `pandas.merge_asof` per user) — the
    Arrow custom-operator formulation racing the JVM union+window
    operator over IDENTICAL inputs under the SAME DuckDB oracle."""
    from parquet_combiner_spark.operators.asof import asof_join_cogrouped

    fact, dim = _asof_attribution_inputs(spark, sf_dir)
    return asof_join_cogrouped(
        fact,
        dim,
        on=["user_id"],
        fact_time="tms",
        dim_time="tms",
        value_cols=["view_event_id", "view_value"],
    )


_ERR_WINDOW_MS = 3600_000  # 1 hour


def purchases_after_error_interval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Range/interval join — the second temporal-join family
    (operators/asof.py `interval_join`): every purchase falling inside
    the 1-hour window opened by an error from the same user, as a
    bucketed equi-join (bucket width = window length, so each interval
    covers at most 2 buckets) with the exact BETWEEN as a post-filter
    — never a raw range predicate the planner would turn into a
    per-key cross product. All times integral epoch millis."""
    from parquet_combiner_spark.operators.asof import interval_join

    ev = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("ts div 1000000").alias("tms"),
    )
    fact = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "tms"
    )
    intervals = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_event_id"),
        "user_id",
        F.col("tms").alias("win_start"),
        (F.col("tms") + _ERR_WINDOW_MS).alias("win_end"),
    )
    return interval_join(
        fact,
        intervals,
        on=["user_id"],
        fact_time="tms",
        start_col="win_start",
        end_col="win_end",
        bucket_width=_ERR_WINDOW_MS,
    ).select("event_id", "user_id", "tms", "error_event_id", "win_start")


def user_sessions_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization via the BUILT-IN ``session_window`` — the
    JVM-native formulation of ``user_sessions``' semantics (batch
    mode; the streaming twin is ``user_sessions_stream_native``).
    Whole-stage-codegen session assignment, no window-function
    partition sort over all events, no Python: the plan you'd run at
    100 TB when per-event custom state is not required.

    ``session_window`` merges INCLUSIVELY at the gap (two events
    exactly gap apart share a session — verified empirically, pinned
    by test_streaming.py), the same boundary as the lag-based
    ``user_sessions`` and the custom streaming operator. Event time is
    ms-floored; all outputs integral epoch millis."""
    gap_ms = 30 * 60_000
    ev = _events(spark, sf_dir).select(
        "user_id",
        F.timestamp_millis(F.expr("ts div 1000000")).alias("event_time"),
    )
    return (
        ev.groupBy(
            F.session_window("event_time", f"{gap_ms // 1000} seconds").alias(
                "session"
            ),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.expr("unix_micros(session.start) div 1000").alias(
                "session_start"
            ),
            (F.expr("unix_micros(session.end) div 1000") - gap_ms).alias(
                "session_end"
            ),
            "n_events",
        )
    )


def user_sessions_stream_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 on the JVM-native path: ``groupBy(session_window(...))``
    as a streaming session aggregation (no Python in the loop — the
    scale answer to the ``applyInPandasWithState`` operator's
    interpreter cost), run to completion with availableNow and
    checked against the closed-session batch oracle.

    Emission semantics: append mode emits a session iff the final
    watermark (``max_ms - delay``) passed its window END
    (``last_event + gap``) — inclusive, unlike the custom operator's
    strictly-below timeout firing; both boundaries sit in the oracle
    WHERE clauses."""
    from parquet_combiner_spark.streaming.sessionize import (
        sessionize_events_available_now_native,
    )

    return sessionize_events_available_now_native(
        spark, table_path(sf_dir, "events")
    )


def purchases_after_error_interval_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.10 STREAM-STREAM join under the hard signal: the interval
    join of ``purchases_after_error_interval`` as two watermarked
    event streams joined in flight (state evicted past
    watermark − window). Inner-join emission is exhaustive once both
    sides drain, so the BATCH query's oracle SQL checks this verbatim
    — same rows, same integral-millis contract."""
    from parquet_combiner_spark.streaming.pipeline import (
        purchases_after_errors_stream_available_now,
    )

    return purchases_after_errors_stream_available_now(
        spark, table_path(sf_dir, "events"), window_ms=_ERR_WINDOW_MS
    )


def purchases_with_errors_outer_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.10 stream-stream LEFT OUTER interval join (streaming/
    pipeline.py): every purchase with its window-opening error or
    NULLs — null emission gated on the watermark proving no match can
    arrive. Matched rows emit exhaustively (inner emission); null
    rows are reported for the PROVABLY-FINAL region only
    (p_time <= final watermark − window): between watermark − window
    and the watermark, Spark's outer eviction emits opportunistically
    per micro-batch (observed boundary varies with batch timing), so
    the deterministic contract — and the oracle — is the conservative
    cut. Purchases above it are withheld, never wrongly NULLed."""
    from parquet_combiner_spark.streaming.pipeline import (
        purchases_with_errors_outer_stream_available_now,
    )

    out = purchases_with_errors_outer_stream_available_now(
        spark, table_path(sf_dir, "events"), window_ms=_ERR_WINDOW_MS
    )
    # final GLOBAL watermark, batch-side: each substream's watermark
    # comes from its own max event time, and the query's watermark is
    # their MIN — so the cut uses min(max purchase, max error) − delay
    # − window (using the all-events max overstates the watermark
    # when one substream ends early, which sparse data does)
    ev = _events(spark, sf_dir)
    maxd = ev.where(
        F.col("event_type").isin("purchase", "error")
    ).groupBy("event_type").agg(
        F.expr("max(ts div 1000000)").alias("__m")
    ).agg(F.min("__m").alias("__max_ms"))
    cut = F.col("__max_ms") - F.lit(600_000) - F.lit(_ERR_WINDOW_MS)
    return (
        out.crossJoin(F.broadcast(maxd))
        .where(F.col("error_event_id").isNotNull() | (F.col("tms") <= cut))
        .drop("__max_ms")
    )


def purchases_errors_full_outer_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.10 stream-stream FULL OUTER interval join — the last cell
    of the streaming join matrix (inner / left outer / full outer,
    all three driver-checked). Matched rows emit exhaustively (inner
    emission); each NULL class is reported for its own
    provably-final region only, and the two proofs differ by a full
    window (streaming/pipeline.py docstring): a matchless PURCHASE
    finalizes when the watermark passes ``p_time``, a matchless
    ERROR when it passes ``e_time + window``. Between
    ``watermark − window`` and each proof point Spark's outer
    eviction emits opportunistically per micro-batch, so the
    deterministic contract — and the oracle — takes the conservative
    cut one window below each proof. Rows above their cut are
    withheld, never wrongly NULLed. Watermark is the min-of-maxima
    over the two substreams (same batch-side reconstruction as the
    left-outer key; boundary verified at two SFs)."""
    from parquet_combiner_spark.streaming.pipeline import (
        purchases_errors_full_outer_stream_available_now,
    )

    out = purchases_errors_full_outer_stream_available_now(
        spark, table_path(sf_dir, "events"), window_ms=_ERR_WINDOW_MS
    )
    ev = _events(spark, sf_dir)
    maxd = ev.where(
        F.col("event_type").isin("purchase", "error")
    ).groupBy("event_type").agg(
        F.expr("max(ts div 1000000)").alias("__m")
    ).agg(F.min("__m").alias("__max_ms"))
    wm = F.col("__max_ms") - F.lit(600_000)
    cut_p = wm - F.lit(_ERR_WINDOW_MS)
    cut_e = wm - F.lit(2 * _ERR_WINDOW_MS)
    return (
        out.crossJoin(F.broadcast(maxd))
        .where(
            (
                F.col("event_id").isNotNull()
                & F.col("error_event_id").isNotNull()
            )
            | (F.col("error_event_id").isNull() & (F.col("tms") <= cut_p))
            | (F.col("event_id").isNull() & (F.col("win_start") <= cut_e))
        )
        .drop("__max_ms")
    )


def windowed_top_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 windowed top-N under the hard signal: the streaming
    tumbling-window count → rank pipeline (the reference's proposed
    real-time flagship) run to completion with
    ``trigger(availableNow=True)`` over the events table. The dedup
    stage is deliberately absent here — its within-watermark
    first-wins semantics are not batch-SQL-mirrorable under
    duplicates, and this query exists for the oracle contract; the
    dedup composition is pinned by test_streaming.py instead.

    The oracle is the batch formulation: 1-hour tumbling windows on
    ms-floored event time, top-3 event types per window (count desc,
    type asc), restricted to windows the final watermark finalized
    (``window_end <= max_ms - delay``). All outputs integral millis.
    """
    from parquet_combiner_spark.streaming import (
        windowed_top_events_available_now,
    )

    return windowed_top_events_available_now(
        spark, table_path(sf_dir, "events")
    )


def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8-extension: exact interpolated percentiles per group (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont`` — verified bit-equal).
    At 100 TB swap for :func:`price_percentiles_approx`."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("p95"),
    )


def price_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 scale path: ``approx_percentile`` (Greenwald-Khanna sketch,
    accuracy 10000 ≈ 0.01% rank error). Exact ``percentile`` buffers
    every group value in the aggregation state; the sketch is bounded
    and mergeable, which is what survives a 100 TB group. Sketch
    output is engine-specific → rows-only driver check; the rank-error
    bound vs the exact quantile is pinned by
    ``test_operators.test_approx_percentile_within_bound``."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)),
            4,
        ).alias("p50_approx"),
        F.round(
            F.approx_percentile("l_extendedprice", F.lit(0.95), F.lit(10000)),
            4,
        ).alias("p95_approx"),
    )


def user_rolling_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W: frame-spec window (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    — rolling mean of event value per user in event-time order."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("rolling_avg_4"),
    )


def user_value_rolling_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W: TIME-range frame window (RANGE BETWEEN 1 HOUR PRECEDING) —
    per event, the mean value of the SAME user's events in the
    trailing hour, peers-at-equal-timestamp included (RANGE
    semantics). The ROWS twin (:func:`user_rolling_value`) counts
    rows; this one measures a physical time horizon — the form every
    rate/velocity feature uses. Ordering key is exact integer millis
    (range frames need a single numeric key; ns→ms keeps it in
    engine-neutral int64)."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", F.expr("ts div 1000000").alias("tms"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tms")
        .rangeBetween(-3_600_000, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("rolling_avg_1h"),
    )


def daily_user_accretion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per epoch-day, how many users appeared for
    the FIRST time and the cumulative unique-user count — the classic
    "running distinct" that a naive count(DISTINCT) over an expanding
    frame cannot do scalably. The scalable form: distinct collapses
    to min(day) per user (one partial-aggregated shuffle on user_id),
    then the cumulative sum runs over the DAY-cardinality frame — the
    unbounded-window single partition touches only ~thousands of day
    rows, never the corpus."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select(
        "user_id",
        F.expr(_floor_div_sql("ts", 24 * 3600 * 1_000_000_000)).alias("day"),
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("day"))
    per_day = first_day.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day",
        "n_new_users",
        F.sum("n_new_users").over(w).alias("cum_users"),
    )


def event_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence mining: counts of consecutive event-type transitions
    (prev → curr) per user timeline — the first-order Markov matrix
    behind funnel diagnosis ("what do users do right after an
    error?"). One user-keyed window (lag over (ts, event_id)) feeding
    one partial-aggregated groupBy whose output is |types|² rows; a
    user's first event has no predecessor and is excluded."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.lag("event_type").over(w).alias("prev_type"), "event_type"
    ).where(F.col("prev_type").isNotNull())
    return steps.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )


def sliding_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPPING (sliding) windows — the windowing family's third
    member next to tumbling and session: per-type counts over 1-hour
    windows sliding every 15 minutes, so each event lands in exactly
    4 windows. Spark's ``window(..., slide)`` replicates each row to
    its covering windows EXECUTOR-side (a narrow 4× expansion before
    the partial aggregate — no self-join, no spine table); the oracle
    reproduces the replication with a 4-element unnest. Output keyed
    by integral window-start millis."""
    slide_ms, win_ms = 900_000, 3_600_000
    ev = _events(spark, sf_dir).select(
        F.timestamp_micros(F.expr("ts div 1000")).alias("event_time"),
        "event_type",
    )
    return (
        ev.groupBy(
            F.window("event_time", "1 hour", "15 minutes").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.expr("unix_micros(w.start) div 1000").alias("window_start_ms"),
            "event_type",
            "n",
        )
    )


def pricing_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the generalization rollup/cube are
    sugar for: per-flag totals, per-status totals, and the grand
    total, WITHOUT the (flag, status) detail level a cube would also
    emit. One Expand-backed aggregation pass (same physical shape as
    rollup/cube: the expand replicates each row once per set before
    the partial aggregate); grouping flags exported so NULL group
    keys stay distinguishable from subtotal rows."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
    )


def pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension: ROLLUP over (returnflag, linestatus) — subtotal and
    grand-total rows the reference's flat groupBy surface lacks;
    grouping-level flags exported so null group keys stay
    distinguishable from rollup rows."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
    )


def event_counts_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-sketch frequency estimates per event type — the
    sketch family's frequency member (HLL++ = distinct, GK =
    quantiles, CMS = counts). One mergeable single-pass aggregation;
    sketch binary is engine-specific → rows-only under the driver,
    with the est∈[true, true+eps·N] bound pinned by pytest
    (test_operators.test_count_min_heavy_hitters_bound)."""
    from parquet_combiner_spark.operators.aggregate import approx_item_counts

    ev = _events(spark, sf_dir).select("event_type")
    return approx_item_counts(ev, "event_type", EVENT_TYPES)


def pricing_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension: CUBE over (returnflag, linestatus) — every
    grouping-set combination including the per-linestatus margins
    ROLLUP omits. Same grouping-flag export as ``pricing_rollup``."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
    )


def parts_returned_and_held(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct set semantics): part keys that appear both
    on returned ('R') and on held ('A') lineitems. Spark plans set
    intersection as a left-semi aggregate join — no row
    multiplication, partial aggregation on both sides."""
    li = _t(spark, sf_dir, "lineitem")
    r = li.where(F.col("l_returnflag") == "R").select("l_partkey")
    a = li.where(F.col("l_returnflag") == "A").select("l_partkey")
    return r.intersect(a)


def parts_returned_never_held(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference): returned part keys never held
    by the low-key supplier group (the supplier filter keeps the
    difference non-empty on this data — every part appears under both
    flags corpus-wide). ``subtract`` is EXCEPT DISTINCT — a left-anti
    aggregate under the hood, same scale shape as the anti join;
    ``exceptAll`` would be BAG difference, a different (and here
    wrong) answer."""
    li = _t(spark, sf_dir, "lineitem")
    r = li.where(F.col("l_returnflag") == "R").select("l_partkey")
    a = (
        li.where((F.col("l_returnflag") == "A") & (F.col("l_suppkey") < 10))
        .select("l_partkey")
    )
    return r.subtract(a)


def event_value_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window rank-statistics family (percent_rank + cume_dist) per
    event type — the distribution-position features a feature
    pipeline derives per entity. One shuffle on the partition key;
    rounded to 6 so both engines hash identically."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical outlier detection: events whose value sits more
    than 3 population-σ from their event_type mean — the anomaly
    screen monitoring pipelines run per entity class.

    Scale shape: per-type mean/σ is ONE partial-aggregated groupBy
    whose output is type-cardinality-sized, broadcast back onto the
    stream — the corpus is scanned once and never shuffled (the same
    broadcast-threshold pattern as the quartile bucketing). z is
    rounded at the boundary for cross-engine hashing."""
    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        # population σ (stddev_pop): the screen describes THIS data,
        # not a sample estimate — and both engines define it identically
        F.stddev_pop("value").alias("sigma"),
    )
    # σ=0 (a constant group) must be guarded, not divided: under ANSI
    # mode the raw division THROWS DIVIDE_BY_ZERO; when() evaluates
    # the division only where the guard holds, and a constant group
    # has no outliers by definition
    z = F.when(
        F.col("sigma") > 0,
        (F.col("value") - F.col("mu")) / F.col("sigma"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > 3.0)
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round(z, 4).alias("z"),
        )
    )


def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals — the
    distribution-profiling primitive (20 bins over the observed
    min..max, Postgres ``width_bucket`` semantics: underflow bucket 0,
    the max value in overflow bucket n+1). Bounds come from one tiny
    aggregate broadcast back as a 1-row frame; binning is a narrow
    codegen'd projection and the histogram one partial-aggregated
    groupBy.

    The bin expression is written out EXPLICITLY (not Spark's
    ``width_bucket`` built-in) so the oracle can mirror the exact
    floating-point operation order: the built-in computes
    ``trunc(n*(x-lo)/(hi-lo))`` while a naive mirror computes
    ``floor((x-lo)/((hi-lo)/n))`` — empirically ~13% of
    exactly-on-boundary values land in different bins between the
    two formulas, a data-dependent oracle flake. One formula, both
    engines, bit-for-bit."""
    orders = _t(spark, sf_dir, "orders").select("o_totalprice")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    x, lo, hi = F.col("o_totalprice"), F.col("lo"), F.col("hi")
    bin_expr = (
        F.when(x < lo, F.lit(0))
        .when(x >= hi, F.lit(21))
        .otherwise(F.floor((x - lo) / ((hi - lo) / F.lit(20))) + 1)
        .cast("long")
    )
    binned = orders.crossJoin(F.broadcast(bounds)).select(
        bin_expr.alias("bin"), "lo", "hi"
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.first("lo") + (F.col("bin") - 1) * (F.first("hi") - F.first("lo")) / 20,
            4,
        ).alias("bin_lo"),
    )


# Each funnel step must land within this deadline of the previous
# step's completion (shared with the oracle SQL below; 24h gives the
# testdata a real depth spread instead of universal conversion).
_FUNNEL_DEADLINE_NS = 24 * 3600 * 1_000_000_000


_WEEK_NS = 7 * 24 * 3600 * 1_000_000_000
_WEEK_US = 7 * 24 * 3600 * 1_000_000


def _floor_div_sql(expr: str, divisor: int) -> str:
    """Exact int64 FLOOR division (DuckDB ``//`` semantics). Spark's
    ``div`` truncates toward zero, so the two engines disagree by one
    bucket on negative values (pre-1970 timestamps) — latent until
    such data appears. ``pmod`` (always >= 0) keeps the subtraction on
    a multiple of the divisor, so the whole computation stays in exact
    integer math — ``floor(x / d)`` on doubles would lose precision
    above 2^53 (event ts nanos are ~1.7e18)."""
    return f"((({expr}) - pmod({expr}, {divisor})) div {divisor})"


def weekly_order_volume_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (dimension densification): weekly order
    counts with MISSING weeks materialized as zero rows — the
    resampling step every downstream charting/forecasting consumer
    needs (a absent row and a zero are different facts).

    Plan shape: the observed counts are one partial-aggregated
    groupBy; the dense week spine is generated EXECUTOR-side from the
    1-row bounds aggregate (sequence + explode — no driver loop), and
    the spine⋈counts left join is broadcast (both sides are
    week-cardinality-sized). Weeks are exact integer epoch-week
    indices."""
    weeks = _t(spark, sf_dir, "orders").select(
        F.expr(
            _floor_div_sql(
                "unix_micros(cast(o_orderdate as timestamp))", _WEEK_US
            )
        ).alias("week")
    )
    counts = weeks.groupBy("week").agg(F.count(F.lit(1)).alias("n"))
    spine = counts.agg(
        F.min("week").alias("lo"), F.max("week").alias("hi")
    ).select(F.explode(F.sequence("lo", "hi")).alias("week"))
    return spine.join(F.broadcast(counts), "week", "left").select(
        "week", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )


def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the other half of product analytics
    next to the funnel: bucket each user into a signup cohort (the
    week of their first event), then count how many of each cohort
    are active k weeks later.

    Plan shape: first-event week is one partial-aggregated groupBy
    over (user, ts→week); activity weeks are a distinct over the same
    narrow projection; the cohort join keys on user_id and the final
    matrix is a second combiner-reduced groupBy whose output is
    O(weeks²) — tiny. The cohort frame is user-cardinality-sized, so
    at 100 TB the join is the one shuffle that matters and both sides
    are already user-keyed. Weeks are integer epoch-week indices
    (exact integer math, engine-neutral)."""
    # exact integer FLOOR division (see _floor_div_sql): ts nanos
    # (~1.7e18) exceed double's exact range, and `div` alone would
    # disagree with the oracle's `//` on pre-1970 timestamps
    ev = _events(spark, sf_dir).select(
        "user_id", F.expr(_floor_div_sql("ts", _WEEK_NS)).alias("week")
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(cohort, "user_id")
        .select(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("weeks_since"),
            "user_id",
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def user_event_type_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set aggregation (collect_set → sorted CSV, the LISTAGG family):
    per user, the distinct event types seen and total event count.
    The set is sorted then joined so the string is deterministic and
    engine-neutral (collect_set order is not). Scale: collect_set
    partial-aggregates map-side like any agg buffer; the buffer is
    bounded by the TYPE vocabulary (5 here), not event count — the
    shape to avoid is collecting unbounded-cardinality values."""
    # null event_type rows are excluded in BOTH engines: Spark's
    # array_join over an all-null collect_set yields '' where DuckDB's
    # string_agg DISTINCT yields NULL — filtering is the shared rule
    ev = (
        _events(spark, sf_dir)
        .select("user_id", "event_type")
        .where(F.col("event_type").isNotNull())
    )
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.array_sort(F.collect_set("event_type")), ","
        ).alias("types"),
        F.count(F.lit(1)).alias("n_events"),
    )


def event_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over per-user event-type
    baskets: for every ordered type pair (antecedent → consequent),
    the co-occurrence support, confidence n_ab/n_a, and lift
    n_ab·N/(n_a·n_b) — the A-priori 2-itemset kernel behind
    "users who X also Y".

    Scale shape: baskets are the DISTINCT (user, type) pairs (one
    partial-aggregated shuffle, buffer bounded by the type
    vocabulary); the pair counts come from a SELF-JOIN on user_id —
    co-partitioned by the join key, with per-user fan-out bounded by
    C(|types|, 2), so the expansion is a constant factor, never
    quadratic in users. Item supports and the user total are
    vocabulary-sized aggregates BROADCAST back onto the pair counts
    — the only non-broadcast shuffles are the distinct and the
    self-join. Never a cross join.
    """
    ev = (
        _events(spark, sf_dir)
        .select("user_id", "event_type")
        .where(F.col("event_type").isNotNull())
        .distinct()
    )
    # the user total is a 1-row aggregate folded into the plan as a
    # broadcast (the forecast_revenue_change pattern) — a driver-side
    # count() here would be a whole extra job per run
    n_users = ev.agg(
        F.count_distinct("user_id").cast("double").alias("__n_users")
    )
    item = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_item")
    )
    a, b = ev.alias("a"), ev.alias("b")
    pairs = (
        a.join(b, "user_id")
        .where(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("t1"),
            F.col("b.event_type").alias("t2"),
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    # both rule directions from each unordered pair
    directed = pairs.select(
        F.col("t1").alias("antecedent"),
        F.col("t2").alias("consequent"),
        "n_pair",
    ).unionByName(
        pairs.select(
            F.col("t2").alias("antecedent"),
            F.col("t1").alias("consequent"),
            "n_pair",
        )
    )
    sup_a = item.select(
        F.col("event_type").alias("antecedent"),
        F.col("n_item").alias("n_a"),
    )
    sup_b = item.select(
        F.col("event_type").alias("consequent"),
        F.col("n_item").alias("n_b"),
    )
    return (
        directed.join(F.broadcast(sup_a), "antecedent")
        .join(F.broadcast(sup_b), "consequent")
        .crossJoin(F.broadcast(n_users))
        .select(
            "antecedent",
            "consequent",
            "n_pair",
            F.round(F.col("n_pair") / F.col("n_a"), 4).alias("confidence"),
            F.round(
                F.col("n_pair") * F.col("__n_users")
                / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
    )


def user_funnel_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis (view → click within 24h → purchase within
    24h): how far each user progresses through an ORDERED,
    DEADLINE-BOUNDED step sequence, where each step must occur
    at-or-after the previous step's first completion and within the
    step deadline — the product-analytics workload windowed
    aggregates alone can't express (step k's predicate depends on
    step k-1's result).

    Formulation: three CHAINED conditional window-mins over the same
    user partition (s2's filter references s1, s3's references s2).
    Spark plans all three Window nodes over ONE exchange on user_id
    (same partitioning reuses the sort), and the final per-user
    collapse + depth histogram are partial-aggregated. Output:
    (depth, n_users, avg_convert_ms) — avg view→purchase latency for
    full conversions, NULL otherwise.
    """
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "s1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "s2",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("s1"))
                    & (F.col("ts") <= F.col("s1") + F.lit(_FUNNEL_DEADLINE_NS)),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "s3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("s2"))
                    & (F.col("ts") <= F.col("s2") + F.lit(_FUNNEL_DEADLINE_NS)),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("s1").alias("s1"),
        F.first("s2").alias("s2"),
        F.first("s3").alias("s3"),
    )
    depth = (
        F.when(F.col("s3").isNotNull(), 3)
        .when(F.col("s2").isNotNull(), 2)
        .when(F.col("s1").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        per_user.select(
            depth.alias("depth"),
            ((F.col("s3") - F.col("s1")) / F.lit(1_000_000.0)).alias("ms"),
        )
        .groupBy("depth")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("ms"), 4).alias("avg_convert_ms"),
        )
    )


def user_bucket_top_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship shape #2 (A2 + F2 modulo): top-3 event types per
    user-id bucket, deterministic tiebreak."""
    ev = _events(spark, sf_dir).select(
        (F.col("user_id") % 100).alias("user_bucket"), "event_type"
    )
    counts = group_counts(ev, ["user_bucket", "event_type"], "n")
    return top_k_per_group(
        counts,
        ["user_bucket"],
        [F.desc("n"), F.asc("event_type")],
        3,
        rank_col="rank",
    )


def hourly_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch tumbling event-time window (``F.window``) — the batch
    twin of the streaming windowed aggregation: events per
    (hour, type). Window assignment is a narrow projection (each row
    maps to exactly one tumbling window), so the plan is one
    partial-aggregated groupBy; the oracle is plain epoch floor
    arithmetic, which is exactly what the tumbling window computes."""
    ev = _events(spark, sf_dir)
    win = F.window(F.timestamp_micros(F.expr("ts div 1000")), "1 hour")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_millis("w.start").alias("window_start_ms"),
            "event_type",
            "n",
        )
    )


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose orders exceed a quantity
    threshold — the aggregate-then-join (HAVING-driven semi-join)
    pipeline.

    Plan intent: the quantity rollup is ONE partial-aggregated
    groupBy over lineitem's two needed columns; its qualifying output
    is ~1% of orders, so it BROADCASTS into the orders join (the
    big-table side is filtered by the aggregate's result, never the
    reverse), the customer dim broadcasts as usual, and the top-100
    is a TakeOrderedAndProject. Exactly one full-data shuffle in the
    whole query."""
    qty = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250.0)
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(
            F.broadcast(qty), orders["o_orderkey"] == qty["l_orderkey"]
        )
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias(
                "odate_ms"
            ),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


def sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (retargeted to the columns this testdata has):
    per supplier, the count of orders where THEIR item was returned,
    another supplier also shipped in the order (correlated EXISTS),
    and no OTHER supplier's item was returned (correlated NOT
    EXISTS) — the double-correlation semi+anti pipeline, Q21's
    defining feature.

    Plan intent: both correlations are joins on the order key — a
    LEFT SEMI with a suppkey-inequality residual and a LEFT ANTI with
    the same — never per-row subquery execution; the supplier dim
    broadcasts; the count is one partial-aggregated groupBy over the
    (tiny) surviving set."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    returned = li.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    others = li.select(
        F.col("l_orderkey").alias("o_ok"), F.col("l_suppkey").alias("o_sk")
    )
    other_returns = returned.select(
        F.col("l_orderkey").alias("r_ok"), F.col("l_suppkey").alias("r_sk")
    )
    base = returned.join(
        others,
        (F.col("l_orderkey") == F.col("o_ok"))
        & (F.col("l_suppkey") != F.col("o_sk")),
        "left_semi",
    ).join(
        other_returns,
        (F.col("l_orderkey") == F.col("r_ok"))
        & (F.col("l_suppkey") != F.col("r_sk")),
        "left_anti",
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        base.join(F.broadcast(supp), base["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — the first MULTI-WAY join pipeline in the
    registry: segment-filtered customer ⋈ date-filtered orders ⋈
    date-filtered lineitem, revenue per order, global top-10.

    Plan intent: all three filters reach their parquet scans
    (PushedFilters), the c⋈o join keys the smaller filtered side,
    AQE picks broadcast when the filtered customer fits, and the
    top-10 is a TakeOrderedAndProject — never a full global sort.
    Dates are epoch-millis integers at the boundary (timestamp
    columns are NTZ; millis keep the oracle hash engine-neutral)."""
    cust = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    cutoff = F.lit("1998-01-01").cast("timestamp_ntz")
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    joined = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).join(li, orders["o_orderkey"] == li["l_orderkey"])
    rev = joined.groupBy("o_orderkey", "o_orderdate").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))),
            2,
        ).alias("revenue")
    )
    return (
        rev.orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "revenue",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias(
                "odate_ms"
            ),
        )
    )


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — six-way join: revenue by nation for lineitems
    where customer and supplier share a nation in one region, over one
    order year. The three true dimensions (supplier, nation, region)
    are broadcast explicitly; nation⋈region collapses to a key list
    before touching any fact; customer⋈orders⋈lineitem remain
    shuffle joins for AQE to reorder/size. The c_nationkey =
    s_nationkey "local" predicate rides the supplier join, so no
    extra shuffle materializes for it."""
    region_asia = (
        _t(spark, sf_dir, "region")
        .where(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region_asia),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    supplier = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(supplier),
            (li["l_suppkey"] == supplier["s_suppkey"])
            & (cust["c_nationkey"] == supplier["s_nationkey"]),
        )
        .join(
            F.broadcast(nation),
            supplier["s_nationkey"] == nation["n_nationkey"],
        )
    )
    return joined.groupBy("n_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))),
            2,
        ).alias("revenue")
    )


def event_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: the events table's ``props`` column
    is a JSON string; pull the ``k`` attribute with
    ``get_json_object`` (JVM JSON path, no Python, no full from_json
    schema when one field is needed) and aggregate per event type —
    the log-payload pattern every event pipeline hits."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    return ev.groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.round(F.avg("k"), 4).alias("avg_k"),
        F.max("k").alias("max_k"),
    )


def monthly_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month rollup (``date_trunc`` — variable-width periods,
    unlike the fixed-width ``F.window`` hour buckets of
    ``hourly_event_type_counts``): orders and revenue per month.
    Month start crosses the boundary as epoch millis (NTZ-safe)."""
    orders = _t(spark, sf_dir, "orders").select(
        F.date_trunc("month", F.col("o_orderdate")).alias("m"),
        "o_totalprice",
    )
    return orders.groupBy("m").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    ).select(
        F.unix_millis(F.col("m").cast("timestamp")).alias("month_start_ms"),
        "n_orders",
        "revenue",
    )


def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period analytics: monthly revenue with its
    month-over-month percent change — the LAG-on-an-AGGREGATE shape
    every reporting stack runs. The lag window operates on the
    ALREADY-AGGREGATED series (one row per month), so the global sort
    it needs touches a vocabulary-sized frame, never the fact table;
    the fact-table pass is the same single partial-combined rollup as
    ``monthly_order_volume``. First month's growth is NULL by
    definition (no prior period), not zero."""
    from pyspark.sql import Window

    monthly = (
        _t(spark, sf_dir, "orders")
        .select(
            F.date_trunc("month", F.col("o_orderdate")).alias("m"),
            "o_totalprice",
        )
        .groupBy("m")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = Window.orderBy("m")
    return monthly.select(
        F.unix_millis(F.col("m").cast("timestamp")).alias("month_start_ms"),
        F.round("rev", 2).alias("revenue"),
        F.round(
            F.lit(100.0) * (F.col("rev") - F.lag("rev").over(w))
            / F.lag("rev").over(w),
            4,
        ).alias("mom_growth_pct"),
    )


def red_parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-predicate family: LIKE prefix filter (pushed to the
    parquet scan as StringStartsWith — plan-pinned) + per-brand
    aggregation over the matching minority."""
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("red %"))
    return part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        # round-4, not 2: Brand#4's avg is 944.074999... — epsilon
        # below a .005 tie, where Spark's BigDecimal HALF_UP (.07) and
        # DuckDB's shortest-repr rounding (.08) disagree; at 4 decimals
        # no group value sits on a tie
        F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
    )


def part_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy/entity-resolution join: distinct part names within edit
    distance 2 of each other (typo reconciliation), via the
    length-banded equi-join in :func:`operators.fuzzy.
    fuzzy_value_pairs` — never an all-pairs product."""
    from parquet_combiner_spark.operators.fuzzy import fuzzy_value_pairs

    return fuzzy_value_pairs(
        _t(spark, sf_dir, "part"), "p_name", max_dist=2
    )


def lineitem_price_quantity_regression(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Statistical-aggregate family (corr / covar / OLS regression):
    per return flag, how extended price relates to quantity — the
    exploratory pass a feature pipeline runs before modeling, all as
    BUILT-IN aggregates (Pearson corr, sample covariance, regr_slope/
    regr_intercept), one partial-aggregated pass, no Python.

    Precision: these aggregates are single-pass streaming-moment
    updates whose float summation ORDER differs between engines;
    corr/slope are rounded to 6, the larger-magnitude covariance and
    intercept to 2, keeping the comparison inside double agreement at
    these row counts."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    # corr guarded explicitly: under ANSI mode Spark's corr THROWS
    # DIVIDE_BY_ZERO on a zero-variance group (a degenerate segment
    # is a certainty at corpus scale); the composed Pearson form with
    # a variance guard yields NULL instead, mirrored in the oracle
    sx, sy = F.stddev_samp(x), F.stddev_samp(y)
    corr_safe = F.when(
        (sx > 0) & (sy > 0), F.covar_samp(y, x) / (sx * sy)
    )
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(corr_safe, 6).alias("price_qty_corr"),
        F.round(F.covar_samp(y, x), 2).alias("price_qty_covar"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 2).alias("intercept"),
    )


def lineitem_price_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment aggregates: per-flag skewness and excess
    kurtosis of extended price — the distribution-shape diagnostics
    (is the tail heavy? is the spread symmetric?) that complement
    mean/σ in any profiling pass.

    Spark's built-ins compute POPULATION moments (g1 = m3/m2^1.5,
    g2 = m4/m2² − 3); DuckDB's same-named functions apply sample bias
    corrections — so the oracle reproduces Spark's definition from
    explicit central moments instead of calling a different
    statistic with the same name. One partial-aggregated pass."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.skewness("l_extendedprice"), 6).alias("price_skew"),
        F.round(F.kurtosis("l_extendedprice"), 6).alias("price_kurtosis"),
    )


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer scoring: per customer,
    Recency (days since last order, measured from the corpus max
    date), Frequency (order count) and Monetary (total spend), each
    scored 1-3 against the exact tercile thresholds of its own
    distribution, concatenated into a segment code ('333' = best).

    Plan shape: ONE partial-aggregated groupBy builds the per-customer
    R/F/M frame (customer-cardinality-sized); the six tercile
    thresholds and the corpus max date come from tiny aggregates
    broadcast back (the quartile-bucketing pattern — never an NTILE
    global sort); scoring is a narrow CASE projection. Thresholds are
    closed on the left (score k means value ≥ that tercile), recency
    scores INVERTED (recent = high)."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    maxd = orders.agg(F.max("o_orderdate").alias("__maxd"))
    rfm = (
        orders.crossJoin(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            F.min(
                F.datediff(F.col("__maxd"), F.col("o_orderdate"))
            ).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
    )
    # thresholds ROUNDED to 6 dp in both engines: integer-valued
    # R/F land exactly ON interpolated terciles, where a 1-ulp
    # interpolation difference would flip a score
    thr = rfm.agg(
        *[
            F.round(F.percentile(c, F.lit(q)), 6).alias(
                f"{c}_{int(q * 3)}"
            )
            for c in ("recency_days", "frequency", "monetary")
            for q in (1 / 3, 2 / 3)
        ]
    )

    def score(c: str, invert: bool) -> F.Column:
        lo, hi = F.col(f"{c}_1"), F.col(f"{c}_2")
        s = (
            F.when(F.col(c) >= hi, 3)
            .when(F.col(c) >= lo, 2)
            .otherwise(1)
        )
        return (4 - s) if invert else s

    return rfm.crossJoin(F.broadcast(thr)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.concat(
            score("recency_days", invert=True).cast("string"),
            score("frequency", invert=False).cast("string"),
            score("monetary", invert=False).cast("string"),
        ).alias("rfm_segment"),
    )


def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total reporting (the RATIO_TO_REPORT shape): each
    nation's order revenue and its share WITHIN its region — a
    windowed sum over an aggregate, the two-level rollup every BI
    layer asks for.

    Plan: one partial-aggregated groupBy of orders keyed by the
    customer's nation (customer/nation/region dims all broadcast),
    then the share is a window sum over the nation-cardinality
    aggregate — the window input is 25 rows, the corpus is touched
    once."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    rev = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_nationkey")
        .agg(F.sum("o_totalprice").alias("rev"))
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
    )
    w = Window.partitionBy("r_name")
    return rev.select(
        "r_name",
        "n_name",
        F.round("rev", 2).alias("revenue"),
        F.round(F.col("rev") / F.sum("rev").over(w), 6).alias("region_share"),
    )


def part_name_canonical_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity canonicalization end-to-end (see
    :func:`operators.fuzzy.canonicalize_values`): every part name
    mapped to its variant-cluster's most-frequent form — fuzzy pairs
    → transitive components → frequency vote, all under one oracle."""
    from parquet_combiner_spark.operators.fuzzy import canonicalize_values

    return canonicalize_values(
        _t(spark, sf_dir, "part"), "p_name", max_dist=2
    )


def order_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile bucketing (histogram by quartile) — the scale-safe
    formulation of ``NTILE(4)``: exact percentile thresholds in ONE
    aggregation pass, broadcast back as a 1-row frame, bucket via
    CASE, aggregate per bucket. ``NTILE`` over a global ORDER BY
    window needs a single-partition total sort of every row — the one
    plan shape this engine refuses; threshold-bucketing differs from
    it only in tie placement (ties land in one bucket instead of
    splitting to even bucket sizes) and runs as two partial-aggregated
    HashAggregates plus a broadcast. The same move length-buckets
    documents for packing."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    thr = orders.agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("q1"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("q2"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("q3"),
    )
    quart = (
        F.when(F.col("o_totalprice") <= F.col("q1"), 1)
        .when(F.col("o_totalprice") <= F.col("q2"), 2)
        .when(F.col("o_totalprice") <= F.col("q3"), 3)
        .otherwise(4)
    )
    return (
        orders.crossJoin(F.broadcast(thr))
        .withColumn("quartile", quart)
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


def order_price_quartiles_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100-TB form of :func:`order_price_quartiles`: thresholds
    from ``approx_percentile`` (Greenwald-Khanna sketch, accuracy
    10000 ≈ 0.01% rank error) instead of exact ``percentile``, whose
    single aggregation buffer holds EVERY distinct value — the very
    hazard the engine's GK path (price_percentiles_approx) exists to
    avoid. Same broadcast-back bucketing; thresholds are actual data
    values (GK returns members, not interpolations), so bucket
    boundaries shift by at most the sketch's rank error — pinned by
    the error-bound pytest. Rows-only under the driver (DuckDB's
    approx_quantile is a t-digest, not reproducible)."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    thr = orders.agg(
        F.approx_percentile(
            "o_totalprice", F.lit(0.25), F.lit(10000)
        ).alias("q1"),
        F.approx_percentile(
            "o_totalprice", F.lit(0.5), F.lit(10000)
        ).alias("q2"),
        F.approx_percentile(
            "o_totalprice", F.lit(0.75), F.lit(10000)
        ).alias("q3"),
    )
    quart = (
        F.when(F.col("o_totalprice") <= F.col("q1"), 1)
        .when(F.col("o_totalprice") <= F.col("q2"), 2)
        .when(F.col("o_totalprice") <= F.col("q3"), 3)
        .otherwise(4)
    )
    return (
        orders.crossJoin(F.broadcast(thr))
        .withColumn("quartile", quart)
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


def customer_rfm_segments_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100-TB form of :func:`customer_rfm_segments`: the six
    tercile thresholds come from ``approx_percentile`` (GK sketch)
    instead of exact ``percentile`` — same broadcast-back scoring, no
    single-buffer-holds-every-distinct-value hazard. Scores flip only
    for customers within the sketch's rank error of a tercile
    boundary (error-bound pytest); rows-only under the driver."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    maxd = orders.agg(F.max("o_orderdate").alias("__maxd"))
    rfm = (
        orders.crossJoin(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            F.min(
                F.datediff(F.col("__maxd"), F.col("o_orderdate"))
            ).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
    )
    thr = rfm.agg(
        *[
            F.approx_percentile(c, F.lit(q), F.lit(10000))
            .cast("double")
            .alias(f"{c}_{int(q * 3)}")
            for c in ("recency_days", "frequency", "monetary")
            for q in (1 / 3, 2 / 3)
        ]
    )

    def score(c: str, invert: bool) -> F.Column:
        lo, hi = F.col(f"{c}_1"), F.col(f"{c}_2")
        s = (
            F.when(F.col(c) >= hi, 3)
            .when(F.col(c) >= lo, 2)
            .otherwise(1)
        )
        return (4 - s) if invert else s

    return rfm.crossJoin(F.broadcast(thr)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.concat(
            score("recency_days", invert=True).cast("string"),
            score("frequency", invert=False).cast("string"),
            score("monetary", invert=False).cast("string"),
        ).alias("rfm_segment"),
    )


_HIGH_VALUE_ORDER = 400_000.0


def customers_without_high_value_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEFT ANTI join — the set-difference join family (NOT EXISTS):
    customers with no order above the high-value bar (the exact
    complement of ``customers_with_high_value_orders`` — the
    partition property is pinned by pytest). The probe side is
    filtered AND reduced to its join key before the join (an anti
    join needs only key presence), so the shuffle carries one slim
    column of the filtered minority; the build-side hash table dedups
    keys by construction."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > _HIGH_VALUE_ORDER)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.join(big, "c_custkey", "left_anti")


def customers_with_high_value_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEFT SEMI join (EXISTS with a predicate): customers with at
    least one order above the high-value bar. The price filter sits
    on the orders scan (pushed to parquet), so the semi probe builds
    over the filtered minority — EXISTS never multiplies rows the way
    an inner-join-then-distinct would."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > _HIGH_VALUE_ORDER)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.join(big, "c_custkey", "left_semi")


def current_user_state_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply (streaming/apply_cdc.py): the events table
    staged as multiple files and streamed one file per micro-batch,
    each batch MERGEd into a persisted state snapshot via the batch
    ``merge_upsert`` operator — so the final snapshot must equal the
    one-shot batch compaction, and the BATCH query's oracle checks
    this verbatim. Exercises multi-batch incremental merge, not just
    a single-batch passthrough."""
    import shutil
    import tempfile

    from parquet_combiner_spark.streaming.apply_cdc import (
        apply_cdc_available_now,
    )

    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    stage = tempfile.mkdtemp(prefix="pcs-cdc-src-")
    root = tempfile.mkdtemp(prefix="pcs-cdc-state-")
    state_dir = f"{root}/state"
    try:
        # 3 files -> 3 micro-batches at maxFilesPerTrigger=1
        ev.repartition(3).write.mode("overwrite").parquet(stage)
        schema = spark.read.parquet(stage).schema
        final = apply_cdc_available_now(
            spark,
            stage,
            state_dir,
            keys=["user_id", "event_type"],
            version_cols=["ts", "event_id"],
            schema=schema,
        )
        return final.select(
            "user_id", "event_type", "ts", "event_id", "value"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)


def windowed_top_events_update_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Update-mode windowed top-N (streaming/pipeline.py): the
    live-dashboard twin of ``windowed_top_events_stream`` — every
    trigger re-emits changed window counts, a foreachBatch MERGE
    upserts them into a store, and the converged store ranks ALL
    windows (no watermark cut), which is exactly the batch SQL the
    oracle runs."""
    from parquet_combiner_spark.streaming.pipeline import (
        windowed_top_events_update_available_now,
    )

    return windowed_top_events_update_available_now(
        spark, f"{sf_dir}/events.parquet", "1 hour", 3, "10 minutes"
    )


def events_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming watermark-bounded dedup
    (streaming/pipeline.py ``dedup_events_stream_available_now``):
    the events table replayed as time-banded micro-batches with every
    band delivered TWICE (at-least-once redelivery), deduped on
    ``event_id`` by ``dropDuplicatesWithinWatermark`` — the
    design.pdf DynamoDB-conditional-write + TTL operator (SURVEY.md
    §2.10) under its actual failure mode. Every redelivered row is
    suppressed (as a duplicate while its state lives, as late input
    once below the watermark), so the output is exactly the distinct
    event set and the oracle is the PLAIN batch projection — the
    check is that 2× delivery emits each row once."""
    from parquet_combiner_spark.streaming.pipeline import (
        dedup_events_stream_available_now,
    )

    return dedup_events_stream_available_now(
        spark, f"{sf_dir}/events.parquet"
    )


def events_scd2_enriched_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-static SCD2 enrichment — the point-in-time-correct
    dimension lookup: each streaming click is joined to the purchase
    value that was CURRENT at the click's event time (the user's
    SCD2 interval containing ts), not the latest value — the
    classic warehouse bug this pattern exists to avoid. The dim side
    is the batch :func:`user_value_history_scd2` interval build; the
    join is a STATELESS stream-static inner join on
    (user match AND ts in [valid_from, valid_to)), so append mode
    emits each click exactly once as its batch processes and the
    result is batching-invariant — the oracle is the identical batch
    SQL. Clicks before the user's first purchase have no interval
    and drop (inner-join semantics, mirrored in the oracle).

    Scale: the SCD2 dim is change-point-sized; Spark broadcasts it
    under the stream-static plan, so the stream is never shuffled."""
    from parquet_combiner_spark.operators.merge import scd2_intervals
    from parquet_combiner_spark.streaming.run import (
        run_events_stream_available_now,
    )

    pts = (
        _events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select("user_id", "value", "ts")
    )
    dim = scd2_intervals(pts, ["user_id"], "ts", ["value"]).select(
        F.col("user_id").alias("d_user"),
        F.col("value").alias("purchase_value"),
        "valid_from",
        "valid_to",
    )

    def enrich(stream: DataFrame) -> DataFrame:
        clicks = stream.where(F.col("event_type") == "click")
        return clicks.join(
            dim,
            (clicks["user_id"] == dim["d_user"])
            & (clicks["ts"] >= dim["valid_from"])
            & (
                dim["valid_to"].isNull()
                | (clicks["ts"] < dim["valid_to"])
            ),
        ).select(
            "event_id",
            F.expr("ts div 1000000").alias("ts_ms"),
            "user_id",
            F.round("purchase_value", 4).alias("purchase_value"),
        )

    return run_events_stream_available_now(
        spark,
        f"{sf_dir}/events.parquet",
        enrich,
        prefix="scd2enrich",
        event_time=F.timestamp_micros(F.expr("ts div 1000")),
    )


def user_value_history_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build (operators/merge.py scd2_intervals):
    each user's purchase-value history as validity intervals — valid
    from the event until the user's next purchase, open-ended (and
    flagged current) on the latest. The oracle is the lead-window
    formulation. Built INCREMENTALLY here: the history is derived by
    applying the odd-event_id changes to the dimension built from the
    even ones (scd2_apply) — associativity makes that equal the
    one-shot derivation, which is exactly what the oracle computes."""
    from parquet_combiner_spark.operators.merge import (
        scd2_apply,
        scd2_intervals,
    )

    pts = (
        _events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select("user_id", "value", "ts")
    )
    base_dim = scd2_intervals(
        pts.where(F.col("ts") % 2 == 0), ["user_id"], "ts", ["value"]
    )
    changes = pts.where(F.col("ts") % 2 == 1).withColumnRenamed(
        "ts", "valid_from"
    )
    return scd2_apply(base_dim, changes, ["user_id"])


def current_user_state_txlog_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming CDC apply with the state in a VERSIONED TABLE
    (streaming/apply_cdc.py apply_cdc_txlog_available_now): same
    op-carrying change stream and tombstone semantics as
    ``current_user_state_with_deletes_stream``, but every micro-batch
    commits atomically to a txlog table keyed (query_id, epoch) — no
    rename-swap crash window, replay-proof by the commit log, state
    time-travelable per batch. Must converge to the same compaction:
    the with-deletes oracle checks it verbatim."""
    import shutil
    import tempfile

    from parquet_combiner_spark.operators.merge import merge_upsert
    from parquet_combiner_spark.streaming.apply_cdc import (
        apply_cdc_txlog_available_now,
    )
    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    changes = ev.where(F.col("event_id") % 2 == 1).withColumn(
        "op",
        F.when(F.col("event_id") % 7 == 0, F.lit("D")).otherwise(F.lit("U")),
    )
    stage = tempfile.mkdtemp(prefix="pcs-cdctx-src-")
    root = tempfile.mkdtemp(prefix="pcs-cdctx-state-")
    state_table = f"{root}/state"
    try:
        base = ev.where(F.col("event_id") % 2 == 0)
        txlog.commit(
            merge_upsert(
                base.limit(0), base,
                keys=["user_id", "event_type"],
                version_cols=["ts", "event_id"],
            ).withColumn("__tombstone", F.lit(False)),
            state_table,
        )
        changes.repartition(3).write.mode("overwrite").parquet(stage)
        schema = spark.read.parquet(stage).schema
        final = apply_cdc_txlog_available_now(
            spark,
            stage,
            state_table,
            keys=["user_id", "event_type"],
            version_cols=["ts", "event_id"],
            schema=schema,
            op_col="op",
        )
        return final.select(
            "user_id", "event_type", "ts", "event_id", "value"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)


# Known event types, pinned so the pivot never needs the extra
# distinct-values job Spark runs when the list is omitted — at 100 TB
# that implicit first pass is a full scan of the fact table.
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event-type count matrix (long → wide), the
    feature-matrix reshape every per-entity ML featurization runs.

    Formulated as one conditional aggregate per pinned value (see
    :data:`EVENT_TYPES`) instead of ``DataFrame.pivot``: with the
    value list given, ``pivot().count()`` still plans TWO exchanges
    (a (user, type) count, then a pivotfirst re-aggregation by user),
    and with the list omitted it adds a distinct-values scan job on
    top. The conditional form is a single partial-aggregated
    HashAggregate — one exchange, no extra job, missing combinations
    are 0 by construction."""
    # null event_type rows are excluded in BOTH engines: Spark's
    # array_join over an all-null collect_set yields '' where DuckDB's
    # string_agg DISTINCT yields NULL — filtering is the shared rule
    ev = (
        _events(spark, sf_dir)
        .select("user_id", "event_type")
        .where(F.col("event_type").isNotNull())
    )
    return ev.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(t)
            for t in EVENT_TYPES
        ]
    )


def lineitem_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt (wide → long): the three lineitem measures as
    (key, measure, val) rows — the reshape feeding generic per-metric
    pipelines. Spark's native ``unpivot`` is a zero-shuffle narrow
    expansion (each input row emits k value rows in place); the
    oracle's UNION ALL reads the table k times instead, which is the
    semantics, not the plan."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    )


def current_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert (operators/merge.py): events split into a base
    snapshot (even event_id) and a CDC update batch (odd event_id),
    compacted to the latest state per (user, event_type) — newest ts
    wins, event_id breaks ts ties deterministically. The split is
    synthetic but the compaction is the real operator; the oracle is
    the window formulation over the reunified stream."""
    from parquet_combiner_spark.operators.merge import merge_upsert

    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    base = ev.where(F.col("event_id") % 2 == 0)
    updates = ev.where(F.col("event_id") % 2 == 1)
    return merge_upsert(
        base,
        updates,
        keys=["user_id", "event_type"],
        version_cols=["ts", "event_id"],
    )


def current_user_state_with_deletes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MERGE with tombstones (operators/merge.py ``op_col``): the CDC
    update batch carries a change op — every 7th update is a DELETE —
    and a tombstone that wins its key's version race removes the key
    from the compacted state (Delta's ``WHEN MATCHED AND op='D' THEN
    DELETE``). The op derivation is synthetic but deterministic in
    both engines; the oracle is the window formulation with the
    winner filtered on op."""
    from parquet_combiner_spark.operators.merge import merge_upsert

    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    base = ev.where(F.col("event_id") % 2 == 0)
    updates = ev.where(F.col("event_id") % 2 == 1).withColumn(
        "op",
        F.when(F.col("event_id") % 7 == 0, F.lit("D")).otherwise(F.lit("U")),
    )
    return merge_upsert(
        base,
        updates,
        keys=["user_id", "event_type"],
        version_cols=["ts", "event_id"],
        op_col="op",
    )


def user_state_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-level MERGE INTO on a VERSIONED table (tools/txlog.py
    ``merge_into`` — the last Delta-parity DML verb): the even-id
    events are committed as the table's initial snapshot, the odd-id
    op-carrying CDC batch (every 7th a DELETE) merges in as ONE
    atomic zone-map-pruned ``replace`` commit with expected_version
    retry, and the query returns the table's end state. Version
    ordering (ts, event_id) decides every key, so the end state must
    equal the one-shot batch compaction — the
    ``current_user_state_with_deletes`` oracle checks it verbatim."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-mrginto-")
    table = f"{root}/state"
    try:
        txlog.commit(
            ev.where(F.col("event_id") % 2 == 0), table, stats_cols=["user_id"]
        )
        updates = ev.where(F.col("event_id") % 2 == 1).withColumn(
            "op",
            F.when(F.col("event_id") % 7 == 0, F.lit("D")).otherwise(
                F.lit("U")
            ),
        )
        txlog.merge_into(
            spark,
            table,
            updates,
            keys=["user_id", "event_type"],
            version_cols=["ts", "event_id"],
            op_col="op",
            stats_cols=["user_id"],
        )
        return txlog.read_table(spark, table).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def user_state_merge_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MERGE INTO on a ``bucket(16, user_id)`` HIDDEN-PARTITION
    layout (tools/txlog.py ``merge_into`` + ``_batch_bucket_sets`` —
    VERDICT r12 order #4): the narrow CDC batch (odd-id events of
    users 3–7 only — present at every SF) maps to its BUCKET SET via
    one Spark aggregate that is JVM-identical to the writer's path
    arithmetic, so the replace rewrites at most |batch buckets| of
    the 16 directories with zero footer reads (directory-pinned in
    tests/test_partitioned_tables.py). Latest-wins (ts, event_id)
    with 'D' deletes, same kernel as ``user_state_merge_into``. The
    base commit is made KEY-UNIQUE first (latest even event per key):
    merge rewrites ONLY the batch's buckets, so base duplicates in
    untouched buckets would pass through verbatim and no SQL window
    over raw events could express that file-scoped end state — with a
    unique-key base the result IS the restricted union compaction the
    oracle replays."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    base = (
        ev.where(F.col("event_id") % 2 == 0)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    root = tempfile.mkdtemp(prefix="pcs-mrgbkt-")
    table = f"{root}/state"
    try:
        txlog.commit(
            base, table, partition_by=["bucket(16, user_id)"]
        )
        updates = (
            ev.where(F.col("event_id") % 2 == 1)
            .where(F.col("user_id").between(3, 7))
            .withColumn(
                "op",
                F.when(
                    F.col("event_id") % 7 == 0, F.lit("D")
                ).otherwise(F.lit("U")),
            )
        )
        txlog.merge_into(
            spark,
            table,
            updates,
            keys=["user_id", "event_type"],
            version_cols=["ts", "event_id"],
            op_col="op",
        )
        return txlog.read_table(spark, table).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def user_state_join_cobucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STORAGE-PARTITIONED join of two txtables with identical
    ``bucket(8, user_id)`` hidden-partition layouts (tools/txlog.py
    ``join_cobucketed`` — VERDICT r13 'Next round' #3, the reference's
    joins.pdf p.1-3 co-located-join doctrine): the per-user event
    aggregate (facts) and a sparse per-user purchase profile (dim)
    are committed under the SAME bucket spec, so the join maps the
    bucket directories PAIRWISE — N per-bucket BroadcastHashJoins
    unioned, NO shuffle Exchange on either side (plan-pinned in
    tests/test_plans.py). The fact side never rides a shuffle and the
    dim is broadcast one 1/8th bucket at a time; the sparse dim
    filter leaves some buckets right-empty, exercising the inner-join
    bucket skip."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir)
    facts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    dim = (
        ev.where(
            (F.col("event_type") == "purchase")
            & (F.col("event_id") % 13 == 0)
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled_purchases"),
            F.max("event_id").alias("max_purchase_event_id"),
        )
    )
    root = tempfile.mkdtemp(prefix="pcs-cobkt-")
    try:
        txlog.commit(
            facts, f"{root}/facts", partition_by=["bucket(8, user_id)"]
        )
        txlog.commit(
            dim, f"{root}/dim", partition_by=["bucket(8, user_id)"]
        )
        out = txlog.join_cobucketed(
            spark, f"{root}/facts", f"{root}/dim", "user_id", how="inner"
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def user_state_join_agg_cobucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The FUSED storage-partitioned reporting query (r15): RAW fact
    rows co-bucketed with a sparse per-user dim, enriched by the
    per-bucket broadcast join and aggregated per user INSIDE the same
    per-bucket plan (``join_cobucketed(aggs=...)``) — scan →
    broadcast join → aggregate → union with ZERO shuffle Exchanges,
    where the plain formulation pays one exchange for the join and
    another for the groupBy. The left join keeps purchase-less users
    (their dim aggregate is NULL); the count-distinct rides free on
    bucket-completeness."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir)
    facts = ev.select("user_id", "event_type", "value")
    dim = (
        ev.where(
            (F.col("event_type") == "purchase")
            & (F.col("event_id") % 13 == 0)
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("nsp"))
    )
    root = tempfile.mkdtemp(prefix="pcs-joinagg-")
    try:
        txlog.commit(
            facts, f"{root}/facts", partition_by=["bucket(8, user_id)"]
        )
        txlog.commit(
            dim, f"{root}/dim", partition_by=["bucket(8, user_id)"]
        )
        out = txlog.join_cobucketed(
            spark,
            f"{root}/facts",
            f"{root}/dim",
            "user_id",
            how="left",
            aggs=[
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 6).alias("total_value"),
                F.countDistinct("event_type").alias("n_types"),
                F.max("nsp").alias("n_sampled_purchases"),
            ],
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def user_state_agg_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STORAGE-PARTITIONED aggregation over a ``bucket(8, user_id)``
    txtable (tools/txlog.py ``agg_bucketed`` — VERDICT r14 'Next
    round' #4, the aggregate sibling of the co-bucketed join;
    reference partial-agg doctrine, considerations.txt:36-38): the
    event rows are committed under the bucket spec, then
    ``groupBy(user_id)`` runs per bucket directory and unions — the
    plan carries ZERO shuffle Exchange (pinned in
    tests/test_cobucketed_join.py) because every user's rows live in
    exactly one bucket, so per-bucket groups are complete. The
    count-distinct aggregate is the point: bucket-completeness makes
    even non-decomposable aggregates legal without their usual two
    extra exchanges."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-aggbkt-")
    try:
        txlog.commit(
            ev, f"{root}/t", partition_by=["bucket(8, user_id)"]
        )
        out = txlog.agg_bucketed(
            spark,
            f"{root}/t",
            "user_id",
            [
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 6).alias("total_value"),
                F.countDistinct("event_type").alias("n_types"),
            ],
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def user_state_merge_cdf_feed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CDF from MERGE INTO (tools/txlog.py ``merge_into(cdf=True)`` —
    VERDICT r11 order #3): the compacted even-id state is v0, the
    odd-id op-carrying CDC batch merges in with change-data capture
    on, and the query returns the recorded row-level feed — insert /
    delete / update_preimage / update_postimage, each stamped with
    the merge's commit version — read from O(changed rows) change
    files, never a snapshot diff. The oracle reconstructs every
    class in SQL from the global version race: the winner per key
    across ALL events equals the winner across (compacted evens ∪
    odds), so each class is a join of the base snapshot against the
    race winner."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    base = (
        ev.where(F.col("event_id") % 2 == 0)
        .withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .drop("__rn")
    )
    updates = ev.where(F.col("event_id") % 2 == 1).withColumn(
        "op",
        F.when(F.col("event_id") % 7 == 0, F.lit("D")).otherwise(
            F.lit("U")
        ),
    )
    root = tempfile.mkdtemp(prefix="pcs-mrgcdf-")
    table = f"{root}/state"
    try:
        txlog.commit(base, table, stats_cols=["user_id"])
        txlog.merge_into(
            spark,
            table,
            updates,
            keys=["user_id", "event_type"],
            version_cols=["ts", "event_id"],
            op_col="op",
            stats_cols=["user_id"],
            cdf=True,
        )
        return (
            txlog.table_changes_cdf(spark, table, after_version=0)
            .select(
                "user_id", "event_type", "ts", "event_id", "value",
                "_change_type", "_commit_version",
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def user_state_mv_cdf_refresh(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental materialized-view maintenance across row-level DML
    (r15, ``tools/mv.py refresh_agg_mv``): the per-user (count, sum)
    view over the keyed state table refreshes from the MERGE's
    recorded CDF — each change row folds with a sign (+post, −pre) —
    so the base is NEVER re-scanned after the initial build. The
    flow chains three engine subsystems end-to-end: commit the
    key-unique even-id state and build the view (full pass #1), MERGE
    the odd-id op-carrying CDC batch with ``cdf=True``, then refresh
    the view from O(changed rows) change files (pass #2 reads no base
    files). Output: the refreshed view — which the oracle recomputes
    from the global version race (winner per key across ALL events,
    D-winners drop), aggregated per user."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from parquet_combiner_spark.tools import txlog
    from parquet_combiner_spark.tools.mv import refresh_agg_mv

    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    base = (
        ev.where(F.col("event_id") % 2 == 0)
        .withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .drop("__rn")
    )
    updates = ev.where(F.col("event_id") % 2 == 1).withColumn(
        "op",
        F.when(F.col("event_id") % 7 == 0, F.lit("D")).otherwise(
            F.lit("U")
        ),
    )
    root = tempfile.mkdtemp(prefix="pcs-mvcdf-")
    table, mv = f"{root}/state", f"{root}/mv"
    try:
        txlog.commit(base, table, stats_cols=["user_id"])
        refresh_agg_mv(
            spark, table, mv, ["user_id"], sum_cols=["value"]
        )
        txlog.merge_into(
            spark,
            table,
            updates,
            keys=["user_id", "event_type"],
            version_cols=["ts", "event_id"],
            op_col="op",
            stats_cols=["user_id"],
            cdf=True,
        )
        refresh_agg_mv(
            spark, table, mv, ["user_id"], sum_cols=["value"]
        )
        out = txlog.read_table(spark, mv).select(
            "user_id",
            F.col("n").alias("n_state_rows"),
            F.round("value", 6).alias("total_value"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def event_state_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE TABLE ... TO VERSION AS OF on a versioned table
    (tools/txlog.py ``restore``): the even-id events are committed as
    v0, the odd-id events appended as v1, then the table is RESTORED
    to v0 — a METADATA-ONLY commit that republishes v0's exact file
    list as the new head (no data read or rewritten; at 100 TB the
    rollback is O(files) JSON metadata). The end state must be
    exactly the even-id rows — the oracle — while v1 stays
    time-travelable underneath (pytest covers that and the undo-diff
    CDF; reference parity: combiner.cpp's immutable outputs, lifted
    to versioned-table semantics)."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-restore-")
    table = f"{root}/events_v"
    try:
        txlog.commit(ev.where(F.col("event_id") % 2 == 0), table)
        txlog.commit(ev.where(F.col("event_id") % 2 == 1), table)
        txlog.restore(table, version=0)
        return txlog.read_table(spark, table).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ... ZORDER BY (user_id, value) then a zone-map-pruned
    selective scan on the SECOND clustering column (tools/txlog.py
    ``optimize(zorder_by=...)``): events land as 8 arbitrary files,
    the Morton-curve rewrite lays them out so each output file covers
    a small (user_id, value) rectangle, and the value-range read
    opens only the files whose zone maps intersect [20, 40] —
    file skipping on a NON-LEADING dimension, which a lexicographic
    sort cannot give. Pruning is a pure superset optimization, so the
    result must equal the plain filtered scan — the oracle. The
    multi-file layout + both-column skip ratios are pinned in pytest
    (test_tools.py); at 100 TB this is the layout that turns a
    two-predicate scan into a minority-of-files read."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-zorder-")
    table = f"{root}/events_z"
    try:
        txlog.commit(ev.repartition(8), table)
        txlog.optimize(
            spark,
            table,
            target_file_mb=0.05,
            zorder_by=["user_id", "value"],
        )
        return (
            txlog.read_table_pruned(spark, table, "value", 20.0, 40.0)
            .where(F.col("value").between(20.0, 40.0))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive partition-column layout on the versioned table
    (tools/txlog.py ``commit(partition_by=...)``): events land under
    ``event_type=<v>/`` directories — the layout a 100 TB firehose
    table uses for its date column — and the partition-pruned read
    resolves the matching files from the LISTING alone (zero I/O
    before the scan; file-set pinned in
    tests/test_partitioned_tables.py). Partition values come back as
    JVM expressions over ``_metadata.file_path`` (a txlog snapshot
    spans many commit dirs, which Spark's own basePath discovery
    rejects — the Delta custom-FileIndex problem solved at the
    expression layer). The oracle is the plain equality filter."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-part-")
    table = f"{root}/events_p"
    try:
        txlog.commit(ev, table, partition_by=["event_type"])
        return txlog.read_table_partitioned(
            spark, table, {"event_type": "purchase"}
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_renamed_column_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RENAME COLUMN via column mapping (tools/txlog.py
    ``rename_column`` — Delta's name-mapping mode): the events
    txtable renames ``value`` → ``amount`` as one METADATA-ONLY
    commit (zero files rewritten — pinned in
    tests/test_column_mapping.py), then an APPEND arrives under the
    new logical name and lands in files under the original physical
    name, and the read resolves both eras through the
    logical→physical map. The oracle is the same rows with the column
    aliased — if mapping leaked nulls or dropped the appended rows,
    the hash catches it."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-rename-")
    table = f"{root}/events_r"
    try:
        txlog.commit(ev, table, stats_cols=["value"])
        txlog.rename_column(table, "value", "amount")
        txlog.commit(
            ev.limit(0).select(
                "event_id", "user_id", "event_type",
                F.col("value").alias("amount"),
            ).unionByName(
                spark.createDataFrame(
                    [(-1, -1, "synthetic", 123.5)],
                    "event_id bigint, user_id bigint, "
                    "event_type string, amount double",
                )
            ),
            table,
        )
        return txlog.read_table(spark, table).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_dv_delete_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE end-state (tools/txlog.py ``delete_where
    (mode="dv")``): events land as 8 files with value zone maps, two
    OVERLAPPING dv-deletes record position vectors — no data file is
    rewritten (pinned in tests/test_deletion_vectors.py) — and the
    read-back anti-filters the vectors at scan time. The oracle is
    the surviving-rows predicate over the raw events table: the
    vectors must behave exactly like the copy-on-write delete, row
    for row (NULL values survive — not in any [lo, hi])."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-dv-")
    table = f"{root}/events_dv"
    try:
        txlog.commit(ev.repartition(8), table, stats_cols=["value"])
        txlog.delete_where(spark, table, "value", 20.0, 40.0, mode="dv")
        # second, overlapping delete: the per-file vectors UNION
        txlog.delete_where(spark, table, "value", 35.0, 55.0, mode="dv")
        return txlog.read_table(spark, table).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_expr_delete_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPRESSION-predicate DELETE end-state (tools/txlog.py
    ``delete_where_expr`` — VERDICT r10 order #2): the first delete is
    the user's-first-real-DELETE shape, a two-predicate conjunction
    (``event_type = 'click' AND value BETWEEN ...``) whose value band
    is extracted from Catalyst's analyzed tree and prunes the rewrite
    set via zone maps (pinned in tests/test_expr_dml.py); the second
    is an OR/modulo predicate no band can serve — prune-nothing
    fallback, merge-on-read vectors — stacked on the survivor files.
    The oracle applies both predicates with SQL DELETE NULL semantics
    (NULL predicate rows survive) over the raw events table."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-exprdel-")
    table = f"{root}/events_x"
    try:
        txlog.commit(ev.repartition(8), table, stats_cols=["value"])
        txlog.delete_where_expr(
            spark, table,
            "event_type = 'click' AND value BETWEEN 20.0 AND 60.0",
            stats_cols=["value"],
        )
        txlog.delete_where_expr(
            spark, table,
            "user_id % 10 = 0 OR value > 95.0",
            mode="dv",
        )
        return txlog.read_table(spark, table).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_point_set_delete_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GDPR point-delete shape on an UNCLUSTERED key (tools/txlog.py
    ``delete_where_expr`` + ``_sql_conjunct_constraints`` point sets —
    VERDICT r13 'Next round' #4): ``event_id IN (…subject ids…)``
    where every file's [min, max] envelope spans the whole id range
    (interleaved layout), so envelope pruning alone would rewrite the
    table; the IN-list's exact point set probes each file PER KEY
    through zone maps, paths, and listing-level bloom sidecars, and
    the copy-on-write delete rewrites only the key-holding files
    (file-prune pinned in tests/test_point_set_dml.py). A second
    IN+range conjunction exercises the set-alongside-band path. The
    oracle applies both deletes over raw events with SQL DELETE NULL
    semantics (NULL-predicate rows survive)."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-ptset-")
    table = f"{root}/events_p"
    try:
        # repartition on user_id: event_ids interleave across every
        # file, the anti-clustered worst case for envelope pruning
        txlog.commit(
            ev.repartition(8, "user_id"),
            table,
            stats_cols=["event_id"],
            bloom_cols={"event_id": 50_000},
        )
        txlog.delete_where_expr(
            spark, table,
            "event_id IN (7, 13, 501, 997, 2024)",
            stats_cols=["event_id"],
        )
        txlog.delete_where_expr(
            spark, table,
            "event_id IN (42, 256, 4096) AND value >= 1.0",
        )
        return txlog.read_table(spark, table).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_where_pruned_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Arbitrary-SQL-predicate snapshot read with metadata file
    skipping (tools/txlog.py ``read_table_where`` — the READ-side
    twin of the expr DML verbs' band + point-set pruning): an
    ``event_id IN (…) AND value >= …`` ad-hoc scan extracts the
    IN-list's exact point set and the value band from Catalyst's
    analyzed tree, probes each file per key through zone maps and
    bloom sidecars, and re-applies the full predicate row-level —
    exactly the filtered snapshot from O(key-holding files)
    (file-prune pinned in tests/test_point_set_dml.py)."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-where-")
    table = f"{root}/events_w"
    try:
        txlog.commit(
            ev.repartition(8, "user_id"),
            table,
            stats_cols=["event_id", "value"],
            bloom_cols={"event_id": 50_000},
        )
        return txlog.read_table_where(
            spark, table,
            "event_id IN (3, 77, 501, 997, 4242) AND value >= 5.0",
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_dv_update_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ UPDATE end-state (tools/txlog.py
    ``update_where_expr(mode="dv")`` — VERDICT r10 order #3): one
    commit carries a deletion vector over the matched rows' old
    positions PLUS an append of the updated rows — zero data files
    rewritten (mtime-pinned in tests/test_expr_dml.py). A follow-up
    DV delete then lands partly on the update's own appended files,
    proving vectors stack on merge-on-read appends. The oracle is
    the same UPDATE-then-DELETE as plain SQL over raw events (CASE
    evaluates both SET expressions against the pre-update row, which
    the engine matches because the SET expressions are independent)."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-dvupd-")
    table = f"{root}/events_u"
    try:
        txlog.commit(ev.repartition(8), table, stats_cols=["value"])
        txlog.update_where_expr(
            spark, table,
            "event_type = 'view' AND value < 50.0",
            {"value": "value + 1000", "event_type": "'view_adj'"},
            mode="dv",
        )
        txlog.delete_where_expr(
            spark, table,
            "value BETWEEN 1030.0 AND 1040.0",
            mode="dv",
        )
        return txlog.read_table(spark, table).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_preimage_update_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SQL PRE-IMAGE UPDATE semantics end-to-end (tools/txlog.py
    ``_apply_set_preimage`` — the VERDICT r11 confirmed-bug fix): the
    first UPDATE's predicate references a SET column AND its second
    SET expression reads the pre-update ``value`` (``value < 40``
    drives both ``value + 1000`` and a '_lo'/'_mid' suffix computed
    from the ORIGINAL value — sequential withColumn would tag every
    matched row '_mid' and, in cow mode, skip the suffix entirely);
    the second UPDATE swaps two SET columns (``event_id`` ↔
    ``user_id``), the canonical dependent-SET shape. DuckDB's UPDATE
    has pre-image semantics natively, so the oracle's stacked CASE
    projections are exactly what SQL would commit."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-preimg-")
    table = f"{root}/events_p"
    try:
        txlog.commit(ev.repartition(8), table, stats_cols=["value"])
        txlog.update_where_expr(
            spark, table,
            "value < 40.0",
            {
                "value": "value + 1000",
                "event_type": (
                    "concat(event_type, case when value < 20.0 "
                    "then '_lo' else '_mid' end)"
                ),
            },
            mode="cow",
        )
        txlog.update_where_expr(
            spark, table,
            "event_type = 'purchase' AND value >= 80.0",
            {"event_id": "user_id", "user_id": "event_id"},
            mode="dv",
        )
        return txlog.read_table(spark, table).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_cdf_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED from recorded change files (tools/txlog.py
    ``table_changes_cdf`` — Delta's CDF): a cow DELETE and a
    merge-on-read UPDATE run with ``cdf=True``, and the feed returns
    their row-level deltas — delete preimages, update pre/post
    images, each stamped with its commit version — by reading
    O(changed rows) of change files, never diffing snapshots. The
    oracle reconstructs the same feed in SQL: delete preimages from
    the raw table, update images from the post-delete state (the
    sequential-DML semantics the engine executed)."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-cdf-")
    table = f"{root}/events_c"
    try:
        txlog.commit(ev.repartition(8), table, stats_cols=["value"])
        txlog.delete_where_expr(
            spark, table,
            "event_type = 'click' AND value < 30.0",
            cdf=True,
        )
        txlog.update_where_expr(
            spark, table,
            "event_type = 'view' AND value > 80.0",
            {"value": "value + 1"},
            mode="dv",
            cdf=True,
        )
        return txlog.table_changes_cdf(
            spark, table, after_version=0
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_cdf_stream_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING change data feed (sources/txtable_source.py
    ``read_change_feed`` — Delta's readChangeFeed streaming mode,
    VERDICT r11 order #4): events land as two append commits, then a
    cow DELETE and a merge-on-read UPDATE run with ``cdf=True``; the
    stream serves the appends as ``insert`` rows and the DML commits
    as their RECORDED row-level change files — never refusing, never
    re-emitting the table — each row stamped ``_change_type`` and
    ``_commit_version``. The oracle reconstructs the full feed in
    SQL: inserts split by the residue that committed them, delete
    preimages from the raw table, update images from the post-delete
    state."""
    import shutil
    import tempfile

    from parquet_combiner_spark.sources.txtable_source import (
        TxTableChangesDataSource,
    )
    from parquet_combiner_spark.tools import txlog

    try:
        spark.dataSource.register(TxTableChangesDataSource)
    except Exception:
        pass  # already registered in this session
    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-cdfstream-")
    table = f"{root}/events_cs"
    out = f"{root}/out"
    ckpt = f"{root}/ckpt"
    try:
        for m in range(2):
            txlog.commit(
                ev.where(F.col("event_id") % 2 == m),
                table,
                stats_cols=["value"],
            )
        txlog.delete_where_expr(
            spark, table,
            "event_type = 'click' AND value < 30.0",
            cdf=True,
        )
        txlog.update_where_expr(
            spark, table,
            "event_type = 'view' AND value > 80.0",
            {"value": "value + 1"},
            mode="dv",
            cdf=True,
        )

        def land(batch: DataFrame, _eid: int) -> None:
            batch.write.mode("append").parquet(out)

        query = (
            spark.readStream.format("txtable_changes")
            .option("path", table)
            .option("read_change_feed", "true")
            .load()
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        return spark.read.parquet(out).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_string_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING zone-map pruning (tools/txlog.py ``_zone_disjoint``
    lexicographic bounds — the ``country = 'de'`` shape): events land
    range-clustered by ``event_type`` so each file covers a narrow
    string range, and a pruned equality read skips every file whose
    [min, max] excludes the value from the LISTING (inputFiles-pinned
    in tests/test_expr_dml.py). The oracle is the plain equality
    filter — lexicographic pruning must be a pure superset
    optimization, row for row."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-strz-")
    table = f"{root}/events_s"
    try:
        txlog.commit(
            ev.repartitionByRange(6, "event_type"),
            table,
            stats_cols=["event_type"],
        )
        return txlog.read_table_pruned(
            spark, table, "event_type", "purchase", "purchase"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_zorder_string_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ... ZORDER BY (event_type, value) with a STRING
    leading dimension (tools/txlog.py ``_zorder_proxy`` — VERDICT r11
    'What's missing' #4): the byte-prefix proxy rank-buckets the
    string column into the Morton interleave, so the rewrite clusters
    by (type, value) jointly and the string-pruned equality read
    opens only the files whose lexicographic zone maps can hold
    'purchase' — the ``country``-shaped layout move that string zone
    maps could previously only EXPLOIT, not produce. Skip ratios for
    a string+numeric pair are pinned in tests/test_tools.py; the
    oracle is the plain equality filter (clustering is pure layout —
    row for row identical)."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-zstr-")
    table = f"{root}/events_zs"
    try:
        txlog.commit(ev.repartition(8), table)
        txlog.optimize(
            spark,
            table,
            target_file_mb=0.05,
            zorder_by=["event_type", "value"],
        )
        return (
            txlog.read_table_pruned(
                spark, table, "event_type", "purchase", "purchase"
            )
            .where(F.col("event_type") == "purchase")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_rebased_dml_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENIGN-CONFLICT REBASE end-state (tools/txlog.py
    ``commit(rebase_bands=...)`` — Delta's conflict reconciliation,
    VERDICT r11 'What's missing' #3): a DELETE's commit race is LOST
    on purpose to a concurrent disjoint append (an arbiter hook fires
    the append inside the DELETE's publish window — the streaming-
    sink-mid-DML interleaving), and the DELETE rebases its
    already-staged files onto the new head instead of re-running.
    The oracle is the serial history: base rows minus the deleted
    band, plus the appended rows — if the rebase dropped the append,
    resurrected deleted rows, or double-applied, the hash breaks.
    Zero-re-execution is pinned in tests/test_rebase.py (data-dir
    count); this key pins the VALUE semantics end-to-end."""
    import json as _json
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-rebase-")
    table = f"{root}/events_rb"

    class _OneShotAppender(txlog.CommitArbiter):
        def __init__(self):
            self.inner = txlog.FilesystemArbiter()
            self.armed = True

        def publish(self, path, payload):
            if self.armed and _json.loads(payload)["action"] == "replace":
                self.armed = False  # before the append: no recursion
                txlog.commit(
                    ev.where(F.col("value") >= 400.0).withColumn(
                        "event_type", F.lit("late_arrival")
                    ),
                    table,
                    stats_cols=["value"],
                )
            self.inner.publish(path, payload)

    try:
        txlog.commit(
            ev.repartitionByRange(6, "value"), table, stats_cols=["value"]
        )
        prev = txlog.set_arbiter(_OneShotAppender())
        try:
            txlog.delete_where(
                spark, table, "value", 10.0, 60.0, stats_cols=["value"]
            )
        finally:
            txlog.set_arbiter(prev)
        return txlog.read_table(spark, table).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_bucket_transform_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style PARTITION TRANSFORM (tools/txlog.py
    ``partition_by=["bucket(8, user_id)"]`` — VERDICT r11 'What's
    missing' #5): the high-cardinality ``user_id`` column partitions
    into 8 hash buckets instead of one directory per user (the layout
    a 100 TB table can actually afford), the source column stays IN
    the data files, and the listing-pruned point read recomputes the
    bucket Python-side to open only the matching directory's files —
    pinned via inputFiles in tests/test_partition_evolution.py. The
    oracle is the plain equality filter: transform partitioning is
    pure layout, row for row identical."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-bkt-")
    table = f"{root}/events_bk"
    try:
        txlog.commit(ev, table, partition_by=["bucket(8, user_id)"])
        return txlog.read_table_partitioned(
            spark, table, {"user_id": 42}
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_hidden_partition_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIDDEN-PARTITION predicate pruning (tools/txlog.py
    ``_path_band_disjoint`` — VERDICT r12 order #3, Iceberg's
    headline trick): events land under ``days(ts)`` directories, and
    a PLAIN range predicate on ``ts`` — no explicit partition dict,
    no zone maps recorded anywhere on the table — prunes the listing
    to the matching day directories before any footer or data read
    (inputFiles-pinned in tests/test_partition_evolution.py). The
    oracle is the identical BETWEEN over raw events: hidden
    partitioning is pure layout, row for row identical."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(table_path(sf_dir, "events"))
    if dict(raw.dtypes)["ts"] == "bigint":
        # TIMESTAMP(NANOS) era testdata: rebuild a timestamp column
        # (micros precision — the oracle floors the same way)
        raw = raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    ev = raw.select("event_id", "user_id", "event_type", "value", "ts")
    root = tempfile.mkdtemp(prefix="pcs-hidp-")
    table = f"{root}/events_hp"
    try:
        txlog.commit(ev, table, partition_by=["days(ts)"])
        pruned = txlog.read_table_pruned(
            spark,
            table,
            "ts",
            "2024-01-10 00:00:00",
            "2024-01-12 23:59:59.999999",
        )
        return (
            ensure_ts_nanos(pruned)
            .withColumnRenamed("ts", "tns")
            .select("event_id", "user_id", "event_type", "value", "tns")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_stats_property_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Zone maps as a TABLE PROPERTY (tools/txlog.py
    ``set_stats_cols`` — VERDICT r12 order #1, Delta's
    ``dataSkippingStatsColumns``): the even-id half of events is
    committed with NO stats anywhere, one metadata commit sets the
    property (backfilling the existing files from parquet footers),
    and the odd-id append then records zone maps AUTOMATICALLY — no
    ``stats_cols`` argument on any write. The pruned range read spans
    both eras; real-sink coverage and the rebase-enabling consequence
    live in tests/test_stats_property.py. The oracle is the plain
    BETWEEN over all events: stats are pure skipping, row for row
    identical."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-statsprop-")
    table = f"{root}/events_sp"
    try:
        txlog.commit(ev.where(F.col("event_id") % 2 == 0), table)
        txlog.set_stats_cols(table, ["user_id"])  # backfills era 1
        txlog.commit(ev.where(F.col("event_id") % 2 == 1), table)
        return txlog.read_table_pruned(
            spark, table, "user_id", 3, 7
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_bloom_point_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARQUET BLOOM FILTER point lookup (tools/txlog.py
    ``commit(bloom_cols=...)`` — Delta's bloom filter index as a
    table property): the events txtable embeds per-row-group bloom
    pages for ``event_id`` — a high-cardinality UNCLUSTERED column
    whose min/max zone maps span every file, the shape where range
    skipping is useless — and the point read lets the parquet reader
    skip row groups whose bloom answers "definitely absent",
    executor-side. Since r13 the same property also writes
    LISTING-level bloom sidecars consulted by
    ``read_table_pruned_in`` BEFORE any file is opened (Delta's bloom
    index shape — file-skip pinned in tests/test_tools.py). Property
    inheritance and real-bytes pins live in tests/test_tools.py; the
    oracle is the plain equality filter (blooms are pure skipping —
    row for row identical)."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-bloom-")
    table = f"{root}/events_bl"
    try:
        txlog.commit(
            ev.repartition(4), table,
            bloom_cols={"event_id": 200_000},
        )
        return txlog.read_table_pruned_in(
            spark, table, "event_id", [77, 777, 3141]
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_spec_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION SPEC EVOLUTION end-state (tools/txlog.py
    ``set_partition_spec`` — Iceberg-style): even event_ids land FLAT,
    one metadata-only commit evolves the layout to
    ``partition_by=['event_type']``, odd event_ids land Hive-
    partitioned — zero files rewritten (mtime-pinned in
    tests/test_partition_evolution.py). The read resolves
    ``event_type`` PER FILE (from the path in the new era, from the
    data in the old) and a listing-pruned partitioned read then
    filters one type across both eras. The oracle is the same
    filter over raw events — any per-file era confusion (null-filled
    old rows, misdecoded path values) breaks the hash."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-specevo-")
    table = f"{root}/events_pe"
    try:
        txlog.commit(
            ev.where(F.col("event_id") % 2 == 0).repartition(4), table
        )
        txlog.set_partition_spec(table, ["event_type"])
        txlog.commit(
            ev.where(F.col("event_id") % 2 == 1).repartition(4), table
        )
        return txlog.read_table_partitioned(
            spark, table, {"event_type": "purchase"}
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def current_user_state_with_deletes_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming CDC apply WITH tombstones: the op-carrying change
    stream is staged as multiple files and merged one micro-batch at
    a time (streaming/apply_cdc.py, ``op_col`` threaded through), so
    deletes and upserts interleave across batches in arbitrary order —
    yet the final state must equal the one-shot batch compaction,
    checked by the batch query's oracle verbatim (version ordering,
    not arrival order, decides)."""
    import shutil
    import tempfile

    from parquet_combiner_spark.streaming.apply_cdc import (
        apply_cdc_available_now,
    )

    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    # the CHANGE stream: odd event_ids, with every 7th a tombstone;
    # the base snapshot (even event_ids, pre-compacted) seeds state
    changes = ev.where(F.col("event_id") % 2 == 1).withColumn(
        "op",
        F.when(F.col("event_id") % 7 == 0, F.lit("D")).otherwise(F.lit("U")),
    )
    stage = tempfile.mkdtemp(prefix="pcs-cdcd-src-")
    root = tempfile.mkdtemp(prefix="pcs-cdcd-state-")
    state_dir = f"{root}/state"
    try:
        from parquet_combiner_spark.operators.merge import merge_upsert

        base = ev.where(F.col("event_id") % 2 == 0)
        # seed the persisted state with the compacted base snapshot;
        # the state schema carries the retained-tombstone flag the
        # incremental apply maintains (all-false for live seed rows)
        merge_upsert(
            base.limit(0), base,
            keys=["user_id", "event_type"],
            version_cols=["ts", "event_id"],
        ).withColumn("__tombstone", F.lit(False)).write.parquet(state_dir)
        # 3 files -> 3 micro-batches at maxFilesPerTrigger=1
        changes.repartition(3).write.mode("overwrite").parquet(stage)
        schema = spark.read.parquet(stage).schema
        final = apply_cdc_available_now(
            spark,
            stage,
            state_dir,
            keys=["user_id", "event_type"],
            version_cols=["ts", "event_id"],
            schema=schema,
            op_col="op",
        )
        return final.select(
            "user_id", "event_type", "ts", "event_id", "value"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — bidirectional nation-pair trade volume:
    revenue shipped between NATION_1 and NATION_2 (both directions)
    per ship year. The supplier and customer sides resolve through
    SEPARATE nation dimension copies — the classic double-dim join.

    Plan intent: supplier/customer/nation are all broadcast (the
    fact table never shuffles for a dim); the one full-data exchange
    is lineitem ⋈ orders on orderkey; the nation-pair filter prunes
    before the final partial-aggregated groupBy over (nation pair,
    year) — output is years × 2 rows."""
    n1, n2 = "NATION_1", "NATION_2"
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .select(
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
            "l_shipdate",
        )
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year(F.col("l_shipdate").cast("timestamp")).alias("l_year"),
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))),
            2,
        ).alias("revenue")
    )


def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — NATION_3's share of ASIA's order revenue per
    order year: a conditional-share aggregation (sum(case)/sum) over
    a five-dim join.

    Plan intent: every dimension broadcasts; the single full-data
    exchange is lineitem ⋈ orders; the share divides two partial
    aggregates computed in ONE groupBy pass (no second scan, no
    window)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    # customer's nation must sit in ASIA; supplier's nation names the
    # market-share subject
    cn = (
        nation.join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .where(F.col("r_name") == "ASIA")
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )
    return joined.groupBy(
        F.year(F.col("o_orderdate").cast("timestamp")).alias("o_year")
    ).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(0.0))
            / F.sum(rev),
            6,
        ).alias("mkt_share")
    )


def returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — returned-item reporting: the 20 customers
    who generated the most revenue on RETURNED lineitems for orders
    placed in H1-1996, with their nation.

    Plan intent: the returnflag filter and the order-date range both
    push to their scans; customer and nation broadcast; top-20 is
    TakeOrderedAndProject over the customer-cardinality aggregate."""
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1996-07-01").cast("timestamp_ntz")
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_custkey")
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(nation),
            cust["c_nationkey"] == nation["n_nationkey"],
        )
    )
    rev = joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))),
            2,
        ).alias("revenue")
    )
    return rev.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — promotion effect: PROMO parts' percentage of
    1996 shipped revenue, one row. The part dim broadcasts; the
    conditional numerator and the denominator come from the same
    single aggregation pass over the date-pruned lineitem scan."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


def brand_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — disjunctive predicate revenue: an OR of three
    (brand, size-range, quantity-range) conjunctions across the
    lineitem ⋈ part join, one output row.

    Plan intent: the quantity bounds (the only pure-lineitem terms of
    the disjunction: qty in the union of the three ranges) are pushed
    to the lineitem scan; part broadcasts; the full OR-of-ANDs
    evaluates post-join as a codegen'd predicate — Q19 is the classic
    test that a planner keeps a disjunction join-eligible instead of
    falling back to a cartesian."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .where((F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30))
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#15") & s.between(1, 30) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .where(cond)
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
                ),
                2,
            ).alias("revenue")
        )
    )


def event_counts_stream_metric_store(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The exactly-once streaming METRICS STORE, composed from three
    engine pieces: each micro-batch is pre-aggregated to per-type
    partial counts (mergeable partial aggregates), committed as ONE
    atomic version of a txlog table keyed on (query_id, epoch) — the
    idempotence key additive state NEEDS, since replaying an additive
    batch double-counts (operators/merge.merge_additive's documented
    hazard; the commit log absorbs the replay instead) — and the
    final metric is the sum over all committed partials. Must equal
    the one-shot aggregation over everything: the oracle.

    At scale this is how a counting service runs on a stream: the
    shuffle per batch is bounded by |types|, the store grows one
    tiny version per batch (compactable with txlog.optimize), and a
    crashed/replayed batch can never double-count."""
    import shutil
    import tempfile

    from parquet_combiner_spark.streaming.txlog_sink import (
        txlog_append_batch,
    )
    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select("event_id", "event_type")
    stage = tempfile.mkdtemp(prefix="pcs-metrics-src-")
    root = tempfile.mkdtemp(prefix="pcs-metrics-store-")
    table = f"{root}/metrics"
    try:
        ev.repartition(3).write.mode("overwrite").parquet(stage)
        schema = spark.read.parquet(stage).schema
        seen: set = set()

        def commit_partials(batch: DataFrame, epoch_id: int) -> None:
            partial = batch.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n")
            )
            txlog_append_batch(
                partial, epoch_id, table, seen, query_id="metrics"
            )

        ckpt = tempfile.mkdtemp(prefix="pcs-metrics-ckpt-")
        try:
            query = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(stage)
                .writeStream.foreachBatch(commit_partials)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            query.awaitTermination()
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)
        return (
            txlog.read_table(spark, table)
            .groupBy("event_type")
            .agg(F.sum("n").alias("n"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)


def event_counts_cdf_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING READ of a versioned table (sources/txtable_source.py
    ``format("txtable_changes")`` + streaming/cdf.py): events land in
    a txlog table as three append commits (event_id % 3 — a
    deterministic split both engines can reproduce), the commit log
    is then consumed as a stream whose offsets ARE versions and
    whose rows carry ``_commit_version``, and the result aggregates
    the STREAMED rows — count per type plus how many distinct
    commits delivered that type. The commit-provenance column is
    what the oracle pins: n_commits must equal the distinct residues
    per type, which only holds if every row streamed out stamped
    with the version that added it."""
    import shutil
    import tempfile

    from parquet_combiner_spark.sources.txtable_source import (
        TxTableChangesDataSource,
    )
    from parquet_combiner_spark.tools import txlog

    try:
        spark.dataSource.register(TxTableChangesDataSource)
    except Exception:
        pass  # already registered in this session
    ev = _events(spark, sf_dir).select("event_id", "event_type")
    root = tempfile.mkdtemp(prefix="pcs-cdfsrc-")
    table = f"{root}/events_log"
    out = tempfile.mkdtemp(prefix="pcs-cdfout-")
    ckpt = tempfile.mkdtemp(prefix="pcs-cdfckpt-")
    try:
        for m in range(3):
            txlog.commit(ev.where(F.col("event_id") % 3 == m), table)

        def land(batch: DataFrame, _eid: int) -> None:
            batch.write.mode("append").parquet(out)

        query = (
            spark.readStream.format("txtable_changes")
            .option("path", table)
            .load()
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        return (
            spark.read.parquet(out)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("_commit_version").alias("n_commits"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — EXISTS-qualified priority counts: orders from
    H1-1997 having at least one lineitem shipped after the order date
    (late-shipment check adapted to this schema's columns), counted
    per priority. The EXISTS is a LEFT SEMI join whose probe carries
    only (orderkey, shipdate-qualified) — the date filter pushes to
    the orders scan, the semi join never multiplies rows, and the
    final aggregate is priority-cardinality."""
    lo = F.lit("1997-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-07-01").cast("timestamp_ntz")
    orders = (
        _t(spark, sf_dir, "orders")
        .where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"]),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


def important_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — share-of-total HAVING: parts whose revenue
    exceeds 0.075% of TOTAL revenue (≈1.5× the mean share on the
    uniform testdata — non-vacuous at every SF). The scalar total comes from a
    1-row aggregate broadcast into the per-part aggregate's filter —
    one corpus scan feeding both aggregations (the per-part frame is
    re-aggregated for the total, part-cardinality input), never two
    fact scans or a window over everything."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "rev"
        ),
    )
    per_part = li.groupBy("l_partkey").agg(F.sum("rev").alias("part_rev"))
    total = per_part.agg(F.sum("part_rev").alias("total_rev"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("part_rev") > F.lit(0.00075) * F.col("total_rev"))
        .select("l_partkey", F.round("part_rev", 2).alias("part_revenue"))
    )


def small_quantity_order_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q17 shape — per-key correlated threshold: average yearly
    revenue lost if small orders stop — lineitems with quantity below
    20% of THEIR PART's average quantity, for one brand. The
    correlated subquery becomes a per-part aggregate joined back (the
    keyed version of the broadcast-threshold pattern); the brand
    filter prunes through the part dim BEFORE either aggregate."""
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"])
    )
    avg_qty = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_bar")
    )
    return (
        li.join(F.broadcast(avg_qty), "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_bar"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — scalar-subquery filter + NOT EXISTS: per
    nation, the count and balance-sum of customers whose account
    balance beats the GLOBAL positive-balance average AND who have no
    HIGH-VALUE order (every testdata customer has some order, so the
    idleness predicate is the filtered probe — same Q22 shape, the
    anti join's build side just carries a pushed-down filter). Global
    average broadcasts from a 1-row aggregate; the order check is a
    LEFT ANTI join probing the slim filtered custkey projection."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("bal_bar")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > _HIGH_VALUE_ORDER)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rich = cust.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("bal_bar")
    )
    idle = rich.join(orders, "c_custkey", "left_anti")
    return (
        idle.join(
            F.broadcast(nation),
            idle["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — the canonical scan-only aggregate: one year of
    shipments, a discount band, a quantity cap, one SUM. No join, no
    shuffle beyond the final 1-row fold; its whole point at 100 TB is
    that every predicate reaches the parquet scan (min/max row-group
    skipping on l_shipdate does the pruning), which test_plans pins
    as PushedFilters on this very query family."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
        ).alias("revenue")
    )


def customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 shape — customer distribution: how many customers
    placed exactly k high-priority orders, INCLUDING k = 0. The zero
    bucket is the shape's point: it needs a LEFT OUTER join from the
    full customer spine (an inner join silently drops order-less
    customers), then a per-customer count and a histogram over the
    counts. Both aggregations partial-combine; the second one's input
    is |customers| rows of two ints — the histogram is
    vocabulary-sized."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey")
    )
    per_cust = (
        cust.join(orders, "c_custkey", "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — top supplier(s): quarterly revenue per
    supplier, then the supplier(s) achieving the GLOBAL maximum (ties
    all surface — the argmax-with-ties contract NTILE/LIMIT 1 both
    get wrong). The revenue aggregate is computed ONCE and reused for
    both the max (a 1-row broadcast) and the equality probe — the
    materialized-view formulation of Q15's CREATE VIEW."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ),
            4,
        ).alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("total_revenue"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    winners = rev.join(F.broadcast(top), "total_revenue")
    return winners.join(
        F.broadcast(supp), winners["l_suppkey"] == supp["s_suppkey"]
    ).select("s_suppkey", "s_name", "total_revenue")


def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (tools/inspect.py profile_table): per-column
    completeness and cardinality over orders in one aggregation pass
    — the data-contract first look. Exact distincts here (oracle
    surface); ``approx=True`` is the 100 TB path."""
    from parquet_combiner_spark.tools.inspect import profile_table

    return profile_table(_t(spark, sf_dir, "orders"))


def lineitem_priority_salted_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """J3 for JOINS (operators/skew.py salted_join): lineitem ⋈
    orders via replicate-and-salt — the escape hatch when the hot
    join key can't be fixed by broadcast or AQE's skew split — then
    revenue per order priority. The salt is a pure function of
    l_linenumber (row-varying within an order, deterministic across
    task retries); the result must equal the plain equi-join, which
    is exactly what the oracle computes."""
    from parquet_combiner_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        "l_linenumber",
        "l_extendedprice",
        "l_discount",
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    joined = salted_join(
        li, orders, key="okey", salt_source_col="l_linenumber", num_salts=8
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))),
            2,
        ).alias("revenue"),
    )


def event_counts_additive_merge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Additive MERGE (operators/merge.py merge_additive): the metric
    store maintained incrementally — events split into two synthetic
    batches (event_id parity), each pre-aggregated to per-type
    counts, then folded together; the merged store must equal the
    one-shot aggregation over everything, which is the oracle."""
    from parquet_combiner_spark.operators.merge import merge_additive

    ev = _events(spark, sf_dir).select("event_id", "event_type")
    half = lambda p: (  # noqa: E731
        ev.where(F.col("event_id") % 2 == p)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return merge_additive(half(0), half(1), keys=["event_type"], sum_cols=["n"])


def events_zorder_two_predicate_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The read-side payoff of Z-order, measured on BOTH dimensions:
    after ``optimize(zorder_by=[user_id, value])`` the conjunctive
    range scan goes through ``read_table_pruned_multi`` — a file
    survives only if BOTH its per-column zone maps intersect, so the
    skip sets multiply down across dimensions (a lexicographic sort
    prunes only its leading column). Pruning is a pure superset
    optimization; the result must equal the plain two-predicate
    filter — the oracle."""
    import shutil
    import tempfile

    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-zorder2-")
    table = f"{root}/events_z"
    try:
        txlog.commit(ev.repartition(8), table)
        txlog.optimize(
            spark,
            table,
            target_file_mb=0.05,
            zorder_by=["user_id", "value"],
        )
        return (
            txlog.read_table_pruned_multi(
                spark,
                table,
                {"user_id": (100, 400), "value": (20.0, 40.0)},
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def purchases_txtable_pipe_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Versioned-table → versioned-table EXACTLY-ONCE pipeline in ONE
    streaming query, composing BOTH custom Spark-4 Python
    DataSources: ``format("txtable_changes")`` streams a txlog
    table's commits as micro-batches (offsets ARE versions), a
    stateless projection filters purchases, and
    ``format("txtable")``'s native sink publishes each micro-batch as
    one ``(query_id, epoch)``-stamped version of the DESTINATION
    table — the medallion-style bronze→silver hop with exactly-once
    on both ends and no user glue code. The destination's end state
    must equal the plain batch filter over the raw events — the
    oracle."""
    import shutil
    import tempfile

    from parquet_combiner_spark.sources.txtable_source import (
        TxTableChangesDataSource,
        TxTableDataSource,
    )
    from parquet_combiner_spark.tools import txlog

    for ds in (TxTableChangesDataSource, TxTableDataSource):
        try:
            spark.dataSource.register(ds)
        except Exception:
            pass  # already registered in this session
    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="pcs-txpipe-")
    src = f"{root}/bronze"
    dst = f"{root}/silver"
    ckpt = f"{root}/ckpt"
    try:
        # bronze: three append commits (deterministic split)
        for m in range(3):
            txlog.commit(ev.where(F.col("event_id") % 3 == m), src)
        q = (
            spark.readStream.format("txtable_changes")
            .option("path", src)
            .load()
            .where(F.col("event_type") == "purchase")
            .select("event_id", "user_id", F.round("value", 2).alias("v"))
            .writeStream.format("txtable")
            .option("path", dst)
            .option("query_id", "bronze-to-silver")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return txlog.read_table(spark, dst).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def event_counts_native_sink_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Events streamed through the NATIVE ``format("txtable")``
    streaming sink (sources/txtable_source.py ``TxTableStreamWriter``
    — Spark 4's Python DataSource streaming-writer API, the
    first-class twin of the foreachBatch sink): three micro-batches,
    each staged executor-side and published as one exactly-once
    ``(query_id, epoch)``-stamped version, then the per-type counts
    aggregated FROM THE VERSIONED TABLE must equal the plain batch
    aggregation over the raw events — the metric-store oracle. Only
    the one needed column rides the Python sink boundary."""
    import shutil
    import tempfile

    from parquet_combiner_spark.sources.txtable_source import (
        TxTableDataSource,
    )
    from parquet_combiner_spark.tools import txlog

    spark.dataSource.register(TxTableDataSource)
    ev = _events(spark, sf_dir).select("event_type")
    root = tempfile.mkdtemp(prefix="pcs-natsink-")
    src = f"{root}/src"
    table = f"{root}/sink"
    ckpt = f"{root}/ckpt"
    ev.repartition(3).write.parquet(src)
    try:
        q = (
            spark.readStream.schema("event_type string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.format("txtable")
            .option("path", table)
            .option("query_id", "native-sink")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return (
            txlog.read_table(spark, table)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def event_distinct_users_sketch_store(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mergeable-sketch distinct-count metric store: events split into
    three synthetic batches (event_id % 3), each batch reduced to
    per-type HLL sketches (operators/aggregate.py
    ``sketch_distinct_partials`` — Apache DataSketches via Spark's
    ``hll_sketch_agg``) and COMMITTED to a versioned table; the query
    reads the stored partials back and answers distinct users per
    event type by UNIONING them (``sketch_distinct_estimate``) —
    never rescanning the raw events. Distinct-count partials cannot
    be added like counts; the sketch is the mergeable state that
    makes a distinct-users-per-window store possible at 100 TB.
    HLL unions never lose presence information, so the batched
    answer tracks the one-shot sketch (pytest pins <2.5% plus a 5%
    error bound vs exact; rows-only for the driver — estimates
    differ from exact SQL by design)."""
    import shutil
    import tempfile

    from parquet_combiner_spark.operators.aggregate import (
        sketch_distinct_estimate,
        sketch_distinct_partials,
    )
    from parquet_combiner_spark.tools import txlog

    ev = _events(spark, sf_dir).select("event_type", "user_id", "event_id")
    root = tempfile.mkdtemp(prefix="pcs-sketchstore-")
    table = f"{root}/sketches"
    try:
        for m in range(3):
            txlog.commit(
                sketch_distinct_partials(
                    ev.where(F.col("event_id") % 3 == m),
                    ["event_type"],
                    "user_id",
                ),
                table,
            )
        return sketch_distinct_estimate(
            txlog.read_table(spark, table), ["event_type"]
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — CORRELATED MIN-PER-GROUP decorrelation: for
    each small STANDARD part, the EUROPE supplier(s) whose best unit
    price equals the part's minimum across all EUROPE suppliers.
    (This testdata has no partsupp/supplycost; the part-supplier
    offer table is derived as min(l_extendedprice/l_quantity) per
    lineitem pair — same correlated-subquery structure.) The
    correlated `cost = (SELECT min(...) WHERE partkey = outer)`
    decorrelates into a per-part MIN WINDOW over the offers frame —
    one extra part-keyed exchange, NO self-join (the join-back
    formulation sort-merges two part-keyed aggregates; the window
    form reads offers once) — and ties all surface (the Q2 contract
    NTILE/LIMIT would break). Both dims broadcast."""
    part = (
        _t(spark, sf_dir, "part")
        .where((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        _t(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("__unit"),
        )
        .join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"])
        .join(
            F.broadcast(supp.select(F.col("s_suppkey").alias("__sk"))),
            F.col("l_suppkey") == F.col("__sk"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("__unit").alias("cost"))
    )
    from pyspark.sql import Window

    best = offers.withColumn(
        "__min", F.min("cost").over(Window.partitionBy("l_partkey"))
    ).where(F.col("cost") == F.col("__min"))
    return best.join(
        F.broadcast(supp), best["l_suppkey"] == supp["s_suppkey"]
    ).select(
        "s_acctbal",
        "s_name",
        "n_name",
        F.col("l_partkey").alias("p_partkey"),
        F.round("cost", 4).alias("cost"),
    )


def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — profit by supplier nation and order year for
    one product family ('red'-named parts): revenue minus cost, all
    five joins in one pipeline. (No ps_supplycost here: cost is
    0.8 × p_retailprice × quantity — the arithmetic rides the same
    join tree.) Dims (part-filtered, supplier, nation) broadcast;
    orders⋈lineitem is the one fact-fact shuffle, exactly Q9's
    irreducible exchange; aggregation partial-combines into
    (nation × year) cells."""
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("int").alias("o_year")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    amount = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.8) * F.col("p_retailprice") * F.col("l_quantity")
    )
    profit = (
        li.join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"])
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .join(
            F.broadcast(nation),
            supp["s_nationkey"] == nation["n_nationkey"],
        )
        .join(orders, F.col("l_orderkey") == orders["o_orderkey"])
        .select("n_name", "o_year", amount.alias("__amount"))
    )
    return profit.groupBy("n_name", "o_year").agg(
        F.round(F.sum("__amount"), 2).alias("profit")
    )


def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — CASE-sum priority split: lineitems shipped
    in 1996 more than 90 days after their order date (no
    commit/receipt dates in this testdata — lateness vs order date
    carries the predicate), bucketed by l_linestatus (the mode-like
    column available), counting high- vs low-priority orders per
    bucket. The year filter pushes to the lineitem scan; the
    priority classification is a conditional aggregate, never a
    second join."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .select("l_orderkey", "l_linestatus", "l_shipdate")
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = li.join(orders, F.col("l_orderkey") == orders["o_orderkey"]).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return late.groupBy("l_linestatus").agg(
        F.sum(F.when(is_high, 1).otherwise(0))
        .cast("long")
        .alias("high_line_count"),
        F.sum(F.when(is_high, 0).otherwise(1))
        .cast("long")
        .alias("low_line_count"),
    )


def part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — NOT-IN exclusion + grouped distinct count:
    how many distinct suppliers serve each qualifying (brand, type,
    size) cell, excluding 'complaint' suppliers (stand-in: negative
    account balance — this testdata has no comment column). The
    part-supplier relation is lineitem's (partkey, suppkey) pairs
    (no partsupp table). NOT IN decorrelates to a LEFT ANTI join
    against the broadcast complaint list; countDistinct dedups the
    pair multiplicity in the same aggregate."""
    part = (
        _t(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#45")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    complaints = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    ps = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    qualified = ps.join(
        F.broadcast(part), F.col("l_partkey") == part["p_partkey"]
    ).join(
        F.broadcast(complaints),
        F.col("l_suppkey") == complaints["s_suppkey"],
        "left_anti",
    )
    return qualified.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


def potential_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — NESTED SEMI with CORRELATED AGGREGATE: the
    suppliers who shipped more than half of some 'red' part's total
    1996 volume (no partsupp.availqty here: the "more than half of
    (SELECT sum(l_quantity) WHERE same part)" threshold keeps Q20's
    correlated-aggregate-inside-IN structure exactly). Decorrelation:
    per-(part, supplier) sums roll up once; the per-part total is a
    SECOND aggregate over that first one (never a rescan); the
    correlated comparison becomes a part-keyed join between the two;
    the qualifying supplier set semi-joins the supplier dim."""
    red = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(red), F.col("l_partkey") == red["p_partkey"])
    )
    pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("pair_qty")
    )
    tot = pair.groupBy("l_partkey").agg(F.sum("pair_qty").alias("part_qty"))
    dominant = (
        pair.join(tot, "l_partkey")
        .where(F.col("pair_qty") > F.lit(0.5) * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        supp.join(
            F.broadcast(dominant),
            supp["s_suppkey"] == dominant["l_suppkey"],
            "left_semi",
        )
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == nation["n_nationkey"],
        )
        .select("s_suppkey", "s_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Registry + oracles
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "top_parts_per_supplier": top_parts_per_supplier,
    "pricing_summary": pricing_summary,
    "supplier_stats": supplier_stats,
    "orders_with_customer": orders_with_customer,
    "returnflag_counts_salted": returnflag_counts_salted,
    "lineitem_priority_salted_join": lineitem_priority_salted_join,
    "event_counts_additive_merge": event_counts_additive_merge,
    "event_distinct_users_sketch_store": event_distinct_users_sketch_store,
    "event_counts_native_sink_stream": event_counts_native_sink_stream,
    "purchases_txtable_pipe_stream": purchases_txtable_pipe_stream,
    "event_counts_stream_metric_store": event_counts_stream_metric_store,
    "orders_profile": orders_profile,
    "distinct_parts": distinct_parts,
    "distinct_parts_approx": distinct_parts_approx,
    "lineitem_summary_stats": lineitem_summary_stats,
    "earliest_event_per_user": earliest_event_per_user,
    "filtered_orders": filtered_orders,
    "customers_above_avg_order": customers_above_avg_order,
    "order_buckets_union": order_buckets_union,
    "top_orders_global": top_orders_global,
    "events_by_type": events_by_type,
    "purchase_attribution_asof": purchase_attribution_asof,
    "purchase_attribution_asof_tolerant": purchase_attribution_asof_tolerant,
    "purchase_attribution_asof_pandas": purchase_attribution_asof_pandas,
    "purchases_after_error_interval": purchases_after_error_interval,
    "purchases_after_error_interval_stream": purchases_after_error_interval_stream,
    "purchases_with_errors_outer_stream": purchases_with_errors_outer_stream,
    "purchases_errors_full_outer_stream": purchases_errors_full_outer_stream,
    "user_sessions": user_sessions,
    "user_sessions_native": user_sessions_native,
    "user_sessions_stream": user_sessions_stream,
    "user_sessions_stream_native": user_sessions_stream_native,
    "windowed_top_events_stream": windowed_top_events_stream,
    "windowed_top_events_update_stream": windowed_top_events_update_stream,
    "events_dedup_stream": events_dedup_stream,
    "event_association_rules": event_association_rules,
    "forecast_revenue_change": forecast_revenue_change,
    "customer_order_distribution": customer_order_distribution,
    "top_revenue_suppliers": top_revenue_suppliers,
    "monthly_revenue_growth": monthly_revenue_growth,
    "events_scd2_enriched_stream": events_scd2_enriched_stream,
    "price_percentiles": price_percentiles,
    "price_percentiles_approx": price_percentiles_approx,
    "user_rolling_value": user_rolling_value,
    "user_value_rolling_time": user_value_rolling_time,
    "daily_user_accretion": daily_user_accretion,
    "event_transition_counts": event_transition_counts,
    "sliding_event_type_counts": sliding_event_type_counts,
    "pricing_grouping_sets": pricing_grouping_sets,
    "pricing_rollup": pricing_rollup,
    "pricing_cube": pricing_cube,
    "event_counts_cms": event_counts_cms,
    "parts_returned_and_held": parts_returned_and_held,
    "parts_returned_never_held": parts_returned_never_held,
    "event_value_percent_rank": event_value_percent_rank,
    "event_value_outliers": event_value_outliers,
    "user_funnel_depths": user_funnel_depths,
    "user_event_type_sets": user_event_type_sets,
    "user_retention_cohorts": user_retention_cohorts,
    "weekly_order_volume_filled": weekly_order_volume_filled,
    "lineitem_price_quantity_regression": lineitem_price_quantity_regression,
    "lineitem_price_moments": lineitem_price_moments,
    "order_price_histogram": order_price_histogram,
    "user_bucket_top_events": user_bucket_top_events,
    "user_event_matrix": user_event_matrix,
    "lineitem_measures_unpivot": lineitem_measures_unpivot,
    "current_user_state": current_user_state,
    "current_user_state_stream": current_user_state_stream,
    "current_user_state_with_deletes": current_user_state_with_deletes,
    "user_state_merge_into": user_state_merge_into,
    "user_state_merge_bucketed": user_state_merge_bucketed,
    "user_state_join_cobucketed": user_state_join_cobucketed,
    "user_state_agg_bucketed": user_state_agg_bucketed,
    "user_state_join_agg_cobucketed": user_state_join_agg_cobucketed,
    "user_state_merge_cdf_feed": user_state_merge_cdf_feed,
    "user_state_mv_cdf_refresh": user_state_mv_cdf_refresh,
    "event_state_restore": event_state_restore,
    "events_zorder_pruned_scan": events_zorder_pruned_scan,
    "events_dv_delete_scan": events_dv_delete_scan,
    "events_expr_delete_scan": events_expr_delete_scan,
    "events_point_set_delete_scan": events_point_set_delete_scan,
    "events_where_pruned_scan": events_where_pruned_scan,
    "events_dv_update_scan": events_dv_update_scan,
    "events_preimage_update_scan": events_preimage_update_scan,
    "events_spec_evolution_scan": events_spec_evolution_scan,
    "events_string_pruned_scan": events_string_pruned_scan,
    "events_zorder_string_scan": events_zorder_string_scan,
    "events_rebased_dml_scan": events_rebased_dml_scan,
    "events_bucket_transform_scan": events_bucket_transform_scan,
    "events_hidden_partition_scan": events_hidden_partition_scan,
    "events_stats_property_scan": events_stats_property_scan,
    "events_bloom_point_scan": events_bloom_point_scan,
    "events_cdf_feed": events_cdf_feed,
    "events_cdf_stream_feed": events_cdf_stream_feed,
    "events_partitioned_scan": events_partitioned_scan,
    "events_renamed_column_scan": events_renamed_column_scan,
    "events_zorder_two_predicate_scan": events_zorder_two_predicate_scan,
    "event_counts_cdf_stream": event_counts_cdf_stream,
    "current_user_state_with_deletes_stream": (
        current_user_state_with_deletes_stream
    ),
    "user_value_history_scd2": user_value_history_scd2,
    "current_user_state_txlog_stream": current_user_state_txlog_stream,
    "customers_without_high_value_orders": customers_without_high_value_orders,
    "order_price_quartiles": order_price_quartiles,
    "order_price_quartiles_approx": order_price_quartiles_approx,
    "customer_rfm_segments_approx": customer_rfm_segments_approx,
    "event_props_stats": event_props_stats,
    "monthly_order_volume": monthly_order_volume,
    "red_parts_by_brand": red_parts_by_brand,
    "part_name_fuzzy_pairs": part_name_fuzzy_pairs,
    "part_name_canonical_map": part_name_canonical_map,
    "nation_revenue_share": nation_revenue_share,
    "customer_rfm_segments": customer_rfm_segments,
    "shipping_priority": shipping_priority,
    "volume_shipping": volume_shipping,
    "national_market_share": national_market_share,
    "returned_item_revenue": returned_item_revenue,
    "promo_revenue_share": promo_revenue_share,
    "brand_quantity_revenue": brand_quantity_revenue,
    "order_priority_checking": order_priority_checking,
    "important_part_revenue": important_part_revenue,
    "small_quantity_order_revenue": small_quantity_order_revenue,
    "idle_rich_customers": idle_rich_customers,
    "large_volume_customers": large_volume_customers,
    "sole_return_suppliers": sole_return_suppliers,
    "hourly_event_type_counts": hourly_event_type_counts,
    "local_supplier_volume": local_supplier_volume,
    "customers_with_high_value_orders": customers_with_high_value_orders,
    "min_cost_supplier": min_cost_supplier,
    "product_type_profit": product_type_profit,
    "late_shipment_priority": late_shipment_priority,
    "part_supplier_counts": part_supplier_counts,
    "potential_part_promotion": potential_part_promotion,
}

ORACLE_SQL: dict[str, str] = {
    "top_parts_per_supplier": """
        WITH deduped AS (
            SELECT l_suppkey, l_partkey FROM (
                SELECT l_suppkey, l_partkey,
                       row_number() OVER (
                           PARTITION BY l_orderkey, l_linenumber
                           ORDER BY l_partkey, l_suppkey
                       ) AS dn
                FROM lineitem
            ) WHERE dn = 1
        ), counts AS (
            SELECT l_suppkey, l_partkey, count(*) AS part_count
            FROM deduped GROUP BY l_suppkey, l_partkey
        ), ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY l_suppkey
                ORDER BY part_count DESC, l_partkey
            ) AS rn
            FROM counts
        )
        SELECT r.l_suppkey,
               coalesce(s.s_name, 'Unknown') AS supplier_name,
               r.l_partkey, r.part_count,
               CAST(r.rn AS VARCHAR) AS part_rank
        FROM ranked r LEFT JOIN supplier s ON r.l_suppkey = s.s_suppkey
        WHERE r.rn <= 5
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "supplier_stats": """
        WITH pm AS (
            SELECT l_suppkey, l_partkey, count(*) AS cnt
            FROM lineitem GROUP BY l_suppkey, l_partkey
        ), pick AS (
            SELECT l_suppkey, l_partkey AS top_part,
                   row_number() OVER (
                       PARTITION BY l_suppkey ORDER BY cnt DESC, l_partkey
                   ) AS rn
            FROM pm
        )
        SELECT t.l_suppkey, t.total_items, t.unique_parts, p.top_part
        FROM (
            SELECT l_suppkey, count(*) AS total_items,
                   count(DISTINCT l_partkey) AS unique_parts
            FROM lineitem GROUP BY l_suppkey
        ) t JOIN pick p ON t.l_suppkey = p.l_suppkey AND p.rn = 1
    """,
    "orders_with_customer": """
        SELECT coalesce(c.c_name, 'Unknown') AS customer_name,
               count(*) AS order_count,
               round(sum(o.o_totalprice), 2) AS total_spend
        FROM orders o
        LEFT JOIN (
            SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0
        ) c ON o.o_custkey = c.c_custkey
        GROUP BY 1
    """,
    "returnflag_counts_salted": """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    # the salted join must equal the plain equi-join — the oracle IS
    # the unsalted formulation
    "lineitem_priority_salted_join": """
        SELECT o_orderpriority, count(*) AS n_items,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """,
    # the additive merge of per-batch partial counts must equal the
    # one-shot aggregation
    "event_counts_additive_merge": """
        SELECT event_type, count(*) AS n FROM events GROUP BY 1
    """,
    # the streaming metric store (per-batch partials, exactly-once
    # epoch-keyed commits, final fold) converges to the same answer
    "event_counts_stream_metric_store": """
        SELECT event_type, count(*) AS n FROM events GROUP BY 1
    """,
    # the native Python-DataSource streaming sink converges to the
    # same per-type counts (exactly-once on (query_id, epoch))
    "event_counts_native_sink_stream": """
        SELECT event_type, count(*) AS n FROM events GROUP BY 1
    """,
    # bronze -> silver through both Python DataSources converges to
    # the plain batch filter (exactly-once on both ends)
    "purchases_txtable_pipe_stream": """
        SELECT event_id, user_id, round(value, 2) AS v
        FROM events WHERE event_type = 'purchase'
    """,
    "distinct_parts": """
        SELECT count(DISTINCT l_partkey) AS n_distinct FROM lineitem
    """,
    "lineitem_summary_stats": """
        SELECT 'l_quantity' AS "column",
               CAST(count(l_quantity) AS DOUBLE) AS count,
               round(avg(l_quantity), 4) AS mean,
               round(stddev_samp(l_quantity), 4) AS stddev,
               CAST(min(l_quantity) AS DOUBLE) AS min,
               CAST(max(l_quantity) AS DOUBLE) AS max
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice',
               CAST(count(l_extendedprice) AS DOUBLE),
               round(avg(l_extendedprice), 4),
               round(stddev_samp(l_extendedprice), 4),
               CAST(min(l_extendedprice) AS DOUBLE),
               CAST(max(l_extendedprice) AS DOUBLE)
        FROM lineitem
        UNION ALL
        SELECT 'l_discount',
               CAST(count(l_discount) AS DOUBLE),
               round(avg(l_discount), 4),
               round(stddev_samp(l_discount), 4),
               CAST(min(l_discount) AS DOUBLE),
               CAST(max(l_discount) AS DOUBLE)
        FROM lineitem
    """,
    "earliest_event_per_user": """
        SELECT user_id, event_id, event_type FROM (
            SELECT user_id, event_id, event_type,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "filtered_orders": """
        SELECT o_orderkey, o_orderstatus, o_totalprice AS total_price
        FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice > 100000
    """,
    "customers_above_avg_order": """
        SELECT c_custkey, c_name,
               round((SELECT max(o_totalprice) FROM orders o
                      WHERE o.o_custkey = c.c_custkey), 2) AS max_order
        FROM customer c
        WHERE (SELECT max(o_totalprice) FROM orders o
               WHERE o.o_custkey = c.c_custkey)
              > 1.8 * (SELECT avg(o_totalprice) FROM orders)
    """,
    "order_buckets_union": """
        SELECT bucket, o_orderstatus, count(*) AS n FROM (
            SELECT o_orderstatus, 'high' AS bucket
            FROM orders WHERE o_totalprice > 200000
            UNION ALL
            SELECT o_orderstatus, 'low' AS bucket
            FROM orders WHERE o_totalprice < 50000
        ) GROUP BY bucket, o_orderstatus
    """,
    "top_orders_global": """
        SELECT o_orderkey, o_totalprice AS total_price, o_orderstatus
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10
    """,
    "events_by_type": """
        SELECT event_type, count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events GROUP BY event_type
    """,
    "user_sessions": """
        WITH g AS (
            SELECT user_id, event_id, epoch_ns(ts) AS tns,
                   lag(epoch_ns(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_tns
            FROM events
        ), s AS (
            SELECT user_id, tns,
                   sum(CASE WHEN prev_tns IS NULL
                            OR tns - prev_tns > 1800000000000
                       THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY tns, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS session_id
            FROM g
        )
        -- DuckDB types window sum() over integers as HUGEINT, which
        -- exports to Arrow as decimal128(38,0); Spark emits int64 for
        -- the same running sum.  Values are identical — the explicit
        -- BIGINT cast keeps the driver's value-hash type-stable.
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               count(*) AS n_events,
               (max(tns) - min(tns)) // 1000000 AS duration_ms
        FROM s GROUP BY user_id, session_id
    """,
    # the range join's oracle is the PLAIN range predicate — exactly
    # the formulation the distributed operator must never execute but
    # a single-node engine evaluates fine at oracle scale
    "purchases_after_error_interval": """
        WITH ev AS (
            SELECT event_id, user_id, event_type,
                   epoch_ns(ts) // 1000000 AS tms
            FROM events
        )
        SELECT f.event_id, f.user_id, f.tms,
               d.event_id AS error_event_id,
               d.tms AS win_start
        FROM ev f JOIN ev d
          ON f.user_id = d.user_id
         AND f.event_type = 'purchase' AND d.event_type = 'error'
         AND f.tms BETWEEN d.tms AND d.tms + 3600000
    """,

    # outer stream-stream join: matched rows emit unconditionally
    # (inner emission is immediate); NULL rows only for purchases the
    # final watermark finalized (watermark passing p_time proves no
    # on-time error can still match — boundary <= max - delay,
    # verified empirically at two SFs)
    "purchases_with_errors_outer_stream": """
        WITH ev AS (
            SELECT event_id, user_id, event_type,
                   epoch_ns(ts) // 1000000 AS tms
            FROM events
        ), j AS (
            SELECT f.event_id, f.user_id, f.tms,
                   d.event_id AS error_event_id,
                   d.tms AS win_start
            FROM (SELECT * FROM ev WHERE event_type = 'purchase') f
            LEFT JOIN (SELECT * FROM ev WHERE event_type = 'error') d
              ON f.user_id = d.user_id
             AND f.tms BETWEEN d.tms AND d.tms + 3600000
        )
        SELECT * FROM j WHERE error_event_id IS NOT NULL
        UNION ALL
        SELECT * FROM j
        WHERE error_event_id IS NULL
          AND tms <= (
              SELECT min(m) - 600000 - 3600000 FROM (
                  SELECT event_type, max(tms) AS m FROM ev
                  WHERE event_type IN ('purchase', 'error')
                  GROUP BY event_type
              )
          )
    """,

    # FULL OUTER stream-stream join: matched rows emit
    # unconditionally; each NULL class restricted to its own
    # finalized region — matchless purchases need the watermark past
    # p_time (cut: wm − window, conservative), matchless errors need
    # it past e_time + window (cut: wm − 2·window). Boundary verified
    # empirically at two SFs, same method as the left-outer key.
    "purchases_errors_full_outer_stream": """
        WITH ev AS (
            SELECT event_id, user_id, event_type,
                   epoch_ns(ts) // 1000000 AS tms
            FROM events
        ), j AS (
            SELECT f.event_id,
                   COALESCE(f.user_id, d.user_id) AS user_id,
                   f.tms,
                   d.event_id AS error_event_id,
                   d.tms AS win_start
            FROM (SELECT * FROM ev WHERE event_type = 'purchase') f
            FULL JOIN (SELECT * FROM ev WHERE event_type = 'error') d
              ON f.user_id = d.user_id
             AND f.tms BETWEEN d.tms AND d.tms + 3600000
        ), wm AS (
            SELECT min(m) - 600000 AS w FROM (
                SELECT event_type, max(tms) AS m FROM ev
                WHERE event_type IN ('purchase', 'error')
                GROUP BY event_type
            )
        )
        SELECT j.* FROM j, wm
        WHERE (event_id IS NOT NULL AND error_event_id IS NOT NULL)
           OR (error_event_id IS NULL AND tms <= w - 3600000)
           OR (event_id IS NULL AND win_start <= w - 7200000)
    """,

    # DuckDB has a NATIVE ASOF JOIN (inclusive: fact.t >= dim.t) — an
    # independent implementation of the same temporal-join semantics
    # the union+window operator computes, which is exactly what an
    # oracle should be. Dim deduped per (user, time) identically.
    # the tolerant variant: the SAME native ASOF join, with the picked
    # row's staleness masked to NULLs past the bound (d.tms survives
    # the join, so the mask is a projection)
    "purchase_attribution_asof_tolerant": f"""
        WITH ev AS (
            SELECT event_id, user_id, event_type,
                   epoch_ns(ts) // 1000000 AS tms, value
            FROM events
        ), f AS (
            SELECT event_id, user_id, tms FROM ev
            WHERE event_type = 'purchase'
        ), d AS (
            SELECT user_id, tms,
                   max(event_id) AS view_event_id,
                   max_by(value, event_id) AS view_value
            FROM ev WHERE event_type = 'view'
            GROUP BY user_id, tms
        )
        SELECT f.event_id, f.user_id, f.tms,
               CASE WHEN f.tms - d.tms <= {_ASOF_TOLERANCE_MS}
                    THEN d.view_event_id END AS view_event_id,
               CASE WHEN f.tms - d.tms <= {_ASOF_TOLERANCE_MS}
                    THEN d.view_value END AS view_value
        FROM f ASOF LEFT JOIN d
          ON f.user_id = d.user_id AND f.tms >= d.tms
    """,
    "purchase_attribution_asof": """
        WITH ev AS (
            SELECT event_id, user_id, event_type,
                   epoch_ns(ts) // 1000000 AS tms, value
            FROM events
        ), f AS (
            SELECT event_id, user_id, tms FROM ev
            WHERE event_type = 'purchase'
        ), d AS (
            SELECT user_id, tms,
                   max(event_id) AS view_event_id,
                   max_by(value, event_id) AS view_value
            FROM ev WHERE event_type = 'view'
            GROUP BY user_id, tms
        )
        SELECT f.event_id, f.user_id, f.tms,
               d.view_event_id, d.view_value
        FROM f ASOF LEFT JOIN d
          ON f.user_id = d.user_id AND f.tms >= d.tms
    """,
    # session_window semantics on ms-floored event time: sessions
    # merge INCLUSIVELY at the gap (windows [t, t+gap] touching ⇒
    # merge — verified empirically, pinned by
    # test_native_session_window_exact_gap_boundary), so the split
    # predicate is the same strict > as the custom operator. Full
    # session set — batch mode has no watermark restriction.
    "user_sessions_native": """
        WITH g AS (
            SELECT user_id, epoch_ns(ts) // 1000000 AS tms, event_id
            FROM events
        ), l AS (
            SELECT user_id, tms,
                   lag(tms) OVER (
                       PARTITION BY user_id ORDER BY tms, event_id
                   ) AS prev
            FROM g
        ), s AS (
            SELECT user_id, tms,
                   sum(CASE WHEN prev IS NULL OR tms - prev > 1800000
                       THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY tms
                       ROWS UNBOUNDED PRECEDING
                   ) AS sid
            FROM l
        )
        SELECT user_id, min(tms) AS session_start,
               max(tms) AS session_end, count(*) AS n_events
        FROM s GROUP BY user_id, sid
    """,
    # closed-session restriction of the batch sessionization, in epoch
    # millis: the streaming run closes every session except each
    # user's last in-stream; the last closes iff the final watermark
    # (global max_ms - 10 min delay) strictly passed end + 30 min gap.
    # Gap decisions use ms-floored timestamps because that is the
    # stream's state granularity (micros event time floored to ms).
    "user_sessions_stream": """
        WITH g AS (
            SELECT user_id, epoch_ns(ts) // 1000000 AS tms, event_id
            FROM events
        ), l AS (
            SELECT user_id, tms,
                   lag(tms) OVER (
                       PARTITION BY user_id ORDER BY tms, event_id
                   ) AS prev
            FROM g
        ), s AS (
            SELECT user_id, tms,
                   sum(CASE WHEN prev IS NULL OR tms - prev > 1800000
                       THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY tms
                       ROWS UNBOUNDED PRECEDING
                   ) AS sid
            FROM l
        ), agg AS (
            SELECT user_id, min(tms) AS session_start,
                   max(tms) AS session_end, count(*) AS n_events
            FROM s GROUP BY user_id, sid
        )
        SELECT user_id, session_start, session_end, n_events FROM agg
        WHERE session_end + 1800000 <
              (SELECT max(epoch_ns(ts) // 1000000) FROM events) - 600000
    """,
    # the native session_window streaming run: same inclusive-merge /
    # strict-> split as user_sessions_native, restricted to sessions
    # whose window end (last + gap) the final watermark passed
    # INCLUSIVELY (append-mode state eviction fires at end <=
    # watermark — verified empirically, unlike the custom operator's
    # strictly-below timeout firing; both pinned by pytest).
    "user_sessions_stream_native": """
        WITH g AS (
            SELECT user_id, epoch_ns(ts) // 1000000 AS tms, event_id
            FROM events
        ), l AS (
            SELECT user_id, tms,
                   lag(tms) OVER (
                       PARTITION BY user_id ORDER BY tms, event_id
                   ) AS prev
            FROM g
        ), s AS (
            SELECT user_id, tms,
                   sum(CASE WHEN prev IS NULL OR tms - prev > 1800000
                       THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY tms
                       ROWS UNBOUNDED PRECEDING
                   ) AS sid
            FROM l
        ), agg AS (
            SELECT user_id, min(tms) AS session_start,
                   max(tms) AS session_end, count(*) AS n_events
            FROM s GROUP BY user_id, sid
        )
        SELECT user_id, session_start, session_end, n_events FROM agg
        WHERE session_end + 1800000 <=
              (SELECT max(epoch_ns(ts) // 1000000) FROM events) - 600000
    """,
    # batch formulation of the streaming windowed top-N: 1h tumbling
    # windows on ms-floored event time; append mode emits a window iff
    # the final watermark (max event-time ms - 10 min delay) passed
    # its end. rank CAST to INT matches Spark's row_number output.
    "windowed_top_events_stream": """
        WITH g AS (
            SELECT epoch_ns(ts) // 1000000 AS tms, event_type FROM events
        ), c AS (
            SELECT (tms // 3600000) * 3600000 AS window_start_ms,
                   event_type, count(*) AS n
            FROM g GROUP BY 1, 2
        ), r AS (
            SELECT window_start_ms, event_type, n,
                   CAST(row_number() OVER (
                       PARTITION BY window_start_ms
                       ORDER BY n DESC, event_type
                   ) AS INT) AS item_rank
            FROM c
        )
        SELECT window_start_ms, event_type, n, item_rank FROM r
        WHERE item_rank <= 3
          AND window_start_ms + 3600000 <=
              (SELECT max(tms) - 600000 FROM g)
    """,
    # update mode converges to EVERY window's full count (no
    # finalization gate), so the oracle is the append-mode SQL minus
    # the watermark cut
    "windowed_top_events_update_stream": """
        WITH g AS (
            SELECT epoch_ns(ts) // 1000000 AS tms, event_type FROM events
        ), c AS (
            SELECT (tms // 3600000) * 3600000 AS window_start_ms,
                   event_type, count(*) AS n
            FROM g GROUP BY 1, 2
        ), r AS (
            SELECT window_start_ms, event_type, n,
                   CAST(row_number() OVER (
                       PARTITION BY window_start_ms
                       ORDER BY n DESC, event_type
                   ) AS INT) AS item_rank
            FROM c
        )
        SELECT window_start_ms, event_type, n, item_rank FROM r
        WHERE item_rank <= 3
    """,
    "forecast_revenue_change": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    "customer_order_distribution": """
        WITH per_cust AS (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT OUTER JOIN (
                SELECT o_custkey, o_orderkey FROM orders
                WHERE o_orderpriority = '1-URGENT'
            ) o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey
        )
        SELECT c_count, count(*) AS custdist
        FROM per_cust GROUP BY c_count
    """,
    "top_revenue_suppliers": """
        WITH rev AS (
            SELECT l_suppkey,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 4)
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    "event_association_rules": """
        WITH b AS (
            SELECT DISTINCT user_id, event_type FROM events
            WHERE event_type IS NOT NULL
        ), item AS (
            SELECT event_type, count(*) AS n_item FROM b GROUP BY 1
        ), nu AS (
            SELECT count(DISTINCT user_id) AS n_users FROM b
        ), p AS (
            SELECT a.event_type AS t1, c.event_type AS t2,
                   count(*) AS n_pair
            FROM b a JOIN b c USING (user_id)
            WHERE a.event_type < c.event_type
            GROUP BY 1, 2
        ), d AS (
            SELECT t1 AS antecedent, t2 AS consequent, n_pair FROM p
            UNION ALL
            SELECT t2, t1, n_pair FROM p
        )
        SELECT antecedent, consequent, n_pair,
               round(n_pair / sa.n_item, 4) AS confidence,
               round(n_pair * (SELECT n_users FROM nu)
                     / (sa.n_item * sc.n_item), 4) AS lift
        FROM d
        JOIN item sa ON sa.event_type = d.antecedent
        JOIN item sc ON sc.event_type = d.consequent
    """,
    # 2x-delivered replay deduped back to the distinct set: the
    # oracle is the PLAIN projection (no dedup in the SQL) — the
    # check is that redelivery emits each row exactly once
    "events_dedup_stream": """
        SELECT event_id, epoch_ns(ts) // 1000000 AS ts_ms,
               user_id, event_type, value
        FROM events
    """,
    "price_percentiles": """
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
        FROM lineitem GROUP BY l_returnflag
    """,
    "user_rolling_value": """
        SELECT user_id, event_id,
               round(avg(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
               ), 4) AS rolling_avg_4
        FROM events
    """,
    "user_value_rolling_time": """
        SELECT user_id, event_id,
               round(avg(value) OVER (
                   PARTITION BY user_id ORDER BY tms
                   RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW
               ), 4) AS rolling_avg_1h
        FROM (
            SELECT user_id, event_id, epoch_ns(ts) // 1000000 AS tms,
                   value
            FROM events
        )
    """,
    "daily_user_accretion": """
        WITH fd AS (
            SELECT user_id, min(epoch_ns(ts) // 86400000000000) AS day
            FROM events GROUP BY user_id
        ), pd AS (
            SELECT day, count(*) AS n_new_users FROM fd GROUP BY day
        )
        SELECT day, n_new_users,
               CAST(sum(n_new_users) OVER (
                   ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_users
        FROM pd
    """,
    "event_transition_counts": """
        SELECT prev_type, event_type, count(*) AS n
        FROM (
            SELECT lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type,
                   event_type
            FROM events
        )
        WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    """,
    "sliding_event_type_counts": """
        WITH g AS (
            SELECT epoch_ns(ts) // 1000000 AS tms, event_type FROM events
        ), r AS (
            SELECT ((tms // 900000) - k) * 900000 AS window_start_ms,
                   event_type, tms
            FROM g, unnest([0, 1, 2, 3]) AS u(k)
        )
        SELECT window_start_ms, event_type, count(*) AS n
        FROM r
        WHERE tms >= window_start_ms
          AND tms < window_start_ms + 3600000
        GROUP BY 1, 2
    """,
    "pricing_grouping_sets": """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
               CAST(grouping(l_linestatus) AS INTEGER) AS g_status
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    "pricing_rollup": """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
               CAST(grouping(l_linestatus) AS INTEGER) AS g_status
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "pricing_cube": """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
               CAST(grouping(l_linestatus) AS INTEGER) AS g_status
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "parts_returned_and_held": """
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        INTERSECT
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    """,
    "parts_returned_never_held": """
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        EXCEPT
        SELECT l_partkey FROM lineitem
        WHERE l_returnflag = 'A' AND l_suppkey < 10
    """,
    # Spark's population g1/g2 reproduced from explicit central
    # moments (DuckDB's skewness/kurtosis builtins are sample-bias-
    # corrected — a DIFFERENT statistic under the same name)
    "lineitem_price_moments": """
        WITH mu AS (
            SELECT l_returnflag AS f, avg(l_extendedprice) AS m
            FROM lineitem GROUP BY 1
        )
        SELECT l.l_returnflag,
               count(*) AS n,
               round(avg(pow(l_extendedprice - mu.m, 3))
                     / pow(avg(pow(l_extendedprice - mu.m, 2)), 1.5), 6)
                   AS price_skew,
               round(avg(pow(l_extendedprice - mu.m, 4))
                     / pow(avg(pow(l_extendedprice - mu.m, 2)), 2) - 3, 6)
                   AS price_kurtosis
        FROM lineitem l JOIN mu ON l.l_returnflag = mu.f
        GROUP BY 1
    """,
    "lineitem_price_quantity_regression": """
        SELECT l_returnflag,
               count(*) AS n,
               round(CASE WHEN stddev_samp(l_quantity) > 0
                           AND stddev_samp(l_extendedprice) > 0
                          THEN covar_samp(l_extendedprice, l_quantity)
                               / (stddev_samp(l_quantity)
                                  * stddev_samp(l_extendedprice))
                     END, 6) AS price_qty_corr,
               round(covar_samp(l_extendedprice, l_quantity), 2)
                   AS price_qty_covar,
               round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 2)
                   AS intercept
        FROM lineitem GROUP BY l_returnflag
    """,
    "weekly_order_volume_filled": f"""
        WITH c AS (
            SELECT epoch_us(o_orderdate) // {_WEEK_US} AS week,
                   count(*) AS n
            FROM orders GROUP BY 1
        ), spine AS (
            SELECT unnest(generate_series(min(week), max(week))) AS week
            FROM c
        )
        SELECT s.week, CAST(coalesce(c.n, 0) AS BIGINT) AS n
        FROM spine s LEFT JOIN c USING (week)
    """,
    "user_retention_cohorts": f"""
        WITH ev AS (
            SELECT DISTINCT user_id,
                   epoch_ns(ts) // {_WEEK_NS} AS week
            FROM events
        ), cohort AS (
            SELECT user_id, min(week) AS cohort_week
            FROM ev GROUP BY user_id
        )
        SELECT c.cohort_week,
               e.week - c.cohort_week AS weeks_since,
               count(*) AS n_users
        FROM ev e JOIN cohort c USING (user_id)
        GROUP BY 1, 2
    """,
    "user_event_type_sets": """
        SELECT user_id,
               string_agg(DISTINCT event_type, ','
                          ORDER BY event_type) AS types,
               count(*) AS n_events
        FROM events WHERE event_type IS NOT NULL
        GROUP BY user_id
    """,
    "user_funnel_depths": f"""
        WITH staged AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view'
                            THEN epoch_ns(ts) END)
                       OVER (PARTITION BY user_id) AS s1,
                   epoch_ns(ts) AS tns, event_type
            FROM events
        ), staged2 AS (
            SELECT user_id, s1,
                   min(CASE WHEN event_type = 'click' AND tns >= s1
                             AND tns <= s1 + {_FUNNEL_DEADLINE_NS}
                            THEN tns END)
                       OVER (PARTITION BY user_id) AS s2,
                   tns, event_type
            FROM staged
        ), staged3 AS (
            SELECT user_id, s1, s2,
                   min(CASE WHEN event_type = 'purchase' AND tns >= s2
                             AND tns <= s2 + {_FUNNEL_DEADLINE_NS}
                            THEN tns END)
                       OVER (PARTITION BY user_id) AS s3
            FROM staged2
        ), per_user AS (
            SELECT user_id, min(s1) AS s1, min(s2) AS s2, min(s3) AS s3
            FROM staged3 GROUP BY user_id
        )
        SELECT CASE WHEN s3 IS NOT NULL THEN 3
                    WHEN s2 IS NOT NULL THEN 2
                    WHEN s1 IS NOT NULL THEN 1
                    ELSE 0 END AS depth,
               count(*) AS n_users,
               round(avg((s3 - s1) / 1000000.0), 4) AS avg_convert_ms
        FROM per_user GROUP BY 1
    """,
    "event_value_outliers": """
        WITH s AS (
            SELECT event_type, avg(value) AS mu,
                   stddev_pop(value) AS sigma
            FROM events GROUP BY event_type
        )
        SELECT e.event_id, e.event_type,
               round(e.value, 6) AS value,
               round(CASE WHEN s.sigma > 0
                          THEN (e.value - s.mu) / s.sigma END, 4) AS z
        FROM events e JOIN s USING (event_type)
        WHERE abs(CASE WHEN s.sigma > 0
                       THEN (e.value - s.mu) / s.sigma END) > 3.0
    """,
    # the SAME explicit bin formula the Spark side computes (see
    # order_price_histogram's docstring for why neither engine's
    # width_bucket built-in is used) — identical FP operation order,
    # so the doubles agree bit-for-bit
    "order_price_histogram": """
        WITH b AS (
            SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
            FROM orders
        ), binned AS (
            SELECT CASE
                       WHEN o_totalprice < lo THEN 0
                       WHEN o_totalprice >= hi THEN 21
                       ELSE CAST(floor((o_totalprice - lo)
                                       / ((hi - lo) / 20)) AS BIGINT) + 1
                   END AS bin,
                   lo, hi
            FROM orders, b
        )
        SELECT bin, count(*) AS n,
               round(min(lo) + (bin - 1) * (min(hi) - min(lo)) / 20, 4)
                   AS bin_lo
        FROM binned GROUP BY bin
    """,
    "event_value_percent_rank": """
        SELECT event_id, event_type,
               round(percent_rank() OVER (
                   PARTITION BY event_type ORDER BY value, event_id
               ), 6) AS pct_rank,
               round(cume_dist() OVER (
                   PARTITION BY event_type ORDER BY value, event_id
               ), 6) AS cume
        FROM events
    """,
    "user_bucket_top_events": """
        SELECT user_bucket, event_type, n, CAST(rn AS INTEGER) AS rank FROM (
            SELECT user_id % 100 AS user_bucket, event_type,
                   count(*) AS n,
                   row_number() OVER (
                       PARTITION BY user_id % 100
                       ORDER BY count(*) DESC, event_type
                   ) AS rn
            FROM events GROUP BY user_id % 100, event_type
        ) WHERE rn <= 3
    """,
    "hourly_event_type_counts": """
        SELECT (epoch_ns(ts) // 1000000) // 3600000 * 3600000
                   AS window_start_ms,
               event_type, count(*) AS n
        FROM events GROUP BY 1, 2
    """,
    "sole_return_suppliers": """
        WITH li AS (
            SELECT l_orderkey, l_suppkey, l_returnflag FROM lineitem
        ), r AS (
            SELECT l_orderkey, l_suppkey FROM li WHERE l_returnflag = 'R'
        )
        SELECT s.s_name, count(*) AS numwait
        FROM r
        JOIN supplier s ON s.s_suppkey = r.l_suppkey
        WHERE EXISTS (
            SELECT 1 FROM li o
            WHERE o.l_orderkey = r.l_orderkey
              AND o.l_suppkey <> r.l_suppkey
        )
        AND NOT EXISTS (
            SELECT 1 FROM r r2
            WHERE r2.l_orderkey = r.l_orderkey
              AND r2.l_suppkey <> r.l_suppkey
        )
        GROUP BY s.s_name
    """,
    "large_volume_customers": """
        WITH qty AS (
            SELECT l_orderkey, sum(l_quantity) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(l_quantity) > 250.0
        )
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               epoch_ms(o.o_orderdate) AS odate_ms,
               round(o.o_totalprice, 2) AS o_totalprice,
               q.total_qty
        FROM orders o
        JOIN qty q ON o.o_orderkey = q.l_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
    "shipping_priority": """
        SELECT o_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               epoch_ms(o_orderdate) AS odate_ms
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "volume_shipping": """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3
    """,
    "national_market_share": """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               round(sum(CASE WHEN sn.n_name = 'NATION_3'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 6)
                   AS mkt_share
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'ASIA'
        GROUP BY 1
    """,
    "returned_item_revenue": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "promo_revenue_share": """
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 6)
                   AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
    """,
    "brand_quantity_revenue": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 30
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "order_priority_checking": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY 1
    """,
    "important_part_revenue": """
        SELECT l_partkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS part_revenue
        FROM lineitem
        GROUP BY l_partkey
        HAVING sum(l_extendedprice * (1 - l_discount)) > 0.00075 * (
            SELECT sum(l_extendedprice * (1 - l_discount)) FROM lineitem
        )
    """,
    "small_quantity_order_revenue": """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (
              SELECT 0.2 * avg(l2.l_quantity)
              FROM lineitem l2 JOIN part p2 ON l2.l_partkey = p2.p_partkey
              WHERE p2.p_brand = 'Brand#23'
                AND l2.l_partkey = lineitem.l_partkey
          )
    """,
    "idle_rich_customers": """
        SELECT n_name, count(*) AS n_custs,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (
                  SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0
              )
          AND NOT EXISTS (
                  SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000
              )
        GROUP BY n_name
    """,
    "local_supplier_volume": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "event_props_stats": """
        SELECT event_type,
               count(CAST(props->>'$.k' AS INTEGER)) AS n_with_k,
               round(avg(CAST(props->>'$.k' AS INTEGER)), 4) AS avg_k,
               max(CAST(props->>'$.k' AS INTEGER)) AS max_k
        FROM events GROUP BY event_type
    """,
    "monthly_order_volume": """
        SELECT epoch_ms(date_trunc('month', o_orderdate))
                   AS month_start_ms,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1
    """,
    # the stateless stream-static join is batching-invariant, so the
    # oracle is the batch point-in-time join verbatim
    "events_scd2_enriched_stream": """
        WITH dim AS (
            SELECT user_id AS d_user, value AS purchase_value,
                   epoch_ns(ts) AS valid_from,
                   lead(epoch_ns(ts)) OVER (
                       PARTITION BY user_id ORDER BY epoch_ns(ts)
                   ) AS valid_to
            FROM events WHERE event_type = 'purchase'
        )
        SELECT e.event_id, epoch_ns(e.ts) // 1000000 AS ts_ms,
               e.user_id, round(d.purchase_value, 4) AS purchase_value
        FROM events e JOIN dim d
          ON e.user_id = d.d_user
         AND epoch_ns(e.ts) >= d.valid_from
         AND (d.valid_to IS NULL OR epoch_ns(e.ts) < d.valid_to)
        WHERE e.event_type = 'click'
    """,
    "monthly_revenue_growth": """
        WITH m AS (
            SELECT date_trunc('month', o_orderdate) AS m,
                   sum(o_totalprice) AS rev
            FROM orders GROUP BY 1
        )
        SELECT epoch_ms(m) AS month_start_ms,
               round(rev, 2) AS revenue,
               round(100.0 * (rev - lag(rev) OVER (ORDER BY m))
                     / lag(rev) OVER (ORDER BY m), 4) AS mom_growth_pct
        FROM m
    """,
    "red_parts_by_brand": """
        SELECT p_brand, count(*) AS n_parts,
               round(avg(p_retailprice), 4) AS avg_price
        FROM part WHERE p_name LIKE 'red %'
        GROUP BY p_brand
    """,
    "part_name_fuzzy_pairs": """
        WITH v AS (
            SELECT p_name AS val, count(*) AS n
            FROM part WHERE p_name IS NOT NULL
            GROUP BY p_name
        )
        SELECT a.val AS val_a, b.val AS val_b,
               CAST(levenshtein(a.val, b.val) AS INTEGER) AS dist,
               a.n AS n_a, b.n AS n_b
        FROM v a JOIN v b ON a.val < b.val
        WHERE levenshtein(a.val, b.val) <= 2
    """,
    "customer_rfm_segments": f"""
        WITH maxd AS (
            SELECT max(o_orderdate) AS m FROM orders
        ), rfm AS (
            SELECT o_custkey,
                   min(date_diff('day', CAST(o_orderdate AS DATE),
                                 CAST(maxd.m AS DATE))) AS recency_days,
                   count(*) AS frequency,
                   round(sum(o_totalprice), 2) AS monetary
            FROM orders, maxd GROUP BY o_custkey
        ), thr AS (
            SELECT
                round(quantile_cont(recency_days, {repr(1/3)}), 6) AS r1,
                round(quantile_cont(recency_days, {repr(2/3)}), 6) AS r2,
                round(quantile_cont(frequency, {repr(1/3)}), 6) AS f1,
                round(quantile_cont(frequency, {repr(2/3)}), 6) AS f2,
                round(quantile_cont(monetary, {repr(1/3)}), 6) AS m1,
                round(quantile_cont(monetary, {repr(2/3)}), 6) AS m2
            FROM rfm
        )
        SELECT o_custkey, recency_days, frequency, monetary,
               CAST(4 - (CASE WHEN recency_days >= r2 THEN 3
                              WHEN recency_days >= r1 THEN 2
                              ELSE 1 END) AS VARCHAR)
               || CAST(CASE WHEN frequency >= f2 THEN 3
                            WHEN frequency >= f1 THEN 2
                            ELSE 1 END AS VARCHAR)
               || CAST(CASE WHEN monetary >= m2 THEN 3
                            WHEN monetary >= m1 THEN 2
                            ELSE 1 END AS VARCHAR) AS rfm_segment
        FROM rfm, thr
    """,
    "nation_revenue_share": """
        WITH rev AS (
            SELECT c.c_nationkey, sum(o.o_totalprice) AS rev
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_nationkey
        )
        SELECT r.r_name, n.n_name,
               round(rev.rev, 2) AS revenue,
               round(rev.rev / sum(rev.rev) OVER (PARTITION BY r.r_name),
                     6) AS region_share
        FROM rev
        JOIN nation n ON rev.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    "part_name_canonical_map": """
        WITH RECURSIVE v AS (
            SELECT p_name AS value, count(*) AS n
            FROM part WHERE p_name IS NOT NULL GROUP BY p_name
        ), fpairs AS (
            SELECT a.value AS s, b.value AS d
            FROM v a JOIN v b
              ON a.value < b.value
             AND levenshtein(a.value, b.value) <= 2
        ), edges AS (
            SELECT s, d FROM fpairs UNION SELECT d, s FROM fpairs
        ), reach(src, dst) AS (
            SELECT s, d FROM edges
            UNION
            SELECT r.src, e.d FROM reach r JOIN edges e ON r.dst = e.s
        ), comp AS (
            SELECT src AS value, least(src, min(dst)) AS cluster
            FROM reach GROUP BY src
        ), labeled AS (
            SELECT v.value, v.n,
                   coalesce(c.cluster, v.value) AS cluster
            FROM v LEFT JOIN comp c USING (value)
        )
        SELECT value,
               first_value(value) OVER (
                   PARTITION BY cluster ORDER BY n DESC, value
               ) AS canonical,
               n
        FROM labeled
    """,
    "order_price_quartiles": """
        WITH t AS (
            SELECT quantile_cont(o_totalprice, 0.25) AS q1,
                   quantile_cont(o_totalprice, 0.5) AS q2,
                   quantile_cont(o_totalprice, 0.75) AS q3
            FROM orders
        )
        SELECT CASE WHEN o_totalprice <= q1 THEN 1
                    WHEN o_totalprice <= q2 THEN 2
                    WHEN o_totalprice <= q3 THEN 3
                    ELSE 4 END AS quartile,
               count(*) AS n_orders,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders, t
        GROUP BY 1
    """,
    "customers_without_high_value_orders": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0
        )
    """,
    "customers_with_high_value_orders": """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0
        )
    """,
    "user_event_matrix": """
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'click') AS click,
               count(*) FILTER (WHERE event_type = 'error') AS error,
               count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
               count(*) FILTER (WHERE event_type = 'signup') AS signup,
               count(*) FILTER (WHERE event_type = 'view') AS view
        FROM events GROUP BY user_id
    """,
    "lineitem_measures_unpivot": """
        SELECT l_orderkey, l_linenumber,
               'l_quantity' AS measure, l_quantity AS val
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber,
               'l_extendedprice' AS measure, l_extendedprice AS val
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber,
               'l_discount' AS measure, l_discount AS val
        FROM lineitem
    """,
    # the window formulation of latest-wins compaction; the engine
    # computes it as a partial-aggregated max_by instead (one
    # pre-combined row per key crosses the shuffle)
    "current_user_state": """
        SELECT user_id, event_type, ts, event_id, value FROM (
            SELECT user_id, event_type, epoch_ns(ts) AS ts, event_id,
                   value,
                   row_number() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY epoch_ns(ts) DESC, event_id DESC
                   ) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    # SCD2: the lead-window formulation over the same change points
    "user_value_history_scd2": """
        SELECT user_id, value,
               valid_from, valid_to, valid_to IS NULL AS is_current
        FROM (
            SELECT user_id, value, epoch_ns(ts) AS valid_from,
                   lead(epoch_ns(ts)) OVER (
                       PARTITION BY user_id ORDER BY epoch_ns(ts)
                   ) AS valid_to
            FROM events WHERE event_type = 'purchase'
        )
    """,
    # deletes: the version-race winner per key, with the key dropped
    # when the winner is a tombstone (odd event_id divisible by 7 —
    # the synthetic op derivation shared with the Spark side)
    "current_user_state_with_deletes": """
        SELECT user_id, event_type, ts, event_id, value FROM (
            SELECT user_id, event_type, epoch_ns(ts) AS ts, event_id,
                   value,
                   CASE WHEN event_id % 2 = 1 AND event_id % 7 = 0
                        THEN 'D' ELSE 'U' END AS op,
                   row_number() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY epoch_ns(ts) DESC, event_id DESC
                   ) AS rn
            FROM events
        ) WHERE rn = 1 AND op = 'U'
    """,
    # Q2 oracle keeps the CORRELATED scalar-min form the Spark side
    # decorrelates — that the two agree is the decorrelation proof
    "min_cost_supplier": """
        WITH pf AS (
            SELECT p_partkey FROM part
            WHERE p_type = 'STANDARD' AND p_size <= 10
        ), se AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ), offers AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS cost
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM pf)
              AND l_suppkey IN (SELECT s_suppkey FROM se)
            GROUP BY 1, 2
        )
        SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey,
               round(cost, 4) AS cost
        FROM offers o JOIN se ON o.l_suppkey = se.s_suppkey
        WHERE cost = (
            SELECT min(o2.cost) FROM offers o2
            WHERE o2.l_partkey = o.l_partkey
        )
    """,
    "product_type_profit": """
        SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)
                         - 0.8 * p_retailprice * l_quantity), 2) AS profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
    """,
    "late_shipment_priority": """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN
                            ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                    AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN
                            ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
                    AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        GROUP BY 1
    """,
    "part_supplier_counts": """
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY 1, 2, 3
    """,
    # Q20 oracle keeps the nested-IN-with-correlated-aggregate form
    "potential_part_promotion": """
        SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem l1
            WHERE l_partkey IN (
                      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
                  )
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_partkey, l_suppkey
            HAVING sum(l_quantity) > 0.5 * (
                SELECT sum(l2.l_quantity) FROM lineitem l2
                WHERE l2.l_partkey = l1.l_partkey
                  AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l2.l_shipdate < TIMESTAMP '1997-01-01'
            )
        )
    """,
}

# per-column profile rows generated from the same column list the
# Spark side reads off the table; count(*)-count(col) keeps null
# counts BIGINT (a CASE-sum would be HUGEINT in DuckDB)
_ORDERS_COLS = (
    "o_orderkey o_custkey o_orderstatus o_totalprice o_orderdate "
    "o_orderpriority"
).split()
ORACLE_SQL["orders_profile"] = "\nUNION ALL\n".join(
    f"""
        SELECT '{c}' AS "column", count(*) AS n_rows,
               count(*) - count({c}) AS n_nulls,
               count(DISTINCT {c}) AS n_distinct
        FROM orders
    """
    for c in _ORDERS_COLS
)

# the stream-stream join must produce the batch interval join's exact
# rows — one oracle checks both formulations
ORACLE_SQL["purchases_after_error_interval_stream"] = ORACLE_SQL[
    "purchases_after_error_interval"
]

# the streaming CDC apply must converge to the batch compaction's
# exact state — one oracle checks both formulations
ORACLE_SQL["current_user_state_stream"] = ORACLE_SQL["current_user_state"]

# with tombstones retained in state, the multi-batch apply converges
# to the one-shot compaction however the change stream is split —
# the same oracle checks batch and stream
ORACLE_SQL["current_user_state_with_deletes_stream"] = ORACLE_SQL[
    "current_user_state_with_deletes"
]

# the txlog-state variant converges to the identical compaction
ORACLE_SQL["current_user_state_txlog_stream"] = ORACLE_SQL[
    "current_user_state_with_deletes"
]

# MERGE INTO's end state is version-ordered, so it too equals the
# one-shot compaction regardless of the base/batch split
ORACLE_SQL["user_state_merge_into"] = ORACLE_SQL[
    "current_user_state_with_deletes"
]

# bucketed merge: key-unique base (latest even event per key) merged
# with the odd rows of users 3-7 only — the same latest-wins window
# with 'D' removal over the restricted union
ORACLE_SQL["user_state_merge_bucketed"] = """
    WITH base AS (
        SELECT user_id, event_type, ts, event_id, value FROM (
            SELECT user_id, event_type, epoch_ns(ts) AS ts, event_id,
                   value,
                   row_number() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY epoch_ns(ts) DESC, event_id DESC
                   ) AS rn
            FROM events WHERE event_id % 2 = 0
        ) WHERE rn = 1
    ), unioned AS (
        SELECT user_id, event_type, ts, event_id, value, 'U' AS op
        FROM base
        UNION ALL
        SELECT user_id, event_type, epoch_ns(ts) AS ts, event_id,
               value,
               CASE WHEN event_id % 7 = 0 THEN 'D' ELSE 'U' END AS op
        FROM events
        WHERE event_id % 2 = 1 AND user_id BETWEEN 3 AND 7
    )
    SELECT user_id, event_type, ts, event_id, value FROM (
        SELECT *,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM unioned
    ) WHERE rn = 1 AND op = 'U'
"""

# co-bucketed storage-partitioned join: per-bucket pairing computes
# exactly the global inner join (equal keys share a bucket), so the
# oracle is the plain join of the two aggregates
ORACLE_SQL["user_state_join_cobucketed"] = """
    WITH facts AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               SUM(value) AS total_value
        FROM events GROUP BY user_id
    ), dim AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_sampled_purchases,
               max(event_id) AS max_purchase_event_id
        FROM events
        WHERE event_type = 'purchase' AND event_id % 13 = 0
        GROUP BY user_id
    )
    SELECT f.user_id, f.n_events, f.total_value,
           d.n_sampled_purchases, d.max_purchase_event_id
    FROM facts f JOIN dim d ON f.user_id = d.user_id
"""

ORACLE_SQL["user_state_join_agg_cobucketed"] = """
    WITH dim AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS nsp
        FROM events
        WHERE event_type = 'purchase' AND event_id % 13 = 0
        GROUP BY user_id
    )
    SELECT e.user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(SUM(e.value), 6) AS total_value,
           CAST(count(DISTINCT e.event_type) AS BIGINT) AS n_types,
           max(d.nsp) AS n_sampled_purchases
    FROM events e LEFT JOIN dim d ON e.user_id = d.user_id
    GROUP BY e.user_id
"""

ORACLE_SQL["user_state_agg_bucketed"] = """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(SUM(value), 6) AS total_value,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events GROUP BY user_id
"""

# MERGE CDF classes reconstructed from the global version race: with
# a key-unique base, winner-from-batch = update (pre=base row,
# post=winner), tombstone winner = delete, fresh-key live winner =
# insert, winner-stayed-put = no change rows
# the refreshed MV equals the per-user aggregate of the post-merge
# state, which the global version race reconstructs: winner per
# (user_id, event_type) across ALL events; odd D-winners drop the key
ORACLE_SQL["user_state_mv_cdf_refresh"] = """
    WITH ev AS (
        SELECT user_id, event_type, epoch_ns(ts) AS ts, event_id,
               value
        FROM events
    ), win AS (
        SELECT user_id, value FROM (
            SELECT *, CASE WHEN event_id % 2 = 1 AND event_id % 7 = 0
                           THEN 'D' ELSE 'U' END AS op,
                   row_number() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM ev
        ) WHERE rn = 1 AND op = 'U'
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_state_rows,
           round(SUM(value), 6) AS total_value
    FROM win GROUP BY user_id
"""

ORACLE_SQL["user_state_merge_cdf_feed"] = """
    WITH ev AS (
        SELECT user_id, event_type, epoch_ns(ts) AS ts, event_id,
               value
        FROM events
    ), base AS (
        SELECT user_id, event_type, ts, event_id, value FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts DESC, event_id DESC
            ) AS rn
            FROM ev WHERE event_id % 2 = 0
        ) WHERE rn = 1
    ), win AS (
        SELECT user_id, event_type, ts, event_id, value, op FROM (
            SELECT *, CASE WHEN event_id % 2 = 1 AND event_id % 7 = 0
                           THEN 'D' ELSE 'U' END AS op,
                   row_number() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM ev
        ) WHERE rn = 1
    )
    SELECT b.user_id, b.event_type, b.ts, b.event_id, b.value,
           'update_preimage' AS _change_type,
           CAST(1 AS BIGINT) AS _commit_version
    FROM base b JOIN win w USING (user_id, event_type)
    WHERE w.op = 'U' AND w.event_id <> b.event_id
    UNION ALL
    SELECT w.user_id, w.event_type, w.ts, w.event_id, w.value,
           'update_postimage', CAST(1 AS BIGINT)
    FROM win w JOIN base b USING (user_id, event_type)
    WHERE w.op = 'U' AND w.event_id <> b.event_id
    UNION ALL
    SELECT w.user_id, w.event_type, w.ts, w.event_id, w.value,
           'insert', CAST(1 AS BIGINT)
    FROM win w ANTI JOIN base b USING (user_id, event_type)
    WHERE w.op = 'U'
    UNION ALL
    SELECT b.user_id, b.event_type, b.ts, b.event_id, b.value,
           'delete', CAST(1 AS BIGINT)
    FROM base b JOIN win w USING (user_id, event_type)
    WHERE w.op = 'D'
"""

# RESTORE to v0 republishes exactly the even-id snapshot — the later
# append must vanish from the head (and stay time-travelable, pytest)
ORACLE_SQL["event_state_restore"] = """
    SELECT event_id, user_id, event_type, value
    FROM events WHERE event_id % 2 = 0
"""

# zone-map pruning is a pure superset optimization: the Z-ordered
# pruned scan must equal the plain filtered scan bit-for-bit
ORACLE_SQL["events_zorder_pruned_scan"] = """
    SELECT event_id, user_id, event_type, value
    FROM events WHERE value BETWEEN 20.0 AND 40.0
"""

# the rename is metadata-only: same rows, aliased column, plus the
# one post-rename append
ORACLE_SQL["events_renamed_column_scan"] = """
    SELECT event_id, user_id, event_type, value AS amount FROM events
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), 'synthetic', 123.5
"""

# the partition-pruned read is a pure superset optimization over the
# equality predicate
ORACLE_SQL["events_partitioned_scan"] = """
    SELECT event_id, user_id, event_type, value
    FROM events WHERE event_type = 'purchase'
"""

# merge-on-read deletes must equal the logical predicate exactly;
# NULL values are outside every [lo, hi] and survive
ORACLE_SQL["events_dv_delete_scan"] = """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE value IS NULL OR NOT (value BETWEEN 20.0 AND 55.0)
"""

# two stacked expression deletes with SQL DELETE NULL semantics:
# rows where a predicate is NULL or FALSE survive it
ORACLE_SQL["events_expr_delete_scan"] = """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE NOT coalesce(
            event_type = 'click' AND value BETWEEN 20.0 AND 60.0, false)
      AND NOT coalesce(user_id % 10 = 0 OR value > 95.0, false)
"""

# the read-side predicate is applied verbatim (WHERE TRUE semantics)
ORACLE_SQL["events_where_pruned_scan"] = """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_id IN (3, 77, 501, 997, 4242) AND value >= 5.0
"""

# point-set IN deletes with SQL DELETE NULL semantics: survivors are
# rows where each predicate is NOT TRUE
ORACLE_SQL["events_point_set_delete_scan"] = """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE NOT coalesce(
            event_id IN (7, 13, 501, 997, 2024), false)
      AND NOT coalesce(
            event_id IN (42, 256, 4096) AND value >= 1.0, false)
"""

# the CDF feed reconstructed as SQL: delete preimages from the raw
# table, update pre/post images from the post-delete state
ORACLE_SQL["events_cdf_feed"] = """
    WITH after_del AS (
        SELECT * FROM events
        WHERE NOT coalesce(
            event_type = 'click' AND value < 30.0, false)
    )
    SELECT event_id, user_id, event_type, value,
           'delete' AS _change_type,
           CAST(1 AS BIGINT) AS _commit_version
    FROM events
    WHERE coalesce(event_type = 'click' AND value < 30.0, false)
    UNION ALL
    SELECT event_id, user_id, event_type, value,
           'update_preimage', CAST(2 AS BIGINT)
    FROM after_del
    WHERE coalesce(event_type = 'view' AND value > 80.0, false)
    UNION ALL
    SELECT event_id, user_id, event_type, value + 1,
           'update_postimage', CAST(2 AS BIGINT)
    FROM after_del
    WHERE coalesce(event_type = 'view' AND value > 80.0, false)
"""

# the streamed CDF feed reconstructed as SQL: inserts split by the
# residue that committed them, delete preimages from the raw table,
# update images from the post-delete state
ORACLE_SQL["events_cdf_stream_feed"] = """
    WITH after_del AS (
        SELECT * FROM events
        WHERE NOT coalesce(
            event_type = 'click' AND value < 30.0, false)
    )
    SELECT event_id, user_id, event_type, value,
           'insert' AS _change_type,
           CAST(event_id % 2 AS BIGINT) AS _commit_version
    FROM events
    UNION ALL
    SELECT event_id, user_id, event_type, value,
           'delete', CAST(2 AS BIGINT)
    FROM events
    WHERE coalesce(event_type = 'click' AND value < 30.0, false)
    UNION ALL
    SELECT event_id, user_id, event_type, value,
           'update_preimage', CAST(3 AS BIGINT)
    FROM after_del
    WHERE coalesce(event_type = 'view' AND value > 80.0, false)
    UNION ALL
    SELECT event_id, user_id, event_type, value + 1,
           'update_postimage', CAST(3 AS BIGINT)
    FROM after_del
    WHERE coalesce(event_type = 'view' AND value > 80.0, false)
"""

# lexicographic pruning is a pure superset optimization
ORACLE_SQL["events_string_pruned_scan"] = """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type BETWEEN 'purchase' AND 'purchase'
"""

# string-led Z-order is pure layout: the pruned equality read must
# equal the plain filter row for row
ORACLE_SQL["events_zorder_string_scan"] = """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type = 'purchase'
"""

# the rebased history IS the serial one: base minus the deleted band,
# plus the concurrently appended (relabeled) high-value rows — the
# append ordered first, the delete last, no interaction (disjoint)
ORACLE_SQL["events_rebased_dml_scan"] = """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE value IS NULL OR NOT (value BETWEEN 10.0 AND 60.0)
    UNION ALL
    SELECT event_id, user_id, 'late_arrival' AS event_type, value
    FROM events
    WHERE value >= 400.0
"""

# bucket partitioning is pure layout: the listing-pruned point read
# must equal the plain equality filter
ORACLE_SQL["events_bucket_transform_scan"] = """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE user_id = 42
"""

# the stats PROPERTY is pure skipping: backfilled era-1 files plus
# auto-statted era-2 appends read back as the plain filter
ORACLE_SQL["events_stats_property_scan"] = """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE user_id BETWEEN 3 AND 7
"""

# hidden partitioning is pure layout: the pruned read equals the
# plain BETWEEN (tns = epoch nanos, micros-exact under both the
# MICROS and NANOS physical eras because the engine floors to micros)
ORACLE_SQL["events_hidden_partition_scan"] = """
    SELECT event_id, user_id, event_type, value,
           (epoch_ns(ts) // 1000) * 1000 AS tns
    FROM events
    WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
                 AND TIMESTAMP '2024-01-12 23:59:59.999999'
"""

# bloom pages are pure row-group skipping: the point-IN read must
# equal the plain filter
ORACLE_SQL["events_bloom_point_scan"] = """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_id IN (77, 777, 3141)
"""

# one type filtered across both layout eras — pure row filter in SQL
ORACLE_SQL["events_spec_evolution_scan"] = """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type = 'purchase'
"""

# UPDATE-then-DELETE as plain SQL: CASE evaluates both SET
# expressions against the pre-update row (the engine's SET
# expressions are independent, so sequential application agrees)
ORACLE_SQL["events_dv_update_scan"] = """
    WITH upd AS (
        SELECT event_id, user_id,
               CASE WHEN event_type = 'view' AND value < 50.0
                    THEN 'view_adj' ELSE event_type END AS event_type,
               CASE WHEN event_type = 'view' AND value < 50.0
                    THEN value + 1000 ELSE value END AS value
        FROM events)
    SELECT event_id, user_id, event_type, value
    FROM upd
    WHERE NOT coalesce(value BETWEEN 1030.0 AND 1040.0, false)
"""

# pre-image UPDATE semantics: every SET (and the predicate) against
# the row as it was BEFORE the update — stacked CASE projections are
# exactly what SQL UPDATE commits
ORACLE_SQL["events_preimage_update_scan"] = """
    WITH u1 AS (
        SELECT event_id, user_id,
               CASE WHEN value < 40.0
                    THEN event_type ||
                         (CASE WHEN value < 20.0
                               THEN '_lo' ELSE '_mid' END)
                    ELSE event_type END AS event_type,
               CASE WHEN value < 40.0
                    THEN value + 1000 ELSE value END AS value
        FROM events)
    SELECT CASE WHEN event_type = 'purchase' AND value >= 80.0
                THEN user_id ELSE event_id END AS event_id,
           CASE WHEN event_type = 'purchase' AND value >= 80.0
                THEN event_id ELSE user_id END AS user_id,
           event_type, value
    FROM u1
"""

# conjunctive pruning is still a pure superset optimization
ORACLE_SQL["events_zorder_two_predicate_scan"] = """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE user_id BETWEEN 100 AND 400
      AND value BETWEEN 20.0 AND 40.0
"""


# every streamed row must carry the version that ADDED it, so the
# per-type distinct-commit count equals the distinct residues of the
# deterministic three-way commit split
ORACLE_SQL["event_counts_cdf_stream"] = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT event_id % 3) AS BIGINT) AS n_commits
    FROM events GROUP BY event_type
"""

# both as-of formulations (JVM union+window, cogrouped pandas
# merge_asof) compute the same temporal join — one oracle checks both
ORACLE_SQL["purchase_attribution_asof_pandas"] = ORACLE_SQL[
    "purchase_attribution_asof"
]
