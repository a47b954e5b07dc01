"""Synthetic dataA/dataB generator, cluster-side.

Capability parity with reference tools/GenerateParquet.scala:126-366
(seeded reproducibility, skewed location distribution, duplicate
detection_oids with jittered timestamps, co-located camera ids,
diagnostics) — re-derived for scale: the reference materializes every
row on the driver via ``Seq`` + ``parallelize``
(GenerateParquet.scala:126-146), which caps it at driver memory. Here
rows come from ``spark.range(n)`` (distributed, no driver
materialization), so ``--data-a-rows 10_000_000_000`` works on a
cluster.

Determinism: every "random" draw is ``xxhash64(id, salt)`` mapped to a
uniform in [0, 1). Unlike ``F.rand(seed)`` (whose stream depends on
partition assignment) this is a pure function of the row id, so output
is bit-identical regardless of parallelism or partition count.

Usage::

    python -m parquet_combiner_spark.tools.generate \
        --output-dir /tmp/gen --data-a-rows 100000 --duplication-rate 0.2
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Same knob defaults as reference GenerateParquet.scala:22-34.
DEFAULT_DATA_A_ROWS = 1000
DEFAULT_DATA_B_ROWS = 10
DEFAULT_DUPLICATION_RATE = 0.15
DEFAULT_SKEW_LOCATION = 1
DEFAULT_SKEW_FACTOR = 5.0
DEFAULT_NUM_ITEMS = 10
RANDOM_SEED = 42
CAMERAS_PER_LOCATION = 10
TIMESTAMP_VARIATION = 10
SECONDS_30_DAYS = 86400 * 30

# Distinct item/city vocabularies (COCO-style labels / US cities, same
# idea as reference GenerateParquet.scala:36-105 but our own lists).
BASE_ITEMS = (
    "person", "car", "truck", "bicycle", "motorcycle", "dog", "cat",
    "bus", "traffic light", "backpack", "bottle", "chair", "plant",
    "sign", "bench", "bird", "boat", "helmet", "umbrella", "handbag",
    "scooter", "van", "trailer", "cone", "stroller", "wheelchair",
    "ladder", "cart", "crate", "barrel", "laptop", "phone", "book",
    "clock", "vase", "drone", "kiosk", "mailbox", "hydrant", "meter",
)

CITIES = (
    "New York City", "Los Angeles", "Chicago", "Houston", "Phoenix",
    "Philadelphia", "San Antonio", "San Diego", "Dallas", "San Jose",
    "Austin", "Jacksonville", "Fort Worth", "Columbus", "Indianapolis",
    "Charlotte", "Seattle", "Denver", "Boston", "El Paso", "Nashville",
    "Detroit", "Portland", "Memphis", "Louisville",
)

# A fixed epoch base so generated data is reproducible run-to-run
# (the reference uses Instant.now() — deliberately diverging here:
# wall-clock in generated fixtures breaks golden tests).
DEFAULT_BASE_TIME = 1_755_000_000


def _uniform(*cols, salt: int) -> F.Column:
    """Deterministic uniform in [0, 1) from a 64-bit hash of (cols, salt)."""
    h = F.xxhash64(*cols, F.lit(salt))
    # abs via bitwise mask would overflow at Long.MinValue; pmod is safe.
    return F.pmod(h, F.lit(1_000_000_000)).cast("double") / 1_000_000_000.0


def generate_location_data(spark: SparkSession, num_locations: int) -> DataFrame:
    """dataB: (geographical_location_oid, geographical_location), ids
    1..n mapped onto the city vocabulary (reference :205-211)."""
    n = min(num_locations, len(CITIES))
    cities = F.array(*[F.lit(c) for c in CITIES])
    return (
        spark.range(1, n + 1)
        .select(
            F.col("id").alias("geographical_location_oid"),
            F.element_at(cities, F.col("id").cast("int")).alias(
                "geographical_location"
            ),
        )
    )


def generate_detection_data(
    spark: SparkSession,
    num_records: int,
    num_locations: int,
    duplication_rate: float = DEFAULT_DUPLICATION_RATE,
    skew_location_id: int = DEFAULT_SKEW_LOCATION,
    skew_factor: float = DEFAULT_SKEW_FACTOR,
    num_items: int = DEFAULT_NUM_ITEMS,
    seed: int = RANDOM_SEED,
    base_time: int = DEFAULT_BASE_TIME,
) -> DataFrame:
    """dataA: skewed locations, co-located cameras, planted duplicate
    detection_oids (reference :215-280), fully distributed.

    Skew model (reference :236-249): with probability
    ``0.7 * f / (1 + f)`` a row lands on the skewed location; otherwise
    uniform over the other locations. Duplicates (reference :263-276):
    ``rate * n`` extra rows that clone a base row's key/payload with a
    jittered timestamp.
    """
    n_items = min(num_items, len(BASE_ITEMS))
    items = F.array(*[F.lit(i) for i in BASE_ITEMS[:n_items]])
    n_dups = int(num_records * duplication_rate)
    n_unique = num_records - n_dups

    skew_p = 0.7 * skew_factor / (1.0 + skew_factor)
    u_loc = _uniform(F.col("id"), salt=seed + 1)
    # Uniform over the non-skewed locations: draw from n-1 slots and
    # shift ids >= skew_location_id up by one (exact, no remap bias —
    # the reference's modulo remap at :243-244 double-weights one slot).
    other = (F.floor(u_loc * (num_locations - 1)) + 1).cast("long")
    other = F.when(other >= skew_location_id, other + 1).otherwise(other)
    loc = (
        F.when(_uniform(F.col("id"), salt=seed) < skew_p, F.lit(skew_location_id))
        .otherwise(other)
        .cast("long")
        if num_locations > 1
        else F.lit(skew_location_id).cast("long")
    )

    base = (
        spark.range(1, n_unique + 1)
        .withColumn("geographical_location_oid", loc)
        .select(
            "geographical_location_oid",
            (
                F.col("geographical_location_oid") * CAMERAS_PER_LOCATION
                + F.floor(
                    _uniform(F.col("id"), salt=seed + 2) * CAMERAS_PER_LOCATION
                )
                + 1
            ).alias("video_camera_oid"),
            F.col("id").alias("detection_oid"),
            F.element_at(
                items,
                (
                    F.floor(_uniform(F.col("id"), salt=seed + 3) * n_items) + 1
                ).cast("int"),
            ).alias("item_name"),
            (
                F.lit(base_time)
                - F.floor(_uniform(F.col("id"), salt=seed + 4) * SECONDS_30_DAYS)
            ).cast("long").alias("timestamp_detected"),
        )
    )

    if n_dups <= 0:
        return base

    # Duplicates: pick a source id per dup row by hashing, join back to
    # the base rows (equi-join on the primary key — broadcast or
    # shuffle-hash as AQE decides), jitter the timestamp.
    dup_src = spark.range(n_dups).select(
        (
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 5)), F.lit(n_unique)) + 1
        ).alias("detection_oid"),
        F.floor(
            _uniform(F.col("id"), salt=seed + 6) * TIMESTAMP_VARIATION
        ).alias("__jitter"),
    )
    dups = dup_src.join(base, "detection_oid").select(
        "geographical_location_oid",
        "video_camera_oid",
        "detection_oid",
        "item_name",
        (F.col("timestamp_detected") + F.col("__jitter")).alias(
            "timestamp_detected"
        ),
    )
    return base.select(*dups.columns).unionByName(dups)


def print_diagnostics(data_a: DataFrame, data_b: DataFrame) -> dict:
    """Distribution + duplication-rate diagnostics
    (reference GenerateParquet.scala:177-196)."""
    dist = (
        data_a.groupBy("geographical_location_oid")
        .count()
        .join(data_b, "geographical_location_oid")
        .select("geographical_location_oid", "geographical_location", "count")
        .orderBy(F.desc("count"))
    )
    dist.show(20, truncate=False)
    total = data_a.count()
    distinct = data_a.select("detection_oid").distinct().count()
    rate = (total - distinct) * 100.0 / total if total else 0.0
    print(f"Total rows: {total}, distinct detection_oids: {distinct}")
    print(f"Duplication rate: {rate:.2f}%")
    return {"total_rows": total, "distinct": distinct, "dup_rate_pct": rate}


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(
        description="Generate synthetic dataA/dataB Parquet test data"
    )
    p.add_argument("--output-dir", default="test-data")
    p.add_argument("--data-a-rows", type=int, default=DEFAULT_DATA_A_ROWS)
    p.add_argument("--data-b-rows", type=int, default=DEFAULT_DATA_B_ROWS)
    p.add_argument(
        "--duplication-rate", type=float, default=DEFAULT_DUPLICATION_RATE
    )
    p.add_argument("--skew-location", type=int, default=DEFAULT_SKEW_LOCATION)
    p.add_argument("--skew-factor", type=float, default=DEFAULT_SKEW_FACTOR)
    p.add_argument("--num-items", type=int, default=DEFAULT_NUM_ITEMS)
    p.add_argument("--seed", type=int, default=RANDOM_SEED)
    p.add_argument("--spark-master", default=None)
    args = p.parse_args(argv)

    from parquet_combiner_spark.session import get_spark
    from parquet_combiner_spark.sources.io import write_parquet

    spark = get_spark(app_name="generate-parquet", master=args.spark_master)
    data_b = generate_location_data(spark, args.data_b_rows)
    data_a = generate_detection_data(
        spark,
        args.data_a_rows,
        num_locations=min(args.data_b_rows, len(CITIES)),
        duplication_rate=args.duplication_rate,
        skew_location_id=args.skew_location,
        skew_factor=args.skew_factor,
        num_items=args.num_items,
        seed=args.seed,
    )
    write_parquet(data_a, f"{args.output_dir}/dataA")
    write_parquet(data_b, f"{args.output_dir}/dataB")
    print(f"Wrote dataA ({args.data_a_rows} rows) and dataB to {args.output_dir}")
    print_diagnostics(data_a, data_b)
    spark.stop()


if __name__ == "__main__":
    main()
