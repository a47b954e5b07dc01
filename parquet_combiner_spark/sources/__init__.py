from parquet_combiner_spark.sources.io import (  # noqa: F401
    load_tables,
    read_data_a,
    read_data_b,
    read_parquet,
    write_parquet,
)
