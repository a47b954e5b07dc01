from parquet_combiner_spark.operators.dedup import (  # noqa: F401
    dedup_deterministic,
    dedup_first_wins,
    dedup_keep_min,
    dedup_keep_min_packed,
)
from parquet_combiner_spark.operators.join import (  # noqa: F401
    broadcast_dim_join,
)
from parquet_combiner_spark.operators.topk import top_k_per_group  # noqa: F401
