"""Sequence packing: assign documents to fixed-token-budget training
sequences (the concatenate-and-chunk step of an LLM pretraining data
pipeline: the token stream is the concatenation of documents in a
deterministic order; sequence i owns stream positions
[i*budget, (i+1)*budget)).

Each document is tagged with the sequence that contains its FIRST
token and its offset inside that sequence — exactly what a packing
loader needs to materialize fixed-length samples (boundary documents
continue into the next sequence, the standard pretraining treatment).

Scale design — the naive formulation is a global window cumsum
(``sum(n) OVER (ORDER BY doc_id)``), which Spark executes by moving
EVERYTHING into one partition: correct at test scale, a wall at
100 TB. This implementation is the classic two-phase distributed
prefix sum instead:

1. range-repartition by the ordering key (Spark's RangePartitioner
   samples split points; partition p holds a contiguous key range,
   and partition ids increase with the range);
2. per-partition token totals — ONE ROW PER PARTITION — are
   collected, prefix-summed on the driver (bounded, like collecting
   AQE statistics, not data), and shipped back as a broadcast map;
3. each row's global start offset = its within-partition window
   cumsum (cheap: partitions sort locally, no exchange) + its
   partition's base offset.

Total cost: one range shuffle of the (id, token_count) projection +
one local sort per partition. No stage ever holds more than one
partition of the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, n_tokens, seq_id, seq_offset): pack documents in ``id``
    order into sequences of ``budget`` tokens. Deterministic: depends
    only on the (id → token count) mapping, never on partitioning.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    proj = docs.select(
        F.col(id_col).alias("__id"),
        F.col(token_col).cast("long").alias("__n"),
    )
    parts = num_partitions or proj.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    ranged = (
        proj.repartitionByRange(int(parts), F.col("__id"))
        .withColumn("__pid", F.spark_partition_id())
        # Pin the partitioning: the totals collect below and the final
        # select are two separate jobs, and RangePartitioner re-samples
        # its split points (seeded by the physical RDD id) on each
        # execution — without materializing once, the driver-computed
        # base offsets could attach to different partition boundaries
        # in the second job, corrupting seq_id/seq_offset.
        .localCheckpoint(eager=True)
    )
    # one row per partition reaches the driver; prefix-sum the bases.
    # (bounded metadata, not data - the same class of driver-side work
    # as range-split sampling itself)
    totals = {
        r["__pid"]: r["__t"]
        for r in ranged.groupBy("__pid").agg(F.sum("__n").alias("__t")).collect()
    }
    bases: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        bases[pid] = acc
        acc += totals[pid]
    base_expr = F.element_at(
        F.create_map(
            *[
                x
                for pid in sorted(bases)
                for x in (F.lit(pid), F.lit(bases[pid]))
            ]
        ),
        F.col("__pid"),
    )
    w = Window.partitionBy("__pid").orderBy("__id")
    local_cum = F.sum("__n").over(w) - F.col("__n")
    return ranged.select(
        F.col("__id").alias(id_col),
        F.col("__n").alias("n_tokens"),
        (local_cum + base_expr).alias("__start"),
    ).select(
        id_col,
        "n_tokens",
        F.expr(f"__start div {int(budget)}").alias("seq_id"),
        F.pmod(F.col("__start"), F.lit(int(budget))).cast("long").alias(
            "seq_offset"
        ),
    )
