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
prefix sum over DETERMINISTIC range buckets:

1. the driver computes ~``parts-1`` ascending split points over the
   ordering key (one ``approxQuantile`` pass — bounded sketch
   metadata, the same class of driver work as range-split sampling)
   and embeds them as plan literals; every row's bucket is then a
   PURE FUNCTION of its key, identical in every job and on recompute;
2. per-bucket token totals — one row per bucket — are aggregated
   (map-side combined), collected, prefix-summed on the driver, and
   shipped back as a literal bucket→base map;
3. each row's global start offset = its within-bucket window cumsum
   + its bucket's base offset. The window clusters by bucket, so the
   plan has exactly ONE full-data exchange (hash on the bucket) and
   never a single-partition window.

Because the bucket column is deterministic, the totals job and the
final job agree on bucket membership BY CONSTRUCTION — no checkpoint,
persist, or cross-job partition pinning is needed, lineage stays
intact (executor loss just recomputes — safe on a real cluster), and
split-point quality affects only bucket balance, never the output:
any splits yield the identical packing.

(An earlier design derived buckets from ``spark_partition_id()`` over
``repartitionByRange`` + ``localCheckpoint``; the checkpoint lost the
partitioning info, forcing a SECOND full-data hash exchange before
the window, pinned blocks for the session, and — localCheckpoint
being non-reliable — died with any executor. The bucket-literal
design removes all three.)
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _prefix_bases(
    bucketed: DataFrame, bucket_col: str, agg: "F.Column"
) -> "F.Column":
    """Phase 2 of the two-phase distributed prefix sum (module
    docstring): aggregate one row per deterministic bucket, collect
    that bounded metadata (≤ parts rows), prefix-sum the bases on the
    driver, and return a plan-literal bucket→base map expression.
    Shared by :func:`pack_sequences`, ``select_by_token_budget`` and
    ``epoch_shuffle`` so the empty-input and ordering handling lives
    in exactly one place."""
    totals = {
        r[bucket_col]: r["__t"]
        for r in bucketed.groupBy(bucket_col).agg(agg.alias("__t")).collect()
    }
    bases: dict[int, int] = {}
    acc = 0
    for b in sorted(totals):
        bases[b] = acc
        acc += totals[b]
    if not bases:
        bases = {0: 0}
    return F.element_at(
        F.create_map(
            *[x for b in sorted(bases) for x in (F.lit(b), F.lit(bases[b]))]
        ),
        F.col(bucket_col),
    )


def _resolve_partitions(spark: SparkSession) -> int:
    """Bucket-count default: ``spark.sql.shuffle.partitions`` when it
    parses as an int, else ``defaultParallelism`` (some deployments
    set the conf to non-numeric values like "auto")."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def _range_splits(proj: DataFrame, parts: int) -> list:
    """Ascending split points over ``__id`` (at most ``parts-1``),
    computed once on the driver. Only bucket BALANCE depends on their
    quality; the packed output is invariant to the choice of splits.

    ``approxQuantile`` needs a numeric column; for non-numeric ids
    (string doc ids) fall back to a bounded driver sample — both are
    one pass and O(parts) driver memory. The dispatch is on the id
    column's DTYPE, not a blanket except: genuine runtime failures
    (executor loss, corrupt state) must propagate, not silently buy
    an extra full scan via the fallback."""
    if parts <= 1:
        return []
    if isinstance(proj.schema["__id"].dataType, T.NumericType):
        qs = [i / parts for i in range(1, parts)]
        splits = proj.stat.approxQuantile("__id", qs, 1.0 / (4 * parts))
    else:
        sample = proj.select("__id").rdd.takeSample(False, parts * 20, seed=42)
        ids = sorted(r[0] for r in sample if r[0] is not None)
        if not ids:
            return []
        step = len(ids) / parts
        splits = [ids[min(int(i * step), len(ids) - 1)] for i in range(1, parts)]
    deduped: list = []
    for s in splits:
        if not deduped or s > deduped[-1]:
            deduped.append(s)
    return deduped


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

    Runs three passes over the (id, token_count) projection — the
    split-point sketch (approxQuantile or sample), the bucket totals,
    and the final pass — so persist ``docs`` first if its upstream is
    expensive to recompute.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    proj = docs.select(
        F.col(id_col).alias("__id"),
        F.col(token_col).cast("long").alias("__n"),
    )
    parts = (
        int(num_partitions)
        if num_partitions is not None
        else _resolve_partitions(proj.sparkSession)
    )
    splits = _range_splits(proj, parts)
    if splits:
        # flat chained sum of CASE WHENs, not a higher-order
        # F.aggregate lambda: lambdas are interpreted per element,
        # this stays inside whole-stage codegen. Depth = len(splits)
        # (one per target partition) — fine into the thousands.
        terms = [
            F.when(F.col("__id") >= F.lit(s), 1).otherwise(0) for s in splits
        ]
        bkt = reduce(add, terms)
    else:
        bkt = F.lit(0)
    bucketed = proj.withColumn("__bkt", bkt)
    # one row per bucket reaches the driver; prefix-sum the bases.
    base_expr = _prefix_bases(bucketed, "__bkt", F.sum("__n"))
    w = (
        Window.partitionBy("__bkt")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local_cum = F.sum("__n").over(w) - F.col("__n")
    return bucketed.select(
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
