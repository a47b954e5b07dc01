"""Graph analytics over pair/edge frames — the iterative-algorithm
family's second member (the first is connected-components label
propagation, ``dedup_text.near_dup_clusters``).

PageRank over the document-similarity graph answers the curation
question connected components can't: not just "which docs are
duplicates of each other" but "which docs are CENTRAL to a near-dup
neighborhood" — the canonical pick when a cluster must be collapsed
to its most-representative member, and a standard importance signal
for seed selection in web-crawl corpora (the original use).

Scale design: the classic synchronous power iteration, one
equi-join + one partial-aggregated groupBy per round — identical
plan shape to the label-propagation rounds of
``near_dup_clusters``. Each round re-shuffles both join sides on
the node key (checkpointed DataFrames do not carry partitioning
metadata into later plans); for graphs where the edge shuffle
itself dominates, the dial is a bucketed edge table
(``sources.io.write_bucketed`` on ``src``) — bucketing survives in
the catalog, so every round's join reads co-located buckets with
no edge-side exchange. The edge list (with per-source degree
shares) is localCheckpoint-materialized ONCE so the per-round plan
re-reads a compact cached block instead of re-deriving edges from
text; each round's rank frame is eagerly checkpointed, so lineage
stays O(1) and an executor loss replays one round, not the whole
history. Rounds are fixed (power iteration converges geometrically;
fixed-k is the reproducible contract an oracle can replay), so the
driver issues exactly ``iters + 1`` bounded actions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    pairs: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src_col: str = "doc_id_a",
    dst_col: str = "doc_id_b",
    round_to: int = 8,
) -> DataFrame:
    """PageRank on the UNDIRECTED graph whose edges are ``pairs``
    rows, from a uniform start, for exactly ``iters`` synchronous
    rounds.

    Every node of an undirected graph has degree ≥ 1, so there are
    no dangling nodes and mass is conserved at
    ``sum(rank) = 1`` each round (up to float noise). Output:
    (node, degree, pagerank) with pagerank rounded to ``round_to``
    places — rounding only at the BOUNDARY, never between rounds,
    so engine and oracle iterate on full doubles and agree after
    normalization.
    """
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    edges = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(
        pairs.select(
            F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
        )
    )
    # deg (node-cardinality-sized) is checkpointed too: it feeds the
    # count() action, the uniform start, AND the final join — without
    # materialization each of those re-derives edges from the raw
    # pair frame (a full extra pass per consumer).
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("degree")
    ).localCheckpoint(eager=True)
    # (src, dst, share): share = 1/deg(src), the per-edge rank fraction.
    # Checkpointed once — every round's join re-reads these blocks.
    edges_w = (
        edges.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("degree")).alias("share"))
        .localCheckpoint(eager=True)
    )
    n = deg.count()  # bounded action on the materialized frame
    if n == 0:
        return deg.select(
            "src", "degree", F.lit(0.0).alias("pagerank")
        ).withColumnRenamed("src", "node")
    base = (1.0 - damping) / n
    ranks = deg.select("src", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        ranks = (
            edges_w.join(ranks, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("share")).alias("m"))
            .select(
                F.col("dst").alias("src"),
                (F.lit(base) + F.lit(damping) * F.col("m")).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        ranks.join(deg, "src")
        .select(
            F.col("src").alias("node"),
            "degree",
            F.round("rank", round_to).alias("pagerank"),
        )
    )
