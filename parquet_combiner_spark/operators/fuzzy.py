"""Fuzzy (edit-distance-bounded) string matching — the entity-
resolution join family.

The reference joins only on exact keys (reference
ParquetCombinerRDD.scala's oid equi-joins); real ingestion pipelines
also need to reconcile free-text attribute values that differ by
typos ("red widget" / "red widgets"). The classic formulation is a
similarity self-join over the DISTINCT values of a column with an
edit-distance threshold.

Scale design (100 TB corpus, modest vocabulary): the self-join runs
on the distinct-value table, which for entity-ish columns (names,
brands, cities, types) is vocabulary-sized — orders of magnitude
smaller than the corpus; the corpus is touched exactly once by a
partial-aggregated groupBy that also carries the per-value row count.
The pair join is then:

- **length-banded**, never all-pairs: ``lev(a, b) <= d`` implies
  ``|len(a) - len(b)| <= d``, so each value emits ``d+1`` band keys
  (its own length through length+d) and the candidate join is an
  EQUI-join of bands against exact lengths — a pair of unequal
  lengths is generated exactly once (from the shorter side's band),
  equal-length pairs are deduped by value order;
- **threshold-bounded**: the verify filter uses Spark's 3-arg
  ``levenshtein(l, r, threshold)``, which abandons a pair as soon as
  the running distance exceeds ``d`` (O(d·min_len) per pair instead
  of O(len²)).

For vocabularies too large for length banding alone (billions of
distinct strings), the published scale-up is segment blocking
(PassJoin: any pair within distance d shares one of d+1 exact
segments); the banding here is the right cost for the
attribute-vocabulary case this operator targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonicalize_values(
    df: DataFrame,
    col: str,
    max_dist: int = 2,
) -> DataFrame:
    """End-to-end entity canonicalization: map every distinct value of
    ``col`` to its cluster's CANONICAL form — the most frequent
    variant (ties → lexicographically smallest) among all values
    within transitive edit distance ``max_dist`` of each other. The
    full resolution pipeline: :func:`fuzzy_value_pairs` finds the
    variant pairs, connected components (the dedup family's
    clusterer, reused verbatim — it is id-type-agnostic) closes them
    transitively, and a per-cluster frequency vote picks the form to
    rewrite to.

    Output: (value, canonical, n) — one row per distinct value,
    singletons mapping to themselves; ``n`` is the value's own row
    count. Join this map back to the corpus to apply the rewrite.

    Scale: everything downstream of the corpus-touching groupBy is
    vocabulary-sized (see :func:`fuzzy_value_pairs`); the component
    step inherits the clusterer's O(diameter) rounds on clusters that
    are typically 2-3 variants deep.
    """
    from parquet_combiner_spark.functions.dedup_text import (
        near_dup_clusters,
    )
    from pyspark.sql import Window

    # ONE corpus-touching aggregation, materialized (vocab-sized) and
    # reused by both the pair join and the frequency vote — without
    # the checkpoint Spark re-executes the identical subtree per
    # consumer and the corpus is scanned twice
    vals = _value_counts(df, col).localCheckpoint(eager=True)
    counts = vals.select(F.col("val").alias("value"), "n")
    pairs = _pairs_from_vals(vals, max_dist)
    clusters = near_dup_clusters(
        pairs.select(
            F.col("val_a").alias("doc_id_a"),
            F.col("val_b").alias("doc_id_b"),
        )
    ).withColumnsRenamed({"doc_id": "value", "cluster_id": "cluster"})
    labeled = counts.join(clusters, "value", "left").select(
        "value", "n", F.coalesce("cluster", "value").alias("cluster")
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc("n"), F.asc("value")
    )
    return (
        labeled.withColumn(
            "canonical", F.first("value").over(w)
        )
        .select("value", "canonical", "n")
    )


def fuzzy_value_pairs(
    df: DataFrame,
    col: str,
    max_dist: int = 2,
) -> DataFrame:
    """All unordered pairs of distinct non-null ``col`` values within
    edit distance ``max_dist``, with each value's row count.

    Output: (val_a, val_b, dist, n_a, n_b) with val_a < val_b.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    return _pairs_from_vals(_value_counts(df, col), max_dist)


def _value_counts(df: DataFrame, col: str) -> DataFrame:
    """(val, n, len) for each distinct non-null value — the single
    corpus-touching aggregation both fuzzy operators derive from."""
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("val"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("len", F.length("val"))
    )


def _pairs_from_vals(vals: DataFrame, max_dist: int) -> DataFrame:
    bands = vals.select(
        F.col("val").alias("val_a"),
        F.col("n").alias("n_a"),
        F.col("len").alias("len_a"),
        F.explode(
            F.sequence(F.col("len"), F.col("len") + F.lit(max_dist))
        ).alias("band"),
    )
    other = vals.select(
        F.col("val").alias("val_b"),
        F.col("n").alias("n_b"),
        F.col("len").alias("band"),
    )
    cand = bands.join(other, "band").where(
        (F.col("len_a") < F.length("val_b"))
        | (
            (F.col("len_a") == F.length("val_b"))
            & (F.col("val_a") < F.col("val_b"))
        )
    )
    dist = F.levenshtein(F.col("val_a"), F.col("val_b"), max_dist)
    # candidate orientation is shorter-first (a banding artifact);
    # the emitted pair is canonically VALUE-ordered
    a_first = F.col("val_a") <= F.col("val_b")
    return (
        cand.withColumn("dist", dist)
        .where(F.col("dist") >= 0)  # 3-arg levenshtein: -1 = over threshold
        .select(
            F.least("val_a", "val_b").alias("lo"),
            F.greatest("val_a", "val_b").alias("hi"),
            "dist",
            F.when(a_first, F.col("n_a")).otherwise(F.col("n_b")).alias("n_lo"),
            F.when(a_first, F.col("n_b")).otherwise(F.col("n_a")).alias("n_hi"),
        )
        .withColumnsRenamed(
            {"lo": "val_a", "hi": "val_b", "n_lo": "n_a", "n_hi": "n_b"}
        )
    )
