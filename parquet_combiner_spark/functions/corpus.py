"""End-to-end corpus preparation: the composed LLM-data pipeline.

Every production training-data run chains the same stages this module
composes from the engine's own operators — and because each stage is
individually oracle-checked, the COMPOSITE stays ANSI-SQL-expressible
and sits under the driver's hash signal as one query:

1. repetition filter  (quality.repetition_stats_arrow — Gopher rules)
2. quality filter     (text.quality_score threshold)
3. exact dedup        (min-doc_id keeper per md5 content fingerprint)
4. decontamination    (quality.decontaminate vs the eval split)
5. split assignment   (sampling.hash_split — content-addressed)

Plan shape: stages 1-2 are narrow passes joined back on doc_id (one
shuffle), dedup is one partial-aggregated groupBy on the fingerprint
plus a semi-join, decontamination's wide side is one map-side-combined
count against a broadcast eval n-gram set, and the split is a free
narrow projection. Nothing in the chain is quadratic in the corpus,
and every shuffle carries keys + small payloads, never full text
bodies except the fingerprint groupBy's input."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parquet_combiner_spark.functions import quality, sampling
from parquet_combiner_spark.functions.text import quality_score, token_count

# Stage knobs — shared with the oracle generator below so engine and
# SQL can never drift.
QUALITY_MIN = 0.2
CORPUS_SPLITS = {"train": 0.9, "val": 0.05, "test": 0.05}
CORPUS_SPLIT_SEED = "corpus-v1"


def corpus_mixture(
    documents: DataFrame,
    text_col: str = "text",
    by: tuple[str, ...] = ("source", "lang"),
) -> DataFrame:
    """Mixture report: docs/tokens per ``by`` cell with corpus shares —
    the planning table every data-mixture decision (and
    :func:`sampling.temperature_sample`'s rate computation) starts
    from.

    Plan shape at 100 TB: one partial-aggregated groupBy (the token
    count rides the map side as a codegen'd size(split), so the
    exchange carries one long per cell, not text); the corpus totals
    come from re-aggregating the CELL table (cells ≪ corpus) and
    broadcast back as a 1-row frame. One full-data shuffle total.

    Output: (*by, n_docs, n_tokens, doc_share, token_share), shares
    rounded to 6 places.
    """
    cells = documents.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("n_tokens"),
    )
    totals = cells.agg(
        F.sum("n_docs").cast("double").alias("__d"),
        F.sum("n_tokens").cast("double").alias("__t"),
    )
    return cells.crossJoin(F.broadcast(totals)).select(
        *by,
        "n_docs",
        "n_tokens",
        F.round(F.col("n_docs") / F.col("__d"), 6).alias("doc_share"),
        F.round(F.col("n_tokens") / F.col("__t"), 6).alias("token_share"),
    )


def corpus_prep(
    documents: DataFrame,
    eval_mod: int = 97,
    ngram: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Run the five-stage pipeline; returns one row per SURVIVING
    training document: (id, split, n_tokens). Documents in the eval
    partition (``id % eval_mod == 0``) are never emitted — they are
    the benchmark being protected, not training data."""
    is_eval = (F.col(id_col) % eval_mod) == 0
    train, eval_df = documents.where(~is_eval), documents.where(is_eval)

    # 1+2: repetition + quality flags (two narrow passes, one join)
    rep_keep = (
        quality.repetition_stats_arrow(train, text_col, id_col)
        .where(F.col("repetition_keep"))
        .select(id_col)
    )
    # 2: quality filter; n_tokens is computed HERE (deterministic
    # per row, so filtering later cannot change it) so stages 4-5
    # never need the text column back after dedup
    kept = (
        train.join(rep_keep, id_col)
        .where(F.round(quality_score(text_col), 4) >= QUALITY_MIN)
        .select(
            id_col, text_col, token_count(text_col).alias("n_tokens")
        )
    )

    # 3: exact dedup — keeper is the min id per content fingerprint,
    # expressed as row_number over the fingerprint partition (r15:
    # the groupBy + semi-join-back formulation shuffled twice and
    # inlined `kept` on both join sides; one window shuffle keeps
    # the same keeper rows with half the exchanges). The surviving
    # frame is MATERIALIZED once (the triangle-counting lesson):
    # decontamination and the final split both consume it, and
    # without the checkpoint each consumer re-ran the whole
    # stage-1-3 subtree — the plan carried EIGHT copies of the Arrow
    # repetition pass (guide §4: the most expensive per-row stage).
    # localCheckpoint, not persist(): CacheManager would match the
    # canonicalized plan across INVOCATIONS and serve a previous
    # run's blocks — checkpoint blocks are per-invocation.
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    deduped = (
        kept.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .drop("__rk")
        .localCheckpoint(eager=True)
    )

    # 4: drop documents sharing any n-gram with the eval set
    clean_ids = (
        quality.decontaminate(deduped, eval_df, ngram, text_col, id_col)
        .where(~F.col("contaminated"))
        .select(id_col)
    )
    survivors = deduped.join(clean_ids, id_col, "left_semi")

    # 5: content-addressed split over the (id, n_tokens) survivors
    return sampling.hash_split(
        survivors.select(id_col, "n_tokens"),
        id_col,
        CORPUS_SPLITS,
        seed=CORPUS_SPLIT_SEED,
    ).select(id_col, "split", "n_tokens")


def _drift_vocab_join(
    docs_a: DataFrame, docs_b: DataFrame, text_col: str
):
    """Shared core of the drift report and its drill-down: the two
    slices collapsed to (token, c_a, c_b) via one partial-aggregated
    explode each, FULL OUTER joined and checkpointed (each corpus read
    exactly once however many aggregates follow — the triangle-
    counting lesson), plus the totals 1-row frame and the p/q/m
    probability expressions. ONE definition, so tokenization or
    JS-term fixes cannot drift between the two consumers."""
    from parquet_combiner_spark.functions.text import tokens

    def vocab(df: DataFrame, side: str) -> DataFrame:
        return (
            df.select(
                F.explode(tokens(F.lower(F.col(text_col)))).alias("w")
            )
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias(f"c_{side}"))
        )

    joined = (
        vocab(docs_a, "a")
        .join(vocab(docs_b, "b"), "w", "full_outer")
        .localCheckpoint(eager=True)
    )
    totals = joined.agg(
        F.sum("c_a").cast("double").alias("__na"),
        F.sum("c_b").cast("double").alias("__nb"),
        F.count(F.col("c_a")).alias("vocab_a"),
        F.count(F.col("c_b")).alias("vocab_b"),
        F.count(
            F.when(F.col("c_a").isNotNull() & F.col("c_b").isNotNull(), 1)
        ).alias("vocab_both"),
        F.count(F.lit(1)).alias("vocab_union"),
    )
    ca = F.coalesce(F.col("c_a"), F.lit(0)).cast("double")
    cb = F.coalesce(F.col("c_b"), F.lit(0)).cast("double")
    p = ca / F.col("__na")
    q = cb / F.col("__nb")
    m = (p + q) / 2
    return joined, totals, ca, cb, p, q, m


def corpus_drift_report(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Distribution-shift report between two corpus slices (crawl
    snapshots, sources, time windows) — the drift monitor a
    continuously-ingesting training pipeline runs before mixing new
    data in: one row with

    - ``n_tokens_a/b``, ``vocab_a/b`` — volume and lexical size,
    - ``vocab_jaccard`` — vocabulary overlap,
    - ``js_divergence`` — Jensen-Shannon divergence (natural log)
      between the two unigram distributions over the UNION
      vocabulary. JS needs no smoothing (a side's zero terms
      contribute 0 and the mixture M is positive wherever either
      side is), is symmetric, and is bounded by ln 2 — a stable
      dashboard number where KL explodes on any novel token.

    Plan shape at 100 TB: each slice collapses to its Zipf-bounded
    (token, count) table via one partial-aggregated explode, the two
    tables FULL OUTER join on the token, and that vocabulary-sized
    frame is checkpointed ONCE — each corpus is read exactly once
    however many aggregates follow (the triangle-counting lesson:
    multi-consumer frames otherwise replicate their whole subtree).
    The totals ride back as a broadcast 1-row frame; the report is a
    single 1-row aggregation."""
    joined, totals, ca, cb, p, q, m = _drift_vocab_join(
        docs_a, docs_b, text_col
    )
    kl_pm = F.sum(F.when(ca > 0, p * F.log(p / m)))
    kl_qm = F.sum(F.when(cb > 0, q * F.log(q / m)))
    return (
        joined.crossJoin(F.broadcast(totals))
        .groupBy(
            "__na", "__nb", "vocab_a", "vocab_b",
            "vocab_both", "vocab_union",
        )
        .agg(
            F.round((kl_pm + kl_qm) / 2, 6).alias("js_divergence")
        )
        .select(
            F.col("__na").cast("long").alias("n_tokens_a"),
            F.col("__nb").cast("long").alias("n_tokens_b"),
            "vocab_a",
            "vocab_b",
            F.round(
                F.col("vocab_both") / F.col("vocab_union"), 4
            ).alias("vocab_jaccard"),
            "js_divergence",
        )
    )


def corpus_drift_movers(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """Token-level drill-down for :func:`corpus_drift_report`: the
    ``top_k`` tokens contributing most to the divergence, ranked by
    each token's JS contribution — the "WHAT changed" a drift alarm
    needs before anyone acts on it. Output: (token, p_a, p_b,
    js_contribution), contribution descending with token tiebreak.

    Same plan as the report (two vocab aggs + one vocab-sized full
    outer join) with a TakeOrderedAndProject top-k instead of the
    final fold — never a global sort."""
    joined, totals, ca, cb, p, q, m = _drift_vocab_join(
        docs_a, docs_b, text_col
    )
    contrib = (
        F.coalesce(F.when(ca > 0, p * F.log(p / m)), F.lit(0.0))
        + F.coalesce(F.when(cb > 0, q * F.log(q / m)), F.lit(0.0))
    ) / 2
    return (
        joined.crossJoin(F.broadcast(totals))
        .select(
            F.col("w").alias("token"),
            F.round(p, 6).alias("p_a"),
            F.round(q, 6).alias("p_b"),
            F.round(contrib, 6).alias("js_contribution"),
        )
        .orderBy(F.desc("js_contribution"), "token")
        .limit(top_k)
    )
