#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``
Each query is fully materialized via the noop sink (no driver-side
collect of the data itself).

Noise posture: per-query MEDIAN of 3 measured runs (after a warm-up
pass). Single-run variance on a shared 32-thread box is ~±10-30%
(GC, page cache, JIT recompiles, noisy neighbors) and has twice
produced phantom regressions on unchanged code; the median of 3 is
robust to one bad run in either direction, which best-of-2 was not.

Materialization: each measured run writes to the NOOP sink, which
evaluates EVERY output column. The ``count()`` action used through
round 6 let Catalyst prune computed columns that no aggregate
consumed, so narrow-map queries (doc_quality, doc_token_stats, …)
were partially measuring a pruned scan; round-7+ numbers are honest
and therefore not strictly comparable to earlier rounds for those
lines (measured skew at sf0.1 is small — doc_quality 1.61s count vs
1.75s noop — but the principle stands).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "top_parts_per_supplier",
    "pricing_summary",
    "supplier_stats",
    "orders_with_customer",
    "returnflag_counts_salted",
    "earliest_event_per_user",
    "user_sessions",
    # lag-window vs built-in session_window batch formulations
    "user_sessions_native",
    # the applyInPandasWithState path: Arrow batches through Python
    # state — the one headline plan whose cost is NOT JVM codegen
    "user_sessions_stream",
    # ...and the JVM-native streaming session aggregation it races
    "user_sessions_stream_native",
    "user_bucket_top_events",
    "minhash_near_dup_pairs",
    "simhash_near_dup_pairs",
    # the exact inverted-index pair join, measured under its OWN name
    # (near_dup_clusters consumes the same join via the shared cache)
    "ngram_jaccard_pairs",
    "near_dup_clusters",
    # the O(log n)-round connected-components formulation, same graph
    "near_dup_clusters_logstar",
    # iterative algorithm #2: 5 synchronous power-iteration rounds
    # over the same cached pair graph
    "doc_graph_pagerank",
    # seeded-teleport variant: same warm pair cache, same iteration count
    "doc_graph_ppr",
    "doc_pack_sequences",
    "ann_cosine_topk",
    "embedding_near_dup_pairs",
    "doc_quality",
    # round-7 additions: repetition filter (interpreted-HOF narrow
    # map), decontamination (explode + broadcast join), CDC compaction
    # (partial-aggregated max_by), conditional pivot, and the
    # stream-stream interval join (stateful streaming cost)
    "doc_repetition_stats",
    "doc_decontaminate",
    "current_user_state",
    "user_event_matrix",
    "purchases_after_error_interval_stream",
    # multi-way join pipelines (TPC-H Q3/Q5/Q18/Q21 shapes)
    "shipping_priority",
    "local_supplier_volume",
    "large_volume_customers",
    # the double-correlation semi+anti pipeline (two lineitem self-joins)
    "sole_return_suppliers",
    # the as-of join both ways: JVM union+window vs cogrouped pandas
    # merge_asof — the custom-operator overhead, measured
    "purchase_attribution_asof",
    "purchase_attribution_asof_pandas",
    # the composed five-stage corpus-preparation pipeline
    "corpus_prep",
    # unigram LM scoring: explode -> broadcast vocab -> re-aggregate
    "doc_unigram_logprob",
    # round-8 additions: CDC apply with tombstones (multi-batch
    # streaming MERGE incl. deletes), the BPE encoder (pure codegen
    # replace-chain projection), and the update-mode windowed top-N
    # (per-trigger foreachBatch MERGE)
    "current_user_state_with_deletes_stream",
    "doc_bpe_tokens",
    "windowed_top_events_update_stream",
    # stream-stream outer join (watermark-gated null emission) and
    # the degree-ordered triangle count over the cached pair graph
    "purchases_with_errors_outer_stream",
    "doc_graph_triangles",
    # streaming dedup under 2x redelivery (per-band duplicate files
    # through dropDuplicatesWithinWatermark) and the basket self-join
    # behind association rules
    "events_dedup_stream",
    "event_association_rules",
    # hybrid retrieval: exact-cosine pool + BM25 pool + RRF fusion in
    # one plan (subsumes the standalone BM25 line)
    "hybrid_rrf_topk",
    # round-9 additions: substring-level span removal (postings
    # aggregate + islands), the sort-free budget selector with its
    # partition-safe boundary resolution, table-level MERGE INTO
    # (zone-map-pruned copy-on-write), the commit-log streaming
    # source, and two of the five new TPC-H shapes (Q2's window
    # decorrelation; Q9's five-join profit rollup)
    "doc_repeated_spans",
    "doc_token_budget_selection",
    "user_state_merge_into",
    "event_counts_cdf_stream",
    "min_cost_supplier",
    "product_type_profit",
    # the full-outer cell of the streaming join matrix (inner and
    # left-outer lines above): dual watermark-proof NULL gating
    "purchases_errors_full_outer_stream",
    # global training-order rank via the bucketed prefix count (the
    # sort-free permutation; one exchange — plan pinned)
    "doc_epoch_shuffle",
    # late round-9 additions: Bloom two-stage decontamination — at
    # this eval size the exact broadcast join is already cheap, so
    # the line MEASURES THE PREFILTER OVERHEAD (expected: within ~2x
    # of doc_decontaminate; the filter's win begins where the eval
    # gram table stops being broadcast-cheap — SCALE.md row) —
    # transition-aware bigram LM scoring, and the OPTIMIZE ZORDER +
    # zone-map-pruned scan over a txtable built in-line (the whole
    # lifecycle, not just the read)
    "doc_decontaminate_bloom",
    "doc_bigram_logprob",
    "events_zorder_pruned_scan",
    # round-10 additions: the classifier chain (15 GD aggregations to
    # train, then a plan-literal scoring projection), merge-on-read
    # DELETE (build + two DV commits + anti-filtered read — the line
    # measures the lifecycle), the Hive-partitioned txtable
    # (partition-pruned read over path-derived values), and the
    # metadata-only RENAME (mapped read across both file eras)
    "doc_quality_classifier_scores",
    "events_dv_delete_scan",
    "events_partitioned_scan",
    "events_renamed_column_scan",
    # round-11 additions: expression-predicate DML (a conjunctive
    # cow delete + an OR-predicate DV delete, lifecycle measured) and
    # merge-on-read UPDATE (DV + append in one commit, then a DV
    # delete landing on the update's own appended files)
    "events_expr_delete_scan",
    "events_dv_update_scan",
    # partition spec evolution: flat era + evolved Hive era, read
    # back through a listing-pruned partitioned scan
    "events_spec_evolution_scan",
    # string zone maps: lexicographic listing-prune on a
    # range-clustered string column
    "events_string_pruned_scan",
    # change data feed: cow delete + merge-on-read update with
    # recorded change files, then the O(changed rows) feed read
    "events_cdf_feed",
    # round-12 additions: pre-image UPDATE (dependent SETs in one
    # select — cow lifecycle), CDF from MERGE INTO (merge + the
    # reconstructed feed), the streaming CDF source riding a
    # mid-stream cdf DELETE, the benign-conflict rebase lifecycle
    # (DML losing its race to an injected disjoint append and
    # republishing with zero re-run jobs), string-led Z-order
    # (byte-prefix proxy clustering + lexicographic pruned read),
    # and bucket-transform partitioning (crc32 bucket dirs + the
    # Python-twin listing-pruned point read)
    "events_preimage_update_scan",
    "user_state_merge_cdf_feed",
    "events_cdf_stream_feed",
    "events_rebased_dml_scan",
    "events_zorder_string_scan",
    "events_bucket_transform_scan",
    # parquet bloom filter table property: build with per-row-group
    # bloom pages on the unclustered event_id, then a point-IN read —
    # r13: the read goes through the LISTING-level bloom sidecars
    # (files skipped before any footer opens)
    "events_bloom_point_scan",
    # r13 lifecycle lines: hidden-partition pruning (plain ts range
    # over a stats-free days(ts) layout) and bucket-set-pruned MERGE
    # (narrow batch rewrites only its buckets' directories)
    "events_hidden_partition_scan",
    "user_state_merge_bucketed",
    # zone-map property lifecycle: no-stats commit → backfilling
    # ALTER → auto-statted append → cross-era pruned read
    "events_stats_property_scan",
    # r14: GDPR IN-list delete pruned per-key through bloom sidecars
    # on an unclustered key (build + 2 deletes in-measurement)
    "events_point_set_delete_scan",
    # r14: co-bucketed storage-partitioned join — zero shuffle
    # Exchanges (build of both tables in-measurement)
    "user_state_join_cobucketed",
    # r15: storage-partitioned aggregation — per-bucket complete
    # groups, zero shuffle Exchanges incl. the count-distinct
    # (build of the bucketed table in-measurement; see "phases" in
    # bench_full.json for the build/read attribution)
    "user_state_agg_bucketed",
    # r15: semantic decontamination — one assignment matmul pass over
    # the corpus + a broadcast cell join against the eval suite
    "embedding_decontaminate",
    # r15: the FUSED storage-partitioned reporting query — raw facts
    # broadcast-joined to the co-bucketed dim and aggregated per user
    # inside the same per-bucket plan, zero shuffle Exchanges
    "user_state_join_agg_cobucketed",
    # r15: incremental MV maintenance across DML — base commit + full
    # view build + CDF-recorded MERGE + signed-delta refresh that
    # reads O(changed rows) change files, never the base
    "user_state_mv_cdf_refresh",
]

RUNS = 3


def _materialize(df) -> None:
    """Evaluate EVERY output column (noop sink). ``count()`` lets
    Catalyst prune computed columns no aggregate consumes — a narrow
    projection can bench 'faster' than it runs in production."""
    df.write.format("noop").mode("overwrite").save()


def _release_blocks(spark) -> None:
    """Unpersist every block still in the block manager. The
    iterative lines (`localCheckpoint(eager=True)` per graph round,
    txlog snapshot reads) leave executor-memory blocks behind until
    the driver happens to GC their RDD handles; over a 50-line
    session that accumulation taxes LATER measured lines with
    eviction/GC pressure that belongs to no line. Called outside the
    timed region, after each line's post hook — at that point the
    pair cache is empty (its own hooks clear it), so every surviving
    block is an orphan of an already-measured line."""
    import gc

    gc.collect()  # drop driver handles so unpersist isn't fought
    try:
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist()
    except Exception as e:  # noqa: BLE001 — diagnostics only
        sys.stderr.write(f"block release failed: {e}\n")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from parquet_combiner_spark.functions import clear_ngram_pair_cache
    from parquet_combiner_spark.session import get_spark

    spark = get_spark(app_name="bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]

    # ngram_jaccard_pairs and near_dup_clusters share a memoized pair
    # join; cleared before every run of EITHER so the expensive join is
    # attributed to the named line being measured (not to whichever
    # consumer ran first), and after each one's last run so the
    # persisted pair blocks don't compete for memory with later
    # measured queries.
    from parquet_combiner_spark.functions import _ngram_pairs_cached

    def warm_pairs() -> None:
        # pagerank's line measures the ITERATIONS, not the pair join
        # (already attributed to ngram_jaccard_pairs): every run starts
        # from a warm cache
        _ngram_pairs_cached(spark, sf_dir)

    pre_run = {
        "ngram_jaccard_pairs": clear_ngram_pair_cache,
        "near_dup_clusters": clear_ngram_pair_cache,
        "near_dup_clusters_logstar": warm_pairs,
        "doc_graph_pagerank": warm_pairs,
        "doc_graph_ppr": warm_pairs,
        "doc_graph_triangles": warm_pairs,
    }
    post_runs = {
        "ngram_jaccard_pairs": clear_ngram_pair_cache,
        "near_dup_clusters": clear_ngram_pair_cache,
        "near_dup_clusters_logstar": clear_ngram_pair_cache,
        "doc_graph_pagerank": clear_ngram_pair_cache,
        "doc_graph_ppr": clear_ngram_pair_cache,
        "doc_graph_triangles": clear_ngram_pair_cache,
    }

    # Warm run: JVM JIT + whole-stage-codegen compilation at the
    # smallest sibling SF so the measured numbers reflect steady-state
    # execution (what a long-running cluster sees), not one-time class
    # compilation. Derived from sf_dir's parent so a non-default
    # SPARK_GRAFT_SF_DIR still warms real data; falls back to sf_dir
    # itself. Warm-up failures are non-fatal but logged - a silent
    # no-op here would push compilation cost into the first
    # measurement.
    candidates = sorted(Path(sf_dir).resolve().parent.glob("sf*"))
    warm_dir = str(candidates[0]) if candidates else sf_dir
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    for name in names:
        try:
            _materialize(qs[name](spark, warm_dir))
        except Exception as e:  # noqa: BLE001
            sys.stderr.write(f"warm-up failed for {name} at {warm_dir}: {e}\n")
    clear_ngram_pair_cache()  # warm-up must not pre-pay a measured line
    _release_blocks(spark)  # ...nor leave its checkpoint blocks behind

    # phase attribution (VERDICT r14 #7): ~20 lifecycle lines build +
    # mutate + read a txtable as one number; the txlog phase clock
    # splits each run into time inside mutation verbs ("build") vs
    # everything else ("read") so future drift attributes to the
    # phase, not the key. bench_full.json only — the driver tail line
    # stays byte-compatible.
    from parquet_combiner_spark.tools import txlog

    timings: dict[str, float] = {}
    phases: dict[str, dict[str, float]] = {}
    for name in names:
        runs, builds, rows = [], [], 0
        for _ in range(RUNS):
            pre = pre_run.get(name)
            if pre is not None:
                pre()
            txlog.phase_clock_reset()
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            _materialize(df)
            runs.append(time.perf_counter() - t0)
            builds.append(txlog.phase_clock_seconds())
        rows = df.count()  # unmeasured; stderr diagnostics only
        post = post_runs.get(name)
        if post is not None:
            post()
        _release_blocks(spark)
        timings[name] = round(statistics.median(runs), 3)
        build_med = statistics.median(builds)
        if build_med >= 0.05:  # lifecycle lines only; pure reads skip
            phases[name] = {
                "build": round(build_med, 3),
                "read": round(max(timings[name] - build_med, 0.0), 3),
            }
        sys.stderr.write(
            f"{name}: median {timings[name]}s of "
            f"{[round(r, 3) for r in sorted(runs)]} ({rows} rows)"
            + (
                f" [build {phases[name]['build']}s / "
                f"read {phases[name]['read']}s]"
                if name in phases
                else ""
            )
            + "\n"
        )

    total = round(sum(timings.values()), 3)
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    # The full line above has grown past the driver's 2000-char tail
    # capture (BENCH_r11 recorded parsed=null because the line's head
    # scrolled out). Persist the per-query dict to a file for humans
    # and judges, then emit a compact headline — same metric/value, a
    # line-count instead of the per-query dict — as the FINAL stdout
    # line so any tail window parses it.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_full.json"),
            "w",
        ) as fh:
            json.dump(
                {
                    "metric": "headline_queries_total",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "phases": phases,
                    "sf": sf,
                },
                fh,
                indent=1,
            )
    except OSError:
        pass  # read-only checkout: stdout already has the full line
    # One compact JSON line PER KEY (VERDICT r15 "Next round" #2): the
    # driver's tail capture truncates the single long per-query dict
    # line, leaving PERF per_query/scaling empty. Per-key lines are
    # independently parseable, so whatever suffix of them fits the
    # tail window still attributes round-over-round. Additions only —
    # the full-dict line above and the final headline line below are
    # byte-identical to prior rounds.
    for name, sec in timings.items():
        print(json.dumps({"query": name, "sec": sec},
                         separators=(",", ":")))
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
