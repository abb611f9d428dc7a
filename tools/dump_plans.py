#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of representative
headline queries, as evidence of the scale properties the engine claims
(pushdown, broadcast strategy, partial aggregation, top-k).

Usage: python tools/dump_plans.py [> PLANS.md is done by the script]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    ("flagship_daily_order_volume", "partial agg before the exchange; 2-column scan"),
    ("filter_open_orders", "predicates + projection pushed to the parquet scan"),
    ("star_join_revenue_by_nation", "all dimension joins broadcast; no sort-merge"),
    ("join_order_revenue_topk", "aggregate -> TakeOrderedAndProject -> k-row broadcast join"),
    ("nation_pair_trade_flows", "4 broadcast dims; single shuffled fact-fact join"),
    ("topk_orders_by_price", "TakeOrderedAndProject (per-partition heaps)"),
    ("docs_prep_pipeline", "score+filter map-side; md5-fingerprint-keyed dedup window (text pruned from the exchange; map-side WindowGroupLimit) + agg = two narrow shuffles"),
    ("composite_pk_order_details", "2-column composite-key shuffled hash join"),
    ("near_dup_pairs_verified", "shingle inverted-index equi-join; no cartesian"),
    ("ann_topk_ivf", "driver-constant centroids; inverted-list equi-join; window top-k"),
    ("ann_topk_lsh", "broadcast query buckets; ONE exchange (repartition on query_id) serves dedup-agg + top-k window"),
    ("training_mixture_sample", "pure map-side deterministic sampling; no shuffle, no state"),
    ("training_sequence_packing", "one cumulative-sum window per stream key; chunk math map-side"),
    ("salted_join_skewed_events", "hot key spread over (skew_key, __salt); dim exploded per salt; shuffle join by design"),
    ("timeseries_topk_blocked", "PAA+LSH blocked pair generation: equi-join on (band_id, block_key), no nested-loop"),
    ("minhash_near_dup_pairs", "banded equi-join on 64-bit keys; Arrow signature fold behind one reused exchange"),
    ("northwind_category_supplier_star", "real-Northwind star: all dims broadcast around the order_details fact"),
    ("ann_topk_lsh_int", "portable integer-plane twin: same one-exchange broadcast-bucket plan as ann_topk_lsh"),
    ("simhash_near_dup_md5", "md5 SimHash: map-side sketch; 12-bit-block equi-join; no cartesian"),
    ("correlated_small_quantity_revenue", "Q17 correlated subquery DECORRELATED: per-part aggregate joined back, no per-row re-execution"),
    ("train_split_by_user", "group-cohesive split: map-side md5 label; one 3-group partial agg"),
    ("docs_chunk_windows", "sliding-window chunking: map-side posexplode only, zero shuffles"),
    ("fakestream_source_read", "custom Python DataSource scan: partition-parallel Arrow batches"),
    ("range_join_error_windows", "no-equi-key range join rewritten as a time-bin bucket equi-join; no nested-loop"),
    ("docs_repetition_stats", "Gopher repetition gates: zero shuffles, pure map-side k-gram folds"),
    ("docs_reputation_filter", "corpus-level source stats broadcast back as an anti-join; fact side never shuffles"),
    ("incremental_near_dup_md5", "new batch probes the band index by equi-join; old text re-read only for candidates (semi join)"),
    ("ann_topk_pq", "PQ ADC: compressed-code scan x broadcast query LUTs; bounded exact re-rank join"),
    ("docs_exact_dedup_canonical", "exact dedup keyed on a map-side md5 fingerprint; no exchange partitions on raw text"),
    ("fakestream_fraud_scores", "closed-form trainer: ONE hash aggregate -> 1-row coefficient frame broadcast back (scalar-subquery shape)"),
    ("fraud_model_trained", "Newton/IRLS trainer: per step one 9-column exact aggregate over the checkpointed per-account frame + a 1-row Cramer solve; the iterative plan stays O(steps) deep, never corpus-deep"),
    ("sessionize_events_salted", "skew-safe two-phase sessionizer: phase-1 window partitions on (user_id, time-chunk) so no partition holds a hot key's full history; phase-2 renumbering runs on the chunk-level summary (bounded by time-range/chunk, independent of row skew)"),
    ("events_rollup_quantiles", "percentile continuous aggregate: partial count aggregation before every exchange (histogram bins are BIGINT counts), quantile serving is one window + group over bucket x key x bins cardinality — never a re-scan of events"),
    ("avro_debezium_envelope_decode", "nested Avro envelope: pure-expression Confluent strip + one Arrow mapInPandas decode, embarrassingly parallel"),
    ("events_rollup_incremental", "continuous aggregate: per-slice mergeable partial aggs unioned, one merge agg — counts/int-sums/min/max only, no raw rows past the first agg"),
    ("docs_search_pipeline", "BM25 candidates; gates SCOPED to 50 ids (broadcast semi-joins before per-doc work); only the gram doc-frequency pass stays corpus-wide"),
    ("docs_bpe_token_freq", "BPE encode: trained vocab frame (checkpointed by the merge loop) exploded + weighted count — vocabulary cardinality only"),
    ("running_total_by_customer_chunked", "skew-safe chunked-prefix-sum ledger: phase-1 running sum windows on (customer, 90-day chunk) so no partition holds a hot key's full history; the chunk-total summary (map-side-combined groupBy on the SAME partitioning) feeds a tiny per-key offset window; offsets join back on (key, chunk)"),
    ("fakestream_ledger_chunked", "the signed-leg ledger through the same chunked recomposition: transfer legs unioned map-side, then the three-stage chunk plan — bit-equal to the single-window ledger by the shared oracle"),
    ("events_value_anomalies_chunked", "skew-safe ROWS-bounded rolling stats: rolling = difference of two chunked prefix sums; the lagged prefix arrives by a splittable (key, rn-W) equi-join instead of an unsplittable sort"),
    ("running_total_by_customer_auto", "skew-aware dispatch: one pruned key-column probe (map-side-combined groupBy, memoized) picks the plain single-window plan here (uniform data) — the chunked recomposition only under a hot key"),
    ("ann_lsh_recall_audit", "recall audit: brute-force exact top-k (broadcast queries, one corpus scan) left-joined to the LSH candidate set — every missed neighbor a visible captured=0 row"),
    ("docs_bpe_encode", "corpus-scale BPE apply: posexplode + vocab equi-join + ordered aggregate — ONE wave whose shape is independent of merge depth"),
    ("docs_quality_model_holdout", "trained quality classifier: ONE feature-keyed count shuffle (map-side combine, <=dim output rows) trains; the <=dim-row model BROADCASTS onto the held-out token stream; one doc-keyed exact BIGINT sum scores"),
    ("ann_ivf_recall_audit", "IVF recall audit: exact brute-force top-5 truth left-joined to the int-centroid probe candidates — structural misses (unprobed lists) surface as captured=0 rows"),
    ("events_value_anomalies_auto", "skew-aware rolling-anomaly dispatch: pruned key probe picks the plain window at uniform data, the chunked prefix-sum recomposition under the inherent low-cardinality hot key"),
    ("sessionize_events_auto", "skew-aware sessionize dispatch: same probe/decide machinery; plain single-shuffle sessionizer here, two-phase salted recomposition under a hot key"),
    ("parts_bpe_encode_oov", "frozen-tokenizer OOV encode: vocab + merge-rule-segmented OOV words union into ONE lookup side; corpus side stays a single posexplode + equi-join + ordered aggregate wave, depth-independent"),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ultimate_data_engineering_project_spark.plans.catalog import queries
    from ultimate_data_engineering_project_spark.session import get_spark

    spark = get_spark(app_name="udep-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    out = [
        "# PLANS — physical-plan evidence (generated by tools/dump_plans.py)",
        "",
        f"Formatted Catalyst plans at `{sf_dir}` for representative headline",
        "queries. Regenerate after plan-affecting changes:",
        "`python tools/dump_plans.py`.",
        "",
    ]
    for name, why in QUERIES:
        df = qs[name](spark, sf_dir)
        s = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        # strip volatile noise: absolute locations and plan ids
        # the formatted plan prints "Location: InMemoryFileIndex(1)
        # [file:/abs/path]" — class name, a space, then the bracketed
        # path list; \S+ alone never reaches the bracket
        s = re.sub(
            r"Location: \S+(?:\([^)]*\))? ?\[[^\]]*\]",
            "Location: <fixture parquet>",
            s,
        )
        s = re.sub(r", \[plan_id=\d+\]", "", s)
        out.append(f"## {name}")
        out.append("")
        out.append(f"**Property shown:** {why}")
        out.append("")
        out.append("```")
        out.append(s.rstrip())
        out.append("```")
        out.append("")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(out)} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
