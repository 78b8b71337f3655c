#!/usr/bin/env python
"""Scaling-curve audit (VERDICT r5 #3): run a representative headline
subset at sf0.01 / sf0.1 / sf1 (the last synthesized locally by
tools/synth_scale.py) and record per-query wall time + the measured
scaling exponent into BENCH_SCALING.json.

The exponent of interest is the sf0.1 → sf1 slope
``log10(t_sf1 / t_sf0.1)`` (one decade of data): linear work measures
~1.0, shuffle-log factors push it slightly above, and per-job fixed
overhead (JVM scheduling, plan compilation — seconds-scale constants at
these tiny SFs) pulls it BELOW 1. Anything materially above ~1.2 is a
super-linear red flag: a pair-blowup in a band join, an accidental
quadratic. tests/test_scaling_curve.py pins the committed artifact
against the declared exponent bound.

Run: python tools/bench_scaling.py   (regenerates sf1 if absent)
NEVER run concurrently with pytest (32-core contention poisons it).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# representative spread: TPC-H aggregation/join shapes, medallion,
# window/top-k, the whole pairwise-dedup family (the queries whose
# candidate generation COULD go quadratic — the audit's main targets,
# VERDICT r5 flagged the band joins and the basket self-join), ANN,
# text/tokenize, training-prep prefix sums.
QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q18_large_volume_customers",
    "gold_customer_agg",
    "silver_dedup_keyed",
    "topk_orders_per_segment",
    "dedup_exact_documents",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_pairs",
    "dedup_simhash_fingerprint",
    "dedup_embedding_neardup_pairs",
    "dedup_semantic_semdedup",
    "ann_cosine_topk_bruteforce",
    "ann_ivf_probe_topk",
    "tfidf_top_terms",
    "pack_concat_chunks",
    "contamination_ngram_overlap",
    "market_basket_lift_pairs",
    # mutation family (VERDICT r6 #3): the rewrite paths — CoW update,
    # MERGE upsert, compaction round-trip, identity-keyed changelog,
    # streaming CDC drain, deletion-vector delete. Their O(added)
    # metadata + O(rewritten-bytes) lineage carry claims are MEASURED
    # here, not argued; commit machinery is a fixed cost, so slopes
    # should sit well below 1 until data dominates.
    "lakehouse_cow_update",
    "lakehouse_merge_upsert",
    "lakehouse_compaction_roundtrip",
    "lakehouse_changelog_row_level_pairs",
    "streaming_cdc_row_lineage_feed",
    "lakehouse_dv_delete",
    # r8 family: default-column lifecycle (per-file gap fill at read +
    # write-default materialization), variant shredded scan (JSON
    # encode + stats prune), the K-round BPE merge loop (word-TYPE
    # dictionary — slope should sit well below 1), incremental NDV
    # analyze, partition-stats sidecar serving.
    "lakehouse_default_column_backfill",
    "lakehouse_variant_shredded_scan",
    "tokenizer_bpe_merge_training",
    "lakehouse_ndv_table_statistics",
    "lakehouse_partition_stats_file",
    # late r8: geometry columns (band build is linear; the scan side
    # must stay pruning-bound) and training-data selection (explode +
    # broadcast-share model — linear in tokens).
    "lakehouse_geo_bbox_pruned_scan",
    "lakehouse_geo_knn_window_probes",
    "training_dsir_target_selection",
    "training_mix_apportionment",
    # r9: streaming upsert (equality-delete commits — fixed streaming
    # machinery + O(batch) data, slope well below 1), encryption
    # (AES-GCM per byte — linear), grid spatial join (cell-keyed
    # equi-join — linear in points + covered cells), MV incremental
    # refresh (changelog slice + O(groups) merge).
    "streaming_upsert_latest_state_replay",
    "lakehouse_encrypted_table_mutations",
    "geo_grid_partitioned_spatial_join",
    "lakehouse_materialized_view_incremental",
    # r10: PME encryption (per-column AES — linear like the envelope),
    # join-MV two-delta refresh (broadcast delta joins — linear in the
    # base scans), min/max MV (scoped recompute — linear in touched
    # groups' mass), ordered upsert replay (key-scoped lookup — bounded
    # by candidate files), patch completion (same lookup + batch
    # rewrite), SQL views (pure metadata over a linear scan).
    "lakehouse_pme_encrypted_projection_mutations",
    "lakehouse_mv_join_two_delta_refresh",
    "lakehouse_mv_minmax_group_recompute",
    "streaming_upsert_out_of_order_replay",
    "streaming_upsert_partial_column_patch",
    "lakehouse_sql_view_catalog",
    # r11: REST-catalog resolution + plain-parquet client read (linear
    # in the served file list's data), filtered-avg join MV (two-delta,
    # linear in changed rows), MV query routing (MV-sized storage
    # re-agg — sub-linear by design), eq-delete debt coalesce (one
    # seq-scoped semi-join pass over candidate files — linear).
    "lakehouse_rest_catalog_http_read",
    "lakehouse_mv_filtered_avg_refresh",
    "lakehouse_mv_query_routing",
    "streaming_upsert_eq_debt_coalesce",
]

SFS = [
    ("0.01", "/root/testdata/sf0.01"),
    ("0.1", "/root/testdata/sf0.1"),
    ("1", "/tmp/synthdata/sf1"),
]
PASSES = 2  # min-of-2 per (query, sf)


def main() -> None:
    from apache_iceberg_exploration_spark import registry
    from apache_iceberg_exploration_spark.session import get_spark

    registry._load_all()
    spark = get_spark(app_name="bench-scaling")
    if not os.path.isdir(SFS[-1][1]):
        from tools.synth_scale import synthesize

        synthesize(spark, 10, "/root/testdata/sf0.1", SFS[-1][1])

    # warmup: absorb JVM/codegen startup
    registry._REGISTRY["q1_pricing_summary"].fn(spark, SFS[0][1]).count()

    times: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    for sf, sf_dir in SFS:
        for q in QUERIES:
            fn = registry._REGISTRY[q].fn
            best = math.inf
            for _ in range(PASSES):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            times[q][sf] = round(best, 3)
            print(f"sf{sf} {q}: {times[q][sf]}s", flush=True)

    out = {
        "sfs": [s for s, _ in SFS],
        "passes": PASSES,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "queries": {},
    }
    for q in QUERIES:
        t01, t1 = times[q]["0.1"], times[q]["1"]
        slope = round(math.log10(max(t1, 1e-3) / max(t01, 1e-3)), 3)
        out["queries"][q] = {
            "sec": times[q],
            "slope_0.1_to_1": slope,
        }
    worst = max(
        out["queries"].items(), key=lambda kv: kv[1]["slope_0.1_to_1"]
    )
    out["worst_slope"] = {
        "query": worst[0],
        "slope": worst[1]["slope_0.1_to_1"],
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SCALING.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out["worst_slope"]))
    print("wrote", path)


if __name__ == "__main__":
    main()
