"""Scaling-curve guard (VERDICT r5 #3): pins the committed
BENCH_SCALING.json — per-query wall time at sf0.01/0.1/1 (sf1
synthesized by tools/synth_scale.py) — against declared scaling
exponents. The artifact is regenerated with tools/bench_scaling.py
(never concurrently with pytest); this test is pure file reading, so
the guard is deterministic in CI while the measurement stays a
deliberate, documented act.

The exponent is the sf0.1→sf1 slope log10(t_1/t_0.1): ~1.0 = linear,
fixed per-job overhead pulls it below, shuffle-log factors push it
slightly above. DEFAULT_BOUND 1.0 is deliberately tight at this scale —
every audited query except the declared-quadratic one measured ≤ 0.6.
"""

from __future__ import annotations

import json
import os

DEFAULT_BOUND = 1.0
DECLARED = {
    # exact within-block pairwise over a FIXED label vocabulary is
    # Θ(Σ|block|²) by contract (see the query docstring); the scale
    # path is dedup_semantic_semdedup (adaptive sign-LSH cells), whose
    # slope the default bound pins.
    "dedup_embedding_neardup_pairs": 2.1,
}

_ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_SCALING.json",
)


def test_no_headline_query_scales_worse_than_declared():
    with open(_ARTIFACT) as f:
        art = json.load(f)
    assert art["sfs"] == ["0.01", "0.1", "1"]
    offenders = {
        q: rec["slope_0.1_to_1"]
        for q, rec in art["queries"].items()
        if rec["slope_0.1_to_1"] > DECLARED.get(q, DEFAULT_BOUND)
    }
    assert not offenders, (
        f"super-linear scaling beyond declared exponents: {offenders} — "
        "either a real plan regression (fix it) or a newly measured "
        "quadratic contract (declare it here WITH a docstring argument)"
    )


def test_scaling_audit_covers_the_pairwise_family():
    """The audit must keep covering the queries whose candidate
    generation COULD go quadratic — removing them from the bench list
    would silently retire the guard."""
    with open(_ARTIFACT) as f:
        art = json.load(f)
    must_cover = {
        "dedup_minhash_lsh_pairs",
        "dedup_ngram_jaccard_pairs",
        "dedup_embedding_neardup_pairs",
        "dedup_semantic_semdedup",
        "market_basket_lift_pairs",
    }
    assert must_cover <= set(art["queries"])


def test_scaling_audit_covers_the_mutation_family():
    """VERDICT r6 #3: the rewrite paths' O(added)-metadata and
    O(rewritten-bytes) lineage claims must stay MEASURED — CoW update,
    MERGE, compaction, identity changelog, streaming CDC drain, and
    the r7 deletion-vector delete."""
    with open(_ARTIFACT) as f:
        art = json.load(f)
    must_cover = {
        "lakehouse_cow_update",
        "lakehouse_merge_upsert",
        "lakehouse_compaction_roundtrip",
        "lakehouse_changelog_row_level_pairs",
        "streaming_cdc_row_lineage_feed",
        "lakehouse_dv_delete",
        # r8: defaults, variant shredding, BPE loop, NDV analyze,
        # partition-stats sidecars
        "lakehouse_default_column_backfill",
        "lakehouse_variant_shredded_scan",
        "tokenizer_bpe_merge_training",
        "lakehouse_ndv_table_statistics",
        "lakehouse_partition_stats_file",
        # r9: upsert sink, encryption, grid spatial join, MV refresh
        "streaming_upsert_latest_state_replay",
        "lakehouse_encrypted_table_mutations",
        "geo_grid_partitioned_spatial_join",
        "lakehouse_materialized_view_incremental",
        # r10: PME, join/min-max MVs, ordered/patch upserts, SQL views
        "lakehouse_pme_encrypted_projection_mutations",
        "lakehouse_mv_join_two_delta_refresh",
        "lakehouse_mv_minmax_group_recompute",
        "streaming_upsert_out_of_order_replay",
        "streaming_upsert_partial_column_patch",
        "lakehouse_sql_view_catalog",
        # r11: REST interop, MV routing/filter, eq-delete coalesce
        "lakehouse_rest_catalog_http_read",
        "lakehouse_mv_filtered_avg_refresh",
        "lakehouse_mv_query_routing",
        "streaming_upsert_eq_debt_coalesce",
    }
    assert must_cover <= set(art["queries"])


def test_semantic_dedup_cells_adapt_to_corpus_size():
    """The scale-path fix the audit forced: sign-LSH plane count grows
    with the corpus (constant cell occupancy), floored at 8 so the
    driver SFs keep their exact historical cells."""
    from apache_iceberg_exploration_spark.operators.similarity import (
        adaptive_n_planes,
    )

    assert adaptive_n_planes(200) == 8
    assert adaptive_n_planes(2_000) == 8
    assert adaptive_n_planes(20_000) == 12
    assert adaptive_n_planes(1_000_000) == 17
    assert adaptive_n_planes(10**9) == 24  # capped
    # monotone, never below the floor
    prev = 8
    for n in (10, 10**3, 10**5, 10**7, 10**9):
        cur = adaptive_n_planes(n)
        assert cur >= prev
        prev = cur


def test_scaling_audit_covers_the_late_r8_families():
    """Geometry scans must stay pruning-bound and the selection model
    linear in tokens — measured, not argued."""
    with open(_ARTIFACT) as f:
        art = json.load(f)
    must_cover = {
        "lakehouse_geo_bbox_pruned_scan",
        "lakehouse_geo_knn_window_probes",
        "training_dsir_target_selection",
        "training_mix_apportionment",
    }
    assert must_cover <= set(art["queries"])
