"""Driver-contract guards: the correctness harness verifies only a
bounded PREFIX (~50 entries) of the registry in insertion order, and the
bench harness runs the HEADLINE list by name — both break silently if a
refactor reorders imports or renames a query. These tests pin the
contract mechanically.

The prefix checks run in a FRESH subprocess: inside pytest the registry's
insertion order is polluted by whichever test module imported an operator
module first; the driver imports __spark_entry__ cold, which is the order
that matters."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from apache_iceberg_exploration_spark import registry

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import json, sys
sys.path.insert(0, %r)
from apache_iceberg_exploration_spark import registry
registry._load_all()
names = list(registry.all_queries())
oracles = set(registry.all_oracles())
print(json.dumps({"names": names, "oracled": [n in oracles for n in names]}))
"""


def _fresh_registry():
    out = subprocess.run(
        [sys.executable, "-c", _PROBE % _REPO],
        capture_output=True,
        text=True,
        timeout=120,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_driver_prefix_composition_and_oracles():
    """Cold-import registry order must lead with the reference-parity
    medallion queries, and every entry in the driver-verified ~50-prefix
    must carry a value-hash oracle (a no-oracle query in the prefix
    burns a verified slot on a weaker rows-only check)."""
    reg = _fresh_registry()
    assert reg["names"][:5] == [
        "bronze_ingest_customer",
        "incremental_extract_events",
        "silver_dedup_fullrow",
        "silver_dedup_keyed",
        "gold_customer_agg",
    ], reg["names"][:5]
    missing = [
        n
        for n, ok in zip(reg["names"][:50], reg["oracled"][:50])
        if not ok
    ]
    assert not missing, missing


def test_bench_headline_names_resolve():
    """bench.py's HEADLINE list must reference only registered queries —
    a typo otherwise crashes the driver's per-round bench run."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    qs = registry.all_queries()
    unknown = [n for n in bench.HEADLINE if n not in qs]
    assert not unknown, unknown
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicates"


def test_every_oracle_names_registered_query():
    qs = registry.all_queries()
    extra = [n for n in registry.all_oracles() if n not in qs]
    assert not extra, extra


# The EXACT driver-verified prefix (r04 composition, frozen): any
# insertion before position 50 silently changes which queries the
# driver's CORRECTNESS harness checks. New @query registrations belong
# in late-loading modules (see registry._load_all); impls may live in
# their family file and register late (corpus.py shows the pattern).
_FROZEN_PREFIX_50 = [
    'bronze_ingest_customer',
    'incremental_extract_events',
    'silver_dedup_fullrow',
    'silver_dedup_keyed',
    'gold_customer_agg',
    'gold_duplicate_audit',
    'row_count_orders',
    'latest_event_per_user',
    'medallion_pipeline_e2e',
    'dq_expectations_report',
    'dq_volume_anomaly_scan',
    'dq_referential_integrity_audit',
    'dq_uniqueness_audit',
    'dq_benford_first_digit',
    'dq_order_total_reconciliation',
    'dedup_exact_documents',
    'dedup_minhash_lsh_pairs',
    'dedup_ngram_jaccard_pairs',
    'dedup_simhash_fingerprint',
    'dedup_simhash_clusters',
    'dedup_embedding_neardup_pairs',
    'dedup_cluster_assignment',
    'dedup_survivor_selection',
    'dedup_jaccard_df_capped',
    'ann_cosine_topk_bruteforce',
    'ann_ivf_probe_topk',
    'similarity_knn_join_blocked',
    'embedding_quantize_int8',
    'ann_batch_topk',
    'ann_kmeans_cells',
    'embedding_centroid_per_label',
    'ann_pq_adc_topk',
    'ann_rp_lsh_topk',
    'hard_negative_mining',
    'ann_sq_rerank_topk',
    'embedding_random_projection_jl',
    'ann_ivf_recall_eval',
    'embedding_norm_qa_outliers',
    'dedup_semantic_semdedup',
    'incremental_dedup_lakehouse',
    'dedup_incremental_minhash_lsh',
    'dedup_minhash_estimator_calibration',
    'dedup_cluster_size_distribution',
    'lakehouse_merge_upsert',
    'lakehouse_merge_delete',
    'lakehouse_time_travel',
    'lakehouse_compaction_roundtrip',
    'lakehouse_incremental_read',
    'lakehouse_partitioned_scan',
    'lakehouse_incremental_gold_refresh',
]


def test_driver_prefix_exact_composition():
    reg = _fresh_registry()
    assert reg["names"][:50] == _FROZEN_PREFIX_50, (
        "driver-verified prefix shifted: first diff at position "
        + str(next(i for i, (a, b) in enumerate(
            zip(reg["names"][:50], _FROZEN_PREFIX_50)) if a != b))
    )
