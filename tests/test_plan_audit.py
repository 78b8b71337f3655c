"""Fleet-wide plan lint: every registered batch query's physical plan is
swept for the anti-patterns that kill jobs at 100 TB — unbounded
cartesian products and row-at-a-time Python evaluation. One test, whole
registry: a regression anywhere in the operator surface fails here
without needing a per-query assertion.

Skipped classes (with reasons, not silently):
- lakehouse_* / streaming_* / stateful_user_profile materialize side
  effects (scratch tables, stream runs) at call time — their plan
  correctness is covered by their own tests;
- the two multimodal mapInPandas kernels are the SANCTIONED Arrow
  boundary, so they are exempted from the no-Python rule but still
  checked for cartesian products.
"""

from __future__ import annotations

from apache_iceberg_exploration_spark import registry
from apache_iceberg_exploration_spark.plans import executed_plan
from apache_iceberg_exploration_spark.plans.explain import (
    unpartitioned_windows,
)

from .conftest import SF_SMOKE

# queries whose invocation runs jobs/side effects rather than returning a
# lazy plan; each has dedicated coverage elsewhere
_EFFECTFUL_PREFIXES = ("lakehouse_", "streaming_")

# Arrow-batched Python is the sanctioned boundary for these
_PYTHON_ALLOWED = {
    "multimodal_decode_features",
    "multimodal_thumbnail_digest",
    "multimodal_audio_chunks",  # row-expanding Arrow kernel (r3)
    # pHash dedup's decode+hash kernel is the justified binary boundary
    # (r5); the band join / Hamming verify around it stay JVM-side
    "multimodal_phash_neardup_pairs",
    # the UDTF API-surface demo is Python BY DESIGN (COVERAGE §2.10);
    # its docstring points hot paths at the explode-based equivalent
    "udtf_sentence_offsets",
    # Jaro-Winkler has no JVM builtin: the Arrow-batched scorer runs
    # AFTER dictionary dedup + blocking (test_plans asserts the
    # ordering), so Python only ever sees the surviving pair table
    "fuzzy_match_jaro_winkler",
}


def _auditable():
    for name, fn in registry.all_queries().items():
        if name.startswith(_EFFECTFUL_PREFIXES):
            continue
        yield name, fn


# Queries allowed an UNPARTITIONED window — each one's window input is
# provably bounded BEFORE the window (never the raw table), so the
# single WindowExec partition holds a constant-ish number of rows:
_GLOBAL_WINDOW_ALLOWED = {
    # two-phase distributed prefix sum: window runs over the per-bucket
    # aggregate (rows == shuffle-partition/bucket count)
    "pack_concat_chunks",
    "token_balanced_shards",
    # bin-bounded: window over the histogram's fixed bin relation
    "histogram_merge_rollup",
    # k-bounded: row_number over the LIMIT k centroid-init head
    "ann_kmeans_cells",
    "ann_ivf_probe_topk",
    "ann_ivf_incremental_assign",
    "ann_ivf_recall_eval",
    # V-bounded: rank/cumsum AFTER .limit(VOCAB_TOPV) (TakeOrdered)
    "vocab_coverage_topv",
    # |charset|²-bounded: rank over the character-pair count relation
    "bpe_merge_pair_counts",
    # PATH_TOPN-bounded: rank AFTER .limit() (TakeOrdered)
    "sessionize_event_paths",
    # top-N-bounded: rank AFTER .limit() (TakeOrdered) — same pattern
    "graph_link_prediction_common_neighbors",
    "data_skew_diagnostics",
    # k-bounded: Kendall-τ ranks run over the two top-k result sets
    "retrieval_scorer_rank_agreement",
    # calendar-bounded: rolling/cumulative frames over per-day series
    "dq_volume_anomaly_scan",
    "timeseries_stl_decompose_weekly",
    # fixed-cardinality relations: 9 digits / |sources| / |levels|²
    "dq_benford_first_digit",
    "domain_token_mix",
    "chi_square_independence_test",
    # TOPK-bounded: row_number AFTER .limit(100) (TakeOrdered)
    "training_dsir_target_selection",
    # |sources|-bounded: remainder rank over the per-source aggregate
    "training_mix_apportionment",
}


def test_no_cartesian_products_or_python_rows_anywhere(spark):
    bad_cartesian, bad_python, bad_window = [], [], []
    for name, fn in _auditable():
        df = fn(spark, SF_SMOKE)
        plan = executed_plan(df)
        if "CartesianProduct" in plan:
            bad_cartesian.append(name)
        if name not in _PYTHON_ALLOWED and (
            "BatchEvalPython" in plan  # row-at-a-time UDF/UDTF
            or "ArrowEvalPython" in plan
            or "MapInPandas" in plan
        ):
            bad_python.append(name)
        if name not in _GLOBAL_WINDOW_ALLOWED:
            w = unpartitioned_windows(df)
            if w:
                bad_window.append((name, w[0]))
    assert not bad_cartesian, f"unbounded cross joins: {bad_cartesian}"
    assert not bad_python, f"Python row evaluation: {bad_python}"
    # an unpartitioned window funnels its whole input through ONE task;
    # allowed only behind a LIMIT/bounded aggregate (allowlist above)
    assert not bad_window, f"single-partition windows: {bad_window}"


def test_no_hardcoded_probe_entity_ids():
    """VERDICT r7 nit #2 as a fleet lint: the sf0.1 sweep caught a
    vacuous green where a hard-coded probe doc id hit an empty band
    bucket at another scale factor (dedup_minhash_topk_lookup, fixed
    to select its probe FROM the data). No registry query source may
    equality-compare a known entity-id column to an integer literal —
    probes must be data-derived. (Modulo-arithmetic slicing like
    ``c_custkey % 5 == 0`` partitions ALL ids and is fine; the lint
    targets point lookups of one specific row.)"""
    import glob as _glob
    import os as _os
    import re as _re

    pkg = _os.path.join(
        _os.path.dirname(
            _os.path.dirname(_os.path.abspath(__file__))
        ),
        "apache_iceberg_exploration_spark",
    )
    id_cols = r"(doc_id|vec_id|c_custkey|o_orderkey|user_id|s_suppkey|p_partkey)"
    pats = [
        # F.col("doc_id") == 123  (no modulo/arith between col and ==)
        _re.compile(
            rf'F\.col\(["\']{id_cols}["\']\)\s*==\s*(F\.lit\()?\d+\b'
        ),
        # SQL: WHERE doc_id = 123 / AND vec_id = 45
        _re.compile(rf"(WHERE|AND|ON)\s+{id_cols}\s*=\s*\d+\b"),
    ]
    offenders = []
    for path in _glob.glob(_os.path.join(pkg, "**", "*.py"), recursive=True):
        src = open(path).read()
        for pat in pats:
            for m in pat.finditer(src):
                line = src[: m.start()].count("\n") + 1
                offenders.append(f"{path}:{line}: {m.group(0)}")
    assert not offenders, (
        "hard-coded probe entity ids (select probes FROM the data — "
        f"the dedup_minhash_topk_lookup lesson): {offenders}"
    )
