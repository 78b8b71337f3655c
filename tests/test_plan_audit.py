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


def test_no_cartesian_products_or_python_rows_anywhere(spark):
    bad_cartesian, bad_python = [], []
    for name, fn in _auditable():
        plan = executed_plan(fn(spark, SF_SMOKE))
        if "CartesianProduct" in plan:
            bad_cartesian.append(name)
        if name not in _PYTHON_ALLOWED and (
            "BatchEvalPython" in plan  # row-at-a-time UDF/UDTF
            or "ArrowEvalPython" in plan
            or "MapInPandas" in plan
        ):
            bad_python.append(name)
    assert not bad_cartesian, f"unbounded cross joins: {bad_cartesian}"
    assert not bad_python, f"Python row evaluation: {bad_python}"
