"""Driver-contract guards: the correctness harness verifies only a
bounded PREFIX (~50 entries) of the registry in insertion order, and the
bench harness runs the HEADLINE list by name — both break silently if a
refactor reorders imports or renames a query. These tests pin the
contract mechanically."""

from __future__ import annotations

from apache_iceberg_exploration_spark import registry

registry._load_all()

# The driver-verified prefix composition (round-2 snapshot): the first
# fifty registered queries must stay medallion/quality → dedup/ANN →
# lakehouse — new modules register LAST (registry._load_all notes why).
_EXPECTED_PREFIX_HEAD = [
    "bronze_ingest_customer",
    "incremental_extract_events",
    "silver_dedup_fullrow",
    "silver_dedup_keyed",
    "gold_customer_agg",
]


def test_prefix_head_is_stable():
    names = list(registry.all_queries())
    assert names[:5] == _EXPECTED_PREFIX_HEAD, names[:5]


def test_driver_prefix_is_fully_oracle_checked():
    """Every entry in the driver-verified prefix must carry a value-hash
    oracle — a no-oracle query in the prefix burns one of the ~50
    verified slots on a weaker rows-only check."""
    names = list(registry.all_queries())[:50]
    oracles = registry.all_oracles()
    missing = [n for n in names if n not in oracles]
    assert not missing, missing


def test_bench_headline_names_resolve():
    """bench.py's HEADLINE list must reference only registered queries —
    a typo otherwise crashes the driver's per-round bench run."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
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
